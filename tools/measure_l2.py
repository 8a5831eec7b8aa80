"""Targeted section-C-scale measurement of the second-level coarse
correction: inversion iterations + steps/s at 0.87M dofs, L2 on."""
import json
import sys
import time

import numpy as np


def main():
    import jax

    import nupgcm_tpu as npg

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    eps, alpha, mu = 2e-1, 0.5, 1e1
    params = npg.Parameters(
        eps=eps, alpha=alpha, mu_rho=mu, N2=1 / alpha,
        f=lambda x: 1.0 + 0.5 * x[1],
        H=lambda x: alpha * (1 - x[0] ** 2 - x[1] ** 2))
    kap = lambda x: 1e-2 + np.exp(
        -(x[2] + alpha * (1 - x[0] ** 2 - x[1] ** 2)) / (0.1 * alpha))
    forc = npg.Forcings(nu=1.0, kappa_h=kap, kappa_v=kap, tau_x=0.0,
                        tau_y=0.0, b_surface_bc=npg.SurfaceDirichletBC(0.0))
    h = float(sys.argv[1]) if len(sys.argv) > 1 else 0.033
    nz = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    mesh = npg.generators.bowl3D(h, alpha, nz=nz)
    spaces = npg.Spaces(
        mesh, u_diri_tags=["bottom", "coastline", "surface"],
        u_diri_vals=[(0, 0, 0)] * 3,
        u_diri_masks=[(True, True, True), (True, True, True),
                      (False, False, True)],
        b_diri_tags=["coastline", "surface"], b_diri_vals=[0.0, 0.0])
    fe = npg.FEData(mesh, spaces)
    dt = 1e-4 * mu / (alpha * eps) ** 2
    ts = npg.BDF2(t_start=0, t_stop=1e6 * dt, dt=dt)
    t0 = time.time()
    model = npg.PGModel(fe, params, forc, ts)
    log(f"build {time.time()-t0:.0f}s {fe.summary()} "
        f"l2={model.saddle_coarse_l2} na={getattr(model,'_sc2_na',0)} "
        f"k={model.saddle_coarse_inner} method={model.inner_method}")
    state = model.set_b(model.rest_state(), lambda x: 0.1 * np.exp(
        -(x[2] + 0.5 * (1 - x[0] ** 2 - x[1] ** 2)) / 0.05))
    t0 = time.time()
    u, p, aux = model.invert_jit(model.ops, state)
    jax.block_until_ready(u)
    log(f"invert compile+run {time.time()-t0:.0f}s "
        f"iters={int(aux['inv_iters'])} res={float(aux['inv_res']):.2e}")
    t0 = time.time()
    u, p, aux = model.invert_jit(model.ops, state)
    jax.block_until_ready(u)
    t_inv = time.time() - t0
    log(f"invert {t_inv:.3f}s iters={int(aux['inv_iters'])}")
    t0 = time.time()
    ops, st, auxs = model.multi_step_jit(model.ops, state, 5)
    jax.block_until_ready(st.b)
    log(f"5-step compile+run {time.time()-t0:.0f}s")
    t0 = time.time()
    ops, st, auxs = model.multi_step_jit(model.ops, state, 5)
    jax.block_until_ready(st.b)
    sps = 5 / (time.time() - t0)
    out = {"n_dof": fe.n_inv, "inv_seconds": round(t_inv, 3),
           "inv_iters": int(aux["inv_iters"]),
           "steps_per_s": round(sps, 4),
           "evo_it": float(np.asarray(auxs["evo_iters"]).mean()),
           "inv_it": float(np.asarray(auxs["inv_iters"]).mean()),
           "inv_res": float(np.asarray(auxs["inv_res"])[-1]),
           "b_max": float(np.asarray(auxs["b_max"])[-1])}
    log(json.dumps(out))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
