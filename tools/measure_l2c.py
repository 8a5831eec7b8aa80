"""k=0 (direct two-level cycle) at 0.87M dofs."""
import gc
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
    mesh = npg.generators.bowl3D(0.033, alpha, nz=12)
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
    model = npg.PGModel(fe, params, forc, ts, saddle_coarse_inner=0)
    log(f"build {time.time()-t0:.0f}s")
    state = model.set_b(model.rest_state(), lambda x: 0.1 * np.exp(
        -(x[2] + 0.5 * (1 - x[0] ** 2 - x[1] ** 2)) / 0.05))
    results = []
    row = {"k": 0}
    for attempt in range(2):
        try:
            t0 = time.time()
            ops, st, auxs = model.multi_step_jit(model.ops, state, 5)
            jax.block_until_ready(st.b)
            compile_s = time.time() - t0
            t0 = time.time()
            ops, st, auxs = model.multi_step_jit(model.ops, state, 5)
            jax.block_until_ready(st.b)
            row.update({
                "steps_per_s": round(5 / (time.time() - t0), 4),
                "inv_it": float(np.asarray(auxs["inv_iters"]).mean()),
                "inv_res": float(np.asarray(auxs["inv_res"])[-1]),
                "evo_it": float(np.asarray(auxs["evo_iters"]).mean()),
                "b_max": float(np.asarray(auxs["b_max"])[-1]),
                "compile_s": round(compile_s, 1)})
            del ops, st, auxs
            break
        except Exception as e:  # noqa: BLE001
            log(f"attempt {attempt}: {e}")
            row["error"] = str(e)[:200]
    results.append(row)
    log(json.dumps(row))
    gc.collect()
    with open("artifacts/sweep_l2_inner_k0.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
