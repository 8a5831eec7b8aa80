"""Benchmark: PG inversion solve + timestep throughput on one chip.

Headline metric: wall-clock seconds for one converged inversion GMRES
solve (atol=rtol=1e-6, matching reference Krylov settings) on a 3D
bowl with ~16k inversion DoFs -- directly comparable to the
reference's logged solve at 15,946 DoFs: 5.97 s with its GPU-default
1/h^3 diagonal preconditioner, 31.2 s with its block-LU experiment
(reference scratch/inversion_log.md:143-157, BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np

BASELINE_SECONDS = 5.97  # reference inversion @ 15,946 DoF (BASELINE.md)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(dtype_str="float32"):
    import jax
    import jax.numpy as jnp

    dtype = jnp.float32 if dtype_str == "float32" else jnp.float64
    import nupgcm_tpu as npg

    # reference inversion-log experiment config: alpha=1/2, eps=1/2,
    # f = 1 + y/2 (scratch/inversion_log.md:90-101)
    eps, alpha, mu = 0.5, 0.5, 1.0
    params = npg.Parameters(
        eps=eps, alpha=alpha, mu_rho=mu, N2=1 / alpha,
        f=lambda x: 1.0 + 0.5 * x[1],
        H=lambda x: alpha * (1 - x[0] ** 2 - x[1] ** 2),
    )
    kap = lambda x: 1e-2 + np.exp(
        -(x[2] + alpha * (1 - x[0] ** 2 - x[1] ** 2)) / (0.1 * alpha)
    )
    forc = npg.Forcings(nu=1.0, kappa_h=kap, kappa_v=kap, tau_x=0.0, tau_y=0.0,
                        b_surface_bc=npg.SurfaceDirichletBC(0.0))
    # h tuned so free inversion DoFs ~ 16.5k (matches the reference's
    # 15,946-DoF bowl3D inversion-log experiment scale)
    mesh = npg.generators.bowl3D(0.14, alpha, nz=5)
    spaces = npg.Spaces(
        mesh,
        u_diri_tags=["bottom", "coastline", "surface"],
        u_diri_vals=[(0, 0, 0)] * 3,
        u_diri_masks=[(True, True, True), (True, True, True), (False, False, True)],
        b_diri_tags=["coastline", "surface"], b_diri_vals=[0.0, 0.0],
    )
    fe = npg.FEData(mesh, spaces)
    n_free = int(np.sum(~spaces.u_bc.mask)) + spaces.n_p
    log(f"mesh: {mesh.summary()}")
    log(f"{fe.summary()}; free inversion dofs = {n_free}")
    dt = 1e-4 * mu / (alpha * eps) ** 2
    ts = npg.BDF2(t_start=0, t_stop=1.0, dt=dt)
    model = npg.PGModel(fe, params, forc, ts, dtype=dtype,
                        inv_atol=1e-6, inv_rtol=1e-6, inv_itmax=2000)
    return model, n_free


def main():
    import jax

    log(f"devices: {jax.devices()}")
    model, n_free = build()
    import jax.numpy as jnp

    state = model.rest_state()
    # representative buoyancy: short spin-up so b has realistic structure
    state = model.set_b(state, lambda x: 0.1 * np.exp(
        -(x[2] + 0.5 * (1 - x[0] ** 2 - x[1] ** 2)) / 0.05
    ))

    t0 = time.time()
    state2 = model.invert(state)
    jax.block_until_ready(state2.u)
    log(f"invert compile+first run: {time.time() - t0:.2f}s")

    # timed converged solves from a cold initial guess; each rep uses a
    # slightly different b so no execution can be reused
    times = []
    for rep in range(4):
        amp = 0.1 * (1.0 + 0.01 * rep)
        st = model.set_b(model.rest_state(), lambda x: amp * np.exp(
            -(x[2] + 0.5 * (1 - x[0] ** 2 - x[1] ** 2)) / 0.05
        ))
        t0 = time.time()
        u, p, aux = model.invert_jit(model.ops, st)
        jax.block_until_ready(u)
        dt_solve = time.time() - t0
        times.append(dt_solve)
        log(f"rep {rep}: solve {dt_solve:.3f}s iters={int(aux['inv_iters'])} "
            f"res={float(aux['inv_res']):.3e}")
    t_solve = float(np.median(times[1:]))

    # timestep throughput (secondary, stderr only)
    t0 = time.time()
    ops, st, auxs = model.multi_step_jit(model.ops, state, 10)
    jax.block_until_ready(st.b)
    t_compile_steps = time.time() - t0
    t0 = time.time()
    ops, st, auxs = model.multi_step_jit(model.ops, state, 10)
    jax.block_until_ready(st.b)
    steps_per_s = 10 / (time.time() - t0)
    log(f"10-step scan: compile+run {t_compile_steps:.1f}s, steady "
        f"{steps_per_s:.2f} steps/s "
        f"(evo_it~{int(np.asarray(auxs['evo_iters']).mean())}, "
        f"inv_it~{int(np.asarray(auxs['inv_iters']).mean())})")

    print(json.dumps({
        "metric": "inversion_solve_seconds_16k_dof",
        "value": round(t_solve, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / t_solve, 2),
    }))


if __name__ == "__main__":
    main()
