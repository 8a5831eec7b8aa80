"""North-star validation run: bowl3D mixing, 1000 BDF2 steps.

BASELINE.json's headline target: a bowl3D mixing trajectory on the
reference's shipped test mesh that (a) matches the reference golden
state after the 50-step prefix (the reference's own acceptance bar,
FE-integral rel-L2 < 1e-3, reference test/bowl_mixing_tests.jl:101-103)
and (b) continues stably to 1000 steps with checkpoint/resume
equivalence, recording throughput and a self-golden final state.

Usage::

    python -m nupgcm_tpu.tools.northstar [--out artifacts] [--steps 1000]

Writes ``northstar_bowl3d.json`` (stats) and
``northstar_bowl3d_final.npz`` (final state, mesh-canonical dof order)
into the output directory.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

REF_MESH = "/root/reference/meshes/bowl3D_1.000000e-01_5.000000e-01.msh"
REF_GOLDEN = "/root/reference/test/data/bowl_mixing_3D.jld2"


def build_model(physics: str = "mixing"):
    import nupgcm_tpu as npg

    eps, alpha, mu = 2e-1, 0.5, 1e1
    params = npg.Parameters(
        eps=eps, alpha=alpha, mu_rho=mu, N2=1 / alpha,
        f=lambda x: 1.0 + 0.5 * x[1],
        H=lambda x: alpha * (1 - x[0] ** 2 - x[1] ** 2),
    )
    kap = lambda x: 1e-2 + np.exp(
        -(x[2] + alpha * (1 - x[0] ** 2 - x[1] ** 2)) / (0.1 * alpha))
    if physics == "full":
        # eddy + convection + wind on the same bowl (the reference's
        # full parameterization stack, src/inputs.jl:63-137, with the
        # mixing suite's kappa profile): self-validated stability run
        forc = npg.Forcings(
            nu=1.0, kappa_h=kap, kappa_v=kap,
            tau_x=lambda x: -0.1 * np.cos(np.pi / 2 * x[1]), tau_y=0.0,
            b_surface_bc=npg.SurfaceDirichletBC(0.0),
            conv_param=npg.ConvectionParameterization(
                kappa_c=10.0, N2_min=1e-3),
            eddy_param=npg.EddyParameterization(
                f=lambda x: 1.0 + 0.5 * x[1], N2_min=float(np.sqrt(1e-3))),
        )
    else:
        forc = npg.Forcings(nu=1.0, kappa_h=kap, kappa_v=kap, tau_x=0.0,
                            tau_y=0.0,
                            b_surface_bc=npg.SurfaceDirichletBC(0.0))
    if os.path.exists(REF_MESH):
        mesh = npg.read_msh(REF_MESH)
        mesh_src = "reference bowl3D h=0.1"
    else:
        mesh = npg.generators.bowl3D(0.1, alpha, nz=7)
        mesh_src = "generated bowl3D h=0.1"
    spaces = npg.Spaces(
        mesh,
        u_diri_tags=["bottom", "coastline", "surface"],
        u_diri_vals=[(0, 0, 0)] * 3,
        u_diri_masks=[(True, True, True), (True, True, True),
                      (False, False, True)],
        b_diri_tags=["coastline", "surface"], b_diri_vals=[0.0, 0.0],
    )
    fe = npg.FEData(mesh, spaces)
    dt = 1e-4 * mu / (alpha * eps) ** 2
    if physics == "full":
        # full parameterizations run under adaptive-CFL BDF1, exactly
        # how the reference runs its full-physics production configs
        # (scratch/run.jl:158-163) -- the wind-driven flow grows well
        # past the mixing suite's fixed-dt stability margin
        ts = npg.BDF1(t_start=0, t_stop=1e9, dt=dt, adaptive=True,
                      CFL_factor=0.5)
    else:
        ts = npg.BDF2(t_start=0, t_stop=2000 * dt, dt=dt)
    # f32's tightest reachable Krylov tolerances (~1e-7/1e-8): the
    # default 1e-6 leaves the 3D trajectory ~1e-2 from the reference
    # golden after 50 steps; these hold the 1e-3 bar (same policy as
    # tests/test_golden_reference.py f32 variants)
    kw = {}
    if physics == "full":
        # the eddy rebuild shifts nu far from the frozen Chebyshev
        # spectral bounds (up to f^2/N2_min ~ 70x contrast in
        # destratified boundary layers); the bound-free inner-GMRES
        # smoother stays stable under that drift
        kw["inner_method"] = "inner_gmres"
    model = npg.PGModel(fe, params, forc, ts,
                        inv_atol=1e-7, inv_rtol=1e-7,
                        evo_atol=1e-8, evo_rtol=1e-8, **kw)
    return model, mesh_src


def rel_l2(fe, vals, ref, cd, phi):
    import jax.numpy as jnp

    wq = jnp.asarray(np.asarray(fe.geom.wq, np.float64))

    def norm2(v):
        fq = jnp.einsum("qi,ci->cq", jnp.asarray(np.asarray(phi, np.float64)),
                        jnp.asarray(np.asarray(v, np.float64))[jnp.asarray(cd)])
        return float(jnp.einsum("cq,cq->", wq, fq ** 2))

    vals, ref = np.asarray(vals), np.asarray(ref)
    if vals.ndim == 2:
        return (sum(norm2(vals[:, c] - ref[:, c]) for c in range(3))
                / sum(norm2(ref[:, c]) for c in range(3)))
    return norm2(vals - ref) / norm2(ref)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--block", type=int, default=50)
    ap.add_argument("--physics", default="mixing",
                    choices=("mixing", "full"),
                    help="'full' adds wind + convection + eddy "
                         "parameterizations (no golden prefix exists "
                         "for that config; self-validated)")
    args = ap.parse_args()
    tag = "" if args.physics == "mixing" else "_full"
    os.makedirs(args.out, exist_ok=True)

    import jax

    from nupgcm_tpu.io import checkpoint as ck

    print(f"devices: {jax.devices()}", flush=True)
    model, mesh_src = build_model(args.physics)
    fe = model.fe
    print(f"{mesh_src}: {fe.summary()}", flush=True)
    stats = {"mesh": mesh_src, "n_dof": fe.n_inv,
             "dtype": str(np.dtype(model.dtype)),
             "matmul_precision": model.matmul_precision,
             "windowed": bool(model.windowed),
             "physics": args.physics,
             "steps": args.steps}

    state = model.rest_state()
    # ---- 50-step prefix vs the reference golden -----------------------
    t0 = time.time()
    state = model.run(state, n_info=0, max_steps=50,
                      n_precond_refresh=25 if args.physics == "full" else None)
    print(f"50-step prefix: {time.time() - t0:.1f}s", flush=True)
    if os.path.exists(REF_GOLDEN) and args.physics == "mixing":
        from nupgcm_tpu.io import gridap as gi

        maps = gi.gridap_maps(REF_MESH, fe.spaces)
        ref = gi.state_from_reference(model, REF_GOLDEN, maps)
        eu = rel_l2(fe, state.u, ref.u, fe.cd_u, fe.tab_u.phi)
        eb = rel_l2(fe, state.b, ref.b, fe.cd_b, fe.tab_b.phi)
        stats["prefix50_rel_l2_u"] = eu
        stats["prefix50_rel_l2_b"] = eb
        stats["prefix50_pass_1e3"] = bool(eu < 1e-3 and eb < 1e-3)
        print(f"prefix vs reference golden: rel-L2 u={eu:.3e} b={eb:.3e} "
              f"({'PASS' if stats['prefix50_pass_1e3'] else 'FAIL'})",
              flush=True)
    else:
        print("reference golden unavailable; prefix check skipped", flush=True)

    # ---- march to 1000 steps with periodic checkpoints -----------------
    traj = []

    def save_cb(m, st, i):
        ck.save_state(m, st, os.path.join(args.out, f"northstar{tag}_{i:06d}.npz"))

    t0 = time.time()
    i = 50
    while i < args.steps:
        n = min(args.block, args.steps - i)
        ops, st2, auxs = model.multi_step_jit(model.ops, state, n)
        jax.block_until_ready(st2.b)
        model.ops = ops
        state = st2
        i += n
        if args.physics == "full":
            # keep the preconditioner tracking the evolving eddy nu
            model.ops = model.refresh_precond(model.ops, state)
        u_max = float(auxs["u_max"][-1])
        b_max = float(auxs["b_max"][-1])
        assert np.isfinite(u_max) and np.isfinite(b_max) and \
            max(u_max, b_max) < 1e3, f"blow-up at step {i}"
        traj.append({"step": i, "u_max": u_max,
                     "b_free_min": float(auxs["b_free_min"][-1]),
                     "b_free_max": float(auxs["b_free_max"][-1]),
                     "evo_it": int(np.asarray(auxs["evo_iters"]).mean()),
                     "inv_it": int(np.asarray(auxs["inv_iters"]).mean())})
        if i % 250 == 0:
            save_cb(model, state, i)
            print(f"step {i}: |u|max={u_max:.3e} "
                  f"b in [{traj[-1]['b_free_min']:.3e}, "
                  f"{traj[-1]['b_free_max']:.3e}] "
                  f"inv_it={traj[-1]['inv_it']}", flush=True)
    wall = time.time() - t0
    stats["steps_per_s"] = (args.steps - 50) / wall
    stats["wall_seconds_50_to_end"] = wall
    stats["trajectory"] = traj
    print(f"{args.steps} steps done: {stats['steps_per_s']:.2f} steps/s",
          flush=True)

    # ---- resume equivalence over the final segment ---------------------
    # resume from the last checkpoint STRICTLY BEFORE the end so the
    # equivalence check re-runs a real segment (steps=1000 -> ck 750)
    last_ck = ((args.steps - 1) // 250) * 250
    ckf = os.path.join(args.out, f"northstar{tag}_{last_ck:06d}.npz")
    if os.path.exists(ckf) and last_ck < args.steps:
        st_r = model.run(ck.load_state(model, ckf), n_info=0,
                         max_steps=args.steps)
        du = np.abs(np.asarray(st_r.u) - np.asarray(state.u)).max()
        db = np.abs(np.asarray(st_r.b) - np.asarray(state.b)).max()
        stats["resume_max_du"] = float(du)
        stats["resume_max_db"] = float(db)
        print(f"resume from {last_ck}: max|du|={du:.3e} max|db|={db:.3e}",
              flush=True)

    # ---- self-golden final state (canonical order) ---------------------
    us, bs = fe.spaces.u_space, fe.spaces.b_space
    u = np.asarray(state.u)
    np.savez_compressed(
        os.path.join(args.out, f"northstar_bowl3d{tag}_final.npz"),
        u=np.stack([us.to_original_order(u[:, c]) for c in range(3)], axis=1),
        b=bs.to_original_order(np.asarray(state.b)),
        t=float(state.t), steps=int(state.step))
    with open(os.path.join(args.out, f"northstar_bowl3d{tag}.json"), "w") as f:
        json.dump(stats, f, indent=1)
    print(json.dumps({k: v for k, v in stats.items() if k != "trajectory"}),
          flush=True)


if __name__ == "__main__":
    main()
