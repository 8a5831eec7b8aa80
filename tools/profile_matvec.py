"""Microbenchmark the windowed saddle matvec to locate its bottleneck.

BENCH_r04 section C measured the 0.87M-DoF windowed matvec at 15.1 ms
= 66 GB/s of the 819 GB/s HBM peak.  If the kernel were truly
bandwidth-bound it would run in ~1.1 ms (907 MB of element tensors),
so ~93% of the time is something else: MXU small-dot latency, VPU
one-hot construction, or pipeline stalls.  This tool times isolating
variants of the SAME grid/BlockSpec structure:

  full      the production kernel (saddle, dedup, bucketed)
  uu        velocity block only (drops the p-side gathers/scatters)
  stream    same streaming pattern, trivial compute (row-sum of the
            element block) -> pure HBM->VMEM pipeline cost
  compute   same compute, but the tensor index_map pins block 0 ->
            tensors never re-stream from HBM; pure compute cost
  nodedup   plan with dedup tables disabled (kernel v2)
  nobucket  single-bucket plan (global max W1)

Usage:  python tools/profile_matvec.py [h] [nz] [reps]
        defaults h=0.05 nz=8 (fast iteration); production C-section
        scale is h=0.033 nz=12.
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

N1, N2 = 10, 60


def timed(fn, *args, label=""):
    """Differential timing with a VALUE fetch.

    On the tunneled axon backend, block_until_ready can return before
    the device work completes and repeated identical dispatches may be
    served from a cache, so: (a) completion is forced by fetching one
    element of the result, (b) the per-application time is the
    difference quotient (T(N2) - T(N1)) / (N2 - N1) -- dispatch,
    round-trip, and transfer constants cancel.  ``fn(n, *args)`` must
    run n data-dependent applications (traced loop bound: one
    compile)."""
    def fetch(out):
        return float(out.reshape(-1)[0])  # 4-byte pull forces completion

    t0 = time.time()
    fetch(fn(N1, *args))
    compile_s = time.time() - t0

    def t_of(n):
        ts = []
        for _ in range(3):
            t0 = time.time()
            fetch(fn(n, *args))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    run_s = (t_of(N2) - t_of(N1)) / (N2 - N1)
    print(f"  {label:26s} {run_s * 1e3:9.3f} ms/app  (compile {compile_s:.1f}s)",
          flush=True)
    return run_s


def main():
    h = float(sys.argv[1]) if len(sys.argv) > 1 else 0.05
    nz = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    sys.path.insert(0, "/root/repo")
    import bench
    import nupgcm_tpu as npg
    from nupgcm_tpu.ops import window as W
    from nupgcm_tpu.ops.window import (blocked_saddle_tensors,
                                       build_window_plan, saddle_matvec)
    from nupgcm_tpu.utils.precision import scoped_precision

    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
    except Exception:
        print("no pallas; aborting")
        return

    t0 = time.time()
    mesh = npg.generators.bowl3D(h, 0.5, nz=nz)
    print(f"mesh gen {time.time() - t0:.1f}s: {mesh.summary()}", flush=True)
    t0 = time.time()
    model = bench.mixing_setup(mesh)
    fe = model.fe
    print(f"build {time.time() - t0:.1f}s: {fe.summary()}", flush=True)
    plan = model.wplan
    if plan is None:
        print("windowed kernel inactive (not on TPU?); aborting")
        return
    print(f"plan: nb={plan.nb} B={plan.B} W1u={plan.W1u} W1p={plan.W1p} "
          f"Ru_u={plan.Ru_u} Ru_p={plan.Ru_p} buckets={plan.buckets}",
          flush=True)

    N = fe.n_inv
    ops = model.ops
    prec = model.matmul_precision

    @jax.jit
    def make_blocked(uu, up, pu):
        return blocked_saddle_tensors(uu, up, pu, plan)

    uu_b, up_b, pu_b = jax.block_until_ready(
        make_blocked(ops["A_uu_e"], ops["A_up_e"], ops["A_pu_e"]))
    nbytes = sum(int(np.prod(a.shape)) * 4 for a in (uu_b, up_b, pu_b))
    print(f"blocked tensors: {nbytes / 1e6:.0f} MB -> floor at 819 GB/s = "
          f"{nbytes / 819e9 * 1e3:.2f} ms", flush=True)

    x0 = jnp.asarray(np.random.default_rng(0).standard_normal(N), model.dtype)

    def loop(body):
        # tensors ride as jit ARGUMENTS (args-table discipline,
        # models/model.py): a closed-over device array would inline
        # 907 MB of constants into the HLO payload and the remote
        # compile service rejects it (HTTP 413)
        def fn(n, x, *tensors):
            def step(i, x):
                y = body(x, *tensors)
                return y / jnp.linalg.norm(y)
            return jax.lax.fori_loop(0, n, step, x)
        return jax.jit(scoped_precision(fn, prec))

    import os

    only = os.environ.get("PROF_ONLY")
    only = set(only.split(",")) if only else None

    def want(name):
        return only is None or name in only

    results = {}

    # --- full production kernel
    if want("full"):
        results["full"] = timed(
            loop(lambda x, a, b, c: saddle_matvec(a, b, c, x, plan,
                                                  "full")),
            x0, uu_b, up_b, pu_b, label="full (prod)")

    # --- velocity block only
    n3 = 3 * plan.n_u_nodes
    if want("uu"):
        results["uu"] = timed(
            loop(lambda x, a: jnp.concatenate([
                saddle_matvec(a, None, None, x[:n3], plan, "uu"),
                x[n3:]])),
            x0, uu_b, label="uu only")

    # --- stream-only: same tensor streaming, trivial compute; the
    # (1, 128) carry rides THROUGH the kernel so successive calls are
    # data-dependent (no CSE/overlap between reps)
    def stream_kernel(w0u_ref, w0p_ref, c_ref, uu_ref, up_ref, pu_ref,
                      o_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            o_ref[:] = c_ref[:]

        acc = (jnp.sum(uu_ref[0], axis=0, keepdims=True)
               + jnp.sum(up_ref[0], axis=0, keepdims=True)
               + jnp.sum(pu_ref[0], axis=0, keepdims=True))
        o_ref[:] = o_ref[:] + 1e-30 * acc

    nlu3 = 3 * plan.nlu

    def stream_once(carry, uu_b, up_b, pu_b):
        w0u, w0p = plan.device_arrays()[0], plan.device_arrays()[1]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(plan.nb,),
            in_specs=[
                pl.BlockSpec((1, plan.B), lambda b, *_: (0, 0)),
                pl.BlockSpec((1, nlu3 * nlu3, plan.B), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec((1, nlu3 * plan.nlp, plan.B), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec((1, plan.nlp * nlu3, plan.B), lambda b, *_: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, plan.B), lambda b, *_: (0, 0)))
        return pl.pallas_call(
            stream_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, plan.B), jnp.float32),
        )(w0u, w0p, carry, uu_b, up_b, pu_b)

    def stream_loop(n, a, b, c):
        def body(i, carry):
            return stream_once(carry, a, b, c)
        return jax.lax.fori_loop(0, n, body,
                                 jnp.zeros((1, plan.B), jnp.float32))

    if want("stream"):
        results["stream"] = timed(jax.jit(stream_loop), uu_b, up_b, pu_b,
                                  label="stream only")

    # --- compute-only: pin tensor index_map to block 0
    uu1, up1, pu1 = uu_b[:1], up_b[:1], pu_b[:1]

    def pinned_matvec(uu1, up1, pu1, x):
        # monkey-patched _tensor_spec that ignores the grid index
        orig = W._tensor_spec
        W._tensor_spec = lambda rows, B, off=0: pl.BlockSpec(
            (1, rows, B), lambda b, *_: (0, 0, 0))
        try:
            return saddle_matvec(uu1, up1, pu1, x, plan, "full")
        finally:
            W._tensor_spec = orig

    if want("compute"):
        results["compute"] = timed(
            loop(lambda x, a, b, c: pinned_matvec(a, b, c, x)),
            x0, uu1, up1, pu1, label="compute only (pin blk0)")

    # --- kernel v2 (no dedup)
    if want("nodedup"):
        plan_v2 = build_window_plan(fe.cd_u, fe.cd_p,
                                    fe.spaces.u_space.ndof,
                                    fe.spaces.n_p, dedup=False)
        uu2, up2, pu2 = jax.block_until_ready(jax.jit(
            lambda a, b, c: blocked_saddle_tensors(a, b, c, plan_v2))(
            ops["A_uu_e"], ops["A_up_e"], ops["A_pu_e"]))
        results["nodedup"] = timed(
            loop(lambda x, a, b, c: saddle_matvec(a, b, c, x, plan_v2,
                                                  "full")),
            x0, uu2, up2, pu2, label="no dedup (v2)")

    # --- single bucket
    if want("nobucket"):
        plan_nb = build_window_plan(fe.cd_u, fe.cd_p,
                                    fe.spaces.u_space.ndof,
                                    fe.spaces.n_p, bucketed=False)
        uu3, up3, pu3 = jax.block_until_ready(jax.jit(
            lambda a, b, c: blocked_saddle_tensors(a, b, c, plan_nb))(
            ops["A_uu_e"], ops["A_up_e"], ops["A_pu_e"]))
        results["nobucket"] = timed(
            loop(lambda x, a, b, c: saddle_matvec(a, b, c, x, plan_nb,
                                                  "full")),
            x0, uu3, up3, pu3, label="no buckets")

    ms = {k: v * 1e3 for k, v in results.items()}
    print("\nsummary (ms/application):", flush=True)
    for k, v in ms.items():
        print(f"  {k:10s} {v:8.3f}")


if __name__ == "__main__":
    main()
