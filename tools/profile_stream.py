"""Isolate the Pallas grid-step streaming floor.

profile_matvec.py showed stream-only and compute-only variants both
pinned at ~10-16 us per grid step (35-58 GB/s of 819 peak) -- the
matvec is GRID-STEP-OVERHEAD-bound, not FLOP-bound.  This sweeps the
stream structure to find what buys the overhead back:

  s3_B128   three separate tensor inputs per step (current layout)
  s1_B128   ONE concatenated tensor, same total bytes
  s1_B256   one tensor, blocks twice as large (half the steps)
  s1_B512   one tensor, 4x blocks
  s1idx_B%d one tensor + 8 index-row inputs (the production input
            count) -- measures the small-DMA tax

Every rep feeds a distinct scalar into the kernel so XLA cannot CSE
identical pallas_calls inside the timing loop.

Usage: python tools/profile_stream.py [rows_per_cell] [n_cells] [reps]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1140  # 900+120+120
    ncell = int(sys.argv[2]) if len(sys.argv) > 2 else 8576
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    total = rows * ncell * 4

    def run(n_inputs, B, with_idx=False):
        nb = ncell // B
        key = jax.random.PRNGKey(0)
        if n_inputs == 3:
            r1, r2 = 900 * B // 128, 120 * B // 128
            parts = [jax.random.normal(key, (nb, r, 128), jnp.float32)
                     for r in (r1, r2, r2)]
        else:
            parts = [jax.random.normal(key, (nb, rows * B // 128, 128),
                                       jnp.float32)]
        idx = [jnp.ones((nb, 1, 1280), jnp.int32) for _ in range(8)] \
            if with_idx else []

        def kernel(w0_ref, *refs):
            t_refs = refs[:len(parts)]
            o_ref = refs[-1]
            b = pl.program_id(0)

            @pl.when(b == 0)
            def _():
                o_ref[:] = jnp.zeros_like(o_ref)

            acc = sum(jnp.sum(r[0], axis=0, keepdims=True)[:, :128]
                      for r in t_refs)
            o_ref[:] = o_ref[:] + acc + w0_ref[b].astype(jnp.float32)

        specs = [pl.BlockSpec((1, p.shape[1], 128), lambda b, *_: (b, 0, 0))
                 for p in parts]
        specs += [pl.BlockSpec((1, 1, 1280), lambda b, *_: (b, 0, 0))
                  for _ in idx]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nb,),
            in_specs=specs,
            out_specs=pl.BlockSpec((1, 128), lambda b, *_: (0, 0)))

        def once(w0, *args):
            return pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            )(w0, *args)

        @jax.jit
        def loop(parts_idx):
            def body(i, acc):
                w0 = jnp.full((nb,), i, jnp.int32)  # rep-distinct: no CSE
                o = once(w0, *parts_idx)
                return acc + o[0, 0]
            return jax.lax.fori_loop(0, reps, body, 0.0)

        jax.block_until_ready(loop((*parts, *idx)))
        ts = []
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(loop((*parts, *idx)))
            ts.append(time.time() - t0)
        t = float(np.median(ts)) / reps
        name = f"s{n_inputs}{'idx' if with_idx else ''}_B{B}"
        print(f"  {name:12s} {t * 1e3:8.3f} ms  {total / t / 1e9:6.1f} GB/s  "
              f"({t / nb * 1e6:5.2f} us/step, {nb} steps)", flush=True)

    print(f"streaming {total / 1e6:.0f} MB per application", flush=True)
    run(3, 128)
    run(1, 128)
    run(1, 256)
    run(1, 512)
    run(1, 128, with_idx=True)
    run(1, 512, with_idx=True)


if __name__ == "__main__":
    main()
