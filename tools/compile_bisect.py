"""Bisect the kernel-v4 compile blowup at production window widths.

Builds SYNTHETIC window plans (no mesh/model) with controlled W1 and
compiles a single saddle_matvec, timing .lower().compile() under
variants: dedup on/off, W1 small/large.  Each compile runs in THIS
process with a wall-clock printout, so a pathological case is visible
immediately.

Usage: python tools/compile_bisect.py [W1_rows] [dedup:0|1]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def synth_plan(W1_rows, nc=256, nlu=10, nlp=4, dedup=True):
    from nupgcm_tpu.ops.window import build_window_plan

    rng = np.random.default_rng(0)
    span = W1_rows * 128
    n_nodes = span + nc  # windows slide slowly: width stays ~span
    cd_u = np.zeros((nc, nlu), np.int64)
    cd_p = np.zeros((nc, nlp), np.int64)
    for c in range(nc):
        base = c  # min node grows by 1/cell -> sorted order holds
        cd_u[c] = base + rng.choice(span, nlu, replace=False)
        cd_u[c, 0] = base  # pin the min
        cd_p[c] = (base // 8) + rng.choice(max(W1_rows * 16, nlp + 1),
                                           nlp, replace=False)
        cd_p[c, 0] = base // 8
    n_p = int(cd_p.max()) + 1
    return build_window_plan(cd_u, cd_p, n_nodes, n_p, dedup=dedup,
                             bucketed=False)


def main():
    W1_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    dedup = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
    mode = sys.argv[3] if len(sys.argv) > 3 else "full"

    sys.path.insert(0, "/root/repo")
    from nupgcm_tpu.ops import window as W
    from nupgcm_tpu.ops.window import saddle_matvec
    from nupgcm_tpu.utils.precision import scoped_precision

    if mode == "noscatter":
        def _noop_scatter(y_ref, row0s, W1, OHa, OHt, ye, nl, B, dtype):
            idx = __import__("jax.experimental.pallas", fromlist=["pl"])
            y_ref[0, :] = y_ref[0, :] + ye[0, :1] * 0.0
        W._scatter = _noop_scatter
        W._scatter_dedup = (lambda y_ref, row0s, W1, a, b, c, d, ye, nl,
                            B, dtype: _noop_scatter(y_ref, row0s, W1, a,
                                                    b, ye, nl, B, dtype))
    elif mode == "nogather":
        def _zero_gather(x_ref, row0s, W1, OHa, OHt, nl, B, dtype):
            return jnp.zeros((len(row0s) * nl, B), dtype) + x_ref[0, :1]
        W._gather = _zero_gather
        W._gather_dedup = (lambda x_ref, row0s, W1, a, b, c, d, Ru1, nl,
                           B, dtype: _zero_gather(x_ref, row0s, W1, a, b,
                                                  nl, B, dtype))
    elif mode == "noonehot":
        # one-hots become constants (skips iota-compare lowering)
        orig = W._onehots
        W._onehots = (lambda a_row, t_row, W1, dtype:
                      (jnp.zeros((W1, a_row.shape[-1]), dtype),
                       jnp.zeros((128, t_row.shape[-1]), dtype)))

    t0 = time.time()
    plan = synth_plan(W1_rows, dedup=dedup)
    print(f"plan: W1u={plan.W1u} W1p={plan.W1p} Ru_u={plan.Ru_u} "
          f"Ru_p={plan.Ru_p} nb={plan.nb} ({time.time() - t0:.1f}s)",
          flush=True)

    nlu3 = 3 * plan.nlu
    S = jax.ShapeDtypeStruct
    f32 = jnp.float32
    args = (S((plan.nb, nlu3 * nlu3, plan.B), f32),
            S((plan.nb, nlu3 * plan.nlp, plan.B), f32),
            S((plan.nb, plan.nlp * nlu3, plan.B), f32),
            S((3 * plan.n_u_nodes + plan.n_p,), f32))

    def fn(uu, up, pu, x):
        return saddle_matvec(uu, up, pu, x, plan, "full")

    t0 = time.time()
    lowered = jax.jit(scoped_precision(fn, "float32")).lower(*args)
    print(f"lowered in {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    lowered.compile()
    print(f"COMPILED in {time.time() - t0:.1f}s "
          f"(W1={W1_rows}, dedup={dedup})", flush=True)


if __name__ == "__main__":
    main()
