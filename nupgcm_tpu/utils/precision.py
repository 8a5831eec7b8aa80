"""Scoped matmul-precision policy.

On TPU, f32 einsum/matmul default to single-pass bfloat16 multiplies;
the FE element contractions and Krylov basis products need true f32
accumulation (3-pass bf16 on the MXU) to hold the reference's 1e-3
golden bar (reference test/bowl_mixing_tests.jl:101-103).

Round 3 enforced this by mutating the PROCESS-GLOBAL
``jax_default_matmul_precision`` inside ``PGModel.__init__`` -- which
leaked into unrelated code and armed a Mosaic lowering failure in the
windowed Pallas kernel (bf16 x bf16 dots inheriting an fp32 contract
precision).  The policy is now scoped: every function a model traces
is wrapped with :func:`scoped_precision`, which enters
``jax.default_matmul_precision`` only for the duration of that trace
(the setting participates in jit's trace context, so caching stays
correct), and performance-critical Pallas dots carry their own
explicit per-dot precision (ops/window.py ``_mxu_dot``).
"""

from __future__ import annotations

import contextlib
import functools


def precision_ctx(precision):
    """Context manager applying ``jax.default_matmul_precision`` when
    ``precision`` is a string; a no-op for ``None``."""
    import jax

    if precision is None:
        return contextlib.nullcontext()
    return jax.default_matmul_precision(precision)


def scoped_precision(fn, precision):
    """Wrap ``fn`` so its body runs (and hence traces) under the given
    matmul precision.  Identity for ``precision=None``."""
    if precision is None:
        return fn

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with precision_ctx(precision):
            return fn(*args, **kwargs)

    return wrapped
