"""Preconditioned conjugate gradient (jit-compatible).

Semantics follow Krylov.jl's ``cg`` as used by the reference evolution
solve (reference src/evolution.jl:114-126, src/iterative_solvers.jl:58):
stop when ||r||_2 <= atol + rtol * ||r0||_2, cap at itmax iterations
(itmax = 0 means 2N, Krylov.jl's default).  Runs entirely inside
``lax.while_loop`` so it can live in the jitted timestep.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SolveStats:
    iterations: jnp.ndarray
    residual: jnp.ndarray
    converged: jnp.ndarray


jax.tree_util.register_pytree_node(
    SolveStats,
    lambda s: ((s.iterations, s.residual, s.converged), None),
    lambda _, c: SolveStats(*c),
)


def cg(op, b, x0, *, M_diag_inv=None, M=None, atol=1e-6, rtol=1e-6, itmax=0,
       psum_axis=None):
    """Solve op(x) = b with preconditioned CG.

    op: callable x -> A x (SPD on the relevant subspace)
    M_diag_inv: diagonal preconditioner entries (1/diag), or
    M: callable r -> M^{-1} r (overrides M_diag_inv)
    psum_axis: when running inside shard_map over a device mesh axis,
    vectors are shard-local and dot products are psummed over this
    axis -- the distributed-CG mode (SURVEY.md §2.3 distributed
    reductions).
    Returns (x, SolveStats).
    """
    n = b.shape[0]
    if itmax == 0:
        itmax = 2 * n

    if M is None and M_diag_inv is not None:
        M = lambda r: M_diag_inv * r
    if M is None:
        M = lambda r: r

    if psum_axis is None:
        vdot = jnp.vdot
    else:
        vdot = lambda u, v: jax.lax.psum(jnp.vdot(u, v), psum_axis)
    _norm = lambda v: jnp.sqrt(vdot(v, v))

    r0 = b - op(x0)
    z0 = M(r0)
    rz0 = vdot(r0, z0)
    rnorm0 = _norm(r0)
    tol = atol + rtol * rnorm0

    def cond(state):
        x, r, z, p, rz, k, rnorm = state
        return jnp.logical_and(rnorm > tol, k < itmax)

    def body(state):
        x, r, z, p, rz, k, rnorm = state
        Ap = op(p)
        pAp = vdot(p, Ap)
        alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = vdot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1, _norm(r))

    state = (x0, r0, z0, z0, rz0, jnp.array(0, jnp.int32), rnorm0)
    x, r, z, p, rz, k, rnorm = jax.lax.while_loop(cond, body, state)
    stats = SolveStats(iterations=k, residual=rnorm, converged=rnorm <= tol)
    return x, stats
