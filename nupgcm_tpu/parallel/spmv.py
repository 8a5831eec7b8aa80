"""Explicitly partitioned SpMV + distributed CG via shard_map.

Hand-partitioned row decomposition of a sorted-COO operator over a 1D
device mesh -- the FEM analog of sequence parallelism (SURVEY.md §2.3):

  * rows (dofs) are block-partitioned into equal padded chunks, one
    per device (RCM ordering makes the blocks spatially coherent);
  * each device owns its COO row segment (padded to the max segment
    nnz) and computes its output chunk with a local gather +
    segmented sum;
  * the input vector is re-replicated with ``all_gather`` (ICI) after
    each apply; dot products are local partials + ``psum``.

This is the stepping stone to the owned/ghost-dof halo-exchange
design (``ppermute`` between neighboring shards instead of
all_gather); the CG below already only uses collectives available in
that design.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .sharding import AXIS


@dataclass
class RowShardedCOO:
    """Host-built row-partitioned COO structure.

    All arrays have a leading device axis of size n_shards:
      rows_loc: (S, nnz_max) int32 -- row index local to the shard
      cols:     (S, nnz_max) int32 -- global column index
      vals:     (S, nnz_max)
      n_pad: padded vector length (S * rows_per_shard)
      n: true vector length
    """

    rows_loc: np.ndarray
    cols: np.ndarray
    vals: jnp.ndarray
    rows_per_shard: int
    n_pad: int
    n: int

    @property
    def n_shards(self) -> int:
        return self.rows_loc.shape[0]


def row_shard_coo(rows: np.ndarray, cols: np.ndarray, vals, n: int,
                  n_shards: int) -> RowShardedCOO:
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    rps = -(-n // n_shards)  # rows per shard (ceil)
    n_pad = rps * n_shards
    owner = rows // rps
    nnz_max = int(np.bincount(owner, minlength=n_shards).max())
    R = np.zeros((n_shards, nnz_max), dtype=np.int32)
    C = np.zeros((n_shards, nnz_max), dtype=np.int32)
    V = np.zeros((n_shards, nnz_max), dtype=vals.dtype)
    for s in range(n_shards):
        sel = owner == s
        k = int(sel.sum())
        R[s, :k] = rows[sel] - s * rps
        C[s, :k] = cols[sel]
        V[s, :k] = vals[sel]
        # padding entries: row 0, col 0, val 0 (harmless accumulate)
    return RowShardedCOO(rows_loc=R, cols=C, vals=jnp.asarray(V),
                         rows_per_shard=rps, n_pad=n_pad, n=n)


def _pad(x: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    return jnp.pad(x, (0, n_pad - x.shape[0]))


def sharded_cg(A: RowShardedCOO, free_mask: jnp.ndarray, b: jnp.ndarray,
               x0: jnp.ndarray, diag_inv: jnp.ndarray, mesh: Mesh,
               atol=1e-6, rtol=1e-6, itmax=0):
    """Distributed Jacobi-CG on the Dirichlet-pinned operator.

    Returns (x (n,), iterations).  All vectors are full length on the
    outside; inside shard_map each device works on its row chunk and
    re-replicates with all_gather.
    """
    n, n_pad, rps = A.n, A.n_pad, A.rows_per_shard
    if itmax == 0:
        itmax = 2 * n
    S = A.n_shards
    freep = _pad(free_mask, n_pad)
    bp = _pad(b, n_pad)
    x0p = _pad(x0, n_pad)
    dinvp = _pad(diag_inv, n_pad).at[n:].set(1.0)

    rows_loc = jnp.asarray(A.rows_loc)
    cols = jnp.asarray(A.cols)
    vals = A.vals

    spec1 = P(AXIS)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(spec1, spec1, spec1, P(None), P(None), P(None), P(None)),
        out_specs=(P(None), P()),
        check_vma=False,
    )
    def cg_kernel(rows_loc, cols, vals, free, b, x0, dinv):
        # local shapes: rows_loc/cols/vals (1, nnz_max); free/b/x0 (n_pad,)
        rows_loc = rows_loc[0]
        cols = cols[0]
        vals = vals[0]
        idx = jax.lax.axis_index(AXIS)
        lo = idx * rps

        def matvec(x):
            """Dirichlet-pinned apply: full x in, full (replicated) out."""
            prod = vals * (x * free)[cols]
            y_loc = jax.ops.segment_sum(prod, rows_loc, num_segments=rps)
            xc = jax.lax.dynamic_slice(x, (lo,), (rps,))
            fc = jax.lax.dynamic_slice(free, (lo,), (rps,))
            y_loc = jnp.where(fc.astype(bool), y_loc, xc)
            chunks = jax.lax.all_gather(y_loc, AXIS)  # (S, rps)
            return chunks.reshape(-1)

        def dot(u, v):
            return jnp.vdot(u, v)  # replicated: local full vectors

        r0 = b - matvec(x0)
        z0 = dinv * r0
        rz0 = dot(r0, z0)
        rn0 = jnp.sqrt(dot(r0, r0))
        tol = atol + rtol * rn0

        def cond(st):
            x, r, z, p, rz, k, rn = st
            return jnp.logical_and(rn > tol, k < itmax)

        def body(st):
            x, r, z, p, rz, k, rn = st
            Ap = matvec(p)
            pAp = dot(p, Ap)
            alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
            x = x + alpha * p
            r = r - alpha * Ap
            z = dinv * r
            rz2 = dot(r, z)
            beta = rz2 / jnp.where(rz == 0, 1.0, rz)
            p = z + beta * p
            return (x, r, z, p, rz2, k + 1, jnp.sqrt(dot(r, r)))

        st = (x0, r0, z0, z0, rz0, jnp.array(0, jnp.int32), rn0)
        x, r, z, p, rz, k, rn = jax.lax.while_loop(cond, body, st)
        return x, k

    x, iters = cg_kernel(rows_loc, cols, vals, freep, bp, x0p, dinvp)
    return x[:n], iters
