"""Halo-exchange domain decomposition (ppermute, no replication).

The scalable successor to parallel/spmv.py's all_gather design: dofs
are partitioned into contiguous owned blocks (RCM ordering makes the
sparsity band-limited, so every off-block reference falls within a
halo of width H of the neighboring shards), and each operator
application exchanges ONLY the halo slabs with the two ring neighbors
via ``jax.lax.ppermute`` over ICI.  Krylov dot products are local
partials + ``psum``.  Communication volume per matvec: 2H values per
shard, independent of problem size per device -- the FEM analog of
ring-attention halo passing (SURVEY.md §5 long-context note).

Host setup (`build_halo_partition`) verifies the band structure and
produces shard-local index arrays; the device kernel is a shard_map
whose inner loop is the same Dirichlet-pinned Jacobi-CG used on one
chip.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .sharding import AXIS


@dataclass
class HaloPartition:
    """Static data for a 1D contiguous-dof halo decomposition.

    rows_loc / cols_ext: (S, nnz_max) int32 -- per-shard COO with rows
    local to the owned block and columns indexing the extended vector
    [halo_lo (H) | owned (chunk) | halo_hi (H)].
    """

    rows_loc: np.ndarray
    cols_ext: np.ndarray
    vals: np.ndarray
    chunk: int
    halo: int
    n_pad: int
    n: int

    @property
    def n_shards(self) -> int:
        return self.rows_loc.shape[0]


def build_halo_partition(rows, cols, vals, n: int, n_shards: int) -> HaloPartition:
    """Partition a sorted-COO operator into contiguous row blocks with
    single-neighbor halos.  Requires the matrix band structure to fit:
    every column referenced by block s must lie within [lo_s - H,
    hi_s + H] with H <= chunk (guaranteed for RCM-ordered FEM meshes
    when shards are coarser than the bandwidth)."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    chunk = -(-n // n_shards)
    n_pad = chunk * n_shards
    owner = rows // chunk
    # halo width: max reach of any entry outside its owner block
    lo = owner * chunk
    reach_lo = np.maximum(lo - cols, 0).max() if len(cols) else 0
    reach_hi = np.maximum(cols - (lo + chunk - 1), 0).max() if len(cols) else 0
    H = int(max(reach_lo, reach_hi))
    if H > chunk:
        raise ValueError(
            f"halo width {H} exceeds shard size {chunk}: matrix bandwidth "
            f"too large for {n_shards} shards (renumber with RCM or use "
            f"fewer shards)"
        )
    nnz_max = int(np.bincount(owner, minlength=n_shards).max())
    R = np.zeros((n_shards, nnz_max), dtype=np.int32)
    C = np.zeros((n_shards, nnz_max), dtype=np.int32)
    V = np.zeros((n_shards, nnz_max), dtype=vals.dtype)
    for s in range(n_shards):
        sel = owner == s
        k = int(sel.sum())
        R[s, :k] = rows[sel] - s * chunk
        # extended-vector index: halo_lo starts at global s*chunk - H
        C[s, :k] = cols[sel] - (s * chunk - H)
        V[s, :k] = vals[sel]
        # padding entries hit row 0 / col 0 with value 0 (harmless)
    return HaloPartition(rows_loc=R, cols_ext=C, vals=V, chunk=chunk,
                         halo=H, n_pad=n_pad, n=n)


def halo_cg(A: HaloPartition, free_mask, b, x0, diag_inv, mesh: Mesh,
            atol=1e-6, rtol=1e-6, itmax=0):
    """Distributed Jacobi-CG with ppermute halo exchange.

    Equivalent to solvers.cg on the Dirichlet-pinned operator; each
    shard holds only its owned chunk of every vector.
    """
    n, n_pad, chunk, H = A.n, A.n_pad, A.chunk, A.halo
    S = A.n_shards
    if itmax == 0:
        itmax = 2 * n

    def pad(v):
        return jnp.pad(jnp.asarray(v), (0, n_pad - n))

    freep = pad(free_mask)
    bp = pad(b)
    x0p = pad(x0)
    dinvp = pad(diag_inv).at[n:].set(1.0)

    rows_loc = jnp.asarray(A.rows_loc)
    cols_ext = jnp.asarray(A.cols_ext)
    vals = jnp.asarray(A.vals)

    fwd = [(i, (i + 1) % S) for i in range(S)]
    bwd = [(i, (i - 1) % S) for i in range(S)]

    @jax.jit
    @lambda f: shard_map(f, mesh=mesh,
                         in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                                   P(AXIS), P(AXIS), P(AXIS)),
                         out_specs=(P(AXIS), P()), check_vma=False)
    def kernel(rows_loc, cols_ext, vals, free, b, x0, dinv):
        rows_loc, cols_ext, vals = rows_loc[0], cols_ext[0], vals[0]
        # free/b/x0/dinv arrive as the local (chunk,) slices

        def exchange(x_loc):
            """Build the extended vector [halo_lo | owned | halo_hi]."""
            # my top H entries travel forward (become right neighbor's
            # halo_lo); my bottom H travel backward
            from_left = jax.lax.ppermute(x_loc[-H:], AXIS, fwd)
            from_right = jax.lax.ppermute(x_loc[:H], AXIS, bwd)
            return jnp.concatenate([from_left, x_loc, from_right])

        def matvec(x_loc):
            xm = x_loc * free
            xe = exchange(xm)
            prod = vals * xe[cols_ext]
            y = jax.ops.segment_sum(prod, rows_loc, num_segments=chunk)
            return jnp.where(free.astype(bool), y, x_loc)

        def dot(u, v):
            return jax.lax.psum(jnp.vdot(u, v), AXIS)

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

    x, iters = kernel(rows_loc, cols_ext, vals, freep, bp, x0p, dinvp)
    return x[:n], iters
