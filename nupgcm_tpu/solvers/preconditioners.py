"""Preconditioners for the PG inversion/evolution solves.

Reference strategy (src/inversion.jl:42-59, src/evolution.jl:143-159,
src/preconditioners.jl):
  * evolution CG: Jacobi diag(A)^-1 (GPU / rebuilding paths) or LU (CPU)
  * inversion GMRES: constant diagonal (1/h^dim) on GPU, LU on CPU,
    experimental block-diagonal Stokes preconditioner (Elman 2014).

On TPU there is no sparse LU; instead we make the block-diagonal
Stokes preconditioner the first-class option -- velocity block solved
by a few inner Jacobi-CG iterations on the *symmetric* viscous
operator, pressure block by the scaled pressure mass matrix -- wrapped
in FGMRES.  This turns the reference's tens-of-thousands of
1/h^dim-preconditioned iterations (BASELINE.md) into O(100).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .cg import cg


def jacobi(diag: jnp.ndarray):
    """Pointwise inverse-diagonal preconditioner."""
    inv = 1.0 / diag
    return lambda r: inv * r


def const_diag(scale: float):
    """Constant diagonal scaling (reference 1/h^dim preconditioner)."""

    def M(r):
        return r / scale

    return M


@dataclass
class BlockStokesPrecond:
    """Block-diagonal preconditioner for the (u, p) saddle system.

    M^{-1} = diag( (A_visc)^{-1}_approx , ((1/a2e2) M_p)^{-1}_approx )

    where A_visc is the Dirichlet-pinned symmetric viscous block and
    M_p the pressure mass matrix; both inverted approximately by a
    fixed number of Jacobi-CG iterations.  Use with flexible GMRES.
    """

    visc_op: callable  # u-block operator (masked)
    visc_diag_inv: jnp.ndarray
    mp_op: callable  # pressure mass operator scaled by 1/a2e2
    mp_diag_inv: jnp.ndarray
    nu_dofs: int  # velocity dof count (static)
    inner_iters_u: int = 20
    inner_iters_p: int = 5

    def __call__(self, r: jnp.ndarray) -> jnp.ndarray:
        ru, rp = r[: self.nu_dofs], r[self.nu_dofs:]
        zu, _ = cg(
            self.visc_op, ru, jnp.zeros_like(ru),
            M_diag_inv=self.visc_diag_inv,
            atol=0.0, rtol=1e-8, itmax=self.inner_iters_u,
        )
        zp, _ = cg(
            self.mp_op, rp, jnp.zeros_like(rp),
            M_diag_inv=self.mp_diag_inv,
            atol=0.0, rtol=1e-8, itmax=self.inner_iters_p,
        )
        return jnp.concatenate([zu, zp])
