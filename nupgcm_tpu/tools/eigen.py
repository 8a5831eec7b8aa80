"""Eigenmode analysis of the PG operators.

Capability parity with the reference's KrylovKit-based eigenanalysis
(reference scratch/eigen.jl): wrap the device operators as scipy
LinearOperators and compute leading/trailing eigenpairs on host.
Useful for inspecting inversion conditioning, evolution stiffness, and
wave modes.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse.linalg as spla


def _as_linop(matvec, n, dtype=np.float64, precision=None):
    import jax
    import jax.numpy as jnp

    from ..utils.precision import scoped_precision

    jitted = jax.jit(scoped_precision(matvec, precision))

    def mv(v):
        return np.asarray(jitted(jnp.asarray(v.reshape(-1))), dtype=dtype)

    return spla.LinearOperator((n, n), matvec=mv, dtype=dtype)


def evolution_spectrum(model, k: int = 6, which: str = "LM"):
    """Leading eigenvalues of the Dirichlet-pinned evolution operator
    A = M + theta (Kh + Kv)."""
    import jax.numpy as jnp

    from ..ops.sparse import MaskedOperator

    theta = float(model.ts.dt) * model.params.a2e2 / model.params.mu_rho
    A = MaskedOperator(model._evo_matrix(model.ops, jnp.asarray(theta, model.dtype)),
                       model.const["free_b"])
    n = model.fe.spaces.n_b
    vals = spla.eigsh(_as_linop(A, n, precision=model.matmul_precision), k=k, which=which, tol=1e-8,
                      return_eigenvectors=False)
    return np.sort(vals)


def inversion_spectrum(model, k: int = 6, which: str = "LM", sigma=None):
    """Eigenvalues of the Dirichlet-pinned saddle inversion operator
    (nonsymmetric; use which='SM'/sigma for the small end)."""
    from ..ops.sparse import MaskedOperator

    A = MaskedOperator(model._inv_matrix(model.ops), model.const["free_inv"])
    n = model.fe.n_inv
    vals = spla.eigs(_as_linop(A, n, precision=model.matmul_precision), k=k, which=which, sigma=sigma,
                     tol=1e-6, return_eigenvectors=False)
    return vals[np.argsort(np.abs(vals))]


def preconditioned_inversion_spectrum(model, k: int = 6):
    """Eigenvalues of M^-1 A (block-Stokes preconditioned saddle
    operator) -- the quantity that controls GMRES convergence."""
    from ..ops.sparse import MaskedOperator

    A = MaskedOperator(model._inv_matrix(model.ops), model.const["free_inv"])
    M, _ = model._make_inv_precond(model.ops)
    n = model.fe.n_inv

    def op(v):
        return M(A(v))

    vals = spla.eigs(_as_linop(op, n, precision=model.matmul_precision), k=k, which="LM", tol=1e-6,
                     return_eigenvectors=False)
    return vals[np.argsort(np.abs(vals))]
