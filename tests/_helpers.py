"""Shared test helpers (not collected as tests)."""

import numpy as np


def integral_rel_l2(fe, vals, ref, cell_dofs, phi):
    """FE-integral relative L2 error -- the reference's acceptance
    metric (reference test/bowl_mixing_tests.jl:101-103): the error is
    integrated through the element basis, so it is invariant to dof
    numbering choices.  Handles scalar (n,) and vector (n, ncomp)
    fields."""
    import jax.numpy as jnp

    wq = jnp.asarray(fe.geom.wq)

    def norm2(v):
        fq = jnp.einsum("qi,ci->cq", jnp.asarray(phi),
                        jnp.asarray(v)[jnp.asarray(cell_dofs)])
        return float(jnp.einsum("cq,cq->", wq, fq ** 2))

    vals, ref = np.asarray(vals), np.asarray(ref)
    if vals.ndim == 2:
        num = sum(norm2(vals[:, c] - ref[:, c]) for c in range(vals.shape[1]))
        den = sum(norm2(ref[:, c]) for c in range(ref.shape[1]))
    else:
        num, den = norm2(vals - ref), norm2(ref)
    return num / den
