"""Reference-checkpoint (JLD2) interop.

The reference saves states as JLD2 files holding the free-value
vectors ``u``, ``p``, ``b`` and the scalar time ``t`` (reference
src/IO.jl:1-10).  JLD2 is an HDF5 dialect, and plain Float64 vectors
are ordinary HDF5 datasets -- h5py reads and writes them directly.

Caveat the reference shares (its checkpoints are not self-describing,
src/IO.jl note in SURVEY.md §5): the dof ORDER of those vectors is the
producer's.  The reference orders dofs by Gridap's internal numbering;
this framework orders by its own (RCM).  ``import_state`` therefore
takes optional permutations mapping reference order -> our canonical
mesh order; without them it assumes the vectors are already in our
canonical (pre-RCM) order, which holds for files written by
``export_state``.
"""

from __future__ import annotations

import numpy as np


def read_jld2(path: str) -> dict:
    """Read a JLD2/HDF5 file into a dict of NumPy arrays / scalars."""
    import h5py

    out = {}
    with h5py.File(path, "r") as f:
        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                try:
                    out[name] = obj[()]
                except Exception:
                    pass

        f.visititems(visit)
    return out


def export_state(model, state, path: str):
    """Write a reference-style checkpoint: datasets u (flat), p, b, t
    in our canonical (pre-RCM, mesh) dof order -- readable by JLD2's
    ``load`` and by ``import_state`` without permutations."""
    import h5py

    sp = model.fe.spaces
    u = sp.u_space.to_original_order(np.asarray(state.u))
    p = sp.p_space.to_original_order(np.asarray(state.p))
    b = sp.b_space.to_original_order(np.asarray(state.b))
    with h5py.File(path, "w") as f:
        f.create_dataset("u", data=u.reshape(-1).astype(np.float64))
        f.create_dataset("p", data=p.astype(np.float64))
        f.create_dataset("b", data=b.astype(np.float64))
        f.create_dataset("t", data=np.float64(state.t))


def import_state(model, path: str, perm_u=None, perm_p=None, perm_b=None):
    """Build a model State from a JLD2 checkpoint.

    ``perm_*``: optional index arrays mapping our canonical dof k to
    the file's entry perm[k] (needed for files written by the
    reference itself, whose Gridap dof order differs).  The velocity
    file vector is flat (3 components per node, node-major after
    permutation).
    """
    import jax.numpy as jnp

    from ..models.model import State

    d = read_jld2(path)
    sp = model.fe.spaces
    dt = model.dtype

    u = np.asarray(d["u"], np.float64)
    if perm_u is not None:
        u = u[np.asarray(perm_u)]
    u = sp.u_space.from_original_order(u.reshape(-1, 3))
    p = np.asarray(d["p"], np.float64)
    if perm_p is not None:
        p = p[np.asarray(perm_p)]
    # the reference's zero-mean pressure space drops one dof; pad if so
    if p.shape[0] == sp.n_p - 1:
        p = np.concatenate([p, [0.0]])
    p = sp.p_space.from_original_order(p)
    b = np.asarray(d["b"], np.float64)
    if perm_b is not None:
        b = b[np.asarray(perm_b)]
    b = sp.b_space.from_original_order(b)
    t = float(np.asarray(d.get("t", 0.0)))

    ub = jnp.asarray(u, dt)
    bb = jnp.asarray(b, dt)
    return State(
        u=ub, p=jnp.asarray(p, dt), b=bb, u_prev=ub, b_prev=bb,
        t=jnp.asarray(t, dt), dt=jnp.asarray(model.ts.dt, dt),
        step=jnp.asarray(0, jnp.int32),
    )
