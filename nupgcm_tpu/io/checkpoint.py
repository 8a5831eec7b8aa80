"""Checkpoint / resume (npz), parity with reference src/IO.jl:1-23.

Improvements over the reference (noted in SURVEY.md §5): checkpoints
are self-describing -- they carry mesh/dof counts and the time-stepper
clock so a mismatched restore fails loudly instead of silently
scattering values.
"""

from __future__ import annotations

import numpy as np


def save_state(model, state, path: str):
    """Write u/p/b + clock (reference save_state, src/IO.jl:1-10)."""
    np.savez_compressed(
        path,
        u=np.asarray(state.u),
        p=np.asarray(state.p),
        b=np.asarray(state.b),
        u_prev=np.asarray(state.u_prev),
        b_prev=np.asarray(state.b_prev),
        t=float(state.t),
        dt=float(state.dt),
        step=int(state.step),
        n_u=model.fe.spaces.n_u,
        n_p=model.fe.spaces.n_p,
        n_b=model.fe.spaces.n_b,
        n_cells=model.fe.mesh.n_cells,
        version=1,
    )


def load_state(model, path: str):
    """Restore a State (reference set_state_from_file!, src/IO.jl:12-23)."""
    import jax.numpy as jnp

    from ..models.model import State

    d = np.load(path)
    for key, expect in (("n_u", model.fe.spaces.n_u), ("n_p", model.fe.spaces.n_p),
                        ("n_b", model.fe.spaces.n_b), ("n_cells", model.fe.mesh.n_cells)):
        if int(d[key]) != expect:
            raise ValueError(
                f"checkpoint {path}: {key}={int(d[key])} does not match model ({expect})"
            )
    dt_ = model.dtype
    return State(
        u=jnp.asarray(d["u"], dt_),
        p=jnp.asarray(d["p"], dt_),
        b=jnp.asarray(d["b"], dt_),
        u_prev=jnp.asarray(d["u_prev"], dt_),
        b_prev=jnp.asarray(d["b_prev"], dt_),
        t=jnp.asarray(float(d["t"]), dt_),
        dt=jnp.asarray(float(d["dt"]), dt_),
        step=jnp.asarray(int(d["step"]), jnp.int32),
    )
