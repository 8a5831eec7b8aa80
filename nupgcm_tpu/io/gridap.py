"""Gridap dof-numbering reconstruction: reference-checkpoint interop.

The reference's golden states (``/root/reference/test/data/*.jld2``)
store free-dof vectors in Gridap's global dof numbering (reference
src/IO.jl:1-10 saves ``u/p/b`` free values of the Gridap FE spaces).
To cross-validate against them we reconstruct that numbering from the
same ``.msh`` file and map it onto this framework's canonical
(mesh-order) dof numbering.

Gridap's conforming-Lagrangian global numbering (Gridap
FESpaces/ConformingFESpaces.jl, reproduced behaviorally here and
validated bit-exactly against the reference's assembled-matrix golden
file ``test/data/A_bowl_mixing_2D.jld2``):

  * model faces are ordered by dimension: vertices (gmsh node-tag
    order), then edges;
  * edges are enumerated first-touch over (cell, local-edge) with the
    polytope local edge order TRI [[0,1],[0,2],[1,2]] / TET
    [[0,1],[0,2],[1,2],[0,3],[1,3],[2,3]].  Empirically the reference's
    2D golden files use the RAW file connectivity (validated to 5e-15
    against test/data/A_bowl_mixing_2D.jld2) while the 3D ones use each
    cell's vertex list SORTED ascending (raw scrambles P2 edge dofs --
    H1 energy of the imported golden b jumps 0.43->0.76; all 720
    local-edge orders on raw were tried and none matches).  Likely a
    Gridap version difference between the generation epochs of the
    golden files; both conventions are pinned by the always-on golden
    tests (tests/test_golden_reference.py);
  * each face owns its interior Lagrange dofs; P2 => one per vertex
    and one per edge.  Vector-valued spaces own ``ncomp`` dofs per
    node, component-consecutive;
  * free dofs are numbered in face order, skipping Dirichlet
    (node, component) pairs; Dirichlet dofs get a separate (negative)
    numbering we do not need;
  * the ``:zeromean`` pressure space is ``FESpaceWithConstantFixed``
    fixing the LAST free dof of the unconstrained space (Gridap
    ZeroMeanFESpace), so its free dofs are vertices 0..nv-2.

The multifield inversion vector is [u free; p free] (reference
src/dofs.jl:54-60).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# Gridap polytope local edges, 0-based (Gridap get_faces(TRI/TET, 1, 0))
GRIDAP_LOCAL_EDGES = {
    2: ((0, 1), (0, 2), (1, 2)),
    3: ((0, 1), (0, 2), (1, 2), (0, 3), (1, 3), (2, 3)),
}


def first_touch_edges(cells: np.ndarray, local_edges, sort_cells: bool = False) -> np.ndarray:
    """Edge list (vmin, vmax) in Gridap's first-touch global order:
    iterate cells in file order, local edges in polytope order, number
    each unseen vertex-pair when first encountered.  ``sort_cells``
    pre-sorts each cell's vertex list (see module docstring)."""
    led = np.asarray(local_edges)
    if sort_cells:
        cells = np.sort(cells, axis=1)
    pairs = np.sort(cells[:, led].reshape(-1, 2), axis=1)
    nv = int(cells.max()) + 1
    keys = pairs[:, 0] * np.int64(nv) + pairs[:, 1]
    _, first_idx = np.unique(keys, return_index=True)
    order = np.sort(first_idx)  # first-touch order of unique edges
    return pairs[order]


@dataclass
class GridapMaps:
    """Gridap free-dof index -> this framework's canonical dof.

    ``u_free``: (n,) canonical flat velocity dof (3*node + comp);
    ``p_free``: (n,) canonical vertex id; ``b_free``: (n,) canonical
    P2 node id.  Canonical = mesh order (vertices then sorted-unique
    edges), i.e. pre-RCM.
    """

    u_free: np.ndarray
    p_free: np.ndarray
    b_free: np.ndarray
    node_order: np.ndarray  # Gridap P2 node k -> canonical node


def gridap_maps(msh_path: str, spaces, sort_cells=None) -> GridapMaps:
    """Reconstruct Gridap's free-dof numbering for the reference's
    Taylor-Hood + P2-buoyancy spaces on ``msh_path``, expressed in
    this framework's canonical dof ids.

    ``spaces`` must be built on the Mesh read from the same file; its
    Dirichlet masks define which (node, comp) are constrained (the
    configurations match the reference's since both take the same
    tags/masks).
    """
    from ..mesh.core import find_edges
    from ..mesh.gmsh_reader import read_msh_arrays

    _, raw_cells, _, tdim = read_msh_arrays(msh_path)
    mesh = spaces.mesh
    nv = mesh.n_vertices

    if sort_cells is None:
        sort_cells = tdim == 3  # empirical per-dimension convention
    g_edges = first_touch_edges(raw_cells, GRIDAP_LOCAL_EDGES[tdim],
                                sort_cells=sort_cells)
    my_edge = find_edges(mesh._edge_keys, mesh._edge_order, g_edges, nv)
    # Gridap P2 node k -> canonical node id
    node_order = np.concatenate([np.arange(nv, dtype=np.int64), nv + my_edge])

    # canonical-order Dirichlet masks
    u_mask = spaces.u_space.to_original_order(spaces.u_bc.mask)  # (ndof, 3)
    b_mask = spaces.b_space.to_original_order(spaces.b_bc.mask)  # (ndof,)

    free_uc = ~u_mask[node_order]  # (ndof, 3) in Gridap node order
    comp = np.arange(3, dtype=np.int64)
    flat = 3 * node_order[:, None] + comp[None, :]
    u_free = flat[free_uc]  # row-major: node-major, comp-consecutive

    b_free = node_order[~b_mask[node_order]]

    # pressure: P1, no Dirichlet, zeromean fixes the last dof
    p_free = np.arange(nv - 1, dtype=np.int64)

    return GridapMaps(u_free=u_free, p_free=p_free, b_free=b_free,
                      node_order=node_order)


def state_from_reference(model, path: str, maps: GridapMaps):
    """Build a model State from a reference-written JLD2 checkpoint
    (Gridap free-dof order).  Dirichlet dofs take the model's BC
    values; the zero-mean pressure is reconstructed with fixed dof 0
    then volume-mean-projected (matching Gridap's ZeroMeanFESpace
    evaluation semantics up to the projection this model applies
    anyway)."""
    import jax.numpy as jnp

    from ..models.model import State
    from .jld2 import read_jld2

    d = read_jld2(path)
    sp = model.fe.spaces
    dt = model.dtype

    # full canonical vectors seeded with Dirichlet values
    u_can = sp.u_space.to_original_order(
        np.asarray(model.const["udiri"], np.float64).reshape(-1, 3)
    ).reshape(-1)
    u_can[maps.u_free] = np.asarray(d["u"], np.float64)
    b_can = sp.b_space.to_original_order(
        np.asarray(model.const["bdiri"], np.float64)
    )
    b_can[maps.b_free] = np.asarray(d["b"], np.float64)
    p_can = np.zeros(sp.n_p)
    p_can[maps.p_free] = np.asarray(d["p"], np.float64)

    u = sp.u_space.from_original_order(u_can.reshape(-1, 3))
    b = sp.b_space.from_original_order(b_can)
    p = sp.p_space.from_original_order(p_can)
    pw = np.asarray(model.ops["p_volw"], np.float64)
    p = p - (pw @ p) / pw.sum()
    t = float(np.asarray(d.get("t", 0.0)))

    ub = jnp.asarray(u, dt)
    bb = jnp.asarray(b, dt)
    return State(
        u=ub, p=jnp.asarray(p, dt), b=bb, u_prev=ub, b_prev=bb,
        t=jnp.asarray(t, dt), dt=jnp.asarray(model.ts.dt, dt),
        step=jnp.asarray(0, jnp.int32),
    )


def read_jld2_csc(path: str, name: str):
    """Read a Julia SparseMatrixCSC stored by JLD2 (compound dataset
    with object references for colptr/rowval/nzval) as scipy CSC."""
    import h5py
    import scipy.sparse as sps

    with h5py.File(path, "r") as f:
        rec = f[name][()]
        m, n = int(rec["m"]), int(rec["n"])
        colptr = np.asarray(f[rec["colptr"]][()], np.int64) - 1
        rowval = np.asarray(f[rec["rowval"]][()], np.int64) - 1
        nzval = np.asarray(f[rec["nzval"]][()], np.float64)
    return sps.csc_matrix((nzval, rowval, colptr), shape=(m, n))


def assemble_inversion_csr(model):
    """Assemble the full (unconstrained) inversion operator as scipy
    CSR over the canonical combined dof vector [3*node+comp; 3*ndof_u
    + vertex] -- for golden-matrix regression against the reference's
    ``A_inversion`` (reference test/bowl_mixing_tests.jl:51-64)."""
    import jax.numpy as jnp
    import scipy.sparse as sps

    from ..fem import assembly as asm

    fe = model.fe
    c = model.const
    elem = asm.elem_inversion(
        jnp.asarray(c["wq"], jnp.float64),
        jnp.asarray(c["nu_q"], jnp.float64),
        jnp.asarray(c["f_q"], jnp.float64),
        jnp.asarray(c["phi_u"], jnp.float64),
        asm.physical_grads(
            jnp.asarray(c["invJT"], jnp.float64),
            jnp.asarray(c["dphi_u"], jnp.float64),
            jnp.asarray(c["embed"], jnp.float64),
        ),
        jnp.asarray(c["phi_p"], jnp.float64),
        jnp.asarray(model.params.a2e2, jnp.float64),
        model.variable_nu,
    )
    plan = fe.plan_inv
    vals = np.asarray(plan.assemble(elem))
    A_cur = sps.csr_matrix(
        (vals, (plan.rows, plan.cols)), shape=(fe.n_inv, fe.n_inv)
    )
    # current (RCM) -> canonical permutation of the combined vector
    sp_ = fe.spaces
    us, ps = sp_.u_space, sp_.p_space
    pu = us._perm if hasattr(us, "_perm") else np.arange(us.ndof)
    pp = ps._perm if hasattr(ps, "_perm") else np.arange(ps.ndof)
    cur_of_canon = np.empty(fe.n_inv, np.int64)
    inv_u = np.empty(us.ndof, np.int64)
    inv_u[pu] = np.arange(us.ndof)
    inv_p = np.empty(ps.ndof, np.int64)
    inv_p[pp] = np.arange(ps.ndof)
    nodes = np.arange(us.ndof)
    for comp in range(3):
        cur_of_canon[3 * nodes + comp] = 3 * inv_u[nodes] + comp
    cur_of_canon[3 * us.ndof:] = 3 * us.ndof + inv_p
    return A_cur[cur_of_canon][:, cur_of_canon].tocsr()
