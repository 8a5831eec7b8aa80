"""ctypes bindings for the native meshkit library (native/meshkit.cpp).

Provides fast host-side mesh preprocessing (unique edges, RCM,
partitioning, .msh parsing) with transparent NumPy/SciPy fallbacks
when the shared library is missing.  The library is auto-built on
first use if a compiler is available (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load(build: bool = True):
    """Load (and if needed build) libmeshkit.so; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(_repo_root(), "native", "libmeshkit.so")
    if not os.path.exists(path) and build:
        try:
            subprocess.run(
                ["make", "-C", os.path.join(_repo_root(), "native")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.meshkit_unique_edges.restype = ctypes.c_int64
    lib.meshkit_unique_edges.argtypes = [
        i64p, ctypes.c_int64, ctypes.c_int, i64p, ctypes.c_int64, i64p,
    ]
    lib.meshkit_rcm.restype = None
    lib.meshkit_rcm.argtypes = [i64p, i64p, ctypes.c_int64, i64p]
    lib.meshkit_partition_cells.restype = None
    lib.meshkit_partition_cells.argtypes = [
        i64p, ctypes.c_int64, ctypes.c_int, ctypes.c_int64, ctypes.c_int, i32p,
    ]
    lib.meshkit_parse_msh.restype = ctypes.c_void_p
    lib.meshkit_parse_msh.argtypes = [ctypes.c_char_p]
    for name in ("meshkit_msh_n_nodes", "meshkit_msh_n_blocks",
                 "meshkit_msh_conn_size"):
        getattr(lib, name).restype = ctypes.c_int64
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.meshkit_msh_copy.restype = None
    lib.meshkit_msh_copy.argtypes = [ctypes.c_void_p, f64p, i64p, i64p, i64p, i64p]
    lib.meshkit_msh_free.restype = None
    lib.meshkit_msh_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def _i64(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def unique_edges(cells: np.ndarray):
    """Native unique-edge extraction; falls back to mesh.core."""
    lib = load()
    if lib is None:
        from .core import unique_edges as py_impl

        return py_impl(cells)
    cells = _i64(cells)
    nc, nvert = cells.shape
    nle = 3 if nvert == 3 else 6
    max_edges = nc * nle
    edges = np.empty((max_edges, 2), dtype=np.int64)
    cell_edges = np.empty((nc, nle), dtype=np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    ne = lib.meshkit_unique_edges(
        cells.ctypes.data_as(i64p), nc, nvert,
        edges.ctypes.data_as(i64p), max_edges,
        cell_edges.ctypes.data_as(i64p),
    )
    if ne < 0:
        raise RuntimeError("meshkit_unique_edges capacity error")
    return edges[:ne].copy(), cell_edges


def rcm(indptr: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Native RCM on a CSR graph; scipy fallback."""
    lib = load()
    n = len(indptr) - 1
    if lib is None:
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        g = sp.csr_matrix(
            (np.ones(len(indices), np.int8), _i64(indices), _i64(indptr)),
            shape=(n, n),
        )
        return np.asarray(reverse_cuthill_mckee(g, symmetric_mode=True), np.int64)
    indptr = _i64(indptr)
    indices = _i64(indices)
    perm = np.empty(n, dtype=np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.meshkit_rcm(
        indptr.ctypes.data_as(i64p), indices.ctypes.data_as(i64p), n,
        perm.ctypes.data_as(i64p),
    )
    return perm


def partition_cells(cell_dofs: np.ndarray, ndof: int, nparts: int) -> np.ndarray:
    """Shard assignment of cells by owned-dof range (native or numpy)."""
    lib = load()
    cell_dofs = _i64(cell_dofs)
    nc, nloc = cell_dofs.shape
    if lib is None:
        per = -(-ndof // nparts)
        return np.minimum(cell_dofs.min(axis=1) // per, nparts - 1).astype(np.int32)
    out = np.empty(nc, dtype=np.int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.meshkit_partition_cells(
        cell_dofs.ctypes.data_as(i64p), nc, nloc, ndof, nparts,
        out.ctypes.data_as(i32p),
    )
    return out


def parse_msh_fast(path: str):
    """Native $Nodes/$Elements parse.  Returns (coords (n,3),
    node_ids, blocks) with blocks = list of (dim, entity_tag, type,
    conn (n, nvert)) -- or None if the native lib is unavailable."""
    lib = load()
    if lib is None:
        return None
    h = lib.meshkit_parse_msh(path.encode())
    if not h:
        return None
    try:
        nn = lib.meshkit_msh_n_nodes(h)
        nb = lib.meshkit_msh_n_blocks(h)
        ncon = lib.meshkit_msh_conn_size(h)
        coords = np.empty((nn, 3), dtype=np.float64)
        node_ids = np.empty(nn, dtype=np.int64)
        meta = np.empty(nb * 4, dtype=np.int64)
        offs = np.empty(nb, dtype=np.int64)
        conn = np.empty(ncon, dtype=np.int64)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.meshkit_msh_copy(
            h, coords.ctypes.data_as(f64p), node_ids.ctypes.data_as(i64p),
            meta.ctypes.data_as(i64p), offs.ctypes.data_as(i64p),
            conn.ctypes.data_as(i64p),
        )
    finally:
        lib.meshkit_msh_free(h)
    nodes_per_type = {15: 1, 1: 2, 2: 3, 4: 4, 8: 3, 9: 6, 11: 10}
    blocks = []
    for b in range(nb):
        dim, tag, typ, n = meta[4 * b: 4 * b + 4]
        nv = nodes_per_type[int(typ)]
        start = offs[b]
        blocks.append(
            (int(dim), int(tag), int(typ), conn[start: start + n * nv].reshape(n, nv))
        )
    return coords, node_ids, blocks
