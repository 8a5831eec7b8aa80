"""Mesh-quality diagnostics, parity with reference
meshes/mesh_quality.jl:16-115 (inner-angle and volume statistics)."""

from __future__ import annotations

import math

import numpy as np

from .core import Mesh


def cell_volumes(mesh: Mesh) -> np.ndarray:
    _, detJ = mesh.cell_jacobians()
    return detJ / math.factorial(mesh.tdim)


def inner_angles(mesh: Mesh) -> np.ndarray:
    """All vertex angles of all cells, degrees.

    2D: the 3 triangle angles.  3D: the 12 face angles of each tet
    (3 per triangular face), matching the reference's per-face angle
    statistics.
    """
    X = mesh.coords[mesh.cells]  # (nc, nvert, 3)
    if mesh.tdim == 2:
        faces = [np.arange(3)]
    else:
        faces = [np.array(f) for f in
                 ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3))]
    out = []
    for f in faces:
        P = X[:, f, :]
        for i in range(3):
            a = P[:, (i + 1) % 3] - P[:, i]
            b = P[:, (i + 2) % 3] - P[:, i]
            cosang = np.einsum("nd,nd->n", a, b) / (
                np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
            )
            out.append(np.degrees(np.arccos(np.clip(cosang, -1, 1))))
    return np.concatenate(out)


def quality_report(mesh: Mesh) -> dict:
    vols = cell_volumes(mesh)
    angs = inner_angles(mesh)
    e = mesh.coords[mesh.edges]
    hs = np.linalg.norm(e[:, 0] - e[:, 1], axis=1)
    return {
        "n_cells": mesh.n_cells,
        "n_vertices": mesh.n_vertices,
        "volume_total": float(vols.sum()),
        "volume_min": float(vols.min()),
        "volume_max": float(vols.max()),
        "angle_min_deg": float(angs.min()),
        "angle_max_deg": float(angs.max()),
        "edge_min": float(hs.min()),
        "edge_median": float(np.median(hs)),
        "edge_max": float(hs.max()),
    }
