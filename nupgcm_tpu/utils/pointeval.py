"""FE field evaluation at arbitrary physical points (host-side).

Parity with the reference's ``nan_eval`` (reference
src/plotting.jl:9-31): evaluate an FE function at scattered points,
returning NaN outside the domain.  Used by plotting and the
postprocessing diagnostics (slices, streamfunctions) without any
pyvista dependency.

Cell location: candidate cells from a centroid KD-tree, then exact
barycentric containment test on the affine simplex.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

from ..fem.reference import tabulate


class FieldEvaluator:
    def __init__(self, mesh):
        self.mesh = mesh
        X = mesh.cell_coords()  # (nc, nvert, tdim) plane coords
        self.X0 = X[:, 0, :]
        J = np.transpose(X[:, 1:, :] - X[:, :1, :], (0, 2, 1))
        self.invJ = np.linalg.inv(J)
        cent = X.mean(axis=1)
        self.tree = cKDTree(cent)
        self.h = mesh.h_cells()
        self.k = min(32, mesh.n_cells)

    def locate(self, pts_plane: np.ndarray, tol: float = 1e-10):
        """Find containing cell + reference coords for (n, tdim) points.

        Returns (cell_ids (n,), ref_coords (n, tdim)); cell_id = -1
        where the point is outside the domain.
        """
        n = len(pts_plane)
        _, cand = self.tree.query(pts_plane, k=self.k)
        cand = np.atleast_2d(cand)
        cells = np.full(n, -1, dtype=np.int64)
        refs = np.zeros((n, self.mesh.tdim))
        for j in range(cand.shape[1]):
            todo = cells == -1
            if not todo.any():
                break
            c = cand[todo, j]
            xi = np.einsum(
                "nij,nj->ni", self.invJ[c], pts_plane[todo] - self.X0[c]
            )
            lam0 = 1.0 - xi.sum(axis=1)
            inside = (xi.min(axis=1) >= -tol) & (lam0 >= -tol)
            idx = np.where(todo)[0][inside]
            cells[idx] = c[inside]
            refs[idx] = xi[inside]
        return cells, refs

    def eval(self, space, dof_vals: np.ndarray, pts3: np.ndarray):
        """Evaluate a field (dof vector on ``space``) at (n, 3) physical
        points; NaN outside.  2D meshes use the (x, z) columns."""
        pts3 = np.atleast_2d(np.asarray(pts3, dtype=np.float64))
        pts_plane = pts3[:, self.mesh.plane_axes]
        cells, refs = self.locate(pts_plane)
        vals = np.asarray(dof_vals, dtype=np.float64)
        out_shape = (len(pts3),) + vals.shape[1:]
        out = np.full(out_shape, np.nan)
        ok = cells >= 0
        if not ok.any():
            return out
        cd = self.mesh.cells if space.order == 1 else None
        if space.order == 1:
            cell_dofs = space.cell_dofs[cells[ok]]
        else:
            cell_dofs = space.cell_dofs[cells[ok]]
        phi, _ = tabulate(self.mesh.tdim, space.order, refs[ok])
        # phi rows correspond 1:1 to the ok points
        gathered = vals[cell_dofs]  # (m, nloc, ...)
        out[ok] = np.einsum("mi,mi...->m...", phi, gathered)
        return out


def nan_eval(evaluator: FieldEvaluator, space, dof_vals, pts3):
    """Reference-parity convenience wrapper."""
    return evaluator.eval(space, dof_vals, pts3)
