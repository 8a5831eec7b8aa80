"""Plotting: slices, profiles, simulation bundles, sparsity patterns.

Functional parity with the reference's PyPlot layer (reference
src/plotting.jl): ``plot_slice`` (pcolormesh + buoyancy contours +
optional quiver), ``plot_profiles`` (u, v, w, alpha*dz(b) columns),
``sim_plots`` (per-save bundle), ``plot_sparsity_pattern``.  Uses
matplotlib directly (the reference goes through PyCall to the same
library) and the FE point evaluator for sampling.
"""

from __future__ import annotations

import numpy as np

from .postprocess import Grid3, sample_state
from .utils.pointeval import FieldEvaluator


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _fill_isolated_nans(F):
    """Fill NaNs that have 4 finite neighbors with their mean
    (reference plot_slice NaN filling, src/plotting.jl:97-111)."""
    nan = np.isnan(F)
    if not nan.any():
        return F
    Fp = np.pad(F, 1, mode="edge")
    nbrs = np.stack([Fp[:-2, 1:-1], Fp[2:, 1:-1], Fp[1:-1, :-2], Fp[1:-1, 2:]])
    fill = nan & np.isfinite(nbrs).all(axis=0)
    F[fill] = nbrs.mean(axis=0)[fill]
    return F


class SliceCache:
    """Precomputed point locations + basis tabulations for one slice
    plane -- the reference's reusable plot cache (src/plotting.jl:84-92):
    per-save bundles re-evaluate fields with one gather + einsum."""

    def __init__(self, model, x=None, y=None, z=None, n=256):
        mesh = model.fe.mesh
        p = mesh.coords
        if z is not None:  # horizontal slice (3D)
            a = np.linspace(p[:, 0].min(), p[:, 0].max(), n)
            b = np.linspace(p[:, 1].min(), p[:, 1].max(), n)
            aa, bb = np.meshgrid(a, b, indexing="ij")
            pts = np.column_stack([aa.ravel(), bb.ravel(),
                                   np.full(n * n, z)])
            self.labels = ("x", "y")
        elif x is not None:  # y-z slice (3D)
            a = np.linspace(p[:, 1].min(), p[:, 1].max(), n)
            b = np.linspace(p[:, 2].min(), p[:, 2].max(), n)
            aa, bb = np.meshgrid(a, b, indexing="ij")
            pts = np.column_stack([np.full(n * n, x), aa.ravel(), bb.ravel()])
            self.labels = ("y", "z")
        else:  # x-z slice at fixed y (default; y ignored on 2D meshes)
            y = 0.0 if y is None else y
            a = np.linspace(p[:, 0].min(), p[:, 0].max(), n)
            b = np.linspace(p[:, 2].min(), p[:, 2].max(), n)
            aa, bb = np.meshgrid(a, b, indexing="ij")
            yy = np.full(n * n, y if mesh.tdim == 3 else 0.0)
            pts = np.column_stack([aa.ravel(), yy, bb.ravel()])
            self.labels = ("x", "z")
        self.n = n
        self.aa, self.bb = aa, bb
        self.pts = pts
        ev = FieldEvaluator(mesh)
        sp = model.fe.spaces
        self.eval_u = ev.prepare(sp.u_space, pts)
        self.eval_b = ev.prepare(sp.b_space, pts)


def plot_slice(model, state, field="b", x=None, y=None, z=None, n=256,
               ofile="slice.png", quiver=False, cmap="RdBu_r", cache=None):
    """Slice plot: pcolormesh of ``field`` with full-buoyancy contours
    and optional in-plane quiver (reference plot_slice,
    src/plotting.jl:60-200).  Slice plane chosen by which of x/y/z is
    given (default: x-z plane at y=0).  Pass the returned ``cache``
    back in to skip point location on subsequent saves."""
    plt = _mpl()
    if cache is None:
        cache = SliceCache(model, x=x, y=y, z=z, n=n)
    n = cache.n
    uvals = cache.eval_u(np.asarray(state.u))
    bvals = cache.eval_b(np.asarray(state.b))
    b_full = model.params.N2 * cache.pts[:, 2] + bvals
    fields = {
        "u": uvals[:, 0], "v": uvals[:, 1], "w": uvals[:, 2],
        "b": b_full, "b_pert": bvals,
    }
    F = _fill_isolated_nans(fields[field].reshape(n, n).copy())
    fig, ax = plt.subplots(figsize=(6, 4))
    vmax = np.nanmax(np.abs(F)) or 1.0
    pc = ax.pcolormesh(cache.aa, cache.bb, F, cmap=cmap, vmin=-vmax,
                       vmax=vmax, shading="auto")
    fig.colorbar(pc, ax=ax, label=field)
    B = _fill_isolated_nans(b_full.reshape(n, n).copy())
    try:
        ax.contour(cache.aa, cache.bb, B, colors="k", linewidths=0.4, levels=12)
    except Exception:
        pass
    if quiver:
        s = max(1, n // 24)
        comp = {"x": "u", "y": "v", "z": "w"}
        qa = fields[comp[cache.labels[0]]].reshape(n, n)
        qb = fields[comp[cache.labels[1]]].reshape(n, n)
        ax.quiver(cache.aa[::s, ::s], cache.bb[::s, ::s],
                  qa[::s, ::s], qb[::s, ::s], color="0.3", width=2e-3)
    ax.set_xlabel(cache.labels[0])
    ax.set_ylabel(cache.labels[1])
    ax.set_title(f"{field} at t = {float(state.t):.3e}")
    fig.savefig(ofile, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return cache


def plot_profiles(model, state, x=0.5, y=0.0, n=128, ofile="profiles.png"):
    """Vertical profiles of u, v, w, alpha*dz(b) at (x, y)
    (reference plot_profiles, src/plotting.jl:202-281)."""
    plt = _mpl()
    mesh = model.fe.mesh
    p = mesh.coords
    zs = np.linspace(p[:, 2].min(), 0.0, n)
    pts = np.column_stack([np.full(n, x), np.full(n, y if mesh.tdim == 3 else 0.0), zs])
    ev = FieldEvaluator(mesh)
    sp = model.fe.spaces
    uvals = ev.eval(sp.u_space, np.asarray(state.u), pts)
    bvals = ev.eval(sp.b_space, np.asarray(state.b), pts)
    alpha, N2 = model.params.alpha, model.params.N2
    bz = np.gradient(bvals, zs)
    abz = alpha * (N2 + bz)
    fig, axs = plt.subplots(1, 4, figsize=(10, 4), sharey=True)
    for ax, vals, name in zip(
        axs, [uvals[:, 0], uvals[:, 1], uvals[:, 2], abz],
        ["u", "v", "w", r"$\alpha \partial_z b$"],
    ):
        ax.plot(vals, zs)
        ax.set_xlabel(name)
        ax.grid(alpha=0.3)
    axs[0].set_ylabel("z")
    fig.suptitle(f"profiles at (x, y) = ({x}, {y}), t = {float(state.t):.3e}")
    fig.savefig(ofile, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return ofile


def sim_plots(model, state, out_dir=".", index=0):
    """Per-save plot bundle (reference sim_plots, src/plotting.jl:369-398).
    The slice cache is memoized on the model so repeated saves skip
    point location (the reference's cache-reuse pattern)."""
    cache = getattr(model, "_slice_cache", None)
    files = [f"{out_dir}/b_slice_{index:08d}.png",
             f"{out_dir}/w_slice_{index:08d}.png",
             f"{out_dir}/profiles_{index:08d}.png"]
    cache = plot_slice(model, state, "b", ofile=files[0], cache=cache)
    plot_slice(model, state, "w", ofile=files[1], quiver=True, cache=cache)
    model._slice_cache = cache
    plot_profiles(model, state, ofile=files[2])
    return files


def plot_tri_mesh(model, vals, cb_label="", ofile="tri_mesh.png"):
    """Gouraud-shaded tripcolor of nodal values on the (x, z) plane of
    a 2D mesh (reference plot_tri_mesh, src/plotting.jl:418-441).

    ``vals``: per-vertex values, or a full P2 dof vector (vertex part
    is used -- P2 dofs are vertices then edge midpoints).
    """
    plt = _mpl()
    mesh = model.fe.mesh if hasattr(model, "fe") else model
    p, t = mesh.coords, mesh.cells
    vals = np.asarray(vals)
    if vals.ndim > 1:
        vals = vals.reshape(vals.shape[0], -1)[:, 0]
    vals = vals[: mesh.n_vertices]
    fig, ax = plt.subplots(1)
    vmax = np.nanmax(np.abs(vals)) or 1.0
    img = ax.tripcolor(p[:, 0], p[:, 2], t[:, :3], vals, shading="gouraud",
                       vmin=-vmax, vmax=vmax, cmap="RdBu_r", rasterized=True)
    cb = fig.colorbar(img, ax=ax, label=cb_label)
    cb.ax.ticklabel_format(style="sci", scilimits=(-2, 2), useMathText=True)
    ax.set_xlabel("x")
    ax.set_ylabel("z")
    for s in ("left", "bottom"):
        ax.spines[s].set_visible(False)
    fig.savefig(ofile, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return ofile


def plot_slice_wave(model, u_dofs, b_dofs, N2, k, omega, y=0.0, n=256,
                    ofile="slice_wave.png", cb_label=""):
    """Wave-mode slice: real part of complex eigenmode fields carried
    on e^{ikx} (reference plot_slice_wave, src/plotting.jl:461-543).

    ``u_dofs``/``b_dofs``: complex dof vectors of an eigenmode (from
    tools.eigen); plots Re(w e^{ikx}) with contours of the full
    buoyancy N2 z + Re(b e^{ikx}) on the x-z plane at fixed y.
    """
    plt = _mpl()
    mesh = model.fe.mesh
    sp = model.fe.spaces
    p = mesh.coords
    xs = np.linspace(-np.pi / k, np.pi / k, n)
    zs = np.linspace(p[:, 2].min(), 0.0, n)
    xx, zz = np.meshgrid(xs, zs, indexing="ij")
    # the mesh lives in its own x range; evaluate at x mod domain
    xm = p[:, 0].min() + np.mod(xx - p[:, 0].min(), np.ptp(p[:, 0]) or 1.0)
    pts = np.column_stack([
        xm.ravel(), np.full(n * n, y if mesh.tdim == 3 else 0.0), zz.ravel()
    ])
    ev = FieldEvaluator(mesh)
    u_dofs, b_dofs = np.asarray(u_dofs), np.asarray(b_dofs)
    ur = ev.eval(sp.u_space, u_dofs.real, pts)
    ui = ev.eval(sp.u_space, u_dofs.imag, pts)
    br = ev.eval(sp.b_space, b_dofs.real, pts)
    bi = ev.eval(sp.b_space, b_dofs.imag, pts)
    carrier = np.exp(1j * k * xx.ravel())
    w = np.real((ur[:, 2] + 1j * ui[:, 2]) * carrier).reshape(n, n)
    b = (N2 * zz.ravel() + np.real((br + 1j * bi) * carrier)).reshape(n, n)
    # fill isolated NaNs with 4-neighbor means (reference :497-511)
    for F in (w, b):
        nan = np.isnan(F)
        if nan.any():
            Fp = np.pad(F, 1, mode="edge")
            nb = np.nanmean(
                np.stack([Fp[:-2, 1:-1], Fp[2:, 1:-1], Fp[1:-1, :-2], Fp[1:-1, 2:]]),
                axis=0,
            )
            F[nan] = nb[nan]
    fig, ax = plt.subplots(1)
    vmax = np.nanmax(np.abs(w)) or 1.0
    pc = ax.pcolormesh(xx, zz, w, cmap="RdBu_r", vmin=-vmax, vmax=vmax,
                       shading="auto", rasterized=True)
    fig.colorbar(pc, ax=ax, label=cb_label or "Re(w)")
    try:
        ax.contour(xx, zz, b, colors="k", linewidths=0.4, levels=12)
    except Exception:
        pass
    ax.set_xlabel("x")
    ax.set_ylabel("z")
    ax.set_title(f"omega = {omega:.4g}")
    fig.savefig(ofile, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return ofile


def plot_sparsity_pattern(plan, ofile="sparsity.png", markersize=0.1):
    """Sparsity of an assembled operator (reference
    plot_sparsity_pattern, src/plotting.jl:545-578)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.plot(plan.cols, plan.rows, ",", markersize=markersize)
    ax.invert_yaxis()
    ax.set_aspect("equal")
    ax.set_title(f"nnz = {plan.nnz}")
    fig.savefig(ofile, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return ofile
