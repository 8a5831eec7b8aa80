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


def plot_slice(model, state, field="b", y=0.0, n=256, ofile="slice.png",
               quiver=False, cmap="RdBu_r"):
    """x-z slice at fixed y: pcolormesh of ``field`` with full-buoyancy
    contours (reference plot_slice, src/plotting.jl:60-200)."""
    plt = _mpl()
    mesh = model.fe.mesh
    p = mesh.coords
    xs = np.linspace(p[:, 0].min(), p[:, 0].max(), n)
    zs = np.linspace(p[:, 2].min(), p[:, 2].max(), n)
    xx, zz = np.meshgrid(xs, zs, indexing="ij")
    yy = np.full_like(xx, y if mesh.tdim == 3 else 0.0)
    pts = np.column_stack([xx.ravel(), yy.ravel(), zz.ravel()])
    ev = FieldEvaluator(mesh)
    sp = model.fe.spaces
    uvals = ev.eval(sp.u_space, np.asarray(state.u), pts)
    bvals = ev.eval(sp.b_space, np.asarray(state.b), pts)
    b_full = model.params.N2 * pts[:, 2] + bvals
    fields = {
        "u": uvals[:, 0], "v": uvals[:, 1], "w": uvals[:, 2],
        "b": b_full, "b_pert": bvals,
    }
    F = fields[field].reshape(n, n)
    fig, ax = plt.subplots(figsize=(6, 4))
    vmax = np.nanmax(np.abs(F)) or 1.0
    pc = ax.pcolormesh(xx, zz, F, cmap=cmap, vmin=-vmax, vmax=vmax, shading="auto")
    fig.colorbar(pc, ax=ax, label=field)
    B = b_full.reshape(n, n)
    try:
        ax.contour(xx, zz, B, colors="k", linewidths=0.4, levels=12)
    except Exception:
        pass
    if quiver:
        s = max(1, n // 24)
        ax.quiver(xx[::s, ::s], zz[::s, ::s],
                  fields["u"].reshape(n, n)[::s, ::s],
                  fields["w"].reshape(n, n)[::s, ::s], color="0.3", width=2e-3)
    ax.set_xlabel("x")
    ax.set_ylabel("z")
    ax.set_title(f"{field} at t = {float(state.t):.3e}")
    fig.savefig(ofile, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return ofile


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
    """Per-save plot bundle (reference sim_plots, src/plotting.jl:369-398)."""
    return [
        plot_slice(model, state, "b", ofile=f"{out_dir}/b_slice_{index:08d}.png"),
        plot_slice(model, state, "w", ofile=f"{out_dir}/w_slice_{index:08d}.png"),
        plot_profiles(model, state, ofile=f"{out_dir}/profiles_{index:08d}.png"),
    ]


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
