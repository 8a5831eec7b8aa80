"""Optional end-to-end runs on the reference's shipped gmsh meshes
(skipped when /root/reference is not mounted): exercises the .msh
reader + tag closure against real Gmsh output and reproduces the
bowl-mixing configuration on the exact reference discretization."""

import os

import numpy as np
import pytest

import nupgcm_tpu as npg

REF = "/root/reference/meshes"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference meshes not available"
)


def _mixing_model(mesh, nsteps=20):
    eps, alpha, mu = 2e-1, 0.5, 1e1
    params = npg.Parameters(
        eps=eps, alpha=alpha, mu_rho=mu, N2=1 / alpha,
        f=lambda x: 1.0 + 0.5 * x[1],
        H=lambda x: alpha * (1 - x[0] ** 2 - x[1] ** 2),
    )
    kap = lambda x: 1e-2 + np.exp(
        -(x[2] + alpha * (1 - x[0] ** 2 - x[1] ** 2)) / (0.1 * alpha)
    )
    forc = npg.Forcings(nu=1.0, kappa_h=kap, kappa_v=kap, tau_x=0.0, tau_y=0.0,
                        b_surface_bc=npg.SurfaceDirichletBC(0.0))
    spaces = npg.Spaces(
        mesh,
        u_diri_tags=["bottom", "coastline", "surface"],
        u_diri_vals=[(0, 0, 0)] * 3,
        u_diri_masks=[(True, True, True), (True, True, True), (False, False, True)],
        b_diri_tags=["coastline", "surface"], b_diri_vals=[0.0, 0.0],
    )
    fe = npg.FEData(mesh, spaces)
    dt = 1e-4 * mu / (alpha * eps) ** 2
    ts = npg.BDF2(t_start=0, t_stop=nsteps * dt, dt=dt)
    model = npg.PGModel(fe, params, forc, ts)
    return model


def test_reference_bowl2D_mixing():
    mesh = npg.read_msh(f"{REF}/bowl2D_1.000000e-01_5.000000e-01.msh")
    assert mesh.tdim == 2
    model = _mixing_model(mesh)
    st = model.run(model.rest_state(), n_info=0)
    u = np.asarray(st.u)
    b = np.asarray(st.b)
    assert np.isfinite(u).all() and np.isfinite(b).all()
    assert 1e-6 < np.abs(u).max() < 1e-1
    # mixing produces positive buoyancy perturbation at depth
    assert b.max() > 1e-4


def test_reference_bowl3D_mixing():
    mesh = npg.read_msh(f"{REF}/bowl3D_1.000000e-01_5.000000e-01.msh")
    assert mesh.tdim == 3
    model = _mixing_model(mesh, nsteps=10)
    st = model.run(model.rest_state(), n_info=0, steps_per_block=5)
    u = np.asarray(st.u)
    assert np.isfinite(u).all()
    assert 1e-6 < np.abs(u).max() < 1e-1
