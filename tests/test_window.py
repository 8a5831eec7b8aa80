"""Windowed one-hot MXU matvec kernels (ops/window.py).

Runs the Pallas kernels in interpreter mode on CPU against the
take-path element operators (ops/element.py) -- same element tensors,
same dof tables, rel error ~1 ulp.  On-TPU validation is bench.py
section D (the 50-step golden runs through the windowed path there).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import nupgcm_tpu as npg
from nupgcm_tpu.ops import window as W
from nupgcm_tpu.ops.element import ElementOperator, SaddleOperator


@pytest.fixture(scope="module")
def setup():
    W._INTERPRET = True
    mesh = npg.generators.bowl3D(0.35, 0.5, nz=3)
    spaces = npg.Spaces(mesh, u_diri_tags=[], u_diri_vals=[],
                        b_diri_tags=[], b_diri_vals=[])
    fe = npg.FEData(mesh, spaces)
    rng = np.random.default_rng(0)
    nc = fe.n_cells_padded
    nlu, nlp = fe.cd_u.shape[1], fe.cd_p.shape[1]
    tensors = {
        "uu": jnp.asarray(rng.standard_normal((nc, 3 * nlu, 3 * nlu)), jnp.float32),
        "up": jnp.asarray(rng.standard_normal((nc, 3 * nlu, nlp)), jnp.float32),
        "pu": jnp.asarray(rng.standard_normal((nc, nlp, 3 * nlu)), jnp.float32),
    }
    yield fe, spaces, tensors, rng
    W._INTERPRET = False


def test_plan_invariants(setup):
    fe, spaces, _, _ = setup
    plan = W.build_window_plan(fe.cd_u, fe.cd_p, spaces.u_space.ndof,
                               spaces.n_p, B=128)
    assert plan.nb == -(-fe.n_cells_padded // 128)
    # every unmasked index reconstructs its global dof (blocks may be
    # permuted into width buckets: bperm[i] = original block id)
    a = plan.a_u.reshape(plan.nb, fe.cd_u.shape[1], 128)
    t = plan.t_u.reshape(plan.nb, fe.cd_u.shape[1], 128)
    borig = plan.bperm if plan.bperm is not None else np.arange(plan.nb)
    if plan.buckets is not None:
        assert sum(e[0] for e in plan.buckets) == plan.nb
        assert max(e[1] for e in plan.buckets) == plan.W1u
    for i, b in enumerate(borig):
        blk = fe.cd_u[b * 128:(b + 1) * 128]
        g = (plan.w0u[i] * 128 + a[i] * 128 + t[i]).T[:len(blk)]
        m = a[i].T[:len(blk)] >= 0
        assert np.array_equal(g[m], blk[m])
        assert m.all()  # no real cell masked
        # window bound honored
        assert (a[i][a[i] >= 0] < plan.W1u).all()


def test_saddle_modes_match_take_path(setup):
    fe, spaces, T, rng = setup
    plan = W.build_window_plan(fe.cd_u, fe.cd_p, spaces.u_space.ndof,
                               spaces.n_p, B=128)
    uu_b, up_b, pu_b = W.blocked_saddle_tensors(T["uu"], T["up"], T["pu"], plan)
    sop = SaddleOperator(
        uu=T["uu"], up=T["up"], pu=T["pu"],
        cd_u=jnp.asarray(fe.cd_u, jnp.int32),
        cd_p=jnp.asarray(fe.cd_p, jnp.int32),
        u_plan=fe.vec_plan_u_nodes, p_plan=fe.vec_plan_p,
        n_u_nodes=spaces.u_space.ndof)
    N = spaces.n_u + spaces.n_p
    x = jnp.asarray(rng.standard_normal(N), jnp.float32)

    y = np.asarray(W.saddle_matvec(uu_b, up_b, pu_b, x, plan, "full"))
    y0 = np.asarray(sop.matvec(x))
    assert np.abs(y - y0).max() < 2e-6 * np.abs(y0).max()

    xu = x[:spaces.n_u]
    yu = np.asarray(W.saddle_matvec(uu_b, None, None, xu, plan, "uu"))
    vop = SaddleOperator(
        uu=T["uu"], up=None, pu=None,
        cd_u=jnp.asarray(fe.cd_u, jnp.int32),
        cd_p=np.zeros((fe.n_cells_padded, 0), np.int32),
        u_plan=fe.vec_plan_u_nodes, p_plan=fe.vec_plan_p,
        n_u_nodes=spaces.u_space.ndof)
    assert np.abs(yu - np.asarray(vop.matvec(xu))).max() < 2e-6 * np.abs(yu).max()

    xp = x[spaces.n_u:]
    yup = np.asarray(W.saddle_matvec(None, up_b, None, xp, plan, "up"))
    assert np.abs(yup - np.asarray(sop.up_matvec(xp))).max() < 2e-6 * np.abs(yup).max()


def test_scalar_matches_take_path(setup):
    fe, spaces, _, rng = setup
    nc = fe.n_cells_padded
    nlb = fe.cd_b.shape[1]
    ae = jnp.asarray(rng.standard_normal((nc, nlb, nlb)), jnp.float32)
    bop = ElementOperator(Ae=ae, cd_rows=jnp.asarray(fe.cd_b, jnp.int32),
                          cd_cols=jnp.asarray(fe.cd_b, jnp.int32),
                          row_plan=fe.vec_plan_b)
    plan = W.build_window_plan(fe.cd_b, np.zeros((nc, 0)), spaces.n_b, 0,
                               B=128)
    ae_b = W.blocked_scalar_tensor(ae, plan)
    x = jnp.asarray(rng.standard_normal(spaces.n_b), jnp.float32)
    y = np.asarray(W.scalar_matvec(ae_b, x, plan))
    y0 = np.asarray(bop.matvec(x))
    assert np.abs(y - y0).max() < 2e-6 * np.abs(y0).max()


def test_planes_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((301, 3)), jnp.float32)
    pl_ = W.to_planes(x, 301, 5)
    assert pl_.shape == (15, 128)
    back = W.from_planes(pl_, 301, 3)
    assert np.array_equal(np.asarray(back), np.asarray(x))
    v = jnp.asarray(rng.standard_normal(200), jnp.float32)
    assert np.array_equal(
        np.asarray(W.from_planes(W.to_planes(v, 200, 3), 200, 1)),
        np.asarray(v))


def test_model_windowed_flag_off_on_cpu():
    """Auto mode must not enable the kernel on CPU."""
    mesh = npg.generators.bowl2D(0.2, 0.5)
    spaces = npg.Spaces(mesh, b_diri_tags=[], b_diri_vals=[])
    fe = npg.FEData(mesh, spaces)
    params = npg.Parameters(eps=0.3, alpha=0.5, mu_rho=1.0, N2=1.0,
                            f=lambda x: 1.0 + 0 * x[1],
                            H=lambda x: 0.5 * (1 - x[0] ** 2))
    forc = npg.Forcings(nu=1.0, kappa_h=1e-2, kappa_v=1e-2, tau_x=0.0,
                        tau_y=0.0, b_surface_bc=npg.SurfaceDirichletBC(0.0))
    ts = npg.BDF2(t_start=0, t_stop=1.0, dt=0.1)
    model = npg.PGModel(fe, params, forc, ts)
    assert model.windowed is False
    assert model.wplan is None


def test_full_pp_matches_take_path(setup):
    """P1-P1 coarse saddle shape: pp block included (BP stabilization,
    models/model.py _saddle_coarse_operator)."""
    fe, spaces, _, rng = setup
    nv = spaces.p_space.ndof
    nc = fe.n_cells_padded
    nlp = fe.cd_p.shape[1]
    T = {k: jnp.asarray(rng.standard_normal(s), jnp.float32) for k, s in {
        "uu": (nc, 3 * nlp, 3 * nlp), "up": (nc, 3 * nlp, nlp),
        "pu": (nc, nlp, 3 * nlp), "pp": (nc, nlp, nlp)}.items()}
    sop = SaddleOperator(
        uu=T["uu"], up=T["up"], pu=T["pu"], pp=T["pp"],
        cd_u=jnp.asarray(fe.cd_p, jnp.int32),
        cd_p=jnp.asarray(fe.cd_p, jnp.int32),
        u_plan=fe.vec_plan_p, p_plan=fe.vec_plan_p, n_u_nodes=nv)
    plan = W.build_window_plan(fe.cd_p, fe.cd_p, nv, nv, B=128)
    uu_b, up_b, pu_b = W.blocked_saddle_tensors(T["uu"], T["up"], T["pu"], plan)
    pp_b = W.blocked_pp_tensor(T["pp"], plan)
    x = jnp.asarray(rng.standard_normal(4 * nv), jnp.float32)
    y = np.asarray(W.saddle_matvec(uu_b, up_b, pu_b, x, plan, "full_pp",
                                   pp_b=pp_b))
    y0 = np.asarray(sop.matvec(x))
    assert np.abs(y - y0).max() < 2e-6 * np.abs(y0).max()


def test_dedup_tables_reconstruct_slots(setup):
    """Kernel-v3 invariant: expanding the unique table through e
    reproduces the slot table exactly (same window-local ids)."""
    fe, spaces, _, _ = setup
    plan = W.build_window_plan(fe.cd_u, fe.cd_p, spaces.u_space.ndof,
                               spaces.n_p, B=128, dedup=True)
    assert plan.dedup and plan.Ru_u % 128 == 0 and plan.Ru_u > 0
    for b in range(plan.nb):
        uniq = 128 * plan.du_a[b].astype(np.int64) + plan.du_t[b]
        e = 128 * plan.eu_a[b].astype(np.int64) + plan.eu_t[b]
        valid = plan.a_u[b] >= 0
        loc = 128 * plan.a_u[b].astype(np.int64) + plan.t_u[b]
        assert np.array_equal(uniq[e[valid]], loc[valid])
        assert (e[~valid] < 0).all()
        # dedup achieves a real reduction on a P2 mesh
    assert plan.Ru_u < plan.B * plan.nlu


def test_dedup_matches_direct(setup):
    """dedup=True and dedup=False kernels agree to float tolerance."""
    fe, spaces, T, rng = setup
    kw = dict(B=128)
    p1 = W.build_window_plan(fe.cd_u, fe.cd_p, spaces.u_space.ndof,
                             spaces.n_p, dedup=True, **kw)
    p0 = W.build_window_plan(fe.cd_u, fe.cd_p, spaces.u_space.ndof,
                             spaces.n_p, dedup=False, **kw)
    N = spaces.n_u + spaces.n_p
    x = jnp.asarray(rng.standard_normal(N), jnp.float32)
    y1 = np.asarray(W.saddle_matvec(*W.blocked_saddle_tensors(
        T["uu"], T["up"], T["pu"], p1), x, p1, "full"))
    y0 = np.asarray(W.saddle_matvec(*W.blocked_saddle_tensors(
        T["uu"], T["up"], T["pu"], p0), x, p0, "full"))
    assert np.abs(y1 - y0).max() < 2e-6 * np.abs(y0).max()
