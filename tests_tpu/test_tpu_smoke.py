"""On-TPU kernel smoke tests (see conftest.py for why these exist).

Covers exactly the failure class that nulled round 3's bench: the
windowed Pallas kernels must LOWER AND COMPILE on the real Mosaic
toolchain under the model's production matmul-precision config, and a
full jitted PG step must execute.  Numerical accuracy is checked
against the canonical take-path operators (same element tensors, so
agreement is pure kernel correctness).

Reference roles: GPU-path tests test/bowl_mixing_tests.jl:108-121;
hot-loop kernel ext/nuPGCMCUDAExt.jl:27.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def model():
    import nupgcm_tpu as npg

    eps, alpha, mu = 2e-1, 0.5, 1e1
    params = npg.Parameters(
        eps=eps, alpha=alpha, mu_rho=mu, N2=1 / alpha,
        f=lambda x: 1.0 + 0.5 * x[1],
        H=lambda x: alpha * (1 - x[0] ** 2 - x[1] ** 2),
    )
    kap = lambda x: 1e-2 + np.exp(
        -(x[2] + alpha * (1 - x[0] ** 2 - x[1] ** 2)) / (0.1 * alpha))
    forc = npg.Forcings(
        nu=1.0, kappa_h=kap, kappa_v=kap,
        tau_x=lambda x: -0.05 * np.cos(np.pi / 2 * x[1]), tau_y=0.0,
        b_surface_bc=npg.SurfaceDirichletBC(0.0),
    )
    mesh = npg.generators.bowl3D(0.25, alpha, nz=3)
    spaces = npg.Spaces(
        mesh,
        u_diri_tags=["bottom", "coastline", "surface"],
        u_diri_vals=[(0, 0, 0)] * 3,
        u_diri_masks=[(True,) * 3, (True,) * 3, (False, False, True)],
        b_diri_tags=["coastline", "surface"],
        b_diri_vals=[0.0, 0.0],
    )
    fe = npg.FEData(mesh, spaces)
    dt = 1e-4 * mu / (alpha * eps) ** 2
    ts = npg.BDF2(t_start=0, t_stop=50 * dt, dt=dt)
    return npg.PGModel(fe, params, forc, ts, inv_itmax=40, evo_itmax=40,
                       windowed=True)


def test_windowed_survived_smoke(model):
    """PGModel's own build-time smoke_compile must not have tripped the
    take-path fallback on a healthy toolchain."""
    assert model.windowed, (
        "windowed kernel fell back to take-path on a real TPU -- "
        "smoke_compile failed; see stderr for the reason")


def test_windowed_matvecs_match_takepath(model):
    """Saddle + scalar windowed matvecs vs the canonical element
    operators, compiled and EXECUTED on the TPU under the model's
    scoped matmul precision."""
    import jax
    import jax.numpy as jnp

    from nupgcm_tpu.ops import window as W
    from nupgcm_tpu.utils.precision import scoped_precision

    assert not W._INTERPRET
    fe, ops = model.fe, model.ops
    rng = np.random.default_rng(0)

    sad_win = model._inv_matrix(ops)  # WindowedSaddle when windowed
    assert hasattr(sad_win, "base"), "expected the windowed operator"
    x = jnp.asarray(rng.standard_normal(fe.n_inv), model.dtype)
    mv_win = jax.jit(scoped_precision(sad_win.matvec,
                                      model.matmul_precision))
    y_win = np.asarray(mv_win(x))
    mv_ref = jax.jit(scoped_precision(sad_win.base.matvec,
                                      model.matmul_precision))
    y_ref = np.asarray(mv_ref(x))
    rel = np.linalg.norm(y_win - y_ref) / np.linalg.norm(y_ref)
    assert rel < 1e-5, rel

    # scalar (evolution-space) kernel
    evo_win = model._evo_matrix(ops, jnp.asarray(1e-3, model.dtype))
    assert hasattr(evo_win, "base")
    xb = jnp.asarray(rng.standard_normal(fe.spaces.n_b), model.dtype)
    yb_win = np.asarray(jax.jit(scoped_precision(
        evo_win.matvec, model.matmul_precision))(xb))
    yb_ref = np.asarray(jax.jit(scoped_precision(
        evo_win.base.matvec, model.matmul_precision))(xb))
    relb = np.linalg.norm(yb_win - yb_ref) / np.linalg.norm(yb_ref)
    assert relb < 1e-5, relb


def test_full_step_runs_on_tpu(model):
    """One full jitted PG step (evolve + invert + diagnostics) through
    the windowed path executes with finite outputs."""
    import jax

    state = model.rest_state()
    state = model.set_b(state, lambda x: 0.05 * np.exp(2.0 * x[2]))
    ops, new_state, aux = jax.jit(model.step_fn)(model.ops, state)
    u_max = float(aux["u_max"])
    b_max = float(aux["b_max"])
    assert np.isfinite(u_max) and u_max > 0
    assert np.isfinite(b_max)
    assert int(aux["inv_iters"]) > 0


def test_kernel_bug_degrades_not_nulls(model):
    """Deleting one character from the kernel must yield a working
    (slower) model, not a crash: simulate by smoke-compiling a plan
    whose compile raises, via monkeypatched saddle_matvec."""
    import nupgcm_tpu as npg
    from nupgcm_tpu.ops import window as W

    orig = W._saddle_kernel
    try:
        def broken(*a, **k):
            raise RuntimeError("injected kernel bug")

        W._saddle_kernel = broken
        m2 = npg.PGModel(model.fe, model.params, model.forcings, model.ts,
                         inv_itmax=40, evo_itmax=40, windowed=True)
        assert not m2.windowed  # degraded, not crashed
        st = m2.set_b(m2.rest_state(), lambda x: 0.05 * np.exp(2.0 * x[2]))
        import jax

        _, _, aux = jax.jit(m2.step_fn)(m2.ops, st)
        assert np.isfinite(float(aux["u_max"]))
    finally:
        W._saddle_kernel = orig
