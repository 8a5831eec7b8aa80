import time
import numpy as np
import jax, jax.numpy as jnp
import nupgcm_tpu as npg
from nupgcm_tpu.ops import window as W

mesh = npg.generators.bowl3D(0.35, 0.5, nz=3)
spaces = npg.Spaces(mesh, u_diri_tags=[], u_diri_vals=[], b_diri_tags=[], b_diri_vals=[])
fe = npg.FEData(mesh, spaces)
rng = np.random.default_rng(0)
nc = fe.n_cells_padded
nlu = fe.cd_u.shape[1]
uu = jnp.asarray(rng.standard_normal((nc, 3*nlu, 3*nlu)), jnp.float32)
x = jnp.asarray(rng.standard_normal(3*spaces.u_space.ndof), jnp.float32)
for dd in (False, True):
    plan = W.build_window_plan(fe.cd_u, fe.cd_p, spaces.u_space.ndof, spaces.n_p, dedup=dd)
    print("dedup", dd, "buckets", plan.buckets, "W1u", plan.W1u, "Ru_u", plan.Ru_u)
    uu_b, _, _ = W.blocked_saddle_tensors(uu, None, None, plan)
    t0=time.time()
    f = jax.jit(lambda ub, xv, p=plan: W.saddle_matvec(ub, None, None, xv, p, "uu"))
    y = f(uu_b, x); jax.block_until_ready(y)
    t_compile = time.time()-t0
    t0=time.time()
    for _ in range(20):
        y = f(uu_b, y/jnp.linalg.norm(y))
    jax.block_until_ready(y)
    print(f"  compile {t_compile:.1f}s, 20 matvecs {time.time()-t0:.3f}s")
