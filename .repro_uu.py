import time
import numpy as np
import jax, jax.numpy as jnp
import nupgcm_tpu as npg
from nupgcm_tpu.ops import window as W

mesh = npg.generators.bowl3D(0.35, 0.5, nz=3)
spaces = npg.Spaces(mesh, u_diri_tags=[], u_diri_vals=[], b_diri_tags=[], b_diri_vals=[])
fe = npg.FEData(mesh, spaces)
plan = W.build_window_plan(fe.cd_u, fe.cd_p, spaces.u_space.ndof, spaces.n_p, dedup=True)
nc = fe.n_cells_padded
nlu = fe.cd_u.shape[1]
rng = np.random.default_rng(0)
uu = jnp.asarray(rng.standard_normal((nc, 3*nlu, 3*nlu)), jnp.float32)
uu_b, _, _ = W.blocked_saddle_tensors(uu, None, None, plan)
x = jnp.asarray(rng.standard_normal(3*spaces.u_space.ndof), jnp.float32)
t0=time.time()
f = jax.jit(lambda ub, xv: W.saddle_matvec(ub, None, None, xv, plan, "uu"))
y = f(uu_b, x); jax.block_until_ready(y)
print("uu-mode dedup compile+run:", time.time()-t0, "s; finite:", bool(jnp.isfinite(y).all()))
