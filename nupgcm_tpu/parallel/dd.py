"""Domain-decomposed (sharded-state) full model step.

The scalable successor to parallel/sharding.py's replicated-state
GSPMD path: every state vector is PARTITIONED across the device mesh
(contiguous owned blocks in each space's RCM ordering), each operator
application exchanges only neighbor chunks over ICI via
``jax.lax.ppermute``, and Krylov reductions are local partials +
``psum``.  Per-matvec communication is O(halo), independent of the
global problem size -- the FEM analog of ring-attention halo passing
(SURVEY.md §2.3 rows 1-2; replaces the reference's single-device
offload, reference ext/nuPGCMCUDAExt.jl:24-33).

Design
------
* Each FE space (u nodes / p vertices / b nodes) is split into S
  contiguous blocks of its RCM ordering (chunk = ceil(N/S)); RCM makes
  every element's dof span band-limited, so all off-block references
  fall within K neighboring chunks (K measured at setup, typically 1).
* Cells are assigned to the shard owning their median velocity node;
  per-shard cell batches are padded to equal count with zero-weight
  dummies (exact no-ops).
* An operator application is: exchange (2K ppermutes of whole
  neighbor chunks) -> local gather -> batched element einsum -> local
  segment-sum scatter into the extended vector -> fold-back (2K
  ppermutes returning halo partial sums to their owners).
* The WHOLE timestep (advection assembly, evolution CG, B-product,
  saddle FGMRES with the block-triangular Chebyshev/inner-GMRES
  preconditioner, zero-mean projection, CFL, diagnostics) runs inside
  one ``shard_map`` -- state never materializes on a single device.
* The coarse corrections (dense/iterative saddle coarse, u two-grid)
  are not used in the DD step (their restriction crosses shard
  boundaries irregularly); the u-block smoother budget is raised
  instead.  The coarse spaces are small by design, so a replicated
  coarse level is the planned extension, not a blocker.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.model import State
from ..models.timesteppers import BDF2
from ..solvers.cg import cg
from ..solvers.gmres import gmres
from ..solvers.preconditioners import chebyshev
from .sharding import AXIS, make_device_mesh


def _ceil_div(a, b):
    return -(-a // b)


@dataclass
class _SpacePart:
    """Per-space partition constants (static)."""

    n: int  # true dof count
    chunk: int  # owned block size per shard
    K: int  # halo depth in chunks
    ext_len: int  # (2K+1)*chunk


class DDModel:
    """Sharded-state wrapper around a built PGModel.

    Usage::

        model = PGModel(fe, params, forcings, ts)   # single-device build
        dd = DDModel(model, n_shards=8)
        state = dd.run(model.rest_state(), max_steps=10)
    """

    def __init__(self, model, n_shards: int, mesh: Mesh = None):
        self.model = model
        self.S = int(n_shards)
        self.mesh = mesh if mesh is not None else make_device_mesh(n_shards)
        fe = model.fe
        sp = fe.spaces
        if sp.u_space.mesh.periodic_pairs is not None and len(
            sp.u_space.mesh.periodic_pairs
        ):
            raise NotImplementedError("DD step: periodic meshes not yet supported")
        if model.forcings.eddy_param.is_on:
            raise NotImplementedError("DD step: eddy rebuild not yet supported")

        self._build_partition()
        self._build_tables()
        self._build_step()

    # ------------------------------------------------------------------
    # host setup
    # ------------------------------------------------------------------
    def _build_partition(self):
        fe = self.model.fe
        sp = fe.spaces
        S = self.S
        cd_u = np.asarray(fe.cd_u)  # (ncp, nlu) node ids, current numbering
        cd_p = np.asarray(fe.cd_p)
        cd_b = np.asarray(fe.cd_b)
        ncp = cd_u.shape[0]

        cu = _ceil_div(sp.u_space.ndof, S)
        cp = _ceil_div(sp.p_space.ndof, S)
        cb = _ceil_div(sp.b_space.ndof, S)

        # owner by median velocity node
        owner = np.clip(np.median(cd_u, axis=1).astype(np.int64) // cu, 0, S - 1)
        # fe pad cells (zero wq) can go anywhere; spread for balance
        wq = np.asarray(fe.geom.wq)
        is_pad = np.abs(wq).sum(axis=1) == 0
        owner[is_pad] = np.arange(is_pad.sum()) % S

        counts = np.bincount(owner, minlength=S)
        nc_max = int(counts.max())
        order = np.zeros((S, nc_max), dtype=np.int64)
        valid = np.zeros((S, nc_max), dtype=bool)
        for s in range(S):
            ids = np.where(owner == s)[0]
            order[s, : len(ids)] = ids
            # fe pad cells (zero quadrature weight) carry all-zero dof
            # rows that would fall outside far shards' halo windows --
            # treat them as invalid slots (their tensors are zero anyway)
            valid[s, : len(ids)] = ~is_pad[ids]
        self.cell_order = order  # (S, nc_max) indices into the ncp cell axis
        self.cell_valid = valid
        self.nc_max = nc_max

        # halo depth per space: max reach of any cell's dofs outside its
        # owner block, in chunks
        def halo_K(cd, chunk):
            lo = owner * chunk
            mn = cd.min(axis=1)
            mx = cd.max(axis=1)
            r_lo = np.maximum(lo - mn, 0)
            r_hi = np.maximum(mx - (lo + chunk - 1), 0)
            r_lo[is_pad] = 0
            r_hi[is_pad] = 0
            H = int(max(r_lo.max() if len(r_lo) else 0,
                        r_hi.max() if len(r_hi) else 0))
            return _ceil_div(H, chunk) if H else 0

        Ku = halo_K(cd_u, cu)
        Kp = halo_K(cd_p, cp)
        Kb = halo_K(cd_b, cb)
        if max(Ku, Kp, Kb) >= S:
            raise ValueError(
                f"halo depth ({Ku},{Kp},{Kb}) chunks >= {S} shards: mesh too "
                f"small for this shard count (or RCM bandwidth too large)"
            )
        self.part_u = _SpacePart(sp.u_space.ndof, cu, Ku, (2 * Ku + 1) * cu)
        self.part_p = _SpacePart(sp.p_space.ndof, cp, Kp, (2 * Kp + 1) * cp)
        self.part_b = _SpacePart(sp.b_space.ndof, cb, Kb, (2 * Kb + 1) * cb)

    def _ext_ids(self, cd, part) -> np.ndarray:
        """Map global dof ids (per shard-owned cells) to extended-vector
        indices: ext = gid - (s - K) * chunk."""
        S = self.S
        out = np.zeros((S, self.nc_max, cd.shape[1]), dtype=np.int32)
        for s in range(S):
            g = cd[self.cell_order[s]]
            e = g - (s - part.K) * part.chunk
            e[~self.cell_valid[s]] = 0
            if e.min() < 0 or e.max() >= part.ext_len:
                raise AssertionError("ext index out of halo window")
            out[s] = e
        return out

    @staticmethod
    def _plan(ids2d: np.ndarray, ext_len: int):
        """Per-shard sorted scatter plan: ids2d (S, E) -> gperm, seg."""
        S, E = ids2d.shape
        gperm = np.argsort(ids2d, axis=1, kind="stable").astype(np.int32)
        seg = np.take_along_axis(ids2d, gperm, axis=1).astype(np.int32)
        return gperm, seg

    def _reorder_cells(self, arr) -> np.ndarray:
        """(ncp, ...) cell-axis array -> (S, nc_max, ...), zeroed pads."""
        a = np.asarray(arr)[self.cell_order]  # (S, nc_max, ...)
        mask = self.cell_valid.reshape(self.S, self.nc_max,
                                       *([1] * (a.ndim - 2)))
        if np.issubdtype(a.dtype, np.floating):
            a = a * mask
        return a

    def _build_tables(self):
        m = self.model
        fe, c, ops = m.fe, m.const, m.ops
        sp = fe.spaces
        S = self.S
        pu_, pp_, pb_ = self.part_u, self.part_p, self.part_b
        dt = m.dtype

        cd_u = self._ext_ids(np.asarray(fe.cd_u), pu_)
        cd_p = self._ext_ids(np.asarray(fe.cd_p), pp_)
        cd_b = self._ext_ids(np.asarray(fe.cd_b), pb_)

        gperm_u, seg_u = self._plan(cd_u.reshape(S, -1), pu_.ext_len)
        gperm_p, seg_p = self._plan(cd_p.reshape(S, -1), pp_.ext_len)
        gperm_b, seg_b = self._plan(cd_b.reshape(S, -1), pb_.ext_len)

        def vec_dd(v, part, width=1):
            v = np.asarray(v).reshape(-1)
            return np.asarray(
                np.pad(v, (0, S * part.chunk * width - v.shape[0])), v.dtype
            )

        t = {}
        t["cd_u"], t["cd_p"], t["cd_b"] = cd_u, cd_p, cd_b
        t["gperm_u"], t["seg_u"] = gperm_u, seg_u
        t["gperm_p"], t["seg_p"] = gperm_p, seg_p
        t["gperm_b"], t["seg_b"] = gperm_b, seg_b
        # element tensors (reordered to shard batches)
        for k in ("A_uu_e", "A_up_e", "A_pu_e", "visc_e", "Mp_e", "B_e",
                  "M_e", "Kh_e", "Kv_e"):
            t[k] = np.asarray(self._reorder_cells(np.asarray(ops[k])), dt)
        # geometry + coefficients for the in-step assemblies
        t["wq"] = np.asarray(self._reorder_cells(c["wq"]), dt)
        t["invJT"] = np.asarray(self._reorder_cells(c["invJT"]), dt)
        t["kv_q"] = np.asarray(self._reorder_cells(c["kv_q"]), dt)
        t["h_cells"] = np.asarray(
            np.where(self.cell_valid, np.asarray(c["h_cells"])[self.cell_order],
                     1e30), dt)
        # masks / lifts / rhs in dd layout
        n_u = sp.n_u
        t["free_u"] = vec_dd(c["free_u"], pu_, 3)
        t["udiri"] = vec_dd(c["udiri"], pu_, 3)
        t["free_b"] = vec_dd(c["free_b"], pb_)
        t["bdiri"] = vec_dd(c["bdiri"], pb_)
        t["free_p"] = vec_dd(c["free_inv"][n_u:], pp_)
        t["s_u"] = vec_dd(np.asarray(ops["s"])[:n_u], pu_, 3)
        t["rhs_diff"] = vec_dd(np.asarray(ops["rhs_diff"]), pb_)
        t["rhs_flux"] = vec_dd(np.asarray(ops["rhs_flux"]), pb_)
        t["p_volw"] = vec_dd(np.asarray(ops["p_volw"]), pp_)

        # preconditioner diagonals (single-device computation, resharded)
        visc = m._visc_operator(ops["visc_e"])
        from ..ops.sparse import MaskedOperator

        visc_d = MaskedOperator(visc, c["free_u"]).diagonal()
        t["visc_dinv"] = vec_dd(1.0 / np.asarray(visc_d), pu_, 3)
        from ..ops.element import ElementOperator

        mp = ElementOperator(Ae=ops["Mp_e"],
                             cd_rows=jnp.asarray(fe.cd_p, jnp.int32),
                             cd_cols=jnp.asarray(fe.cd_p, jnp.int32),
                             row_plan=fe.vec_plan_p)
        mp_d = MaskedOperator(mp, c["free_inv"][n_u:]).diagonal()
        t["mp_dinv"] = vec_dd(1.0 / np.asarray(mp_d), pp_)
        self.lmax_u = float(ops["lmax_u"])
        self.lmax_p = float(ops["lmax_p"])
        self.tables = t

    # ------------------------------------------------------------------
    # state conversion
    # ------------------------------------------------------------------
    def to_dd(self, state: State) -> dict:
        pu_, pp_, pb_ = self.part_u, self.part_p, self.part_b
        S = self.S

        def padv(v, part, width=1):
            v = np.asarray(v).reshape(-1)
            padded = np.asarray(
                np.pad(v, (0, S * part.chunk * width - v.shape[0])),
                self.model.dtype)
            return self._global(padded, P(AXIS))

        return {
            "u": padv(state.u, pu_, 3),
            "u_prev": padv(state.u_prev, pu_, 3),
            "p": padv(state.p, pp_),
            "b": padv(state.b, pb_),
            "b_prev": padv(state.b_prev, pb_),
            "t": jnp.asarray(state.t, self.model.dtype),
            "dt": jnp.asarray(state.dt, self.model.dtype),
            "step": jnp.asarray(state.step, jnp.int32),
        }

    def from_dd(self, dd: dict) -> State:
        pu_, pp_, pb_ = self.part_u, self.part_p, self.part_b
        return State(
            u=dd["u"][: 3 * pu_.n].reshape(-1, 3),
            p=dd["p"][: pp_.n],
            b=dd["b"][: pb_.n],
            u_prev=dd["u_prev"][: 3 * pu_.n].reshape(-1, 3),
            b_prev=dd["b_prev"][: pb_.n],
            t=dd["t"], dt=dd["dt"], step=dd["step"],
        )

    # ------------------------------------------------------------------
    # device step
    # ------------------------------------------------------------------
    def _build_step(self):
        m = self.model
        fe, c = m.fe, m.const
        pr = m.params
        S = self.S
        pu_, pp_, pb_ = self.part_u, self.part_p, self.part_b
        dt_ = m.dtype
        phi_u = np.asarray(c["phi_u"], dt_)
        phi_b = np.asarray(c["phi_b"], dt_)
        dphi_b = np.asarray(c["dphi_b"], dt_)
        embed = np.asarray(c["embed"], dt_)
        nlu = phi_u.shape[1]
        nlb = phi_b.shape[1]
        iu, ip = m.inner_iters
        lmax_u, lmax_p = self.lmax_u, self.lmax_p
        cond_ratio = m.cond_ratio
        inner_method = m.inner_method
        conv = m.forcings.conv_param
        is_bdf2 = isinstance(m.ts, BDF2)
        adaptive = bool(getattr(m.ts, "adaptive", False))
        CFL = float(getattr(m.ts, "CFL_factor", 0.5))
        inv_opts = m.inv_opts
        evo_opts = m.evo_opts

        fwd = lambda h: [(i, (i + h) % S) for i in range(S)]

        def make_exchange(part):
            K, ch = part.K, part.chunk

            def exchange(x, width=1):
                """owned (width*chunk,) -> extended (width*(2K+1)*chunk,)."""
                if K == 0:
                    return x
                left = [jax.lax.ppermute(x, AXIS, fwd(h)) for h in range(K, 0, -1)]
                right = [jax.lax.ppermute(x, AXIS, fwd(-h)) for h in range(1, K + 1)]
                return jnp.concatenate(left + [x] + right)

            def fold(y_ext, width=1):
                """extended partial sums -> owned, halo parts returned
                to their owners (reverse ppermute)."""
                w = width * ch
                own = jax.lax.dynamic_slice_in_dim(y_ext, K * w, w)
                for h in range(1, K + 1):
                    up = jax.lax.dynamic_slice_in_dim(y_ext, (K + h) * w, w)
                    dn = jax.lax.dynamic_slice_in_dim(y_ext, (K - h) * w, w)
                    own = own + jax.lax.ppermute(up, AXIS, fwd(h))
                    own = own + jax.lax.ppermute(dn, AXIS, fwd(-h))
                return own

            return exchange, fold

        ex_u, fold_u = make_exchange(pu_)
        ex_p, fold_p = make_exchange(pp_)
        ex_b, fold_b = make_exchange(pb_)

        def scatter(ye_flat, gperm, seg, ext_len):
            v = ye_flat[gperm]
            return jax.ops.segment_sum(v, seg, num_segments=ext_len,
                                       indices_are_sorted=True)

        def scatter_rows3(ye_rows, gperm, seg, ext_nodes):
            v = ye_rows[gperm]
            return jax.ops.segment_sum(v, seg, num_segments=ext_nodes,
                                       indices_are_sorted=True).reshape(-1)

        def step_kernel(t, sv):
            """Per-shard body (inside shard_map).  ``t``: tables with
            the leading shard axis sliced off; ``sv``: state values."""
            u_loc, p_loc, b_loc = sv["u"], sv["p"], sv["b"]
            up_loc, bp_loc = sv["u_prev"], sv["b_prev"]
            tt, dtv, stp = sv["t"], sv["dt"], sv["step"]

            psum = lambda x: jax.lax.psum(x, AXIS)

            # ---- gathered element views -------------------------------
            def gath_u(x):
                xe = ex_u(x).reshape(-1, 3)
                return xe[t["cd_u"]].reshape(-1, 3 * nlu)

            def gath_p(x):
                return ex_p(x)[t["cd_p"]]

            def gath_b(x):
                return ex_b(x)[t["cd_b"]]

            # ---- operators -------------------------------------------
            free_u, free_b, free_p = t["free_u"], t["free_b"], t["free_p"]

            def saddle_mv(x):
                """masked saddle matvec on local [u | p]."""
                xu, xp = x[: 3 * pu_.chunk], x[3 * pu_.chunk:]
                xu_m, xp_m = xu * free_u, xp * free_p
                xe_u = gath_u(xu_m)
                xe_p = gath_p(xp_m)
                yu_e = jnp.einsum("cij,cj->ci", t["A_uu_e"], xe_u)
                yu_e = yu_e + jnp.einsum("cij,cj->ci", t["A_up_e"], xe_p)
                yp_e = jnp.einsum("cij,cj->ci", t["A_pu_e"], xe_u)
                yu = fold_u(scatter_rows3(yu_e.reshape(-1, 3), t["gperm_u"],
                                          t["seg_u"], pu_.ext_len), 3)
                yp = fold_p(scatter(yp_e.reshape(-1), t["gperm_p"],
                                    t["seg_p"], pp_.ext_len))
                yu = jnp.where(free_u.astype(bool), yu, xu)
                yp = jnp.where(free_p.astype(bool), yp, xp)
                return jnp.concatenate([yu, yp])

            def visc_mv(xu):
                xu_m = xu * free_u
                xe_u = gath_u(xu_m)
                yu_e = jnp.einsum("cij,cj->ci", t["visc_e"], xe_u)
                yu = fold_u(scatter_rows3(yu_e.reshape(-1, 3), t["gperm_u"],
                                          t["seg_u"], pu_.ext_len), 3)
                return jnp.where(free_u.astype(bool), yu, xu)

            def ublock_mv(xu):
                xu_m = xu * free_u
                xe_u = gath_u(xu_m)
                yu_e = jnp.einsum("cij,cj->ci", t["A_uu_e"], xe_u)
                yu = fold_u(scatter_rows3(yu_e.reshape(-1, 3), t["gperm_u"],
                                          t["seg_u"], pu_.ext_len), 3)
                return jnp.where(free_u.astype(bool), yu, xu)

            def up_mv(xp):
                xe_p = gath_p(xp)
                yu_e = jnp.einsum("cij,cj->ci", t["A_up_e"], xe_p)
                return free_u * fold_u(
                    scatter_rows3(yu_e.reshape(-1, 3), t["gperm_u"],
                                  t["seg_u"], pu_.ext_len), 3)

            def mp_mv(xp):
                xp_m = xp * free_p
                xe_p = gath_p(xp_m)
                yp_e = jnp.einsum("cij,cj->ci", t["Mp_e"], xe_p)
                yp = fold_p(scatter(yp_e.reshape(-1), t["gperm_p"],
                                    t["seg_p"], pp_.ext_len))
                return jnp.where(free_p.astype(bool), yp, xp)

            # ---- CFL dt ----------------------------------------------
            dt_old = dtv
            if adaptive:
                u_e = gath_u(u_loc).reshape(-1, nlu, 3)
                u_q = jnp.einsum("qi,cia->cqa", phi_u, u_e)
                speed = jnp.linalg.norm(u_q, axis=-1).max(axis=1)
                ratios = t["h_cells"] / jnp.maximum(speed, 0.01)
                dt_new = CFL * jax.lax.pmin(ratios.min(), AXIS)
                if is_bdf2:
                    dt_new = jnp.minimum(dt_new, 2.0 * dtv)
                dtv = dt_new.astype(dt_)
            r = (dtv / dt_old).astype(dt_)

            # ---- evolution (advection + diffusion solve) --------------
            Gb3 = jnp.einsum(
                "cqip,pd->cqid",
                jnp.einsum("cpr,qir->cqip", t["invJT"], dphi_b), embed)
            b_e = gath_b(b_loc)
            bp_e = gath_b(bp_loc)
            u_e = gath_u(u_loc).reshape(-1, nlu, 3)
            upv_e = gath_u(up_loc).reshape(-1, nlu, 3)

            if conv.is_on:
                abz = pr.alpha * (
                    pr.N2 + jnp.einsum("cqi,ci->cq", Gb3[..., 2], b_e))
                kv_q = conv.kappa_v(t["kv_q"], abz)
                Kv_e = jnp.einsum("cq,cq,cqi,cqj->cij", t["wq"], kv_q,
                                  Gb3[..., 2], Gb3[..., 2])
                rhs_diff = fold_b(scatter(
                    (-pr.N2 * jnp.einsum("cq,cq,cqi->ci", t["wq"], kv_q,
                                         Gb3[..., 2])).reshape(-1),
                    t["gperm_b"], t["seg_b"], pb_.ext_len))
            else:
                Kv_e = t["Kv_e"]
                rhs_diff = t["rhs_diff"]

            use2 = jnp.logical_and(jnp.asarray(is_bdf2), stp > 0)
            base_theta = dtv * pr.a2e2 / pr.mu_rho
            wbdf = (1.0 + r) / (1.0 + 2.0 * r)
            theta = jnp.where(use2, wbdf * base_theta, base_theta)
            c0 = jnp.where(use2, (1.0 + r) ** 2 / (1.0 + 2.0 * r), 1.0).astype(dt_)
            c1 = jnp.where(use2, r ** 2 / (1.0 + 2.0 * r), 0.0).astype(dt_)
            cdt = jnp.where(use2, wbdf * dtv, dtv).astype(dt_)
            w2 = jnp.where(use2, 1.0 + r, 1.0).astype(dt_)

            ue = w2 * u_e - (w2 - 1.0) * upv_e
            be = w2 * b_e - (w2 - 1.0) * bp_e
            u_q = jnp.einsum("qi,cia->cqa", phi_u, ue)
            gb_q = jnp.einsum("cqid,ci->cqd", Gb3, be)
            adv = jnp.einsum("cqa,cqa->cq", u_q, gb_q) + u_q[..., 2] * jnp.asarray(pr.N2, dt_)
            b_q = jnp.einsum("qi,ci->cq", phi_b, b_e)
            bpq = jnp.einsum("qi,ci->cq", phi_b, bp_e)
            integ = c0 * b_q - c1 * bpq - cdt * adv
            rhs_adv = fold_b(scatter(
                jnp.einsum("cq,qi,cq->ci", t["wq"], phi_b, integ).reshape(-1),
                t["gperm_b"], t["seg_b"], pb_.ext_len))

            evo_Ae = t["M_e"] + theta * (t["Kh_e"] + Kv_e)

            def evo_mv(x):
                x_m = x * free_b
                xe = gath_b(x_m)
                ye = jnp.einsum("cij,cj->ci", evo_Ae, xe)
                y = fold_b(scatter(ye.reshape(-1), t["gperm_b"], t["seg_b"],
                                   pb_.ext_len))
                return jnp.where(free_b.astype(bool), y, x)

            # Jacobi diag of the evolution LHS (masked)
            de = jnp.einsum("cii->ci", evo_Ae)
            evo_diag = fold_b(scatter(de.reshape(-1), t["gperm_b"],
                                      t["seg_b"], pb_.ext_len))
            evo_dinv = 1.0 / jnp.where(free_b.astype(bool), evo_diag, 1.0)

            y_full = rhs_adv + theta * rhs_diff + dtv * t["rhs_flux"]
            xd = t["bdiri"] * (1.0 - free_b)
            y = jnp.where(free_b.astype(bool), y_full - evo_mv(xd), t["bdiri"])
            b_new, evo_stats = cg(evo_mv, y, b_loc, M_diag_inv=evo_dinv,
                                  psum_axis=AXIS, **evo_opts)

            # ---- inversion -------------------------------------------
            b_e_new = gath_b(b_new)
            Bye = jnp.einsum("cij,cj->ci", t["B_e"], b_e_new)
            yu = fold_u(scatter_rows3(Bye.reshape(-1, 3), t["gperm_u"],
                                      t["seg_u"], pu_.ext_len), 3)
            y_inv = jnp.concatenate([yu + t["s_u"], jnp.zeros(pp_.chunk, dt_)])
            free_inv = jnp.concatenate([free_u, free_p])
            xdiri = jnp.concatenate([t["udiri"], jnp.zeros(pp_.chunk, dt_)])
            xd_inv = xdiri * (1.0 - free_inv)
            y_inv = jnp.where(free_inv.astype(bool),
                              y_inv - saddle_mv(xd_inv), xdiri)

            visc_dinv, mp_dinv = t["visc_dinv"], t["mp_dinv"]

            def solve_p(rp):
                return chebyshev(mp_mv, mp_dinv, rp, ip, lmax_p / 4.0, lmax_p)

            def solve_u(ru):
                if inner_method == "inner_gmres":
                    zu, _ = gmres(ublock_mv, ru, jnp.zeros_like(ru),
                                  M=lambda v: visc_dinv * v, m=iu, itmax=iu,
                                  atol=0.0, rtol=1e-8, psum_axis=AXIS)
                    return zu
                return chebyshev(visc_mv, visc_dinv, ru, iu,
                                 lmax_u / cond_ratio, lmax_u)

            def M_block(rv):
                ru, rp = rv[: 3 * pu_.chunk], rv[3 * pu_.chunk:]
                zp = solve_p(rp)
                zu = solve_u(ru - up_mv(zp))
                return jnp.concatenate([zu, zp])

            x0 = jnp.concatenate([u_loc, p_loc])
            x, inv_stats = gmres(saddle_mv, y_inv, x0, M=M_block,
                                 flexible=True, psum_axis=AXIS, **inv_opts)
            u_new = x[: 3 * pu_.chunk]
            p_new = x[3 * pu_.chunk:]
            pw = t["p_volw"]
            p_new = p_new - psum(jnp.vdot(pw, p_new)) / psum(jnp.sum(pw))

            aux = {
                "evo_iters": evo_stats.iterations,
                "evo_res": evo_stats.residual,
                "inv_iters": inv_stats.iterations,
                "inv_res": inv_stats.residual,
                "u_max": jax.lax.pmax(jnp.abs(u_new).max(), AXIS),
                "b_max": jax.lax.pmax(jnp.abs(b_new).max(), AXIS),
            }
            out = {
                "u": u_new, "p": p_new, "b": b_new,
                "u_prev": u_loc, "b_prev": b_loc,
                "t": tt + dtv, "dt": dtv, "step": stp + 1,
            }
            return out, aux

        vec_keys = ("u", "p", "b", "u_prev", "b_prev")
        tab_in_specs = {k: P(AXIS) for k in self.tables}
        sv_in_specs = {k: (P(AXIS) if k in vec_keys else P()) for k in
                       ("u", "p", "b", "u_prev", "b_prev", "t", "dt", "step")}

        def wrapper(tables, sv):
            def body(t, s):
                # tables arrive with leading axis sliced to 1 for
                # (S, nc, ...) arrays and to (chunk,) for dd vectors
                t2 = {}
                for k, v in t.items():
                    if k in ("free_u", "udiri", "free_b", "bdiri", "free_p",
                             "s_u", "rhs_diff", "rhs_flux", "p_volw",
                             "visc_dinv", "mp_dinv"):
                        t2[k] = v
                    else:
                        t2[k] = v[0]
                return step_kernel(t2, s)

            return shard_map(
                body, mesh=self.mesh,
                in_specs=(tab_in_specs, sv_in_specs),
                out_specs=(sv_in_specs,
                           {k: P() for k in ("evo_iters", "evo_res",
                                             "inv_iters", "inv_res",
                                             "u_max", "b_max")}),
                check_vma=False,
            )(tables, sv)

        self._step = jax.jit(wrapper)
        # device-resident tables (sharded placement); make_array_from_
        # callback works identically in single- and multi-process mode
        # (each process materializes only its addressable shards)
        self.tables_dev = {
            k: self._global(v, P(AXIS)) for k, v in self.tables.items()
        }

        def _norms(tables, sv):
            def body(t, s):
                sq = lambda v: jax.lax.psum(jnp.vdot(v, v), AXIS)
                return {"u2": sq(s["u"]), "p2": sq(s["p"]), "b2": sq(s["b"])}

            vecs = {k: (P(AXIS) if k in vec_keys else P()) for k in sv}
            return shard_map(body, mesh=self.mesh,
                             in_specs=({k: P(AXIS) for k in tables}, vecs),
                             out_specs={"u2": P(), "p2": P(), "b2": P()},
                             check_vma=False)(tables, sv)

        self._norms = jax.jit(_norms)

    def _global(self, host_arr, spec):
        """Build a (possibly multi-process) global device array from an
        identical host copy on every process."""
        a = np.asarray(host_arr)
        sh = NamedSharding(self.mesh, spec)
        return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])

    def norms(self, dd_state: dict) -> dict:
        """Replicated global squared L2 norms of the state -- readable
        on every process (multi-host verification)."""
        out = self._norms(self.tables_dev, dd_state)
        return {k: float(v) for k, v in out.items()}

    # ------------------------------------------------------------------
    def step(self, dd_state: dict):
        return self._step(self.tables_dev, dd_state)

    def run(self, state: State, max_steps: int, n_info: int = 0,
            log=print) -> State:
        dd = self.to_dd(state)
        for i in range(int(max_steps)):
            dd, aux = self.step(dd)
            if n_info and (i + 1) % n_info == 0:
                log(f"dd step {i + 1}: |u|max={float(aux['u_max']):.3e} "
                    f"evo_it={int(aux['evo_iters'])} "
                    f"inv_it={int(aux['inv_iters'])}")
        return self.from_dd(dd)
