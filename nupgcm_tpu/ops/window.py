"""Windowed one-hot MXU gather/scatter: the Pallas TPU matvec kernel.

XLA prices unstructured gathers/scatters at ~10 ns per index on TPU;
the element-local saddle matvec issues ~5M of them per application,
which left the round-2 operator at ~1% of the HBM roofline (140 ms at
0.87M dofs -- BENCH_r02/r03 section C).  This module removes the
priced gathers entirely:

  * FEData sorts cells by their smallest RCM velocity node, so any
    block of B consecutive cells touches a CONTIGUOUS dof window of
    width ~ the RCM bandwidth (measured <= 9.5k nodes at 0.87M dofs).
  * Gather within a window runs on the MXU as a one-hot contraction:
    with the window reshaped (W1, 128) and local index l = 128 a + t,
      stage 1   G1 = dot(Xw (W1,128), OHa (W1,R))      -> (128, R)
      stage 2   xe = sum_s(G1 * OHt (128,R), axis=0)   -> (1, R)
    where OHa/OHt are one-hot masks built in-kernel from streamed
    int32 index rows (iota-compare; rows with index -1 vanish).
  * Scatter is the exact adjoint REUSING the same one-hots:
      E  = OHt * broadcast(ye (1,R))                   -> (128, R)
      Yw = dot(OHa (W1,R), E (128,R), contract R)      -> (W1, 128)
    accumulated into the y window.  Duplicate dof targets sum inside
    the MXU f32 accumulator (deterministic order).
  * The element einsum y_e = A_e x_e runs cell-minor ((slots, B)
    layout): whole-block tile + multiply (VPU), then a constant 0/1
    block-sum matrix on the MXU.

x and y ride as 128-lane component planes resident in VMEM for the
whole grid pass (fits up to ~400k velocity nodes per chip; beyond
that the DD path shards first and each shard fits).  Element tensors
stream block-by-block through Pallas's pipelined BlockSpecs.

This is the TPU-native replacement for the CUSPARSE SpMV role
(reference ext/nuPGCMCUDAExt.jl:27) in the Krylov hot loop
(reference src/inversion.jl:101-110, src/iterative_solvers.jl:31).
"""

from __future__ import annotations

import functools
import hashlib
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

try:  # import is safe everywhere; kernels only run on TPU/interpret
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclass(frozen=True)
class WindowPlan:
    """Static block/window layout for one (space, cell-order) pair.

    Hashable (content digest) so it can ride as a static jit arg; the
    int32 index arrays are passed to kernels as TRACED args so they
    never inline into the HLO (args-table-mode discipline,
    models/model.py).
    """

    B: int            # cells per block
    nb: int           # number of blocks
    nlu: int          # primary-space dofs per cell (u: nodes)
    nlp: int          # secondary-space dofs per cell (0 = scalar plan)
    W1u: int          # primary window rows of 128 (max over blocks)
    W1p: int
    n_u_nodes: int
    n_p: int
    n_cells: int
    w0u: np.ndarray   # (nb,) int32 window starts, 128-row units
    w0p: np.ndarray
    a_u: np.ndarray   # (nb, B*nlu) int32: local//128, -1 = masked
    t_u: np.ndarray   # (nb, B*nlu) int32: local%128
    a_p: np.ndarray
    t_p: np.ndarray
    # per-block width buckets: blocks are permuted by bperm (applied to
    # w0/a/t here AND to the blocked element tensors by blocked_*) so
    # each bucket is a contiguous block range run as its own
    # pallas_call with a narrower window -- interior blocks stop
    # paying the global-max W1 padding.  None = single bucket.
    buckets: tuple = None   # ((nb_i, W1u_i, W1p_i), ...)
    bperm: np.ndarray = None
    # kernel v3 unique-node dedup (ROADMAP r3 item 1): per block the
    # R = B*nl slots hit only ~R/3 unique window rows.  The kernel
    # gathers the UNIQUE rows first (one-hot over Ru ~ R/3 columns),
    # folds them into a mini-window of Ru1 = Ru/128 plane rows, then
    # EXPANDS to the R slots with a second (cheap, height-Ru1) one-hot
    # -- cutting the dominant W1*128*R MXU terms to W1*128*Ru +
    # Ru1*128*R.  The scatter runs the exact adjoint.  Tables:
    # d*_a/d*_t: (nb, Ru_*) unique-row ids; e*_a/e*_t: (nb, R_*)
    # slot -> unique-index expansion (all -1-masked like a/t).
    dedup: bool = False
    Ru_u: int = 0     # unique columns (multiple of 128)
    Ru_p: int = 0
    du_a: np.ndarray = None
    du_t: np.ndarray = None
    eu_a: np.ndarray = None
    eu_t: np.ndarray = None
    dp_a: np.ndarray = None
    dp_t: np.ndarray = None
    ep_a: np.ndarray = None
    ep_t: np.ndarray = None

    def __post_init__(self):
        h = hashlib.sha1()
        arrs = [self.w0u, self.w0p, self.a_u, self.t_u, self.a_p, self.t_p]
        if self.bperm is not None:
            arrs.append(self.bperm)
        if self.dedup:
            arrs += [self.du_a, self.du_t, self.eu_a, self.eu_t]
            if self.nlp:
                arrs += [self.dp_a, self.dp_t, self.ep_a, self.ep_t]
        for a in arrs:
            h.update(np.ascontiguousarray(a).tobytes())
        object.__setattr__(self, "_digest", h.hexdigest())

    def __hash__(self):
        return hash((self.B, self.nb, self.nlu, self.nlp, self.W1u,
                     self.W1p, self.n_u_nodes, self.n_p, self.n_cells,
                     self.buckets, self.dedup, self.Ru_u, self.Ru_p,
                     self._digest))

    def __eq__(self, other):
        return isinstance(other, WindowPlan) and hash(self) == hash(other)

    def device_arrays(self):
        """Index arrays as device arrays (cached); pass as jit args.

        Non-dedup: (w0u, w0p, a_u, t_u, a_p, t_p).
        Dedup: (w0u, w0p, du_a, du_t, eu_a, eu_t, dp_a, dp_t,
        ep_a, ep_t) -- the slot tables a/t are not needed on device."""
        if "_dev" not in self.__dict__:
            nb = self.nb
            r3 = lambda a: jnp.asarray(a.reshape(nb, 1, -1))
            # reshape in NumPy: a traced jnp reshape would leak tracers
            # out of whatever transformation first touches the cache
            if self.dedup:
                zp = np.full((nb, 1), -1, np.int32)  # nlp == 0 stand-in
                object.__setattr__(self, "_dev", (
                    jnp.asarray(self.w0u), jnp.asarray(self.w0p),
                    r3(self.du_a), r3(self.du_t),
                    r3(self.eu_a), r3(self.eu_t),
                    r3(self.dp_a if self.nlp else zp),
                    r3(self.dp_t if self.nlp else zp),
                    r3(self.ep_a if self.nlp else zp),
                    r3(self.ep_t if self.nlp else zp)))
            else:
                object.__setattr__(self, "_dev", (
                    jnp.asarray(self.w0u), jnp.asarray(self.w0p),
                    r3(self.a_u), r3(self.t_u),
                    r3(self.a_p), r3(self.t_p)))
        return self.__dict__["_dev"]

    @property
    def nr_u(self) -> int:
        # multiple of 8 so per-component plane offsets d*nr_u keep the
        # 8-row alignment of the window starts (see block_tables)
        return _ceil_to(
            _ceil_to(max(self.n_u_nodes, 1), 128) // 128 + self.W1u, 8)

    @property
    def nr_p(self) -> int:
        return _ceil_to(
            _ceil_to(max(self.n_p, 1), 128) // 128 + self.W1p, 8)


def build_window_plan(cd_u, cd_p, n_u_nodes: int, n_p: int,
                      B: int = 128, bucketed: bool = True,
                      dedup: bool = True) -> WindowPlan:
    """cd_u (nc, nlu) / cd_p (nc, nlp) in the window-sorted cell order
    (cells ordered by min cd_u -- FEData guarantees this).  cd_p may
    have width 0 for scalar plans.

    ``bucketed``: permute blocks by required window width and emit up
    to 4 contiguous width buckets, each run as its own pallas_call
    (the max-W1 padding otherwise taxes every interior block).  Must
    be False when one static plan serves per-shard traced tables
    (parallel/dd.py): the permutation is baked into the plan, and
    per-shard permutations would disagree across shards.

    ``dedup``: build the kernel-v3 unique-node tables (gather unique
    window rows, expand to slots -- ~2-2.5x fewer MXU ops at
    production widths).  Off for the DD path for now (its traced
    per-shard tables use the slot schema)."""
    assert B % 128 == 0, "B must be a multiple of 128 (vreg lane tiles)"
    cd_u = np.asarray(cd_u, np.int64)
    cd_p = np.asarray(cd_p, np.int64)
    nc, nlu = cd_u.shape
    nlp = cd_p.shape[1]
    nb = -(-nc // B)

    def block_tables(cd, nl, anchor=None):
        w0 = np.zeros(nb, np.int32)
        a = np.full((nb, B * nl), -1, np.int32)
        t = np.full((nb, B * nl), -1, np.int32)
        if nl == 0:
            return w0, a, t, np.full(nb, 8, np.int64)
        spans = []
        for b in range(nb):
            blk = cd[b * B:(b + 1) * B]
            nr = blk.shape[0]  # real cells in this block
            # window starts FLOOR to 8-row (sublane-tile) multiples and
            # widths CEIL to 8 rows: sublane-aligned dynamic window
            # loads/stores vectorize in Mosaic, where misaligned ones
            # unroll per row and blow up kernel lowering time
            # (tools/compile_bisect.py)
            w0r = (int(blk.min()) // 128) // 8 * 8
            w0[b] = w0r
            loc = blk - w0r * 128
            spans.append(int(loc.max()) + 1)
            # row order r = j*B + c (j-major): (1, R) reshapes to (nl, B)
            aj = np.full((B, nl), -1, np.int64)
            tj = np.full((B, nl), -1, np.int64)
            aj[:nr] = loc // 128
            tj[:nr] = loc % 128
            a[b] = aj.T.reshape(-1)
            t[b] = tj.T.reshape(-1)
        # per-block required window rows of 128, in 8-row multiples
        w1 = np.maximum(1, _ceil_to(np.asarray(spans), 128) // 128)
        return w0, a, t, _ceil_to(w1, 8)

    w0u, a_u, t_u, w1u_blk = block_tables(cd_u, nlu)
    w0p, a_p, t_p, w1p_blk = block_tables(cd_p, nlp)
    W1u, W1p = int(w1u_blk.max()), int(w1p_blk.max())

    def dedup_tables(a, t, nl):
        """Unique window-row tables + slot->unique expansion."""
        R = B * nl
        uas, uts, eas, ets, rus = [], [], [], [], []
        for b in range(nb):
            loc = 128 * a[b].astype(np.int64) + t[b]
            valid = a[b] >= 0
            uniq, inv = np.unique(loc[valid], return_inverse=True)
            e = np.full(R, -1, np.int64)
            e[valid] = inv
            rus.append(len(uniq))
            uas.append(uniq // 128)
            uts.append(uniq % 128)
            eas.append(np.where(e >= 0, e // 128, -1))
            ets.append(np.where(e >= 0, e % 128, -1))
        Ru = _ceil_to(max(max(rus), 1), 128)
        da = np.full((nb, Ru), -1, np.int32)
        dt_ = np.full((nb, Ru), -1, np.int32)
        for b in range(nb):
            da[b, :rus[b]] = uas[b]
            dt_[b, :rus[b]] = uts[b]
        ru_blk = np.maximum(128, _ceil_to(np.asarray(rus), 128))
        return (Ru, da, dt_, np.asarray(eas, np.int32),
                np.asarray(ets, np.int32), ru_blk)

    Ru_u = Ru_p = 0
    du_a = du_t = eu_a = eu_t = dp_a = dp_t = ep_a = ep_t = None
    ruu_blk = rup_blk = np.zeros(nb, np.int64)
    if dedup:
        Ru_u, du_a, du_t, eu_a, eu_t, ruu_blk = dedup_tables(a_u, t_u, nlu)
        if nlp:
            Ru_p, dp_a, dp_t, ep_a, ep_t, rup_blk = dedup_tables(
                a_p, t_p, nlp)

    buckets = bperm = None
    if bucketed and nb > 1:
        # sort by (u width, then p width) so a block with a small u
        # window but large p window does not inflate its bucket's W1p
        # padding (ADVICE r3)
        bperm = np.lexsort((w1p_blk, w1u_blk)).astype(np.int64)
        w1u_s, w1p_s = w1u_blk[bperm], w1p_blk[bperm]
        ruu_s, rup_s = ruu_blk[bperm], rup_blk[bperm]
        # bucket edges at width quantiles; merged when degenerate
        edges = sorted({min(nb, max(1, int(q * nb))) for q in
                        (0.5, 0.75, 0.9, 1.0)})
        bks, lo = [], 0
        for hi in edges:
            if hi <= lo:
                continue
            bks.append((hi - lo, int(w1u_s[lo:hi].max()),
                        int(w1p_s[lo:hi].max()),
                        int(ruu_s[lo:hi].max()), int(rup_s[lo:hi].max())))
            lo = hi
        # merge adjacent buckets with identical widths
        merged = [bks[0]]
        for nb_i, *ws in bks[1:]:
            if tuple(ws) == merged[-1][1:]:
                merged[-1] = (merged[-1][0] + nb_i, *ws)
            else:
                merged.append((nb_i, *ws))
        if len(merged) == 1:
            buckets = bperm = None  # uniform widths: keep it simple
        else:
            buckets = tuple(merged)
            w0u, a_u, t_u = w0u[bperm], a_u[bperm], t_u[bperm]
            if nlp:
                w0p, a_p, t_p = w0p[bperm], a_p[bperm], t_p[bperm]
            if dedup:
                du_a, du_t = du_a[bperm], du_t[bperm]
                eu_a, eu_t = eu_a[bperm], eu_t[bperm]
                if nlp:
                    dp_a, dp_t = dp_a[bperm], dp_t[bperm]
                    ep_a, ep_t = ep_a[bperm], ep_t[bperm]

    plan = WindowPlan(B=B, nb=nb, nlu=nlu, nlp=nlp, W1u=W1u, W1p=W1p,
                      n_u_nodes=n_u_nodes, n_p=n_p, n_cells=nc,
                      w0u=w0u, w0p=w0p, a_u=a_u, t_u=t_u, a_p=a_p, t_p=t_p,
                      buckets=buckets, bperm=bperm,
                      dedup=dedup, Ru_u=Ru_u, Ru_p=Ru_p,
                      du_a=du_a, du_t=du_t, eu_a=eu_a, eu_t=eu_t,
                      dp_a=dp_a, dp_t=dp_t, ep_a=ep_a, ep_t=ep_t)
    plan.device_arrays()  # populate eagerly, OUTSIDE any jit trace
    return plan


# ----------------------------------------------------------------------
# layout helpers (device, plain XLA)
# ----------------------------------------------------------------------

def to_planes(x: jnp.ndarray, n: int, nr: int) -> jnp.ndarray:
    """(n,) or (n, k) dof vector -> (k*nr, 128) lane-plane layout
    (nr >= ceil(n/128) so window slices never clip)."""
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    k = x.shape[1]
    flat = jnp.zeros((k, nr * 128), x.dtype).at[:, :n].set(x.T)
    return flat.reshape(k * nr, 128)


def from_planes(planes: jnp.ndarray, n: int, k: int) -> jnp.ndarray:
    """Inverse of to_planes: (k*nr, 128) -> (n, k) ((n,) if k == 1)."""
    nr = planes.shape[0] // k
    out = planes.reshape(k, nr * 128)[:, :n].T
    return out[:, 0] if k == 1 else out


def blocked_saddle_tensors(uu, up, pu, plan: WindowPlan):
    """Canonical (nc, 3nlu, 3nlu) / (nc, 3nlu, nlp) / (nc, nlp, 3nlu)
    element tensors -> the kernel's cell-minor blocked layout
    (nb, rows*cols, B), with velocity dof axes re-indexed from the
    canonical 3n+d to the kernel's d*nlu+n convention.  Pure XLA --
    call inside jit; cost ~ one pass over the tensor bytes."""
    nlu, nlp, B, nb = plan.nlu, plan.nlp, plan.B, plan.nb
    nlu3 = 3 * nlu
    perm = 3 * (np.arange(nlu3) % nlu) + np.arange(nlu3) // nlu

    def blocked(T, nr_, nc_):
        if T is None:
            return None
        if nc_ == nlu3:
            T = T[:, :, perm]
        if nr_ == nlu3:
            T = T[:, perm, :]
        npad = nb * B - T.shape[0]
        T = jnp.pad(T, ((0, npad), (0, 0), (0, 0)))
        T = T.reshape(nb, B, nr_ * nc_).transpose(0, 2, 1)
        return T if plan.bperm is None else T[jnp.asarray(plan.bperm)]

    return (blocked(uu, nlu3, nlu3), blocked(up, nlu3, nlp),
            blocked(pu, nlp, nlu3))


def blocked_pp_tensor(pp, plan: WindowPlan):
    """(nc, nlp, nlp) pressure-pressure block -> (nb, nlp*nlp, B)."""
    nlp, B, nb = plan.nlp, plan.B, plan.nb
    npad = nb * B - pp.shape[0]
    pp = jnp.pad(pp, ((0, npad), (0, 0), (0, 0)))
    pp = pp.reshape(nb, B, nlp * nlp).transpose(0, 2, 1)
    return pp if plan.bperm is None else pp[jnp.asarray(plan.bperm)]


def blocked_scalar_tensor(Ae, plan: WindowPlan):
    nl, B, nb = plan.nlu, plan.B, plan.nb
    npad = nb * B - Ae.shape[0]
    Ae = jnp.pad(Ae, ((0, npad), (0, 0), (0, 0)))
    Ae = Ae.reshape(nb, B, nl * nl).transpose(0, 2, 1)
    return Ae if plan.bperm is None else Ae[jnp.asarray(plan.bperm)]


# ----------------------------------------------------------------------
# kernel building blocks
# ----------------------------------------------------------------------

def planes_fit_vmem(plan: "WindowPlan") -> bool:
    """Whether the all-resident x/y dof planes of a saddle plan fit in
    VMEM next to the streamed element blocks (single source of truth
    for PGModel and DDModel -- the two copies drifted once).  6 u
    planes (x+y for 3 components) + 2 p planes, 512 B per 128-lane
    f32 row, against a ~9 MB budget of the 16 MB/core VMEM (the rest
    holds the double-buffered element-tensor pipeline)."""
    return (6 * plan.nr_u + 2 * plan.nr_p) * 512 <= 9e6


def smoke_compile(plan: "WindowPlan", dtype, precision=None) -> None:
    """Compile (never execute) a representative windowed matvec on the
    current default backend, raising on any lowering/compile failure.

    PGModel/DDModel call this at build time on TPU and degrade to the
    take-path operator when it raises, so a kernel bug costs
    performance instead of nulling every result (round 3 shipped a
    Mosaic lowering failure that all-interpret tests could not see).
    Index tables ride as ShapeDtypeStruct avatars, so nothing is
    allocated and no multi-MB constants inline into the HLO."""
    from ..utils.precision import scoped_precision

    S = jax.ShapeDtypeStruct
    i32 = jnp.int32
    R_u = plan.B * plan.nlu

    def irow(w):
        return S((plan.nb, 1, w), i32)

    if plan.dedup:
        u_idx = (irow(plan.Ru_u), irow(plan.Ru_u), irow(R_u), irow(R_u))
    else:
        u_idx = (irow(R_u), irow(R_u))
    if plan.nlp:
        nlu3 = 3 * plan.nlu
        R_p = plan.B * plan.nlp
        if plan.dedup:
            p_idx = (irow(plan.Ru_p), irow(plan.Ru_p), irow(R_p),
                     irow(R_p))
        else:
            p_idx = (irow(R_p), irow(R_p))
        tabs = (S((plan.nb,), i32), S((plan.nb,), i32), *u_idx, *p_idx)
        args = (S((plan.nb, nlu3 * nlu3, plan.B), dtype),
                S((plan.nb, nlu3 * plan.nlp, plan.B), dtype),
                S((plan.nb, plan.nlp * nlu3, plan.B), dtype),
                S((3 * plan.n_u_nodes + plan.n_p,), dtype))

        def fn(uu, up, pu, x, *tabs):
            return saddle_matvec(uu, up, pu, x, plan, "full", tables=tabs)

    else:
        tabs = (S((plan.nb,), i32), *u_idx)
        args = (S((plan.nb, plan.nlu ** 2, plan.B), dtype),
                S((plan.n_u_nodes,), dtype))

        def fn(ae, x, *tabs):
            return scalar_matvec(ae, x, plan, tables=tabs)

    jax.jit(scoped_precision(fn, precision)).lower(*args, *tabs).compile()


def _split_ok(dtype):
    """The 3-term bf16 split below is exact for f32 data; for other
    dtypes (f64 on the CPU interpreter) fall back to HIGHEST dots.

    Assumed dynamic range (FE element tensors and Krylov vectors sit
    comfortably inside it): |x| below ~3.39e38 (above bf16's max the
    first split term rounds to inf and the residual turns NaN) and
    either zero or |x| above ~2^-110 (below that the second/third bf16
    chunks underflow and exactness degrades to plain bf16 rounding).
    Out-of-range data would fail SILENTLY; keep split=None (HIGHEST)
    for operands that may approach f32 extremes."""
    return dtype == jnp.float32


def _mxu_dot(lhs, rhs, dims, dtype, split):
    """dot_general at full f32 accuracy on the MXU.

    ``split`` names the data side ("lhs"/"rhs") when the OTHER side is
    exactly bf16-representable (the 0/1 one-hot masks here): the data
    splits as x = x1+x2+x3 with xi = bf16 EXACTLY (8+8+8 mantissa bits
    cover f32's 24; each residual subtraction is exact), so three
    native-bf16 MXU passes reproduce the f32 product bit-for-bit up to
    accumulation order -- 2x the rate of Precision.HIGHEST's 6-pass
    emulation, which must split BOTH operands.  ``split=None`` (or a
    non-f32 dtype) keeps the HIGHEST path."""
    dn = (dims, ((), ()))
    if split is None or not _split_ok(dtype):
        return jax.lax.dot_general(lhs, rhs, dn,
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=dtype)
    bf = jnp.bfloat16

    def parts(x):
        x1 = x.astype(bf)
        r = x - x1.astype(dtype)
        x2 = r.astype(bf)
        x3 = (r - x2.astype(dtype)).astype(bf)
        return x1, x2, x3

    # precision MUST be explicit: these dots are already native bf16 x
    # bf16 passes, but without it they inherit whatever
    # jax_default_matmul_precision is ambient at trace time -- an fp32
    # contract precision on bf16 operands is rejected by Mosaic on
    # TPU ("Bad lhs type"), which nulled the entire round-3 bench.
    _P = jax.lax.Precision.DEFAULT
    if split == "lhs":
        mask = rhs.astype(bf)
        terms = [jax.lax.dot_general(xp, mask, dn, precision=_P,
                                     preferred_element_type=dtype)
                 for xp in parts(lhs)]
    else:
        mask = lhs.astype(bf)
        terms = [jax.lax.dot_general(mask, xp, dn, precision=_P,
                                     preferred_element_type=dtype)
                 for xp in parts(rhs)]
    return (terms[2] + terms[1]) + terms[0]


def _onehots(a_row, t_row, W1, dtype):
    """One-hot masks from (1, R) int32 index rows (-1 vanishes)."""
    R = a_row.shape[-1]
    ia = jax.lax.broadcasted_iota(jnp.int32, (W1, R), 0)
    it = jax.lax.broadcasted_iota(jnp.int32, (128, R), 0)
    OHa = (ia == jnp.broadcast_to(a_row, (W1, R))).astype(dtype)
    OHt = (it == jnp.broadcast_to(t_row, (128, R))).astype(dtype)
    return OHa, OHt


def _fold(row, nl, B):
    """(1, nl*B) row -> (nl, B) via vreg-aligned lane slices + sublane
    concat (B is a multiple of 128, so Mosaic never needs a relayout;
    a plain reshape across the sublane/lane split is not lowerable)."""
    return jnp.concatenate(
        [row[:, j * B:(j + 1) * B] for j in range(nl)], axis=0)


def _gather(x_ref, row0, W1, OHa, OHt, nl, B, dtype):
    """Window gather -> (nl, B) element values (row j, lane c)."""
    row0 = pl.multiple_of(row0, 8)
    Xw = x_ref[pl.ds(row0, W1), :]                               # (W1,128)
    G1 = _mxu_dot(Xw, OHa, ((0,), (0,)), dtype, "lhs")           # (128,R)
    xe = jnp.sum(G1 * OHt, axis=0, keepdims=True)                # (1,R)
    return _fold(xe, nl, B)


def _gather_dedup(x_ref, row0, W1, OHa_d, OHt_d, OHa_e, OHt_e,
                  Ru1, nl, B, dtype):
    """Kernel-v3 window gather: unique rows first, then expand.

    Stage A gathers the ~R/3 UNIQUE window rows (one-hot width Ru)
    and folds them into a (Ru1, 128) mini-window; stage B re-gathers
    from the mini-window with the expansion one-hots (height Ru1 <<
    W1).  MXU cost W1*128*Ru + Ru1*128*R vs the direct W1*128*R."""
    row0 = pl.multiple_of(row0, 8)
    Xw = x_ref[pl.ds(row0, W1), :]                               # (W1,128)
    G1 = _mxu_dot(Xw, OHa_d, ((0,), (0,)), dtype, "lhs")         # (128,Ru)
    xu = jnp.sum(G1 * OHt_d, axis=0, keepdims=True)              # (1,Ru)
    Uw = _fold(xu, Ru1, 128)                                     # (Ru1,128)
    G2 = _mxu_dot(Uw, OHa_e, ((0,), (0,)), dtype, "lhs")         # (128,R)
    xe = jnp.sum(G2 * OHt_e, axis=0, keepdims=True)              # (1,R)
    return _fold(xe, nl, B)


def _scatter_dedup(y_ref, row0, W1, OHa_d, OHt_d, OHa_e, OHt_e,
                   ye, dtype):
    """Exact adjoint of _gather_dedup: slot values sum into the unique
    accumulator (adjoint expand, height Ru1), which then scatters into
    the real window (one-hot width Ru).  Both loops stay on
    vreg-aligned lane slices (_scatter's lowering constraint)."""
    nl, B = ye.shape
    Ru1 = OHa_e.shape[0]
    Uacc = jnp.zeros((Ru1, 128), dtype)
    for j in range(nl):
        sl = slice(j * B, (j + 1) * B)
        Mj = OHt_e[:, sl] * jnp.broadcast_to(ye[j:j + 1, :], (128, B))
        Uacc = Uacc + _mxu_dot(OHa_e[:, sl], Mj, ((1,), (1,)), dtype,
                               "rhs")
    Yw = jnp.zeros((W1, 128), dtype)
    for i in range(Ru1):
        sl = slice(i * 128, (i + 1) * 128)
        Mi = OHt_d[:, sl] * jnp.broadcast_to(Uacc[i:i + 1, :], (128, 128))
        Yw = Yw + _mxu_dot(OHa_d[:, sl], Mi, ((1,), (1,)), dtype, "rhs")
    idx = pl.ds(pl.multiple_of(row0, 8), W1)
    y_ref[idx, :] = y_ref[idx, :] + Yw


def _scatter(y_ref, row0, W1, OHa, OHt, ye, dtype):
    """Adjoint of _gather: accumulate (nl, B) values into the window.

    Decomposed per local dof j (lane slices of the one-hots stay
    vreg-aligned; a flat (1, nl*B) row concat is not lowerable):
      Yw[q,t] += sum_c OHa[q, jB+c] * OHt[t, jB+c] * ye[j,c].
    Duplicate targets accumulate inside the MXU f32 accumulator.
    """
    nl, B = ye.shape
    Yw = jnp.zeros((W1, 128), dtype)
    for j in range(nl):
        sl = slice(j * B, (j + 1) * B)
        Mj = OHt[:, sl] * jnp.broadcast_to(ye[j:j + 1, :], (128, B))
        Yw = Yw + _mxu_dot(OHa[:, sl], Mj, ((1,), (1,)), dtype, "rhs")
    idx = pl.ds(pl.multiple_of(row0, 8), W1)
    y_ref[idx, :] = y_ref[idx, :] + Yw


def _apply_block(T_row, xe, nl_out, dtype):
    """(nl_out*nl_in, B) element tensor rows x (nl_in, B) values ->
    (nl_out, B): tile + multiply (VPU) + constant block-sum (MXU)."""
    P = T_row * jnp.concatenate([xe] * nl_out, axis=0)
    rows = P.shape[0]
    nl_in = rows // nl_out
    col_owner = jax.lax.broadcasted_iota(jnp.int32, (nl_out, rows), 1) // nl_in
    RED = (col_owner
           == jax.lax.broadcasted_iota(jnp.int32, (nl_out, rows), 0)
           ).astype(dtype)
    return _mxu_dot(RED, P, ((1,), (0,)), dtype, "rhs")


# ----------------------------------------------------------------------
# kernels ("full" saddle / "uu" velocity block / "up" coupling / scalar)
# ----------------------------------------------------------------------

class _SpaceCtx:
    """Per-space gather/scatter closure: direct (slot one-hots) or
    dedup (unique + expansion one-hots, kernel v3), built once per
    block."""

    def __init__(self, W1, idx_refs, dedup, Ru, dtype):
        self.W1, self.dtype = W1, dtype
        self.dedup = dedup
        if dedup:
            dua, dut, eua, eut = idx_refs
            self.Ru1 = Ru // 128
            # Ru is the BUCKET width: narrow buckets slice their
            # unique-table rows (lane slices of the global-Ru layout;
            # unique counts in this bucket are <= Ru by construction)
            self.OHa_d, self.OHt_d = _onehots(dua[0][:, :Ru],
                                              dut[0][:, :Ru], W1, dtype)
            self.OHa_e, self.OHt_e = _onehots(eua[0], eut[0], self.Ru1,
                                              dtype)
        else:
            a_ref, t_ref = idx_refs
            self.OHa, self.OHt = _onehots(a_ref[0], t_ref[0], W1, dtype)

    def gather(self, x_ref, row0, nl, B):
        if self.dedup:
            return _gather_dedup(x_ref, row0, self.W1, self.OHa_d,
                                 self.OHt_d, self.OHa_e, self.OHt_e,
                                 self.Ru1, nl, B, self.dtype)
        return _gather(x_ref, row0, self.W1, self.OHa, self.OHt,
                       nl, B, self.dtype)

    def scatter(self, y_ref, row0, ye):
        if self.dedup:
            _scatter_dedup(y_ref, row0, self.W1, self.OHa_d, self.OHt_d,
                           self.OHa_e, self.OHt_e, ye, self.dtype)
        else:
            _scatter(y_ref, row0, self.W1, self.OHa, self.OHt, ye,
                     self.dtype)


def _saddle_kernel(plan, mode, dtype, W1u, W1p, Ru_u, Ru_p, boff,
                   w0u_ref, w0p_ref, *args):
    nlu, nlp, B = plan.nlu, plan.nlp, plan.B
    nlu3 = 3 * nlu
    ni = 4 if plan.dedup else 2  # index refs per space
    if mode == "full_pp":
        uu_ref, up_ref, pu_ref, pp_ref = args[:4]
        iu, ip_ = args[4:4 + ni], args[4 + ni:4 + 2 * ni]
        xu_ref, xp_ref, yu_ref, yp_ref = args[4 + 2 * ni:]
    elif mode == "full":
        uu_ref, up_ref, pu_ref = args[:3]
        iu, ip_ = args[3:3 + ni], args[3 + ni:3 + 2 * ni]
        xu_ref, xp_ref, yu_ref, yp_ref = args[3 + 2 * ni:]
    elif mode == "uu":
        uu_ref = args[0]
        iu = args[1:1 + ni]
        xu_ref, yu_ref = args[1 + ni:]
    else:  # "up": velocity rows from pressure values
        up_ref = args[0]
        iu, ip_ = args[1:1 + ni], args[1 + ni:1 + 2 * ni]
        xp_ref, yu_ref = args[1 + 2 * ni:]

    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        yu_ref[:] = jnp.zeros_like(yu_ref)
        if mode in ("full", "full_pp"):
            yp_ref[:] = jnp.zeros_like(yp_ref)

    w0u = w0u_ref[b + boff]
    nr_u = yu_ref.shape[0] // 3
    cu = _SpaceCtx(W1u, iu, plan.dedup, Ru_u, dtype)
    if mode != "uu":
        w0p = w0p_ref[b + boff]
        cp = _SpaceCtx(W1p, ip_, plan.dedup, Ru_p, dtype)

    if mode != "up":
        xe_u = jnp.concatenate([
            cu.gather(xu_ref, d * nr_u + w0u, nlu, B)
            for d in range(3)
        ], axis=0)                                             # (3nlu, B)
    if mode != "uu":
        xe_p = cp.gather(xp_ref, w0p, nlp, B)

    if mode in ("full", "full_pp"):
        ye_u = _apply_block(uu_ref[0], xe_u, nlu3, dtype)
        ye_u = ye_u + _apply_block(up_ref[0], xe_p, nlu3, dtype)
        ye_p = _apply_block(pu_ref[0], xe_u, nlp, dtype)
        if mode == "full_pp":
            ye_p = ye_p + _apply_block(pp_ref[0], xe_p, nlp, dtype)
    elif mode == "uu":
        ye_u = _apply_block(uu_ref[0], xe_u, nlu3, dtype)
    else:
        ye_u = _apply_block(up_ref[0], xe_p, nlu3, dtype)

    for d in range(3):
        cu.scatter(yu_ref, d * nr_u + w0u, ye_u[d * nlu:(d + 1) * nlu])
    if mode in ("full", "full_pp"):
        cp.scatter(yp_ref, w0p, ye_p)


def _scalar_kernel(plan, dtype, W1, Ru, boff, w0_ref, *args):
    nl, B = plan.nlu, plan.B
    ni = 4 if plan.dedup else 2
    ae_ref = args[0]
    idx = args[1:1 + ni]
    x_ref, y_ref = args[1 + ni:]
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    w0 = w0_ref[b + boff]
    ctx = _SpaceCtx(W1, idx, plan.dedup, Ru, dtype)
    xe = ctx.gather(x_ref, w0, nl, B)
    ye = _apply_block(ae_ref[0], xe, nl, dtype)
    ctx.scatter(y_ref, w0, ye)


# ----------------------------------------------------------------------
# host-callable wrappers (jit-safe; plan static, arrays traced)
# ----------------------------------------------------------------------

_INTERPRET = False  # flipped by tests to run kernels on CPU


def _idx_spec(R, off=0):
    return pl.BlockSpec((1, 1, R), lambda b, *_: (b + off, 0, 0))


def _tensor_spec(rows, B, off=0):
    return pl.BlockSpec((1, rows, B), lambda b, *_: (b + off, 0, 0))


def _plane_spec(rows):
    return pl.BlockSpec((rows, 128), lambda b, *_: (0, 0))


def _buckets(plan):
    """(offset, size, W1u, W1p, Ru_u, Ru_p) per width bucket; one
    bucket covering all blocks when the plan is unbucketed.  The Ru
    entries (dedup one-hot widths) are the plan globals for unbucketed
    or legacy 3-entry buckets."""
    if plan.buckets is None:
        return [(0, plan.nb, plan.W1u, plan.W1p, plan.Ru_u, plan.Ru_p)]
    out, off = [], 0
    for entry in plan.buckets:
        if len(entry) == 3:  # pre-dedup plan layout
            nb_i, w1u_i, w1p_i = entry
            ru_u_i, ru_p_i = plan.Ru_u, plan.Ru_p
        else:
            nb_i, w1u_i, w1p_i, ru_u_i, ru_p_i = entry
        out.append((off, nb_i, w1u_i, w1p_i, ru_u_i, ru_p_i))
        off += nb_i
    return out


def saddle_matvec(uu_b, up_b, pu_b, x, plan: WindowPlan,
                  mode: str = "full", pp_b=None, tables=None):
    """y = A x.  x flat (3*n_nodes [+ n_p],) in the node-major dof
    layout (dof = 3*node + comp, then pressure).  ``mode``:
    "full" (saddle; "full_pp" adds a pressure-pressure block, the
    BP-stabilized P1-P1 coarse system), "uu" (velocity block only;
    x/y are (3n,)), "up" (velocity rows from a pressure vector).
    ``tables`` overrides the plan's baked index arrays with traced
    ones -- (w0u, w0p, a_u, t_u, a_p, t_p), shapes (nb,) / (nb,1,R)
    -- so one static plan can serve per-shard tables in the DD step
    (parallel/dd.py)."""
    dtype = x.dtype
    n, np_ = plan.n_u_nodes, plan.n_p
    nr_u, nr_p = plan.nr_u, plan.nr_p
    nlu3 = 3 * plan.nlu
    # all 3 velocity components share the scalar node indices
    R_u, R_p = plan.B * plan.nlu, plan.B * plan.nlp
    tabs = plan.device_arrays() if tables is None else tables
    w0u, w0p = tabs[0], tabs[1]
    if plan.dedup:
        # (du_a, du_t, eu_a, eu_t) widths (Ru_u, Ru_u, R_u, R_u);
        # p-side analogous
        iu_tabs, ip_tabs = tabs[2:6], tabs[6:10]
        iu_widths = (plan.Ru_u, plan.Ru_u, R_u, R_u)
        ip_widths = (plan.Ru_p, plan.Ru_p, R_p, R_p)
    else:
        iu_tabs, ip_tabs = tabs[2:4], tabs[4:6]
        iu_widths = (R_u, R_u)
        ip_widths = (R_p, R_p)

    def idx_specs(widths, off):
        return [_idx_spec(w, off) for w in widths]

    if mode != "up":
        xu = to_planes(x[:3 * n].reshape(n, 3), n, nr_u)
    if mode != "uu":
        xp = to_planes(x[3 * n:] if mode != "up" else x, np_, nr_p)

    if mode in ("full", "full_pp"):
        def mk_specs(off):
            sp = [_tensor_spec(nlu3 * nlu3, plan.B, off),
                  _tensor_spec(nlu3 * plan.nlp, plan.B, off),
                  _tensor_spec(plan.nlp * nlu3, plan.B, off)]
            if mode == "full_pp":
                sp.append(_tensor_spec(plan.nlp ** 2, plan.B, off))
            sp += idx_specs(iu_widths, off) + idx_specs(ip_widths, off)
            sp += [_plane_spec(3 * nr_u), _plane_spec(nr_p)]
            return sp

        inputs = [uu_b, up_b, pu_b]
        if mode == "full_pp":
            inputs.append(pp_b)
        inputs += [*iu_tabs, *ip_tabs, xu, xp]
        out_specs = [_plane_spec(3 * nr_u), _plane_spec(nr_p)]
        out_shape = [jax.ShapeDtypeStruct((3 * nr_u, 128), dtype),
                     jax.ShapeDtypeStruct((nr_p, 128), dtype)]
    elif mode == "uu":
        def mk_specs(off):
            return ([_tensor_spec(nlu3 * nlu3, plan.B, off)]
                    + idx_specs(iu_widths, off)
                    + [_plane_spec(3 * nr_u)])

        inputs = (uu_b, *iu_tabs, xu)
        out_specs = [_plane_spec(3 * nr_u)]
        out_shape = [jax.ShapeDtypeStruct((3 * nr_u, 128), dtype)]
    else:  # "up"
        def mk_specs(off):
            return ([_tensor_spec(nlu3 * plan.nlp, plan.B, off)]
                    + idx_specs(iu_widths, off) + idx_specs(ip_widths, off)
                    + [_plane_spec(nr_p)])

        inputs = (up_b, *iu_tabs, *ip_tabs, xp)
        out_specs = [_plane_spec(3 * nr_u)]
        out_shape = [jax.ShapeDtypeStruct((3 * nr_u, 128), dtype)]

    # one pallas_call per width bucket (offsets into the shared block
    # axis via the BlockSpec index maps -- no tensor copies); bucket
    # outputs sum into the final planes
    out = None
    for off, nb_i, w1u_i, w1p_i, ru_u_i, ru_p_i in _buckets(plan):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(nb_i,),
            in_specs=mk_specs(off), out_specs=out_specs)
        o = pl.pallas_call(
            functools.partial(_saddle_kernel, plan, mode, dtype,
                              w1u_i, w1p_i, ru_u_i, ru_p_i, off),
            grid_spec=grid_spec, out_shape=out_shape,
            interpret=_INTERPRET,
        )(w0u, w0p, *inputs)
        out = o if out is None else [a + b for a, b in zip(out, o)]
    yu = from_planes(out[0], n, 3).reshape(-1)
    if mode in ("full", "full_pp"):
        return jnp.concatenate([yu, from_planes(out[1], np_, 1)])
    return yu


def scalar_matvec(ae_b, x, plan: WindowPlan, tables=None):
    """y = A x for a scalar-space blocked element tensor.  ``tables``
    overrides the plan's index arrays with traced (w0, a, t)."""
    dtype = x.dtype
    n, nr = plan.n_u_nodes, plan.nr_u
    R = plan.B * plan.nlu
    if tables is None:
        tabs = plan.device_arrays()
        if plan.dedup:
            w0, idx_tabs = tabs[0], tabs[2:6]
        else:
            w0, idx_tabs = tabs[0], (tabs[2], tabs[3])
    else:
        w0, *idx_tabs = tables
    if plan.dedup:
        widths = (plan.Ru_u, plan.Ru_u, R, R)
    else:
        widths = (R, R)
    xpl = to_planes(x, n, nr)
    y = None
    for off, nb_i, w1_i, _w1p, ru_i, _rup in _buckets(plan):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nb_i,),
            in_specs=([_tensor_spec(plan.nlu ** 2, plan.B, off)]
                      + [_idx_spec(w, off) for w in widths]
                      + [_plane_spec(nr)]),
            out_specs=[_plane_spec(nr)])
        (o,) = pl.pallas_call(
            functools.partial(_scalar_kernel, plan, dtype, w1_i, ru_i,
                              off),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((nr, 128), dtype)],
            interpret=_INTERPRET,
        )(w0, ae_b, *idx_tabs, xpl)
        y = o if y is None else y + o
    return from_planes(y, n, 1)


# ----------------------------------------------------------------------
# operator wrappers (drop-in for SaddleOperator / ElementOperator in
# the Krylov hot loops; canonical operator retained for diagonals)
# ----------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class WindowedSaddle:
    """SaddleOperator facade whose matvec runs the Pallas windowed
    kernel.  ``base`` (the canonical element operator) serves
    diagonal() and any cold path; blocked tensors are computed in-jit
    by the caller (XLA CSE dedups repeated construction)."""

    def __init__(self, base, uu_b, up_b, pu_b, plan, pp_b=None):
        self.base = base
        self.uu_b, self.up_b, self.pu_b = uu_b, up_b, pu_b
        self.pp_b = pp_b
        self.plan = plan

    def tree_flatten(self):
        return (self.base, self.uu_b, self.up_b, self.pu_b, self.pp_b), \
            self.plan

    @classmethod
    def tree_unflatten(cls, aux, children):
        base, uu_b, up_b, pu_b, pp_b = children
        return cls(base, uu_b, up_b, pu_b, plan=aux, pp_b=pp_b)

    def matvec(self, x):
        if self.pp_b is not None:
            return saddle_matvec(self.uu_b, self.up_b, self.pu_b, x,
                                 self.plan, "full_pp", pp_b=self.pp_b)
        mode = "full" if self.up_b is not None else "uu"
        return saddle_matvec(self.uu_b, self.up_b, self.pu_b, x,
                             self.plan, mode)

    def up_matvec(self, p_vec):
        return saddle_matvec(None, self.up_b, None, p_vec, self.plan, "up")

    def diagonal(self):
        return self.base.diagonal()

    @property
    def n_u_nodes(self):
        return self.base.n_u_nodes


@jax.tree_util.register_pytree_node_class
class WindowedScalar:
    """ElementOperator facade (scalar space) on the windowed kernel."""

    def __init__(self, base, ae_b, plan):
        self.base = base
        self.ae_b = ae_b
        self.plan = plan

    def tree_flatten(self):
        return (self.base, self.ae_b), self.plan

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, plan=aux)

    def matvec(self, x):
        return scalar_matvec(self.ae_b, x, self.plan)

    def diagonal(self):
        return self.base.diagonal()
