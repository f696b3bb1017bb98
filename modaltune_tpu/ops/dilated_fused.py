"""Fused LongNet dilated attention for TPU (Pallas, BlockSpec-only).

Round-2 replacement for the XLA layout pipeline in ops/dilated.py
(design doc: docs/fused_dilated_kernel.md). The reference computes each
(segment ``w``, dilation ``r``) branch as gather -> flash -> scatter ->
LSE mix (``torchscale/component/dilated_attention.py:82-144``); the
round-1 rebuild did the same with XLA reshapes, which measured as >=55%
of attention time. Here no per-branch *dense* layout is materialized:

* tokens are reordered ONCE per call into a "comb" layout -- position
  ``p`` goes to row ``(p % R) * (S/R) + p // R``, ``R = max(ratios)`` --
  after which each r>1 branch's (head-group ``g``, segment ``n``) sparse
  q/k/v rows are ``R/r`` contiguous equally-sized slabs addressable
  purely through BlockSpec index maps (no gathers, no dynamic slicing);
* one Pallas kernel per branch assembles the sparse segment in VMEM and
  runs one-shot softmax attention per q sub-block (the full key set
  stays VMEM-resident; segments are ~0.6-6k rows), emitting a compact
  ``(out, lse)`` pair -- never the r-times-inflated dense scatter;
* a mix kernel recombines branches per (token, head) with softmax(lse)
  weights (``scattering``, ``dilated_attention.py:113-144``), reading
  compact branch outputs via computed index maps (multi-dim blocks
  express the strided layouts) and writing the dense mixed output plus
  the (m, Z) softmax stats the backward reuses;
* the backward recomputes attention probabilities in-kernel from saved
  lse (flash-style), folds the mix-weight demix in (``d out_b =
  exp(lse_b - m)/Z * d_mix`` with stop-gradient weights, matching the
  reference's ``torch.no_grad`` mix), and a combine kernel sums the
  compact per-branch dq/dk/dv back to dense.

Per-branch layout modes (``_BranchPlan.mode``):
  'slc'     r == 1: segment-local comb -- position ``i`` of segment
            ``n`` is stored at ``n*w + (i % R)*(w/R) + i//R``. Whole
            segments are single blocks; compact rows remain
            mix-addressable by pure index maps.
  'comb'    r > 1 and S % w == 0: global comb_R; R/r chunk slabs are
            assembled into VMEM scratch over an inner grid dimension.
  'gather'  otherwise (e.g. w=5792 when S is a multiple of 1024 only):
            the branch runs in its own comb_r layout (one XLA transpose)
            and its compact outputs are expanded to dense comb_R rows by
            XLA row gathers driven by static per-head index tables.

Anything failing :func:`fused_eligible` falls back to the XLA path
(ops.dilated.dilated_attention) at the call site.
"""

from __future__ import annotations

import functools
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from .flash_attention import NEG_INF, _MASK_THRESHOLD

try:  # TPU backend optional (CPU tests run interpret mode)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pl = None
    pltpu = None

_SCORE_BUDGET = 3 * 512 * 1024  # fp32 bytes for one (bq, wr) score tile


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _divisors(n: int) -> List[int]:
    out = [d for d in range(1, int(n ** 0.5) + 1) if n % d == 0]
    return sorted(set(out + [n // d for d in out]))


# ---------------------------------------------------------------------------
# Branch plans
# ---------------------------------------------------------------------------


class _BranchPlan:
    """Static geometry of one (segment w, ratio r) branch.

    Compact per-branch arrays have ``nseg * wr_p`` rows; for mix/combine
    the slc/comb ones are viewed 5-D as ``(BH, nseg, A, cr2, last)``
    with ``A * cr2 == wr_p``.
    """

    def __init__(self, w: int, r: int, S: int, R: int):
        self.w = w                      # effective segment length
        self.r = r
        self.R = R
        self.nseg = -(-S // w)
        self.lp = self.nseg * w         # padded length ('gather' mode)
        self.wr = w // r                # sparse rows per segment
        if r == 1:
            self.mode = "slc"
            self.nch = 1                # chunk-assembly grid steps
            self.A, self.cr2 = R, w // R if w % R == 0 else -1
        elif S % w == 0:
            self.mode = "comb"
            self.nch = R // r
            self.A, self.cr2 = self.nch, w // R
        else:
            self.mode = "gather"
            self.nch = 1
            self.A, self.cr2 = 1, -1    # no 5-D view (dense-expanded)
        # q sub-block rows
        if self.mode == "gather":
            bq = 512
            while bq > 128 and bq * 4 * _round_up(self.wr, bq) > \
                    _SCORE_BUDGET:
                bq //= 2
            self.bq = bq
            self.wr_p = _round_up(self.wr, bq)
        else:
            cands = [d for d in _divisors(self.wr) if d % 8 == 0
                     and d * self.wr * 4 <= _SCORE_BUDGET]
            self.bq = max(cands) if cands else -1
            self.wr_p = self.wr
        self.nqb = self.wr_p // self.bq if self.bq > 0 else 0
        # the backward holds ~2.5x more live (bq, wr) fp32 temporaries
        # than the forward; run it at half the q-block size
        self.bqb = self.bq // 2 if self.bq >= 128 and self.bq % 16 == 0 \
            else self.bq
        self.nqbb = self.wr_p // self.bqb if self.bqb > 0 else 0
        self.out_rows = self.nseg * self.wr_p
        # head-group count of the bias table
        self.G = 1 if self.mode == "slc" else r

    def __repr__(self):
        return (f"BranchPlan(w={self.w} r={self.r} mode={self.mode} "
                f"nseg={self.nseg} wr={self.wr} wr_p={self.wr_p} "
                f"bq={self.bq} nch={self.nch})")


def make_plans(S: int, segment_lengths: Sequence[int],
               dilated_ratios: Sequence[int]
               ) -> Tuple[int, List[_BranchPlan]]:
    R = max(int(r) for r in dilated_ratios)
    plans = [_BranchPlan(min(int(w), S), int(r), S, R)
             for w, r in zip(segment_lengths, dilated_ratios)]
    return R, plans


def fused_eligible(S: int, H: int, D: int,
                   segment_lengths: Sequence[int],
                   dilated_ratios: Sequence[int]) -> bool:
    """Static-shape eligibility for the fused path."""
    if pl is None or len(segment_lengths) != len(dilated_ratios):
        return False
    try:
        R, plans = make_plans(S, segment_lengths, dilated_ratios)
    except Exception:
        return False
    if R < 2 or S % R or (S // R) % 8:
        return False
    MB = S // R                        # mix block rows per comb block
    if not any(p.r == 1 and p.mode == "slc" for p in plans):
        return False                   # mix assumes full coverage
    for p in plans:
        if H % p.r or R % p.r:
            return False
        if p.bq <= 0 or p.wr % 8 or p.wr > 8192:
            return False
        if p.mode == "slc":
            if S % p.w or p.w % R or p.cr2 <= 0 or p.cr2 % 8:
                return False
            if MB % p.cr2 and p.cr2 % MB:
                return False
        elif p.mode == "comb":
            if p.cr2 % 8:
                return False
            if MB % p.cr2 and p.cr2 % MB:
                return False
        else:                          # gather
            if p.w % p.r:
                return False
    return True


# ---------------------------------------------------------------------------
# XLA layout transforms (pure transposes / reshapes)
# ---------------------------------------------------------------------------


def to_head_major(x: jax.Array) -> jax.Array:
    b, s, h, d = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)


def from_head_major(x: jax.Array, B: int, H: int) -> jax.Array:
    bh, s, d = x.shape
    return jnp.transpose(x.reshape(B, H, s, d), (0, 2, 1, 3))


def comb(x: jax.Array, R: int) -> jax.Array:
    """(BH, S, ...) natural -> global comb_R order."""
    bh, s = x.shape[:2]
    t = x.shape[2:]
    x = x.reshape((bh, s // R, R) + t)
    return jnp.moveaxis(x, 2, 1).reshape((bh, s) + t)


def uncomb(x: jax.Array, R: int) -> jax.Array:
    bh, s = x.shape[:2]
    t = x.shape[2:]
    x = x.reshape((bh, R, s // R) + t)
    return jnp.moveaxis(x, 1, 2).reshape((bh, s) + t)


def slc(x: jax.Array, w: int, R: int) -> jax.Array:
    """(BH, S, ...) natural -> segment-local comb with factor R."""
    bh, s = x.shape[:2]
    t = x.shape[2:]
    x = x.reshape((bh, s // w, w // R, R) + t)
    return jnp.swapaxes(x, 2, 3).reshape((bh, s) + t)


def unslc(x: jax.Array, w: int, R: int) -> jax.Array:
    bh, s = x.shape[:2]
    t = x.shape[2:]
    x = x.reshape((bh, s // w, R, w // R) + t)
    return jnp.swapaxes(x, 2, 3).reshape((bh, s) + t)


def comb_r(x: jax.Array, r: int, lp: int) -> jax.Array:
    """(BH, S, ...) natural -> padded-to-lp comb_r order."""
    bh, s = x.shape[:2]
    t = x.shape[2:]
    if lp != s:
        x = jnp.pad(x, ((0, 0), (0, lp - s)) + ((0, 0),) * len(t))
    x = x.reshape((bh, lp // r, r) + t)
    return jnp.moveaxis(x, 2, 1).reshape((bh, lp) + t)


# ---------------------------------------------------------------------------
# Static index tables (numpy)
# ---------------------------------------------------------------------------


def comb_perm(S: int, R: int) -> np.ndarray:
    """perm[comb_row] = token position."""
    p = np.arange(S)
    rows = (p % R) * (S // R) + p // R
    perm = np.empty(S, np.int64)
    perm[rows] = p
    return perm


def _position_table(plan: _BranchPlan, S: int) -> np.ndarray:
    """pos[g, n, row] = token position of compact row (-1 = padding)."""
    w, r, R = plan.w, plan.r, plan.R
    pos = np.full((plan.G, plan.nseg, plan.wr_p), -1, np.int64)
    x = np.arange(plan.wr)
    for g in range(plan.G):
        for n in range(plan.nseg):
            if plan.mode == "slc":
                j = x // (w // R)
                ut = x % (w // R)
                p = n * w + R * ut + j
            elif plan.mode == "comb":
                j = g + (x // plan.cr2) * r
                u = n * plan.cr2 + (x % plan.cr2)
                p = R * u + j
            else:                      # gather (comb_r order)
                p = n * w + x * r + g
            pos[g, n, :plan.wr] = np.where(p < S, p, -1)
    return pos


def _gather_tables(plan: _BranchPlan, S: int, R: int, H: int
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """'gather'-mode per-head tables over dense comb_R rows.

    idx[h, rho] = compact row of the position at dense comb row rho
    (0 when uncovered); cov[h, rho] = covered; inv[h, row] = dense comb
    row that feeds compact row (0 for never-read padding rows).
    """
    perm = comb_perm(S, R)
    w, r = plan.w, plan.r
    hg = H // r
    idx = np.zeros((H, S), np.int32)
    cov = np.zeros((H, S), bool)
    inv = np.zeros((H, plan.out_rows), np.int32)
    p = perm
    i = p % w
    n = p // w
    for h in range(H):
        g = h // hg
        c = (i % r) == g
        rows = n * plan.wr_p + (i - g) // r
        idx[h] = np.where(c, rows, 0).astype(np.int32)
        cov[h] = c
        inv[h, rows[c]] = np.nonzero(c)[0].astype(np.int32)
    return idx, cov, inv


# ---------------------------------------------------------------------------
# Bias arrays and index maps
# ---------------------------------------------------------------------------


def _branch_bias(vmask: Optional[jax.Array], B: int,
                 plan: _BranchPlan, pos_table: np.ndarray) -> jax.Array:
    """(B, G, nseg, 1, wr_p) fp32 additive bias (NEG_INF masks a row\n    as key)."""
    pos = jnp.asarray(pos_table.reshape(-1), jnp.int32)
    valid = pos >= 0
    if vmask is None:
        bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)
        bias = jnp.broadcast_to(bias, (B,) + bias.shape)
    else:
        got = jnp.take(vmask > 0.5, jnp.clip(pos, 0), axis=1)
        bias = jnp.where(valid[None] & got, 0.0, NEG_INF
                         ).astype(jnp.float32)
    return bias.reshape(B, plan.G, plan.nseg, 1, plan.wr_p)


def _chunk_map(plan: _BranchPlan, S: int, H: int):
    """Branch-kernel q/k/v/dmix chunk-block index map.

    Arrays: 'slc' slc-layout (BH, S, *) blocks (1, w, *); 'comb' comb_R
    (BH, S, *) blocks (1, cr2, *); 'gather' comb_r (BH, lp, *) blocks
    (1, wr, *).
    """
    r, w, R = plan.r, plan.w, plan.R
    if plan.mode == "slc":
        return lambda bh, n, c: (bh, n, 0)
    if plan.mode == "comb":
        nsg = S // w
        hg = H // r
        return lambda bh, n, c: (bh, ((bh % H) // hg + c * r) * nsg + n,
                                 0)
    hg = H // r
    nseg = plan.nseg
    return lambda bh, n, c: (bh, ((bh % H) // hg) * nseg + n, 0)


def _bias_map(plan: _BranchPlan, H: int):
    if plan.G == 1:
        return lambda bh, n, c: (bh // H, 0, n, 0, 0)
    hg = H // plan.r
    return lambda bh, n, c: (bh // H, (bh % H) // hg, n, 0, 0)


def _seg_map(plan: _BranchPlan):
    """(bh, n)-addressed compact blocks (out/lse/own-arrays)."""
    return lambda bh, n, c: (bh, n, 0)


def _mix_spec(plan: _BranchPlan, S: int, H: int, MB: int, last: int,
              dtype):
    """(view_shape, BlockSpec) for reading a compact slc/comb branch
    array inside mix/combine at dense comb rows [j*(S/R) + t*MB, +MB).
    The compact array is reshaped to (BH, nseg, A, cr2, last)."""
    r, w, R, cr2, A = plan.r, plan.w, plan.R, plan.cr2, plan.A
    hg = H // r

    def a_of(bh, j):
        if plan.mode == "slc":
            return j
        g = (bh % H) // hg
        return jnp.clip((j - g) // r, 0, A - 1)

    if MB % cr2 == 0:
        segs = MB // cr2
        shape = (1, segs, 1, cr2, last)

        def m(bh, j, t):
            return (bh, t * segs, a_of(bh, j), 0, 0)
    else:  # cr2 % MB == 0
        shape = (1, 1, 1, MB, last)

        def m(bh, j, t):
            u0 = t * MB
            return (bh, u0 // cr2, a_of(bh, j), (u0 % cr2) // MB, 0)
    return shape, m


def _covered_fn(plan: _BranchPlan, H: int):
    """Traced (bh, j) -> bool: does this branch cover comb block j for
    the head of bh? ('slc' and 'gather'-dense are always True.)"""
    if plan.mode != "comb":
        return lambda bh, j: True
    r = plan.r
    hg = H // r
    return lambda bh, j: (j % r) == ((bh % H) // hg) % r


def _kernel_params():
    # default scoped-vmem budget is 16MB; v5e has far more physical
    # VMEM and the big-segment branches need ~20MB of stack
    try:
        return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    except Exception:  # pragma: no cover - older pallas versions
        return None


# ---------------------------------------------------------------------------
# Branch forward kernel
# ---------------------------------------------------------------------------


def _attend_loop(plan, qrow, k, v, bias_row, scale, o_ref, l_ref,
                 qvalid=None):
    """One-shot softmax attention per q sub-block; k/v fully resident.

    ``qvalid(i) -> (bq, 1) bool`` marks which query rows of sub-block i
    correspond to real token positions; invalid rows get lse=NEG_INF so
    neither the mix nor the backward demix ever weights them ('gather'
    mode pads the last partial segment with rows whose position >= S).
    """
    bq, nqb = plan.bq, plan.nqb

    def body(i, _):
        qi = qrow(i)
        s = jax.lax.dot_general(qi, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(bias_row > _MASK_THRESHOLD, s * scale, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.where(s > _MASK_THRESHOLD, jnp.exp(s - m), 0.0)
        l = jnp.sum(p, axis=-1, keepdims=True)
        lsafe = jnp.where(l > 0, l, 1.0)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o = o / lsafe
        lse = jnp.where(l > 0, m + jnp.log(lsafe), NEG_INF)
        if qvalid is not None:
            lse = jnp.where(qvalid(i), lse, NEG_INF)
        o_ref[0, pl.ds(i * bq, bq), :] = o.astype(o_ref.dtype)
        l_ref[0, pl.ds(i * bq, bq), :] = lse
        return 0

    jax.lax.fori_loop(0, nqb, body, 0)


def _branch_fwd_call(plan: _BranchPlan, q_l, k_l, v_l, bias, S: int,
                     H: int, scale: float, interpret: bool):
    """-> compact out (BH, out_rows, D) q.dtype, lse (BH, out_rows, 1)."""
    BH, _, D = q_l.shape
    wr, wr_p, nch = plan.wr, plan.wr_p, plan.nch
    cr = plan.w if plan.mode == "slc" else \
        plan.cr2 if plan.mode == "comb" else wr
    need_scr = plan.mode == "comb"
    pad_q = wr_p != wr
    cmap = _chunk_map(plan, S, H)
    bmap = _bias_map(plan, H)
    smap = _seg_map(plan)

    def kernel(q_ref, k_ref, v_ref, b_ref, o_ref, l_ref, *scr):
        c = pl.program_id(2)
        seg_n = pl.program_id(1)
        bh_id = pl.program_id(0)
        if need_scr:
            qs, ks, vs = scr
            qs[pl.ds(c * cr, cr), :] = q_ref[0]
            ks[pl.ds(c * cr, cr), :] = k_ref[0]
            vs[pl.ds(c * cr, cr), :] = v_ref[0]

        @pl.when(c == nch - 1)
        def _compute():
            if need_scr:
                k, v = ks[...], vs[...]

                def qrow(i):
                    return qs[pl.ds(i * plan.bq, plan.bq), :]
            else:
                k, v = k_ref[0], v_ref[0]
                if pad_q:
                    (qpad,) = scr
                    qpad[0:wr, :] = q_ref[0]
                    if wr_p > wr:
                        qpad[wr:wr_p, :] = jnp.zeros((wr_p - wr, D),
                                                     qpad.dtype)

                    def qrow(i):
                        return qpad[pl.ds(i * plan.bq, plan.bq), :]
                else:
                    def qrow(i):
                        return q_ref[0, pl.ds(i * plan.bq, plan.bq), :]
            bias_row = b_ref[0, 0, 0][:, :k.shape[0]]
            qvalid = None
            if plan.mode == "gather":
                g = (bh_id % H) // (H // plan.r)

                def qvalid(i):
                    rows = jax.lax.broadcasted_iota(
                        jnp.int32, (plan.bq, 1), 0) + i * plan.bq
                    pos = seg_n * plan.w + rows * plan.r + g
                    return (rows < wr) & (pos < S)
            _attend_loop(plan, qrow, k, v, bias_row, scale, o_ref,
                         l_ref, qvalid)

    scratch = []
    if need_scr:
        scratch = [pltpu.VMEM((wr, D), q_l.dtype) for _ in range(3)]
    elif pad_q:
        scratch = [pltpu.VMEM((wr_p, D), q_l.dtype)]

    out, lse = pl.pallas_call(
        kernel,
        grid=(BH, plan.nseg, nch),
        in_specs=[
            pl.BlockSpec((1, cr, D), cmap),
            pl.BlockSpec((1, cr, D), cmap),
            pl.BlockSpec((1, cr, D), cmap),
            pl.BlockSpec((1, 1, 1, 1, wr_p), bmap),
        ],
        out_specs=[
            pl.BlockSpec((1, wr_p, D), smap),
            pl.BlockSpec((1, wr_p, 1), smap),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, plan.out_rows, D), q_l.dtype),
            jax.ShapeDtypeStruct((BH, plan.out_rows, 1), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=_kernel_params(),
        interpret=interpret,
    )(q_l, k_l, v_l, bias)
    return out, lse


# ---------------------------------------------------------------------------
# Mix kernel
# ---------------------------------------------------------------------------


def _mix_call(plans: List[_BranchPlan], mix_ins, S: int, H: int,
              out_dtype, interpret: bool):
    """mix_ins: per branch (out_arr, lse_arr, kind) where kind is
    'view' (5-D compact) or 'dense' ((BH, S, *) comb order).
    -> mixed (BH, S, D) out_dtype, m (BH, S, 1) f32, Z (BH, S, 1) f32.
    """
    R = plans[0].R
    MB = S // R
    BH = mix_ins[0][0].shape[0]
    D = mix_ins[0][0].shape[-1]
    covered = [_covered_fn(p, H) for p in plans]

    in_specs, operands = [], []
    for p, (o_arr, l_arr, kind) in zip(plans, mix_ins):
        if kind == "dense":
            dmapD = lambda bh, j, t: (bh, j, 0)
            in_specs.append(pl.BlockSpec((1, MB, D), dmapD))
            in_specs.append(pl.BlockSpec((1, MB, 1), dmapD))
        else:
            shp_o, mo = _mix_spec(p, S, H, MB, D, o_arr.dtype)
            shp_l, ml = _mix_spec(p, S, H, MB, 1, jnp.float32)
            in_specs.append(pl.BlockSpec(shp_o, mo))
            in_specs.append(pl.BlockSpec(shp_l, ml))
        operands += [o_arr, l_arr]

    def kernel(*refs):
        bh = pl.program_id(0)
        j = pl.program_id(1)
        outs_refs = refs[-3:]
        ins = refs[:-3]
        m = jnp.full((MB, 1), NEG_INF, jnp.float32)
        pairs = []
        for bi, p in enumerate(plans):
            o = ins[2 * bi][...].reshape(MB, D).astype(jnp.float32)
            l = ins[2 * bi + 1][...].reshape(MB, 1)
            cov = covered[bi](bh, j)
            if not (cov is True):
                l = jnp.where(cov, l, NEG_INF)
            pairs.append((o, l))
            m = jnp.maximum(m, l)
        Z = jnp.zeros((MB, 1), jnp.float32)
        acc = jnp.zeros((MB, D), jnp.float32)
        for o, l in pairs:
            wb = jnp.where(l > _MASK_THRESHOLD, jnp.exp(l - m), 0.0)
            Z = Z + wb
            acc = acc + wb * o
        zsafe = jnp.where(Z > 0, Z, 1.0)
        mixed_ref, m_ref, z_ref = outs_refs
        mixed_ref[0] = (acc / zsafe).astype(mixed_ref.dtype)
        m_ref[0] = m
        z_ref[0] = Z

    dmapO = lambda bh, j, t: (bh, j, 0)
    mixed, m, Z = pl.pallas_call(
        kernel,
        grid=(BH, R, 1),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, MB, D), dmapO),
            pl.BlockSpec((1, MB, 1), dmapO),
            pl.BlockSpec((1, MB, 1), dmapO),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, S, D), out_dtype),
            jax.ShapeDtypeStruct((BH, S, 1), jnp.float32),
            jax.ShapeDtypeStruct((BH, S, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return mixed, m, Z


# ---------------------------------------------------------------------------
# Branch backward kernel
# ---------------------------------------------------------------------------


def _branch_bwd_call(plan: _BranchPlan, q_l, k_l, v_l, bias, dmix_l,
                     m_l, z_l, lse_b, S: int, H: int, scale: float,
                     interpret: bool):
    """-> compact dq, dk, dv (BH, out_rows, D) in q.dtype.

    dmix arrives in the branch's q layout ('slc'/'comb': dense
    slc/comb_R order, chunk-assembled like q; 'gather': pre-gathered
    compact). m/Z arrive pre-gathered into this branch's compact row
    order for every mode (XLA row gathers via static tables); lse_b is
    the branch's own compact lse.
    """
    BH, _, D = q_l.shape
    wr, wr_p, nch, bq = plan.wr, plan.wr_p, plan.nch, plan.bqb
    cr = plan.w if plan.mode == "slc" else \
        plan.cr2 if plan.mode == "comb" else wr
    need_scr = plan.mode == "comb"
    gather = plan.mode == "gather"
    pad_q = wr_p != wr
    cmap = _chunk_map(plan, S, H)
    bmap = _bias_map(plan, H)
    smap = _seg_map(plan)
    dmap = smap if gather else cmap   # dmix/m/Z block map

    def kernel(q_ref, k_ref, v_ref, b_ref, dm_ref, m_ref, z_ref, l_ref,
               dq_ref, dk_ref, dv_ref, *scr):
        c = pl.program_id(2)
        dk_acc, dv_acc = scr[-2:]
        if need_scr:
            qs, ks, vs, dms = scr[:-3]
            qs[pl.ds(c * cr, cr), :] = q_ref[0]
            ks[pl.ds(c * cr, cr), :] = k_ref[0]
            vs[pl.ds(c * cr, cr), :] = v_ref[0]
            dms[pl.ds(c * cr, cr), :] = dm_ref[0]

        @pl.when(c == nch - 1)
        def _compute():
            if need_scr:
                k, v = ks[...], vs[...]

                def qrow(i):
                    return qs[pl.ds(i * bq, bq), :]

                def drow(i):
                    return dms[pl.ds(i * bq, bq), :]
            else:
                k, v = k_ref[0], v_ref[0]
                if pad_q:
                    qpad = scr[0]
                    qpad[0:wr, :] = q_ref[0]
                    if wr_p > wr:
                        qpad[wr:wr_p, :] = jnp.zeros((wr_p - wr, D),
                                                     qpad.dtype)

                    def qrow(i):
                        return qpad[pl.ds(i * bq, bq), :]
                else:
                    def qrow(i):
                        return q_ref[0, pl.ds(i * bq, bq), :]

                def drow(i):
                    return dm_ref[0, pl.ds(i * bq, bq), :]
            # stats arrive as (1, wr_p) rows (lane-packed: a (wr_p, 1)
            # column block would pad to 128 lanes and blow VMEM); one
            # row->column relayout per segment into a scratch ref,
            # then per-sub-block sublane ref slices.
            stat_s = scr[-3]
            stat_s[:, 0:1] = l_ref[0, 0].reshape(wr_p, 1)
            stat_s[:, 1:2] = m_ref[0, 0].reshape(wr_p, 1)
            stat_s[:, 2:3] = z_ref[0, 0].reshape(wr_p, 1)

            def lrow(i):
                return stat_s[pl.ds(i * bq, bq), 0:1]

            def mrow(i):
                return stat_s[pl.ds(i * bq, bq), 1:2]

            def zrow(i):
                return stat_s[pl.ds(i * bq, bq), 2:3]
            bias_row = b_ref[0, 0, 0][:, :k.shape[0]]
            dk_acc[...] = jnp.zeros_like(dk_acc)
            dv_acc[...] = jnp.zeros_like(dv_acc)

            def body(i, _):
                qi = qrow(i)
                lse_i = lrow(i)                               # (bq, 1)
                m_i = mrow(i)
                z_i = zrow(i)
                dmix_i = drow(i).astype(jnp.float32)
                s = jax.lax.dot_general(
                    qi, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s = jnp.where(bias_row > _MASK_THRESHOLD, s * scale,
                              NEG_INF)
                lse_exp = jnp.where(lse_i > _MASK_THRESHOLD, lse_i, 0.0)
                p = jnp.where(s > _MASK_THRESHOLD, jnp.exp(s - lse_exp),
                              0.0)
                zsafe = jnp.where(z_i > 0, z_i, 1.0)
                wm = jnp.where(lse_i > _MASK_THRESHOLD,
                               jnp.exp(lse_i - m_i) / zsafe, 0.0)
                do = dmix_i * wm                              # (bq, D)
                pb = p.astype(v.dtype)
                out_i = jax.lax.dot_general(
                    pb, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                delta = jnp.sum(do * out_i, axis=-1, keepdims=True)
                dob = do.astype(v.dtype)
                dp = jax.lax.dot_general(
                    dob, v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ds = p * (dp - delta) * scale
                dsb = ds.astype(k.dtype)
                dq_i = jax.lax.dot_general(
                    dsb, k, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dq_ref[0, pl.ds(i * bq, bq), :] = dq_i.astype(
                    dq_ref.dtype)
                dk_acc[0:wr, :] += jax.lax.dot_general(
                    dsb, qi, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dv_acc[0:wr, :] += jax.lax.dot_general(
                    pb, dob, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return 0

            jax.lax.fori_loop(0, plan.nqbb, body, 0)
            dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
            dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)

    kv_rows = wr_p  # dk/dv row stride matches dq (tail rows stay zero)
    scratch = []
    if need_scr:
        scratch = [pltpu.VMEM((wr, D), q_l.dtype) for _ in range(4)]
    elif pad_q:
        scratch = [pltpu.VMEM((wr_p, D), q_l.dtype)]
    scratch += [pltpu.VMEM((wr_p, 3), jnp.float32)]
    scratch += [pltpu.VMEM((kv_rows, D), jnp.float32) for _ in range(2)]

    dm_cr = wr_p if gather else cr
    smap4 = lambda bh, n, c: (bh, n, 0, 0)
    statv = lambda a: a.reshape(BH, plan.nseg, 1, wr_p)
    outs = pl.pallas_call(
        kernel,
        grid=(BH, plan.nseg, nch),
        in_specs=[
            pl.BlockSpec((1, cr, D), cmap),
            pl.BlockSpec((1, cr, D), cmap),
            pl.BlockSpec((1, cr, D), cmap),
            pl.BlockSpec((1, 1, 1, 1, wr_p), bmap),
            pl.BlockSpec((1, dm_cr, D), dmap),
            pl.BlockSpec((1, 1, 1, wr_p), smap4),
            pl.BlockSpec((1, 1, 1, wr_p), smap4),
            pl.BlockSpec((1, 1, 1, wr_p), smap4),
        ],
        out_specs=[
            pl.BlockSpec((1, wr_p, D), smap),
            pl.BlockSpec((1, kv_rows, D),
                         lambda bh, n, c: (bh, n, 0)),
            pl.BlockSpec((1, kv_rows, D),
                         lambda bh, n, c: (bh, n, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, plan.out_rows, D), q_l.dtype),
            jax.ShapeDtypeStruct((BH, plan.nseg * kv_rows, D),
                                 q_l.dtype),
            jax.ShapeDtypeStruct((BH, plan.nseg * kv_rows, D),
                                 q_l.dtype),
        ],
        scratch_shapes=scratch,
        compiler_params=_kernel_params(),
        interpret=interpret,
    )(q_l, k_l, v_l, bias, dmix_l, statv(m_l), statv(z_l),
      statv(lse_b))
    return outs


# ---------------------------------------------------------------------------
# Combine kernel (sum compact per-branch gradients to dense comb)
# ---------------------------------------------------------------------------


def _combine_call(plans: List[_BranchPlan], grads, S: int, H: int,
                  out_dtype, interpret: bool):
    """grads: per branch (dq, dk, dv, kind) with kind 'view'|'dense'.
    'view' arrays are 5-D (BH, nseg, A, cr2, D); dk/dv of slc/comb
    branches have wr rows per segment (== wr_p). -> dense comb
    (dq, dk, dv) each (BH, S, D)."""
    R = plans[0].R
    MB = S // R
    BH = grads[0][0].shape[0]
    D = grads[0][0].shape[-1]
    covered = [_covered_fn(p, H) for p in plans]

    in_specs, operands = [], []
    for p, (dq, dk, dv, kind) in zip(plans, grads):
        if kind == "dense":
            dmapD = lambda bh, j, t: (bh, j, 0)
            for a in (dq, dk, dv):
                in_specs.append(pl.BlockSpec((1, MB, D), dmapD))
                operands.append(a)
        else:
            shp, mo = _mix_spec(p, S, H, MB, D, dq.dtype)
            for a in (dq, dk, dv):
                in_specs.append(pl.BlockSpec(shp, mo))
                operands.append(a)

    def kernel(*refs):
        bh = pl.program_id(0)
        j = pl.program_id(1)
        out_refs = refs[-3:]
        ins = refs[:-3]
        accs = [jnp.zeros((MB, D), jnp.float32) for _ in range(3)]
        for bi, p in enumerate(plans):
            cov = covered[bi](bh, j)
            for t in range(3):
                v = ins[3 * bi + t][...].reshape(MB, D).astype(
                    jnp.float32)
                if cov is True:
                    accs[t] = accs[t] + v
                else:
                    accs[t] = accs[t] + jnp.where(cov, v, 0.0)
        for t in range(3):
            out_refs[t][0] = accs[t].astype(out_refs[t].dtype)

    dmapO = lambda bh, j, t: (bh, j, 0)
    return pl.pallas_call(
        kernel,
        grid=(BH, R, 1),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, MB, D), dmapO) for _ in range(3)],
        out_shape=[jax.ShapeDtypeStruct((BH, S, D), out_dtype)
                   for _ in range(3)],
        interpret=interpret,
    )(*operands)


# ---------------------------------------------------------------------------
# Top-level op (custom VJP per static configuration)
# ---------------------------------------------------------------------------


def _layout_key(plan: _BranchPlan, i: int):
    if plan.mode == "slc":
        return ("slc", plan.w)
    if plan.mode == "comb":
        return ("comb",)
    return ("cr", i)


@functools.lru_cache(maxsize=32)
def _build_fused(B: int, S: int, H: int, D: int,
                 segments: Tuple[int, ...], ratios: Tuple[int, ...],
                 scale: float, interpret: bool):
    """Compile-time assembly of the fused op for one static config.

    Returns f(qn, kn, vn, vmask) over head-major natural (BH, S, D)
    tensors and an fp32 validity mask (B, S); differentiable in q/k/v.
    """
    R, plans = make_plans(S, segments, ratios)
    BH = B * H
    pos_tables = [_position_table(p, S) for p in plans]
    gtabs = {i: _gather_tables(p, S, R, H)
             for i, p in enumerate(plans) if p.mode == "gather"}
    # static per-(bh) gather tables
    gidx = {i: np.tile(t[0], (B, 1)) for i, t in gtabs.items()}
    gcov = {i: np.tile(t[1], (B, 1)) for i, t in gtabs.items()}
    ginv = {i: np.tile(t[2], (B, 1)) for i, t in gtabs.items()}

    def _stat_inv(i, p):
        """(BH, out_rows) dense-comb row feeding each compact row (the
        backward pre-gathers the mix stats m/Z into branch order)."""
        if p.mode == "gather":
            return ginv[i]
        pos = pos_tables[i]                       # (G, nseg, wr_p)
        rows = (pos % R) * (S // R) + pos // R    # comb row of position
        rows = np.where(pos >= 0, rows, 0).astype(np.int32)
        rows = rows.reshape(pos.shape[0], -1)     # (G, out_rows)
        per_head = rows[np.arange(H) // (H // p.r) % rows.shape[0]]
        return np.tile(per_head, (B, 1))

    stat_inv = {i: _stat_inv(i, p) for i, p in enumerate(plans)}

    def layouts(xn):
        lay = {}
        for i, p in enumerate(plans):
            key = _layout_key(p, i)
            if key in lay:
                continue
            if p.mode == "slc":
                lay[key] = slc(xn, p.w, R)
            elif p.mode == "comb":
                lay[key] = comb(xn, R)
            else:
                lay[key] = comb_r(xn, p.r, p.lp)
        return lay

    def expand(i, p, compact, fill, last):
        """compact (BH, out_rows, last) -> dense comb (BH, S, last)."""
        idx = jnp.asarray(gidx[i])[..., None]
        cov = jnp.asarray(gcov[i])[..., None]
        got = jnp.take_along_axis(
            compact, jnp.broadcast_to(idx, (BH, S, 1)), axis=1)
        return jnp.where(cov, got, fill).astype(compact.dtype)

    def fwd_impl(qn, kn, vn, vmask):
        ql, kl, vl = layouts(qn), layouts(kn), layouts(vn)
        biases = [_branch_bias(vmask, B, p, pos_tables[i])
                  for i, p in enumerate(plans)]
        outs, lses = [], []
        for i, p in enumerate(plans):
            key = _layout_key(p, i)
            o, l = _branch_fwd_call(p, ql[key], kl[key], vl[key],
                                    biases[i], S, H, scale, interpret)
            outs.append(o)
            lses.append(l)
        mix_ins = []
        for i, p in enumerate(plans):
            if p.mode == "gather":
                mix_ins.append((expand(i, p, outs[i], 0.0, D),
                                expand(i, p, lses[i], NEG_INF, 1),
                                "dense"))
            else:
                mix_ins.append(
                    (outs[i].reshape(BH, p.nseg, p.A, p.cr2, D),
                     lses[i].reshape(BH, p.nseg, p.A, p.cr2, 1),
                     "view"))
        mixed, m, Z = _mix_call(plans, mix_ins, S, H, qn.dtype,
                                interpret)
        mixed = checkpoint_name(mixed, "dilated_out")
        lses = tuple(checkpoint_name(l, "dilated_lse") for l in lses)
        m = checkpoint_name(m, "dilated_stats")
        Z = checkpoint_name(Z, "dilated_stats")
        return uncomb(mixed, R), (qn, kn, vn, vmask, lses, m, Z)

    def bwd_impl(res, g):
        qn, kn, vn, vmask, lses, m, Z = res
        dc = comb(g, R)
        ql, kl, vl = layouts(qn), layouts(kn), layouts(vn)
        biases = [_branch_bias(vmask, B, p, pos_tables[i])
                  for i, p in enumerate(plans)]
        grads = []
        for i, p in enumerate(plans):
            key = _layout_key(p, i)
            inv = jnp.asarray(stat_inv[i])[..., None]
            rows = p.out_rows

            def pregather(arr):
                return jnp.take_along_axis(
                    arr, jnp.broadcast_to(inv, (BH, rows, 1)), axis=1)
            ml, zl = pregather(m), pregather(Z)
            if p.mode == "slc":
                dml = slc(uncomb(dc, R), p.w, R)
            elif p.mode == "comb":
                dml = dc
            else:
                dml = jnp.take_along_axis(
                    dc, jnp.broadcast_to(inv, (BH, rows, D)), axis=1)
            dq, dk, dv = _branch_bwd_call(
                p, ql[key], kl[key], vl[key], biases[i], dml, ml, zl,
                lses[i], S, H, scale, interpret)
            if p.mode == "gather":
                grads.append((expand(i, p, dq, 0.0, D),
                              expand(i, p, dk, 0.0, D),
                              expand(i, p, dv, 0.0, D), "dense"))
            else:
                grads.append(
                    (dq.reshape(BH, p.nseg, p.A, p.cr2, D),
                     dk.reshape(BH, p.nseg, p.A, p.cr2, D),
                     dv.reshape(BH, p.nseg, p.A, p.cr2, D), "view"))
        dqc, dkc, dvc = _combine_call(plans, grads, S, H, qn.dtype,
                                      interpret)
        return (uncomb(dqc, R), uncomb(dkc, R), uncomb(dvc, R),
                jnp.zeros_like(vmask))

    @jax.custom_vjp
    def f(qn, kn, vn, vmask):
        return fwd_impl(qn, kn, vn, vmask)[0]

    f.defvjp(fwd_impl, bwd_impl)
    return f


def fused_dilated_attention(q, k, v, *, segment_lengths: Sequence[int],
                            dilated_ratios: Sequence[int],
                            mask: Optional[jax.Array] = None,
                            scale: Optional[float] = None,
                            interpret: bool = False) -> jax.Array:
    """Multi-branch LongNet dilated attention, fused (TPU Pallas).

    Same semantics as :func:`ops.dilated.dilated_attention` (which is
    the oracle in tests): q/k/v ``(B, L, H, D)``, optional ``(B, L)``
    bool validity mask, output ``(B, L, H, D)`` in q's dtype. Call
    :func:`fused_eligible` first; ineligible shapes must use the
    fallback.
    """
    B, S, H, D = q.shape
    if scale is None:
        scale = D ** -0.5
    fn = _build_fused(B, S, H, D,
                      tuple(int(x) for x in segment_lengths),
                      tuple(int(x) for x in dilated_ratios),
                      float(scale), bool(interpret))
    vmask = jnp.ones((B, S), jnp.float32) if mask is None else \
        mask.astype(jnp.float32)
    out = fn(to_head_major(q), to_head_major(k), to_head_major(v),
             vmask)
    return from_head_major(out, B, H)
