"""Fused LongNet dilated attention for TPU (Pallas, BlockSpec-only).

Round-2 replacement for the XLA layout pipeline in ops/dilated.py
(design doc: docs/fused_dilated_kernel.md). The reference computes each
(segment ``w``, dilation ``r``) branch as gather -> flash -> scatter ->
LSE mix (``torchscale/component/dilated_attention.py:82-144``); the
round-1 rebuild did the same with XLA reshapes, which measured as >=55%
of attention time. Here no per-branch *dense scatter* or gather is ever
materialized -- the only XLA-level ops are cheap transposes:

* tokens are reordered ONCE per call into a "comb" layout -- position
  ``p`` goes to row ``(p % R) * (S/R) + p // R``, ``R = max(ratios)`` --
  after which each aligned r>1 branch's (head-group ``g``, segment
  ``n``) sparse q/k/v rows are ``R/r`` contiguous equally-sized slabs
  addressable purely through BlockSpec index maps;
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
  'crd'     otherwise (e.g. w=5792 when S is a multiple of 1024 only):
            the branch reads AND writes in its own comb_r-dense layout
            (one XLA transpose per tensor each way); only each head's
            own group-g rows are real, so the mix/combine kernels mask
            this branch's dense rows with the covered predicate
            ``j % r == g``.

Anything failing :func:`fused_eligible` falls back to the XLA path
(ops.dilated.dilated_attention) at the call site.
"""

from __future__ import annotations

import functools
import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from .flash_attention import NEG_INF, _MASK_THRESHOLD, _mm_precision

try:  # TPU backend optional (CPU tests run interpret mode)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pl = None
    pltpu = None

# fp32 bytes for one (bq, wr) score tile; the backward holds ~2.5x more
# live score-sized temporaries than the forward, so it gets a smaller
# budget. The VMEM ceiling is raised via CompilerParams (v5e has far
# more physical VMEM than the 16MB default scoped budget).
_FWD_SCORE_BUDGET = 6 * 1024 * 1024
_BWD_SCORE_BUDGET = 6 * 1024 * 1024
_MAX_BQ = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _divisors(n: int) -> List[int]:
    out = [d for d in range(1, int(n ** 0.5) + 1) if n % d == 0]
    return sorted(set(out + [n // d for d in out]))


def _pick_bq_divisor(wr: int, budget: int) -> int:
    cands = [d for d in _divisors(wr) if d % 8 == 0 and d <= _MAX_BQ
             and d * wr * 4 <= budget]
    return max(cands) if cands else -1


def _pick_bq_tail(wr: int, budget: int) -> int:
    """Any multiple-of-8 bq; the q loop handles a short tail block."""
    bq = _MAX_BQ
    while bq > 8 and bq * wr * 4 > budget:
        bq //= 2
    return min(bq, _round_up(wr, 8))


# ---------------------------------------------------------------------------
# Branch plans
# ---------------------------------------------------------------------------


class _BranchPlan:
    """Static geometry of one (segment w, ratio r) branch.

    Compact per-branch arrays have ``nseg * wr`` rows ('slc'/'comb'; for
    mix/combine they are viewed 5-D as ``(BH, nseg, A, cr2, last)`` with
    ``A * cr2 == wr``) or ``lp`` rows ('crd': comb_r-dense, where only
    each head's own group-g rows hold real data).
    """

    def __init__(self, w: int, r: int, S: int, R: int):
        self.w = w                      # effective segment length
        self.r = r
        self.R = R
        self.nseg = -(-S // w)
        self.lp = self.nseg * w         # padded length ('crd' mode)
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
            self.mode = "crd"
            self.nch = 1
            self.A, self.cr2 = 1, -1    # no 5-D view (dense comb_r)
        # q sub-block rows (fwd / bwd); 'crd' q loops handle a tail
        if self.mode == "crd":
            self.bq = _pick_bq_tail(self.wr, _FWD_SCORE_BUDGET)
            self.bqb = _pick_bq_tail(self.wr, _BWD_SCORE_BUDGET)
        else:
            self.bq = _pick_bq_divisor(self.wr, _FWD_SCORE_BUDGET)
            self.bqb = _pick_bq_divisor(self.wr, _BWD_SCORE_BUDGET)
        self.out_rows = self.lp if self.mode == "crd" \
            else self.nseg * self.wr
        self.G = 1 if self.mode == "slc" else r

    def __repr__(self):
        return (f"BranchPlan(w={self.w} r={self.r} mode={self.mode} "
                f"nseg={self.nseg} wr={self.wr} bq={self.bq} "
                f"bqb={self.bqb} nch={self.nch})")


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
    widths = [MB] + [p.cr2 for p in plans if p.mode != "crd"]
    cmin = math.gcd(*widths)
    if cmin % 8 or cmin < 8:
        return False                   # common lane tile for stats
    for p in plans:
        if H % p.r or R % p.r:
            return False
        if p.bq <= 0 or p.bqb <= 0 or p.wr % 8 or p.wr > 8192:
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
        else:                          # crd
            if p.w % p.r or (p.wr % p.bq) % 8 or (p.wr % p.bqb) % 8:
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


def uncomb_r(x: jax.Array, r: int, S: int) -> jax.Array:
    """(BH, lp, ...) comb_r order -> natural, sliced back to S."""
    bh, lp = x.shape[:2]
    t = x.shape[2:]
    x = x.reshape((bh, r, lp // r) + t)
    x = jnp.moveaxis(x, 1, 2).reshape((bh, lp) + t)
    return x[:, :S]


# ---------------------------------------------------------------------------
# Static tables, bias, index maps
# ---------------------------------------------------------------------------


def comb_perm(S: int, R: int) -> np.ndarray:
    """perm[comb_row] = token position."""
    p = np.arange(S)
    rows = (p % R) * (S // R) + p // R
    perm = np.empty(S, np.int64)
    perm[rows] = p
    return perm


def _position_table(plan: _BranchPlan, S: int) -> np.ndarray:
    """pos[g, n, row] = token position of a compact row (-1 = padding).

    For 'crd' the (g, n, row) index addresses comb_r-dense rows
    ``g*(lp/r) + n*wr + row``.
    """
    w, r, R = plan.w, plan.r, plan.R
    pos = np.full((plan.G, plan.nseg, plan.wr), -1, np.int64)
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
            else:                      # crd (comb_r order)
                p = n * w + x * r + g
            pos[g, n] = np.where(p < S, p, -1)
    return pos


def _branch_bias(vmask: Optional[jax.Array], B: int,
                 plan: _BranchPlan, pos_table: np.ndarray) -> jax.Array:
    """(B, G, nseg, 1, wr) fp32 additive bias (NEG_INF masks a row)."""
    pos = jnp.asarray(pos_table.reshape(-1), jnp.int32)
    valid = pos >= 0
    if vmask is None:
        bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)
        bias = jnp.broadcast_to(bias, (B,) + bias.shape)
    else:
        got = jnp.take(vmask > 0.5, jnp.clip(pos, 0), axis=1)
        bias = jnp.where(valid[None] & got, 0.0, NEG_INF
                         ).astype(jnp.float32)
    return bias.reshape(B, plan.G, plan.nseg, 1, plan.wr)


def _chunk_map(plan: _BranchPlan, S: int, H: int):
    """Branch-kernel chunk-block index map for q/k/v/dmix/stats.

    Arrays: 'slc' slc-layout (BH, S, *) blocks (1, w, *); 'comb' comb_R
    (BH, S, *) blocks (1, cr2, *); 'crd' comb_r-dense (BH, lp, *)
    blocks (1, wr, *).
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
    """(bh, n)-addressed compact blocks (out/lse for slc/comb)."""
    return lambda bh, n, c: (bh, n, 0)


def _mix_spec(plan: _BranchPlan, S: int, H: int, MB: int, last: int):
    """(block_shape, index_map) for reading a compact slc/comb branch
    array -- reshaped to (BH, nseg, A, cr2, last) -- inside mix/combine
    at dense comb rows [j*(S/R) + t*MB, +MB)."""
    r, cr2, A = plan.r, plan.cr2, plan.A
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


def _mix_stat_spec(plan: _BranchPlan, S: int, H: int, MB: int,
                   cmin: int):
    """Stat (lse) variant of :func:`_mix_spec`: the compact stat array
    is lane-major, viewed as (BH, nseg, A, cr2//cmin, cmin) so blocks
    reshape freely to the common (MB//cmin, cmin) tile."""
    r, cr2, A = plan.r, plan.cr2, plan.A
    hg = H // r

    def a_of(bh, j):
        if plan.mode == "slc":
            return j
        g = (bh % H) // hg
        return jnp.clip((j - g) // r, 0, A - 1)

    if MB % cr2 == 0:
        segs = MB // cr2
        shape = (1, segs, 1, cr2 // cmin, cmin)

        def m(bh, j, t):
            return (bh, t * segs, a_of(bh, j), 0, 0)
    else:  # cr2 % MB == 0
        shape = (1, 1, 1, MB // cmin, cmin)

        def m(bh, j, t):
            u0 = t * MB
            return (bh, u0 // cr2, a_of(bh, j), (u0 % cr2) // MB, 0)
    return shape, m


def _covered_fn(plan: _BranchPlan, H: int):
    """Traced (bh, j) -> bool: does this branch cover comb block j for
    the head of bh? ('slc' covers everything; 'comb' and 'crd' cover
    the head group's own residue class only.)"""
    if plan.mode == "slc":
        return lambda bh, j: True
    r = plan.r
    hg = H // r
    return lambda bh, j: (j % r) == (bh % H) // hg


def _kernel_params():
    # default scoped-vmem budget is 16MB; v5e has 128MB physical and
    # the big-segment branches need ~20-50MB of stack while the mega
    # kernel's backward peaks near ~105MB at the 16k bucket.
    # `mega_eligible`'s VMEM model keeps ineligible shapes off this
    # path, so the cap can sit just under physical.
    import os
    limit = int(os.environ.get("MODALTUNE_VMEM_LIMIT",
                               127 * 1024 * 1024))
    try:
        return pltpu.CompilerParams(vmem_limit_bytes=limit)
    except Exception:  # pragma: no cover - older pallas versions
        return None


# ---------------------------------------------------------------------------
# Branch forward kernel
# ---------------------------------------------------------------------------


def _attend_block(qi, k, v, bias_row, scale, lse_valid=None):
    """One-shot masked softmax attention for one q sub-block.

    VPU-lean formulation: ``qi`` is pre-scaled by the caller so the
    score chain is dot -> +bias -> max -> exp -> sum (no `where` over
    the score tile). Masked keys carry bias NEG_INF, and clamping the
    row max to ``_MASK_THRESHOLD`` makes ``exp(s - m)`` underflow to an
    exact 0 for them (including all-masked rows, where l becomes 0).

    Returns (out fp32 (bq, D), lse fp32 (bq, 1))."""
    s = jax.lax.dot_general(qi, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_mm_precision(k.dtype))
    s = s + bias_row
    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True),
                    _MASK_THRESHOLD)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    lsafe = jnp.where(l > 0, l, 1.0)
    o = jax.lax.dot_general(p.astype(v.dtype), v,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_mm_precision(v.dtype))
    o = o / lsafe
    lse = jnp.where(l > 0, m + jnp.log(lsafe), NEG_INF)
    if lse_valid is not None:
        lse = jnp.where(lse_valid, lse, NEG_INF)
    return o, lse


def _branch_fwd_call(plan: _BranchPlan, q_l, k_l, v_l, bias, S: int,
                     H: int, scale: float, interpret: bool):
    """-> (out, lse): out compact (BH, nseg*wr, D) for 'slc'/'comb' or
    comb_r-dense (BH, lp, D) for 'crd' (uncovered rows garbage); lse is
    lane-major (BH, out_rows/wr, 1, wr) fp32."""
    BH, _, D = q_l.shape
    wr, nch, bq = plan.wr, plan.nch, plan.bq
    cr = plan.w if plan.mode == "slc" else \
        plan.cr2 if plan.mode == "comb" else wr
    need_scr = plan.mode == "comb"
    crd = plan.mode == "crd"
    cmap = _chunk_map(plan, S, H)
    bmap = _bias_map(plan, H)
    omap = cmap if crd else _seg_map(plan)
    nfull, tail = wr // bq, wr % bq

    def kernel(q_ref, k_ref, v_ref, b_ref, o_ref, l_ref, *scr):
        c = pl.program_id(2)
        seg_n = pl.program_id(1)
        bh_id = pl.program_id(0)
        if need_scr:
            qs, ks, vs = scr[:3]
            qs[pl.ds(c * cr, cr), :] = q_ref[0]
            ks[pl.ds(c * cr, cr), :] = k_ref[0]
            vs[pl.ds(c * cr, cr), :] = v_ref[0]

        @pl.when(c == nch - 1)
        def _compute():
            if need_scr:
                k, v = ks[...], vs[...]

                def qrow(i0, rows):
                    return qs[pl.ds(i0, rows), :]
            else:
                k, v = k_ref[0], v_ref[0]

                def qrow(i0, rows):
                    return q_ref[0, pl.ds(i0, rows), :]
            bias_row = b_ref[0, 0, 0]
            if crd:
                g = (bh_id % H) // (H // plan.r)

                def lval(i0, rows):
                    rr = jax.lax.broadcasted_iota(
                        jnp.int32, (rows, 1), 0) + i0
                    return seg_n * plan.w + rr * plan.r + g < S
            else:
                def lval(i0, rows):
                    return None

            lcol = scr[-1]

            def step(i0, rows):
                qi = qrow(i0, rows).astype(jnp.float32) * scale
                qi = qi.astype(k.dtype)
                o, lse = _attend_block(qi, k, v, bias_row,
                                       scale, lval(i0, rows))
                o_ref[0, pl.ds(i0, rows), :] = o.astype(o_ref.dtype)
                lcol[pl.ds(i0, rows), :] = lse

            def body(i, _):
                step(i * bq, bq)
                return 0

            jax.lax.fori_loop(0, nfull, body, 0)
            if tail:
                step(nfull * bq, tail)
            # lse leaves as a lane-major row: a (wr, 1) column block
            # would DMA 4 bytes per sublane row
            l_ref[0, 0] = lcol[...].reshape(1, wr)

    scratch = []
    if need_scr:
        scratch = [pltpu.VMEM((wr, D), q_l.dtype) for _ in range(3)]
    scratch += [pltpu.VMEM((wr, 1), jnp.float32)]

    out, lse = pl.pallas_call(
        kernel,
        grid=(BH, plan.nseg, nch),
        in_specs=[
            pl.BlockSpec((1, cr, D), cmap),
            pl.BlockSpec((1, cr, D), cmap),
            pl.BlockSpec((1, cr, D), cmap),
            pl.BlockSpec((1, 1, 1, 1, wr), bmap),
        ],
        out_specs=[
            pl.BlockSpec((1, wr, D), omap),
            pl.BlockSpec((1, 1, 1, wr),
                         lambda bh, n, c: omap(bh, n, c)[:2] + (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, plan.out_rows, D), q_l.dtype),
            jax.ShapeDtypeStruct((BH, plan.out_rows // wr, 1, wr),
                                 jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=_kernel_params(),
        interpret=interpret,
    )(q_l, k_l, v_l, bias)
    return out, lse


# ---------------------------------------------------------------------------
# Mix kernel
# ---------------------------------------------------------------------------


def _stat_cmin(plans: List[_BranchPlan], MB: int) -> int:
    widths = [MB] + [p.cr2 for p in plans if p.mode != "crd"]
    return math.gcd(*widths)


def _mix_call(plans: List[_BranchPlan], mix_ins, S: int, H: int,
              out_dtype, interpret: bool):
    """mix_ins: per branch (out_arr, lse_arr, kind) where kind is
    'view' (out 5-D compact; lse lane-major 4-D (BH, rows/wr, 1, wr))
    or 'dense' (out (BH, S, D) comb_R order, lse (BH, S) lane-major;
    for 'crd' branches only covered rows are real).

    All stat math runs on a common (MB//cmin, cmin) lane tile so that
    differently-chunked branches stay shape-compatible without any
    sublane<->lane relayout, and every stat DMA moves cmin*4-byte rows
    instead of 4-byte ones.

    -> mixed (BH, S, D) out_dtype, m (BH, S) f32, Z (BH, S) f32.
    """
    R = plans[0].R
    MB = S // R
    BH = mix_ins[0][0].shape[0]
    D = mix_ins[0][0].shape[-1]
    covered = [_covered_fn(p, H) for p in plans]
    cmin = _stat_cmin(plans, MB)
    MBc = MB // cmin

    dmapD = lambda bh, j, t: (bh, j, 0)
    dmapS = lambda bh, j, t: (bh, j, t, 0)
    in_specs, operands = [], []
    for p, (o_arr, l_arr, kind) in zip(plans, mix_ins):
        if kind == "dense":
            in_specs.append(pl.BlockSpec((1, MB, D), dmapD))
            in_specs.append(pl.BlockSpec((1, 1, MBc, cmin), dmapS))
            l_arr = l_arr.reshape(BH, R, MBc, cmin)
        else:
            shp_o, mo = _mix_spec(p, S, H, MB, D)
            shp_l, ml = _mix_stat_spec(p, S, H, MB, cmin)
            in_specs.append(pl.BlockSpec(shp_o, mo))
            in_specs.append(pl.BlockSpec(shp_l, ml))
            l_arr = l_arr.reshape(BH, p.nseg, p.A, p.cr2 // cmin,
                                  cmin)
        operands += [o_arr, l_arr]

    def kernel(*refs):
        bh = pl.program_id(0)
        j = pl.program_id(1)
        outs_refs = refs[-3:]
        ins = refs[:-3]
        m = jnp.full((MBc, cmin), NEG_INF, jnp.float32)
        pairs = []
        for bi, p in enumerate(plans):
            o = ins[2 * bi][...].reshape(MBc, cmin, D).astype(
                jnp.float32)
            l = ins[2 * bi + 1][...].reshape(MBc, cmin)
            cov = covered[bi](bh, j)
            if cov is not True:
                # uncovered blocks may hold unwritten garbage (NaN):
                # hard-select both out and lse
                l = jnp.where(cov, l, NEG_INF)
                o = jnp.where(cov, o, 0.0)
            pairs.append((o, l))
            m = jnp.maximum(m, l)
        Z = jnp.zeros((MBc, cmin), jnp.float32)
        acc = jnp.zeros((MBc, cmin, D), jnp.float32)
        for o, l in pairs:
            wb = jnp.where(l > _MASK_THRESHOLD, jnp.exp(l - m), 0.0)
            Z = Z + wb
            acc = acc + wb[:, :, None] * o
        zsafe = jnp.where(Z > 0, Z, 1.0)
        mixed_ref, m_ref, z_ref = outs_refs
        mixed_ref[0] = (acc / zsafe[:, :, None]).reshape(
            MB, D).astype(mixed_ref.dtype)
        m_ref[0, 0] = m
        z_ref[0, 0] = Z

    mixed, m, Z = pl.pallas_call(
        kernel,
        grid=(BH, R, 1),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, MB, D), dmapD),
            pl.BlockSpec((1, 1, MBc, cmin), dmapS),
            pl.BlockSpec((1, 1, MBc, cmin), dmapS),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, S, D), out_dtype),
            jax.ShapeDtypeStruct((BH, R, MBc, cmin), jnp.float32),
            jax.ShapeDtypeStruct((BH, R, MBc, cmin), jnp.float32),
        ],
        compiler_params=_kernel_params(),
        interpret=interpret,
    )(*operands)
    return mixed, m.reshape(BH, S), Z.reshape(BH, S)


# ---------------------------------------------------------------------------
# Branch backward kernel
# ---------------------------------------------------------------------------


def _branch_bwd_call(plan: _BranchPlan, q_l, k_l, v_l, bias, dmix_l,
                     m_l, z_l, lse_b, S: int, H: int, scale: float,
                     interpret: bool):
    """-> compact (or 'crd' comb_r-dense) dq, dk, dv in q.dtype.

    dmix/m/Z arrive in the branch's own q layout ('slc': slc order;
    'comb': dense comb_R, chunk-assembled like q; 'crd': comb_r-dense).
    lse_b is this branch's forward lse (same layout as its out).
    """
    BH, _, D = q_l.shape
    wr, nch, bq = plan.wr, plan.nch, plan.bqb
    cr = plan.w if plan.mode == "slc" else \
        plan.cr2 if plan.mode == "comb" else wr
    need_scr = plan.mode == "comb"
    crd = plan.mode == "crd"
    cmap = _chunk_map(plan, S, H)
    bmap = _bias_map(plan, H)
    omap = cmap if crd else _seg_map(plan)
    smap2 = lambda bh, n, c: (bh, cmap(bh, n, c)[1], 0, 0)
    lmap4 = lambda bh, n, c: (bh, omap(bh, n, c)[1], 0, 0)
    nfull, tail = wr // bq, wr % bq

    def kernel(q_ref, k_ref, v_ref, b_ref, dm_ref, m_ref, z_ref, l_ref,
               dq_ref, dk_ref, dv_ref, *scr):
        c = pl.program_id(2)
        dk_acc, dv_acc = scr[-2:]
        mcol, zcol, lcol = scr[-5:-2]
        # stats arrive lane-major; one (1, cr)->(cr, 1) cast per chunk
        # assembles them into column scratches (a (cr, 1) column block
        # would DMA 4 bytes per sublane row)
        mcol[pl.ds(c * cr, cr), :] = m_ref[0, 0].reshape(cr, 1)
        zcol[pl.ds(c * cr, cr), :] = z_ref[0, 0].reshape(cr, 1)
        if need_scr:
            qs, ks, vs, dms = scr[:-5]
            qs[pl.ds(c * cr, cr), :] = q_ref[0]
            ks[pl.ds(c * cr, cr), :] = k_ref[0]
            vs[pl.ds(c * cr, cr), :] = v_ref[0]
            dms[pl.ds(c * cr, cr), :] = dm_ref[0]

        @pl.when(c == nch - 1)
        def _compute():
            lcol[...] = l_ref[0, 0].reshape(wr, 1)
            if need_scr:
                k, v = ks[...], vs[...]
                srcs = dict(q=qs, dm=dms)

                def rows_of(name, i0, rows):
                    return srcs[name][pl.ds(i0, rows), :]
            else:
                k, v = k_ref[0], v_ref[0]
                refs2 = dict(q=q_ref, dm=dm_ref)

                def rows_of(name, i0, rows):
                    return refs2[name][0, pl.ds(i0, rows), :]

            bias_row = b_ref[0, 0, 0]
            dk_acc[...] = jnp.zeros_like(dk_acc)
            dv_acc[...] = jnp.zeros_like(dv_acc)

            def step(i0, rows):
                # qi pre-scaled: s = (scale q) k^T + bias, so p =
                # exp(s - lse) needs no `where` over the score tile
                # (masked keys underflow to exact 0; padded/invalid
                # query rows have lse = NEG_INF => wm = 0, and their
                # lse_exp clamp keeps exp() finite). dk uses the
                # pre-scaled qi directly (dk = scale ds^T q); dq takes
                # the scale as a cheap (rows, D) epilogue.
                qi = rows_of("q", i0, rows).astype(jnp.float32) * scale
                qi = qi.astype(k.dtype)
                lse_i = lcol[pl.ds(i0, rows), :]              # (rows,1)
                m_i = mcol[pl.ds(i0, rows), :]
                z_i = zcol[pl.ds(i0, rows), :]
                dmix_i = rows_of("dm", i0, rows).astype(jnp.float32)
                s = jax.lax.dot_general(
                    qi, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_mm_precision(k.dtype))
                s = s + bias_row
                lse_exp = jnp.where(lse_i > _MASK_THRESHOLD, lse_i,
                                    jnp.float32(-_MASK_THRESHOLD))
                p = jnp.exp(s - lse_exp)
                zsafe = jnp.where(z_i > 0, z_i, 1.0)
                wm = jnp.where(lse_i > _MASK_THRESHOLD,
                               jnp.exp(lse_i - m_i) / zsafe, 0.0)
                do = dmix_i * wm                              # (rows,D)
                pb = p.astype(v.dtype)
                dob = do.astype(v.dtype)
                dp = jax.lax.dot_general(
                    dob, v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_mm_precision(v.dtype))
                # delta = rowsum(do . out) = rowsum(p . dp) since the
                # full dp row is in hand -- saves recomputing out = p v
                delta = jnp.sum(p * dp, axis=-1, keepdims=True)
                ds = p * (dp - delta)
                dsb = ds.astype(k.dtype)
                dq_i = jax.lax.dot_general(
                    dsb, k, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_mm_precision(k.dtype)) * scale
                dq_ref[0, pl.ds(i0, rows), :] = dq_i.astype(
                    dq_ref.dtype)
                dk_acc[...] += jax.lax.dot_general(
                    dsb, qi, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_mm_precision(k.dtype))
                dv_acc[...] += jax.lax.dot_general(
                    pb, dob, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_mm_precision(v.dtype))

            def body(i, _):
                step(i * bq, bq)
                return 0

            jax.lax.fori_loop(0, nfull, body, 0)
            if tail:
                step(nfull * bq, tail)
            dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
            dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)

    scratch = []
    if need_scr:
        scratch = [pltpu.VMEM((wr, D), q_l.dtype),
                   pltpu.VMEM((wr, D), q_l.dtype),
                   pltpu.VMEM((wr, D), q_l.dtype),
                   pltpu.VMEM((wr, D), dmix_l.dtype)]
    scratch += [pltpu.VMEM((wr, 1), jnp.float32) for _ in range(3)]
    scratch += [pltpu.VMEM((wr, D), jnp.float32) for _ in range(2)]

    outs = pl.pallas_call(
        kernel,
        grid=(BH, plan.nseg, nch),
        in_specs=[
            pl.BlockSpec((1, cr, D), cmap),
            pl.BlockSpec((1, cr, D), cmap),
            pl.BlockSpec((1, cr, D), cmap),
            pl.BlockSpec((1, 1, 1, 1, wr), bmap),
            pl.BlockSpec((1, cr, D), cmap),
            pl.BlockSpec((1, 1, 1, cr), smap2),
            pl.BlockSpec((1, 1, 1, cr), smap2),
            pl.BlockSpec((1, 1, 1, wr), lmap4),
        ],
        out_specs=[
            pl.BlockSpec((1, wr, D), omap),
            pl.BlockSpec((1, wr, D), omap),
            pl.BlockSpec((1, wr, D), omap),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, plan.out_rows, D), q_l.dtype)
            for _ in range(3)
        ],
        scratch_shapes=scratch,
        compiler_params=_kernel_params(),
        interpret=interpret,
    )(q_l, k_l, v_l, bias, dmix_l,
      m_l.reshape(BH, -1, 1, cr), z_l.reshape(BH, -1, 1, cr), lse_b)
    return outs


# ---------------------------------------------------------------------------
# Combine kernel (sum per-branch gradients to dense comb)
# ---------------------------------------------------------------------------


def _combine_call(plans: List[_BranchPlan], grads, S: int, H: int,
                  out_dtype, interpret: bool):
    """grads: per branch (dq, dk, dv, kind) with kind 'view'|'dense'
    ('crd' branches arrive dense after the comb_r->comb_R transpose,
    with garbage at uncovered rows -- masked here via the covered
    predicate). -> dense comb (dq, dk, dv) each (BH, S, D)."""
    R = plans[0].R
    MB = S // R
    BH = grads[0][0].shape[0]
    D = grads[0][0].shape[-1]
    covered = [_covered_fn(p, H) for p in plans]

    dmapD = lambda bh, j, t: (bh, j, 0)
    in_specs, operands = [], []
    for p, (dq, dk, dv, kind) in zip(plans, grads):
        if kind == "dense":
            for a in (dq, dk, dv):
                in_specs.append(pl.BlockSpec((1, MB, D), dmapD))
                operands.append(a)
        else:
            shp, mo = _mix_spec(p, S, H, MB, D)
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

    return pl.pallas_call(
        kernel,
        grid=(BH, R, 1),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, MB, D), dmapD) for _ in range(3)],
        out_shape=[jax.ShapeDtypeStruct((BH, S, D), out_dtype)
                   for _ in range(3)],
        compiler_params=_kernel_params(),
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
    return ("crd", plan.r, plan.lp)


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

    def to_layout(xn, plan):
        if plan.mode == "slc":
            return slc(xn, plan.w, R)
        if plan.mode == "comb":
            return comb(xn, R)
        return comb_r(xn, plan.r, plan.lp)

    def layouts(xn):
        lay = {}
        for i, p in enumerate(plans):
            key = _layout_key(p, i)
            if key not in lay:
                lay[key] = to_layout(xn, p)
        return lay

    def crd_to_dense(plan, arr):
        """comb_r-dense (BH, lp, ...) -> comb_R-dense (BH, S, ...)."""
        return comb(uncomb_r(arr, plan.r, S), R)

    def view5(plan, arr, last):
        return arr.reshape(BH, plan.nseg, plan.A, plan.cr2, last)

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
            if p.mode == "crd":
                lse_d = crd_to_dense(p, lses[i].reshape(BH, p.lp))
                mix_ins.append((crd_to_dense(p, outs[i]), lse_d,
                                "dense"))
            else:
                mix_ins.append((view5(p, outs[i], D), lses[i],
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
        d_nat = g
        m_nat, Z_nat = uncomb(m, R), uncomb(Z, R)   # (BH, S) lane-major
        ql, kl, vl = layouts(qn), layouts(kn), layouts(vn)
        biases = [_branch_bias(vmask, B, p, pos_tables[i])
                  for i, p in enumerate(plans)]
        grads = []
        for i, p in enumerate(plans):
            key = _layout_key(p, i)
            if p.mode == "slc":
                dml = slc(d_nat, p.w, R)
                ml = slc(m_nat, p.w, R)
                zl = slc(Z_nat, p.w, R)
            elif p.mode == "comb":
                dml, ml, zl = dc, m, Z
            else:
                dml = comb_r(d_nat, p.r, p.lp)
                ml = comb_r(m_nat, p.r, p.lp)
                zl = comb_r(Z_nat, p.r, p.lp)
            dq, dk, dv = _branch_bwd_call(
                p, ql[key], kl[key], vl[key], biases[i], dml, ml, zl,
                lses[i], S, H, scale, interpret)
            if p.mode == "crd":
                grads.append((crd_to_dense(p, dq), crd_to_dense(p, dk),
                              crd_to_dense(p, dv), "dense"))
            else:
                grads.append((view5(p, dq, D), view5(p, dk, D),
                              view5(p, dv, D), "view"))
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
