"""Mega-kernel dilated attention: every branch + the LSE mix in ONE
Pallas kernel per (batch*head), reading comb-layout q/k/v once.

Round-3 successor of the per-branch decomposition in
ops/dilated_fused.py. The round-2 design parked a shared kernel because
the w=5792 branch's stride-2 rows were believed incommensurate with the
power-of-two comb layout; that was wrong: **every shipped segment
length is a multiple of R = max(ratios)** (5792 = 16*362), and in
comb_R order (position ``p`` stored at row ``(p % R)*(S/R) + p // R``)
branch segment ``n`` occupies rows ``t in [n*w/R, (n+1)*w/R)`` of
*every* slab ``j`` — segment boundaries align across slabs. A
(head-group ``g``, segment ``n``) sparse set of ANY branch is therefore
slabs ``{j ≡ g (mod r)}`` x one contiguous ``t``-range: pure
sublane-addressable views of a single comb-resident copy.

Per grid step (one ``bh = batch*head``):

1. the full comb (S, D) q/k/v blocks stream into VMEM;
2. a python-unrolled loop over branches/segments assembles each sparse
   segment's K/V (and its key-bias row) from slab slices into VMEM
   scratch, runs one-shot-softmax attention per q sub-block
   (``_attend_block`` from ops/dilated_fused), and **online-mixes** the
   result into a running (acc, m, Z) accumulator with the same
   running-max/rescale algebra flash attention uses along keys —
   branches simply become another reduction axis
   (``scattering``'s softmax(lse) mix, reference
   ``dilated_attention.py:113-144``, computed associatively);
3. the epilogue writes the mixed output once, plus a packed
   ``(n_branches + 2, S)`` stats plane (per-branch lse, m, Z) for the
   backward.

Segment boundaries that are not 8-row aligned (w/R = 362 on the
flagship schedule) are handled with aligned *windows* plus static
validity masks: out-of-segment keys get NEG_INF bias, out-of-segment
query rows get lse = NEG_INF, and the online-mix update is a no-op for
lse = NEG_INF rows, so overlapping windows are idempotent.

The backward mirrors the loop: one kernel accumulates dq/dk/dv into
VMEM (S, D) fp32 accumulators (recomputing probabilities from the saved
per-branch lse and demixing with stop-gradient weights
``exp(lse_b - m)/Z``, like the reference's ``torch.no_grad`` mix) and
writes each gradient exactly once.

Compared to the per-branch decomposition this deletes all slc/comb_r
relayouts and pads (~125 ms/step of XLA copies at the 10k flagship
step, see docs/perf_analysis_r3.md), the per-branch compact HBM
arrays, and the separate mix/combine kernels.
"""

from __future__ import annotations

import functools
import math
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from .flash_attention import NEG_INF, _MASK_THRESHOLD, _mm_precision
from .dilated_fused import (_attend_block, _kernel_params, comb, uncomb,
                            to_head_major, from_head_major)

try:  # TPU backend optional (CPU tests run interpret mode)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pl = None
    pltpu = None

# fp32 score-tile byte budgets / max q-tile rows; env-overridable for
# on-chip sweeps (values below are the measured v5e optima). Round-4
# note on MAX_BQ: an isolated-kernel sweep suggested 512 -> 1024 cut
# the fwd+bwd 89.4 -> 52.9 ms, but the one-process END-TO-END A/B
# (tools/sweep_step.py, bench geometry) measured bq=1024 *slower*
# (560.2 vs 554.4 ms/step); the isolated numbers were taken in a
# tunnel session later shown to report block_until_ready before
# execution completes (see bench.calibrate), so they are not trusted.
# 512 stays the default on the end-to-end evidence.
_FWD_SCORE_BUDGET = int(os.environ.get("MODALTUNE_MEGA_FWD_BUDGET",
                                       6 * 1024 * 1024))
_BWD_SCORE_BUDGET = int(os.environ.get("MODALTUNE_MEGA_BWD_BUDGET",
                                       4 * 1024 * 1024))
_MAX_BQ = int(os.environ.get("MODALTUNE_MEGA_MAX_BQ", 512))
_MAX_BRANCHES = 8          # stats lanes in the (S, 8) lse scratch
# hbm_io lane padding for the resident-plane DMAs: 1 pads q/dmix (and
# the dq/dk/dv outputs) to 128 lanes in XLA before/after the kernel;
# 0 DMAs the D-lane arrays directly, skipping the XLA pad/slice passes
# (~35 ms/step `pad` pool at the flagship bucket). MEASURED REJECTION
# as a default: unpadded full-plane DMA compiles and matches the
# oracle for fp32 operands, but Mosaic rejects it at the bf16
# production dtype ("Slice shape along dimension 2 must be aligned to
# tiling (128), but is 48" — 16-bit types tile (16, 128) with sublane
# packing, so sub-128 minors can't DMA). Kept for fp32 debugging runs.
_HBM_PAD = int(os.environ.get("MODALTUNE_MEGA_HBM_PAD", 1))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_bq(wr: int, budget: int) -> int:
    bq = _MAX_BQ
    while bq > 8 and bq * wr * 4 > budget:
        bq //= 2
    return bq if bq * wr * 4 <= budget else -1


class _Seg:
    """One (segment n) static window of a branch: aligned row range
    [kt0, kt1) per slab with the real segment at [t0, t1)."""

    def __init__(self, t0: int, t1: int, MB: int):
        self.t0, self.t1 = t0, t1
        self.kt0 = (t0 // 8) * 8
        self.kt1 = min(_round_up(t1, 8), MB)
        self.krows = self.kt1 - self.kt0
        self.exact = (self.kt0 == t0 and self.kt1 == t1)


class _MegaPlan:
    """Static geometry of one branch inside the mega kernel."""

    def __init__(self, w: int, r: int, S: int, R: int):
        self.w, self.r, self.R = w, r, R
        MB = S // R
        self.cw = w // R               # segment rows per slab
        self.nk = R // r               # slabs per head group
        self.nseg = -(-S // w)
        self.segs = [_Seg(n * self.cw, min((n + 1) * self.cw, MB), MB)
                     for n in range(self.nseg)]
        self.max_wr = max(self.nk * s.krows for s in self.segs)


def make_mega_plans(S: int, segment_lengths: Sequence[int],
                    dilated_ratios: Sequence[int]
                    ) -> Tuple[int, List[_MegaPlan]]:
    R = max(int(r) for r in dilated_ratios)
    plans = [_MegaPlan(min(int(w), S), int(r), S, R)
             for w, r in zip(segment_lengths, dilated_ratios)]
    return R, plans


# VMEM capacity assumed by the eligibility model (v5e/v5p TensorCore:
# 128 MiB), minus headroom for Mosaic's own staging
_VMEM_BUDGET = int(os.environ.get("MODALTUNE_MEGA_VMEM_BUDGET",
                                  118 * 1024 * 1024))


def _lanes(n: int) -> int:
    """Physical lane count of an n-lane VMEM array (pads to 128)."""
    return _round_up(max(n, 1), 128)


def _vmem_estimate(S: int, D: int, nbr: int, max_wr: int,
                   itemsize: int = 2) -> int:
    """Worst-case (monolithic backward) VMEM bytes for one grid step:
    scratch + double-buffered in/out windows. The backward dominates:
    3 (S, D) fp32 accumulators + the (S, 16) stats scratch + 7
    window-assembly scratches + 6 inputs and 3 outputs. Mirrors
    _mega_bwd_call's scratch_shapes — keep in sync."""
    scr = (3 * S * _lanes(D) * 4                     # dq/dk/dv acc
           + S * _lanes(_MAX_BRANCHES + 8) * 4       # stats lanes
           + 5 * max_wr * _lanes(D + 1) * itemsize   # ks/vs/qs/dms/dos
           + 2 * max_wr * _lanes(D) * 4)             # dks/dvs
    # in/out windows ARE lane-padded to 128 and double-buffered: the
    # compiler's OOM report at S=25600 (164.48M scoped) matches this
    # model within ~2% only with (S, 128) window layouts; the packed
    # (S, 48) hypothesis under-counts by ~60MB
    win = (2 * (4 * S * _lanes(D) * itemsize         # q/k/v/dmix in
                + _round_up(1, 8) * S * 4            # bias in
                + _round_up(nbr + 2, 8) * S * 4)     # stats in
           + 2 * 3 * S * _lanes(D) * itemsize)       # dq/dk/dv out
    return scr + win


def _vmem_estimate_fwd(S: int, D: int, nbr: int, max_wr: int,
                       itemsize: int = 2) -> int:
    """Forward-kernel VMEM bytes (mirrors _mega_fwd_call's scratches +
    windows). Much leaner than the backward: one fp32 accumulator and
    3 assembly scratches."""
    scr = (S * _lanes(D) * 4                         # acc
           + S * _lanes(_MAX_BRANCHES + 3) * 4       # lsc
           + 3 * max_wr * _lanes(D + 1) * itemsize)  # ks/vs/qs
    win = (2 * (3 * S * _lanes(D) * itemsize         # q/k/v in
                + _round_up(1, 8) * S * 4)           # bias in
           + 2 * (S * _lanes(D) * itemsize           # out
                  + _round_up(nbr + 2, 8) * S * 4))  # stats out
    return scr + win


def _vmem_estimate_bwd_hbm(S: int, D: int, nbr: int, max_wr: int,
                           itemsize: int = 2) -> int:
    """Backward VMEM with HBM ``pl.ANY`` q/dmix ins and dq/dk/dv outs
    (``hbm_io``): k/v/bias/stats keep their (small enough) BlockSpec
    windows, while q/dmix are DMA'd once per grid step into whole-
    (S, 128) VMEM resident planes — it is the monolithic flavor's
    double-buffered windowed copies of q/dmix + the three outputs that
    blow past the chip at S=25600, not the single planes. Outputs are
    written back through the dead input planes (see _mega_bwd_call).
    Mosaic requires lane-aligned DMA, so q/dmix arrive (and dq/dk/dv
    leave) 128-lane padded; the pad/slice is an XLA copy outside the
    kernel."""
    scr = (3 * S * _lanes(D) * 4                     # dq/dk/dv acc
           + S * _lanes(_MAX_BRANCHES + 8) * 4       # stats lanes
           + 5 * max_wr * _lanes(D + 1) * itemsize   # ks/vs/qs/dms/dos
           + 2 * max_wr * _lanes(D) * 4              # dks/dvs
           + 2 * S * _lanes(D) * itemsize)           # resident q/dmix
    win = 2 * (2 * S * _lanes(D) * itemsize          # k/v in
               + _round_up(1, 8) * S * 4             # bias in
               + _round_up(nbr + 2, 8) * S * 4)      # stats in
    return scr + win


def mega_mode(S: int, H: int, D: int,
              segment_lengths: Sequence[int],
              dilated_ratios: Sequence[int],
              itemsize: int = 2) -> Optional[str]:
    """Static-shape kernel-flavor choice:

    - ``"mono"``: both kernels fit VMEM with BlockSpec-windowed I/O
      (double-buffered (S, D) windows) — the fastest path.
    - ``"hbm_bwd"``: the forward fits but the monolithic backward does
      not (e.g. the reference's 25,599-patch flagship bucket); the
      backward runs with HBM-resident q/k/v/dmix/dq/dk/dv and
      per-window DMA instead.
    - ``None``: ineligible — callers fall back to the decomposed
      per-branch path in ops/dilated_fused.

    ``itemsize``: bytes per q/k/v element (2 for the bf16 production
    path; pass 4 for fp32 operands — the VMEM windows double, so big
    buckets that fit in bf16 may not in fp32)."""
    if pl is None or len(segment_lengths) != len(dilated_ratios):
        return None
    if len(segment_lengths) > _MAX_BRANCHES:
        return None
    R = max(int(r) for r in dilated_ratios)
    if R < 2 or S % R or (S // R) % 8:
        return None
    if not any(int(r) == 1 for r in dilated_ratios):
        return None                # mix semantics assume full coverage
    max_wr = 0
    for w, r in zip(segment_lengths, dilated_ratios):
        w, r = min(int(w), S), int(r)
        if w % R or H % r or R % r or w // R < 1:
            return None
        plan = _MegaPlan(w, r, S, R)
        max_wr = max(max_wr, plan.max_wr)
        if plan.max_wr > 8192:
            return None
        if _pick_bq(plan.max_wr, _FWD_SCORE_BUDGET) < 8:
            return None
        if _pick_bq(plan.max_wr, _BWD_SCORE_BUDGET) < 8:
            return None
    nbr = len(segment_lengths)
    if _vmem_estimate(S, D, nbr, max_wr, itemsize) <= _VMEM_BUDGET:
        return "mono"
    if (_vmem_estimate_fwd(S, D, nbr, max_wr, itemsize) <= _VMEM_BUDGET
            and _vmem_estimate_bwd_hbm(S, D, nbr, max_wr, itemsize)
            <= _VMEM_BUDGET):
        return "hbm_bwd"
    return None


def mega_eligible(S: int, H: int, D: int,
                  segment_lengths: Sequence[int],
                  dilated_ratios: Sequence[int],
                  itemsize: int = 2) -> bool:
    """True when any mega-kernel flavor covers the shape (see
    :func:`mega_mode`)."""
    return mega_mode(S, H, D, segment_lengths, dilated_ratios,
                     itemsize) is not None


def _fori_ok(p: "_MegaPlan") -> bool:
    """Segments can run under one fori_loop body when every window is
    exact and equal-sized (keeps the Mosaic program compact for the
    many-segment r=1 branch)."""
    return (p.nseg > 2 and all(s.exact for s in p.segs)
            and len({s.krows for s in p.segs}) == 1)


def _seg_work(p: "_MegaPlan", tq0: int, tq1: int):
    """Static per-branch work list restricted to q rows [tq0, tq1) (per
    slab, comb units). Keys always span the full segment; only the q
    loop is clipped — the sequence-parallel decomposition (a device owns
    a contiguous token range == one contiguous comb-row range per slab).

    Returns ``(fori_range, unrolled)``: ``fori_range`` is an optional
    ``(n0, n1)`` of whole segments that run under one fori body exactly
    like the unrestricted kernel; ``unrolled`` is a list of
    ``(kt0, krows, kseg, qm)`` windows — ``kseg`` the real key bounds
    (None if the window is exact), ``qm`` the merged q-validity bounds
    (None if every window row is a valid local q row)."""
    out = []
    fori = None
    if _fori_ok(p):
        cw = p.cw
        n_lo, n_hi = tq0 // cw, -(-tq1 // cw)      # covering segments
        n0 = n_lo + (1 if tq0 % cw else 0)         # interior whole segs
        n1 = n_hi - (1 if tq1 % cw else 0)
        if n1 > n0:
            fori = (n0, n1)
        covering = [n for n in range(n_lo, n_hi)
                    if not (n0 <= n < n1)]
        segs = [(p.segs[n], n) for n in covering]
    else:
        segs = [(s, n) for n, s in enumerate(p.segs)
                if min(s.t1, tq1) > max(s.t0, tq0)]
    for s, _n in segs:
        qv0, qv1 = max(s.t0, tq0), min(s.t1, tq1)
        if qv1 <= qv0:
            continue
        kseg = None if s.exact else (s.t0, s.t1)
        qm = None if (qv0 == s.kt0 and qv1 == s.kt1) else (qv0, qv1)
        out.append((s.kt0, s.krows, kseg, qm))
    return fori, out


_RS_CHUNK = 128


def _col_to_row(dst_ref, row_idx: int, col_ref, lane_idx: int, S: int):
    """dst_ref[0, row_idx, :] = col_ref[:, lane_idx], as bounded-size
    (C, 1) -> (1, C) reshapes. A single full-length column<->row
    relayout compiles O(S^2) in Mosaic (measured 17 s per (4096, 1)
    reshape); chunking makes it linear."""
    for t in range(0, S, _RS_CHUNK):
        c = min(_RS_CHUNK, S - t)
        dst_ref[0, row_idx:row_idx + 1, t:t + c] = \
            col_ref[pl.ds(t, c), lane_idx:lane_idx + 1].reshape(1, c)


def _row_to_col(dst_ref, lane_idx: int, src_ref, row_idx: int, S: int):
    """dst_ref[:, lane_idx] = src_ref[0, row_idx, :], chunked."""
    for t in range(0, S, _RS_CHUNK):
        c = min(_RS_CHUNK, S - t)
        dst_ref[pl.ds(t, c), lane_idx:lane_idx + 1] = \
            src_ref[0, row_idx:row_idx + 1, t:t + c].reshape(c, 1)


def _iota_key_bias(kt0: int, krows: int, wr: int, t0: int, t1: int):
    """(1, wr) fp32 additive bias masking window rows outside the real
    segment [t0, t1). Computed from iota in-kernel — Pallas rejects
    captured constant arrays."""
    x = jax.lax.broadcasted_iota(jnp.int32, (1, wr), 1)
    t = kt0 + x % krows
    return jnp.where((t >= t0) & (t < t1), 0.0,
                     jnp.float32(NEG_INF))


def _iota_q_valid(base: int, rows: int, t0: int, t1: int):
    """(rows, 1) bool validity of window q rows [base, base+rows)."""
    t = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) + base
    return (t >= t0) & (t < t1)


def _iota_q_valid_mod(kt0, krows: int, q0: int, rows: int,
                      t0: int, t1: int):
    """(rows, 1) bool validity for BATCHED window rows [q0, q0+rows):
    row i sits at intra-slab position kt0 + (q0 + i) % krows."""
    i = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    t = kt0 + (q0 + i) % krows
    return (t >= t0) & (t < t1)


def _attend_block_fused(qi1, kk1, vv1, lse_valid=None):
    """MXU-epilogue variant of ``_attend_block``: both the key-bias add
    and the softmax row-sum ride the matmuls instead of costing VPU
    passes over the (rows, wr) score tile.

    ``qi1`` (rows, D+1): pre-scaled q with lane D == scale;
    ``kk1`` (wr, D+1): k with lane D == key bias / scale (already
    window-masked), so the score matmul emits ``q.k*scale + bias``;
    ``vv1`` (wr, D+1): v with lane D == 1, so the out matmul's spare
    lane accumulates ``sum(p)``. The D->D+1 widening is free on the
    MXU (both dims pad far past 49) and in VMEM (lane granularity 128).

    Returns (out fp32 (rows, D), lse fp32 (rows, 1))."""
    D = qi1.shape[1] - 1
    s = jax.lax.dot_general(qi1, kk1, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_mm_precision(kk1.dtype))
    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True),
                    _MASK_THRESHOLD)
    # exp emits the matmul dtype directly: the fp32 probability tile is
    # never materialized in VMEM (one elementwise pass, half the bytes)
    p = jnp.exp(s - m).astype(vv1.dtype)
    o1 = jax.lax.dot_general(p, vv1,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=_mm_precision(vv1.dtype))
    l = o1[:, D:D + 1]
    lsafe = jnp.where(l > 0, l, 1.0)
    o = o1[:, :D] / lsafe
    lse = jnp.where(l > 0, m + jnp.log(lsafe), NEG_INF)
    if lse_valid is not None:
        lse = jnp.where(lse_valid, lse, NEG_INF)
    return o, lse


def _key_bias_lane(bcol_ref, lane: int, src, kt0: int, krows: int,
                   kseg, inv_scale: float, dtype):
    """(krows, 1) folded key-bias lane values for one assembled window
    chunk: the mask-bias column (pre-divided by scale so the q lane's
    ``scale`` multiplier cancels), NEG_INF/scale outside the real
    segment bounds (replaces ``_iota_key_bias`` + the brow add).
    ``src`` rows are contiguous [kt0, kt0+krows) per slab, so plain
    (not modular) iota bounds apply."""
    base = bcol_ref[src, lane:lane + 1]
    if kseg is not None:
        t0, t1 = kseg
        t = jax.lax.broadcasted_iota(jnp.int32, (krows, 1), 0) + kt0
        base = jnp.where((t >= t0) & (t < t1), base,
                         jnp.float32(NEG_INF * inv_scale))
    return base.astype(dtype)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _mega_fwd_call(plans: List[_MegaPlan], q_c, k_c, v_c, bias_c,
                   S: int, H: int, scale: float, interpret: bool,
                   qrange: Optional[Tuple[int, int]] = None):
    """q_c/k_c/v_c: (BH, S, D) comb order; bias_c: (B, 1, S) fp32 comb
    order (0 valid / NEG_INF masked key). -> (out (BH, S, D) q.dtype,
    stats (BH, nbr+2, S) fp32: rows 0..nbr-1 per-branch lse (NEG_INF at
    uncovered rows), row nbr = m, nbr+1 = Z).

    ``qrange``: optional static (tq0, tq1) per-slab comb-row bounds —
    only q rows in the range are computed (sequence-parallel shards own
    a contiguous token range == one contiguous comb-row range per slab);
    keys still span full segments. Out/stats rows outside the range are
    zero/NEG_INF-initialized garbage the caller must slice away."""
    BH, _, D = q_c.shape
    R = plans[0].R
    MB = S // R
    nbr = len(plans)
    max_wr = max(p.max_wr for p in plans)
    tq0, tq1 = (0, MB) if qrange is None else qrange

    inv_scale = 1.0 / scale

    # all (S, 1) running stats ride spare lanes of the single (S, 16)
    # stats scratch: a separate (S, 1) fp32 buffer pads its lane dim to
    # 128 anyway (12.5 MB each at S=25600 — the difference between the
    # 25k bucket fitting VMEM or not)
    LM = _MAX_BRANCHES          # running max lane
    LZ = _MAX_BRANCHES + 1      # running Z lane
    LB = _MAX_BRANCHES + 2      # key-bias/scale lane

    def kernel(q_ref, k_ref, v_ref, b_ref, o_ref, st_ref,
               acc, lsc, ks, vs, qs):
        bh = pl.program_id(0)
        h = bh % H
        acc[...] = jnp.zeros_like(acc)
        lsc[...] = jnp.full_like(lsc, NEG_INF)
        lsc[:, LZ:LZ + 1] = jnp.zeros((S, 1), jnp.float32)
        _row_to_col(lsc, LB, b_ref, 0, S)
        # pre-divide by scale: the score matmul's q ones-lane carries
        # `scale`, so lane-folded bias contributes scale*(bias/scale)
        lsc[:, LB:LB + 1] = lsc[:, LB:LB + 1] * inv_scale
        # spare MXU-epilogue lanes (see _attend_block_fused): v ones,
        # q ones — set once; window assembly only writes lanes 0:D
        vs[:, D:D + 1] = jnp.ones((max_wr, 1), vs.dtype)
        qs[:, D:D + 1] = jnp.ones((max_wr, 1), qs.dtype)

        for bi, p in enumerate(plans):
            hg = H // p.r
            g = (h % H) // hg if p.r > 1 else 0
            bq = _pick_bq(p.max_wr, _FWD_SCORE_BUDGET)

            def seg_body(kt0, krows, kseg, qm, *, p=p, g=g, bq=bq,
                         bi=bi):
                wr = p.nk * krows
                # full-coverage windows batch q across slabs: one
                # (bq, wr) score tile spanning all nk slabs instead of
                # nk per-slab tiles of only krows rows — keeps the MXU
                # M-dimension full (the w=1024 r=1 branch would
                # otherwise run M=64 matmuls at <20% utilization).
                # Inexact windows (the crd branch) batch too: boundary
                # rows outside the real segment are masked by the
                # modular iota below and mix/accumulate exact zeros.
                # Seq-parallel clips (qrange) keep the per-slab path.
                batched = p.nk > 1 and (qrange is None or
                                        (qm is None and kseg is None))

                def mix(sl, o, lse):
                    # online cross-branch mix (scattering,
                    # dilated_attention.py:113-144, associative)
                    m_old = lsc[sl, LM:LM + 1]
                    z_old = lsc[sl, LZ:LZ + 1]
                    a_old = acc[sl, :]
                    m_new = jnp.maximum(m_old, lse)
                    m_safe = jnp.maximum(m_new,
                                         jnp.float32(_MASK_THRESHOLD))
                    corr = jnp.exp(m_old - m_safe)
                    wb = jnp.exp(lse - m_safe)
                    acc[sl, :] = a_old * corr + wb * o
                    lsc[sl, LZ:LZ + 1] = z_old * corr + wb
                    lsc[sl, LM:LM + 1] = m_new
                    # keep the window-overlap winner: invalid rows
                    # carry NEG_INF, so max preserves the real lse
                    prev = lsc[sl, bi:bi + 1]
                    lsc[sl, bi:bi + 1] = jnp.maximum(prev, lse)

                # assemble K/V and the key-bias row for this (g, seg);
                # the slab index is traced so the body is emitted once
                # (program size governs the server-side Mosaic compile)
                def asm(c, _):
                    j = g + c * p.r
                    src = pl.ds(j * MB + kt0, krows)
                    dst = pl.ds(c * krows, krows)
                    ks[dst, 0:D] = k_ref[0, src, :]
                    vs[dst, 0:D] = v_ref[0, src, :]
                    if batched:
                        qs[dst, 0:D] = q_ref[0, src, :]
                    ks[dst, D:D + 1] = _key_bias_lane(
                        lsc, LB, src, kt0, krows, kseg, inv_scale,
                        ks.dtype)
                    return 0

                jax.lax.fori_loop(0, p.nk, asm, 0)
                kk = ks[pl.ds(0, wr), :]
                vv = vs[pl.ds(0, wr), :]
                if qm is None:
                    q_lo, q_hi = 0, krows
                else:
                    q_lo = max(0, (qm[0] // 8) * 8 - kt0)
                    q_hi = min(krows, _round_up(qm[1], 8) - kt0)

                if batched:
                    for q0 in range(0, wr, bq):
                        rows = min(bq, wr - q0)
                        qi = (qs[pl.ds(q0, rows), :]
                              .astype(jnp.float32) *
                              scale).astype(ks.dtype)
                        lval = None
                        if qm is not None:
                            lval = _iota_q_valid_mod(kt0, krows, q0,
                                                     rows, *qm)
                        o, lse = _attend_block_fused(qi, kk, vv, lval)
                        # scatter-mix tile rows back per covered slab
                        for c in range(q0 // krows,
                                       -(-(q0 + rows) // krows)):
                            lo = max(q0, c * krows)
                            hi = min(q0 + rows, (c + 1) * krows)
                            j = g + c * p.r
                            sl = pl.ds(j * MB + kt0 + (lo - c * krows),
                                       hi - lo)
                            mix(sl, o[lo - q0:hi - q0],
                                lse[lo - q0:hi - q0])
                    return

                def compute(c, _):
                    j = g + c * p.r
                    for q0 in range(q_lo, q_hi, bq):
                        rows = min(bq, q_hi - q0)
                        sl = pl.ds(j * MB + kt0 + q0, rows)
                        # stage through qs to pick up the ones lane
                        qs[pl.ds(0, rows), 0:D] = q_ref[0, sl, :]
                        qi = (qs[pl.ds(0, rows), :]
                              .astype(jnp.float32) *
                              scale).astype(ks.dtype)
                        # window-overlap rows belong to the adjacent
                        # segment (or another seq shard): force their
                        # lse to NEG_INF so the mix update is a no-op
                        lval = None
                        if qm is not None:
                            lval = _iota_q_valid(kt0 + q0, rows, *qm)
                        o, lse = _attend_block_fused(qi, kk, vv, lval)
                        mix(sl, o, lse)
                    return 0

                jax.lax.fori_loop(0, p.nk, compute, 0)

            fori, unrolled = _seg_work(p, tq0, tq1)
            if fori is not None:
                cw = p.cw

                def loop(n, _, body=seg_body, cw=cw):
                    body(n * cw, cw, None, None)
                    return 0

                jax.lax.fori_loop(fori[0], fori[1], loop, 0)
            for kt0, krows, kseg, qm in unrolled:
                seg_body(kt0, krows, kseg, qm)

        z = lsc[:, LZ:LZ + 1]
        zsafe = jnp.where(z > 0, z, 1.0)
        o_ref[0] = (acc[...] / zsafe).astype(o_ref.dtype)
        for bi in range(nbr):
            _col_to_row(st_ref, bi, lsc, bi, S)
        _col_to_row(st_ref, nbr, lsc, LM, S)
        _col_to_row(st_ref, nbr + 1, lsc, LZ, S)

    out, stats = pl.pallas_call(
        kernel,
        grid=(BH,),
        in_specs=[
            pl.BlockSpec((1, S, D), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, S, D), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, S, D), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda bh: (bh // H, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, S, D), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, nbr + 2, S), lambda bh: (bh, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, S, D), q_c.dtype),
            jax.ShapeDtypeStruct((BH, nbr + 2, S), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, D), jnp.float32),       # acc
            # lanes 0..nbr-1: per-branch lse; LM/LZ/LB: running
            # max / running Z / key-bias-over-scale columns
            pltpu.VMEM((S, _MAX_BRANCHES + 3), jnp.float32),
            # K/V/Q carry one MXU-epilogue lane each (bias / ones /
            # ones — see _attend_block_fused); physically free, VMEM
            # lanes pad to 128 regardless
            pltpu.VMEM((max_wr, D + 1), q_c.dtype),  # assembled K+bias
            pltpu.VMEM((max_wr, D + 1), q_c.dtype),  # assembled V+ones
            pltpu.VMEM((max_wr, D + 1), q_c.dtype),  # assembled Q+ones
        ],
        compiler_params=_kernel_params(),
        interpret=interpret,
    )(q_c, k_c, v_c, bias_c)
    return out, stats


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _mega_bwd_call(plans: List[_MegaPlan], q_c, k_c, v_c, bias_c,
                   dmix_c, stats, S: int, H: int, scale: float,
                   interpret: bool,
                   qrange: Optional[Tuple[int, int]] = None,
                   hbm_io: bool = False):
    """-> (dq, dk, dv) each (BH, S, D) in q.dtype, comb order.

    With ``qrange`` only local q rows contribute: dq rows outside the
    range are zero, and dk/dv hold only this shard's partial sums (the
    caller reduce-scatters them over the seq axis).

    ``hbm_io``: q/k/v/dmix arrive as ``pl.ANY`` (HBM) and are DMA'd
    ONCE per grid step into whole-(S, D) VMEM resident planes — a
    single (S, D) bf16 plane is only ~6.5 MB at S=25600; it was the
    monolithic flavor's *double-buffered windowed* copies of four
    inputs + three outputs that blew past VMEM, not the planes
    themselves. Window assembly then reads the resident planes exactly
    like the mono flavor reads its BlockSpec windows (pure VMEM
    slices), and dq/dk/dv are written back with three overlapped
    full-plane DMAs staged through the by-then-dead input planes.
    Replaces the round-4 design (per-(segment, slab) on-demand DMA +
    ``_OUT_CHUNK``-row output staging), whose ~450 serialized
    row-sliced transfers per layer were latency-bound — measured 1.326x
    the 10k bucket's per-token time against a ~1.15x analytic FLOP
    ratio (VERDICT r4 weak #2); the resident redesign cuts the
    per-grid-step HBM traffic to 7 full-plane DMAs that run at
    bandwidth. Grid-step VMEM ~97 MB at S=25600 (vs ~164 MB mono)."""
    BH, _, D = q_c.shape
    R = plans[0].R
    MB = S // R
    nbr = len(plans)
    max_wr = max(p.max_wr for p in plans)
    tq0, tq1 = (0, MB) if qrange is None else qrange
    inv_scale = 1.0 / scale

    def kernel(q_ref, k_ref, v_ref, b_ref, dm_ref, st_ref,
               dq_ref, dk_ref, dv_ref,
               dqa, dka, dva, lsc, ks, vs, dks, dvs,
               qs, dms, dos, *hbm_scratch):
        bh = pl.program_id(0)
        h = bh % H
        if hbm_io:
            # whole-plane resident staging: q/dmix land in VMEM once
            # per grid step; every window read below is then a VMEM
            # slice, same as the mono flavor (k/v keep their windowed
            # BlockSpecs — no pad cost, automatic pipelining)
            qa, dma, sems = hbm_scratch
            cps = [pltpu.make_async_copy(q_ref.at[bh], qa, sems.at[0]),
                   pltpu.make_async_copy(dm_ref.at[bh], dma,
                                         sems.at[1])]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
        dqa[...] = jnp.zeros_like(dqa)
        dka[...] = jnp.zeros_like(dka)
        dva[...] = jnp.zeros_like(dva)
        # V's spare MXU-epilogue lane carries ones: the dp matmul's
        # dO side carries -delta in the matching lane, so the matmul
        # emits dp - delta directly (see tile_grads)
        vs[:, D:D + 1] = jnp.ones((max_wr, 1), vs.dtype)
        # m and Z ride lsc lanes nbr / nbr+1 (same rows as in the
        # stats plane): separate (S, 1) buffers pad to 128 lanes and
        # cost 12.5 MB each at the 25k bucket
        for bi in range(nbr + 2):
            _row_to_col(lsc, bi, st_ref, bi, S)
        # bias column rides the spare lse lane, pre-divided by scale
        # for the MXU bias-lane fold (see _attend_block_fused)
        _row_to_col(lsc, nbr + 2, b_ref, 0, S)
        lsc[:, nbr + 2:nbr + 3] = lsc[:, nbr + 2:nbr + 3] * inv_scale
        qs[:, D:D + 1] = jnp.ones((max_wr, 1), qs.dtype)

        for bi, p in enumerate(plans):
            hg = H // p.r
            g = (h % H) // hg if p.r > 1 else 0
            bq = _pick_bq(p.max_wr, _BWD_SCORE_BUDGET)

            def seg_body(kt0, krows, kseg, qm, *, p=p, g=g, bq=bq,
                         bi=bi):
                wr = p.nk * krows
                # full-coverage windows batch q across slabs (see the
                # forward): full-M score tiles and — bigger here —
                # bq-deep contractions in the dk/dv matmuls instead of
                # krows-deep per-slab ones. Inexact windows batch with
                # the modular q mask (invalid rows contribute exact
                # zeros); seq-parallel clips keep the per-slab path.
                batched = p.nk > 1 and (qrange is None or
                                        (qm is None and kseg is None))

                def asm(c, _):
                    j = g + c * p.r
                    src = pl.ds(j * MB + kt0, krows)
                    dst = pl.ds(c * krows, krows)
                    ks[dst, 0:D] = k_ref[0, src, :]
                    vs[dst, 0:D] = v_ref[0, src, :]
                    if batched:
                        if hbm_io:
                            qs[dst, 0:D] = qa[src, 0:D]
                            dms[dst, :] = dma[src, 0:D]
                        else:
                            qs[dst, 0:D] = q_ref[0, src, :]
                            dms[dst, :] = dm_ref[0, src, :]
                    ks[dst, D:D + 1] = _key_bias_lane(
                        lsc, nbr + 2, src, kt0, krows, kseg, inv_scale,
                        ks.dtype)
                    if batched:
                        # window-order per-row stats ride spare lanes
                        lsc[dst, nbr + 5:nbr + 6] = lsc[src, bi:bi + 1]
                        lsc[dst, nbr + 6:nbr + 7] = \
                            lsc[src, nbr:nbr + 1]
                        lsc[dst, nbr + 7:nbr + 8] = \
                            lsc[src, nbr + 1:nbr + 2]
                    return 0

                jax.lax.fori_loop(0, p.nk, asm, 0)
                kk1 = ks[pl.ds(0, wr), :]
                kk = ks[pl.ds(0, wr), 0:D]
                vv1 = vs[pl.ds(0, wr), :]
                vv = vs[pl.ds(0, wr), 0:D]
                dks[pl.ds(0, wr), :] = jnp.zeros((wr, D), jnp.float32)
                dvs[pl.ds(0, wr), :] = jnp.zeros((wr, D), jnp.float32)
                if qm is None:
                    q_lo, q_hi = 0, krows
                else:
                    q_lo = max(0, (qm[0] // 8) * 8 - kt0)
                    q_hi = min(krows, _round_up(qm[1], 8) - kt0)

                def tile_grads(qi1, lse_i, m_i, z_i, dmix_i, valid):
                    """One (rows, wr) gradient tile: accumulates dk/dv
                    into the window scratch, returns dq (rows, D).
                    ``qi1`` carries the ones lane: the score matmul
                    emits s+bias directly (MXU bias fold), and invalid
                    rows need no explicit zeroing — their lse_exp of
                    -_MASK_THRESHOLD (+5e8) makes exp underflow to an
                    exact 0.

                    delta rides the MXU twice instead of costing two
                    VPU passes over the (rows, wr) tile: the branch
                    output is recomputed as o = P @ V (so
                    delta = rowsum(dO*o) touches only D lanes), and
                    -delta is folded into dO's spare epilogue lane
                    against V's ones lane, so the dp matmul emits
                    dp - delta directly."""
                    rows = qi1.shape[0]
                    qi = qi1[:, 0:D]
                    s = jax.lax.dot_general(
                        qi1, kk1, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_mm_precision(kk1.dtype))
                    lse_exp = jnp.where(
                        valid, lse_i, jnp.float32(-_MASK_THRESHOLD))
                    # exp emits the operand dtype directly — the fp32
                    # probability tile never hits VMEM. In fp32 mode
                    # pb IS pmat (exact); in bf16 mode the dq/dk chain
                    # below rounds P once, same as the dv matmul always
                    # did.
                    pb = jnp.exp(s - lse_exp).astype(vs.dtype)
                    zsafe = jnp.where(z_i > 0, z_i, 1.0)
                    wm = jnp.where(valid,
                                   jnp.exp(lse_i - m_i) / zsafe, 0.0)
                    do = dmix_i * wm
                    o_t = jax.lax.dot_general(
                        pb, vv, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_mm_precision(vv.dtype))
                    delta = jnp.sum(do * o_t, axis=-1, keepdims=True)
                    dos[pl.ds(0, rows), 0:D] = do.astype(dos.dtype)
                    dos[pl.ds(0, rows), D:D + 1] = \
                        (-delta).astype(dos.dtype)
                    dob1 = dos[pl.ds(0, rows), :]
                    dp_ = jax.lax.dot_general(
                        dob1, vv1, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_mm_precision(vv1.dtype))
                    dsb = (pb.astype(jnp.float32) * dp_
                           ).astype(ks.dtype)
                    dq_i = jax.lax.dot_general(
                        dsb, kk, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_mm_precision(kk.dtype)) * scale
                    dks[pl.ds(0, wr), :] += jax.lax.dot_general(
                        dsb, qi, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_mm_precision(kk.dtype))
                    dvs[pl.ds(0, wr), :] += jax.lax.dot_general(
                        pb, dos[pl.ds(0, rows), 0:D],
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_mm_precision(vv.dtype))
                    return dq_i

                if batched:
                    for q0 in range(0, wr, bq):
                        rows = min(bq, wr - q0)
                        w = pl.ds(q0, rows)
                        # hbm_io scratches are 128-lane: slice back to
                        # the D+1 / D compute widths
                        qi = (qs[w, 0:D + 1].astype(jnp.float32) *
                              scale).astype(ks.dtype)
                        lse_i = lsc[w, nbr + 5:nbr + 6]
                        m_i = lsc[w, nbr + 6:nbr + 7]
                        z_i = lsc[w, nbr + 7:nbr + 8]
                        dmix_i = dms[w, 0:D].astype(jnp.float32)
                        valid = lse_i > _MASK_THRESHOLD
                        if qm is not None:
                            valid = valid & _iota_q_valid_mod(
                                kt0, krows, q0, rows, *qm)
                        dq_i = tile_grads(qi, lse_i, m_i, z_i,
                                          dmix_i, valid)
                        for c in range(q0 // krows,
                                       -(-(q0 + rows) // krows)):
                            lo = max(q0, c * krows)
                            hi = min(q0 + rows, (c + 1) * krows)
                            j = g + c * p.r
                            sl = pl.ds(j * MB + kt0 + (lo - c * krows),
                                       hi - lo)
                            dqa[sl, :] += dq_i[lo - q0:hi - q0]
                else:
                    def compute(c, _):
                        j = g + c * p.r
                        for q0 in range(q_lo, q_hi, bq):
                            rows = min(bq, q_hi - q0)
                            sl = pl.ds(j * MB + kt0 + q0, rows)
                            # stage through qs to pick up the ones lane
                            if hbm_io:
                                qs[pl.ds(0, rows), 0:D] = qa[sl, 0:D]
                                dmix_i = dma[sl, 0:D].astype(
                                    jnp.float32)
                            else:
                                qs[pl.ds(0, rows), 0:D] = q_ref[0, sl, :]
                                dmix_i = dm_ref[0, sl, :].astype(
                                    jnp.float32)
                            qi = (qs[pl.ds(0, rows), 0:D + 1]
                                  .astype(jnp.float32) *
                                  scale).astype(ks.dtype)
                            lse_i = lsc[sl, bi:bi + 1]
                            m_i = lsc[sl, nbr:nbr + 1]
                            z_i = lsc[sl, nbr + 1:nbr + 2]
                            valid = lse_i > _MASK_THRESHOLD
                            if qm is not None:
                                valid = valid & _iota_q_valid(
                                    kt0 + q0, rows, *qm)
                            dqa[sl, :] += tile_grads(
                                qi, lse_i, m_i, z_i, dmix_i, valid)
                        return 0

                    jax.lax.fori_loop(0, p.nk, compute, 0)

                def scatter(c, _):
                    j = g + c * p.r
                    dst = pl.ds(j * MB + kt0, krows)
                    dka[dst, :] += dks[pl.ds(c * krows, krows), :]
                    dva[dst, :] += dvs[pl.ds(c * krows, krows), :]
                    return 0

                jax.lax.fori_loop(0, p.nk, scatter, 0)

            fori, unrolled = _seg_work(p, tq0, tq1)
            if fori is not None:
                cw = p.cw

                def loop(n, _, body=seg_body, cw=cw):
                    body(n * cw, cw, None, None)
                    return 0

                jax.lax.fori_loop(fori[0], fori[1], loop, 0)
            for kt0, krows, kseg, qm in unrolled:
                seg_body(kt0, krows, kseg, qm)

        if hbm_io:
            # overlapped full-plane write-back: the input planes are
            # dead once compute finishes, so dq/dk stage through
            # qa/dma while each other's DMA is in flight; dv reuses qa
            # after dq's copy completes. (Outputs are 128-lane padded;
            # caller slices back to D.)
            qa[:, 0:D] = dqa[...].astype(qa.dtype)
            cp_q = pltpu.make_async_copy(qa, dq_ref.at[bh], sems.at[0])
            cp_q.start()
            dma[:, 0:D] = dka[...].astype(dma.dtype)
            cp_k = pltpu.make_async_copy(dma, dk_ref.at[bh], sems.at[1])
            cp_k.start()
            cp_q.wait()
            qa[:, 0:D] = dva[...].astype(qa.dtype)
            cp_v = pltpu.make_async_copy(qa, dv_ref.at[bh], sems.at[2])
            cp_v.start()
            cp_k.wait()
            cp_v.wait()
        else:
            dq_ref[0] = dqa[...].astype(dq_ref.dtype)
            dk_ref[0] = dka[...].astype(dk_ref.dtype)
            dv_ref[0] = dva[...].astype(dv_ref.dtype)

    win = pl.BlockSpec((1, S, D), lambda bh: (bh, 0, 0))
    LP = _lanes(D)
    big = pl.BlockSpec(memory_space=pl.ANY) if hbm_io else win
    scratch = [
        pltpu.VMEM((S, D), jnp.float32),       # dq acc
        pltpu.VMEM((S, D), jnp.float32),       # dk acc
        pltpu.VMEM((S, D), jnp.float32),       # dv acc
        # lanes 0..nbr-1 lse; nbr/nbr+1 m/Z; nbr+2 bias col
        # (pre-divided by scale); nbr+5..nbr+7 window-order
        # lse/m/Z (batched path)
        pltpu.VMEM((S, _MAX_BRANCHES + 8), jnp.float32),
        pltpu.VMEM((max_wr, D + 1), q_c.dtype),  # assembled K+bias
        pltpu.VMEM((max_wr, D + 1), q_c.dtype),  # assembled V+ones
        pltpu.VMEM((max_wr, D), jnp.float32),  # dk segment acc
        pltpu.VMEM((max_wr, D), jnp.float32),  # dv segment acc
        pltpu.VMEM((max_wr, D + 1), q_c.dtype),  # assembled Q+ones
        pltpu.VMEM((max_wr, D), q_c.dtype),      # assembled dmix
        # dO + (-delta) epilogue lane for the dp-delta MXU fold;
        # D=48 lanes pad to 128 anyway so the widening is free
        pltpu.VMEM((max_wr, D + 1), q_c.dtype),
    ]
    LPio = LP if _HBM_PAD else D
    if hbm_io:
        scratch += [pltpu.VMEM((S, LPio), q_c.dtype),  # resident q
                    pltpu.VMEM((S, LPio), q_c.dtype),  # resident dmix
                    pltpu.SemaphoreType.DMA((4,))]
    out_D = LPio if hbm_io else D
    if hbm_io and _HBM_PAD:
        # conservative layout: 128-lane-pad q/dmix for the resident
        # DMAs (and dq/dk/dv come back padded); the pad/slice is XLA's
        pad = ((0, 0), (0, 0), (0, LP - D))
        q_in = jnp.pad(q_c, pad)
        dm_in = jnp.pad(dmix_c, pad)
    else:
        q_in, dm_in = q_c, dmix_c
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(BH,),
        in_specs=[
            big,
            win, win,
            pl.BlockSpec((1, 1, S), lambda bh: (bh // H, 0, 0)),
            big,
            pl.BlockSpec((1, nbr + 2, S), lambda bh: (bh, 0, 0)),
        ],
        out_specs=[big for _ in range(3)],
        out_shape=[jax.ShapeDtypeStruct((BH, S, out_D), q_c.dtype)
                   for _ in range(3)],
        scratch_shapes=scratch,
        compiler_params=_kernel_params(),
        interpret=interpret,
    )(q_in, k_c, v_c, bias_c, dm_in, stats)
    if hbm_io:
        dq, dk, dv = dq[..., :D], dk[..., :D], dv[..., :D]
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Top-level op (custom VJP per static configuration)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _build_mega(B: int, S: int, H: int, D: int,
                segments: Tuple[int, ...], ratios: Tuple[int, ...],
                scale: float, interpret: bool,
                qrange: Optional[Tuple[int, int]] = None,
                pre_combed: bool = False, itemsize: int = 2):
    R, plans = make_mega_plans(S, segments, ratios)
    hbm_bwd = mega_mode(S, H, D, segments, ratios,
                        itemsize=itemsize) == "hbm_bwd"

    def fwd_impl(qn, kn, vn, vmask):
        if pre_combed:
            # caller keeps the whole token stream in comb_R order
            # (span-resident layout, models/longnet.py): operands,
            # mask, and output all stay permuted — zero relayouts here
            qc, kc, vc = qn, kn, vn
        else:
            qc, kc, vc = comb(qn, R), comb(kn, R), comb(vn, R)
            vmask = comb(vmask, R)
        bias = jnp.where(vmask > 0.5, 0.0, NEG_INF
                         ).astype(jnp.float32)[:, None, :]
        out, stats = _mega_fwd_call(plans, qc, kc, vc, bias, S, H,
                                    scale, interpret, qrange=qrange)
        out = checkpoint_name(out, "dilated_out")
        stats = checkpoint_name(stats, "dilated_stats")
        # save the comb-layout operands: the backward reuses them
        # directly instead of re-permuting (3 comb relayouts/layer)
        res = (qc, kc, vc, bias, vmask, stats)
        return (out if pre_combed else uncomb(out, R)), res

    def bwd_impl(res, g):
        qc, kc, vc, bias, vmask, stats = res
        dmix = g if pre_combed else comb(g, R)
        dq, dk, dv = _mega_bwd_call(plans, qc, kc, vc, bias, dmix,
                                    stats, S, H, scale, interpret,
                                    qrange=qrange, hbm_io=hbm_bwd)
        if not pre_combed:
            dq, dk, dv = uncomb(dq, R), uncomb(dk, R), uncomb(dv, R)
        return dq, dk, dv, jnp.zeros_like(vmask)

    @jax.custom_vjp
    def f(qn, kn, vn, vmask):
        return fwd_impl(qn, kn, vn, vmask)[0]

    f.defvjp(fwd_impl, bwd_impl)
    return f


def mega_dilated_attention(q, k, v, *, segment_lengths: Sequence[int],
                           dilated_ratios: Sequence[int],
                           mask: Optional[jax.Array] = None,
                           scale: Optional[float] = None,
                           interpret: bool = False,
                           q_token_range: Optional[Tuple[int, int]]
                           = None,
                           pre_combed: bool = False) -> jax.Array:
    """Multi-branch LongNet dilated attention, single-kernel (TPU).

    Same semantics as :func:`ops.dilated.dilated_attention` (the oracle
    in tests): q/k/v ``(B, L, H, D)``, optional ``(B, L)`` bool validity
    mask, output ``(B, L, H, D)`` in q's dtype. Check
    :func:`mega_eligible` first.

    ``q_token_range``: static (p0, p1) token bounds (multiples of
    ``max(dilated_ratios)``) — compute attention only for those query
    rows against the full keys (the sequence-parallel shard's local
    work); rows outside the range come back zero.

    ``pre_combed``: the token axis of q/k/v/mask is ALREADY in global
    comb_R order (the kernel's native layout) and the output is
    returned in that order — the span-resident encoder layout
    (models/longnet.py) uses this to hoist the per-layer comb/uncomb
    relayouts out of the layer loop entirely.
    """
    B, S, H, D = q.shape
    if scale is None:
        scale = D ** -0.5
    qrange = None
    if q_token_range is not None:
        R = max(int(r) for r in dilated_ratios)
        p0, p1 = q_token_range
        if p0 % R or p1 % R:
            raise ValueError(
                f"q_token_range {q_token_range} must be multiples of "
                f"R={R}")
        qrange = (p0 // R, p1 // R)
    fn = _build_mega(B, S, H, D,
                     tuple(int(x) for x in segment_lengths),
                     tuple(int(x) for x in dilated_ratios),
                     float(scale), bool(interpret), qrange,
                     bool(pre_combed),
                     itemsize=jnp.dtype(q.dtype).itemsize)
    vmask = jnp.ones((B, S), jnp.float32) if mask is None else \
        mask.astype(jnp.float32)
    # the (B, S) mask must follow the same comb permutation as tokens,
    # so expand it to head-major rows first
    vm_bh = vmask
    out = fn(to_head_major(q), to_head_major(k), to_head_major(v),
             vm_bh)
    return from_head_major(out, B, H)
