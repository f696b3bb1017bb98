"""Sequence-parallel fused dilated attention (shard_map island).

The reference's ``gather_kv`` (``torchscale/component/dilated_attention
.py:61-80``) all-gathers K/V across the sequence-parallel process group
whenever a dilated segment exceeds the local token shard, then runs its
flash kernel on the gathered window. The TPU-native composition here:

* the surrounding model runs under GSPMD (``jax.jit`` + sharding
  constraints) with the bag's token axis sharded over a ``seq`` mesh
  axis — XLA partitions every position-wise op itself;
* dilated attention alone drops into a ``shard_map`` **island** (manual
  region inside the jit): each device ``all_gather``s K/V (and Q — one
  extra S*D ride on ICI buys AD-for-free, see below) along ``seq``,
  then runs the device-local **mega kernel** restricted to its own
  query rows (``mega_dilated_attention(q_token_range=...)``) — the
  one-gather-per-layer equivalent of per-branch gather_kv, and strictly
  less traffic than the reference's per-branch gathers since every
  branch with a segment beyond the shard needs the same full K/V.

The static ``q_token_range`` is selected by ``lax.switch`` over
``axis_index``: one compiled kernel variant per shard, every variant
fully static for Mosaic. Gradients need no custom plumbing: the
transpose of a tiled ``all_gather`` is ``psum_scatter``, the q-range
kernel's custom VJP zeroes dq outside the range and emits this shard's
partial dk/dv, and JAX composes the two — exactly the reduce-scatter
a hand-written backward would do.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .dilated_mega import mega_dilated_attention, mega_eligible


def sp_mega_eligible(S: int, n_shards: int, H: int, D: int,
                     segment_lengths: Sequence[int],
                     dilated_ratios: Sequence[int]) -> bool:
    """Static eligibility of the sequence-parallel mega path: the full
    sequence must be mega-eligible and each shard's token range must be
    whole comb slabs (S_loc a multiple of R = max ratio)."""
    if n_shards < 2 or S % n_shards:
        return False
    if not mega_eligible(S, H, D, segment_lengths, dilated_ratios):
        return False
    R = max(int(r) for r in dilated_ratios)
    return (S // n_shards) % R == 0


def sp_mega_dilated_attention(q, k, v, mask, *, axis_name: str,
                              n_shards: int,
                              segment_lengths: Sequence[int],
                              dilated_ratios: Sequence[int],
                              scale: Optional[float] = None,
                              interpret: bool = False) -> jax.Array:
    """Per-device body (call inside ``shard_map``): q/k/v
    ``(B, S_loc, H, D)`` locals, ``mask (B, S_loc)`` bool; returns the
    local ``(B, S_loc, H, D)`` attention rows."""
    B, Sl, H, D = q.shape
    ag = functools.partial(jax.lax.all_gather, axis_name=axis_name,
                           axis=1, tiled=True)
    qf, kf, vf, mf = ag(q), ag(k), ag(v), ag(mask)

    def mk(i):
        def branch(qf, kf, vf, mf):
            o = mega_dilated_attention(
                qf, kf, vf, segment_lengths=segment_lengths,
                dilated_ratios=dilated_ratios, mask=mf, scale=scale,
                interpret=interpret,
                q_token_range=(i * Sl, (i + 1) * Sl))
            return jax.lax.slice_in_dim(o, i * Sl, (i + 1) * Sl, axis=1)
        return branch

    idx = jax.lax.axis_index(axis_name)
    return jax.lax.switch(idx, [mk(i) for i in range(n_shards)],
                          qf, kf, vf, mf)


def sp_island_attention(q, k, v, mask, *,
                        segment_lengths: Sequence[int],
                        dilated_ratios: Sequence[int],
                        batch_axis: str, seq_axis: str,
                        scale: Optional[float] = None
                        ) -> Optional[jax.Array]:
    """Shard_map-island dilated attention for GSPMD callers.

    Call from *inside* ``jax.jit`` traced under ``jax.set_mesh(mesh)``
    (or any context where ``jax.sharding.get_abstract_mesh()`` carries
    the mesh): q/k/v are global ``(B, S, H, D)`` arrays whose batch/
    token axes are sharded over ``batch_axis``/``seq_axis``. Returns
    ``None`` when the ambient mesh or shapes make the island
    inapplicable — the caller falls back to its normal dispatch.
    """
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or not mesh.shape:
        return None
    if seq_axis not in mesh.shape or batch_axis not in mesh.shape:
        return None
    n_seq = mesh.shape[seq_axis]
    n_b = mesh.shape[batch_axis]
    B, S, H, D = q.shape
    if n_seq < 2 or B % n_b:
        return None
    if not sp_mega_eligible(S, n_seq, H, D, segment_lengths,
                            dilated_ratios):
        return None
    interpret = jax.default_backend() != "tpu"
    inner = functools.partial(
        sp_mega_dilated_attention, axis_name=seq_axis, n_shards=n_seq,
        segment_lengths=tuple(int(x) for x in segment_lengths),
        dilated_ratios=tuple(int(x) for x in dilated_ratios),
        scale=scale, interpret=interpret)
    spec4 = P(batch_axis, seq_axis, None, None)
    spec2 = P(batch_axis, seq_axis)
    fn = jax.shard_map(inner, mesh=mesh,
                       in_specs=(spec4, spec4, spec4, spec2),
                       out_specs=spec4, check_vma=False)
    if mask is None:
        mask = jnp.ones((B, S), bool)
    return fn(q, k, v, mask)
