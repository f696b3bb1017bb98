"""Device-mesh parallelism.

TPU-native replacement for the reference's torch.distributed story
(SURVEY.md §2.6):

* **Data parallel** — the reference wraps the model in DDP over NCCL
  (``utils/base_trainer.py:160-211``) with gradient all-reduce per step.
  Here: ``shard_map`` over the ``data`` mesh axis — each device runs the
  full (Pallas) train step on its batch shard and gradients are
  ``pmean``-ed over ICI. Params/optimizer state are replicated (the
  backbone is frozen; trainable adapter state is tiny), matching DDP's
  replication semantics.
* **Sequence parallel** — the reference's LongNet ``gather_kv``
  all-gathers KV across the process group when a dilated segment exceeds
  the local shard (``dilated_attention.py:61-80``, off by default). Here:
  the bag's token axis is sharded over a ``seq`` mesh axis under GSPMD
  (``jax.jit`` + ``NamedSharding``); XLA partitions the attention
  einsums and inserts the all-gathers/collective-permutes over ICI
  itself — the compiler-driven equivalent of hand-written gather_kv.
* Host metric aggregation (``gather_object`` at
  ``base_trainer.py:379-421``) becomes ``jax.experimental.multihost_utils``
  / plain device_get of replicated values.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..configs import TrainConfig
from ..train.losses import kd_loss
from ..train.state import TrainState, merge_params
from ..train.train_step import multitask_logits

DATA_AXIS = "data"
SEQ_AXIS = "seq"


def make_mesh(n_data: Optional[int] = None, n_seq: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_seq
    devices = np.asarray(devices[:n_data * n_seq]).reshape(n_data, n_seq)
    return Mesh(devices, (DATA_AXIS, SEQ_AXIS))


def batch_pspec(with_seq: bool = False) -> dict:
    """PartitionSpecs for a train batch dict."""
    bag = P(DATA_AXIS, SEQ_AXIS) if with_seq else P(DATA_AXIS)
    return dict(bag=bag, coords=bag, mask=bag, genes=P(DATA_AXIS),
                clinical=P(DATA_AXIS))


def shard_batch(batch: dict, mesh: Mesh, with_seq: bool = False) -> dict:
    specs = batch_pspec(with_seq)
    out = {}
    for k, v in batch.items():
        if v is None:
            out[k] = None
            continue
        spec = specs.get(k, P(DATA_AXIS))
        ndim = jnp.ndim(v)
        axes = list(spec) + [None] * (ndim - len(spec))
        # device_put needs even shards; axes that don't divide (e.g. a
        # 255-token bag on a 2-way seq axis — the model's cls concat
        # makes it 256 *inside* the jit) stay unsharded here and GSPMD
        # redistributes at the first in-jit constraint
        for i, ax in enumerate(axes):
            if ax is not None and v.shape[i] % mesh.shape[ax]:
                axes[i] = None
        out[k] = jax.device_put(jnp.asarray(v),
                                NamedSharding(mesh, P(*axes)))
    return out


def make_dp_train_step(model, cfg: TrainConfig, mesh: Mesh):
    """Data-parallel train step via shard_map: per-device forward/backward
    (Pallas kernels stay device-local) + pmean(grads) over ICI — the DDP
    equivalent. Returns ``step(state, batch, text_targets, rng)``;
    batch arrays must have a leading axis divisible by the data-axis
    size, text_targets shaped (B, T, D)."""

    def local_step(state: TrainState, batch: dict, text_targets, rng):
        # decorrelate dropout across data shards
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))

        def loss_fn(trainable):
            params = merge_params(state.frozen, trainable)
            logits = multitask_logits(model, params, batch, cfg.num_tasks,
                                      deterministic=False, rng=rng)
            return kd_loss(logits, text_targets,
                           temperature=cfg.temperature,
                           scale=cfg.kd_loss_scale)

        loss, grads = jax.value_and_grad(loss_fn)(state.trainable)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        new_state = state.apply_gradients(grads)
        return new_state, loss

    bspec = batch_pspec()

    def step(state, batch, text_targets, rng):
        batch_in = {k: v for k, v in batch.items()
                    if v is not None and k in bspec}
        in_batch_spec = {k: bspec[k] for k in batch_in}
        fn = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), in_batch_spec, P(DATA_AXIS), P()),
            out_specs=(P(), P()),
            check_vma=False)
        return fn(state, batch_in, text_targets, rng)

    return jax.jit(step)


def make_spmd_train_step(model, cfg: TrainConfig, mesh: Mesh,
                         with_seq: bool = True):
    """GSPMD train step: jit with sharding constraints; the bag's token
    axis is sharded over ``seq`` so XLA partitions dilated attention and
    inserts the gather_kv-equivalent collectives itself.

    Attention modes: with the XLA attention path any model works — XLA
    partitions the einsums. With the fused Pallas path, build the model
    with ``LongNetConfig.seq_axes=(DATA_AXIS, SEQ_AXIS)``: the step
    traces under ``jax.set_mesh`` so dilated attention drops into its
    shard_map island (all-gather K/V over ``seq`` + device-local mega
    kernel on local query rows, ops/dilated_sp.py) while everything
    else stays GSPMD."""

    def step(state: TrainState, batch: dict, text_targets, rng):
        def loss_fn(trainable):
            params = merge_params(state.frozen, trainable)
            logits = multitask_logits(model, params, batch, cfg.num_tasks,
                                      deterministic=False, rng=rng)
            return kd_loss(logits, text_targets,
                           temperature=cfg.temperature,
                           scale=cfg.kd_loss_scale)

        loss, grads = jax.value_and_grad(loss_fn)(state.trainable)
        new_state = state.apply_gradients(grads)
        return new_state, loss

    rep = NamedSharding(mesh, P())
    jitted = jax.jit(step, donate_argnums=())

    def wrapped(state, batch, text_targets, rng):
        batch = shard_batch(batch, mesh, with_seq=with_seq)
        state = jax.device_put(state, rep)
        text_targets = jax.device_put(
            text_targets, NamedSharding(mesh, P(DATA_AXIS)))
        # ambient mesh for the shard_map attention island (traced on
        # first call; a no-op for models without seq_axes)
        with jax.set_mesh(mesh):
            return jitted(state, batch, text_targets, rng)

    wrapped.jitted = jitted  # expose for trace-count assertions
    return wrapped
