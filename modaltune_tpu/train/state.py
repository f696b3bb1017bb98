"""Train state: frozen/trainable partition, optimizer, LR schedule.

The reference freezes the backbone by ``requires_grad=False`` and filters
optimizer params (``longvit_adapter.py:78-80``,
``train_modaltune.py:139-149``). TPU-native equivalent: the params pytree
is split at the top-level ``backbone`` key — gradients are only computed
for the trainable subtree (no wasted dW for 100M+ frozen params) and the
frozen subtree can live in bf16.

LR schedule mirrors GradualWarmupScheduler(x20 over 10 epochs) into
CosineAnnealingLR (``train_modaltune.py:64-65,151-154``), stepped
per-epoch like ``scheduler.step()`` at ``train_modaltune.py:242``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..configs import TrainConfig

FROZEN_KEY = "backbone"


def split_params(params: dict) -> Tuple[dict, dict]:
    """params -> (frozen, trainable) by top-level key."""
    frozen = {k: v for k, v in params.items() if k == FROZEN_KEY}
    trainable = {k: v for k, v in params.items() if k != FROZEN_KEY}
    return frozen, trainable


def merge_params(frozen: dict, trainable: dict) -> dict:
    return {**trainable, **frozen}


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def warmup_cosine_epoch_schedule(cfg: TrainConfig,
                                 steps_per_epoch: int) -> Callable:
    """Epoch-quantized schedule: linear warmup from lr/factor to lr over
    ``warmup_epochs`` (GradualWarmup's ``base*(1+(m-1)*e/total)`` with
    base = lr/m), then cosine anneal to 0 over the remaining epochs."""
    base = cfg.lr / cfg.warmup_factor
    warm = cfg.warmup_epochs
    cosine_epochs = max(1, cfg.num_epochs - warm)

    def schedule(step):
        epoch = step // max(1, steps_per_epoch)
        warm_lr = base * (1.0 + (cfg.warmup_factor - 1.0)
                          * jnp.minimum(epoch, warm) / warm)
        ce = jnp.clip(epoch - warm, 0, cosine_epochs)
        cos_lr = cfg.lr * 0.5 * (1.0 + jnp.cos(jnp.pi * ce / cosine_epochs))
        return jnp.where(epoch < warm, warm_lr, cos_lr)

    return schedule


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int
                   ) -> optax.GradientTransformation:
    schedule = warmup_cosine_epoch_schedule(cfg, steps_per_epoch)
    tx = optax.adamw(schedule, b1=cfg.beta1, b2=cfg.beta2,
                     weight_decay=cfg.weight_decay)
    if cfg.grad_accum > 1:
        # the reference parses --gc but never applies it
        # (train_modaltune.py:619); honoring it is the documented
        # intended-behavior choice (SURVEY.md §7)
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
    return tx


class TrainState(struct.PyTreeNode):
    step: jax.Array
    trainable: Any
    frozen: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params: dict, tx: optax.GradientTransformation,
               frozen_dtype=None) -> "TrainState":
        # Copy the incoming pytree: the jitted train step donates the
        # state's buffers, which would otherwise delete the caller's
        # params (e.g. shared init params across k-fold runs).
        params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        frozen, trainable = split_params(params)
        if frozen_dtype is not None:
            frozen = jax.tree.map(
                lambda x: x.astype(frozen_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, frozen)
        return cls(step=jnp.zeros((), jnp.int32), trainable=trainable,
                   frozen=frozen, opt_state=tx.init(trainable), tx=tx)

    def apply_gradients(self, grads) -> "TrainState":
        updates, opt_state = self.tx.update(grads, self.opt_state,
                                            self.trainable)
        trainable = optax.apply_updates(self.trainable, updates)
        return self.replace(step=self.step + 1, trainable=trainable,
                            opt_state=opt_state)

    @property
    def params(self) -> dict:
        return merge_params(self.frozen, self.trainable)
