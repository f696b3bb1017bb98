"""KD loss and the frozen text projector.

Rebuild of the PromptKD-style distillation objective in
``train_modaltune.py:44-59,91,211-233``: task-conditioned model
embeddings are L2-normalized and distilled (KL over the embedding
dimension, temperature 1, sum-reduction, x T^2 x 10) against L2-normalized
projections of the per-case CONCH text embeddings for prompt rows
[0 general, 1 diagnosis, 3 survival].

The text projector is *frozen random* — never trained
(``train_modaltune.py:113-116``); it only has to be seedable and
checkpointable so runs are reproducible.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

TEXT_PROMPT_ROWS = (0, 1, 3)  # train_modaltune.py:232


class TextProjector(nn.Module):
    """conv1x1 512->256, LayerNorm(channels), ReLU, conv1x1 256->256
    (``Projection_layer``, train_modaltune.py:44-59). Conv1x1 on a
    (B, C, 1, 1) tensor == Dense over the channel axis; the
    LayerNorm([C,1,1]) normalizes over channels per sample."""

    out_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text):
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="conv1")(text)
        x = nn.LayerNorm(dtype=self.dtype, name="ln")(x)
        x = nn.relu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="conv2")(x)


def l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True),
                           eps)


def kd_kl_per_slide(logits, text_proj, temperature: float = 1.0):
    """Per-slide sum-reduction KL of the PromptKD objective
    (``train_modaltune.py:211-233``), unscaled: (B, T, D) -> (B,).
    Exposed separately so callers that must exclude padded batch rows
    (mesh-sharded eval) can weight rows before reducing."""
    t = temperature
    logits = l2_normalize(logits, axis=-1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32) / t, axis=-1)
    q = jax.nn.softmax(text_proj.astype(jnp.float32) / t, axis=-1)
    return jnp.sum(q * (jnp.log(q) - logp), axis=(-2, -1))


def kd_loss(logits, text_proj, temperature: float = 1.0,
            scale: float = 10.0):
    """PromptKD KL loss.

    logits: (B, T, D) task-conditioned embeddings (pre-normalization);
    text_proj: (B, T, D) projected + L2-normalized text targets (already
    row-selected). Returns the mean over slides of the per-slide
    sum-reduction KL (the reference runs batch-size 1 with reduction
    "sum"; averaging over the slide axis keeps per-step gradient scale
    identical under data-parallel batching).
    """
    per_slide = kd_kl_per_slide(logits, text_proj, temperature)
    return jnp.mean(per_slide) * (temperature ** 2) * scale


def cross_entropy_loss(logits, labels):
    """Mean softmax cross-entropy — the supervised objective for the
    genomics-only classifier baseline (``return_logits`` "classifier"
    mode, ``aggregators.py:43-58``; the reference trains those baselines
    outside the repo, so the loss choice is the standard one)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                                 axis=-1)[:, 0]
    return -jnp.mean(picked)


def survival_nll_loss(hazards, s, y_bins, events, alpha: float = 0.4,
                      eps: float = 1e-7):
    """Discrete-time survival NLL for the cumprod-hazard head.

    Matches the transform the reference's "survival" mode emits
    (``hazards = sigmoid(logits); S = cumprod(1-hazards)``,
    ``aggregators.py:52-57``): the standard censored NLL over
    discretized duration bins (Zadeh & Schmid 2020, as used by
    CLAM/PORPOISE-style pipelines). ``events==1`` means the event was
    observed (uncensored).
    """
    y = y_bins[:, None].astype(jnp.int32)
    c = 1.0 - events.astype(jnp.float32)  # censorship indicator
    s_pad = jnp.concatenate(
        [jnp.ones((s.shape[0], 1), s.dtype), s], axis=1)
    s_prev = jnp.take_along_axis(s_pad, y, axis=1)[:, 0]
    s_cur = jnp.take_along_axis(s_pad, y + 1, axis=1)[:, 0]
    h_cur = jnp.take_along_axis(hazards, y, axis=1)[:, 0]
    uncensored = -(1.0 - c) * (jnp.log(jnp.maximum(s_prev, eps)) +
                               jnp.log(jnp.maximum(h_cur, eps)))
    censored = -c * jnp.log(jnp.maximum(s_cur, eps))
    neg_l = censored + uncensored
    return jnp.mean((1.0 - alpha) * neg_l + alpha * uncensored)


def project_text(projector: TextProjector, proj_params, text):
    """(B, 4, 512) raw CONCH embeddings -> (B, 3, out_dim) normalized
    targets for tasks [general, diagnosis, survival]."""
    out = projector.apply({"params": proj_params}, text)
    out = l2_normalize(out, axis=-1)
    return out[:, jnp.array(TEXT_PROMPT_ROWS), :]
