"""Output heads shared by aggregator models.

Functional port of ``Aggregator.return_logits``
(``models/aggregators/aggregators.py:43-58``) and the survival-hazard
transform ``S = cumprod(1 - sigmoid(logits))`` used by classifier /
survival modes. ModalTune's main path runs in "feature" mode (embeddings
read out by host-side logistic regression / CoxPH — see eval/readout.py),
but the classifier/survival heads are part of the reference's public
surface for the genomics-only baselines.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def classifier_logits(h: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    return h @ w + b


def survival_from_logits(logits: jax.Array
                         ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """-> (hazards, survival curve S, predicted bin)."""
    hazards = jax.nn.sigmoid(logits)
    s = jnp.cumprod(1.0 - hazards, axis=-1)
    y_hat = jnp.argmax(logits, axis=-1)
    return hazards, s, y_hat
