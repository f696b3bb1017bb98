"""Pathway-grouped gene encoder: S-MLP blocks + MLP-Mixer (Flax Linen).

Rebuild of ``models/genomic_utils/gene_encoder.py:97-223``
(``gene_mixer_group``). The reference loops over 331 ragged per-pathway
``nn.Sequential`` MLPs in Python (``gene_encode``,
``gene_encoder.py:194-213``) — 331 tiny matmuls per step. TPU-first
re-design: the data layer gathers genes into a dense
``(n_groups, max_group_len)`` zero-padded block (see
``data/pathways.py``), and the per-group SNN layers become **stacked
batched einsums** — two MXU calls instead of 662 scalar-sized matmuls.
Zero-padded gene slots contribute nothing to the first linear layer, so
semantics match the ragged original exactly.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.activations import gelu_exact
from ..configs import GeneEncoderConfig
from .heads import classifier_logits, survival_from_logits
from .layers import AlphaDropout
from .registry import register_aggregator


def _trunc02():
    # the adapter applies trunc_normal(std=0.02) to every Linear in the
    # gene encoder (longvit_adapter.py:178,184-188)
    return nn.initializers.normal(stddev=0.02)


class TokenFeedForward(nn.Module):
    """Mixer token-mixing FF: dense over the *group* axis of (B, G, C)
    (the reference's ``Conv1d(kernel_size=1)`` trick,
    ``gene_encoder.py:132,139-157``)."""

    groups: int
    expansion: float
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        inner = int(self.groups * self.expansion)
        w1 = self.param("w1", _trunc02(), (self.groups, inner))
        b1 = self.param("b1", nn.initializers.zeros, (inner,))
        w2 = self.param("w2", _trunc02(), (inner, self.groups))
        b2 = self.param("b2", nn.initializers.zeros, (self.groups,))
        h = jnp.einsum("bgc,gi->bic", x.astype(self.dtype),
                       w1.astype(self.dtype)) + b1[None, :, None]
        h = gelu_exact(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = jnp.einsum("bic,ig->bgc", h,
                       w2.astype(self.dtype)) + b2[None, :, None]
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class ChannelFeedForward(nn.Module):
    """Mixer channel-mixing FF over the latent axis."""

    dim: int
    expansion: float
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        inner = int(self.dim * self.expansion)
        h = nn.Dense(inner, dtype=self.dtype, kernel_init=_trunc02(),
                     name="fc1")(x)
        h = gelu_exact(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.dim, dtype=self.dtype, kernel_init=_trunc02(),
                     name="fc2")(h)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class GeneMixerEncoder(nn.Module):
    """S-MLP per-pathway blocks -> MLP-Mixer -> pathway compression.

    Input: ``genes (B, n_groups, max_group_len)`` zero-padded expression
    blocks. Output (feature mode): ``(B, final_groups, output_dim)``
    gene tokens.
    """

    cfg: GeneEncoderConfig
    n_groups: int
    max_group_len: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, genes, deterministic: bool = True):
        c = self.cfg
        g, m, latent = self.n_groups, self.max_group_len, c.latent_dim
        assert genes.shape[-2:] == (g, m), genes.shape

        # --- stacked SNN blocks (Linear + ELU + AlphaDropout) x2
        #     (gene_encoder.py:119-129,167-181)
        w1 = self.param("snn1_kernel", _trunc02(), (g, m, latent))
        b1 = self.param("snn1_bias", nn.initializers.zeros, (g, latent))
        w2 = self.param("snn2_kernel", _trunc02(), (g, latent, latent))
        b2 = self.param("snn2_bias", nn.initializers.zeros, (g, latent))
        x = jnp.einsum("bgm,gml->bgl", genes.astype(self.dtype),
                       w1.astype(self.dtype)) + b1
        x = jax.nn.elu(x)
        x = AlphaDropout(c.dropout, name="snn1_drop")(x, deterministic)
        x = jnp.einsum("bgl,glk->bgk", x, w2.astype(self.dtype)) + b2
        x = jax.nn.elu(x)
        x = AlphaDropout(c.dropout, name="snn2_drop")(x, deterministic)

        n_tokens = g
        if c.cls_token:
            cls = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, latent))
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(x.dtype),
                                  (x.shape[0], 1, latent)), x], axis=1)
            n_tokens += 1

        # --- MLP-Mixer (gene_encoder.py:139-157)
        for i in range(c.depth):
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"mix{i}_token_norm")(x)
            x = x + TokenFeedForward(n_tokens, c.expansion_groups, c.dropout,
                                     dtype=self.dtype,
                                     name=f"mix{i}_token")(h, deterministic)
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"mix{i}_chan_norm")(x)
            x = x + ChannelFeedForward(latent, c.expansion_dim, c.dropout,
                                       dtype=self.dtype,
                                       name=f"mix{i}_chan")(h, deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="mixer_norm")(x)
        x = nn.Dense(c.output_dim, dtype=self.dtype, kernel_init=_trunc02(),
                     name="mixer_out")(x)

        # --- pathway compression: n_tokens -> final_groups over the group
        #     axis (gene_encoder.py:164-165,212)
        wc = self.param("compress_kernel", _trunc02(),
                        (n_tokens, c.final_groups))
        bc = self.param("compress_bias", nn.initializers.zeros,
                        (c.final_groups,))
        x = jnp.einsum("bgc,gf->bfc", x, wc.astype(self.dtype)) \
            + bc[None, :, None]
        return x


@register_aggregator("gene_mixer_group")
class GeneOnlyModel(nn.Module):
    """Genomics-only baseline: Gene-Mixer encoder + output heads.

    Rebuild of the reference's standalone gene model
    (``gene_encoder.py:97-223`` registered as ``gene_mixer_group``) with
    its three ``return_logits`` output modes
    (``aggregators.py:43-58``): ``feature`` returns the gene tokens,
    ``classifier`` returns class logits over the mean-pooled tokens
    (``gene_encoder.py:217-221``), and ``survival`` returns
    ``(hazards, S, y_hat)`` via the cumprod-hazard transform. This is
    the "Gene Mixer" baseline row in BASELINE.md.
    """

    cfg: GeneEncoderConfig
    n_gene_groups: int
    max_group_len: int
    n_classes: int = 2
    mode: str = "classifier"  # feature | classifier | survival
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, genes, deterministic: bool = True):
        x = GeneMixerEncoder(self.cfg, self.n_gene_groups,
                             self.max_group_len, dtype=self.dtype,
                             name="gene_encoder")(genes, deterministic)
        if self.mode == "feature":
            return x
        # mean over gene tokens, fp32 norm + head
        # (gene_encoder.py:218-219)
        h = jnp.mean(x.astype(jnp.float32), axis=1)
        h = nn.LayerNorm(epsilon=1e-5, name="final_norm")(h)
        w = self.param("classifier_kernel", _trunc02(),
                       (h.shape[-1], self.n_classes))
        b = self.param("classifier_bias", nn.initializers.zeros,
                       (self.n_classes,))
        logits = classifier_logits(h, w, b)
        if self.mode == "classifier":
            return logits
        if self.mode == "survival":
            return survival_from_logits(logits)
        raise NotImplementedError(f"mode={self.mode}")
