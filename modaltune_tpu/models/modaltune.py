"""ModalTune: frozen LongNetViT backbone + trainable Modal Adapter.

Rebuild of ``models/aggregators/longvit_adapter.py`` (both
``longnetvit_gene_adapter`` and the ``..._clinical_adapter`` variant, which
here is just ``AdapterConfig.clinfeat_dim > 0``). Forward semantics follow
``longvit_adapter.py:205-347`` / ``:514-672``:

  patch-embed + sincos pos + cls -> encoder.prepare ->
  gene mixer tokens [+ gene cls] [+ task token] [+ clinical token] ->
  (pre-interaction frozen span) ->
  3 x { prompt self-attention -> inject -> frozen span -> extract } ->
  fuse (cls | masked-avg image, task, gene-avg, clinical) -> LN -> project.

The modality/task fusion is ``token_agg`` 'sum' or 'cat' and
``prompt_agg`` 'avg' or 'cls', exactly as the reference configs use.

TPU-first notes: everything is batch-first with a bag validity mask
threaded into every attention; multi-task runs as a batched forward (the
trainer tiles the bag across task tokens) instead of the reference's three
sequential forwards (``train_modaltune.py:156-179``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..configs import ModalTuneConfig
from .adapter import InteractionBlock
from .gene import GeneMixerEncoder
from .layers import SelfAttentionLayer
from .registry import register_aggregator
from .slide_encoder import LongNetViT


@register_aggregator("longnetvit_gene_adapter")
@register_aggregator("longnetvit_gene_clinical_adapter")
class ModalTuneModel(nn.Module):
    cfg: ModalTuneConfig
    n_gene_groups: int
    max_group_len: int
    dtype: Any = jnp.float32

    def setup(self):
        a = self.cfg.adapter
        b = self.cfg.backbone
        d = b.embed_dim

        # top-level name 'backbone' is the frozen-parameter partition key;
        # encoder layers are span-scanned at the interaction boundaries
        from .longnet import default_spans
        spans = default_spans(b.longnet(), a.interaction_indexes)
        self.backbone = LongNetViT(b, spans=spans, dtype=self.dtype,
                                   name="backbone")

        gene_cfg = self.cfg.gene
        if gene_cfg.output_dim != d:
            gene_cfg = type(gene_cfg)(**{**gene_cfg.__dict__,
                                         "output_dim": d})
        self.gene_encoder = GeneMixerEncoder(
            gene_cfg, self.n_gene_groups, self.max_group_len,
            dtype=self.dtype, name="gene_encoder")

        n_int = len(a.interaction_indexes)
        self.interactions = [
            InteractionBlock(
                dim=d, num_heads=a.num_heads, init_values=a.init_values,
                drop_path=a.drop_path_rate, with_cffn=a.with_cffn,
                cffn_ratio=a.cffn_ratio,
                extra_extractor=(i == n_int - 1) and a.use_extra_extractor,
                dtype=self.dtype, name=f"interactions_{i}")
            for i in range(n_int)]
        # interaction 0 has no prompt self-attention (Identity at
        # longvit_adapter.py:112-129)
        self.prompt_sa = [None] + [
            (SelfAttentionLayer(d, a.num_heads, with_cffn=a.with_cffn,
                                cffn_ratio=a.cffn_ratio,
                                dropout=a.prompt_dropout, dtype=self.dtype,
                                name=f"prompt_sa_{i}")
             if a.use_prompt_sa else None)
            for i in range(1, n_int)]

        n_modal = gene_cfg.final_groups
        if a.prompt_agg == "cls":
            self.gene_cls = self.param("gene_cls",
                                       nn.initializers.normal(0.02),
                                       (1, 1, d))
            n_modal += 1
        if a.is_multi:
            self.task_dense = nn.Dense(
                d, dtype=self.dtype,
                kernel_init=nn.initializers.normal(0.02), name="task_dense")
            self.task_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="task_norm")
            n_modal += 1
        if a.with_clinical:
            self.clinical_fc1 = nn.Dense(
                d // 2, dtype=self.dtype,
                kernel_init=nn.initializers.normal(0.02),
                name="clinical_fc1")
            self.clinical_fc2 = nn.Dense(
                d, dtype=self.dtype,
                kernel_init=nn.initializers.normal(0.02),
                name="clinical_fc2")
            self.clinical_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                              name="clinical_norm")
            n_modal += 1
        self.n_modal = n_modal
        self.gene_pe = self.param("gene_pe", nn.initializers.normal(0.02),
                                  (n_modal, d))

        n_cat = {"sum": 1}.get(a.token_agg)
        if n_cat is None:  # "cat"
            n_cat = 2 + int(a.is_multi) + int(a.with_clinical)
        self.final_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_norm")
        self.final_project = nn.Dense(
            a.output_dim, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.02), name="final_project")
        self._n_cat = n_cat

    def __call__(self, bag, coords, genes, task_token=None, clinical=None,
                 bag_mask: Optional[jax.Array] = None,
                 deterministic: bool = True):
        """bag: (B, L, in_chans) padded tile features; coords: (B, L, 2);
        genes: (B, n_groups, max_group_len); task_token: (B, n_tasks)
        one-hot; clinical: (B, clinfeat_dim); bag_mask: (B, L) validity.
        Returns (B, output_dim) task-conditioned embeddings."""
        a = self.cfg.adapter
        h, seq_mask = self.backbone.embed(bag, coords, bag_mask,
                                          deterministic)

        # ---- modal token stack: [clinical][task][gene_cls][gene tokens]
        modal = self.gene_encoder(genes, deterministic)      # (B, G', D)
        bsz = modal.shape[0]
        if a.prompt_agg == "cls":
            cls_tok = jnp.broadcast_to(self.gene_cls.astype(modal.dtype),
                                       (bsz, 1, modal.shape[-1]))
            modal = jnp.concatenate([cls_tok, modal], axis=1)
        if a.is_multi:
            assert task_token is not None
            t = self.task_norm(self.task_dense(
                task_token.astype(modal.dtype)))[:, None, :]
            modal = jnp.concatenate([t, modal], axis=1)
        if a.with_clinical:
            assert clinical is not None
            ce = self.clinical_fc1(clinical.astype(modal.dtype))
            ce = nn.relu(ce)
            ce = self.clinical_norm(self.clinical_fc2(ce))[:, None, :]
            modal = jnp.concatenate([ce, modal], axis=1)
        assert modal.shape[1] == self.n_modal, (modal.shape, self.n_modal)
        gene_pe = self.gene_pe.astype(modal.dtype)

        # ---- pre-interaction frozen span (longvit_adapter.py:269-281)
        idx = a.interaction_indexes
        if idx[0][0] != 0:
            h = self.backbone.run_layers(h, 0, idx[0][0], seq_mask,
                                         deterministic)

        cls, x = h[:, :1], h[:, 1:]
        x_mask = None if seq_mask is None else seq_mask[:, 1:]
        for i, block in enumerate(self.interactions):
            lo, hi = idx[i]
            if self.prompt_sa[i] is not None:
                modal = self.prompt_sa[i](modal, query_pos=gene_pe,
                                          deterministic=deterministic)
            run_span = lambda t, lo=lo, hi=hi: self.backbone.run_layers(
                t, lo, hi + 1, seq_mask, deterministic)
            x, modal, cls = block(x, modal, cls, run_span,
                                  query_pos=gene_pe, x_mask=x_mask,
                                  deterministic=deterministic)

        # ---- fusion head (longvit_adapter.py:309-347)
        if self.cfg.backbone.global_pool:
            if x_mask is not None:
                m = x_mask[..., None].astype(x.dtype)
                img = ((x * m).sum(1) / jnp.maximum(m.sum(1), 1.0))[:, None]
            else:
                img = x.mean(axis=1, keepdims=True)
        else:
            img = cls

        parts = []
        off = 0
        clin_out = task_out = None
        if a.with_clinical:
            clin_out = modal[:, off:off + 1]
            off += 1
        if a.is_multi:
            task_out = modal[:, off:off + 1]
            off += 1
        if a.prompt_agg == "cls":
            gene_out = modal[:, off:off + 1]
        else:  # "avg"
            gene_out = modal[:, off:].mean(axis=1, keepdims=True)

        if a.token_agg == "sum":
            outcome = img + gene_out
            if task_out is not None:
                outcome = outcome + task_out
            if clin_out is not None:
                outcome = outcome + clin_out
        elif a.token_agg == "cat":
            parts = [img]
            if task_out is not None:
                parts.append(task_out)
            parts.append(gene_out)
            if clin_out is not None:
                parts.append(clin_out)
            outcome = jnp.concatenate(parts, axis=-1)
        else:
            raise NotImplementedError(a.token_agg)

        outcome = self.final_norm(outcome)
        outcome = self.final_project(outcome)
        return outcome[:, 0]
