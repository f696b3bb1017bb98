#!/usr/bin/env python
"""Convert a reference-trained ModalTune checkpoint
(``best_model_weights.pt``, torch state dict from
``models/aggregators/longvit_adapter.py``) into ModalTune-TPU params —
backbone + adapter + gene encoder + fusion head — so reference-trained
models can be deployed/OOD-evaluated here directly
(``deploy_mil``-equivalent, see train/trainer.py::deploy).

torch nn.MultiheadAttention with kdim != embed_dim stores separate
``q_proj_weight``/``k_proj_weight``/``v_proj_weight`` plus a packed
``in_proj_bias``; these unpack into TorchMHA's q/k/v Dense params.

Usage:
  python tools/convert_modaltune.py best_model_weights.pt out.npz \
      [--interaction-indexes 0,3:4,7:8,11]
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from convert_gigapath import GIGAPATH_SPANS, convert_backbone_state_dict
from modaltune_tpu.utils.params_io import (save_params_npz,
                                           stack_layers_into_spans,
                                           unflatten_params)


def _t(w):
    return np.asarray(w, np.float32).T


def _ln(flat, dst, sd, src):
    flat[f"{dst}/scale"] = np.asarray(sd[f"{src}.weight"], np.float32)
    flat[f"{dst}/bias"] = np.asarray(sd[f"{src}.bias"], np.float32)


def _lin(flat, dst, sd, src):
    flat[f"{dst}/kernel"] = _t(sd[f"{src}.weight"])
    if f"{src}.bias" in sd:
        flat[f"{dst}/bias"] = np.asarray(sd[f"{src}.bias"], np.float32)


def _mha(flat, dst, sd, src):
    """torch nn.MultiheadAttention (kdim/vdim variant) -> TorchMHA."""
    e = sd[f"{src}.q_proj_weight"].shape[0] \
        if f"{src}.q_proj_weight" in sd else \
        sd[f"{src}.in_proj_weight"].shape[0] // 3
    if f"{src}.q_proj_weight" in sd:
        qw = sd[f"{src}.q_proj_weight"]
        kw = sd[f"{src}.k_proj_weight"]
        vw = sd[f"{src}.v_proj_weight"]
    else:  # packed in_proj (kdim == embed_dim)
        w = np.asarray(sd[f"{src}.in_proj_weight"])
        qw, kw, vw = w[:e], w[e:2 * e], w[2 * e:]
    bias = np.asarray(sd.get(f"{src}.in_proj_bias",
                             np.zeros(3 * e, np.float32)), np.float32)
    flat[f"{dst}/q_proj/kernel"] = _t(qw)
    flat[f"{dst}/q_proj/bias"] = bias[:e]
    flat[f"{dst}/k_proj/kernel"] = _t(kw)
    flat[f"{dst}/k_proj/bias"] = bias[e:2 * e]
    flat[f"{dst}/v_proj/kernel"] = _t(vw)
    flat[f"{dst}/v_proj/bias"] = bias[2 * e:]
    _lin(flat, f"{dst}/out_proj", sd, f"{src}.out_proj")


def _cross_attn_layer(flat, dst, sd, src):
    _ln(flat, f"{dst}/norm", sd, f"{src}.norm")
    _ln(flat, f"{dst}/norm_kq", sd, f"{src}.norm_kq")
    if f"{src}.q_proj.weight" in sd:
        _lin(flat, f"{dst}/q_proj", sd, f"{src}.q_proj")
        _lin(flat, f"{dst}/output_proj", sd, f"{src}.output_proj")
    _mha(flat, f"{dst}/multihead_attn", sd, f"{src}.multihead_attn")


def _self_attn_layer(flat, dst, sd, src):
    _ln(flat, f"{dst}/norm", sd, f"{src}.norm")
    if f"{src}.q_proj.weight" in sd:
        _lin(flat, f"{dst}/q_proj", sd, f"{src}.q_proj")
        _lin(flat, f"{dst}/output_proj", sd, f"{src}.output_proj")
    _mha(flat, f"{dst}/self_attn", sd, f"{src}.self_attn")


def _extractor(flat, dst, sd, src):
    _cross_attn_layer(flat, f"{dst}/attn", sd, f"{src}.attn")
    if f"{src}.ffn.linear1.weight" in sd:
        _ln(flat, f"{dst}/ffn/norm", sd, f"{src}.ffn.norm")
        _lin(flat, f"{dst}/ffn/linear1", sd, f"{src}.ffn.linear1")
        _lin(flat, f"{dst}/ffn/linear2", sd, f"{src}.ffn.linear2")


def convert_gene_encoder(flat, sd, prefix="gene_encoder"):
    # stacked SNN blocks (ragged torch Linears -> zero-padded stacks)
    g = 0
    while f"{prefix}.gene_networks.{g}.0.0.weight" in sd:
        g += 1
    if g == 0:
        return
    latent = sd[f"{prefix}.gene_networks.0.0.0.weight"].shape[0]
    max_len = max(sd[f"{prefix}.gene_networks.{i}.0.0.weight"].shape[1]
                  for i in range(g))
    w1 = np.zeros((g, max_len, latent), np.float32)
    b1 = np.zeros((g, latent), np.float32)
    w2 = np.zeros((g, latent, latent), np.float32)
    b2 = np.zeros((g, latent), np.float32)
    for i in range(g):
        wi = np.asarray(sd[f"{prefix}.gene_networks.{i}.0.0.weight"],
                        np.float32)
        w1[i, :wi.shape[1]] = wi.T
        b1[i] = sd[f"{prefix}.gene_networks.{i}.0.0.bias"]
        w2[i] = _t(sd[f"{prefix}.gene_networks.{i}.1.0.weight"])
        b2[i] = sd[f"{prefix}.gene_networks.{i}.1.0.bias"]
    flat["gene_encoder/snn1_kernel"] = w1
    flat["gene_encoder/snn1_bias"] = b1
    flat["gene_encoder/snn2_kernel"] = w2
    flat["gene_encoder/snn2_bias"] = b2

    # mixer depth = number of Sequential pairs before the trailing LN
    depth = 0
    while f"{prefix}.mlp_mixer.{depth}.0.norm.weight" in sd:
        depth += 1
    for i in range(depth):
        base = f"{prefix}.mlp_mixer.{i}"
        _ln(flat, f"gene_encoder/mix{i}_token_norm", sd, f"{base}.0.norm")
        # token FF = Conv1d(G, inner, 1) / Conv1d(inner, G, 1)
        wa = np.asarray(sd[f"{base}.0.fn.0.weight"], np.float32)[..., 0]
        wb = np.asarray(sd[f"{base}.0.fn.3.weight"], np.float32)[..., 0]
        flat[f"gene_encoder/mix{i}_token/w1"] = wa.T
        flat[f"gene_encoder/mix{i}_token/b1"] = np.asarray(
            sd[f"{base}.0.fn.0.bias"], np.float32)
        flat[f"gene_encoder/mix{i}_token/w2"] = wb.T
        flat[f"gene_encoder/mix{i}_token/b2"] = np.asarray(
            sd[f"{base}.0.fn.3.bias"], np.float32)
        _ln(flat, f"gene_encoder/mix{i}_chan_norm", sd, f"{base}.1.norm")
        _lin(flat, f"gene_encoder/mix{i}_chan/fc1", sd, f"{base}.1.fn.0")
        _lin(flat, f"gene_encoder/mix{i}_chan/fc2", sd, f"{base}.1.fn.3")
    _ln(flat, "gene_encoder/mixer_norm", sd, f"{prefix}.mlp_mixer.{depth}")
    _lin(flat, "gene_encoder/mixer_out", sd,
         f"{prefix}.mlp_mixer.{depth + 1}")
    flat["gene_encoder/compress_kernel"] = _t(
        sd[f"{prefix}.pathway_compression.weight"])
    flat["gene_encoder/compress_bias"] = np.asarray(
        sd[f"{prefix}.pathway_compression.bias"], np.float32)


def convert_modaltune_state_dict(sd: dict, spans=GIGAPATH_SPANS) -> dict:
    """Full adapter checkpoint -> ModalTune-TPU param tree."""
    # backbone subtree (keys not claimed by the adapter)
    backbone_sd = {k: v for k, v in sd.items()
                   if k.startswith(("patch_embed.", "encoder.", "norm."))
                   or k in ("cls_token", "pos_embed")}
    backbone = convert_backbone_state_dict(backbone_sd)
    backbone["encoder"] = stack_layers_into_spans(backbone["encoder"],
                                                  spans)

    flat = {}
    # interactions
    i = 0
    while f"interactions.{i}.injector.gamma" in sd:
        base = f"interactions.{i}"
        dst = f"interactions_{i}"
        flat[f"{dst}/injector/gamma"] = np.asarray(
            sd[f"{base}.injector.gamma"], np.float32)
        _cross_attn_layer(flat, f"{dst}/injector/attn", sd,
                          f"{base}.injector.attn")
        _extractor(flat, f"{dst}/extractor", sd, f"{base}.extractor")
        for j in (0, 1):
            if f"{base}.extra_extractors.{j}.attn.norm.weight" in sd:
                _extractor(flat, f"{dst}/extra_extractor_{j}", sd,
                           f"{base}.extra_extractors.{j}")
        i += 1

    # prompt self-attention (index 0 is Identity -> no params)
    for k in range(1, i):
        if f"prompt_selfattention.{k}.norm.weight" in sd:
            _self_attn_layer(flat, f"prompt_sa_{k}", sd,
                             f"prompt_selfattention.{k}")

    convert_gene_encoder(flat, sd)

    if "gene_cls" in sd:
        flat["gene_cls"] = np.asarray(sd["gene_cls"], np.float32)
    flat["gene_pe"] = np.asarray(sd["gene_pe"], np.float32)
    if "task_weight.0.weight" in sd:
        _lin(flat, "task_dense", sd, "task_weight.0")
        _ln(flat, "task_norm", sd, "task_weight.1")
    if "clinical_mlp.0.weight" in sd:
        _lin(flat, "clinical_fc1", sd, "clinical_mlp.0")
        _lin(flat, "clinical_fc2", sd, "clinical_mlp.2")
        _ln(flat, "clinical_norm", sd, "clinical_mlp.3")
    _ln(flat, "final_norm", sd, "final_norm")
    _lin(flat, "final_project", sd, "final_project")

    tree = unflatten_params(flat)
    tree["backbone"] = backbone
    return tree


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("output")
    ap.add_argument("--interaction-indexes", default="0,3:4,7:8,11",
                    help="colon-separated lo,hi pairs")
    args = ap.parse_args()
    spans = tuple(
        (int(p.split(",")[0]), int(p.split(",")[1]) + 1)
        for p in args.interaction_indexes.split(":"))
    import torch
    sd = torch.load(args.checkpoint, map_location="cpu",
                    weights_only=False)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v
          for k, v in sd.items()}
    tree = convert_modaltune_state_dict(sd, spans=spans)
    save_params_npz(args.output, tree)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
