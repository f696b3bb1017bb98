#!/usr/bin/env python
"""Convert TITAN ``model.safetensors`` into ModalTune-TPU TitanViT params.

The reference loads the HF snapshot's checkpoint filtered to
``vision_encoder.*`` (``models/aggregators/titan_adapter.py:234-247``)
into the snapshot's ``VisionTransformer``. This converter maps that
(timm/CoCa-convention) torch layout onto the rebuilt flax ``TitanViT``
(modaltune_tpu/models/titan.py):

  cls_token                        -> cls_token
  patch_embed.{fc1|0} / {fc2|2}    -> patch_embed_fc1 / patch_embed_fc2
  norm_pre                         -> norm_pre (LayerNorm)
  blocks.N.norm1|norm2             -> blocks_N/norm1|norm2
  blocks.N.attn.qkv                -> blocks_N/attn/qkv (packed q|k|v
                                      rows, transposed to (D, 3D))
  blocks.N.attn.proj               -> blocks_N/attn/proj
  blocks.N.mlp.fc1|fc2             -> blocks_N/mlp_fc1|mlp_fc2
  norm                             -> norm
  attn_pool.{latent|query}         -> attn_pool/query
  attn_pool.{ln_k|norm_k}          -> attn_pool/ln_k
  attn_pool.{q|q_proj}, {k|k_proj}, {v|v_proj}, kv (packed)
                                   -> attn_pool/{q_proj,k_proj,v_proj}
  attn_pool.{proj|out_proj}        -> attn_pool/out_proj
  attn_pool.{ln_out|norm_out}      -> attn_pool/ln_out

Key-name aliases cover the naming variants seen across timm / open_clip
/ CoCa implementations; the snapshot itself is not redistributable, so
tests validate the mapping against a torch re-implementation with the
same semantics (tests/test_convert_titan.py), closing PARITY.md delta
#4 as far as is possible without the snapshot on disk.

Usage:
  python tools/convert_titan.py model.safetensors out_titan.npz
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from modaltune_tpu.utils.params_io import save_params_npz, unflatten_params


def _t(w):
    return np.asarray(w, np.float32).T


def _put_lin(flat, dst, sd, src_aliases, transpose=True):
    for src in src_aliases:
        if f"{src}.weight" in sd:
            w = np.asarray(sd[f"{src}.weight"], np.float32)
            flat[f"{dst}/kernel"] = w.T if transpose else w
            if f"{src}.bias" in sd:
                flat[f"{dst}/bias"] = np.asarray(sd[f"{src}.bias"],
                                                 np.float32)
            return True
    return False


def _put_ln(flat, dst, sd, src_aliases):
    for src in src_aliases:
        if f"{src}.weight" in sd:
            flat[f"{dst}/scale"] = np.asarray(sd[f"{src}.weight"],
                                              np.float32)
            flat[f"{dst}/bias"] = np.asarray(sd[f"{src}.bias"],
                                             np.float32)
            return True
    return False


def convert_titan_state_dict(sd: dict) -> dict:
    """vision_encoder state dict -> TitanViT flax param tree."""
    flat = {}
    used = set()

    if "cls_token" in sd:
        flat["cls_token"] = np.asarray(sd["cls_token"],
                                       np.float32).reshape(1, 1, -1)

    _put_lin(flat, "patch_embed_fc1", sd,
             ["patch_embed.fc1", "patch_embed.0", "patch_embed_mlp.0",
              "patch_embed.proj1"])
    _put_lin(flat, "patch_embed_fc2", sd,
             ["patch_embed.fc2", "patch_embed.2", "patch_embed_mlp.2",
              "patch_embed.proj2"])
    _put_ln(flat, "norm_pre", sd, ["norm_pre", "ln_pre"])
    _put_ln(flat, "norm", sd, ["norm", "ln_post"])

    depth = 0
    while any(k.startswith(f"blocks.{depth}.") for k in sd):
        depth += 1
    for i in range(depth):
        b, dst = f"blocks.{i}", f"blocks_{i}"
        _put_ln(flat, f"{dst}/norm1", sd, [f"{b}.norm1"])
        _put_ln(flat, f"{dst}/norm2", sd, [f"{b}.norm2"])
        _put_lin(flat, f"{dst}/attn/qkv", sd, [f"{b}.attn.qkv"])
        _put_lin(flat, f"{dst}/attn/proj", sd, [f"{b}.attn.proj"])
        _put_lin(flat, f"{dst}/mlp_fc1", sd, [f"{b}.mlp.fc1"])
        _put_lin(flat, f"{dst}/mlp_fc2", sd, [f"{b}.mlp.fc2"])

    # attentional pooler
    for alias in ("attn_pool.latent", "attn_pool.query",
                  "attn_pool.query_tokens"):
        if alias in sd:
            q = np.asarray(sd[alias], np.float32)
            flat["attn_pool/query"] = q.reshape(-1, q.shape[-1])
            break
    _put_ln(flat, "attn_pool/ln_k", sd,
            ["attn_pool.ln_k", "attn_pool.norm_k", "attn_pool.norm"])
    _put_ln(flat, "attn_pool/ln_out", sd,
            ["attn_pool.ln_out", "attn_pool.norm_out", "attn_pool.ln_q"])
    got_q = _put_lin(flat, "attn_pool/q_proj", sd,
                     ["attn_pool.q", "attn_pool.q_proj",
                      "attn_pool.to_q"])
    got_k = _put_lin(flat, "attn_pool/k_proj", sd,
                     ["attn_pool.k", "attn_pool.k_proj"])
    got_v = _put_lin(flat, "attn_pool/v_proj", sd,
                     ["attn_pool.v", "attn_pool.v_proj"])
    if got_q and not (got_k or got_v):
        for kv in ("attn_pool.kv", "attn_pool.to_kv"):
            if f"{kv}.weight" in sd:
                w = np.asarray(sd[f"{kv}.weight"], np.float32)
                d = w.shape[0] // 2
                flat["attn_pool/k_proj/kernel"] = w[:d].T
                flat["attn_pool/v_proj/kernel"] = w[d:].T
                if f"{kv}.bias" in sd:
                    bb = np.asarray(sd[f"{kv}.bias"], np.float32)
                    flat["attn_pool/k_proj/bias"] = bb[:d]
                    flat["attn_pool/v_proj/bias"] = bb[d:]
                break
    _put_lin(flat, "attn_pool/out_proj", sd,
             ["attn_pool.proj", "attn_pool.out_proj",
              "attn_pool.to_out"])
    return unflatten_params(flat)


def load_vision_encoder_safetensors(path: str) -> dict:
    """Read model.safetensors filtered to vision_encoder.* (matching
    titan_adapter.py:234-247)."""
    from safetensors import safe_open
    sd = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            if "vision_encoder" in k:
                sd[k.split("vision_encoder.")[1]] = f.get_tensor(k)
    return sd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="TITAN model.safetensors")
    ap.add_argument("output", help="output .npz")
    args = ap.parse_args()
    sd = load_vision_encoder_safetensors(args.checkpoint)
    tree = convert_titan_state_dict(sd)
    save_params_npz(args.output, tree)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
