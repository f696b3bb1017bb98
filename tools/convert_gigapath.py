#!/usr/bin/env python
"""Convert a Prov-GigaPath ``slide_encoder.pth`` torch checkpoint into
ModalTune-TPU backbone params (.npz flat dict).

The reference loads this checkpoint at
``gigapath/slide_encoder.py:292-322``; torch Linear weights are
``(out, in)`` so every kernel is transposed, LayerNorm ``weight`` maps to
flax ``scale``, and the non-persistent ``pos_embed`` buffer is dropped
(we evaluate the sincos embedding on the fly — see
``modaltune_tpu/models/slide_encoder.py``).

Usage:
  python tools/convert_gigapath.py slide_encoder.pth out_backbone.npz
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from modaltune_tpu.utils.params_io import (save_params_npz,
                                           stack_layers_into_spans,
                                           unflatten_params)


def convert_backbone_state_dict(state: dict) -> dict:
    """torch slide-encoder state dict -> flax param tree (the ``backbone``
    subtree of ModalTuneModel / the full LongNetViT param tree)."""
    flat = {}
    skipped = []
    for key, val in state.items():
        v = np.asarray(val, dtype=np.float32)
        if key == "pos_embed":
            skipped.append(key)  # recomputed on the fly
            continue
        m = re.match(r"encoder\.layers\.(\d+)\.(.*)", key)
        if key == "cls_token":
            flat["cls_token"] = v
        elif key.startswith("patch_embed.proj."):
            kind = key.rsplit(".", 1)[1]
            flat[f"patch_embed/proj/{'kernel' if kind == 'weight' else 'bias'}"] = \
                v.T if kind == "weight" else v
        elif key.startswith("encoder.layer_norm."):
            kind = key.rsplit(".", 1)[1]
            flat[f"encoder/layer_norm/{'scale' if kind == 'weight' else 'bias'}"] = v
        elif key.startswith("norm."):
            kind = key.rsplit(".", 1)[1]
            flat[f"norm/{'scale' if kind == 'weight' else 'bias'}"] = v
        elif m:
            i, rest = int(m.group(1)), m.group(2)
            base = f"encoder/layers_{i}"
            name, kind = rest.rsplit(".", 1)
            name = name.replace(".", "/")
            if "layer_norm" in name or "layernorm" in name or \
                    name.endswith("inner_attn_ln"):
                flat[f"{base}/{name}/{'scale' if kind == 'weight' else 'bias'}"] = v
            else:  # linear layers
                flat[f"{base}/{name}/{'kernel' if kind == 'weight' else 'bias'}"] = \
                    v.T if kind == "weight" else v
        else:
            skipped.append(key)
    if skipped:
        print(f"skipped {len(skipped)} keys: {skipped[:8]}...")
    return unflatten_params(flat)


# interaction spans of the gigapath ModalTune config: layers are scanned
# in spans (0,4),(4,8),(8,12) — see modaltune_tpu/models/longnet.py
GIGAPATH_SPANS = ((0, 4), (4, 8), (8, 12))


def convert_backbone_spanned(state: dict, spans=GIGAPATH_SPANS) -> dict:
    tree = convert_backbone_state_dict(state)
    tree["encoder"] = stack_layers_into_spans(tree["encoder"], spans)
    return tree


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("output")
    ap.add_argument("--spanned", action="store_true", default=True,
                    help="stack layers into the gigapath interaction "
                         "spans (scan layout)")
    args = ap.parse_args()
    import torch
    ckpt = torch.load(args.checkpoint, map_location="cpu",
                      weights_only=False)
    state = ckpt.get("model", ckpt)
    tree = convert_backbone_spanned(state) if args.spanned else \
        convert_backbone_state_dict(state)
    save_params_npz(args.output, tree)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
