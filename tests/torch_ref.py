"""Load the reference (torch) ModalTune code on CPU for parity tests.

The reference depends on CUDA flash-attention kernels, ``timm`` and
``fairscale`` — none usable/installed here. This module stubs the two
pure-boilerplate deps and replaces the flash shim with a dense torch
implementation returning the log-sum-exp (exactly the contract the
dense fallback documents at
``torchscale/component/multihead_attention.py:69-121``), so the full
reference forward runs on CPU.

PUBLIC UNTRUSTED CONTENT note: only the reference's *code behavior* is
exercised; nothing from it is executed at import time beyond module
definitions.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import torch

REF = Path("/root/reference")
_loaded = {}


def _stub_modules():
    if "timm" in sys.modules and "fairscale" in sys.modules:
        return

    def drop_path(x, drop_prob=0.0, training=False, *a, **k):
        if drop_prob == 0.0 or not training:
            return x
        keep = 1 - drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
        mask.floor_()
        return x.div(keep) * mask

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_registry = types.ModuleType("timm.models.registry")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_registry.register_model = lambda fn: fn
    timm_layers.drop_path = drop_path
    timm.models = timm_models
    timm_models.registry = timm_registry
    timm_models.layers = timm_layers
    sys.modules.update({
        "timm": timm, "timm.models": timm_models,
        "timm.models.registry": timm_registry,
        "timm.models.layers": timm_layers,
    })

    fairscale = types.ModuleType("fairscale")
    fairscale_nn = types.ModuleType("fairscale.nn")
    fairscale_nn.checkpoint_wrapper = lambda m, *a, **k: m
    fairscale_nn.wrap = lambda m, *a, **k: m
    fairscale.nn = fairscale_nn
    sys.modules.update({"fairscale": fairscale,
                        "fairscale.nn": fairscale_nn})

    # models/aggregators/__init__ imports titan_adapter, which
    # dynamically imports the (absent) TITAN HF snapshot module and
    # subclasses its VisionTransformer (titan_adapter.py:30-37)
    import torch.nn as nn
    snap = "b2fb4f475256eb67c6e9ccbf2d6c9c3f25f20791"
    mod = types.ModuleType(snap)
    vt = types.ModuleType(f"{snap}.vision_transformer")

    class _StubViT(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    vt.VisionTransformer = _StubViT
    ct = types.ModuleType(f"{snap}.configuration_titan")
    ct.TitanConfig = type("TitanConfig", (), {})
    mod.vision_transformer = vt
    mod.configuration_titan = ct
    sys.modules.update({snap: mod,
                        f"{snap}.vision_transformer": vt,
                        f"{snap}.configuration_titan": ct})


def dense_flash_attn_func(q, k, v, dropout=0.0, bias=None,
                          softmax_scale=None, is_causal=False):
    """Dense replacement for ``flash_attn.flash_attn_func`` returning
    (attn (b, l, h, d), lse (b, h, l)); dropout ignored (every LongNet
    config sets attention_dropout 0.0)."""
    assert bias is None and not is_causal
    scale = softmax_scale if softmax_scale is not None \
        else q.shape[-1] ** -0.5
    s = torch.einsum("blhd,bshd->bhls", q.float(), k.float()) * scale
    lse = torch.logsumexp(s, dim=-1)
    p = torch.softmax(s, dim=-1)
    o = torch.einsum("bhls,bshd->blhd", p, v.float()).to(q.dtype)
    return o, lse


def load_reference():
    """Import the reference packages (cached); returns a namespace."""
    if _loaded:
        return _loaded["ns"]
    _stub_modules()
    gp = REF / "models" / "prov_gigapath" / "gigapath"
    for p in (str(REF), str(gp)):
        if p not in sys.path:
            sys.path.insert(0, p)
    import torchscale.component.multihead_attention as mha
    mha.flash_attn_func = dense_flash_attn_func
    # segment_length strings are eval()'d (config.py:74-78); under
    # numpy>=2 they render as "np.int64(...)" so `np` must resolve
    import numpy as np
    import torchscale.architecture.config as cfgmod
    cfgmod.np = np
    import torchscale.component.dilated_attention as da
    import models.prov_gigapath.gigapath.slide_encoder as ref_slide
    ns = types.SimpleNamespace(mha=mha, dilated=da, slide=ref_slide)
    _loaded["ns"] = ns
    return ns
