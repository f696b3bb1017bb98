"""Flat-dict parameter serialization (.npz) used by the weight
converters and checkpoints that must be readable without orbax.

npz cannot store bfloat16 (it pickles to object arrays); bf16 leaves are
saved as float32 with a dtype manifest and cast back on load."""

from __future__ import annotations

import json
from typing import Dict

import numpy as np

_DTYPE_KEY = "__dtypes__"


def flatten_params(tree: dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_params(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        keys = path.split("/")
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = v
    return tree


def stack_layers_into_spans(encoder_tree: dict, spans) -> dict:
    """Convert per-layer params (``layers_{i}/...``, e.g. from a torch
    checkpoint conversion) into the span-scanned layout
    (``span_{k}/...`` with a leading layer axis) used by
    ``LongNetEncoder`` — see ``models/longnet.py``. Non-layer entries
    (``layer_norm`` etc.) pass through unchanged."""
    out = {k: v for k, v in encoder_tree.items()
           if not k.startswith("layers_")}
    for k, (lo, hi) in enumerate(spans):
        layer_flats = [flatten_params(encoder_tree[f"layers_{i}"])
                       for i in range(lo, hi)]
        stacked = {path: np.stack([lf[path] for lf in layer_flats])
                   for path in layer_flats[0]}
        out[f"span_{k}"] = unflatten_params(stacked)
    return out


def save_params_npz(path: str, tree: dict) -> None:
    flat = flatten_params(tree)
    dtypes = {}
    out = {}
    for k, v in flat.items():
        v = np.asarray(v)
        if v.dtype.name not in ("float64", "float32", "float16", "int32",
                                "int64", "bool", "uint32", "uint8"):
            dtypes[k] = v.dtype.name
            v = v.astype(np.float32)
        out[k] = v
    out[_DTYPE_KEY] = np.frombuffer(
        json.dumps(dtypes).encode(), dtype=np.uint8)
    np.savez(path, **out)


def load_params_npz(path: str) -> dict:
    z = np.load(path)
    files = [k for k in z.files if k != _DTYPE_KEY]
    dtypes = {}
    if _DTYPE_KEY in z.files:
        dtypes = json.loads(bytes(z[_DTYPE_KEY]).decode())
    flat = {}
    for k in files:
        v = z[k]
        if k in dtypes:
            import ml_dtypes
            v = v.astype(np.dtype(dtypes[k]))
        flat[k] = v
    return unflatten_params(flat)


def apply_bert_init(params, rng, std: float = 0.02):
    """BERT-style re-initialization of an existing param tree — the
    ``init_bert_params`` hook (``torchscale/architecture/utils.py:10-33``,
    applied when ``EncoderConfig.bert_init`` is set; every shipped
    LongNet config leaves it False): Linear/attention-projection kernels
    and embeddings get N(0, std), biases zero. LayerNorm scales/biases
    are left untouched, matching the reference (it only handles Linear/
    Embedding/MultiheadAttention modules).
    """
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves_with_path(params)
    keys = jax.random.split(rng, max(1, len(leaves)))
    linear_parents = {
        jax.tree_util.keystr(p[:-1])
        for p, _ in leaves
        if jax.tree_util.keystr(p).endswith("['kernel']")}
    flat = {}
    for (path, leaf), key in zip(leaves, keys):
        name = jax.tree_util.keystr(path)
        parent = jax.tree_util.keystr(path[:-1])
        if name.endswith("['kernel']") or name.endswith("['embedding']"):
            # 'kernel' covers Linear/attention projections; 'embedding'
            # covers flax nn.Embed tables (torch nn.Embedding equivalent,
            # re-drawn by init_bert_params the same way)
            flat[name] = (jax.random.normal(key, leaf.shape) *
                          std).astype(leaf.dtype)
        elif name.endswith("['bias']") and parent in linear_parents:
            # only Linear biases; LayerNorm params are untouched
            flat[name] = jnp.zeros_like(leaf)
        else:
            flat[name] = leaf
    return jax.tree_util.tree_map_with_path(
        lambda p, l: flat[jax.tree_util.keystr(p)], params)
