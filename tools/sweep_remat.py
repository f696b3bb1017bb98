#!/usr/bin/env python
"""A/B the encoder remat policy at bench.py geometry.

The 'flash' policy saves only the attention-kernel outputs and
recomputes LN/projections/FFN in the backward; at the 10k-patch bag the
saved activations are small enough that HBM can hold far more. This
sweeps remat configurations end-to-end (full train step, same
measurement protocol as bench.py):

    python tools/sweep_remat.py --remat 0
    python tools/sweep_remat.py --remat 1 --policy flash
"""

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

BAG = 10239  # bag + cls = 10240: segment-aligned, same as bench.py
WARMUP = 2
ITERS_A, ITERS_B = 4, 12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--remat", type=int, default=1)
    ap.add_argument("--policy", default="flash")
    args = ap.parse_args()

    from modaltune_tpu.configs import (TrainConfig,
                                       gigapath_modaltune_config)
    from modaltune_tpu.data import GenePacker, synthetic_pathways
    from modaltune_tpu.models import ModalTuneModel
    from modaltune_tpu.train import (TextProjector, TrainState,
                                     make_optimizer, make_train_step,
                                     project_text)

    cfg = gigapath_modaltune_config()
    cfg = dataclasses.replace(cfg, backbone=dataclasses.replace(
        cfg.backbone, remat=bool(args.remat), remat_policy=args.policy))
    groups = synthetic_pathways(n_genes=4987, n_groups=331, max_size=100,
                                seed=0)
    packer = GenePacker.build(groups, [f"g{i}" for i in range(4987)])
    model = ModalTuneModel(cfg, n_gene_groups=packer.n_groups,
                           max_group_len=packer.max_group_len,
                           dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    bag = jnp.asarray(rng.randn(1, BAG, 1536), jnp.float32)
    coords = jnp.asarray(rng.randint(0, 999, (1, BAG, 2)) * 256.0,
                         jnp.float32)
    mask = jnp.asarray(np.ones((1, BAG), bool))
    genes = jnp.asarray(
        packer.pack(rng.randn(4987).astype(np.float32))[None])
    text_raw = jnp.asarray(rng.randn(1, 4, 512), jnp.float32)

    init_fn = jax.jit(lambda r: model.init(
        r, bag, coords, genes, task_token=jnp.eye(3)[:1],
        bag_mask=mask)["params"])
    params = init_fn(jax.random.PRNGKey(0))
    tcfg = TrainConfig()
    tx = make_optimizer(tcfg, steps_per_epoch=100)
    state = TrainState.create(params, tx, frozen_dtype=jnp.bfloat16)
    step_fn = make_train_step(model, tcfg, donate=False)

    projector = TextProjector()
    pp = projector.init(jax.random.PRNGKey(7), jnp.zeros((1, 4, 512)))[
        "params"]
    text = project_text(projector, pp, text_raw)
    batch = dict(bag=bag, coords=coords, mask=mask, genes=genes)

    def run_n(n, st):
        key = jax.random.PRNGKey(42)
        t0 = time.perf_counter()
        for _ in range(n):
            key, sub = jax.random.split(key)
            st, loss = step_fn(st, batch, text, sub)
        lv = float(loss)
        return time.perf_counter() - t0, lv, st

    for _ in range(WARMUP):
        run_n(1, state)
    ta, loss, _ = run_n(ITERS_A, state)
    tb, loss, _ = run_n(ITERS_B, state)
    ms = (tb - ta) / (ITERS_B - ITERS_A) * 1e3
    print(json.dumps({"ms_step": round(ms, 1), "loss": loss,
                      "remat": args.remat, "policy": args.policy}))


if __name__ == "__main__":
    main()
