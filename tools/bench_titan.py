#!/usr/bin/env python
"""Benchmark: ModalTune-TITAN fine-tune step throughput (one JSON line).

TITAN-side counterpart of bench.py: grid-scattered CONCH-style patch
features through the rebuilt TITAN ViT (fused Pallas ALiBi attention)
+ Modal Adapter + gene mixer, 3 task tokens, fwd+bwd+AdamW.
"""

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

N_TOKENS = 4096          # grid cells (64x64 region at 1024px lv0 cells)
WARMUP = 2
ITERS_A = 4
ITERS_B = 12


def measure(n_tokens: int = N_TOKENS, iters_b: int = ITERS_B,
            trace_dir: str = "") -> dict:
    """One TITAN train-step throughput measurement -> result dict
    (importable by bench.py so the driver's single JSON line carries the
    TITAN metric alongside the GigaPath one)."""
    from modaltune_tpu.configs import TitanModalTuneConfig, TrainConfig
    from modaltune_tpu.data import GenePacker, synthetic_pathways
    from modaltune_tpu.models.titan import TitanModalTuneModel
    from modaltune_tpu.train import (TextProjector, TrainState,
                                     make_optimizer, make_train_step,
                                     project_text)

    cfg = TitanModalTuneConfig()
    groups = synthetic_pathways(n_genes=4987, n_groups=331,
                                max_size=100, seed=0)
    packer = GenePacker.build(groups, [f"g{i}" for i in range(4987)])
    model = TitanModalTuneModel(cfg, n_gene_groups=packer.n_groups,
                                max_group_len=packer.max_group_len,
                                dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    side = int(round(n_tokens ** 0.5))
    n_tokens = side * side
    gc = np.stack(np.meshgrid(np.arange(side), np.arange(side)),
                  -1).reshape(1, -1, 2)
    tokens = jnp.asarray(rng.randn(1, n_tokens, cfg.backbone.in_dim),
                         jnp.float32)
    coords = jnp.asarray(gc, jnp.float32)
    valid = jnp.asarray(np.ones((1, n_tokens), bool))
    genes = jnp.asarray(
        packer.pack(rng.randn(4987).astype(np.float32))[None])
    text = project_text(
        TextProjector(),
        TextProjector().init(jax.random.PRNGKey(7),
                             jnp.zeros((1, 4, 512)))["params"],
        jnp.asarray(rng.randn(1, 4, 512), jnp.float32))

    init_fn = jax.jit(lambda r: model.init(
        r, tokens, coords, genes, task_token=jnp.eye(3)[:1],
        bag_mask=valid)["params"])
    params = init_fn(jax.random.PRNGKey(0))
    tcfg = TrainConfig()
    tx = make_optimizer(tcfg, steps_per_epoch=100)
    state = TrainState.create(params, tx, frozen_dtype=jnp.bfloat16)
    step_fn = make_train_step(model, tcfg, donate=False)
    batch = dict(bag=tokens, coords=coords, mask=valid, genes=genes)

    def run_n(n, st):
        key = jax.random.PRNGKey(42)
        t0 = time.perf_counter()
        for _ in range(n):
            key, sub = jax.random.split(key)
            st, loss = step_fn(st, batch, text, sub)
        lv = float(loss)
        return time.perf_counter() - t0, lv

    for _ in range(WARMUP):
        run_n(1, state)
    if trace_dir:
        # 2 steady-state steps only (python-side tracing of the build
        # floods the 1M-event cap); summarize with tools/trace_report.py
        from modaltune_tpu.utils.profiling import trace
        with trace(trace_dir):
            run_n(2, state)
        print("trace written to", trace_dir, file=sys.stderr)
    t_a, _ = run_n(ITERS_A, state)
    t_b, loss_v = run_n(iters_b, state)
    dt = (t_b - t_a) / (iters_b - ITERS_A)
    return {
        "metric": "modaltune_titan_train_slides_per_sec_per_chip",
        "value": round(1.0 / dt, 4),
        "unit": f"slides/sec/chip (fwd+bwd+update, {n_tokens}-cell "
                "grid, 3 tasks)",
        "loss": float(loss_v),
        "backend": jax.default_backend(),
        "step_ms": round(1000 * dt, 1),
    }


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--n_tokens", type=int, default=N_TOKENS)
    p.add_argument("--trace", default="",
                   help="jax.profiler trace dir (2 steady-state steps; "
                        "summarize with tools/trace_report.py)")
    args = p.parse_args()
    print(json.dumps(measure(args.n_tokens, trace_dir=args.trace)))


if __name__ == "__main__":
    main()
