#!/usr/bin/env python
"""Microbench the ALiBi flash kernel at bench_titan geometry.

Runs fwd+bwd of ops/alibi_flash.alibi_flash_attention alone and prints
one JSON line — for sweeping block sizes and validating kernel-layout
changes without the full TITAN model around them:

    python tools/sweep_alibi.py --block_q 512 --block_k 512
"""

import argparse
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

B, H, D = 1, 12, 64
N_TOKENS = 4096
ITERS_A, ITERS_B = 4, 12


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--block_q", type=int, default=512)
    p.add_argument("--block_k", type=int, default=512)
    p.add_argument("--n_tokens", type=int, default=N_TOKENS)
    p.add_argument("--all_heads", type=int, default=0)
    args = p.parse_args()

    from modaltune_tpu.ops.alibi_flash import alibi_flash_attention

    n = args.n_tokens + 4            # cls + 3 task tokens
    g = int(np.ceil(np.sqrt(args.n_tokens)))
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, n, D)),
                           jnp.bfloat16) for _ in range(3))
    coords = np.zeros((B, n, 3), np.float32)
    coords[:, 4:, 0] = np.arange(args.n_tokens) // g
    coords[:, 4:, 1] = np.arange(args.n_tokens) % g
    coords[:, :4, 2] = 1.0           # cls + task rows: no alibi
    coords = jnp.asarray(coords)
    slopes = jnp.asarray(np.geomspace(0.5, 1 / 256, H), jnp.float32)
    mask = jnp.ones((B, n), bool)

    def loss(q, k, v):
        o = alibi_flash_attention(q, k, v, coords, slopes,
                                  key_mask=mask, use_pallas=True,
                                  block_q=args.block_q,
                                  block_k=args.block_k,
                                  all_heads=bool(args.all_heads))
        return jnp.sum(o.astype(jnp.float32) ** 2)

    step = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    def run_n(nr):
        gr = None
        for _ in range(nr):
            gr = step(q, k, v)
        s = float(jax.jit(lambda t: sum(jnp.sum(x.astype(jnp.float32))
                                        for x in t))(gr))
        return time.perf_counter(), s

    run_n(2)
    t_a, _ = run_n(ITERS_A)
    t_b, chk = run_n(ITERS_B)
    dt = (t_b - t_a) / (ITERS_B - ITERS_A)
    print(json.dumps({"ms_fwd_bwd": round(dt * 1000, 2), "check": chk,
                      "block_q": args.block_q, "block_k": args.block_k,
                      "all_heads": args.all_heads, "n": n}))


if __name__ == "__main__":
    main()
