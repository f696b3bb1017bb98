#!/usr/bin/env python
"""Microbench the mega dilated-attention kernel at bench.py geometry.

Runs fwd+bwd of ops/dilated_mega.mega_dilated_attention alone (no
model around it) and prints one JSON line with ms per fwd+bwd pass —
cheap enough to sweep the kernel's env knobs
(MODALTUNE_MEGA_{FWD,BWD}_BUDGET, MODALTUNE_MEGA_MAX_BQ), one process
per config:

    for bq in 256 512 1024; do
      MODALTUNE_MEGA_MAX_BQ=$bq python tools/sweep_mega.py
    done
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

B, S, H, D = 3, 10240, 16, 48
SEGMENTS = (1024, 5792, 32768, 185363, 1048576)
RATIOS = (1, 2, 4, 8, 16)
ITERS_A, ITERS_B = 4, 12


def main():
    from modaltune_tpu.ops.dilated_mega import (mega_dilated_attention,
                                                mega_eligible)
    assert mega_eligible(S, H, D, SEGMENTS, RATIOS)
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, S, H, D)),
                           jnp.bfloat16) for _ in range(3))
    mask = jnp.ones((B, S), jnp.float32).at[:, S - 128:].set(0.0)

    def loss(q, k, v):
        o = mega_dilated_attention(
            q, k, v, segment_lengths=SEGMENTS, dilated_ratios=RATIOS,
            mask=mask > 0.5)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    step = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    def run_n(n):
        g = None
        for _ in range(n):
            g = step(q, k, v)
        s = float(jax.jit(lambda t: sum(jnp.sum(x.astype(jnp.float32))
                                        for x in t))(g))
        return time.perf_counter(), s

    run_n(2)
    t_a, _ = run_n(ITERS_A)
    t_b, chk = run_n(ITERS_B)
    dt = (t_b - t_a) / (ITERS_B - ITERS_A)
    print(json.dumps({
        "ms_fwd_bwd": round(dt * 1000, 2),
        "check": chk,
        "fwd_budget": os.environ.get("MODALTUNE_MEGA_FWD_BUDGET", ""),
        "bwd_budget": os.environ.get("MODALTUNE_MEGA_BWD_BUDGET", ""),
        "max_bq": os.environ.get("MODALTUNE_MEGA_MAX_BQ", ""),
    }))


if __name__ == "__main__":
    main()
