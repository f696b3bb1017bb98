#!/usr/bin/env python
"""Single-process A/B of full bench-geometry train-step configs.

Cross-session chip drift (bench.py `calib`: the same fixed matmul has
measured 32.6-36.4 ms across tunnel sessions) makes between-process
step-time A/Bs noisy, so this driver measures every config in ONE
process back-to-back, bracketed by calibration kernels. Config axes:

    --bq 512,1024        MODALTUNE_MEGA_MAX_BQ values (monkeypatched,
                         mega build cache cleared between traces)
    --gelu_ln 0,1        fused FFN gelu+LN kernel on/off

Prints one JSON line per (bq, gelu_ln) combination.
"""

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bq", default="512,1024")
    ap.add_argument("--gelu_ln", default="0,1")
    ap.add_argument("--iters", type=int, default=12)
    a = ap.parse_args()

    import bench
    from modaltune_tpu.ops import dilated_mega as dm

    calib0 = bench.calibrate()
    print(json.dumps({"calib_start": calib0}), flush=True)

    for bq in (int(x) for x in a.bq.split(",")):
        for gl in (int(x) for x in a.gelu_ln.split(",")):
            os.environ["MODALTUNE_FUSED_GELU_LN"] = str(gl)
            dm._MAX_BQ = bq
            dm._build_mega.cache_clear()
            t0 = time.time()
            out = bench.measure_train(bench.BAG, with_embed=False)
            out.update(bq=bq, gelu_ln=gl,
                       compile_s=round(time.time() - t0, 1),
                       calib=bench.calibrate())
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
