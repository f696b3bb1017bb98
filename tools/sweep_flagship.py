#!/usr/bin/env python
"""Single-process A/B of mega-kernel knobs at the flagship 25k bucket.

The round-4 step sweep (tools/sweep_step.py) settled MAX_BQ and the
fused gelu+LN question at the 10k bench bucket, but the flagship
25,599 bucket (reference training geometry: threshold 25000,
scripts/submit_modaltune.sh:46) runs a different backward flavor —
``hbm_bwd`` streams dq/dk/dv through HBM row-blocks — with its own
knobs that have never been A/B'd end-to-end:

    --config base         bq=512 (shipped defaults)
    --config bq1024       bq=1024 with fwd/bwd score budgets raised so
                          _pick_bq doesn't silently halve it back
    --config bq256        smaller q tiles (deeper K/V reuse per window)

(The round-4 ``oc*`` configs swept the chunked output-staging DMA size
of the original hbm_io design; the round-5 resident-plane redesign
writes outputs as whole-plane DMAs, so that knob no longer exists.)

Every config is measured in ONE process back-to-back (cross-session
chip drift makes separate-process A/Bs noisy), bracketed by
bench.calibrate() kernels, at the full bench flagship geometry via
bench.measure_train(BAG_FLAGSHIP). A config whose compile OOMs VMEM is
reported as failed instead of killing the sweep. Prints one JSON line
per config.
"""

import argparse
import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

# knob sets: (MAX_BQ, FWD_SCORE_BUDGET, BWD_SCORE_BUDGET)
#
# At the flagship bucket max_wr = 6400 (2.5x the 10k bucket's 2560),
# so the shape-independent score budgets force the q-tile depth down to
# 128 rows where the 10k bucket runs 512 (_pick_bq): base measures that
# inherited geometry; deep_fwd/deep_bwd/deep_both raise one/both
# budgets so the flagship gets the same 512-row tiles (a too-deep
# config VMEM-OOMs at compile and is reported as failed, not fatal).
CONFIGS = {
    "base":      (512, 6 << 20, 4 << 20),
    "bq1024":    (1024, 12 << 20, 8 << 20),
    "bq256":     (256, 6 << 20, 4 << 20),
    "deep_fwd":  (512, 16 << 20, 4 << 20),
    "deep_bwd":  (512, 6 << 20, 14 << 20),
    "deep_both": (512, 16 << 20, 14 << 20),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="base,bq1024,oc4096,oc8192")
    a = ap.parse_args()

    import bench
    from modaltune_tpu.ops import dilated_mega as dm

    print(json.dumps({"calib_start": bench.calibrate()}), flush=True)

    for name in a.configs.split(","):
        bq, fb, bb = CONFIGS[name]
        dm._MAX_BQ = bq
        dm._FWD_SCORE_BUDGET = fb
        dm._BWD_SCORE_BUDGET = bb
        dm._build_mega.cache_clear()
        t0 = time.time()
        try:
            out = bench.measure_train(bench.BAG_FLAGSHIP, with_embed=False)
        except Exception as e:  # VMEM OOM etc. — report, keep sweeping
            traceback.print_exc()
            out = {"error": f"{type(e).__name__}: {e}"[:200]}
        out.update(config=name, bq=bq,
                   compile_s=round(time.time() - t0, 1),
                   calib=bench.calibrate())
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
