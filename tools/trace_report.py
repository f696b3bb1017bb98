#!/usr/bin/env python
"""Summarize a jax.profiler device trace (vm.trace.json.gz) by XLA op.

Usage:
    python tools/trace_report.py /tmp/trace_dir [--steps N] [--top K]
                                 [--shapes PREFIX]

Finds the device "XLA Ops" lane, measures total wall time per op-name
class (the op name up to the first '.'/digit suffix) across the traced
steps, and prints a ms/step table. ``--shapes PREFIX`` additionally
breaks one class (e.g. ``copy``) down by the shape string embedded in
the op's args, which is how the round-3 relayout pools were attributed
(docs/perf_analysis_r3.md).
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def load_events(trace_dir: str):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        sys.exit(f"no trace json under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


def xla_op_events(ev):
    """Complete ('X') events on the device XLA-op lanes."""
    tids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"]["name"]
    op_lanes = {k for k, v in tids.items() if "XLA Ops" in v}
    if not op_lanes:  # CPU traces name lanes differently
        op_lanes = {k for k, v in tids.items() if "TensorFlow Ops" in v}
    return [e for e in ev
            if e.get("ph") == "X" and (e["pid"], e["tid"]) in op_lanes]


_CLASS_RE = re.compile(r"^([a-zA-Z_\-]+)")


def op_class(name: str) -> str:
    m = _CLASS_RE.match(name)
    return m.group(1).rstrip("._-") if m else name


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=2,
                    help="traced steady-state steps the totals span")
    ap.add_argument("--top", type=int, default=18)
    ap.add_argument("--shapes", default="",
                    help="break this op class down by shape")
    a = ap.parse_args()

    ops = xla_op_events(load_events(a.trace_dir))
    if not ops:
        sys.exit("no XLA op events found (is this a device trace?)")
    by_class = collections.Counter()
    n_by_class = collections.Counter()
    by_shape = collections.Counter()
    for e in ops:
        c = op_class(e["name"])
        by_class[c] += e["dur"]
        n_by_class[c] += 1
        if a.shapes and c == a.shapes:
            args = e.get("args", {}) or {}
            shape = args.get("shape_with_layout", args.get("shape", "?"))
            shape = re.sub(r"\{[^}]*\}", "", shape)  # strip layout annots
            src = args.get("source", "?").split("/")[-1]
            by_shape[f"{shape}  {src}"] += e["dur"]

    total = sum(by_class.values())
    print(f"{'op class':<28}{'ms/step':>10}{'count/step':>12}")
    for c, us in by_class.most_common(a.top):
        print(f"{c:<28}{us / 1e3 / a.steps:>10.1f}"
              f"{n_by_class[c] // a.steps:>12}")
    print(f"{'TOTAL':<28}{total / 1e3 / a.steps:>10.1f}")
    if by_shape:
        print(f"\n-- '{a.shapes}' by shape --")
        for s, us in by_shape.most_common(a.top):
            print(f"{us / 1e3 / a.steps:>8.1f} ms  {s}")


if __name__ == "__main__":
    main()
