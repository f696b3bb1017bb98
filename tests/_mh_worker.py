"""Two-process CPU worker for the multi-host DP test (spawned by
tests/test_multihost.py). argv: port process_id."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

port, pid = int(sys.argv[1]), int(sys.argv[2])

from modaltune_tpu.parallel.multihost import (allgather_embeddings,
                                              init_distributed,
                                              process_datalist)

rank, world = init_distributed(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=2, process_id=pid)
assert (rank, world) == (pid, 2), (rank, world)

import numpy as np

# uneven per-process eval outputs (the reference needs DDP Join for this)
n_local = 3 if pid == 0 else 2
x = np.full((n_local, 4), float(pid), np.float32) + \
    np.arange(n_local, dtype=np.float32)[:, None]
ids = [f"case{pid}_{i}" for i in range(n_local)]
out, all_ids = allgather_embeddings(x, ids)
assert out.shape == (5, 4), out.shape
want_ids = ["case0_0", "case0_1", "case0_2", "case1_0", "case1_1"]
assert all_ids == want_ids, all_ids
assert np.allclose(out[0], 0.0) and np.allclose(out[3], 1.0)

items = [f"s{i}" for i in range(7)]
mine = process_datalist(items)
other = process_datalist(items, process_id=1 - pid, num_processes=2)
assert not set(mine) & set(other)
assert len(mine) + len(other) == 7

# --- synchronized DDP train steps: replicas must stay bit-identical ---
# (the reference's DDP gradient all-reduce, base_trainer.py:205-211; here
# DdpGradSync: local per-bucket grad step + global grad-mean/update)
import json
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _mh_common import build_trainer

trainer, init_params = build_trainer(process_shard=(pid, 2),
                                     out_prefix=f"mh_trainer_p{pid}_")
trainer.init_state(init_params)

# --- globally-gathered evaluation: every process must score the FULL
# split (the reference's rank-0 gather, base_trainer.py:379-421). The
# parent test reproduces the identical single-process trainer and
# asserts these metrics match it.
trainer.fit_readout_heads()
metrics = trainer.evaluate("val")
print("EVAL_METRICS " + json.dumps({k: float(v) for k, v in
                                    metrics.items()}, sort_keys=True),
      flush=True)
# artifact writes (confusion/roc JSON) are main-process-gated
conf = os.path.join(trainer.out_dir, "confusion_val.json")
if pid != 0:
    assert not os.path.exists(conf), \
        "non-main process wrote eval artifacts"
# uneven shards: 5 cases over 2 processes -> the synchronized-step cap
# must agree on min(3, 2) = 2 steps
assert trainer._steps_cap == 2, trainer._steps_cap
loss = trainer.train_one_epoch()
assert np.isfinite(loss)

flat = np.concatenate([np.asarray(l, np.float32).ravel()
                       for l in jax.tree_util.tree_leaves(
                           trainer.state.trainable)])
both = allgather_embeddings(flat[None])
assert both.shape[0] == 2
assert np.array_equal(both[0], both[1]), (
    "post-step params diverged across processes: max diff "
    f"{np.abs(both[0] - both[1]).max()}")
# and training actually moved the params
init_flat = np.concatenate([np.asarray(l, np.float32).ravel()
                            for l in jax.tree_util.tree_leaves(
                                {k: v for k, v in init_params.items()
                                 if k != "backbone"})])
assert not np.array_equal(both[0], init_flat)

print(f"WORKER{pid} OK", flush=True)
