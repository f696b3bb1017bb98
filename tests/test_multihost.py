"""Multi-host DP: process sharding, uneven eval gather, 2-process run.

The reference's multi-node story is SLURM/env-bootstrapped DDP with
rank-0 ``gather_object`` (``base_trainer.py:160-203,379-421``). These
tests cover the rebuilt equivalents, including a REAL two-process CPU
run through ``jax.distributed`` (the JAX-native stand-in for a
multi-node cluster).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from modaltune_tpu.parallel.multihost import (allgather_embeddings,
                                              init_distributed,
                                              process_datalist)

ROOT = Path(__file__).resolve().parent.parent


def test_process_datalist_disjoint_cover():
    items = list(range(11))
    shards = [process_datalist(items, p, 3) for p in range(3)]
    flat = sorted(sum(shards, []))
    assert flat == items
    assert max(len(s) for s in shards) - min(len(s) for s in shards) <= 1


def test_first_slurm_host():
    """Bracketed SLURM nodelists must expand to a real hostname — the
    bare prefix ('node') is not a valid coordinator address."""
    from modaltune_tpu.parallel.multihost import _first_slurm_host
    assert _first_slurm_host("node001") == "node001"
    assert _first_slurm_host("node001,node002") == "node001"
    assert _first_slurm_host("node[001-004]") == "node001"
    assert _first_slurm_host("node[001-004,007]") == "node001"
    assert _first_slurm_host("gpu[17,19-21],other") == "gpu17"


def test_model_config_roundtrip():
    """config.json dump -> model_config_from_dict rebuilds the exact
    config, dispatching GigaPath vs TITAN by backbone fields (the
    eval-only reload path; fixes the round-2 dead-and-wrong
    TitanModalTuneConfig.from_dict)."""
    import dataclasses
    from modaltune_tpu.configs import (TitanModalTuneConfig,
                                       gigapath_modaltune_config,
                                       model_config_from_dict,
                                       tiny_test_config)
    for cfg in (gigapath_modaltune_config(clinical=True),
                tiny_test_config(), TitanModalTuneConfig()):
        d = json.loads(json.dumps(dataclasses.asdict(cfg)))
        back = model_config_from_dict(d)
        assert type(back) is type(cfg)
        assert back == cfg


def test_single_process_passthrough():
    assert init_distributed() == (0, 1)
    x = np.arange(6, dtype=np.float32).reshape(3, 2)
    out, ids = allgather_embeddings(x, ["a", "b", "c"])
    np.testing.assert_array_equal(out, x)
    assert ids == ["a", "b", "c"]


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cpu_gather():
    """Spawn two real processes, initialize jax.distributed over
    loopback, and run the uneven-count embedding gather."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = str(ROOT) + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(ROOT / "tests" / "_mh_worker.py"),
         str(port), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("jax.distributed CPU 2-process run timed out in "
                    "this environment")
    if any(p.returncode for p in procs):
        joined = "\n---\n".join(outs)
        if "UNIMPLEMENTED" in joined or "not supported" in joined.lower():
            pytest.skip("cross-process CPU collectives unsupported here:"
                        f" {joined[-400:]}")
        raise AssertionError(joined[-2000:])
    assert "WORKER0 OK" in outs[0]
    assert "WORKER1 OK" in outs[1]

    # --- globally-gathered eval (reference rank-0 gather equivalent,
    # base_trainer.py:379-421): both processes must report the FULL
    # split's metrics, identical to each other AND to a single-process
    # run of the identical trainer on the same data.
    def _metrics(out):
        line = next(l for l in out.splitlines()
                    if l.startswith("EVAL_METRICS "))
        return json.loads(line[len("EVAL_METRICS "):])

    m0, m1 = _metrics(outs[0]), _metrics(outs[1])
    assert m0 == m1, (m0, m1)

    sys.path.insert(0, str(ROOT / "tests"))
    from _mh_common import build_trainer
    trainer, init_params = build_trainer(process_shard=None)
    trainer.init_state(init_params)
    trainer.fit_readout_heads()
    expected = trainer.evaluate("val")
    assert set(m0) == set(expected), (set(m0), set(expected))
    for k, v in expected.items():
        # the loss crosses a float32 process_sum in the 2-proc run;
        # everything else must match to fp noise
        tol = 1e-5 if k.endswith("_loss") else 1e-9
        assert abs(m0[k] - float(v)) <= tol * max(1.0, abs(float(v))), \
            (k, m0[k], float(v))
