"""Multi-host training through the real CLI (scripts/experiment.py).

Drives the full entry point — flags, data pipeline, curriculum, eval
cadence, checkpointing — as TWO coordinated processes on localhost (2
virtual CPU devices each, 4-device global mesh).  Complements
test_distributed.py (which tests the parallel module in isolation).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_test_run(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    results = str(tmp_path / "results")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        # OVERRIDE (not append): the root conftest exports an 8-device
        # XLA_FLAGS into this process's environ; children need exactly 2
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_PLATFORMS"] = "cpu"
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from sqair_tpu.scripts import experiment; "
            f"experiment.main(['--test_run', '--results_dir={results}', "
            f"'--coordinator_address={coord}', '--num_processes=2', "
            f"'--process_id={pid}'])"
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    # two jax processes compiling on one shared CPU core: slow. ~20 min
    # quiet-host, worse under load.
    outs = [p.communicate(timeout=2700)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"

    assert "multi-host: process 0/2, 4 global devices" in outs[0]
    assert "data-parallel over 4 devices" in outs[0]

    run_dir = os.path.join(results, "mnist_test", "1")
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        records = [json.loads(l) for l in f]
    targets = [r["target"] for r in records if "target" in r]
    assert targets and np.all(np.isfinite(targets))
    # the run checkpointed at its final step
    assert any(d.startswith("ckpt-") for d in os.listdir(run_dir))
