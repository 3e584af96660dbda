"""Multi-host backend (sqair_tpu/parallel/distributed.py).

SURVEY §5.8: the rebuild's distributed component must scale past one
process.  Contract under test: a 2-process run (2 local CPU devices each,
4-device global mesh, localhost coordinator) trains 3 steps with metrics
identical to a single-process run over the same 4-device mesh shape —
same global batch, same replicated params/rng, same GSPMD program.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(num_processes, local_devices, coordinator=""):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = []
    for pid in range(num_processes):
        cmd = [sys.executable, WORKER,
               "--num_processes", str(num_processes),
               "--process_id", str(pid),
               "--local_devices", str(local_devices)]
        if coordinator:
            cmd += ["--coordinator", coordinator]
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        ))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    for line in outs[0].splitlines():
        if line.startswith("METRICS "):
            return json.loads(line[len("METRICS "):])
    raise AssertionError(f"no METRICS line in: {outs[0]}")


@pytest.mark.slow
def test_two_process_matches_single_process():
    single = _run_workers(num_processes=1, local_devices=4)
    coord = f"127.0.0.1:{_free_port()}"
    multi = _run_workers(num_processes=2, local_devices=2, coordinator=coord)

    assert set(single) == set(multi)
    for k in single:
        np.testing.assert_allclose(
            multi[k], single[k], rtol=1e-5, atol=1e-6,
            err_msg=f"metric {k} diverged between 1-process and 2-process",
        )
    assert np.isfinite(multi["target"])
