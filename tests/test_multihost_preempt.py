"""Multi-host preemption safety: SIGTERM one process of a 2-process run.

The signalled process votes to stop; at the next report boundary all
processes agree via a vote allgather, break at the SAME iteration, save a
single-writer checkpoint, and exit 0.  A fresh 2-process `--resume` run
then continues from that saved step.  (Reference behaviour being matched:
tf.Supervisor saved on stop, reference scripts/experiment.py:176.)
"""
import json
import os
import re
import signal
import socket
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(results, coord, pid, log_path, extra):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    # the --test_run preset would OVERRIDE train_itr/report cadence after
    # flag parsing, so spell its tiny config out explicitly instead
    args = [
        f"--results_dir={results}", "--run_name=preempt",
        "--data_config=sqair_tpu/configs/synth_seq_mnist_data.py",
        "--model_config=sqair_tpu/configs/mlp_mnist_model.py",
        "--seq_len=2", "--eval_on_train=false", "--batch_size=8",
        "--k_particles=2", "--n_units=4", "--synth_train_samples=64",
        "--synth_valid_samples=32", "--synth_timesteps=3",
        f"--coordinator_address={coord}", "--num_processes=2",
        f"--process_id={pid}",
        # long enough that only a signal ends the run; frequent stop votes
        "--train_itr=100000", "--report_loss_every=5",
        "--save_itr=50000", "--log_itr=50000", "--fig_itr=50000",
    ] + extra
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "from sqair_tpu.scripts import experiment; "
        f"experiment.main({args!r})"
    )
    log = open(log_path, "w")
    return subprocess.Popen(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        stdout=log, stderr=subprocess.STDOUT, text=True,
    ), log


def _wait_for_heartbeat(log_path, procs, deadline_s=2400):
    """Block until a '<itr>: target=...' heartbeat line appears."""
    deadline = time.time() + deadline_s
    while time.time() < deadline:
        for p in procs:
            if p.poll() is not None:
                with open(log_path) as f:
                    raise AssertionError(
                        f"a process exited early (rc={p.returncode}):\n"
                        + f.read()[-4000:]
                    )
        if os.path.exists(log_path):
            with open(log_path) as f:
                if re.search(r"^\d+: target=", f.read(), re.M):
                    return
        time.sleep(2)
    raise AssertionError("no heartbeat before deadline")


@pytest.mark.slow
def test_two_process_sigterm_saves_and_resumes(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    results = str(tmp_path / "results")

    procs, logs = [], []
    for pid in range(2):
        p, log = _launch(results, coord, pid,
                         str(tmp_path / f"run1_p{pid}.log"), [])
        procs.append(p)
        logs.append(log)

    try:
        _wait_for_heartbeat(str(tmp_path / "run1_p0.log"), procs)
        # preempt the NON-coordinator process: the stop must propagate
        # through the vote, not through process death
        procs[1].send_signal(signal.SIGTERM)
        for p in procs:
            p.wait(timeout=900)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for log in logs:
            log.close()

    outs = []
    for pid in range(2):
        with open(tmp_path / f"run1_p{pid}.log") as f:
            outs.append(f.read())
    for pid, p in enumerate(procs):
        assert p.returncode == 0, f"process {pid} rc={p.returncode}:\n{outs[pid][-4000:]}"
    # BOTH processes took the coordinated-stop path at the same iteration
    stops = [re.search(r"coordinated stop .*stopping at iter (\d+)", o)
             for o in outs]
    assert all(stops), f"missing coordinated stop:\n{outs[0][-2000:]}\n{outs[1][-2000:]}"
    steps = {int(m.group(1)) for m in stops}
    assert len(steps) == 1, f"processes stopped at different steps: {steps}"
    (saved_step,) = steps
    assert 0 < saved_step < 100000

    run_dir = os.path.join(results, "preempt", "1")
    ckpts = [d for d in os.listdir(run_dir) if d.startswith("ckpt-")]
    assert f"ckpt-{saved_step}" in ckpts, ckpts

    # ---- resume from the preemption checkpoint and run a few more steps
    coord2 = f"127.0.0.1:{_free_port()}"
    target_itr = saved_step + 10
    procs2, logs2 = [], []
    for pid in range(2):
        p, log = _launch(
            results, coord2, pid, str(tmp_path / f"run2_p{pid}.log"),
            ["--resume", f"--train_itr={target_itr}"],
        )
        procs2.append(p)
        logs2.append(log)
    try:
        for p in procs2:
            p.wait(timeout=2400)
    finally:
        for p in procs2:
            if p.poll() is None:
                p.kill()
        for log in logs2:
            log.close()

    with open(tmp_path / "run2_p0.log") as f:
        out2 = f.read()
    for pid, p in enumerate(procs2):
        assert p.returncode == 0, f"resume process {pid} rc={p.returncode}:\n{out2[-4000:]}"
    assert f"Starting training at iter = {saved_step}" in out2, out2[-4000:]
    assert f"ckpt-{target_itr}" in os.listdir(run_dir)

    # metrics stayed finite across the preempt/resume boundary
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        records = [json.loads(l) for l in f]
    import numpy as np

    targets = [r["target"] for r in records if "target" in r]
    assert targets and np.all(np.isfinite(targets))
