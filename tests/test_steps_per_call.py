"""--steps_per_call: chained dispatches must reproduce the unchained run.

Two tiny single-device CPU runs through the real CLI, identical seeds:
one step per dispatch vs two steps per dispatch (inner lax.scan). The
rng schedule folds the ABSOLUTE iteration number either way, so the
heartbeat metrics must agree (up to float reassociation across the two
XLA programs).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(results, run_name, steps_per_call):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    args = [
        f"--results_dir={results}", f"--run_name={run_name}",
        "--data_config=sqair_tpu/configs/synth_seq_mnist_data.py",
        "--model_config=sqair_tpu/configs/mlp_mnist_model.py",
        "--seq_len=2", "--eval_on_train=false", "--batch_size=8",
        "--k_particles=2", "--n_units=4", "--synth_train_samples=64",
        "--synth_valid_samples=32", "--synth_timesteps=3",
        "--train_itr=20", "--report_loss_every=10", "--log_itr=20",
        "--fig_itr=20", "--save_itr=20", "--on_device_data",
        f"--steps_per_call={steps_per_call}",
    ]
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "from sqair_tpu.scripts import experiment; "
        f"experiment.main({args!r})"
    )
    p = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=1200)
    assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-3000:]
    run_dir = os.path.join(results, run_name, "1")
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    return {r["step"]: r for r in recs if "target" in r}, p.stdout


@pytest.mark.slow
def test_chained_matches_unchained(tmp_path):
    results = str(tmp_path / "results")
    m1, out1 = _run(results, "chain1", 1)
    m2, out2 = _run(results, "chain2", 2)
    assert "2 step(s) per dispatch" in out2
    common = sorted(set(m1) & set(m2))
    assert common, f"no common heartbeat steps: {sorted(m1)} vs {sorted(m2)}"
    for s in common:
        np.testing.assert_allclose(
            m1[s]["target"], m2[s]["target"], rtol=1e-4,
            err_msg=f"step {s}")
        np.testing.assert_allclose(
            m1[s]["num_steps"], m2[s]["num_steps"], rtol=1e-4,
            err_msg=f"step {s}")


def test_misaligned_cadence_rejected(tmp_path):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    args = [
        f"--results_dir={tmp_path}/r", "--run_name=bad",
        "--data_config=sqair_tpu/configs/synth_seq_mnist_data.py",
        "--model_config=sqair_tpu/configs/mlp_mnist_model.py",
        "--seq_len=2", "--eval_on_train=false", "--batch_size=8",
        "--k_particles=2", "--n_units=4", "--synth_train_samples=64",
        "--synth_valid_samples=32", "--synth_timesteps=3",
        "--train_itr=20", "--report_loss_every=5", "--log_itr=20",
        "--fig_itr=20", "--save_itr=20", "--on_device_data",
        "--steps_per_call=2",
    ]
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "from sqair_tpu.scripts import experiment; "
        f"experiment.main({args!r})"
    )
    p = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=600)
    assert p.returncode != 0
    assert "report_loss_every=5 must be divisible" in (p.stdout + p.stderr)
