"""Checkpoint-sweep evaluation.

Reference: sqair/scripts/eval.py — walks every nth checkpoint of a run,
restores, averages metrics over the full valid (or train) set, appends
"itr: value" lines to <metric>_<dataset>.txt in the run dir; resumable
(skips already-evaluated iterations).

Run:
    python -m sqair_tpu.scripts.eval --checkpoint_dir results/multi_mnist/1 \
        --data_config sqair_tpu/configs/synth_seq_mnist_data.py \
        --model_config sqair_tpu/configs/mlp_mnist_model.py
"""
from __future__ import annotations

import os
import sys
from os import path as osp

import jax

# See scripts/experiment.py: the axon sitecustomize overrides
# JAX_PLATFORMS via jax.config; SQAIR_PLATFORM=cpu forces host eval
# (the usual mode for sweeps while the chip trains).
if os.environ.get("SQAIR_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SQAIR_PLATFORM"])

import numpy as np

from sqair_tpu.experiment import flags
from sqair_tpu.experiment.experiment_tools import (
    json_load,
    load,
    parse_flags,
)
from sqair_tpu.training import find_checkpoints, restore_params
from sqair_tpu.training.train import init_train, make_eval_step, make_optimizer

flags.DEFINE_string("checkpoint_dir", "", "Run dir with checkpoints (…/run/<n>).")
flags.DEFINE_string("data_config", "sqair_tpu/configs/synth_seq_mnist_data.py", "")
flags.DEFINE_string("model_config", "sqair_tpu/configs/mlp_mnist_model.py", "")
flags.DEFINE_string("dataset", "valid", "valid | train")
flags.DEFINE_integer("every_nth_checkpoint", 1, "Evaluate every nth checkpoint.")
flags.DEFINE_integer("eval_batch_size", 32, "")

METRICS = ("iwae", "vae", "num_step_accuracy", "data_ll", "kl",
           "num_steps", "aspect", "num_step_acc_per_t", "num_steps_per_t")
METRIC_FILES = {"iwae": "logpx", "vae": "vae", "num_step_accuracy": "acc",
                "data_ll": "data_ll", "kl": "kl",
                # num_steps (mean inferred objects/frame) + aspect (mean
                # squared log-aspect of present glimpses) make the conv
                # sliver ladder comparable numerically across runs
                "num_steps": "num_steps", "aspect": "aspect",
                # [T] per-frame accuracy breakdown — the round-4 plateau
                # diagnosis ("frames 1-2 carry the residual error") as a
                # logged vector: "itr: v0 v1 ... v{T-1}" per line
                "num_step_acc_per_t": "acc_per_t",
                "num_steps_per_t": "num_steps_per_t"}


def _already_evaluated(log_path: str):
    done = set()
    if os.path.exists(log_path):
        with open(log_path) as f:
            for line in f:
                try:
                    done.add(int(line.split(":")[0]))
                except ValueError:
                    pass
    return done


def main(argv=None):
    if argv is not None:
        sys.argv = [sys.argv[0]] + list(argv)

    # load configs first so their flags exist, then restore the run's flags
    parse_flags()
    F = flags.FLAGS
    run_dir = F.checkpoint_dir
    assert run_dir, "--checkpoint_dir is required"

    flag_file = osp.join(run_dir, "flags.json")
    if osp.exists(flag_file):
        restored = json_load(flag_file)
        # eval-only flags always win; any flag given explicitly on the CLI
        # also wins over the run snapshot (same contract as the training
        # CLI's resume) — this is how eval-time A/Bs of a trained-in lever
        # work, e.g. --early_disc_logit_clamp 0 on a clamp-trained run
        drop = {"checkpoint_dir", "dataset", "every_nth_checkpoint",
                "eval_batch_size"}
        drop |= {n for n in restored
                 if n in getattr(flags.FLAGS, "_cli_set", set())}
        for key in drop:
            restored.pop(key, None)
        flags.FLAGS.restore({**flags.FLAGS.as_dict(), **restored})

    data_dict = load(F.data_config, F.eval_batch_size)
    imgs = data_dict["train_data"]["imgs"]
    mean_img = imgs.mean(tuple(range(imgs.ndim - 2)))

    batcher = data_dict[f"{F.dataset}_iter"]
    n_data = data_dict[f"{F.dataset}_data"]["imgs"].shape[1]
    n_batches = max(1, n_data // F.eval_batch_size)

    example = next(batcher)
    model = load(F.model_config, img=example["imgs"], num=example["nums"],
                 mean_img=mean_img)
    optimizer = make_optimizer("sgd", 0.0)
    state = init_train(model, optimizer, jax.random.PRNGKey(0), example["imgs"])
    eval_step = make_eval_step(model)

    ckpts = find_checkpoints(run_dir)
    steps = sorted(ckpts)[:: F.every_nth_checkpoint]
    print(f"Evaluating {len(steps)} checkpoints on '{F.dataset}' "
          f"({n_batches} batches each)")

    log_paths = {
        m: osp.join(run_dir, f"{METRIC_FILES[m]}_{F.dataset}.txt") for m in METRICS
    }
    done = _already_evaluated(log_paths["iwae"])

    for step_num in steps:
        if step_num in done:
            print(f"skipping {step_num} (already evaluated)")
            continue
        # params-only restore: evaluation must not depend on the saved
        # optimizer-state structure (lr schedules change it)
        params = restore_params(ckpts[step_num], state.params)

        totals = {m: 0.0 for m in METRICS}
        for _ in range(n_batches):
            batch = next(batcher)
            metrics = eval_step(params, jax.random.PRNGKey(1), batch["imgs"],
                                batch["nums"])
            for m in METRICS:
                # scalars and vectors ([T] per-frame accuracy) alike
                totals[m] = totals[m] + np.asarray(metrics.get(m, np.nan),
                                                   np.float64)
        for m in METRICS:
            totals[m] = totals[m] / n_batches
            v = totals[m]
            text = (" ".join(f"{x}" for x in v) if np.ndim(v) else f"{v}")
            with open(log_paths[m], "a") as f:
                f.write(f"{step_num}: {text}\n")

        def _fmt(v):
            return ("[" + " ".join(f"{x:.3f}" for x in v) + "]"
                    if np.ndim(v) else f"{v:.4f}")
        print(f"{step_num}: " + ", ".join(f"{m}={_fmt(totals[m])}" for m in METRICS))


if __name__ == "__main__":
    main()
