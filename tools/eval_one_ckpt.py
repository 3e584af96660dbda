"""One-off: print the per-frame metric breakdown for a single checkpoint.

Usage:
    SQAIR_PLATFORM=cpu python tools/eval_one_ckpt.py <run_dir> <step> \
        [n_batches] [json-flag-overrides]

Prints per-t accuracy and per-t inferred counts — used to drive the
round-5 early-frame discovery probes (docs/NOTES.md).  The optional 4th
arg is a JSON dict of flag overrides applied AFTER the run's flags.json
restore, e.g. '{"early_disc_step_bias": 1.0}' — evaluates the checkpoint
under a modified prior (the lever re-weights particles immediately, no
retraining needed to measure its sign).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("SQAIR_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SQAIR_PLATFORM"])

import numpy as np


def main():
    run_dir, step_num = sys.argv[1], int(sys.argv[2])
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    overrides = {}
    if len(sys.argv) > 4:
        import json

        overrides = json.loads(sys.argv[4])

    from sqair_tpu.experiment import flags
    from sqair_tpu.experiment.experiment_tools import json_load, load, parse_flags
    from sqair_tpu.training import find_checkpoints, restore_params
    from sqair_tpu.training.train import init_train, make_eval_step, make_optimizer

    sys.argv = [sys.argv[0]]
    parse_flags()
    restored = json_load(os.path.join(run_dir, "flags.json"))
    flags.FLAGS.restore({**flags.FLAGS.as_dict(), **restored, **overrides})
    F = flags.FLAGS

    data_dict = load(F.data_config, 32)
    imgs = data_dict["train_data"]["imgs"]
    mean_img = imgs.mean(tuple(range(imgs.ndim - 2)))
    batcher = data_dict["valid_iter"]
    example = next(batcher)
    model = load(F.model_config, img=example["imgs"], num=example["nums"],
                 mean_img=mean_img)
    state = init_train(model, make_optimizer("sgd", 0.0),
                       jax.random.PRNGKey(0), example["imgs"])
    eval_step = make_eval_step(model)
    params = restore_params(find_checkpoints(run_dir)[step_num], state.params)

    totals = {}
    for _ in range(n_batches):
        b = next(batcher)
        m = eval_step(params, jax.random.PRNGKey(1), b["imgs"], b["nums"])
        for k, v in m.items():
            totals[k] = totals.get(k, 0.0) + np.asarray(v, np.float64)
    for k in sorted(totals):
        v = totals[k] / n_batches
        if np.ndim(v):
            print(f"{k}: " + " ".join(f"{x:.4f}" for x in v))
        else:
            print(f"{k}: {v:.5f}")


if __name__ == "__main__":
    main()
