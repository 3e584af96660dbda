"""Interactive exploration script — the reference's notebooks/play.ipynb.

Loads a trained run (or trains a tiny model on the fly with --quick_train),
evaluates the reference metric set on the validation split, and renders
reconstruction figures with per-object-ID colored boxes.

Usage:
    # explore an existing run
    python notebooks/play.py --checkpoint_dir results/multi_mnist/1

    # no checkpoint handy: 200-iteration smoke model, then plots
    python notebooks/play.py --quick_train

The reference notebook sets the curriculum stage by assigning global_step
(cell 13); here the equivalent is --seq_len, resolved through the same
curriculum helper the training loop uses.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from sqair_tpu.eval_tools import ProgressFig
from sqair_tpu.experiment import flags
from sqair_tpu.experiment.experiment_tools import json_load, load, parse_flags
from sqair_tpu.training import latest_checkpoint, restore_params
from sqair_tpu.training.train import init_train, make_eval_step, make_optimizer

flags.DEFINE_string("checkpoint_dir", "", "Run dir (…/run_name/<n>).")
flags.DEFINE_string("play_data_config", "sqair_tpu/configs/synth_seq_mnist_data.py", "")
flags.DEFINE_string("play_model_config", "sqair_tpu/configs/mlp_mnist_model.py", "")
flags.DEFINE_string("fig_dir", "play_figs", "Where to write figures.")
flags.DEFINE_integer("play_batch_size", 16, "")
flags.DEFINE_integer("eval_batches", 4, "")
flags.DEFINE_boolean("quick_train", False,
                     "Train a tiny model for 200 iters before exploring.")


def main(argv=None):
    if argv is not None:
        sys.argv = [sys.argv[0]] + list(argv)
    parse_flags()
    F = flags.FLAGS

    if F.quick_train:
        from sqair_tpu.scripts import experiment

        logdir, state = experiment.main(["--test_run", "--results_dir=play_results"])
        F.checkpoint_dir = logdir
        # test_run rewrote shared flags; re-point the play configs at it
        F.play_data_config = F.data_config
        F.play_model_config = F.model_config

    if F.checkpoint_dir:
        saved = json_load(os.path.join(F.checkpoint_dir, "flags.json"))
        if saved:
            keep = ("checkpoint_dir", "fig_dir", "play_batch_size",
                    "eval_batches", "play_data_config", "play_model_config",
                    "quick_train")
            cur = flags.FLAGS.as_dict()
            flags.FLAGS.restore({**saved, **{k: cur[k] for k in keep}})
            # follow the run's configs unless explicitly overridden
            cli = getattr(flags.FLAGS, "_cli_set", set())
            if "play_data_config" not in cli and "data_config" in saved:
                F.play_data_config = saved["data_config"]
            if "play_model_config" not in cli and "model_config" in saved:
                F.play_model_config = saved["model_config"]
    parse_flags()

    # data + model exactly as the training graph (same configs)
    data = load(F.play_data_config, F.play_batch_size)
    train_imgs = data["train_data"]["imgs"]
    mean_img = train_imgs.mean(tuple(range(train_imgs.ndim - 2)))
    batch = next(data["valid_iter"])
    model = load(F.play_model_config, img=batch["imgs"], mean_img=mean_img)

    rng = jax.random.PRNGKey(0)
    optimizer = make_optimizer("rmsprop", 1e-5)
    state = init_train(model, optimizer, rng, batch["imgs"])
    if F.checkpoint_dir:
        found = latest_checkpoint(F.checkpoint_dir)
        if found:
            step, path = found
            state.params = restore_params(path, state.params)
            print(f"restored step {step} from {path}")

    # ---- metrics over a few validation batches (eval_tools.py:245-266 set)
    eval_step = make_eval_step(model)
    acc = {}
    for i in range(F.eval_batches):
        b = next(data["valid_iter"])
        m = eval_step(state.params, jax.random.fold_in(rng, i),
                      b["imgs"], b["nums"])
        for k, v in m.items():
            # per-timestep metrics (num_step_acc_per_t, …) are vectors
            acc.setdefault(k, []).append(np.asarray(v))
    print("validation metrics:")
    for k in sorted(acc):
        mean = np.mean(np.stack(acc[k]), axis=0)
        if mean.ndim:
            body = " ".join(f"{x:.3f}" for x in mean)
            print(f"  {k:24s} [{body}]")
        else:
            print(f"  {k:24s} {mean:12.5g}")

    # ---- figures with per-object-ID colored boxes
    from sqair_tpu.common_model_flags import get_params

    def render_fn(obs, nums):
        _, aux = model.loss_and_metrics(state.params, jax.random.PRNGKey(2),
                                        obs, nums)
        return aux["render"]

    fig = ProgressFig(render_fn, F.fig_dir, img_size=mean_img.shape,
                      glimpse_size=get_params()["glimpse_size"],
                      seq_n_samples=4)
    fig.plot_all("play", next(data["valid_iter"]))
    print(f"figures written to {F.fig_dir}/")


if __name__ == "__main__":
    main()
