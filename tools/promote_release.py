"""Promote a trained run to a release artifact.

Reference ships `release_models/mnist_mlp/1/` (flags.json + trained
checkpoint, fetched by scripts/download_models.sh).  This tool builds the
equivalent from a local run dir: a params-only checkpoint (no optimizer
state — restorable regardless of schedule/optimizer changes) plus the
run's flags.json snapshot.

Usage:
    python tools/promote_release.py --run_dir play_results/font_long/1 \
        --out release_models/mnist_mlp/1 [--step 60000]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import orbax.checkpoint as ocp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step (default: latest)")
    args = ap.parse_args()

    from sqair_tpu.experiment import flags
    from sqair_tpu.experiment.experiment_tools import json_load, load, parse_flags
    from sqair_tpu.training import (
        find_checkpoints,
        init_train,
        make_optimizer,
        restore_params,
    )

    parse_flags()
    restored = json_load(os.path.join(args.run_dir, "flags.json"))
    flags.FLAGS.restore({**flags.FLAGS.as_dict(), **restored})
    F = flags.FLAGS

    ckpts = find_checkpoints(args.run_dir)
    step = args.step if args.step is not None else max(ckpts)
    src = ckpts[step]
    print(f"promoting {src}")

    data_dict = load(F.data_config, F.batch_size)
    imgs = data_dict["train_data"]["imgs"]
    mean_img = imgs.mean(tuple(range(imgs.ndim - 2)))
    example = next(data_dict["valid_iter"])
    model = load(F.model_config, img=example["imgs"], num=example["nums"],
                 mean_img=mean_img)
    state = init_train(model, make_optimizer("sgd", 0.0),
                       jax.random.PRNGKey(0), example["imgs"])
    params = restore_params(src, state.params)
    params = jax.tree_util.tree_map(np.asarray, params)

    out_ckpt = os.path.abspath(os.path.join(args.out, f"ckpt-{step}"))
    if os.path.exists(out_ckpt):
        shutil.rmtree(out_ckpt)
    ck = ocp.StandardCheckpointer()
    ck.save(out_ckpt, {"params": params, "step": np.asarray(step)}, force=True)
    ck.wait_until_finished()

    with open(os.path.join(args.out, "flags.json"), "w") as f:
        json.dump(restored, f, indent=4, sort_keys=True)
        f.write("\n")
    print(f"release artifact at {args.out} (ckpt-{step} + flags.json)")


if __name__ == "__main__":
    main()
