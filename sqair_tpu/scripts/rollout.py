"""Long-horizon conditional generation rollouts.

Reference capability: README:30's 100-step generalization rollouts,
produced by running the trained model with ``generate_after`` — the model
infers latents from the first k frames, then switches to sampling
(Δwhat, Δwhere, presence) from the learned propagation prior and rendering
(sqair/seq.py:198-203, sqair_modules.py:294-302).

Run:
    python -m sqair_tpu.scripts.rollout --checkpoint_dir results/run/1 \
        --data_config sqair_tpu/configs/synth_seq_mnist_data.py \
        --model_config sqair_tpu/configs/mlp_mnist_model.py \
        --rollout_len 100 --condition_frames 5

Writes rollout.npz (canvas [T,B,H,W], where logits, presence, obj ids) and
rollout.png (a frame strip) into the checkpoint dir (or --out_dir).
"""
from __future__ import annotations

import os
import sys

import jax

# Same escape hatch as scripts/eval.py: the axon sitecustomize overrides
# JAX_PLATFORMS via jax.config, so SQAIR_PLATFORM=cpu is the reliable way
# to keep a rollout off the chip while a training run holds it.
if os.environ.get("SQAIR_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SQAIR_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from sqair_tpu.experiment import flags
from sqair_tpu.experiment.experiment_tools import json_load, load, parse_flags
from sqair_tpu.models import Model
from sqair_tpu.training import latest_checkpoint, restore_params


flags.DEFINE_string("checkpoint_dir", "", "Run dir with checkpoints; empty = fresh params.")
flags.DEFINE_string("out_dir", "", "Output dir (default: checkpoint_dir or '.').")
flags.DEFINE_string("data_config", "sqair_tpu/configs/synth_seq_mnist_data.py", "")
flags.DEFINE_string("model_config", "sqair_tpu/configs/mlp_mnist_model.py", "")
flags.DEFINE_integer("rollout_len", 100, "Total frames to generate.")
flags.DEFINE_integer("condition_frames", 5, "Frames of inference before generation.")
flags.DEFINE_integer("n_examples", 8, "How many sequences to roll out.")
flags.DEFINE_integer("rollout_seed", 0, "")


def main(argv=None):
    if argv is not None:
        sys.argv = [sys.argv[0]] + list(argv)
    parse_flags()
    F = flags.FLAGS

    if F.checkpoint_dir:
        saved = json_load(os.path.join(F.checkpoint_dir, "flags.json"))
        if saved:
            # rollout-only flags always win; data/model config come from the
            # run snapshot unless explicitly overridden on the CLI
            keep_names = {"rollout_len", "condition_frames", "n_examples",
                          "rollout_seed", "checkpoint_dir", "out_dir"}
            keep_names |= {n for n in ("data_config", "model_config")
                           if n in getattr(flags.FLAGS, "_cli_set", set())}
            keep = {k: flags.FLAGS.as_dict()[k] for k in keep_names}
            flags.FLAGS.restore({**saved, **keep})
    parse_flags()

    data = load(F.data_config, F.n_examples)
    batch = next(iter(data["valid_iter"]))
    obs = np.asarray(batch["imgs"], np.float32)  # [T0, B, H, W]
    T0, B = obs.shape[:2]
    cond = min(F.condition_frames, T0)

    # pad observations with zeros beyond the conditioning window — in
    # generation mode the posterior samples are replaced by prior samples,
    # so the padded frames never influence the latents that are rendered
    T = F.rollout_len
    padded = np.zeros((T,) + obs.shape[1:], np.float32)
    padded[:cond] = obs[:cond]

    # model in generation mode after `cond` frames
    flags.FLAGS.sample_from_prior = True
    flags.FLAGS.generate_after = cond - 1
    mean_img = obs.mean(axis=(0, 1))
    model: Model = load(F.model_config, padded, None, None, mean_img)

    rng = jax.random.PRNGKey(F.rollout_seed)
    params = model.init(rng, jnp.asarray(padded))
    if F.checkpoint_dir:
        found = latest_checkpoint(F.checkpoint_dir)
        if found is None:
            raise FileNotFoundError(f"no checkpoints in {F.checkpoint_dir}")
        step, path = found
        params = restore_params(path, params)
        print(f"restored checkpoint at step {step}")

    fwd = jax.jit(lambda p, r, o: model.forward(p, r, o))
    out = fwd(params, jax.random.fold_in(rng, 1), jnp.asarray(padded))

    k = model.k_particles
    canvas = np.asarray(out["canvas"]).reshape((T, B, k) + obs.shape[2:])[:, :, 0]
    where = np.asarray(out["where"]).reshape((T, B, k) + out["where"].shape[2:])[:, :, 0]
    presence = np.asarray(out["presence"]).reshape((T, B, k, -1))[:, :, 0]
    obj_id = np.asarray(out["obj_id"]).reshape((T, B, k, -1))[:, :, 0]

    out_dir = F.out_dir or F.checkpoint_dir or "."
    os.makedirs(out_dir, exist_ok=True)
    npz_path = os.path.join(out_dir, "rollout.npz")
    np.savez_compressed(npz_path, canvas=canvas, where=where,
                        presence=presence, obj_id=obj_id,
                        conditioned=obs[:cond])
    print("wrote", npz_path)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n_show = min(8, B)
        cols = min(T, 16)
        stride = max(1, T // cols)
        fig, axes = plt.subplots(n_show, cols, figsize=(cols * 1.2, n_show * 1.3))
        axes = np.atleast_2d(axes)
        for r in range(n_show):
            for c in range(cols):
                t = c * stride
                ax = axes[r, c]
                ax.imshow(canvas[t, r], cmap="gray", vmin=0, vmax=1)
                ax.set_xticks([]), ax.set_yticks([])
                if r == 0:
                    ax.set_title(f"t={t}" + (" (gen)" if t >= cond else ""),
                                 fontsize=7)
        png_path = os.path.join(out_dir, "rollout.png")
        fig.savefig(png_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        print("wrote", png_path)
    except Exception as e:  # pragma: no cover
        print("figure skipped:", e)


if __name__ == "__main__":
    main()
