"""One-off diagnostic: the distribution of discovery presence LOGITS at
early frames, to size the round-5 early-discovery lever.

The eval-time tilt sweep showed an offset of -4 flips almost no presence
samples at t<=1, i.e. the spurious early discoveries are sampled from a
saturated Bernoulli.  Saturation also explains why the #steps-prior ramp
(early_disc_step_bias) trains slowly: with all k particles sampling
presence=1 identically, VIMCO's leave-one-out baseline sees zero variance
in that variable and passes no preference gradient.  This tool measures
how deep the saturation is: it prints, per early frame, the logit
quantiles of the kept (presence=1) discovery slots split by scenes whose
inferred count is correct vs too high.

Usage:
    SQAIR_PLATFORM=cpu python tools/diag_presence_logits.py <run_dir> <step>
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

    from sqair_tpu.experiment import flags
    from sqair_tpu.experiment.experiment_tools import json_load, load, parse_flags
    from sqair_tpu.training import find_checkpoints, restore_params
    from sqair_tpu.training.train import init_train, make_optimizer

    sys.argv = [sys.argv[0]]
    parse_flags()
    restored = json_load(os.path.join(run_dir, "flags.json"))
    flags.FLAGS.restore({**flags.FLAGS.as_dict(), **restored})
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
    params = restore_params(find_checkpoints(run_dir)[step_num], state.params)

    b = next(batcher)
    out = model.forward(params, jax.random.PRNGKey(1), b["imgs"],
                        record_mode="full")
    # [T, B*k, S] after the record squeeze
    logit = np.asarray(out["presence_logit"])
    pres = np.asarray(out["presence"])
    # true counts per scene: b["nums"] is [T, B, S+1] presence indicators;
    # tiled index = b*k + particle (ops/indexing.py tile_input_for_iwae)
    nums = np.asarray(b["nums"]).sum(-1)  # [T, B]
    k = logit.shape[1] // nums.shape[1]
    nums_tiled = np.repeat(nums, k, axis=1)

    inferred = pres.sum(-1)  # [T, B*k]
    print(f"record shapes: logit {logit.shape}, presence {pres.shape}, "
          f"true nums {nums.shape} (k={k})")
    qs = [5, 25, 50, 75, 95]
    for t in range(min(3, logit.shape[0])):
        kept = pres[t] > 0.5
        over = (inferred[t] > nums_tiled[t])[:, None] & kept
        ok = (inferred[t] == nums_tiled[t])[:, None] & kept
        lo, lk = logit[t][over], logit[t][ok]
        print(f"\nt={t}: kept slots {kept.sum()}, on-count scenes' kept "
              f"logits n={lk.size}, over-count scenes' kept logits n={lo.size}")
        if lk.size:
            print("  on-count  q" + str(qs) + ": "
                  + " ".join(f"{v:8.2f}" for v in np.percentile(lk, qs)))
        if lo.size:
            print("  over-count q" + str(qs) + ": "
                  + " ".join(f"{v:8.2f}" for v in np.percentile(lo, qs)))
            print(f"  over-count min {lo.min():.2f} max {lo.max():.2f}")
        dropped = (~kept) & (np.abs(logit[t]) > 1e-6)
        if dropped.sum():
            ld = logit[t][dropped]
            print("  dropped    q" + str(qs) + ": "
                  + " ".join(f"{v:8.2f}" for v in np.percentile(ld, qs)))


if __name__ == "__main__":
    main()
