"""Release artifact restore (release_models/mnist_mlp/1).

Reference ships release_models/mnist_mlp/1 (flags.json + trained ckpt,
notebooks/play.ipynb cell 13 restores it).  Ours is committed in-repo
(no network): a params-only 60k-iter checkpoint.  Contract: the artifact
restores into a model built from its own flags.json snapshot and still
detects/counts objects (num_step_accuracy well above chance) on freshly
generated data from the same config family.
"""
import json
import os

import numpy as np
import pytest

RELEASE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "release_models", "mnist_mlp", "1")


def test_artifact_layout():
    assert os.path.exists(os.path.join(RELEASE, "flags.json"))
    ckpts = [d for d in os.listdir(RELEASE) if d.startswith("ckpt-")]
    assert ckpts, "no checkpoint in release_models/mnist_mlp/1"
    with open(os.path.join(RELEASE, "flags.json")) as f:
        saved = json.load(f)
    # the reference release run's headline hyperparameters
    assert saved["k_particles"] == 5
    assert saved["n_steps_per_image"] == 3


@pytest.mark.slow
def test_restore_and_eval():
    import jax

    from sqair_tpu.experiment import flags
    from sqair_tpu.experiment.experiment_tools import json_load, load, parse_flags
    from sqair_tpu.training import (
        init_train,
        latest_checkpoint,
        make_eval_step,
        make_optimizer,
        restore_params,
    )

    parse_flags()
    saved = json_load(os.path.join(RELEASE, "flags.json"))
    flags.FLAGS.restore({**flags.FLAGS.as_dict(), **saved})
    F = flags.FLAGS
    # shrink the dataset (eval only needs a couple of batches)
    F.font_train_samples = 64
    F.font_valid_samples = 64
    F.batch_size = 16

    data = load(F.data_config, F.batch_size)
    imgs = data["train_data"]["imgs"]
    mean_img = imgs.mean(tuple(range(imgs.ndim - 2)))
    batch = next(data["valid_iter"])
    model = load(F.model_config, img=batch["imgs"], num=batch["nums"],
                 mean_img=mean_img)

    state = init_train(model, make_optimizer("sgd", 0.0),
                       jax.random.PRNGKey(0), batch["imgs"])
    step, path = latest_checkpoint(RELEASE)
    params = restore_params(path, state.params)
    assert step >= 722000  # round-5 artifact (transient-penalty run)

    eval_step = make_eval_step(model)
    m = eval_step(params, jax.random.PRNGKey(1), batch["imgs"], batch["nums"])
    acc = float(m["num_step_accuracy"])
    mse = float(m["mse"])
    assert np.isfinite(float(m["iwae"]))
    # trained release model: high count accuracy, low reconstruction error
    # (acc_valid.txt: 0.9355 at 722k; one 32-scene batch has sd ~0.014)
    assert acc > 0.88, f"restored model count accuracy {acc}"
    assert mse < 0.02, f"restored model mse {mse}"
