"""Pedestrian model config: non-square 32x12 glimpse (BASELINE config 5).

Same surface as mlp_mnist_model; only the glimpse aspect changes (SURVEY.md
§7 step 9: the reference's absent duke config specced by the MNIST config +
non-square glimpse 32x12, cf. sqair/scripts/experiment.py:79-83).
"""
from __future__ import annotations

from sqair_tpu.configs import mlp_mnist_model
from sqair_tpu.experiment import flags

flags.DEFINE_string("glimpse_hw", "32,12", "Non-square glimpse size h,w.")


def load(img, coords=None, num=None, mean_img=None, debug=False):
    gh, gw = (int(v) for v in flags.FLAGS.glimpse_hw.split(","))
    return mlp_mnist_model.load(
        img, coords, num, mean_img, debug, glimpse_size=[gh, gw],
    )
