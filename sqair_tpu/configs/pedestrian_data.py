"""Pedestrian-sequence data config (BASELINE config 5).

Non-square canvas + tall ~32x12 objects; same data_dict contract as
seq_mnist_data.py.  See sqair_tpu/data/pedestrian.py for provenance.
"""
from __future__ import annotations

import numpy as np

from sqair_tpu.data.mnist_tools import load as _load
from sqair_tpu.data.pedestrian import create_pedestrian_dataset
from sqair_tpu.experiment import flags

flags.DEFINE_integer("ped_train_samples", 2048, "#train sequences")
flags.DEFINE_integer("ped_valid_samples", 256, "#valid sequences")
flags.DEFINE_integer("ped_timesteps", 10, "sequence length")
flags.DEFINE_integer("ped_seed", 0, "dataset seed")
flags.DEFINE_string("ped_canvas", "64,48", "canvas size H,W")
flags.DEFINE_string("ped_obj", "32,12", "object size h,w")


def load(batch_size: int, n_timesteps=None):
    F = flags.FLAGS
    canvas = tuple(int(v) for v in F.ped_canvas.split(","))
    obj = tuple(int(v) for v in F.ped_obj.split(","))
    train = create_pedestrian_dataset(
        n_samples=F.ped_train_samples, n_timesteps=F.ped_timesteps,
        canvas_size=canvas, obj_size=obj, seed=F.ped_seed,
    )
    valid = create_pedestrian_dataset(
        n_samples=F.ped_valid_samples, n_timesteps=F.ped_timesteps,
        canvas_size=canvas, obj_size=obj, seed=F.ped_seed + 1,
    )
    for d in (train, valid):
        d["imgs"] = d["imgs"].astype(np.float32) / 255.0
        d["nums"] = d["nums"].astype(np.float32)
    return _load(batch_size, n_timesteps, train_data=train, valid_data=valid)
