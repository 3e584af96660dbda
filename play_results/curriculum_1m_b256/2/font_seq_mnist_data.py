"""Data config: moving sequences of font-rendered digit glyphs.

The closest MNIST stand-in available without network access: real digit
shapes (matplotlib glyph rendering with scale/rotation/weight jitter)
moved by the reference's trajectory dynamics.  Same data_dict contract as
seq_mnist_data.py.  Use for quality-gate training where the stroke-blob
generator is too far from MNIST statistics.
"""
from __future__ import annotations

import numpy as np

import sqair_tpu.common_model_flags  # noqa: F401  (registers output_std)
from sqair_tpu.data import create_seq_dataset
from sqair_tpu.data.mnist_tools import load as _load
from sqair_tpu.data.synthetic import make_font_digit_bank
from sqair_tpu.experiment import flags

flags.DEFINE_integer("font_train_samples", 2048, "#train sequences")
flags.DEFINE_integer("font_valid_samples", 256, "#valid sequences")
flags.DEFINE_integer("font_timesteps", 10, "sequence length")
flags.DEFINE_integer("font_seed", 0, "dataset seed")
flags.DEFINE_integer("font_bank_size", 256, "#distinct digit glyphs")
flags.DEFINE_integer("font_obj_size", 28, "digit size in pixels")

# same rationale as synth_seq_mnist_data.py: retune the likelihood width
# for the synthetic contrast (cf. reference README:44-51)
flags.set_default("output_std", 0.15)


def load(batch_size: int, n_timesteps=None):
    F = flags.FLAGS
    bank, _ = make_font_digit_bank(F.font_bank_size, F.font_obj_size,
                                   seed=F.font_seed)
    obj = (F.font_obj_size, F.font_obj_size)
    train = create_seq_dataset(
        n_samples=F.font_train_samples, n_timesteps=F.font_timesteps,
        obj_size=obj, seed=F.font_seed, templates=bank,
    )
    valid = create_seq_dataset(
        n_samples=F.font_valid_samples, n_timesteps=F.font_timesteps,
        obj_size=obj, seed=F.font_seed + 1, templates=bank,
    )
    for d in (train, valid):
        d["imgs"] = d["imgs"].astype(np.float32) / 255.0
        d["nums"] = d["nums"].astype(np.float32)
    return _load(batch_size, n_timesteps, train_data=train, valid_data=valid)
