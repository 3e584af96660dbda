"""Stress-variant data config: 30%-smaller digits (BASELINE config 4).

Font-rendered digit glyphs at obj_size 20 (~70% of the default 28), cf.
reference README:44-51 ("reducing the size of the digits by about 30%
requires retuning hyperparameters").  Pair with
``small_digit_mnist_model.py`` which shifts those defaults.
"""
from __future__ import annotations

from sqair_tpu.configs.font_seq_mnist_data import load as _font_load
from sqair_tpu.experiment import flags

# module level so the retune is active at parse time and lands in the
# run's flags.json snapshot (resume/eval/rollout rebuild the same data)
flags.set_default("font_obj_size", 20)


def load(batch_size: int, n_timesteps=None):
    return _font_load(batch_size, n_timesteps)
