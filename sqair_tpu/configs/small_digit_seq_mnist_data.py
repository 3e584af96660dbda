"""Stress-variant data config: 30%-smaller digits (BASELINE config 4).

Same pipeline as synth_seq_mnist_data.py with obj_size 20 (~70% of 28),
cf. reference README:44-51.  Uses the native C++ generator when built.
"""
from __future__ import annotations

import numpy as np

from sqair_tpu.configs.synth_seq_mnist_data import load as _synth_load
from sqair_tpu.experiment import flags


def load(batch_size: int, n_timesteps=None):
    flags.set_default("synth_obj_size", 20)
    return _synth_load(batch_size, n_timesteps)
