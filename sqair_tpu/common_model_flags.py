"""Common flags used by model configurations.

Reference: sqair/common_model_flags.py (same names, same defaults).
"""
from __future__ import annotations

from sqair_tpu.experiment import flags

flags.DEFINE_float("transform_var_bias", -3.0,
                   "Bias added to the variance logit of Gaussian `where` distributions.")
flags.DEFINE_float("output_scale", 0.25,
                   "Scales the output mean of the glimpse decoder.")
flags.DEFINE_string("scale_prior", "-2",
                    "One float or four comma-separated floats: mean of the "
                    "Gaussian prior for the scale logit.")
flags.DEFINE_integer("glimpse_size", 20, "Glimpse size.")

flags.DEFINE_float("prop_prior_step_bias", 10.0, "")
flags.DEFINE_string("prop_prior_type", "rnn",
                    "Choose from {rnn, rw, guided}.")
flags.DEFINE_boolean("masked_glimpse", True,
                     "Masks glimpses based on the temporal state in propagation.")

flags.DEFINE_integer("k_particles", 5, "Number of IWAE particles.")
flags.DEFINE_integer("n_steps_per_image", 3, "Number of inference steps per frame.")

flags.DEFINE_string("transition", "VanillaRNN",
                    "RNN cell for discovery and propagation cores.")
flags.DEFINE_string("time_transition", "GRU", "RNN cell for the temporal rnn.")
flags.DEFINE_string("prior_transition", "GRU", "RNN cell for the propagation prior.")

flags.DEFINE_float("output_std", 0.3, "Std dev of Gaussian p(x|z).")

flags.DEFINE_integer("n_units", 8, "Hidden width in units of 32 neurons (8 -> 256).")
flags.DEFINE_integer("n_what", 50, "Dimensionality of `what` variables.")

flags.DEFINE_float("aspect_penalty", 0.0,
                   "Weight of a squared-log-aspect-ratio penalty on present "
                   "glimpses (discourages degenerate narrow boxes, e.g. the "
                   "conv family carving one glyph into vertical slivers — "
                   "docs/NOTES.md). 0 disables. New vs the reference: it has "
                   "no such regulariser.")


def get_params():
    """(common_model_flags.py:59-71) — same values, sane types."""
    F = flags.FLAGS
    n_hidden = 32 * F.n_units
    return dict(
        glimpse_size=[F.glimpse_size] * 2,
        n_hidden=n_hidden,
        n_layers=2,
        n_hiddens=[n_hidden] * 2,
        steps_pred_hidden=[n_hidden // 2],
    )
