"""Config file for MLP-SQAIR on moving-MNIST.

Reference: sqair/configs/mlp_mnist_model.py — same flag surface; ``load``
returns a sqair_tpu Model (static wiring; params are initialised by the
caller).
"""
from __future__ import annotations

import numpy as np

from sqair_tpu.common_model_flags import get_params
from sqair_tpu.experiment import flags
from sqair_tpu.models import AIRDecoder, Model, SequentialAIR, SQAIRTimestep

flags.DEFINE_string("disc_prior_type", "cat",
                    "Prior for #discovery steps: {geom, cat}.")
flags.DEFINE_float("step_success_prob", 0.75,
                   "Step success prob for the geometric discovery prior.")
flags.DEFINE_float("disc_step_bias", 1.0,
                   "Added to the logit of discovering a new object.")
flags.DEFINE_float("prop_step_bias", 5.0,
                   "Added to the logit of propagating an existing object.")
flags.DEFINE_float("early_disc_step_bias", 0.0,
                   "Extra per-object prior cost (nats) on discovery counts "
                   "for frames t < early_disc_horizon; suppresses the "
                   "transient spurious early-frame discovery (0 = off).")
flags.DEFINE_integer("early_disc_horizon", 2,
                     "Frames the early discovery suppression applies to.")
flags.DEFINE_float("early_disc_logit_bias", 0.0,
                   "Subtracted from the discovery presence LOGIT (posterior "
                   "side, like disc_step_bias) for frames t < "
                   "early_disc_horizon; acts on inferred counts immediately "
                   "(0 = off).")
flags.DEFINE_float("transient_disc_penalty", 0.0,
                   "Weight of the transient-discovery penalty: expected "
                   "counts at frames t < early_disc_horizon in excess of "
                   "the stabilised count at t = horizon are charged this "
                   "many nats each (label-free, outside the ELBO; pair "
                   "with early_disc_logit_scale < 1).")
flags.DEFINE_float("transient_penalty_temp", 1.0,
                   "Temperature of the sigmoid inside the transient "
                   "penalty: sigma(logit/temp) keeps the penalty gradient "
                   "alive when q re-inflates its logits (1 = exact "
                   "expected counts).")
flags.DEFINE_float("early_disc_logit_scale", 1.0,
                   "Multiplies the discovery presence logit for frames "
                   "t < early_disc_horizon — desaturates q's early "
                   "discovery so VIMCO can retrain it (1 = off).")
flags.DEFINE_float("early_disc_logit_clamp", 0.0,
                   "Straight-through |logit| cap on the discovery presence "
                   "logit for frames t < early_disc_horizon (0 = off).")
flags.DEFINE_boolean("disc_coverage_signal", False,
                     "Feed the discovery steps predictor an "
                     "explained-so-far spatial signal: a low-res ST-crop "
                     "of a coverage canvas built from propagated boxes + "
                     "earlier same-frame discoveries (architectural fix "
                     "for the t=0 universal over-discovery; adds 16 "
                     "first-layer rows — warm-start old checkpoints via "
                     "tools/pad_coverage_params.py).")
flags.DEFINE_float("coverage_lr_mult", 1.0,
                   "Update multiplier for the 16 coverage input-rows of "
                   "the discovery steps predictor (stateless, checkpoint-"
                   "compatible per-row lr; requires --disc_coverage_signal; "
                   "1 = off). Lets zero-initialised coverage weights learn "
                   "at lr*mult while the rest of the model keeps the safe "
                   "fine-tune lr.")
flags.DEFINE_boolean("sample_from_prior", False,
                     "Sample from the prior instead of q.")
flags.DEFINE_boolean("rec_where_prior", True,
                     "Recurrent prior for where in discovery.")
flags.DEFINE_integer("generate_after", -1,
                     "Switch to generation after this frame (if >= 0).")


def parse_string_flag(flag, dtype=np.float32, sep=",", num_elements=-1):
    """(mlp_mnist_model.py:55-71)"""
    try:
        values = [dtype(f.strip()) for f in str(flag).split(sep)]
    except (ValueError, AttributeError):
        values = [np.float32(flag)]
    if len(values) == 1 and num_elements > 1:
        values = values * num_elements
    elif num_elements != -1 and len(values) != num_elements:
        raise ValueError(f'Incorrect number of elements in flag "{flag}"')
    return values


def load(img, coords=None, num=None, mean_img=None, debug=False,
         **param_overrides) -> Model:
    """:param img: [T, B, H, W] array (shapes only)
    :param mean_img: [H, W] array added as trainable background
    :param param_overrides: overrides for get_params() entries (used by
        config variants, e.g. the non-square pedestrian glimpse)
    """
    F = flags.FLAGS
    params = get_params()
    params.update(param_overrides)
    img = np.asarray(img)
    img_size = tuple(img.shape[2:4])

    timestep = SQAIRTimestep(
        n_steps=F.n_steps_per_image,
        img_size=img_size,
        glimpse_size=tuple(params["glimpse_size"]),
        n_what=F.n_what,
        n_hidden=params["n_hidden"],
        n_layers=params["n_layers"],
        steps_pred_hidden=tuple(params["steps_pred_hidden"]),
        transition=F.transition,
        time_transition=F.time_transition,
        prior_transition=F.prior_transition,
        transform_var_bias=F.transform_var_bias,
        disc_step_bias=F.disc_step_bias,
        prop_step_bias=F.prop_step_bias,
        prop_prior_step_bias=F.prop_prior_step_bias,
        prop_prior_type=F.prop_prior_type,
        step_success_prob=F.step_success_prob,
        disc_prior_type=F.disc_prior_type,
        rec_where_prior=F.rec_where_prior,
        early_disc_step_bias=F.early_disc_step_bias,
        early_disc_horizon=F.early_disc_horizon,
        early_disc_logit_bias=F.early_disc_logit_bias,
        early_disc_logit_scale=F.early_disc_logit_scale,
        early_disc_logit_clamp=F.early_disc_logit_clamp,
        disc_coverage_signal=F.disc_coverage_signal,
        scale_prior=tuple(parse_string_flag(F.scale_prior, float, num_elements=2)),
        masked_glimpse=F.masked_glimpse,
    )
    decoder = AIRDecoder(
        img_size=img_size,
        glimpse_size=tuple(params["glimpse_size"]),
        glimpse_n_hiddens=tuple(params["n_hiddens"]),
        glimpse_output_scale=F.output_scale,
        mean_img=None if mean_img is None else np.asarray(mean_img, np.float32),
        output_std=F.output_std,
    )
    seq = SequentialAIR(
        timestep, decoder,
        sample_from_prior=F.sample_from_prior,
        generate_after=F.generate_after,
    )
    return Model(seq, k_particles=F.k_particles, aspect_penalty=F.aspect_penalty,
                 transient_penalty=F.transient_disc_penalty,
                 transient_horizon=F.early_disc_horizon,
                 transient_temp=F.transient_penalty_temp)
