"""Conv-SQAIR model config: ConvNet encoders + subpixel-conv decoder.

The reference ships the conv primitives (sqair/neural.py:118-198) but no
conv config; this completes the model family.  Same flag surface as
mlp_mnist_model plus conv-specific knobs.
"""
from __future__ import annotations

import numpy as np

from sqair_tpu.common_model_flags import get_params
from sqair_tpu.configs import mlp_mnist_model
from sqair_tpu.configs.mlp_mnist_model import parse_string_flag
from sqair_tpu.experiment import flags
from sqair_tpu.models import AIRDecoder, Model, SequentialAIR, SQAIRTimestep

flags.DEFINE_integer("conv_kernel", 3, "Conv kernel size.")
flags.DEFINE_string("conv_channels", "32,64", "Channels per conv layer.")


def load(img, coords=None, num=None, mean_img=None, debug=False) -> Model:
    F = flags.FLAGS
    params = get_params()
    img = np.asarray(img)
    img_size = tuple(img.shape[2:4])
    channels = tuple(int(c) for c in F.conv_channels.split(","))

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
        scale_prior=tuple(parse_string_flag(F.scale_prior, float, num_elements=2)),
        masked_glimpse=F.masked_glimpse,
        encoder_type="conv",
        conv_channels=channels,
        conv_kernel=F.conv_kernel,
    )
    decoder = AIRDecoder(
        img_size=img_size,
        glimpse_size=tuple(params["glimpse_size"]),
        glimpse_n_hiddens=tuple(params["n_hiddens"]),
        glimpse_output_scale=F.output_scale,
        mean_img=None if mean_img is None else np.asarray(mean_img, np.float32),
        output_std=F.output_std,
        decoder_type="subpixel",
    )
    seq = SequentialAIR(
        timestep, decoder,
        sample_from_prior=F.sample_from_prior,
        generate_after=F.generate_after,
    )
    return Model(seq, k_particles=F.k_particles, aspect_penalty=F.aspect_penalty)
