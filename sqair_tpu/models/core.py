"""Per-object inference cores for discovery and propagation.

Reference: sqair/core.py.  Each core implements ONE slot step; the slot
unroll lives in Discover/Propagate (reference uses tf.nn.static_rnn).

The per-frame image encoding is hoisted out of the slot loop (the reference
recomputes ``input_encoder(img)`` for every slot — same math, wasted FLOPs).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.layers import MLP, state_feature
from ..nn.stochastic import (
    AffineDiagNormal,
    GaussianFromParamVec,
    StepsPredictor,
    StochasticTransformParam,
)
from ..ops import distributions as D
from ..ops import stn

# canonical per-slot output field order (reference DiscoveryCore._output_names,
# core.py:152) — also the merge order in the timestep module
HIDDEN_OUTPUT_FIELDS = (
    "what",
    "what_loc",
    "what_scale",
    "where",
    "where_loc",
    "where_scale",
    "presence_prob",
    "presence",
    "presence_logit",
)


def coverage_paste(coverage, coords, presence, glimpse_size):
    """Max-composites presence-weighted all-ones box pastes onto a canvas.

    The paste of a glimpse of ones factorises into the rank-1 outer
    product of the inverse-ST matrices' row sums (ops/stn.py
    paste_matrices), so claiming a box costs two tiny matvecs — no
    decoder, no gather.

    :param coverage: [B, H, W]
    :param coords: [B, 4] or slotted [B, S, 4] forward-crop ST coords
    :param presence: [B, 1] or [B, S, 1]
    :return: [B, H, W] updated canvas in [0, 1]
    """
    H, W = coverage.shape[-2:]
    uy, ux = stn.paste_matrices(coords, glimpse_size, (H, W))
    box = jnp.minimum(uy.sum(-1)[..., :, None] * ux.sum(-1)[..., None, :], 1.0)
    box = box * presence[..., None]
    if box.ndim == coverage.ndim + 1:  # slotted: compose over S
        box = jnp.max(box, -3)
    return jnp.maximum(coverage, box)


class DiscoveryCore(nn.Module):
    """One discovery step for one new object (core.py:147-227)."""

    img_size: Sequence[int]
    glimpse_size: Sequence[int]
    n_what: int
    transition: nn.Module  # RNN cell
    input_encoder: nn.Module  # Encoder over the flat image
    glimpse_encoder: nn.Module  # AIREncoder
    transform_estimator: nn.Module  # StochasticTransformParam
    steps_predictor: nn.Module  # StepsPredictor
    # Explained-so-far spatial signal for the steps predictor (round-5
    # architectural lever, docs/NOTES.md "t=0 residual"): the discovery
    # steps predictor additionally sees a COVERAGE_RES x COVERAGE_RES
    # ST-crop of a canvas marking regions already claimed by propagated
    # objects and earlier discovery slots of the same frame.  At t>0
    # propagation conditioning provides "already explained" temporally;
    # at t=0 nothing does — this supplies it spatially.  Default off:
    # the state pytree and the param tree are unchanged unless enabled,
    # and a flag-off checkpoint warm-starts function-preserving via
    # tools/pad_coverage_params.py (the new first-layer rows zero-pad).
    coverage_signal: bool = False
    COVERAGE_RES = 4

    def encode_img(self, img):
        flat = img.reshape((img.shape[0], -1))
        return self.input_encoder(flat)

    def initial_state(self, img, encoded_img, coverage=None):
        batch_size = img.shape[0]
        what = jnp.zeros((batch_size, self.n_what))
        where = jnp.zeros((batch_size, 4))
        presence = jnp.ones((batch_size, 1))  # discovery starts "present"
        rnn_state = self.transition.initial_state(batch_size)
        state = dict(
            img=img, encoded_img=encoded_img, what=what, where=where,
            presence=presence, rnn_state=rnn_state,
        )
        if self.coverage_signal:
            if coverage is None:
                coverage = jnp.zeros(img.shape)  # [B, H, W]
            state["coverage"] = coverage
        return state

    def __call__(self, rng, state, conditioning,
                 extra_steps_logit=0.0, steps_logit_scale=1.0,
                 steps_logit_clamp=None) -> Tuple[Dict, Dict]:
        """One slot step.

        :param state: dict from initial_state / previous step
        :param conditioning: [B, d] summary of propagated latents (+ the
            unused is_allowed flag in the reference, which we drop: it is
            destructured but never read by the reference cell, core.py:192)
        :param extra_steps_logit: additive presence-logit offset (traced
            scalar; Discover's early-frame suppression)
        :param steps_logit_scale / steps_logit_clamp: presence-logit
            desaturation (traced scalars; Discover's early-frame levers)
        :return: (outputs dict with HIDDEN_OUTPUT_FIELDS, new state)
        """
        img, encoded_img = state["img"], state["encoded_img"]
        rngs = jax.random.split(rng, 3)

        rnn_inpt = jnp.concatenate(
            [encoded_img, conditioning, state["what"], state["where"], state["presence"]],
            -1,
        )
        rnn_state, hidden_output = self.transition(state["rnn_state"], rnn_inpt)

        # where ~ Normal(loc, softplus(scale)+1e-2) over logits (core.py:220-227)
        where_loc, where_scale_logit = self.transform_estimator(hidden_output)
        where_scale = jax.nn.softplus(where_scale_logit) + 1e-2
        where = D.Normal(where_loc, where_scale).sample(rngs[0])

        # what from the glimpse at `where` (core.py:216-218)
        what_distrib, _ = self.glimpse_encoder(img, where)
        what = what_distrib.sample(rngs[1])

        # explained-so-far crop: the coverage canvas resampled over the
        # candidate box at COVERAGE_RES (same separable-matmul ST as the
        # glimpse crop — the low output resolution IS the pooling)
        cov_feats = ()
        if self.coverage_signal:
            coords = stn.to_coords(where)
            cov = stn.extract_glimpse(
                state["coverage"], coords,
                (self.COVERAGE_RES, self.COVERAGE_RES))
            cov_feats = (cov.reshape(cov.shape[0], -1),)

        # presence with monotone stopping (core.py:141-144)
        pres_distrib = self.steps_predictor(state["presence"], None,
                                            hidden_output, what, *cov_feats,
                                            extra_logit=extra_steps_logit,
                                            logit_scale=steps_logit_scale,
                                            logit_clamp=steps_logit_clamp)
        presence = pres_distrib.sample(rngs[2]) * state["presence"]

        outputs = dict(
            what=what,
            what_loc=what_distrib.loc,
            what_scale=what_distrib.scale,
            where=where,
            where_loc=where_loc,
            where_scale=where_scale,
            presence_prob=pres_distrib.probs,
            presence=presence,
            presence_logit=pres_distrib.logits,
        )
        new_state = dict(
            img=img, encoded_img=encoded_img, what=what, where=where,
            presence=presence, rnn_state=rnn_state,
        )
        if self.coverage_signal:
            # claim the box: the all-ones paste factorises into the rank-1
            # outer product of the paste matrices' row sums (cf. ops/stn.py
            # paste_matrices); max-composite, weighted by sampled presence
            new_state["coverage"] = coverage_paste(
                state["coverage"], coords, presence, self.glimpse_size)
        return outputs, new_state


class PropagationCore(nn.Module):
    """One propagation step for one existing object (core.py:230-359)."""

    img_size: Sequence[int]
    glimpse_size: Sequence[int]
    n_what: int
    transition: nn.Module
    input_encoder: nn.Module  # unused in the hot path but kept for parity
    glimpse_encoder: nn.Module  # AIREncoder (shared with discovery)
    transform_estimator: nn.Module
    steps_predictor: nn.Module
    temporal_cell: nn.Module
    where_update_scale: float = 1.0  # non-trainable in the reference

    def setup(self):
        self._where_bias_mlp = MLP([128], n_out=4)
        self._where_distrib = AffineDiagNormal(4)
        self._temporal_what_distrib = GaussianFromParamVec(self.n_what)
        self._gates = MLP(
            [], n_out=3 * self.n_what, transfer=jax.nn.sigmoid,
            output_bias_init=nn.initializers.constant(1.0),
        )

    def initial_state(self, img):
        batch_size = img.shape[0]
        return dict(
            img=img,
            what=jnp.zeros((batch_size, self.n_what)),
            where=jnp.zeros((batch_size, 4)),
            presence=jnp.zeros((batch_size, 1)),  # propagation starts "absent"
            rnn_state=self.transition.initial_state(batch_size),
        )

    def __call__(self, rng, state, z_tm1, temporal_hidden_state) -> Tuple[Dict, Dict, Tuple]:
        """One slot step.

        :param state: explaining-away state (previous object, same frame)
        :param z_tm1: (what, where, presence, presence_logit) for this
            object at the previous frame, each [B, d]
        :param temporal_hidden_state: temporal RNN state tuple for this object
        :return: (outputs dict incl. what_sample/where_sample, new state,
            new temporal state)
        """
        what_tm1, where_tm1, presence_tm1, presence_logit_tm1 = z_tm1
        temporal_state = state_feature(temporal_hidden_state)
        img = state["img"]
        rngs = jax.random.split(rng, 3)

        # glimpse at biased previous location feeds the transition (291-293)
        where_bias = self._where_bias_mlp(temporal_state) * 0.1
        glimpse_distrib, _ = self.glimpse_encoder(
            img, where_tm1 + where_bias, mask_inpt=temporal_state
        )
        rnn_inpt = jnp.concatenate(
            [
                glimpse_distrib.loc,  # img features
                state["what"], state["where"], state["presence"],  # explaining away
                what_tm1, where_tm1, presence_tm1, temporal_state,  # previous state
            ],
            -1,
        )
        rnn_state, hidden_output = self.transition(state["rnn_state"], rnn_inpt)

        # where: relative update with full-covariance posterior (321-333)
        inpt = jnp.concatenate([hidden_output, where_tm1, temporal_state], -1)
        loc_update, scale_logit = self.transform_estimator(inpt)
        where_loc = where_tm1 + self.where_update_scale * loc_update
        where_scale = jax.nn.softplus(scale_logit - 1.0) + 1e-2
        where_posterior = self._where_distrib(where_loc, where_scale)
        where_sample = where_posterior.sample(rngs[0])
        where = where_sample

        # what: gated fusion of previous, glimpse and temporal-prior (335-359)
        what_distrib_glimpse, _ = self.glimpse_encoder(img, where, mask_inpt=temporal_state)
        g_loc, g_scale = what_distrib_glimpse.loc, what_distrib_glimpse.scale

        temporal_inpt = jnp.concatenate([hidden_output, where, g_loc, g_scale], -1)
        temporal_hidden_state, temporal_output = self.temporal_cell(
            temporal_hidden_state, temporal_inpt
        )
        temporal_distrib = self._temporal_what_distrib(temporal_output)

        gates = self._gates(temporal_output) * 0.9999
        forget_gate, input_gate, temporal_gate = jnp.split(gates, 3, -1)
        what_loc = (
            forget_gate * what_tm1
            + (1.0 - input_gate) * g_loc
            + (1.0 - temporal_gate) * temporal_distrib.loc
        )
        what_scale = (1.0 - input_gate) * g_scale + (1.0 - temporal_gate) * temporal_distrib.scale
        what_posterior = D.Normal(what_loc, what_scale)
        what_sample = what_posterior.sample(rngs[1])
        what = what_sample

        # presence (311-313); logit-change clamps are off by default
        pres_distrib = self.steps_predictor(
            presence_tm1, presence_logit_tm1, hidden_output, temporal_state, what
        )
        presence = pres_distrib.sample(rngs[2]) * presence_tm1

        outputs = dict(
            what=what,
            what_sample=what_sample,
            what_loc=what_loc,
            what_scale=what_scale,
            where=where,
            where_sample=where_sample,
            where_loc=where_loc,
            where_scale=where_scale,
            presence_prob=pres_distrib.probs,
            presence=presence,
            presence_logit=pres_distrib.logits,
        )
        new_state = dict(
            img=img, what=what, where=where, presence=presence, rnn_state=rnn_state
        )
        return outputs, new_state, temporal_hidden_state

    def make_where_posterior(self, loc, scale):
        """The AffineDiagNormal posterior used by Propagate's log-probs
        (sqair_modules.py:245)."""
        return self._where_distrib(loc, scale)
