"""SQAIRTimestep: one full Propagate-then-Discover step + latent merge.

Reference: sqair/sqair_modules.py:332-582.  This is the root flax module of
the model — all weight sharing (the input/glimpse encoders shared between
discovery and propagation, cf. configs/mlp_mnist_model.py:112-113) lives
inside its setup().
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import MLP, Encoder, make_cell
from ..nn.stochastic import StepsPredictor, StochasticTransformParam
from ..ops import indexing
from .core import HIDDEN_OUTPUT_FIELDS, DiscoveryCore, PropagationCore
from .discover import Discover
from .propagate import Propagate, PropagatePrior


class SQAIRTimestep(nn.Module):
    """One time-step of the full APDR model."""

    # structural
    n_steps: int
    img_size: Sequence[int]
    glimpse_size: Sequence[int]
    n_what: int
    # net sizes
    n_hidden: int = 256
    n_layers: int = 2
    steps_pred_hidden: Optional[Sequence[int]] = None
    # cells
    transition: str = "VanillaRNN"
    time_transition: str = "GRU"
    prior_transition: str = "GRU"
    # stochastic-module hyperparams
    transform_var_bias: float = -3.0
    disc_step_bias: float = 1.0
    prop_step_bias: float = 5.0
    prop_prior_step_bias: float = 10.0
    prop_prior_type: str = "rnn"
    step_success_prob: float = 0.75
    disc_prior_type: str = "cat"
    rec_where_prior: bool = True
    early_disc_step_bias: float = 0.0
    early_disc_horizon: int = 2
    early_disc_logit_bias: float = 0.0
    early_disc_logit_scale: float = 1.0
    early_disc_logit_clamp: float = 0.0
    disc_coverage_signal: bool = False
    scale_prior: Sequence[float] = (-2.0, -2.0)
    masked_glimpse: bool = True
    encoder_type: str = "mlp"  # "mlp" | "conv"
    conv_channels: Sequence[int] = (32, 64)
    conv_kernel: int = 3

    def setup(self):
        n_hiddens = [self.n_hidden] * self.n_layers
        steps_hidden = list(self.steps_pred_hidden or [self.n_hidden // 2])

        # shared encoders (mlp_mnist_model.py:89-93, 112-113)
        if self.encoder_type == "conv":
            from ..nn.layers import ConvEncoder

            self._input_encoder = ConvEncoder(
                self.img_size, list(self.conv_channels),
                n_features=self.n_hidden, kernel_shape=self.conv_kernel,
            )
            glimpse_enc = ConvEncoder(
                self.glimpse_size, list(self.conv_channels),
                n_features=self.n_hidden, kernel_shape=self.conv_kernel,
            )
        else:
            self._input_encoder = Encoder(n_hiddens)
            glimpse_enc = Encoder(n_hiddens)
        from .air import AIREncoder

        self._glimpse_encoder = AIREncoder(
            self.img_size, self.glimpse_size, self.n_what,
            glimpse_encoder=glimpse_enc,
            masked_glimpse=self.masked_glimpse,
        )

        disc_cell = DiscoveryCore(
            self.img_size, self.glimpse_size, self.n_what,
            transition=make_cell(self.transition, self.n_hidden),
            input_encoder=self._input_encoder,
            glimpse_encoder=self._glimpse_encoder,
            transform_estimator=StochasticTransformParam(n_hiddens, self.transform_var_bias),
            steps_predictor=StepsPredictor(steps_hidden, self.disc_step_bias),
            coverage_signal=self.disc_coverage_signal,
        )
        self.discover = Discover(
            self.n_steps, disc_cell,
            step_success_prob=self.step_success_prob,
            where_mean=tuple(self.scale_prior) + (0.0, 0.0),
            disc_prior_type=self.disc_prior_type,
            rec_where_prior=self.rec_where_prior,
            early_disc_step_bias=self.early_disc_step_bias,
            early_disc_horizon=self.early_disc_horizon,
            early_disc_logit_bias=self.early_disc_logit_bias,
            early_disc_logit_scale=self.early_disc_logit_scale,
            early_disc_logit_clamp=self.early_disc_logit_clamp,
            coverage_signal=self.disc_coverage_signal,
        )

        self._temporal_cell = make_cell(self.time_transition, self.n_hidden)
        prop_cell = PropagationCore(
            self.img_size, self.glimpse_size, self.n_what,
            transition=make_cell(self.transition, self.n_hidden),
            input_encoder=self._input_encoder,
            glimpse_encoder=self._glimpse_encoder,
            transform_estimator=StochasticTransformParam(n_hiddens, self.transform_var_bias),
            steps_predictor=StepsPredictor(steps_hidden, self.prop_step_bias),
            temporal_cell=self._temporal_cell,
        )
        prior = PropagatePrior(
            self.n_what,
            cell=make_cell(self.prior_transition, self.n_hidden),
            prop_logit_bias=self.prop_prior_step_bias,
            mode=self.prop_prior_type,
        )
        self.propagate = Propagate(ssm_cell=prop_cell, prior=prior)

        # DeepSet summary of propagated latents (sqair_modules.py:348-350)
        self._latent_encoder = MLP([self.n_hidden, self.n_hidden])

    # ---------------------------------------------------------------- carry
    def initial_carry(self, batch_size: int) -> Dict:
        """t=0 loop state (reference seq.py:95-104)."""
        z0 = self.discover.initial_z(batch_size)
        time_state = self.initial_temporal_state(batch_size)
        prior_state = self.initial_prior_state(batch_size)
        prev_ids = -jnp.ones((batch_size, self.n_steps, 1))
        last_used_id = -jnp.ones((batch_size, 1))
        return dict(
            z=z0, time_state=time_state, prior_state=prior_state,
            prev_ids=prev_ids, last_used_id=last_used_id,
        )

    def initial_temporal_state(self, batch_size: int):
        state = self._temporal_cell.initial_state(batch_size)
        return tuple(jnp.tile(s[:, None], (1, self.n_steps, 1)) for s in state)

    def initial_prior_state(self, batch_size: int):
        state = self.propagate.prior_init_state(batch_size)
        return tuple(jnp.tile(s[:, None], (1, self.n_steps, 1)) for s in state)

    # ----------------------------------------------------------------- step
    def __call__(self, rng, img, z_tm1, temporal_hidden_state, prop_prior_state,
                 highest_used_ids, prev_ids, time_step,
                 sample_from_prior: bool = False, do_generate=None,
                 compute_log_probs: bool = True) -> Dict:
        """(sqair_modules.py:446-490)

        With ``compute_log_probs=False`` the step returns only samples /
        stats; the log-probs are evaluated later, batched over time, via
        :meth:`batched_log_probs` (they never feed the recurrence).
        """
        batch_size = img.shape[0]
        rng_prop, rng_disc = jax.random.split(rng)

        prop_output = self.propagate(
            rng_prop, img, z_tm1, temporal_hidden_state, prop_prior_state,
            sample_from_prior, do_generate, compute_log_probs,
        )
        conditioning_from_prop = self._encode_latents(
            prop_output["what"], prop_output["where"], prop_output["presence"]
        )

        # expected #objects under the propagation prior feeds the discovery
        # prior (sqair_modules.py:505-510)
        prop_prior_step_logits = prop_output["prior_stats"][-1][..., 0]
        prop_prior_step_probs = (jax.nn.sigmoid(prop_prior_step_logits) - 0.5) / self.n_steps
        expected_prop_prior_num_step = jnp.sum(prop_prior_step_probs, -1, keepdims=True)

        disc_kwargs = {}
        if self.disc_coverage_signal:
            disc_kwargs = dict(prop_where=prop_output["where"],
                               prop_presence=prop_output["presence"])
        disc_output = self.discover(
            rng_disc, img, prop_output["num_steps"], conditioning_from_prop,
            time_step, expected_prop_prior_num_step, sample_from_prior, do_generate,
            compute_log_probs, **disc_kwargs,
        )

        (hidden_outputs, z_t, obj_ids, prop_prior_state, temporal_hidden_state,
         highest_used_ids) = self._choose_latents(
            prop_output, disc_output, highest_used_ids, prev_ids
        )

        outputs = dict(
            hidden_outputs=hidden_outputs,
            obj_ids=obj_ids,
            z_t=z_t,
            prop_prior_state=prop_prior_state,
            ids=obj_ids,
            highest_used_ids=highest_used_ids,
            prop=prop_output,
            disc=disc_output,
            temporal_hidden_state=temporal_hidden_state,
        )
        if compute_log_probs:
            outputs.update(
                presence_log_prob=(prop_output["prop_log_prob"]
                                   + disc_output["num_step_log_prob"]),
                p_z=disc_output["p_z"] + prop_output["p_z"],
                q_z_given_x=disc_output["q_z_given_x"] + prop_output["q_z_given_x"],
            )
        else:
            outputs["conditioning_from_prop"] = conditioning_from_prop
            outputs["expected_prop_prior_num_step"] = expected_prop_prior_num_step
        outputs.update(hidden_outputs)
        outputs["num_steps"] = jnp.sum(hidden_outputs["presence"][..., 0], -1)
        return outputs

    def batched_log_probs(self, rng, prop_hidden, prior_stats, presence_tm1,
                          disc_hidden, conditioning_from_prop,
                          prior_conditioning, time_steps) -> Dict:
        """Deferred log-prob pass over flattened [T*B, ...] stacks.

        Evaluates exactly the log-probs the in-loop path would have
        (Propagate/Discover ``_compute_log_probs``); returns the aggregates
        the training target needs.
        """
        prop_lp = self.propagate.log_probs_only(
            presence_tm1, prop_hidden, prior_stats,
            prop_hidden["what"], prop_hidden["where"],
        )
        disc_num_steps = jnp.sum(disc_hidden["presence"][..., 0], -1)
        disc_lp = self.discover.log_probs_only(
            rng, disc_hidden, disc_num_steps, time_steps,
            conditioning_from_prop, prior_conditioning,
        )
        return dict(
            q_z_given_x=disc_lp["q_z_given_x"] + prop_lp["q_z_given_x"],
            p_z=disc_lp["p_z"] + prop_lp["p_z"],
            discrete_log_prob=(prop_lp["prop_log_prob"]
                               + disc_lp["num_step_log_prob"]),
            num_prop_steps=jnp.sum(prop_hidden["presence"][..., 0], -1),
            num_disc_steps=disc_num_steps,
        )

    # -------------------------------------------------------------- helpers
    def propagate_only(self, rng, img, z_tm1, temporal_hidden_state,
                       prop_prior_state, sample_from_prior: bool = False,
                       do_generate=None) -> Dict:
        """Propagation-only debug step (no discovery, no merge).

        Mirror of the reference's PropagateOnlyTimestep mock
        (sqair_modules.py:388-414): initialise z with ground-truth
        positions/presence and step only the propagation path — the
        standard tool for debugging tracking in isolation.  Call via
        ``timestep.apply(params, ..., method=SQAIRTimestep.propagate_only)``.
        """
        outputs = self.propagate(
            rng, img, z_tm1, temporal_hidden_state, prop_prior_state,
            sample_from_prior, do_generate,
        )
        h = outputs["hidden_outputs"]
        outputs["z_t"] = (h["what"], h["where"], h["presence"],
                          h["presence_logit"])
        outputs["prop_prior_state"] = outputs.pop("prior_state")
        outputs["temporal_hidden_state"] = outputs.pop("temporal_state")
        return outputs

    def _encode_latents(self, what, where, presence):
        """DeepSet summary (sqair_modules.py:368-385)."""
        inpts = jnp.concatenate([what, where], -1)
        features = self._latent_encoder(inpts) * presence
        return jnp.sum(features, -2)

    def _choose_latents(self, prop_output, disc_output, highest_used_ids, prev_ids):
        """Merge + reorder + truncate (sqair_modules.py:514-582).

        1) concat prop/disc along the slot axis (prop first)
        2) assign fresh IDs to discoveries
        3) stable present-first reorder of every per-object tensor
        4) truncate to n_steps slots
        5) splice freshly-initialised temporal/prior states for discoveries
        """
        batch_size = prev_ids.shape[0]

        prop_temporal = prop_output["temporal_state"]
        fresh_temporal = self.initial_temporal_state(batch_size)
        temporal = tuple(
            jnp.concatenate([p, f], 1) for p, f in zip(prop_temporal, fresh_temporal)
        )

        prop_prior_state = prop_output["prior_state"]
        fresh_prior = self.initial_prior_state(batch_size)
        prior_state = tuple(
            jnp.concatenate([p, f], 1) for p, f in zip(prop_prior_state, fresh_prior)
        )

        hidden_outputs = {
            k: jnp.concatenate(
                [prop_output["hidden_outputs"][k], disc_output["hidden_outputs"][k]], 1
            )
            for k in HIDDEN_OUTPUT_FIELDS
        }

        highest_used_ids, new_obj_id = indexing.compute_object_ids(
            highest_used_ids, prev_ids,
            prop_output["hidden_outputs"]["presence"],
            disc_output["hidden_outputs"]["presence"],
        )

        to_partition = dict(hidden_outputs)
        to_partition["obj_id"] = new_obj_id
        to_partition["prior_state"] = prior_state
        to_partition["temporal_state"] = temporal

        presence = hidden_outputs["presence"][..., 0]
        partitioned = indexing.select_present(to_partition, presence,
                                              top_k=self.n_steps)

        obj_ids = partitioned.pop("obj_id")
        prior_state = partitioned.pop("prior_state")
        temporal = partitioned.pop("temporal_state")
        hidden_outputs = partitioned

        z_t = (
            hidden_outputs["what"],
            hidden_outputs["where"],
            hidden_outputs["presence"],
            hidden_outputs["presence_logit"],
        )
        return hidden_outputs, z_t, obj_ids, prior_state, temporal, highest_used_ids
