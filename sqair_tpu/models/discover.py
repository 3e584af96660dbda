"""Discovery module (reference: sqair/sqair_modules.py:66-229)."""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import MLP
from ..nn.stochastic import RecurrentNormalImpl
from ..ops import distributions as D
from .core import HIDDEN_OUTPUT_FIELDS, DiscoveryCore


class Discover(nn.Module):
    """Discovers up to n_steps new objects in a frame.

    Note on the discovery budget: the reference computes a per-slot
    ``is_allowed`` input from ``max_disc_steps`` but the cell destructures
    and never reads it (core.py:192-193); the budget is *soft* — enforced
    only through the learned step priors and the present-first truncation.
    We reproduce exactly that (and expose max_disc_steps for parity).
    """

    n_steps: int
    cell: DiscoveryCore
    step_success_prob: float = 0.75
    where_mean: Sequence[float] = (-2.0, -2.0, 0.0, 0.0)
    where_std: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    disc_prior_type: str = "geom"
    rec_where_prior: bool = False
    # Early-frame discovery suppression (round-4 plateau fix,
    # docs/NOTES.md): for t < early_disc_horizon the #steps prior logits
    # get an extra -bias*count ramp, charging each additional discovery
    # `early_disc_step_bias` nats of prior cost in the frames where the
    # transient spurious second box appears.  0 disables (default; the
    # reference has no such knob — its only time shaping is the t>0
    # bias, sqair_modules.py:199-226).
    early_disc_step_bias: float = 0.0
    early_disc_horizon: int = 2
    # Posterior-side twin of the above: subtracted from the discovery
    # presence LOGIT (the steps predictor's output) for t < horizon —
    # the time-dependent form of the reference's own disc_step_bias
    # (modules.py:470-524 output-bias init).  Acts immediately on the
    # inferred counts (no retraining needed); the q log-probs stay
    # self-consistent because they are evaluated on the recorded logits.
    early_disc_logit_bias: float = 0.0
    # Desaturation levers (round 5): the trained posterior holds early-frame
    # presence logits at 10-45 (tools/diag_presence_logits.py, ckpt-698000),
    # where Bernoulli samples carry no particle variance — VIMCO gets zero
    # score gradient and sigmoid' is ~1e-10, so NO cost-side lever (prior
    # ramp, logit bias) can retrain the t<2 over-discovery.  For
    # t < early_disc_horizon:
    #   logit_scale < 1 multiplies q's presence logit (monotone — keeps the
    #     confidence ordering; 0.15 maps the measured 10-45 population onto
    #     ~1.5-7, restoring sample diversity exactly on the weakest boxes)
    #   logit_clamp > 0 caps |logit| straight-through (forward clip,
    #     backward identity — sampling desaturates but the MLP still sees
    #     the full VIMCO gradient)
    early_disc_logit_scale: float = 1.0
    early_disc_logit_clamp: float = 0.0
    # Explained-so-far coverage signal for the steps predictor (round-5
    # architectural lever; see DiscoveryCore.coverage_signal).  The canvas
    # is seeded from the propagated objects' boxes each frame, then
    # accumulates this frame's discoveries slot by slot.  Must match the
    # cell's coverage_signal (SQAIRTimestep wires both).
    coverage_signal: bool = False

    def setup(self):
        if self.early_disc_step_bias and self.disc_prior_type != "cat":
            raise ValueError(
                "early_disc_step_bias requires disc_prior_type='cat'")
        if self.rec_where_prior:
            bias = list(self.where_mean) + list(self.where_std)

            def bias_init(key, shape, dtype=jnp.float32):
                return jnp.asarray(bias, dtype)

            self._where_prior = RecurrentNormalImpl(
                4, 128, conditional=True, output_bias_init=bias_init
            )
        else:
            self._where_prior = None

        if self.disc_prior_type == "cat":
            self._step_logits = self.param(
                "step_prior_bias", nn.initializers.zeros_init(), (self.n_steps + 1,)
            )
            init = jnp.asarray([10.0] + [0.0] * self.n_steps)
            self._timestep_bias = self.param(
                "step_prior_timestep_bias", lambda k, s: init, (self.n_steps + 1,)
            )
            self._step_cond_mlp = MLP([10], n_out=self.n_steps + 1)
        elif self.disc_prior_type != "geom":
            raise ValueError(f"Invalid prior type: {self.disc_prior_type}")

    @property
    def n_what(self):
        return self.cell.n_what

    def initial_z(self, batch_size):
        """Zeroed (what, where, presence, presence_logit), each [B, S, d]."""
        S = self.n_steps
        return (
            jnp.zeros((batch_size, S, self.cell.n_what)),
            jnp.zeros((batch_size, S, 4)),
            jnp.zeros((batch_size, S, 1)),
            jnp.zeros((batch_size, S, 1)),
        )

    def log_probs_only(self, rng, hidden_outputs, num_steps, time_step,
                       conditioning_from_prop, prior_conditioning) -> Dict:
        """Posterior/prior log-probs from recorded samples/stats.

        Used by the deferred (out-of-scan, batched-over-time) log-prob pass:
        identical math to the in-loop path, evaluated on [T*B, ...] stacks.
        """
        _, log_probs = self._compute_log_probs(
            rng, hidden_outputs, num_steps, time_step, conditioning_from_prop,
            prior_conditioning, False, None,
        )
        return log_probs

    def __call__(self, rng, img, n_present_obj, conditioning_from_prop=None,
                 time_step=0, prior_conditioning=None, sample_from_prior=False,
                 do_generate=None, compute_log_probs: bool = True,
                 prop_where=None, prop_presence=None) -> Dict:
        """Runs discovery for one frame (sqair_modules.py:94-125).

        :param img: [B, H, W]
        :param n_present_obj: [B] number of propagated objects
        :param conditioning_from_prop: [B, d] DeepSet summary of propagation
        :param time_step: scalar (may be traced)
        :param prior_conditioning: [B, m] extra prior conditioning
        :param sample_from_prior: static python bool
        :param do_generate: traced bool (or None); only used when
            sample_from_prior is True
        :param prop_where / prop_presence: [B, S, 4] / [B, S, 1] propagated
            latents; seed the coverage canvas when coverage_signal is on
        """
        batch_size = img.shape[0]
        max_disc_steps = self.n_steps - n_present_obj

        if conditioning_from_prop is None:
            conditioning_from_prop = jnp.zeros((batch_size, 1))
        if prior_conditioning is None:
            prior_conditioning = jnp.zeros((batch_size, 0))

        extra_steps_logit = 0.0
        steps_logit_scale = 1.0
        steps_logit_clamp = None
        if (self.early_disc_logit_bias or self.early_disc_logit_clamp
                or self.early_disc_logit_scale != 1.0):
            is_early = jnp.asarray(
                time_step < self.early_disc_horizon, jnp.float32)
            if self.early_disc_logit_bias:
                extra_steps_logit = -self.early_disc_logit_bias * is_early
            if self.early_disc_logit_scale != 1.0:
                # blend to identity (scale 1) outside the early window
                steps_logit_scale = (
                    1.0 + is_early * (self.early_disc_logit_scale - 1.0))
            if self.early_disc_logit_clamp:
                # a huge cap is the identity — blend the cap, not the op
                steps_logit_clamp = (
                    self.early_disc_logit_clamp + (1.0 - is_early) * 1e4)

        coverage = None
        if self.coverage_signal:
            from ..ops import stn
            from .core import coverage_paste

            coverage = jnp.zeros(img.shape)
            if prop_where is not None and prop_presence is not None:
                coverage = coverage_paste(
                    coverage, stn.to_coords(prop_where), prop_presence,
                    self.cell.glimpse_size)

        rng, sub = jax.random.split(rng)
        hidden_outputs, num_steps = self._discover(sub, img, conditioning_from_prop,
                                                   extra_steps_logit,
                                                   steps_logit_scale,
                                                   steps_logit_clamp,
                                                   coverage=coverage)
        if compute_log_probs:
            # NB: as in the reference, num_steps and the log-probs below use
            # the posterior presence even when do_generate overrides samples
            hidden_outputs, log_probs = self._compute_log_probs(
                rng, hidden_outputs, num_steps, time_step, conditioning_from_prop,
                prior_conditioning, sample_from_prior, do_generate,
            )
        else:
            assert not sample_from_prior, (
                "deferred log-probs only supported on the plain train path")
            log_probs = {}

        outputs = dict(hidden_outputs=hidden_outputs, num_steps=num_steps,
                       max_disc_steps=max_disc_steps)
        outputs.update(hidden_outputs)
        outputs.update(log_probs)
        return outputs

    def _fused_disc_params(self):
        """Raw weights for the fused frame kernel, or None if ineligible
        (non-TPU, init time, or non-standard module shapes)."""
        import math
        import os

        from ..nn.layers import VanillaRNN
        from ..ops import fused as _fused

        # Opt-in: the frame kernels measured perf-NEUTRAL vs the XLA path
        # at the paper config (both are per-op-latency-bound; docs/NOTES.md)
        # and cost ~8min of Mosaic compile time, so the default is off.
        if not os.environ.get("SQAIR_FUSE_CELLS") or not _fused.use_pallas():
            return None
        # the fused kernel computes presence internally without the
        # time-dependent logit offset/scale/clamp — fall back to unfused
        if (self.early_disc_logit_bias or self.early_disc_logit_clamp
                or self.early_disc_logit_scale != 1.0):
            return None
        # the fused kernel's steps predictor has no coverage input
        if self.coverage_signal:
            return None
        if self.is_initializing():
            return None
        cell = self.cell
        if not isinstance(cell.transition, VanillaRNN):
            return None
        sp_mod = cell.steps_predictor
        if (sp_mod.max_rel_logit_change != math.inf
                or sp_mod.max_logit_change != math.inf):
            return None
        if cell.glimpse_encoder.scale_offset != 0.0:
            return None
        try:
            enc_in = cell.input_encoder.variables["params"]["MLP_0"]
            tr = cell.transition.variables["params"]
            stp_m = cell.transform_estimator.variables["params"]
            stp = stp_m["MLP_0"]
            tree = cell.glimpse_encoder._fused_param_tree()
            sp = sp_mod.variables["params"]["MLP_0"]
            if (tree is None or "w_2" in enc_in or "w_1" not in enc_in
                    or "w_3" in stp or "w_2" not in stp
                    or "w_2" in sp or "w_1" not in sp):
                return None
            from ..ops import fused_cells

            enc_params, (head_w, head_b), _ = tree
            p = fused_cells.DiscParams(
                enc_in=((enc_in["w_0"], enc_in["b_0"]),
                        (enc_in["w_1"], enc_in["b_1"])),
                rnn=(tr["in_to_hidden_w"], tr["hidden_to_hidden_w"],
                     tr["in_to_hidden_b"]),
                stp=((stp["w_0"], stp["b_0"]), (stp["w_1"], stp["b_1"]),
                     (stp["w_2"], stp["b_2"])),
                stp_offset=stp_m["scale_offset"],
                ge_enc=enc_params,
                ge_head=(head_w, head_b),
                sp=((sp["w_0"], sp["b_0"]), (sp["w_1"], sp["b_1"])),
            )
            return p, tr["h0"]
        except (KeyError, AttributeError, ValueError):
            return None

    def _discover_fused(self, fp, rng, img, conditioning, extra_steps_logit=0.0):
        """All S discovery slots as one Pallas kernel (ops/fused_cells.py)."""
        from ..ops import fused_cells

        p, h0 = fp
        S, B = self.n_steps, img.shape[0]
        r1, r2, r3 = jax.random.split(rng, 3)
        eps_w = jax.random.normal(r1, (S, B, 4))
        eps_x = jax.random.normal(r2, (S, B, self.cell.n_what))
        u = jax.random.uniform(r3, (S, B, 1))
        out = fused_cells.fused_disc_ssm(
            img, img.reshape((B, -1)), conditioning, h0, eps_w, eps_x, u, p,
            self.cell.glimpse_size,
        )
        hidden_outputs = {k: jnp.swapaxes(v, 0, 1) for k, v in out.items()}
        num_steps = jnp.sum(hidden_outputs["presence"][..., 0], -1)
        return hidden_outputs, num_steps

    def _discover(self, rng, img, conditioning, extra_steps_logit=0.0,
                  steps_logit_scale=1.0, steps_logit_clamp=None,
                  coverage=None):
        """Unrolls the discovery core over object slots (_discover,
        sqair_modules.py:127-147).  S <= 4, so a python unroll."""
        fp = self._fused_disc_params()
        if fp is not None:
            return self._discover_fused(fp, rng, img, conditioning,
                                        extra_steps_logit)

        encoded_img = self.cell.encode_img(img)
        state = self.cell.initial_state(img, encoded_img, coverage=coverage)

        per_slot = []
        for t in range(self.n_steps):
            step_rng = jax.random.fold_in(rng, t)
            outputs, state = self.cell(step_rng, state, conditioning,
                                       extra_steps_logit, steps_logit_scale,
                                       steps_logit_clamp)
            per_slot.append(outputs)

        # stack [B, S, d]
        hidden_outputs = {
            k: jnp.stack([o[k] for o in per_slot], 1) for k in HIDDEN_OUTPUT_FIELDS
        }
        num_steps = jnp.sum(hidden_outputs["presence"][..., 0], -1)
        return hidden_outputs, num_steps

    def _make_steps_prior(self, time_step, prior_conditioning):
        """Geometric or learned-categorical #steps prior
        (sqair_modules.py:199-226)."""
        if self.disc_prior_type == "geom":
            return D.Geometric(probs=jnp.asarray(1.0 - self.step_success_prob))

        # time_step may be a scalar (in-loop path) or a [N, 1] array
        # (deferred batched path); both broadcast below
        is_first = jnp.asarray(time_step == 0, jnp.float32)
        step_logits = self._step_logits + (1.0 - is_first) * self._timestep_bias
        if step_logits.ndim == 1:
            step_logits = step_logits[None]
        if prior_conditioning.shape[-1] > 0:
            step_logits = step_logits + self._step_cond_mlp(prior_conditioning)
        else:
            step_logits = jnp.broadcast_to(
                step_logits, (prior_conditioning.shape[0], self.n_steps + 1)
            )
        step_logits = jax.nn.elu(step_logits)
        if self.early_disc_step_bias:
            # post-elu so the ramp keeps its full magnitude (elu saturates
            # negatives at -1); broadcasts over both the in-loop (scalar
            # time_step) and deferred ([N, 1]) paths like is_first above
            is_early = jnp.asarray(
                time_step < self.early_disc_horizon, jnp.float32)
            ramp = -self.early_disc_step_bias * jnp.arange(
                self.n_steps + 1, dtype=jnp.float32)
            step_logits = step_logits + is_early * ramp
        return D.Categorical(logits=step_logits)

    def _where_prior_log_prob(self, rng, where, conditioning):
        if self.rec_where_prior:
            _, _, _, lp = self._where_prior(
                rng, batch_size=where.shape[0], override_samples=where,
                conditioning=conditioning,
            )
            return lp
        mean = jnp.asarray(self.where_mean)
        std = jnp.asarray(self.where_std)
        return D.Normal(mean, std).log_prob(where)

    def _where_prior_sample(self, rng, batch_size, conditioning):
        if self.rec_where_prior:
            samples, _, _, _ = self._where_prior(
                rng, batch_size=batch_size, seq_len=self.n_steps,
                conditioning=conditioning,
            )
            return samples
        mean = jnp.asarray(self.where_mean)
        std = jnp.asarray(self.where_std)
        return D.Normal(mean, std).sample(rng, (batch_size, self.n_steps))

    def _compute_log_probs(self, rng, hidden_outputs, num_steps, time_step,
                           conditioning_from_prop, prior_conditioning,
                           sample_from_prior, do_generate):
        """(sqair_modules.py:149-197)"""
        where_conditioning = jnp.concatenate(
            [conditioning_from_prop, prior_conditioning], -1
        )
        steps_prior = self._make_steps_prior(time_step, prior_conditioning)
        rngs = jax.random.split(rng, 4)

        if sample_from_prior:
            B, S = hidden_outputs["what"].shape[:2]
            what_p = D.Normal(jnp.asarray(0.0), jnp.asarray(1.0)).sample(
                rngs[0], (B, S, self.cell.n_what)
            )
            where_p = self._where_prior_sample(rngs[1], B, where_conditioning)
            # discovery presence is zeroed under generation (ref: *0.)
            pres_p = jnp.zeros((B, S, 1))

            dg = jnp.asarray(0.0 if do_generate is None else do_generate, jnp.float32)
            ndg = 1.0 - dg
            hidden_outputs = dict(hidden_outputs)
            hidden_outputs["what"] = dg * what_p + ndg * hidden_outputs["what"]
            hidden_outputs["where"] = dg * where_p + ndg * hidden_outputs["where"]
            hidden_outputs["presence"] = dg * pres_p + ndg * hidden_outputs["presence"]

        presence = hidden_outputs["presence"][..., 0]  # [B, S]

        # posteriors
        what_post = D.Normal(hidden_outputs["what_loc"], hidden_outputs["what_scale"])
        where_post = D.Normal(hidden_outputs["where_loc"], hidden_outputs["where_scale"])
        steps_post = D.NumStepsDistribution(logits=hidden_outputs["presence_logit"][..., 0])

        what_lp = jnp.sum(what_post.log_prob(hidden_outputs["what"]), -1) * presence
        where_lp = jnp.sum(where_post.log_prob(hidden_outputs["where"]), -1) * presence
        steps_lp = steps_post.log_prob(num_steps)

        # priors
        what_prior_lp = jnp.sum(
            D.Normal(jnp.asarray(0.0), jnp.asarray(1.0)).log_prob(hidden_outputs["what"]),
            -1,
        ) * presence
        where_prior_lp = jnp.sum(
            self._where_prior_log_prob(rngs[2], hidden_outputs["where"], where_conditioning),
            -1,
        ) * presence
        steps_prior_lp = steps_prior.log_prob(num_steps)

        o = dict(
            q_z_given_x=jnp.sum(what_lp + where_lp, -1) + steps_lp,
            p_z=jnp.sum(what_prior_lp + where_prior_lp, -1) + steps_prior_lp,
            what_log_prob=what_lp,
            where_log_prob=where_lp,
            num_step_log_prob=steps_lp,
            what_prior_log_prob=what_prior_lp,
            where_prior_log_prob=where_prior_lp,
            num_step_prior_log_prob=steps_prior_lp,
            num_steps_prob=steps_post.probs,
        )
        return hidden_outputs, o
