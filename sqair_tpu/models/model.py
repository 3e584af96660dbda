"""Model wrapper: IWAE particles, bounds, importance metrics, VIMCO target.

Reference: sqair/model.py.  Functional restyling: ``Model`` holds static
config + the sequence callable; ``loss_and_metrics(params, rng, batch)``
computes the optimisation target and every logged quantity in one jit-able
pass.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import indexing, math as ops_math, targets
from .seq import SequentialAIR


class Model:
    """IWAE/VIMCO training wrapper around SequentialAIR."""

    def __init__(self, sequence: SequentialAIR, k_particles: int = 5,
                 aspect_penalty: float = 0.0,
                 transient_penalty: float = 0.0,
                 transient_horizon: int = 2,
                 transient_temp: float = 1.0):
        """:param aspect_penalty: weight of a squared-log-aspect penalty on
            present glimpses — discourages degenerate narrow boxes (the conv
            family's vertical-sliver over-segmentation, docs/NOTES.md).
            Applied in both record modes; 0 disables.
        :param transient_penalty: weight of the transient-discovery penalty
            (round-5 early-frame over-counting fix): per scene,
            ``sum_{t<H} relu(E_q[n_t] - sg(E_q[n_H]))`` where
            ``E_q[n_t] = sum_slots sigmoid(presence_logit[t])`` — charges
            expected early counts in excess of the sequence's own
            propagation-stabilised count at t=H.  Label-free and, unlike a
            #steps-prior ramp, NOT absorbable: the learned conditional cat
            prior can cancel any fixed prior bias at t=0 (its conditioning
            is a constant there), and the posterior defeated pure logit
            desaturation by re-inflating raw logits ~6x (docs/NOTES.md
            round-5) — this penalty is monotone in the posterior's own
            early presence probabilities, so inflating logits RAISES it.
            Scenes whose early counts match their stabilised count pay
            nothing, which separates transient corner-boxes (small recon
            gain) from genuine early discoveries (whole-digit recon gain).
            Pair with early_disc_logit_scale<1: saturated logits give the
            sigmoid path ~zero gradient.  0 disables.
        :param transient_horizon: H above — frames [0, H) pay the penalty,
            frame H anchors the stabilised count (default 2, the measured
            transient window; keep equal to early_disc_horizon).
        :param transient_temp: temperature tau of the sigmoid INSIDE the
            penalty (the logged transient_excess metric always uses tau=1,
            the true expected count).  At tau=1 the tp10 probe taught
            propagation to kill transients a frame earlier but could not
            remove the t=0 discovery itself: q re-inflated its logits to
            the region where sigma' ~ 0, making the penalty a constant
            with zero force (docs/NOTES.md round-5).  sigma(L/tau) keeps
            the gradient alive out to |L| ~ 3*tau, so re-inflation cannot
            escape the pressure; the penalty value stays a (tempered)
            excess-count bound.
        """
        self.sequence = sequence
        self.k_particles = k_particles
        self.aspect_penalty = aspect_penalty
        self.transient_penalty = transient_penalty
        self.transient_horizon = transient_horizon
        self.transient_temp = transient_temp

    @staticmethod
    def finalize_metrics(metrics):
        """Recompute ratio metrics from their (possibly pmean'd) parts.

        Called by every step wrapper AFTER its cross-shard reduction (or
        directly, single-program): ``aspect`` becomes sum(sq)/sum(present)
        over the GLOBAL batch under every sharding strategy — pmean over
        equal-size shards scales numerator and denominator alike, so the
        ratio of pmeans equals the global ratio.  Drops the part keys so
        logged metric sets stay unchanged.
        """
        m = dict(metrics)
        if "aspect_sq_sum" in m:
            m["aspect"] = m.pop("aspect_sq_sum") / jnp.maximum(
                m.pop("aspect_n"), 1.0)
        return m

    def init(self, rng, obs):
        tiled = indexing.tile_input_for_iwae(obs, self.k_particles, with_time=True)
        return self.sequence.init(rng, tiled)

    def forward(self, params, rng, obs, record_mode: str = "full") -> Dict:
        """Runs the sequence model on particle-tiled inputs.

        :param obs: [T, B, H, W]
        :return: outputs dict with [T, B*k, ...] leaves
        """
        tiled_obs = indexing.tile_input_for_iwae(obs, self.k_particles, with_time=True)
        outputs = self.sequence(params, rng, tiled_obs, record_mode=record_mode)
        outputs["tiled_obs"] = tiled_obs
        return outputs

    def loss_and_metrics(self, params, rng, obs, gt_presence=None,
                         l2_weight: float = 0.0,
                         record_mode: str = "full",
                         axis_name=None) -> Tuple[jnp.ndarray, Dict]:
        """Computes the VIMCO target and the reference's metric set.

        :param obs: [T, B, H, W]
        :param gt_presence: [T, B, S+1] cumulative one-hot object counts
        :param record_mode: "full" also returns the render tensors used by
            figures; "train" uses the trimmed per-timestep record (identical
            target and metrics, no canvas/glimpse stacking in the scan)
        :param axis_name: mesh axis name(s) when called inside shard_map —
            makes the aspect PENALTY the global batch ratio (value and
            gradient identical to the GSPMD strategy) instead of the
            per-shard ratio.  None (default) under jit/pjit, where the
            trace is already global.
        :return: (target scalar, dict of metrics + render tensors)
        """
        k = self.k_particles
        T, B = obs.shape[0], obs.shape[1]
        outputs = self.forward(params, rng, obs, record_mode=record_mode)

        log_weights = jnp.sum(outputs["log_weights_per_timestep"], 0)  # [B*k]
        log_weights = log_weights.reshape((B, k))

        elbo_vae = jnp.mean(log_weights)
        elbo_iwae_per_example = targets.iwae(log_weights)
        elbo_iwae = jnp.mean(elbo_iwae_per_example)

        nt = jnp.asarray(T, jnp.float32)
        metrics = dict(
            vae=elbo_vae,
            iwae=elbo_iwae,
            normalised_vae=elbo_vae / nt,
            normalised_iwae=elbo_iwae / nt,
        )

        importance_weights = jax.lax.stop_gradient(jax.nn.softmax(log_weights, -1))
        metrics["ess"] = ops_math.ess(importance_weights, average=True)

        # importance resampling index per example (model.py:100-103)
        rng_resample = jax.random.fold_in(rng, 0x5e5a)
        iw_resampling_idx = jax.random.categorical(rng_resample, jnp.log(importance_weights + 1e-38), -1)

        def imp_weighted_mean(tensor):
            """(model.py:202-205)"""
            t = tensor.reshape((-1, B, k))
            t = jnp.mean(t, 0)
            return jnp.mean(importance_weights * t * k)

        def resample(tensor, axis=1):
            """Per-example particle pick (model.py:170-193)."""
            idx = iw_resampling_idx + jnp.arange(B) * k
            return jnp.take(tensor, idx, axis=axis)

        for name, key in (
            ("data_ll", "data_ll_per_sample"),
            ("log_p_z", "log_p_z_per_sample"),
            ("log_q_z_given_x", "log_q_z_given_x_per_sample"),
            ("kl", "kl_per_sample"),
            ("num_steps", "num_steps_per_sample"),
            ("num_disc_steps", "num_disc_steps_per_sample"),
            ("num_prop_steps", "num_prop_steps_per_sample"),
        ):
            metrics[name] = imp_weighted_mean(outputs[key])

        # MSE between input and canvas (model.py:112-121)
        if record_mode == "train":
            mse_per_sample = jnp.mean(outputs["mse_per_timestep"], axis=0)
        else:
            tiled_obs = outputs["tiled_obs"]
            mse_per_sample = jnp.mean((tiled_obs - outputs["canvas"]) ** 2, axis=(0, 2, 3))
        metrics["mse"] = imp_weighted_mean(mse_per_sample[None])
        metrics["raw_mse"] = jnp.mean(mse_per_sample)

        if gt_presence is not None:
            gt_num_steps = jnp.sum(gt_presence, -1)  # [T, B]
            num_steps = outputs["num_steps_per_sample"].reshape((-1, B, k))
            acc = (gt_num_steps[..., None] == num_steps).astype(jnp.float32)
            metrics["raw_num_step_accuracy"] = jnp.mean(acc)
            metrics["num_step_accuracy"] = imp_weighted_mean(acc)
            if record_mode != "train":
                # [T] importance-weighted accuracy per frame — makes the
                # "residual error concentrates in frames 1-2" diagnosis a
                # logged number (round-4 plateau, docs/NOTES.md).  Eval
                # paths only: the hot train step stays scalar-metrics-only.
                metrics["num_step_acc_per_t"] = jnp.mean(
                    importance_weights[None] * acc * k, axis=(1, 2))
                # [T] inferred count per frame: distinguishes early-frame
                # over-discovery (count too high) from late detection
                metrics["num_steps_per_t"] = jnp.mean(
                    importance_weights[None] * num_steps * k, axis=(1, 2))

        # optimisation target (model.py:150-160)
        discrete_log_prob = jnp.sum(outputs["discrete_log_prob"], 0)
        if k > 1:
            target = targets.vimco(log_weights, discrete_log_prob,
                                   elbo_iwae_per_example)
        else:
            # k=1: VIMCO's leave-one-out baseline is undefined (divides by
            # k-1); fall back to plain REINFORCE on the ELBO.  The
            # reference has no such guard and NaNs at k=1
            # (targets.py:46-59) — this makes the k=1 ELBO config
            # (BASELINE config 1) actually trainable.
            target = targets.reinforce(log_weights, discrete_log_prob,
                                       elbo_iwae_per_example)
        target = target / nt
        if l2_weight:
            target = target + targets.l2_reg(params, l2_weight)
        if "where" in outputs:
            # where logits [T, B*k, S, 4]: (scale_y, scale_x, shift_y,
            # shift_x); presence [T, B*k, S] in {0,1}.  Mean squared
            # log-aspect over PRESENT objects; gradient flows through the
            # reparameterised where sample into the posterior.  The metric
            # is always reported (it quantifies the conv family's
            # vertical-sliver over-segmentation, docs/NOTES.md); the
            # penalty only enters the target when aspect_penalty > 0.
            wh = outputs["where"]
            pres = jax.lax.stop_gradient(outputs["presence"])  # [T, B*k, S]
            log_aspect = (jax.nn.log_sigmoid(wh[..., 0])
                          - jax.nn.log_sigmoid(wh[..., 1]))
            sq = jnp.sum(log_aspect ** 2 * pres)
            n_pres = jnp.sum(pres)
            aspect = sq / jnp.maximum(n_pres, 1.0)
            if self.aspect_penalty:
                if axis_name is not None:
                    # shard_map: use the GLOBAL present count as the
                    # denominator and scale the local numerator by the
                    # shard count.  After the step wrapper's grad pmean
                    # this matches the GSPMD global-ratio penalty exactly:
                    # value pmean = psum(sq)/n_global, gradient pmean =
                    # (1/n_global)*sum_shards(dsq/dp) — the same as
                    # differentiating sq_global/n_global in one trace.
                    # (n_pres carries no gradient: presence is
                    # stop-gradient'd above.)
                    n_shards = jax.lax.psum(1.0, axis_name)
                    n_global = jax.lax.psum(n_pres, axis_name)
                    penalty_aspect = sq * n_shards / jnp.maximum(n_global, 1.0)
                else:
                    penalty_aspect = aspect
                target = target + self.aspect_penalty * penalty_aspect
            metrics["aspect"] = aspect
            # ratio parts: a cross-shard pmean of `aspect` is a mean of
            # per-shard ratios, not the global ratio.  pmean of the parts
            # (equal-size shards) preserves num/den, so step wrappers call
            # finalize_metrics AFTER their reduction to recompute it.
            metrics["aspect_sq_sum"] = sq
            metrics["aspect_n"] = n_pres
        if "presence_logit" in outputs:
            pl = outputs["presence_logit"]  # [T, B*k, S] (or trailing 1)
            if pl.ndim == 4:
                pl = pl[..., 0]
            H = self.transient_horizon
            if pl.shape[0] > H:
                # expected per-frame counts under q; dead slots sit at
                # logit -88 -> sigmoid ~ 0
                def _excess(tau):
                    n_hat = jnp.sum(jax.nn.sigmoid(pl / tau), -1)  # [T, B*k]
                    anchor = jax.lax.stop_gradient(n_hat[H])
                    ex = jax.nn.relu(n_hat[:H] - anchor[None])
                    # plain per-sample mean: a cross-shard pmean of this IS
                    # the global value (equal shards) — no ratio parts needed
                    return jnp.mean(jnp.sum(ex, 0))

                transient = _excess(1.0)
                metrics["transient_excess"] = transient
                if self.transient_penalty:
                    pen = (transient if self.transient_temp == 1.0
                           else _excess(self.transient_temp))
                    target = target + self.transient_penalty * pen
        metrics["target"] = target

        # resampled tensors for rendering (model.py:137-148)
        render = {}
        if record_mode != "train":
            for name in ("obj_id", "canvas", "glimpse", "presence_prob",
                         "presence", "presence_logit", "where"):
                if name in outputs:
                    render["resampled_" + name] = resample(outputs[name])
            render["obs"] = obs

        return target, dict(metrics=metrics, render=render, log_weights=log_weights)
