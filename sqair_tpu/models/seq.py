"""SequentialAIR: unrolls SQAIRTimestep over time with lax.scan.

Reference: sqair/seq.py (tf.while_loop + 38 TensorArrays).  Here the whole
unroll is a single fixed-shape lax.scan whose stacked outputs reproduce the
reference's TensorArray record exactly (seq.py:121-177 field list).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .air import AIRDecoder
from .timestep import SQAIRTimestep


def _squeeze_last(x):
    return x[..., 0] if (x.ndim > 0 and x.shape[-1] == 1) else x


class SequentialAIR:
    """Plain-python orchestrator over two flax roots (timestep, decoder).

    The time loop lives OUTSIDE linen: lax.scan over ``timestep.apply`` —
    one compiled timestep body regardless of T, params broadcast.
    """

    def __init__(self, timestep: SQAIRTimestep, decoder: AIRDecoder,
                 sample_from_prior: bool = False, generate_after: int = -1,
                 remat: str = "dots", scan_unroll: int = 1):
        """:param remat: rematerialisation policy for the time-scan body:
            "none" (store all residuals), "full" (jax.checkpoint, recompute
            everything in backward), or "dots" (save matmul outputs only —
            elementwise chains recompute).  Residual stacking is ~25% of
            the train step's device time at the paper config, so "dots" is
            the default.
        """
        self.timestep = timestep
        self.decoder = decoder
        self.sample_from_prior = sample_from_prior
        self.generate_after = generate_after
        self.remat = remat
        self.scan_unroll = scan_unroll

    # ------------------------------------------------------------------ init
    def init(self, rng, obs) -> Dict:
        """Initialises both param trees from one example step.

        :param obs: [T, B, H, W] (only shapes are used)
        """
        img0 = obs[0]
        ts_rng, dec_rng, step_rng = jax.random.split(rng, 3)

        def init_step(module, rng_, img):
            carry = module.initial_carry(img.shape[0])
            return module(
                rng_, img, carry["z"], carry["time_state"], carry["prior_state"],
                carry["last_used_id"], carry["prev_ids"], 0,
                self.sample_from_prior,
                None if self.generate_after < 0 else jnp.asarray(0.0),
            )

        # jit the inits: eager init would execute thousands of tiny ops
        # one-by-one (pathological over a remote-device tunnel)
        ts_params = jax.jit(
            lambda r, sr, im: self.timestep.init(r, sr, im, method=init_step)
        )(ts_rng, step_rng, img0)

        B = img0.shape[0]
        S = self.timestep.n_steps
        dec_params = jax.jit(self.decoder.init)(
            dec_rng,
            jnp.zeros((B, S, self.timestep.n_what)),
            jnp.zeros((B, S, 4)),
            jnp.zeros((B, S, 1)),
        )
        return {"timestep": ts_params, "decoder": dec_params}

    # ----------------------------------------------------------------- apply
    def __call__(self, params, rng, obs, record_mode: str = "full") -> Dict:
        """Runs the model over a sequence.

        :param obs: [T, B, H, W]
        :param record_mode: "full" stacks the reference's complete 38-field
            per-timestep record (seq.py:121-177); "train" keeps only the
            fields the loss/metrics consume (per-sample log-probs, counts,
            per-step MSE) — the full-frame canvas/glimpse stacks are never
            materialised, which removes the largest per-step HBM writes
            from the hot loop.
        :return: dict of stacked outputs [T, ...]
        """
        T, B = obs.shape[0], obs.shape[1]
        carry0 = self.timestep.apply(
            params["timestep"], B, method=SQAIRTimestep.initial_carry
        )
        step_rngs = jax.random.split(rng, T)
        ts = jnp.arange(T)

        def step(carry, xs):
            t, img, step_rng = xs

            do_generate = None
            if self.generate_after >= 0:
                do_generate = (t > self.generate_after).astype(jnp.float32)

            out = self.timestep.apply(
                params["timestep"], step_rng, img,
                carry["z"], carry["time_state"], carry["prior_state"],
                carry["last_used_id"], carry["prev_ids"], t,
                self.sample_from_prior, do_generate,
            )

            z_t = out["z_t"]
            p_x_given_z, glimpse = self.decoder.apply(
                params["decoder"], z_t[0], z_t[1], z_t[2]
            )

            # log weights (seq.py:271-276)
            data_ll = jnp.sum(p_x_given_z.log_prob(img), axis=(1, 2))
            kl = out["q_z_given_x"] - out["p_z"]
            log_weights = data_ll - kl

            prop, disc = out["prop"], out["disc"]
            if record_mode == "train":
                record = dict(
                    discrete_log_prob=prop["prop_log_prob"] + disc["num_step_log_prob"],
                    num_prop_steps_per_sample=prop["num_steps"],
                    num_disc_steps_per_sample=disc["num_steps"],
                    num_steps_per_sample=out["num_steps"],
                    data_ll_per_sample=data_ll,
                    kl_per_sample=kl,
                    log_q_z_given_x_per_sample=out["q_z_given_x"],
                    log_p_z_per_sample=out["p_z"],
                    log_weights_per_timestep=log_weights,
                    mse_per_timestep=jnp.mean(
                        (img - p_x_given_z.mean) ** 2, axis=(1, 2)
                    ),
                )
                record = {k: _squeeze_last(v) for k, v in record.items()}
                new_carry = dict(
                    z=z_t,
                    time_state=out["temporal_hidden_state"],
                    prior_state=out["prop_prior_state"],
                    prev_ids=out["ids"],
                    last_used_id=out["highest_used_ids"],
                )
                return new_carry, record

            record = dict(
                # RNN outputs
                what=out["what"],
                what_loc=out["what_loc"],
                what_scale=out["what_scale"],
                where=out["where"],
                where_loc=out["where_loc"],
                where_scale=out["where_scale"],
                presence_prob=out["presence_prob"],
                presence=out["presence"],
                presence_logit=out["presence_logit"],
                # aux
                obj_id=out["obj_ids"],
                step_log_prob=out["presence_log_prob"],
                # others
                canvas=p_x_given_z.mean,
                glimpse=glimpse,
                # discovery
                disc_what_log_prob=disc["what_log_prob"],
                disc_where_log_prob=disc["where_log_prob"],
                disc_what_prior_log_prob=disc["what_prior_log_prob"],
                disc_where_prior_log_prob=disc["where_prior_log_prob"],
                disc_log_prob=disc["num_step_log_prob"],
                disc_prior_log_prob=disc["num_step_prior_log_prob"],
                disc_prob=disc["num_steps_prob"],
                # propagation
                prop_what_log_prob=prop["what_log_prob"],
                prop_where_log_prob=prop["where_log_prob"],
                prop_what_prior_log_prob=prop["what_prior_log_prob"],
                prop_where_prior_log_prob=prop["where_prior_log_prob"],
                prop_log_prob=prop["prop_log_prob"],
                prop_prior_log_prob=prop["prop_prior_log_prob"],
                prop_prob=prop["prop_prob"],
                # discrete log prob for VIMCO (seq.py:238)
                discrete_log_prob=prop["prop_log_prob"] + disc["num_step_log_prob"],
                # counts
                num_prop_steps_per_sample=prop["num_steps"],
                num_disc_steps_per_sample=disc["num_steps"],
                num_steps_per_sample=out["num_steps"],
                prop_pres=prop["hidden_outputs"]["presence"],
                disc_pres=disc["hidden_outputs"]["presence"],
                # losses
                data_ll_per_sample=data_ll,
                kl_per_sample=kl,
                log_q_z_given_x_per_sample=out["q_z_given_x"],
                log_p_z_per_sample=out["p_z"],
                log_weights_per_timestep=log_weights,
            )
            record = {k: _squeeze_last(v) for k, v in record.items()}

            new_carry = dict(
                z=z_t,
                time_state=out["temporal_hidden_state"],
                prior_state=out["prop_prior_state"],
                prev_ids=out["ids"],
                last_used_id=out["highest_used_ids"],
            )
            return new_carry, record

        if self.remat == "full":
            step = jax.checkpoint(step)
        elif self.remat == "dots":
            policy = jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                jax.checkpoint_policies.save_only_these_names("fused_out"),
            )
            step = jax.checkpoint(step, policy=policy)
        _, outputs = jax.lax.scan(step, carry0, (ts, obs, step_rngs),
                                  unroll=self.scan_unroll)
        return outputs
