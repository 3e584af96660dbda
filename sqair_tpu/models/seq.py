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
                 remat: str = "auto", scan_unroll: int = 1):
        """:param remat: rematerialisation policy for the time-scan body:
            "none" (store all residuals), "full" (jax.checkpoint, recompute
            everything in backward), "dots" (save matmul outputs only —
            elementwise chains recompute), or "auto" (default): "none" when
            the fused frame kernels are active — their residuals are packed
            blobs and a checkpoint would re-run the forward kernels in the
            backward — else "dots".
        """
        import os

        self.timestep = timestep
        self.decoder = decoder
        self.sample_from_prior = sample_from_prior
        self.generate_after = generate_after
        remat = os.environ.get("SQAIR_REMAT", remat)
        if remat == "auto":
            from ..ops import fused

            fused_cells_on = (
                fused.use_pallas()
                and bool(os.environ.get("SQAIR_FUSE_CELLS"))
                # structural eligibility mirror of Discover._fused_disc_params
                # / Propagate._fused_prop_params (param-free approximation)
                and getattr(timestep, "transition", None) == "VanillaRNN"
                and getattr(timestep, "time_transition", None) == "GRU"
                and getattr(timestep, "encoder_type", "mlp") == "mlp"
                and getattr(timestep, "masked_glimpse", True)
            )
            # measured at the paper config (docs/NOTES.md): the fused
            # kernels carry packed residuals (checkpoint would re-run the
            # fwd kernels), the flax path is cheapest re-running everything
            remat = "none" if fused_cells_on else "full"
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

            train_mode = record_mode == "train" and not self.sample_from_prior
            out = self.timestep.apply(
                params["timestep"], step_rng, img,
                carry["z"], carry["time_state"], carry["prior_state"],
                carry["last_used_id"], carry["prev_ids"], t,
                self.sample_from_prior, do_generate,
                not train_mode,
            )

            z_t = out["z_t"]

            prop, disc = out["prop"], out["disc"]
            if train_mode:
                # neither the decoder/likelihood nor the posterior/prior
                # log-probs feed the scan carry: both run AFTER the scan,
                # batched over [T*B] (big MXU batches instead of T more
                # links in the sequential chain) — see below
                record = dict(
                    z_what=z_t[0], z_where=z_t[1], z_presence=z_t[2],
                    z_presence_logit=z_t[3],
                    prop_h=prop["hidden_outputs"],
                    disc_h=disc["hidden_outputs"],
                    prior_stats=prop["prior_stats"],
                    presence_tm1=carry["z"][2],
                    cond_prop=out["conditioning_from_prop"],
                    prior_cond=out["expected_prop_prior_num_step"],
                )
                new_carry = dict(
                    z=z_t,
                    time_state=out["temporal_hidden_state"],
                    prior_state=out["prop_prior_state"],
                    prev_ids=out["ids"],
                    last_used_id=out["highest_used_ids"],
                )
                return new_carry, record

            p_x_given_z, glimpse = self.decoder.apply(
                params["decoder"], z_t[0], z_t[1], z_t[2]
            )

            # log weights (seq.py:271-276)
            data_ll = jnp.sum(p_x_given_z.log_prob(img), axis=(1, 2))
            kl = out["q_z_given_x"] - out["p_z"]
            log_weights = data_ll - kl

            if record_mode == "train":  # trimmed record, in-loop log-probs
                record = dict(
                    # where/presence under the full-record names so the
                    # aspect metric/penalty (models/model.py) is reported
                    # in EVERY record mode, including sample_from_prior
                    where=z_t[1],
                    presence=z_t[2],  # [B*k, S, 1]; _squeeze_last -> [B*k, S]
                    # posterior presence logits — the transient-discovery
                    # penalty (models/model.py) differentiates expected
                    # early-frame counts through these
                    presence_logit=z_t[3],
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

        if record_mode == "train" and not self.sample_from_prior:
            # deferred decode + log-probs: batched [T*B] passes instead of
            # T sequential links inside the scan (neither feeds the carry)
            flat = lambda x: x.reshape((T * B,) + x.shape[2:])
            zw = outputs.pop("z_what")
            zwh = outputs.pop("z_where")
            zp = outputs.pop("z_presence")
            # expose under the full-record names (and shapes: presence is
            # squeezed like the full record's) so regularisers (e.g. the
            # aspect penalty, models/model.py) see the same fields in both
            # record modes
            outputs["where"] = zwh
            outputs["presence"] = zp[..., 0]
            outputs["presence_logit"] = outputs.pop("z_presence_logit")[..., 0]

            lp = self.timestep.apply(
                params["timestep"], jax.random.PRNGKey(0),
                jax.tree_util.tree_map(flat, outputs.pop("prop_h")),
                tuple(flat(s) for s in outputs.pop("prior_stats")),
                flat(outputs.pop("presence_tm1")),
                jax.tree_util.tree_map(flat, outputs.pop("disc_h")),
                flat(outputs.pop("cond_prop")),
                flat(outputs.pop("prior_cond")),
                jnp.broadcast_to(ts[:, None, None].astype(jnp.float32),
                                 (T, B, 1)).reshape((T * B, 1)),
                method=SQAIRTimestep.batched_log_probs,
            )
            unflat = lambda x: x.reshape((T, B))
            outputs["log_q_z_given_x_per_sample"] = unflat(lp["q_z_given_x"])
            outputs["log_p_z_per_sample"] = unflat(lp["p_z"])
            outputs["discrete_log_prob"] = unflat(lp["discrete_log_prob"])
            outputs["num_prop_steps_per_sample"] = unflat(lp["num_prop_steps"])
            outputs["num_disc_steps_per_sample"] = unflat(lp["num_disc_steps"])
            outputs["num_steps_per_sample"] = jnp.sum(zp[..., 0], -1)

            p_x_given_z, _ = self.decoder.apply(
                params["decoder"], flat(zw), flat(zwh), flat(zp)
            )
            obs_flat = obs.reshape((T * B,) + obs.shape[2:])
            data_ll = jnp.sum(
                p_x_given_z.log_prob(obs_flat), axis=(1, 2)
            ).reshape((T, B))
            mse = jnp.mean(
                (obs_flat - p_x_given_z.mean) ** 2, axis=(1, 2)
            ).reshape((T, B))
            kl = (outputs["log_q_z_given_x_per_sample"]
                  - outputs["log_p_z_per_sample"])
            outputs["data_ll_per_sample"] = data_ll
            outputs["kl_per_sample"] = kl
            outputs["mse_per_timestep"] = mse
            outputs["log_weights_per_timestep"] = data_ll - kl
        return outputs
