"""Propagation: priors, slot-wise SSM, and the Propagate module.

Reference: sqair/propagate.py + sqair/sqair_modules.py:232-329.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import state_feature
from ..ops import distributions as D
from .core import HIDDEN_OUTPUT_FIELDS, PropagationCore


class PropagatePrior(nn.Module):
    """Per-object RNN prior (propagate.py:48-120).

    Input (what_tm1, where_tm1) -> cell -> Linear(2*(4+n_what)+1) ->
    (where loc/scale, what loc/scale, prop logit).  Dead objects are locked
    dead via the -88 logit trick.
    """

    n_what: int
    cell: nn.Module
    prop_logit_bias: float = 10.0
    where_loc_bias: Optional[Tuple[float, ...]] = None
    mode: str = "rnn"  # one of {rnn, rw, guided}

    def setup(self):
        n_outputs = 2 * (4 + self.n_what) + 1
        self._readout = nn.Dense(n_outputs)

    def initial_state(self, batch_size: int, trainable: bool = True):
        return self.cell.initial_state(batch_size, trainable)

    def __call__(self, z_tm1, prior_rnn_hidden_state):
        """:param z_tm1: (what [B,S,n], where [B,S,4], presence [B,S,1],
            presence_logit [B,S,1])
        :param prior_rnn_hidden_state: state tuple of [B,S,U]
        :return: (prior_stats 5-tuple, new state)
        """
        what_tm1, where_tm1, presence_tm1, presence_logit_tm1 = z_tm1
        B, S = what_tm1.shape[:2]

        inpt = jnp.concatenate([what_tm1, where_tm1], -1)
        # BatchApply over (B, S): flatten, step the cell once per object
        flat_inpt = inpt.reshape((B * S, -1))
        flat_state = tuple(s.reshape((B * S, -1)) for s in prior_rnn_hidden_state)
        flat_state, outputs = self.cell(flat_state, flat_inpt)
        new_state = tuple(s.reshape((B, S, -1)) for s in flat_state)
        outputs = outputs.reshape((B, S, -1))

        stats = self._readout(outputs)
        prop_logit, stats = stats[..., :1], stats[..., 1:]
        prop_logit = prop_logit + self.prop_logit_bias
        prop_logit = presence_tm1 * prop_logit + (presence_tm1 - 1.0) * 88.0

        locs, scales = jnp.split(stats, 2, -1)
        where_loc, what_loc = locs[..., :4], locs[..., 4:]
        where_scale, what_scale = (
            jax.nn.softplus(scales[..., :4]) + 1e-2,
            jax.nn.softplus(scales[..., 4:]) + 1e-2,
        )
        if self.where_loc_bias is not None:
            where_loc = where_loc + jnp.asarray(self.where_loc_bias).reshape((1, 1, 4))

        # random-walk / guided-walk variants (propagate.py:123-158)
        if self.mode == "rw":
            where_loc = where_tm1
            what_loc = what_tm1
            prop_logit = presence_logit_tm1 + 0.1 * prop_logit
        elif self.mode == "guided":
            where_loc = where_tm1 + 0.1 * where_loc
            what_loc = what_tm1 + 0.1 * what_loc
            prop_logit = presence_logit_tm1 + 0.1 * prop_logit

        prior_stats = (where_loc, where_scale, what_loc, what_scale, prop_logit)
        return prior_stats, new_state

    @staticmethod
    def make_distribs(prior_stats):
        """(propagate.py:113-120)"""
        where_loc, where_scale, what_loc, what_scale, prop_logit = prior_stats
        what_prior = D.Normal(what_loc, what_scale)
        where_prior = D.Normal(where_loc, where_scale)
        prop_prior = D.Bernoulli(logits=prop_logit[..., 0])
        return what_prior, where_prior, prop_prior


PRIOR_MODES = ("rnn", "rw", "guided")


class Propagate(nn.Module):
    """Propagates existing objects through one frame
    (sqair_modules.py:232-329)."""

    ssm_cell: PropagationCore
    prior: PropagatePrior

    def prior_init_state(self, batch_size, trainable=True):
        return self.prior.initial_state(batch_size, trainable)

    def log_probs_only(self, presence_tm1, hidden_outputs, prior_stats,
                       delta_what, delta_where) -> Dict:
        """Posterior/prior log-probs from recorded samples/stats (the
        deferred, batched-over-time pass; math identical to the in-loop
        path)."""
        _, log_probs = self._compute_log_probs(
            jax.random.PRNGKey(0), presence_tm1, hidden_outputs, prior_stats,
            delta_what, delta_where, False, None,
        )
        return log_probs

    def __call__(self, rng, img, z_tm1, temporal_state, prior_state,
                 sample_from_prior=False, do_generate=None,
                 compute_log_probs: bool = True) -> Dict:
        """:param img: [B, H, W]
        :param z_tm1: (what, where, presence, presence_logit), each [B, S, d]
        :param temporal_state: state tuple of [B, S, U]
        :param prior_state: state tuple of [B, S, U]
        """
        presence_tm1 = z_tm1[2]
        prior_stats, prior_state = self.prior(z_tm1, prior_state)

        rng, ssm_rng = jax.random.split(rng)
        hidden_outputs, num_steps, delta_what, delta_where, temporal_state = self._ssm(
            ssm_rng, img, z_tm1, temporal_state
        )
        if compute_log_probs:
            hidden_outputs, log_probs = self._compute_log_probs(
                rng, presence_tm1, hidden_outputs, prior_stats, delta_what,
                delta_where, sample_from_prior, do_generate,
            )
        else:
            assert not sample_from_prior, (
                "deferred log-probs only supported on the plain train path")
            log_probs = {}

        outputs = dict(
            prior_stats=prior_stats,
            prior_state=prior_state,
            hidden_outputs=hidden_outputs,
            num_steps=num_steps,
            temporal_state=temporal_state,
        )
        outputs.update(hidden_outputs)
        outputs.update(log_probs)
        return outputs

    def _fused_prop_params(self):
        """Raw weights for the fused frame kernel, or None if ineligible."""
        import math
        import os

        from ..nn.layers import GRU, VanillaRNN
        from ..ops import fused as _fused

        if not os.environ.get("SQAIR_FUSE_CELLS") or not _fused.use_pallas():
            return None  # opt-in kernels, see Discover._fused_disc_params
        if self.is_initializing():
            return None
        cell = self.ssm_cell
        if not isinstance(cell.transition, VanillaRNN):
            return None
        if not isinstance(cell.temporal_cell, GRU):
            return None
        if cell.where_update_scale != 1.0:
            return None
        if not cell.glimpse_encoder.masked_glimpse:
            return None  # the fused kernel assumes the masked glimpse path
        sp_mod = cell.steps_predictor
        if (sp_mod.max_rel_logit_change != math.inf
                or sp_mod.max_logit_change != math.inf):
            return None
        if cell.glimpse_encoder.scale_offset != 0.0:
            return None
        try:
            tr = cell.transition.variables["params"]
            stp_m = cell.transform_estimator.variables["params"]
            stp = stp_m["MLP_0"]
            tree = cell.glimpse_encoder._fused_param_tree()
            sp = sp_mod.variables["params"]["MLP_0"]
            wb = cell._where_bias_mlp.variables["params"]
            chol = cell._where_distrib.variables["params"]["cholesky_scale"]
            gru = cell.temporal_cell.variables["params"]
            td = cell._temporal_what_distrib.variables["params"]["Dense_0"]
            gates = cell._gates.variables["params"]
            if (tree is None or tree[2] is None
                    or "w_3" in stp or "w_2" not in stp
                    or "w_2" in sp or "w_1" not in sp
                    or "w_2" in wb or "w_1" not in wb
                    or chol.shape != (10, 1)):
                return None
            from ..ops import fused_cells
            from ..ops.distributions import fill_triangular

            enc_params, (head_w, head_b), mask_params = tree
            p = fused_cells.PropParams(
                wb=((wb["w_0"], wb["b_0"]), (wb["w_1"], wb["b_1"])),
                mask=mask_params,
                ge_enc=enc_params,
                ge_head=(head_w, head_b),
                rnn=(tr["in_to_hidden_w"], tr["hidden_to_hidden_w"],
                     tr["in_to_hidden_b"]),
                stp=((stp["w_0"], stp["b_0"]), (stp["w_1"], stp["b_1"]),
                     (stp["w_2"], stp["b_2"])),
                stp_offset=stp_m["scale_offset"],
                tril=fill_triangular(chol[:, 0], 4),
                gru=(gru["gates_xw"], gru["gates_hw"], gru["gates_b"],
                     gru["candidate_xw"], gru["candidate_hw"],
                     gru["candidate_b"]),
                td=(td["kernel"], td["bias"]),
                gates=(gates["w_0"], gates["b_0"]),
                sp=((sp["w_0"], sp["b_0"]), (sp["w_1"], sp["b_1"])),
            )
            return p, tr["h0"]
        except (KeyError, AttributeError, ValueError):
            return None

    def _ssm_fused(self, fp, rng, img, z_tm1, temporal_state):
        """All S propagation slots as one Pallas kernel (ops/fused_cells.py)."""
        from ..ops import fused_cells

        p, h0 = fp
        S, B = z_tm1[0].shape[1], img.shape[0]
        n_what = z_tm1[0].shape[-1]
        T_ = lambda x: jnp.swapaxes(x, 0, 1)
        r1, r2, r3 = jax.random.split(rng, 3)
        eps_w = jax.random.normal(r1, (S, B, 4))
        eps_x = jax.random.normal(r2, (S, B, n_what))
        u = jax.random.uniform(r3, (S, B, 1))
        out = fused_cells.fused_prop_ssm(
            img, tuple(T_(z) for z in z_tm1), T_(temporal_state[0]), h0,
            eps_w, eps_x, u, p, self.ssm_cell.glimpse_size,
        )
        stacked = {k: T_(out[k]) for k in HIDDEN_OUTPUT_FIELDS}
        delta_what = T_(out["what_sample"])
        delta_where = T_(out["where_sample"])
        temporal_state = (T_(out["temporal_h"]),)
        num_steps = jnp.sum(stacked["presence"][..., 0], -1)
        return stacked, num_steps, delta_what, delta_where, temporal_state

    def _ssm(self, rng, img, z_tm1, temporal_state):
        """Slot unroll of the propagation core (propagate.py:161-184)."""
        fp = self._fused_prop_params() if len(temporal_state) == 1 else None
        if fp is not None:
            return self._ssm_fused(fp, rng, img, z_tm1, temporal_state)

        S = z_tm1[0].shape[1]
        state = self.ssm_cell.initial_state(img)

        per_slot, new_temporal = [], []
        for k in range(S):
            slot_rng = jax.random.fold_in(rng, k)
            z_slot = tuple(z[:, k] for z in z_tm1)
            t_slot = tuple(t[:, k] for t in temporal_state)
            outputs, state, t_new = self.ssm_cell(slot_rng, state, z_slot, t_slot)
            per_slot.append(outputs)
            new_temporal.append(t_new)

        stacked = {k: jnp.stack([o[k] for o in per_slot], 1) for k in per_slot[0]}
        temporal_state = tuple(
            jnp.stack([t[i] for t in new_temporal], 1) for i in range(len(new_temporal[0]))
        )

        delta_what = stacked.pop("what_sample")
        delta_where = stacked.pop("where_sample")
        num_steps = jnp.sum(stacked["presence"][..., 0], -1)
        return stacked, num_steps, delta_what, delta_where, temporal_state

    def _compute_log_probs(self, rng, presence_tm1, hidden_outputs, prior_stats,
                           delta_what, delta_where, sample_from_prior, do_generate):
        """(sqair_modules.py:281-326)"""
        presence = hidden_outputs["presence"][..., 0]  # [B, S]
        presence_tm1 = presence_tm1[..., 0]

        # posteriors: what Normal, where AffineDiagNormal, presence Bernoulli
        what_post = D.Normal(hidden_outputs["what_loc"], hidden_outputs["what_scale"])
        where_post = self.ssm_cell.make_where_posterior(
            hidden_outputs["where_loc"], hidden_outputs["where_scale"]
        )
        pres_post = D.Bernoulli(logits=hidden_outputs["presence_logit"][..., 0])

        priors = PropagatePrior.make_distribs(prior_stats)

        samples = [delta_what, delta_where, presence]
        if sample_from_prior:
            rngs = jax.random.split(rng, 3)
            p_samples = [p.sample(r) for p, r in zip(priors, rngs)]
            dg = jnp.asarray(0.0 if do_generate is None else do_generate, jnp.float32)
            ndg = 1.0 - dg
            hidden_outputs = dict(hidden_outputs)
            hidden_outputs["what"] = dg * p_samples[0] + ndg * hidden_outputs["what"]
            hidden_outputs["where"] = dg * p_samples[1] + ndg * hidden_outputs["where"]
            pres = p_samples[2][..., None]
            hidden_outputs["presence"] = dg * pres + ndg * hidden_outputs["presence"]
            samples = p_samples
            # NB: as in the reference, the masks below keep the posterior
            # presence even after the generative override

        what_lp = jnp.sum(what_post.log_prob(samples[0]), -1)
        where_lp = where_post.log_prob(samples[1])  # event already reduced
        pres_lp = pres_post.log_prob(samples[2])

        prop_prob = jnp.exp(pres_lp) * presence_tm1  # [B, S]

        mask = presence_tm1 * presence
        what_lp = what_lp * mask
        where_lp = where_lp * mask
        pres_lp = jnp.sum(pres_lp * presence_tm1, -1)  # [B]

        # priors evaluated on the (possibly overridden) absolute samples
        what_prior_lp = jnp.sum(priors[0].log_prob(hidden_outputs["what"]), -1) * mask
        where_prior_lp = jnp.sum(priors[1].log_prob(hidden_outputs["where"]), -1) * mask
        pres_prior_lp = jnp.sum(priors[2].log_prob(presence) * presence_tm1, -1)

        o = dict(
            prop_prob=prop_prob,
            q_z_given_x=jnp.sum(what_lp + where_lp, -1) + pres_lp,
            p_z=jnp.sum(what_prior_lp + where_prior_lp, -1) + pres_prior_lp,
            what_log_prob=what_lp,
            where_log_prob=where_lp,
            prop_log_prob=pres_lp,
            what_prior_log_prob=what_prior_lp,
            where_prior_log_prob=where_prior_lp,
            prop_prior_log_prob=pres_prior_lp,
        )
        return hidden_outputs, o
