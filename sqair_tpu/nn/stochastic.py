"""Stochastic modules: parametrised distributions (reference: sqair/modules.py).

All sampling takes explicit rng keys; modules return distribution structs
from sqair_tpu.ops.distributions.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import distributions as D
from .layers import MLP, VanillaRNN, const_init


class GaussianFromParamVec(nn.Module):
    """Diagonal Gaussian from a feature vector (modules.py:39-74).

    scale = softplus(s + scale_offset) + min_std with min_std=1e-2 (the
    reference stores min_std as a non-trainable variable; it is a constant).
    """

    n_dim: int
    scale_offset: float = 0.0
    min_std: float = 1e-2

    @nn.compact
    def __call__(self, x) -> D.Normal:
        if x.shape[-1] != 2 * self.n_dim:
            x = nn.Dense(2 * self.n_dim)(x)
        loc, scale = jnp.split(x, 2, -1)
        scale = jax.nn.softplus(scale + self.scale_offset) + self.min_std
        return D.Normal(loc, scale)


class StochasticTransformParam(nn.Module):
    """MLP -> (where loc, where scale-logit + learnable offset).

    Reference: modules.py:77-97; the scalar offset is a trainable variable
    initialised to ``transform_var_bias`` (-3 by default).
    """

    n_hiddens: Any
    scale_offset: float = -2.0

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = x.reshape(x.shape[:-1] + (-1,)) if x.ndim > 2 else x
        params = MLP(self.n_hiddens, n_out=8)(x)
        offset = self.param("scale_offset", const_init(self.scale_offset), ())
        return params[..., :4], params[..., 4:] + offset


class StepsPredictor(nn.Module):
    """Presence logit MLP with the dead-object saturation trick.

    Reference: modules.py:470-524.  ``logit = prev*logit + (prev-1)*88``
    keeps dead objects dead (-88 saturates sigmoid to 0 in f32 while
    staying finite).  Optional logit-change clamps kept for parity.
    """

    n_hiddens: Any
    steps_bias: float = 0.0
    max_rel_logit_change: float = math.inf
    max_logit_change: float = math.inf

    @nn.compact
    def __call__(self, previous_presence, previous_logit, *features,
                 extra_logit=0.0, logit_scale=1.0,
                 logit_clamp=None) -> D.Bernoulli:
        """:param extra_logit: additive logit offset (scalar, may be traced)
            — used for the time-dependent early-frame discovery suppression
            (Discover.early_disc_logit_bias); 0 elsewhere.  Applied before
            the dead-object saturation so dead slots stay dead.
        :param logit_scale: multiplicative logit factor (scalar, may be
            traced).  The round-5 desaturation lever: the trained
            discovery posterior keeps spurious early-frame boxes at
            logits 10-45 (tools/diag_presence_logits.py), where Bernoulli
            samples have no variance across particles and VIMCO passes no
            gradient.  Scaling by e.g. 0.15 maps the population into the
            stochastic region while preserving the confidence ordering.
        :param logit_clamp: straight-through |logit| cap (None = off):
            forward clip to [-c, c], backward identity — desaturates
            sampling without damping the MLP's gradient."""
        feat = jnp.concatenate(
            [f for f in jax.tree_util.tree_leaves(features)], -1
        )
        logit = MLP(
            self.n_hiddens, n_out=1, output_bias_init=const_init(self.steps_bias)
        )(feat)
        logit = logit * logit_scale
        if logit_clamp is not None:
            clipped = jnp.clip(logit, -logit_clamp, logit_clamp)
            logit = logit + jax.lax.stop_gradient(clipped - logit)
        logit = logit + extra_logit
        logit = previous_presence * logit + (previous_presence - 1.0) * 88.0

        if previous_logit is not None:
            if self.max_rel_logit_change != math.inf:
                min_logit = (1.0 - self.max_rel_logit_change) * previous_logit
                max_logit = (1.0 + self.max_rel_logit_change) * previous_logit
                logit = jnp.clip(logit, min_logit, max_logit)
            elif self.max_logit_change != math.inf:
                logit = previous_logit + self.max_logit_change * jnp.tanh(logit)

        return D.Bernoulli(logits=logit)


class AffineDiagNormal(nn.Module):
    """MVN with learned shared Cholesky rescaled per-sample.

    Reference: modules.py:527-545:
      tril = fill_triangular(param);  batch_tril = tril * scale[..., None]
      + diag(scale)  ->  MultivariateNormalTriL(loc, batch_tril).
    """

    n_dim: int = 4

    @nn.compact
    def __call__(self, loc, scale) -> D.MultivariateNormalTriL:
        d = self.n_dim
        chol = self.param(
            "cholesky_scale", nn.initializers.glorot_uniform(), (d * (d + 1) // 2, 1)
        )[:, 0]
        tril = D.fill_triangular(chol, d)
        # row i of the shared tril scaled by scale_i, plus diag(scale)
        batch_tril = tril * scale[..., :, None] + jnp.einsum(
            "...i,ij->...ij", scale, jnp.eye(d)
        )
        return D.MultivariateNormalTriL(loc, batch_tril)


class RecurrentNormalImpl(nn.Module):
    """Autoregressive Normal core (reference: modules.py:548-607).

    Deviation from the reference: the conditional initial state is projected
    back to the RNN state size (the reference feeds a 128-dim conditioned
    state into a 4-unit VanillaRNN, relying on TF variable-scope quirks;
    see SURVEY notes).  Same expressivity, shape-coherent.
    """

    n_dim: int
    n_hidden: int
    conditional: bool = False
    output_bias_init: Optional[Callable] = None

    def setup(self):
        self._rnn = VanillaRNN(self.n_dim)
        bias_init = self.output_bias_init or nn.initializers.zeros_init()
        self._readout = nn.Dense(2 * self.n_dim, bias_init=bias_init)
        self._init_sample = self.param(
            "init_sample", nn.initializers.truncated_normal(1.0), (1, self.n_dim)
        )
        if self.conditional:
            self._cond_hidden = nn.Dense(self.n_hidden)
            self._cond_out = nn.Dense(self.n_dim)

    def _initial(self, batch_size, conditioning):
        sample = jnp.tile(self._init_sample, (batch_size, 1))
        (state,) = self._rnn.initial_state(batch_size)
        if conditioning is not None:
            assert self.conditional, "Pass conditional=True to condition this prior."
            h = jnp.concatenate([state, conditioning], -1)
            state = self._cond_out(jax.nn.elu(self._cond_hidden(h)))
        return sample, state

    def _forward(self, rng, sample_m1, state, override_sample=None):
        (state,), out = self._rnn((state,), sample_m1)
        stats = self._readout(out)
        loc, scale = jnp.split(stats, 2, -1)
        scale = jax.nn.softplus(scale) + 1e-2
        pdf = D.Normal(loc, scale)
        if override_sample is None:
            sample = pdf.sample(rng)
        else:
            sample = override_sample
        return sample, state, loc, scale, pdf.log_prob(sample)

    def __call__(self, rng, batch_size=1, seq_len=1, override_samples=None,
                 conditioning=None):
        sample, state = self._initial(batch_size, conditioning)
        if override_samples is not None:
            seq_len = override_samples.shape[-2]

        samples, locs, scales, logps = [], [], [], []
        for i in range(seq_len):
            step_rng = jax.random.fold_in(rng, i)
            override = None if override_samples is None else override_samples[..., i, :]
            sample, state, loc, scale, lp = self._forward(step_rng, sample, state, override)
            samples.append(sample)
            locs.append(loc)
            scales.append(scale)
            logps.append(lp)

        stack = lambda xs: jnp.stack(xs, -2)
        return stack(samples), stack(locs), stack(scales), stack(logps)


class RecurrentNormal:
    """User-facing API over RecurrentNormalImpl (modules.py:610-630).

    This is a thin adapter: the impl module must be declared (setup) by the
    owning linen module; its *bound* instance is then wrapped here.
    """

    def __init__(self, impl: RecurrentNormalImpl):
        self._impl = impl

    def log_prob(self, samples, rng=None, conditioning=None):
        batch_size = samples.shape[0]
        if rng is None:
            rng = jax.random.PRNGKey(0)  # unused when overriding samples
        _, _, _, logprob = self._impl(
            rng, batch_size=batch_size, override_samples=samples, conditioning=conditioning
        )
        return logprob

    def sample(self, rng, sample_size=(1, 1), conditioning=None):
        n, length = sample_size
        samples, _, _, _ = self._impl(
            rng, batch_size=n, seq_len=length, conditioning=conditioning
        )
        return samples


class ConditionedNormalAdaptor(D.Normal):
    """Normal that ignores `conditioning` kwargs (modules.py:633-644)."""

    def log_prob(self, x, conditioning=None):
        return super().log_prob(x)

    def sample(self, rng, sample_shape=(), conditioning=None):
        return super().sample(rng, sample_shape)
