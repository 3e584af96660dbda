"""Hand-rolled probability distributions.

The reference leans on ``tf.contrib.distributions``; these are the exact
log-prob/sampling formulas SQAIR needs, written as small pytree dataclasses
so they can live inside jit/scan bodies.  Parity notes are cited per class.

All distributions are float32 by design.  The one float64 island in the
reference (the NumSteps pmf, sqair/prior.py:61-67) is replaced by a
*log-space* computation which is strictly more stable on TPU (f64 is
emulated and slow on TPU).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from .math import clip_preserve

_LOG_2PI = math.log(2.0 * math.pi)


@struct.dataclass
class Normal:
    """Diagonal Gaussian. Reference: tfd.Normal used throughout."""

    loc: jnp.ndarray
    scale: jnp.ndarray

    def sample(self, rng, sample_shape=()):
        shape = tuple(sample_shape) + jnp.broadcast_shapes(
            jnp.shape(self.loc), jnp.shape(self.scale)
        )
        eps = jax.random.normal(rng, shape, dtype=jnp.result_type(self.loc))
        return self.loc + self.scale * eps

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return -0.5 * z**2 - jnp.log(self.scale) - 0.5 * _LOG_2PI

    @property
    def mean(self):
        return self.loc


@struct.dataclass
class Bernoulli:
    """Bernoulli over {0., 1.} float samples (reference uses dtype=tf.float32).

    ``log_prob`` uses the numerically-stable logits form
    ``x * l - softplus(l)`` (identical to tfd.Bernoulli).
    """

    logits: jnp.ndarray

    @classmethod
    def from_probs(cls, probs, eps=1e-7):
        p = jnp.clip(probs, eps, 1.0 - eps)
        return cls(logits=jnp.log(p) - jnp.log1p(-p))

    @property
    def probs(self):
        return jax.nn.sigmoid(self.logits)

    def sample(self, rng, sample_shape=()):
        shape = tuple(sample_shape) + jnp.shape(self.logits)
        u = jax.random.uniform(rng, shape)
        return (u < jax.nn.sigmoid(self.logits)).astype(jnp.float32)

    def log_prob(self, x):
        return x * self.logits - jax.nn.softplus(self.logits)


@struct.dataclass
class Geometric:
    """Number of successes before the first failure.

    tfd.Geometric(probs=q): pmf(k) = (1-q)^k * q.  The reference builds it
    with q = 1 - step_success_prob (sqair/sqair_modules.py:206).
    """

    probs: jnp.ndarray  # "stop" probability q

    def log_prob(self, k):
        q = self.probs
        return k * jnp.log1p(-q) + jnp.log(q)

    def sample(self, rng, sample_shape=()):
        shape = tuple(sample_shape) + jnp.shape(self.probs)
        u = jax.random.uniform(rng, shape)
        # inverse cdf of geometric
        return jnp.floor(jnp.log1p(-u) / jnp.log1p(-self.probs))


@struct.dataclass
class Categorical:
    logits: jnp.ndarray  # [..., K]

    @property
    def log_probs(self):
        return jax.nn.log_softmax(self.logits, -1)

    @property
    def probs(self):
        return jax.nn.softmax(self.logits, -1)

    def log_prob(self, k):
        lp = self.log_probs
        k = jnp.asarray(k, jnp.int32)
        return jnp.take_along_axis(lp, k[..., None], axis=-1)[..., 0]

    def sample(self, rng, sample_shape=()):
        return jax.random.categorical(
            rng, self.logits, axis=-1, shape=tuple(sample_shape) + jnp.shape(self.logits)[:-1]
        )


@struct.dataclass
class MultivariateNormalTriL:
    """MVN with lower-triangular scale.

    Reference: tfd.MultivariateNormalTriL via AffineDiagNormal
    (sqair/modules.py:527-545).  ``log_prob`` uses |diag| in the log-det so
    that an unconstrained learned Cholesky cannot NaN (the reference runs
    with validate_args=False and takes the same risk without the abs).
    """

    loc: jnp.ndarray  # [..., d]
    scale_tril: jnp.ndarray  # [..., d, d]

    def sample(self, rng, sample_shape=()):
        shape = tuple(sample_shape) + jnp.shape(self.loc)
        eps = jax.random.normal(rng, shape)
        return self.loc + jnp.einsum("...ij,...j->...i", self.scale_tril, eps)

    def log_prob(self, x):
        d = self.loc.shape[-1]
        diff = x - self.loc
        sol = jax.scipy.linalg.solve_triangular(self.scale_tril, diff[..., None], lower=True)
        sol = sol[..., 0]
        log_det = jnp.sum(jnp.log(jnp.abs(_diag(self.scale_tril))), -1)
        return -0.5 * jnp.sum(sol**2, -1) - log_det - 0.5 * d * _LOG_2PI


def _diag(x):
    return jnp.diagonal(x, axis1=-2, axis2=-1)


def fill_triangular(vec: jnp.ndarray, d: int) -> jnp.ndarray:
    """Packs a ``d*(d+1)//2`` vector into a lower-triangular [d, d] matrix.

    The exact packing order differs from tfd.fill_triangular; since the
    vector is a learned parameter this is a pure reparametrisation.
    """
    rows, cols = jnp.tril_indices(d)
    out = jnp.zeros(vec.shape[:-1] + (d, d), vec.dtype)
    return out.at[..., rows, cols].set(vec)


class NumStepsDistribution:
    """AIR-style distribution over the number of objects.

    Converts per-slot Bernoulli presence into p(n):
      p(0) = 1-p_1;  p(n) = (1-p_{n+1}) * prod_{i<=n} p_i;  p(S) = prod p_i.
    Reference: sqair/prior.py:61-106 (float64 cumprod + renorm).  Here the
    pmf is built in log space from logits, which cannot under/overflow, and
    the final renormalisation matches the reference's.
    """

    def __init__(self, steps_probs: Optional[jnp.ndarray] = None,
                 logits: Optional[jnp.ndarray] = None):
        if logits is None:
            assert steps_probs is not None
            p = jnp.clip(steps_probs, 1e-7, 1.0 - 1e-7)
            logits = jnp.log(p) - jnp.log1p(-p)
            self._steps_probs = steps_probs
        else:
            self._steps_probs = jax.nn.sigmoid(logits)
        self._logits = logits

        log_p = jax.nn.log_sigmoid(logits)  # log p_i
        log_ip = jax.nn.log_sigmoid(-logits)  # log (1 - p_i)
        cum = jnp.cumsum(log_p, -1)
        log_pmf = jnp.concatenate(
            [log_ip[..., :1], log_ip[..., 1:] + cum[..., :-1], cum[..., -1:]], -1
        )
        self._log_pmf = log_pmf - jax.scipy.special.logsumexp(log_pmf, -1, keepdims=True)

    @property
    def probs(self):
        """Full pmf over {0..S} (reference `probs` property)."""
        return jnp.exp(self._log_pmf)

    def log_prob(self, n):
        n = jnp.asarray(n, jnp.int32)
        lp = jnp.take_along_axis(self._log_pmf, n[..., None], axis=-1)[..., 0]
        # reference clips prob to [1e-16, 1] with a gradient-preserving clip
        return clip_preserve(lp, math.log(1e-16), 0.0)

    def prob(self, n):
        return jnp.exp(self.log_prob(n))

    def sample(self, rng, sample_shape=()):
        b = Bernoulli(logits=self._logits).sample(rng, sample_shape)
        return jnp.sum(jnp.cumprod(b, -1), -1)
