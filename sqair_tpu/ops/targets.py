"""Optimisation targets: IWAE bound, VIMCO and REINFORCE estimators.

Reference: sqair/targets.py.  Particles live on the last axis.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def iwae(log_weights: jnp.ndarray) -> jnp.ndarray:
    """Importance-weighted ELBO: logsumexp(w) - log k  (targets.py:38-43)."""
    k = log_weights.shape[-1]
    return jax.scipy.special.logsumexp(log_weights, -1) - math.log(float(k))


def vimco_control_variate(target_per_particle: jnp.ndarray) -> jnp.ndarray:
    """Leave-one-out logsumexp baseline (targets.py:46-59).

    For particle j, replace log w_j by the arithmetic mean of the others and
    recompute the IWAE bound.
    """
    k = target_per_particle.shape[-1]
    summed = jnp.sum(target_per_particle, -1, keepdims=True)
    all_but_one_average = (summed - target_per_particle) / (k - 1.0)

    # baseline[..., j, :] = log weights with entry j replaced by its LOO mean
    diag = jnp.eye(k) * (all_but_one_average - target_per_particle)[..., None]
    baseline = target_per_particle[..., None] + diag
    return jax.scipy.special.logsumexp(baseline, -2) - math.log(float(k))


def vimco(log_weights: jnp.ndarray, log_probs: jnp.ndarray,
          elbo_iwae: jnp.ndarray | None = None) -> jnp.ndarray:
    """VIMCO surrogate loss (targets.py:62-75).

    :param log_weights: [..., k] per-particle log importance weights
    :param log_probs: same shape; log-prob of the *discrete* variables
    :param elbo_iwae: optional per-example IWAE bound [...]
    """
    control_variate = vimco_control_variate(log_weights)
    learning_signal = jax.lax.stop_gradient(log_weights - control_variate)
    log_probs = log_probs.reshape(log_weights.shape)
    reinforce_target = learning_signal * log_probs

    if elbo_iwae is None:
        elbo_iwae = iwae(log_weights)

    proxy_loss = -elbo_iwae[..., None] - reinforce_target
    return jnp.mean(proxy_loss)


def reinforce(log_weights: jnp.ndarray, log_probs: jnp.ndarray,
              elbo_iwae: jnp.ndarray | None = None) -> jnp.ndarray:
    """REINFORCE surrogate (targets.py:78-90)."""
    learning_signal = jax.lax.stop_gradient(log_weights)
    log_probs = log_probs.reshape(log_weights.shape)
    reinforce_target = learning_signal * log_probs

    if elbo_iwae is None:
        elbo_iwae = iwae(log_weights)

    proxy_loss = -elbo_iwae[..., None] - reinforce_target
    return jnp.mean(proxy_loss)


def l2_reg(params, weight: float) -> jnp.ndarray:
    """0.5 * weight * sum ||p||^2 over trainable params (targets.py:31-35)."""
    if weight == 0.0:
        return jnp.asarray(0.0)
    sq = sum(jnp.sum(p**2) for p in jax.tree_util.tree_leaves(params))
    return 0.5 * weight * sq
