"""Misc math ops (reference: sqair/ops.py).

All functions are jit-able and shape-polymorphic over leading batch dims.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def clip_preserve(expr: jnp.ndarray, lo, hi) -> jnp.ndarray:
    """Clips the value but preserves the (unclipped) gradient.

    Equivalent of the reference's straight-through clip
    (sqair/ops.py:33-42): ``stop_gradient(clip(x) - x) + x``.
    """
    clipped = jnp.clip(expr, lo, hi)
    return jax.lax.stop_gradient(clipped - expr) + expr


def ess(weights: jnp.ndarray, average: bool = False) -> jnp.ndarray:
    """Effective sample size of normalised importance weights.

    Reference: sqair/ops.py:52-59.  ``weights`` has particles on the last
    axis; returns ``(sum w)^2 / sum w^2`` per row.
    """
    res = jnp.sum(weights, -1) ** 2 / jnp.sum(weights**2, -1)
    if average:
        res = jnp.mean(res)
    return res


def broadcast_against(tensor: jnp.ndarray, against: jnp.ndarray) -> jnp.ndarray:
    """Adds trailing size-1 dims until ranks match (reference ops.py:85-101;
    the tf.while_loop there is just static rank padding under jit)."""
    while tensor.ndim < against.ndim:
        tensor = tensor[..., None]
    return tensor


def delay_training_for(expr, global_step, num_train_iters: int):
    """Stop-gradient schedule: gradients flow only after num_train_iters.

    Reference: sqair/ops.py:104-121.  Functional form — the caller passes
    the global step instead of reading a graph collection.
    """
    if num_train_iters == 0:
        return expr
    is_trainable = (jnp.asarray(global_step) > num_train_iters).astype(jnp.float32)

    def delay(x):
        return is_trainable * x + (1.0 - is_trainable) * jax.lax.stop_gradient(x)

    return jax.tree_util.tree_map(delay, expr)


def maybe_concat(tensors, axis: int = -1) -> jnp.ndarray:
    """Concatenates a (possibly nested) list of tensors along ``axis``.

    Reference: sqair/ops.py:75-82.
    """
    flat = jax.tree_util.tree_leaves(tensors)
    if len(flat) > 1:
        return jnp.concatenate(flat, axis)
    return flat[0]


def flatten_left(x: jnp.ndarray, n_dims: int) -> jnp.ndarray:
    """Merges the leading ``n_dims`` dims into one (snt.BatchApply-style)."""
    return x.reshape((-1,) + x.shape[n_dims:])
