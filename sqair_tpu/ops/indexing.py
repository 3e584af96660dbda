"""Indexing / reordering ops (reference: sqair/index.py).

The reference's ``tf.dynamic_partition``-based present-first reordering is
replaced by a *stable argsort + gather* — fixed shapes, no dynamic
partitions, TPU-friendly, and bitwise-equivalent ordering semantics.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def tile_input_for_iwae(x: jnp.ndarray, k: int, with_time: bool = False) -> jnp.ndarray:
    """Tiles the batch axis by k with contiguous particles per example.

    Matches sqair/index.py:106-129: expand after batch axis, tile, reshape,
    i.e. tiled index = b*k + particle.  ``jnp.repeat`` does exactly this.
    """
    axis = 1 if with_time else 0
    return jnp.repeat(x, k, axis=axis)


def select_present(tensors, presence: jnp.ndarray):
    """Stable present-first reordering along the object axis.

    Present objects (presence > 0.5) move to the front of axis 1, absent to
    the back, preserving relative order inside each group — the exact
    semantics of the reference's 2B-way dynamic_partition trick
    (sqair/index.py:132-195).

    :param tensors: pytree of arrays shaped [B, K, ...]
    :param presence: [B, K] float or bool
    :return: pytree with axis 1 reordered
    """
    absent = (presence <= 0.5).astype(jnp.int32)
    order = jnp.argsort(absent, axis=1, stable=True)  # [B, K]

    def gather(x):
        idx = order.reshape(order.shape + (1,) * (x.ndim - 2))
        return jnp.take_along_axis(x, jnp.broadcast_to(idx, x.shape[:2] + x.shape[2:]), axis=1)

    return jax.tree_util.tree_map(gather, tensors)


def compute_object_ids(last_used_id: jnp.ndarray, prev_ids: jnp.ndarray,
                       propagated_pres: jnp.ndarray, discovery_pres: jnp.ndarray):
    """Assigns IDs: propagated keep theirs, discovered get fresh ones.

    Reference: sqair/index.py:198-221.
    :param last_used_id: [B, 1]
    :param prev_ids: [B, S, 1]
    :param propagated_pres: [B, S, 1]
    :param discovery_pres: [B, S, 1]
    :return: (new last_used_id [B, 1], new_ids [B, 2S, 1])
    """
    prop_ids = prev_ids * propagated_pres - (1.0 - propagated_pres)
    id_increments = jnp.cumsum(discovery_pres, 1)
    disc_ids = id_increments + last_used_id[:, None]
    last_used_id = last_used_id + id_increments[:, -1]
    disc_ids = disc_ids * discovery_pres - (1.0 - discovery_pres)
    new_ids = jnp.concatenate([prop_ids, disc_ids], 1)
    return last_used_id, new_ids


def sample_from_tensor(tensor: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gathers tensor[..., idx[...]] along the last axis (index.py:48-71)."""
    idx = jnp.asarray(idx, jnp.int32)
    return jnp.take_along_axis(tensor, idx[..., None], axis=-1)[..., 0]


def gather_axis(tensor: jnp.ndarray, idx: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Gathers 1-D indices along ``axis`` (index.py:74-103)."""
    return jnp.take(tensor, idx, axis=axis)
