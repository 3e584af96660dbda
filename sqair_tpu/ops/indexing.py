"""Indexing / reordering ops (reference: sqair/index.py).

The reference's ``tf.dynamic_partition``-based present-first reordering is
replaced by a *stable argsort + one-hot permutation matmul* — fixed shapes,
no dynamic partitions, and bitwise-equivalent ordering semantics.  The
matmul form matters: a ``take_along_axis`` gather of [B, 2S, 256] states
lowers to a serialized TPU gather (~2.4 ms per call, measured ~85% of the
whole SQAIR train step), while the equivalent one-hot permutation applied
with an MXU matmul is ~10 us.  With 0/1 matrices and HIGHEST precision the
matmul is exact (each output is one value times 1.0 plus zeros).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def tile_input_for_iwae(x: jnp.ndarray, k: int, with_time: bool = False) -> jnp.ndarray:
    """Tiles the batch axis by k with contiguous particles per example.

    Matches sqair/index.py:106-129: expand after batch axis, tile, reshape,
    i.e. tiled index = b*k + particle.  ``jnp.repeat`` does exactly this.
    """
    axis = 1 if with_time else 0
    return jnp.repeat(x, k, axis=axis)


def presence_sort_matrix(presence: jnp.ndarray,
                         top_k: Optional[int] = None) -> jnp.ndarray:
    """One-hot permutation that moves present objects to the front.

    Stable: relative order is preserved inside the present and absent
    groups (the reference's dynamic_partition semantics, index.py:132-165).

    :param presence: [B, K] float or bool
    :param top_k: keep only the first ``top_k`` output slots (fused truncate)
    :return: [B, K_out, K] 0/1 float matrix; reorder x via P @ x
    """
    absent = (presence <= 0.5).astype(jnp.int32)
    order = jnp.argsort(absent, axis=1, stable=True)  # [B, K]
    if top_k is not None:
        order = order[:, :top_k]
    return jax.nn.one_hot(order, presence.shape[1], dtype=jnp.float32)


def apply_permutation(perm: jnp.ndarray, tensors):
    """Applies a [B, K_out, K] 0/1 permutation to a pytree of [B, K, ...].

    All leaves are flattened to [B, K, D], concatenated, permuted with ONE
    einsum on the MXU, and split back.  HIGHEST precision makes the one-hot
    matmul bitwise-exact for f32 values.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tensors)
    B, K_out, K = perm.shape
    shapes = [x.shape for x in leaves]
    flat = [x.reshape((B, K, -1)).astype(jnp.float32) for x in leaves]
    sizes = [f.shape[-1] for f in flat]
    cat = flat[0] if len(flat) == 1 else jnp.concatenate(flat, -1)
    out = jnp.einsum("bij,bjd->bid", perm, cat,
                     precision=jax.lax.Precision.HIGHEST)
    outs = jnp.split(out, np.cumsum(sizes)[:-1], -1) if len(flat) > 1 else [out]
    res = [
        o.reshape((B, K_out) + s[2:]).astype(x.dtype)
        for o, s, x in zip(outs, shapes, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, res)


def select_present(tensors, presence: jnp.ndarray, top_k: Optional[int] = None):
    """Stable present-first reordering along the object axis.

    Present objects (presence > 0.5) move to the front of axis 1, absent to
    the back, preserving relative order inside each group — the exact
    semantics of the reference's 2B-way dynamic_partition trick
    (sqair/index.py:132-195).  Implemented as a one-hot permutation matmul
    (see module docstring for why).

    :param tensors: pytree of arrays shaped [B, K, ...]
    :param presence: [B, K] float or bool
    :param top_k: optionally return only the first top_k slots (fused
        truncation — the reference's ``[:, :n_steps]``, sqair_modules.py:556)
    :return: pytree with axis 1 reordered (and truncated if top_k)
    """
    perm = presence_sort_matrix(presence, top_k)
    return apply_permutation(perm, tensors)


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
