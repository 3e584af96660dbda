"""Device-mesh data parallelism.

The reference is strictly single-GPU (SURVEY §2.2/§5.8) — this module is
the new first-class distributed component: a 1-D data mesh over ICI,
params replicated, batch (with IWAE particles folded in) sharded, gradient
all-reduce inserted by XLA's SPMD partitioner.  The model is a few M params
with 256-wide matmuls, so tensor/pipeline sharding has nothing to cut —
batch x particles is the scaling axis (cf. SURVEY §2.2).

Usage:
    mesh = make_mesh()                      # all local devices
    step = make_parallel_train_step(model, optimizer, mesh)
    params, opt_state, metrics = step(params, opt_state, rng, obs, nums)
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.model import Model

DATA_AXIS = "data"
DCN_AXIS = "dcn"


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = DATA_AXIS) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_multislice_mesh(n_slices: int,
                         devices: Optional[Sequence] = None) -> Mesh:
    """2-D (dcn, data) mesh for multi-slice scale-out (SURVEY §5.8).

    Slices are the leading axis so the slow DCN fabric only carries the
    final cross-slice gradient reduction; the per-slice all-reduce rides
    ICI.  With pure data parallelism both axes shard the batch — see
    ``multislice_batch_spec`` — and GSPMD emits a hierarchical
    reduce-scatter/all-gather matching the mesh topology.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if len(devices) % n_slices:
        raise ValueError(f"{len(devices)} devices not divisible into "
                         f"{n_slices} slices")
    grid = np.asarray(devices).reshape(n_slices, -1)
    return Mesh(grid, (DCN_AXIS, DATA_AXIS))


def _data_axes(mesh: Mesh):
    """Mesh axes the batch shards over (both, for a multislice mesh)."""
    if DCN_AXIS in mesh.axis_names:
        return (DCN_AXIS, DATA_AXIS)
    return DATA_AXIS


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, time_major: bool = True) -> NamedSharding:
    """[T, B, ...] sharded on B (or [B, ...] on axis 0).

    On a multislice (dcn, data) mesh the batch shards over BOTH axes."""
    axes = _data_axes(mesh)
    spec = P(None, axes) if time_major else P(axes)
    return NamedSharding(mesh, spec)


def shard_batch(batch, mesh: Mesh, time_major: bool = True):
    """Places a host batch onto the mesh with the data axis sharded."""
    sh = batch_sharded(mesh, time_major)
    return jax.tree_util.tree_map(lambda x: jax.device_put(jnp.asarray(x), sh), batch)


def make_parallel_train_step(model: Model, optimizer: optax.GradientTransformation,
                             mesh: Mesh, l2_weight: float = 0.0,
                             donate: bool = True) -> Callable:
    """SPMD train step: params/opt-state replicated, batch sharded.

    XLA inserts the gradient all-reduce over ICI because the replicated
    output params must agree across shards (GSPMD).
    """
    repl = replicated(mesh)
    data = batch_sharded(mesh)

    def loss_fn(params, rng, obs, nums):
        target, aux = model.loss_and_metrics(params, rng, obs, nums, l2_weight,
                                             record_mode="train")
        return target, aux["metrics"]

    def train_step(params, opt_state, rng, obs, nums):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, rng, obs, nums
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    from ..ops.fused_cells import jit_compiler_options

    return jax.jit(
        train_step,
        in_shardings=(repl, repl, repl, data, data),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1) if donate else (),
        compiler_options=jit_compiler_options(),
    )


def make_parallel_eval_step(model: Model, mesh: Mesh) -> Callable:
    repl = replicated(mesh)
    data = batch_sharded(mesh)

    def eval_step(params, rng, obs, nums):
        _, aux = model.loss_and_metrics(params, rng, obs, nums)
        return aux["metrics"]

    from ..ops.fused_cells import jit_compiler_options

    return jax.jit(eval_step, in_shardings=(repl, repl, data, data),
                   out_shardings=repl, compiler_options=jit_compiler_options())
