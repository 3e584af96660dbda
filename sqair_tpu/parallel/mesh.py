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


def _fused_kernels_active() -> bool:
    """True when ANY Pallas kernel would run on this backend.

    Not just the opt-in SQAIR_FUSE_CELLS frame kernels: the default MLP/
    RNN/GRU paths (nn/layers.py -> ops/fused.py) and the glimpse kernels
    (SQAIR_FUSE_GLIMPSE) also emit `pallas_call` whenever
    ``fused.use_pallas()`` is true (real TPU backend, not SQAIR_NO_PALLAS).
    `pallas_call` has no GSPMD partitioning rule, so on a multi-device
    mesh every Pallas family needs the shard_map strategy — keying this
    off SQAIR_FUSE_CELLS alone left default multi-chip runs silently
    replicating the batch under pjit."""
    from ..ops import fused

    return fused.use_pallas()


def _shard_index(axes):
    """Linear index of this device along the batch-sharding mesh axes."""
    from jax import lax

    if isinstance(axes, tuple):
        return (lax.axis_index(axes[0]) * lax.psum(1, axes[1])
                + lax.axis_index(axes[1]))
    return lax.axis_index(axes)


def make_parallel_train_step(model: Model, optimizer: optax.GradientTransformation,
                             mesh: Mesh, l2_weight: float = 0.0,
                             donate: bool = True,
                             use_shard_map: Optional[bool] = None) -> Callable:
    """SPMD train step: params/opt-state replicated, batch sharded.

    Two sharding strategies, same contract:

    - GSPMD (default): one logical program; XLA inserts the gradient
      all-reduce over ICI because the replicated output params must agree
      across shards.
    - shard_map (auto-selected whenever any Pallas kernel would run on
      this backend — i.e. every multi-device mesh on real TPU — or forced
      with ``use_shard_map=True``): `pallas_call` has no GSPMD
      partitioning rule, so under plain pjit any Pallas kernel forces
      silent replication of the batch.  Under `shard_map` each device runs
      the kernels on its LOCAL batch shard and the gradient reduction is
      an explicit `lax.pmean` over the data axes (both axes of a
      multislice mesh, hierarchical: ICI first, DCN once).  The per-shard
      RNG folds in the shard index so shards draw independent latents.
    """
    repl = replicated(mesh)
    data = batch_sharded(mesh)

    def loss_fn(params, rng, obs, nums):
        target, aux = model.loss_and_metrics(params, rng, obs, nums, l2_weight,
                                             record_mode="train")
        return target, aux["metrics"]

    from ..ops.fused_cells import jit_compiler_options

    if use_shard_map is None:
        use_shard_map = _fused_kernels_active() and mesh.size > 1

    if use_shard_map:
        from jax import lax

        axes = _data_axes(mesh)

        def local_loss_fn(params, rng, obs, nums):
            # axis_name makes the aspect penalty the GLOBAL ratio (value
            # and gradient match the GSPMD strategy; model.py)
            target, aux = model.loss_and_metrics(
                params, rng, obs, nums, l2_weight, record_mode="train",
                axis_name=axes)
            return target, aux["metrics"]

        def local_step(params, opt_state, rng, obs, nums):
            rng = jax.random.fold_in(rng, _shard_index(axes))
            (_, metrics), grads = jax.value_and_grad(local_loss_fn, has_aux=True)(
                params, rng, obs, nums
            )
            grads = lax.pmean(grads, axis_name=axes)
            metrics = jax.tree_util.tree_map(
                lambda m: lax.pmean(m, axis_name=axes), metrics
            )
            # ratio metrics (aspect): recompute num/den AFTER the pmean so
            # the value matches the GSPMD strategy's global ratio (ADVICE
            # r3 — mean of per-shard ratios is not the global ratio)
            metrics = Model.finalize_metrics(metrics)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        batch_spec = P(None, axes)
        train_step = jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(P(), P(), P(), batch_spec, batch_spec),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    else:
        def train_step(params, opt_state, rng, obs, nums):
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, rng, obs, nums
            )
            metrics = Model.finalize_metrics(metrics)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

    return jax.jit(
        train_step,
        in_shardings=(repl, repl, repl, data, data),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1) if donate else (),
        compiler_options=jit_compiler_options(),
    )


def make_parallel_eval_step(model: Model, mesh: Mesh,
                            use_shard_map: Optional[bool] = None) -> Callable:
    repl = replicated(mesh)
    data = batch_sharded(mesh)

    from ..ops.fused_cells import jit_compiler_options

    if use_shard_map is None:
        use_shard_map = _fused_kernels_active() and mesh.size > 1

    if use_shard_map:
        from jax import lax

        axes = _data_axes(mesh)

        def local_eval(params, rng, obs, nums):
            rng = jax.random.fold_in(rng, _shard_index(axes))
            _, aux = model.loss_and_metrics(params, rng, obs, nums,
                                            axis_name=axes)
            return Model.finalize_metrics(jax.tree_util.tree_map(
                lambda m: lax.pmean(m, axis_name=axes), aux["metrics"]
            ))

        batch_spec = P(None, axes)
        eval_step = jax.shard_map(
            local_eval, mesh=mesh,
            in_specs=(P(), P(), batch_spec, batch_spec),
            out_specs=P(), check_vma=False,
        )
    else:
        def eval_step(params, rng, obs, nums):
            _, aux = model.loss_and_metrics(params, rng, obs, nums)
            return Model.finalize_metrics(aux["metrics"])

    return jax.jit(eval_step, in_shardings=(repl, repl, data, data),
                   out_shardings=repl, compiler_options=jit_compiler_options())
