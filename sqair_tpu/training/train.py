"""Optimizers, LR schedules and the jitted train step.

Reference: sqair/scripts/experiment.py:126-155.  The entire train step
(loss + grads + update) is one compiled XLA program; with a mesh it is
additionally sharded (see parallel.mesh).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.model import Model


def make_lr_schedule(learning_rate: float, schedule: Optional[str],
                     train_itr: int):
    """Piecewise-constant decay '4,6,10' -> x(1/3) at cumulative-proportion
    boundaries (experiment.py:128-136)."""
    if not schedule:
        return learning_rate
    props = [float(f) for f in schedule.split(",")]
    cum = np.cumsum(props)
    boundaries = np.round(cum * train_itr / cum[-1]).astype(np.int64)
    # lr * (1/3)^k after boundary k (the last boundary is train_itr itself)
    scales = {int(b): 1.0 / 3.0 for b in boundaries[:-1]}
    return optax.piecewise_constant_schedule(learning_rate, scales)


def is_disc_steps_kernel(path) -> bool:
    """True for the DISCOVERY steps-predictor first-layer kernel path.

    Matches ... discover ... steps_predictor ... w_0 and explicitly NOT the
    propagation predictor (its path has no 'discover'/'disc' ancestor).
    Shared by tools/pad_coverage_params.py (warm-start row padding) and
    scale_coverage_row_updates (per-row lr) so both always target the same
    leaf.
    """
    keys = [getattr(p, "key", None) for p in path]
    if keys[-1] != "w_0":
        return False
    if "steps_predictor" not in keys:
        return False
    return any(k == "discover" or (isinstance(k, str) and "disc" in k)
               for k in keys[:-1] if isinstance(k, str))


def scale_coverage_row_updates(optimizer: optax.GradientTransformation,
                               mult: float,
                               n_rows: int = 16) -> optax.GradientTransformation:
    """Per-row learning rate for the coverage input rows, statelessly.

    Wraps ``optimizer`` so the LAST ``n_rows`` input-rows of the discovery
    steps-predictor first-layer kernel — the rows --disc_coverage_signal
    appends (models/core.py coverage crop; padded from zero by
    tools/pad_coverage_params.py) — get their updates multiplied by
    ``mult``.  Because optax puts scale_by_learning_rate LAST in its
    chains, scaling the emitted update is exactly equivalent to running
    those rows at lr*mult, while the optimizer STATE pytree is bit-for-bit
    the inner optimizer's: checkpoints from unwrapped runs restore
    directly (the round-5 lr-bistability finding rules out raising the
    global lr instead — a 10x global resume collapses propagation).
    """

    def update(grads, state, params=None):
        updates, state = optimizer.update(grads, state, params)

        def visit(path, u):
            if is_disc_steps_kernel(path) and getattr(u, "ndim", 0) == 2:
                return jnp.concatenate(
                    [u[:-n_rows], u[-n_rows:] * mult], 0)
            return u

        return jax.tree_util.tree_map_with_path(visit, updates), state

    return optax.GradientTransformation(optimizer.init, update)


def make_optimizer(name: str, learning_rate, **kwargs) -> optax.GradientTransformation:
    """Optimizer zoo (experiment.py:138-146).

    rmsprop matches tf.train.RMSPropOptimizer defaults: decay .9,
    momentum .9, eps 1e-10, mean-square initialised to ONES.
    """
    name = name.lower()
    if name == "rmsprop":
        return optax.rmsprop(
            learning_rate, decay=0.9, eps=1e-10, momentum=0.9, initial_scale=1.0,
            **kwargs,
        )
    if name == "adam":
        return optax.adam(learning_rate, **kwargs)
    if name == "sgd":
        return optax.sgd(learning_rate, **kwargs)
    if name == "momentum":
        return optax.sgd(learning_rate, momentum=0.9, **kwargs)
    raise ValueError(f"Unknown optimizer '{name}'")


class TrainState:
    """Minimal mutable train-state container (host side)."""

    def __init__(self, params, opt_state, step: int = 0):
        self.params = params
        self.opt_state = opt_state
        self.step = step

    def as_dict(self):
        # step stays a HOST numpy scalar: orbax serialises numpy values as
        # replicated in multi-process runs, whereas a single-device
        # jax.Array cannot be saved once jax.distributed is initialised
        return dict(params=self.params, opt_state=self.opt_state,
                    step=np.asarray(self.step))


def gradient_summaries(grads, updates, params) -> dict:
    """Gradient/update diagnostics (reference eval_tools.py:374-452).

    Global grad norm, per-top-level-module grad norms, and the
    update-to-weight norm ratio the reference tracks for lr tuning.
    """
    def gnorm(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return jnp.sqrt(sum(jnp.sum(l * l) for l in leaves))

    out = {"grads/global_norm": gnorm(grads),
           "grads/update_norm": gnorm(updates)}
    pnorm = gnorm(params)
    out["grads/update_to_weight_ratio"] = out["grads/update_norm"] / (pnorm + 1e-12)
    for top, sub in grads.items():
        if isinstance(sub, dict):
            for name, leaf_tree in sub.items():
                out[f"grads/norm/{top}.{name}"] = gnorm(leaf_tree)
    return out


def make_grad_fn(model: Model, l2_weight: float = 0.0) -> Callable:
    """Jitted (params, rng, obs, nums) -> gradient pytree.

    Used at log cadence to write per-variable gradient histograms
    (reference eval_tools.py:425-452 adds a tf.summary.histogram for every
    gradient variable).  Kept out of the hot train step so the per-step
    program never transfers full gradient trees to host.
    """

    def loss_fn(params, rng, obs, nums):
        target, _ = model.loss_and_metrics(params, rng, obs, nums, l2_weight,
                                           record_mode="train")
        return target

    from ..ops.fused_cells import jit_compiler_options

    return jax.jit(jax.grad(loss_fn),
                   compiler_options=jit_compiler_options())


def named_grad_leaves(grads):
    """Yield ('module.sub.param', leaf) pairs for histogram tags."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, leaf in flat:
        name = ".".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        yield name, leaf


def make_train_step(model: Model, optimizer: optax.GradientTransformation,
                    l2_weight: float = 0.0, donate: bool = True,
                    grad_summaries: bool = False) -> Callable:
    """Builds the jitted (params, opt_state, rng, obs, nums) -> update fn."""

    def loss_fn(params, rng, obs, nums):
        target, aux = model.loss_and_metrics(params, rng, obs, nums, l2_weight,
                                             record_mode="train")
        return target, aux["metrics"]

    def train_step(params, opt_state, rng, obs, nums):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, rng, obs, nums
        )
        metrics = Model.finalize_metrics(metrics)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        if grad_summaries:
            metrics = dict(metrics, **gradient_summaries(grads, updates, params))
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    from ..ops.fused_cells import jit_compiler_options

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums,
                   compiler_options=jit_compiler_options())


def make_eval_step(model: Model) -> Callable:
    def eval_step(params, rng, obs, nums):
        _, aux = model.loss_and_metrics(params, rng, obs, nums)
        return Model.finalize_metrics(aux["metrics"])

    from ..ops.fused_cells import jit_compiler_options

    return jax.jit(eval_step, compiler_options=jit_compiler_options())


def init_train(model: Model, optimizer, rng, example_obs) -> TrainState:
    params = model.init(rng, example_obs)
    opt_state = optimizer.init(params)
    return TrainState(params, opt_state, 0)
