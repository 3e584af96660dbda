"""Wall-clock breakdown of the training step on the attached accelerator.

Times jitted sub-graphs of the paper-grade config independently:
  - full train step (fwd+bwd+optax)
  - loss forward only
  - SequentialAIR forward only
  - one SQAIRTimestep (propagate+discover+merge)
  - decoder only
Run: python tools/profile_step.py [--trace DIR]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sqair_tpu.models import AIRDecoder, Model, SequentialAIR, SQAIRTimestep
from sqair_tpu.training import init_train, make_optimizer, make_train_step

T, B, K, S, H, G, NWHAT, NH = 10, 32, 5, 3, 50, 20, 50, 256


def _sync(out):
    # block_until_ready does not reliably block over the axon tunnel;
    # fetching a concrete leaf forces completion of the whole chain
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def timeit(name, fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    args = ap.parse_args()

    timestep = SQAIRTimestep(
        n_steps=S, img_size=(H, H), glimpse_size=(G, G), n_what=NWHAT,
        n_hidden=NH, steps_pred_hidden=[NH // 2],
    )
    decoder = AIRDecoder(
        img_size=(H, H), glimpse_size=(G, G), glimpse_n_hiddens=[NH, NH],
        mean_img=np.zeros((H, H), np.float32),
    )
    model = Model(SequentialAIR(timestep, decoder), k_particles=K)

    rng = jax.random.PRNGKey(0)
    obs = jax.random.uniform(jax.random.PRNGKey(1), (T, B, H, H))
    nums = np.zeros((T, B, S + 1), np.float32)
    nums[:, :, 0] = 1.0
    nums = jnp.asarray(nums)

    params = model.init(rng, obs)
    opt = make_optimizer("rmsprop", 1e-5)
    state = init_train(model, opt, rng, obs)
    train_step = make_train_step(model, opt, donate=False)

    # full train step
    dt_step = timeit("train step (fwd+bwd+opt)", train_step,
                     state.params, state.opt_state, rng, obs, nums)
    print(f"{'-> frames/sec/chip':34s} {T * B / dt_step:9.0f}")

    # forward-only loss
    loss_fn = jax.jit(lambda p, r, o, n: model.loss_and_metrics(p, r, o, n)[0])
    timeit("loss forward", loss_fn, params, rng, obs, nums)

    # sequence forward (tiled to the particle batch, like Model does)
    obs_tiled = jnp.repeat(obs, K, axis=1)
    seq_fn = jax.jit(lambda p, r, o: model.sequence(p, r, o)["canvas"])
    timeit("SequentialAIR forward (B*k)", seq_fn, params, rng, obs_tiled)

    # fwd+bwd without optimizer
    grad_fn = jax.jit(jax.grad(lambda p, r, o, n: model.loss_and_metrics(p, r, o, n)[0]))
    timeit("loss fwd+bwd (no opt)", grad_fn, params, rng, obs, nums)

    if args.trace:
        with jax.profiler.trace(args.trace):
            out = train_step(state.params, state.opt_state, rng, obs, nums)
            jax.block_until_ready(out)
        print("trace written to", args.trace)


if __name__ == "__main__":
    main()
