"""Benchmark: moving-MNIST training throughput (frames/sec/chip, k=5 VIMCO).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline anchor: the reference publishes no numbers; its README reports
"several days" for 1M iterations of B=32, T in [3,10] on a 2018 GPU —
order 150-600 frames/sec (BASELINE.md).  The acceptance gate is >=50x a
TF1-*CPU* run, which is strictly slower than that GPU figure.  We anchor
vs_baseline to 5000 frames/sec = 50 x an assumed 100 frames/sec TF1-CPU
throughput; vs_baseline >= 1.0 therefore clears the gate with margin.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_FRAMES_PER_SEC = 5000.0  # 50x assumed TF1-CPU (see module docstring)

# paper-grade training config (release_models/mnist_mlp/1/flags.json):
# B=32, k=5, 3 slots, n_what=50, 256-wide MLPs, T=10 at end of curriculum
T, B, K, S, H, G, NWHAT, NH = 10, 32, 5, 3, 50, 20, 50, 256
WARMUP, ITERS = 3, 50


def main():
    import jax

    from sqair_tpu.data import (
        OnDeviceDatasetSampler,
        OnDeviceSeqMNIST,
        make_template_bank,
    )
    from sqair_tpu.models import AIRDecoder, Model, SequentialAIR, SQAIRTimestep
    from sqair_tpu.training import init_train, make_optimizer, make_train_step

    n_chips = len(jax.devices())

    timestep = SQAIRTimestep(
        n_steps=S, img_size=(H, H), glimpse_size=(G, G), n_what=NWHAT,
        n_hidden=NH, steps_pred_hidden=[NH // 2],
    )
    decoder = AIRDecoder(
        img_size=(H, H), glimpse_size=(G, G), glimpse_n_hiddens=[NH, NH],
        mean_img=np.zeros((H, H), np.float32),
    )
    model = Model(SequentialAIR(timestep, decoder), k_particles=K)
    optimizer = make_optimizer("rmsprop", 1e-5)

    # reference-faithful pipeline: a FIXED dataset (the reference samples
    # minibatches from 60k pre-generated sequences, data.py:204-242) held
    # in HBM, with a per-step on-device gather in the measured loop
    gen = OnDeviceSeqMNIST(make_template_bank(64, 28), canvas_size=(H, H),
                           n_timesteps=T)
    dataset = jax.jit(lambda r: gen(r, 2048))(jax.random.PRNGKey(42))
    sampler = OnDeviceDatasetSampler(
        {"imgs": np.asarray(dataset["imgs"]), "nums": np.asarray(dataset["nums"])}
    )
    gen_fn = jax.jit(lambda r: sampler(r, B))

    rng = jax.random.PRNGKey(0)
    batch = gen_fn(rng)
    state = init_train(model, optimizer, rng, batch["imgs"])

    # fold the dataset sampling into the jitted step: one dispatch per
    # iteration, and XLA fuses the sample transpose into its consumers
    import optax

    def _step_body(params, opt_state, rng):
        data_rng, step_rng = jax.random.split(rng)
        b = sampler(data_rng, B)

        def loss_fn(p):
            target, aux = model.loss_and_metrics(
                p, step_rng, b["imgs"], b["nums"], record_mode="train"
            )
            return target, aux["metrics"]

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    from sqair_tpu.ops.fused_cells import jit_compiler_options

    step = jax.jit(_step_body, donate_argnums=(0, 1),
                   compiler_options=jit_compiler_options())

    params, opt_state = state.params, state.opt_state
    for i in range(WARMUP):
        params, opt_state, metrics = step(
            params, opt_state, jax.random.fold_in(rng, 1000 + i)
        )
    import sys
    print("warm target:", float(metrics["target"]), file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(ITERS):
        params, opt_state, metrics = step(
            params, opt_state, jax.random.fold_in(rng, 2000 + i)
        )
    final = float(metrics["target"])  # forces completion of the chain
    dt = time.perf_counter() - t0
    assert np.isfinite(final)

    frames = ITERS * T * B  # frames consumed per optimisation step (per chip)
    fps_per_chip = frames / dt / n_chips

    print(json.dumps({
        "metric": "moving-MNIST train throughput (k=5 VIMCO, T=10, B=32)",
        "value": round(fps_per_chip, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps_per_chip / BASELINE_FRAMES_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
