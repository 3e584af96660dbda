"""Benchmark: moving-MNIST training throughput (frames/sec/chip, k=5 VIMCO).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Baseline anchor: the reference publishes no numbers (BASELINE.md); the
acceptance gate is >=50x TF1-CPU training throughput.  The anchor is
MEASURED, not assumed: `tools/measure_cpu_anchor.py` runs this exact
train step (same paper config, same fixed-dataset sampler) single-process
on XLA-CPU and records frames/sec in `docs/cpu_anchor.json`.  Per core,
jitted XLA-CPU upper-bounds TF-1.6 graph-mode CPU throughput for this
model (same BLAS-bound matmuls, but whole-step fusion and no per-op
graph-executor dispatch); this host has limited cores (recorded in the
anchor file), so the anchor is scaled by an assumed reference-workstation
core count — see `docs/cpu_anchor.json` and docs/NOTES.md for the
full accounting.  If the anchor file is missing we fall back to the
round-1 assumption of 100 frames/sec TF1-CPU.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

_ANCHOR_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "docs", "cpu_anchor.json")
_ASSUMED_CPU_FPS = 100.0  # round-1 fallback only (see module docstring)


def _read_anchor_file():
    try:
        with open(_ANCHOR_FILE) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def load_anchor():
    """Return (cpu_frames_per_sec, method_string).

    The MEASURED per-core XLA-CPU anchor — `vs_baseline` is gated on this
    per the round-2 verdict. The harder core-scaled gate is reported
    separately (`vs_core_scaled_gate`, see load_scaled_gate_anchor);
    falls back to the round-1 assumption if the anchor file is missing.
    """
    a = _read_anchor_file()
    try:
        return float(a["frames_per_sec"]), a.get("method", "measured")
    except (KeyError, ValueError):
        return _ASSUMED_CPU_FPS, "assumed (anchor file missing)"


def load_scaled_gate_anchor():
    """Core-scaled anchor (measured x assumed 8-core workstation factor).

    The HARDER secondary gate; see docs/cpu_anchor.json `anchor_scaling`.
    Returns None when the anchor file predates the scaling fields.
    """
    try:
        return float(_read_anchor_file()["gate_anchor_frames_per_sec"])
    except (KeyError, ValueError):
        return None

# paper-grade training config (release_models/mnist_mlp/1/flags.json):
# B=32, k=5, 3 slots, n_what=50, 256-wide MLPs, T=10 at end of curriculum
T, B, K, S, H, G, NWHAT, NH = 10, 32, 5, 3, 50, 20, 50, 256
WARMUP, ITERS = 3, 50
# steps chained inside one jit dispatch: over the tunnelled TPU every
# dispatch costs ~1ms of host/tunnel latency that an inner lax.scan
# amortises.  The math per step is IDENTICAL (the scan body is the same
# step body); on CPU (anchor) dispatch is negligible next to the ~4s
# step, so the anchor is chain-invariant.  SQAIR_BENCH_CHAIN=1 is the
# documented fallback if the chained program's ~10x-body HLO ever
# misbehaves at compile time over the tunnel (VERDICT r3 #1).
CHAIN = int(os.environ.get("SQAIR_BENCH_CHAIN", "10"))


def build_step(chain: int = CHAIN):
    """Build the jitted train step + initial state for the paper config.

    Shared by the TPU bench (main) and the CPU anchor measurement
    (tools/measure_cpu_anchor.py) so both time the IDENTICAL program.
    Returns (step, params, opt_state, rng); one step() call advances
    ``chain`` training iterations.
    """
    import jax
    import jax.numpy as jnp

    from sqair_tpu.data import (
        OnDeviceDatasetSampler,
        OnDeviceSeqMNIST,
        make_template_bank,
    )
    from sqair_tpu.models import AIRDecoder, Model, SequentialAIR, SQAIRTimestep
    from sqair_tpu.training import init_train, make_optimizer

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

    dataset_arrays = sampler.arrays()

    def _one_step(params, opt_state, rng, data):
        data_rng, step_rng = jax.random.split(rng)
        b = OnDeviceDatasetSampler.sample(data, data_rng, B)

        def loss_fn(p):
            target, aux = model.loss_and_metrics(
                p, step_rng, b["imgs"], b["nums"], record_mode="train"
            )
            return target, aux["metrics"]

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    if chain == 1:
        _step_body = _one_step
    else:
        def _step_body(params, opt_state, rng, data):
            def body(carry, i):
                p, o = carry
                p, o, metrics = _one_step(p, o, jax.random.fold_in(rng, i),
                                          data)
                return (p, o), metrics
            (params, opt_state), metrics = jax.lax.scan(
                body, (params, opt_state), jnp.arange(chain))
            # last step's metrics (the sync scalar only needs one value)
            return params, opt_state, jax.tree_util.tree_map(
                lambda m: m[-1], metrics)

    from sqair_tpu.ops.fused_cells import jit_compiler_options

    jit_step = jax.jit(_step_body, donate_argnums=(0, 1),
                       compiler_options=jit_compiler_options())

    def step(params, opt_state, rng):
        return jit_step(params, opt_state, rng, dataset_arrays)

    # expose the jitted program + abstract args for cost analysis (MFU):
    # shapes captured BEFORE measure() because the buffers are donated
    step.jit_step = jit_step
    step.abstract_args = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        (state.params, state.opt_state, rng, dataset_arrays),
    )

    return step, state.params, state.opt_state, rng


def measure(step, params, opt_state, rng, warmup=WARMUP, iters=ITERS,
            chain: int = CHAIN):
    """Run warmup + timed iterations; return (frames_per_sec, final_target).

    frames_per_sec is per-process (divide by chip count for per-chip).
    ``chain`` must match the build_step() chain so the frame count is
    right: each step() call advances chain training iterations.
    """
    import jax

    # `metrics` from the last warmup step is the sync point below; a
    # warmup-less run would leave it unbound (and time compilation).
    assert warmup >= 1, "measure() requires warmup >= 1"
    for i in range(warmup):
        params, opt_state, metrics = step(
            params, opt_state, jax.random.fold_in(rng, 1000 + i)
        )
    warm = float(metrics["target"])  # sync: device_get through the tunnel
    import sys
    print("warm target:", warm, file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, metrics = step(
            params, opt_state, jax.random.fold_in(rng, 2000 + i)
        )
    final = float(metrics["target"])  # forces completion of the chain
    dt = time.perf_counter() - t0
    assert np.isfinite(final)
    return iters * chain * T * B / dt, final


# peak spec per chip: (dense bf16 matmul FLOP/s, HBM bytes/s).  MXU-native
# dtype is bf16; the model runs f32 activations whose matmuls XLA lowers
# to bf16-input/f32-accumulate passes on TPU, so bf16 peak is the honest
# MFU denominator (an f32-denominator MFU would look ~2x better).
_CHIP_PEAKS = {
    "TPU v5 lite": (197e12, 819e9),   # v5e
    "TPU v5": (459e12, 2765e9),       # v5p
    "TPU v4": (275e12, 1228e9),
    "TPU v6 lite": (918e12, 1640e9),  # v6e / Trillium
}


def cost_and_mfu(step, fps_per_chip: float, chain: int = CHAIN):
    """FLOPs/step from the compiled program + MFU/HBM roofline ratios.

    VERDICT r4 #3: give the throughput number an MFU and a bound
    statement.  Uses XLA's own cost model on the ALREADY-COMPILED train
    program (`.lower().compile()` hits the persistent compile cache after
    measure()'s warmup).  Returns {} when analysis is unavailable
    (e.g. CPU anchor runs) — bench output degrades gracefully.
    """
    import jax

    try:
        compiled = step.jit_step.lower(*step.abstract_args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax: one dict per computation
            ca = ca[0]
        flops_per_dispatch = float(ca["flops"])
        bytes_per_dispatch = float(ca.get("bytes accessed", 0.0))
    except Exception as e:  # noqa: BLE001 - diagnostics must not kill the bench
        import sys

        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
        return {}

    # one dispatch = `chain` train steps
    flops_per_step = flops_per_dispatch / chain
    steps_per_sec = fps_per_chip / (T * B)
    out = {
        "flops_per_step": round(flops_per_step),
        "model_flops_per_sec": round(flops_per_step * steps_per_sec),
    }
    kind = jax.devices()[0].device_kind
    peaks = _CHIP_PEAKS.get(kind)
    if peaks:
        peak_flops, peak_bw = peaks
        out["mfu"] = round(out["model_flops_per_sec"] / peak_flops, 6)
        out["mfu_peak_ref"] = f"{peak_flops:.3g} FLOP/s dense bf16 ({kind})"
        if bytes_per_dispatch:
            out["hbm_bytes_per_step"] = round(bytes_per_dispatch / chain)
            out["hbm_bw_util"] = round(
                bytes_per_dispatch / chain * steps_per_sec / peak_bw, 6)
    return out


def _devices_reachable(timeout_s: float = 120.0) -> bool:
    """Probe jax backend init in a subprocess with a hard timeout.

    Over the tunnelled-TPU setup a wedged tunnel makes jax.devices()
    block forever (observed: hang during a stage recompile took the
    whole backend down; fresh processes hung in jax.devices()).  A
    benchmark that can hang is worse than one that reports failure, so
    probe first and emit a diagnosable JSON line instead of hanging.
    """
    import subprocess
    import sys

    try:
        p = subprocess.run(
            [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
            timeout=timeout_s, capture_output=True, text=True,
        )
        return p.returncode == 0 and int((p.stdout.strip() or "0")) >= 1
    except (subprocess.TimeoutExpired, ValueError):
        return False


def main():
    # Two probes with a backoff between them, so a transient tunnel blip
    # doesn't zero a whole round's benchmark record (round 2 recorded 0.0).
    if not _devices_reachable():
        import sys

        print("first device probe failed; retrying in 60s", file=sys.stderr)
        time.sleep(60.0)
        if not _devices_reachable():
            print(json.dumps({
                "metric": "moving-MNIST train throughput (k=5 VIMCO, T=10, B=32)",
                "value": 0.0,
                "unit": "frames/sec/chip",
                "vs_baseline": 0.0,
                "error": "device backend unreachable (jax.devices() timed "
                         "out in two 120s subprocess probes 60s apart) — "
                         "TPU tunnel down, not a model regression",
            }))
            sys.exit(1)  # distinguish failure from a measured result

    import jax

    n_chips = len(jax.devices())
    step, params, opt_state, rng = build_step()
    fps, _ = measure(step, params, opt_state, rng)
    fps_per_chip = fps / n_chips

    anchor_fps, anchor_method = load_anchor()
    baseline = 50.0 * anchor_fps  # gate: >=50x TF1-CPU (BASELINE.md)
    scaled_anchor = load_scaled_gate_anchor()

    record = {
        "metric": "moving-MNIST train throughput (k=5 VIMCO, T=10, B=32)",
        "value": round(fps_per_chip, 2),
        "unit": "frames/sec/chip",
        "steps_per_dispatch": CHAIN,
        "vs_baseline": round(fps_per_chip / baseline, 4),
        "baseline_frames_per_sec": round(baseline, 2),
        "baseline_anchor": {
            "cpu_frames_per_sec": round(anchor_fps, 2),
            "method": anchor_method,
            "gate": "50x TF1-CPU; anchored to measured per-core XLA-CPU "
                    "(docs/cpu_anchor.json) per BASELINE.md",
        },
    }
    record.update(cost_and_mfu(step, fps_per_chip))
    if scaled_anchor is not None:
        # EQUAL-PROMINENCE second gate (ADVICE r3): anchor scaled to an
        # assumed 8-core 2018 workstation (the measurement host has one
        # core).  This is the HARDER, more faithful TF1-workstation bound;
        # `vs_baseline` stays keyed to the measured per-core anchor per the
        # round-2 verdict.  Full arithmetic + sensitivity (break-even TF1
        # parallel efficiency) in docs/cpu_anchor.json `anchor_sensitivity`.
        record["vs_core_scaled_gate"] = round(
            fps_per_chip / (50.0 * scaled_anchor), 4)
        record["core_scaled_gate_frames_per_sec"] = round(
            50.0 * scaled_anchor, 2)
        scaling = _read_anchor_file().get("anchor_scaling", {})
        ref_cores = float(scaling.get("assumed_ref_cores", 8))
        # the gate clears iff TF1.6's true multi-core parallel efficiency
        # on this model is BELOW this value (1.0 = perfect linear scaling)
        record["break_even_tf1_parallel_efficiency"] = round(
            fps_per_chip / (50.0 * anchor_fps * ref_cores), 4)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
