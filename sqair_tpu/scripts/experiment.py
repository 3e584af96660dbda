"""Training entry point for SQAIR-TPU.

Reference: sqair/scripts/experiment.py — same flags, same cadence
(heartbeat / tensorboard / figures / checkpoints), same curriculum recipe.

Run (synthetic data, no pickles needed):
    python -m sqair_tpu.scripts.experiment \
        --data_config sqair_tpu/configs/synth_seq_mnist_data.py \
        --model_config sqair_tpu/configs/mlp_mnist_model.py \
        --results_dir results --run_name multi_mnist \
        --seq_len 3 --stage_itr 100000
"""
from __future__ import annotations

import os
import sys
import time
from os import path as osp

import jax

# The axon sitecustomize pins jax_platforms to the tunnelled TPU backend
# via jax.config (overriding the JAX_PLATFORMS env var), so give the CLI
# its own escape hatch: SQAIR_PLATFORM=cpu runs training on the host
# (e.g. while the chip is busy or the tunnel is down).
if os.environ.get("SQAIR_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SQAIR_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from sqair_tpu.data.loader import curriculum_seq_len, truncate_batch
from sqair_tpu.eval_tools import MetricWriter, ProgressFig, make_logger
from sqair_tpu.experiment import flags
from sqair_tpu.experiment.experiment_tools import (
    init_checkpoint,
    load,
    parse_flags,
    print_flags,
    print_num_params,
)
from sqair_tpu.training import (
    init_train,
    latest_checkpoint,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)

# entry flags (experiment.py:41-69)
flags.DEFINE_string("data_config", "sqair_tpu/configs/synth_seq_mnist_data.py",
                    "Path to a data config file.")
flags.DEFINE_string("model_config", "sqair_tpu/configs/mlp_mnist_model.py",
                    "Path to a model config file.")
flags.DEFINE_string("results_dir", "results", "Top results directory.")
flags.DEFINE_string("run_name", "test_run", "Name of this job.")

flags.DEFINE_integer("batch_size", 32, "")

flags.DEFINE_integer("log_itr", int(1e4), "Iters between full evals.")
flags.DEFINE_integer("report_loss_every", int(1e3), "Iters between heartbeats.")
flags.DEFINE_integer("save_itr", int(1e5), "Iters between checkpoints.")
flags.DEFINE_integer("fig_itr", int(1e4), "Iters between figures.")
flags.DEFINE_integer("train_itr", int(2e6), "Max training iterations.")
flags.DEFINE_boolean("resume", False, "Resume the previous run.")
flags.DEFINE_boolean("log_at_start", False, "Evaluate before training.")
flags.DEFINE_boolean("eval_on_train", True, "Also evaluate on the train set.")
flags.DEFINE_float("eval_size_fraction", 1.0, "Fraction of data used in evals.")

flags.DEFINE_string("opt", "rmsprop", "rmsprop | adam | sgd | momentum")
flags.DEFINE_float("learning_rate", 1e-5, "Initial learning rate.")
flags.DEFINE_float("l2", 0.0, "L2 regularisation weight.")
flags.DEFINE_string("schedule", "4,6,10", "Piecewise-constant lr schedule.")

flags.DEFINE_integer("profile_itr", 0,
                     "If > 0, capture a jax.profiler device trace of a few "
                     "steps at this iteration (written to <logdir>/profile).")
flags.DEFINE_boolean("test_run", False, "Tiny smoke-test preset.")
flags.DEFINE_string("gpu", "0", "Unused (TPU build); kept for CLI parity.")
flags.DEFINE_boolean("debug", False, "Extra logging.")
flags.DEFINE_boolean("data_parallel", True,
                     "Shard the batch over all local devices.")
flags.DEFINE_string("coordinator_address", "",
                    "host:port of process 0 for multi-host training "
                    "(jax.distributed.initialize). Empty = single process.")
flags.DEFINE_integer("num_processes", 1, "Total processes (multi-host).")
flags.DEFINE_integer("process_id", 0, "This process's id (multi-host).")
flags.DEFINE_boolean("grad_histograms", False,
                     "Write per-variable gradient histograms to tensorboard "
                     "at log_itr cadence (reference eval_tools.py:425-452). "
                     "Compiles one extra grad-only program at first use.")
flags.DEFINE_boolean("on_device_data", False,
                     "Keep the training set in device memory and sample "
                     "minibatches inside the jitted step (no host round-trip "
                     "per iteration; the reference's tf.py_func equivalent "
                     "stays the default).")
flags.DEFINE_integer("steps_per_call", 1,
                     "With --on_device_data: chain this many train steps "
                     "inside one jit dispatch (inner lax.scan; identical "
                     "per-step math and rng streams). Amortises the ~1ms "
                     "tunnel dispatch latency. All cadences (report/log/"
                     "save/fig/stage_itr/train_itr) must be divisible by it.")


def main(argv=None):
    if argv is not None:
        sys.argv = [sys.argv[0]] + list(argv)

    parse_flags()
    F = flags.FLAGS

    # Persistent compile cache: the curriculum recompiles once per stage
    # (~10 stages) and ladder sweeps re-run near-identical programs in
    # fresh processes; caching the executables cuts minutes per run.
    # Opt-out with SQAIR_NO_COMPILE_CACHE=1 (e.g. cache-corruption triage).
    if not os.environ.get("SQAIR_NO_COMPILE_CACHE"):
        cache_dir = os.environ.get(
            "SQAIR_COMPILE_CACHE_DIR",
            osp.join(osp.expanduser("~"), ".cache", "sqair_tpu_jax"))
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        except Exception as e:  # older jax: flag absent — run uncached
            print(f"compile cache unavailable: {e}")

    # multi-host wiring must precede any jax computation (backend init)
    from sqair_tpu.parallel import initialize as init_distributed

    if init_distributed(F.coordinator_address, F.num_processes, F.process_id):
        print(f"multi-host: process {jax.process_index()}/"
              f"{jax.process_count()}, {len(jax.devices())} global devices")

    if F.test_run:  # (experiment.py:78-97)
        F.run_name = "mnist_test"
        F.data_config = "sqair_tpu/configs/synth_seq_mnist_data.py"
        F.model_config = "sqair_tpu/configs/mlp_mnist_model.py"
        F.seq_len = 2
        F.eval_on_train = False
        F.report_loss_every = 10
        F.log_itr = 100
        F.fig_itr = 100
        F.save_itr = 200
        F.train_itr = 200
        F.n_units = 4
        F.synth_train_samples = 64
        F.synth_valid_samples = 32
        F.synth_timesteps = 3
        F.batch_size = 8
        F.k_particles = 2

    logdir = osp.join(F.results_dir, F.run_name)
    if jax.process_count() > 1:
        # process 0 creates the run dir; everyone else attaches to it
        # (racing init_checkpoint would hand each process its own number)
        from jax.experimental import multihost_utils

        if jax.process_index() == 0:
            logdir, flag_dict, resume_checkpoint = init_checkpoint(
                logdir, F.data_config, F.model_config, F.resume
            )
            multihost_utils.sync_global_devices("sqair_tpu:rundir")
        else:
            multihost_utils.sync_global_devices("sqair_tpu:rundir")
            logdir, flag_dict, resume_checkpoint = init_checkpoint(
                logdir, F.data_config, F.model_config, F.resume, attach=True
            )
    else:
        logdir, flag_dict, resume_checkpoint = init_checkpoint(
            logdir, F.data_config, F.model_config, F.resume
        )

    # ------------------------------------------------------------- data
    data_dict = load(F.data_config, F.batch_size)
    train_imgs = data_dict["train_data"]["imgs"]
    mean_img = train_imgs.mean(tuple(range(train_imgs.ndim - 2)))
    assert mean_img.ndim == 2

    # ------------------------------------------------------------ model
    example_batch = next(data_dict["train_iter"])
    model = load(
        F.model_config,
        img=example_batch["imgs"],
        coords=example_batch.get("coords"),
        num=example_batch["nums"],
        mean_img=mean_img,
    )

    # -------------------------------------------------------- optimiser
    lr = make_lr_schedule(F.learning_rate, F.schedule, F.train_itr)
    optimizer = make_optimizer(F.opt, lr)
    cov_mult = getattr(F, "coverage_lr_mult", 1.0)
    if cov_mult != 1.0:
        if not getattr(F, "disc_coverage_signal", False):
            raise ValueError("--coverage_lr_mult requires --disc_coverage_signal")
        from ..training.train import scale_coverage_row_updates
        optimizer = scale_coverage_row_updates(optimizer, cov_mult)
        print(f"coverage rows lr mult: {cov_mult} (effective lr "
              f"{F.learning_rate * cov_mult:g} on the 16 coverage rows)")

    rng = jax.random.PRNGKey(0)
    max_T = data_dict["max_timesteps"]

    def stage_len(itr):
        return curriculum_seq_len(itr, data_dict["seq_len"], data_dict["stage_itr"], max_T)

    init_batch = truncate_batch(example_batch, stage_len(0))
    state = init_train(model, optimizer, rng, init_batch["imgs"])
    print_flags()
    print_num_params(state.params)

    if resume_checkpoint is not None:
        print(f"Restoring checkpoint from '{resume_checkpoint}'")
        restored = restore_checkpoint(resume_checkpoint, state.as_dict())
        state.params = restored["params"]
        state.opt_state = restored["opt_state"]
        state.step = int(restored["step"])

    is_multihost = jax.process_count() > 1

    n_devices = len(jax.devices()) if is_multihost else jax.local_device_count()
    use_dp = F.data_parallel and n_devices > 1 and F.batch_size % n_devices == 0
    if is_multihost and not use_dp:
        # silently falling back to per-process single-device training would
        # just compute the same step N times (and break collective saves)
        raise ValueError(
            f"multi-host run needs the data mesh: batch_size={F.batch_size} "
            f"must be divisible by the {n_devices} global devices and "
            f"--data_parallel must be on (got {F.data_parallel})"
        )
    if use_dp:
        from sqair_tpu.parallel import (
            global_shard_batch,
            make_mesh,
            make_parallel_train_step,
            shard_batch,
        )

        mesh = make_mesh()
        print(f"data-parallel over {n_devices} devices")
        train_step = make_parallel_train_step(model, optimizer, mesh, l2_weight=F.l2,
                                              donate=False)
        # multi-host: every process draws the SAME global batch (the data
        # pipeline is seeded identically) and places its addressable shards
        put = global_shard_batch if is_multihost else shard_batch

        def shard(b):
            # only the tensors the train step consumes are [T, B, ...]
            sharded = put({"imgs": b["imgs"], "nums": b["nums"]}, mesh)
            return {**b, **sharded}

        if is_multihost:
            # jit inputs must be GLOBAL arrays in multi-controller mode;
            # params/opt-state are identical everywhere (same init seed /
            # same restored checkpoint), so stitch them as replicated
            from sqair_tpu.parallel import replicate_to_mesh

            state.params = replicate_to_mesh(state.params, mesh)
            state.opt_state = replicate_to_mesh(state.opt_state, mesh)

            def step_rng_for(itr):
                return replicate_to_mesh(jax.random.fold_in(rng, itr), mesh)
        else:
            def step_rng_for(itr):
                return jax.random.fold_in(rng, itr)
    else:
        train_step = make_train_step(model, optimizer, F.l2, donate=False,
                                     grad_summaries=F.debug)

        def shard(b):
            return b

        def step_rng_for(itr):
            return jax.random.fold_in(rng, itr)
    device_step_for_len = None
    steps_per_call = 1
    if F.on_device_data and not use_dp:
        import functools

        import optax

        from sqair_tpu.data import OnDeviceDatasetSampler

        sampler = OnDeviceDatasetSampler(
            {"imgs": data_dict["train_data"]["imgs"],
             "nums": data_dict["train_data"]["nums"]}
        )
        steps_per_call = max(1, int(F.steps_per_call))
        if steps_per_call > 1:
            # chained calls advance train_itr in blocks: every cadence and
            # every stage boundary must land on a block boundary
            for fname in ("report_loss_every", "log_itr", "save_itr",
                          "fig_itr", "train_itr"):
                v = getattr(F, fname)
                if v % steps_per_call:
                    raise ValueError(
                        f"--{fname}={v} must be divisible by "
                        f"--steps_per_call={steps_per_call}")
            if data_dict["stage_itr"] % steps_per_call:
                raise ValueError(
                    f"stage_itr={data_dict['stage_itr']} must be divisible "
                    f"by --steps_per_call={steps_per_call}")
        print("on-device data: training set resident in HBM, "
              f"sampling inside the jitted step "
              f"({steps_per_call} step(s) per dispatch)")

        dataset_arrays = sampler.arrays()

        @functools.lru_cache(maxsize=None)
        def device_step_for_len(seq_len):  # noqa: F811
            # the dataset rides in as a jit ARGUMENT (device-resident, no
            # per-call transfer) — closing over it would bake it into the
            # lowered program as a constant (820MB HLO at 8192 sequences)
            def one(params, opt_state, itr, data):
                # same stream as the unchained path: fold the absolute
                # iteration number into the base rng
                drng, srng = jax.random.split(jax.random.fold_in(rng, itr))
                b = OnDeviceDatasetSampler.sample(data, drng, F.batch_size)
                obs = jax.lax.slice_in_dim(b["imgs"], 0, seq_len, axis=0)
                nums = jax.lax.slice_in_dim(b["nums"], 0, seq_len, axis=0)

                def loss_fn(p):
                    target, aux = model.loss_and_metrics(
                        p, srng, obs, nums, F.l2, record_mode="train"
                    )
                    return target, aux["metrics"]

                (_, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                metrics = model.finalize_metrics(metrics)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, metrics

            if steps_per_call == 1:
                def body(params, opt_state, itr0, data):
                    return one(params, opt_state, itr0, data)
            else:
                def body(params, opt_state, itr0, data):
                    def scan_body(carry, i):
                        p, o = carry
                        p, o, metrics = one(p, o, itr0 + i, data)
                        return (p, o), metrics
                    (params, opt_state), ms = jax.lax.scan(
                        scan_body, (params, opt_state),
                        jnp.arange(steps_per_call))
                    return params, opt_state, jax.tree_util.tree_map(
                        lambda m: m[-1], ms)

            from sqair_tpu.ops.fused_cells import jit_compiler_options

            return jax.jit(body, compiler_options=jit_compiler_options())

    if int(F.steps_per_call) > 1 and steps_per_call == 1:
        # silently measuring the unchained configuration would invalidate
        # any throughput comparison the flag was set for
        raise ValueError(
            "--steps_per_call > 1 requires --on_device_data and is "
            "incompatible with the data-parallel mesh path "
            f"(on_device_data={F.on_device_data}, data_parallel active={use_dp})"
        )

    from sqair_tpu.training import make_eval_step

    if is_multihost and use_dp:
        # multi-controller: eval inputs must be global arrays too
        from sqair_tpu.parallel import make_parallel_eval_step

        _par_eval = make_parallel_eval_step(model, mesh)

        def eval_step(params, eval_rng, obs, nums):
            b = put({"imgs": np.asarray(obs), "nums": np.asarray(nums)}, mesh)
            from sqair_tpu.parallel import replicate_to_mesh

            return _par_eval(params, replicate_to_mesh(eval_rng, mesh),
                             b["imgs"], b["nums"])
    else:
        eval_step = make_eval_step(model)

    # ---------------------------------------------------------- logging
    # multi-host: secondary processes participate in every collective
    # (same cadence) but write to their own subdir, not the run dir
    if is_multihost and jax.process_index() != 0:
        writer = MetricWriter(osp.join(logdir, f"proc{jax.process_index()}"),
                              use_tb=False)
    else:
        writer = MetricWriter(logdir)
    factor = F.eval_size_fraction
    ax = data_dict["axes"]["imgs"]
    train_batches = max(1, int(data_dict["train_data"]["imgs"].shape[ax] * factor / F.batch_size))
    valid_batches = max(1, int(data_dict["valid_data"]["imgs"].shape[ax] * factor / F.batch_size))

    def eval_fn(obs, nums):
        return eval_step(state.params, jax.random.PRNGKey(1), obs, nums)

    log = make_logger(
        eval_fn, writer, data_dict["train_iter"], train_batches,
        data_dict["valid_iter"], valid_batches, F.eval_on_train,
        seq_len_fn=stage_len,
    )

    def render_fn(obs, nums):
        _, aux = model.loss_and_metrics(state.params, jax.random.PRNGKey(2), obs, nums)
        return aux["render"]

    from sqair_tpu.common_model_flags import get_params

    progress_fig = ProgressFig(
        render_fn, logdir, img_size=mean_img.shape,
        glimpse_size=get_params()["glimpse_size"], seq_n_samples=4,
    )

    def try_plot(itr):
        batch = None
        try:
            batch = truncate_batch(next(data_dict["valid_iter"]), stage_len(itr))
            progress_fig.plot_all(itr, batch)
        except Exception as e:  # noqa: BLE001 - plotting must never kill training
            print(f"figure plotting failed: {e}")
            # fallback: raw render tensors straight to tensorboard images
            # (reference model.py:207-212 + scripts/experiment.py:194-207)
            try:
                if batch is not None:
                    render = render_fn(batch["imgs"], batch["nums"])
                    for name in ("obs", "resampled_canvas"):
                        if name in render:
                            frames = np.asarray(render[name])[:, 0]
                            strip = np.concatenate(list(frames), axis=-1)
                            writer.write_image(itr, f"render/{name}", strip)
            except Exception as e2:  # noqa: BLE001
                print(f"image-summary fallback failed too: {e2}")

    grad_fn = None

    def log_grad_histograms(itr):
        nonlocal grad_fn
        try:
            if grad_fn is None:
                from sqair_tpu.training import make_grad_fn

                grad_fn = make_grad_fn(model, F.l2)
            b = truncate_batch(next(data_dict["train_iter"]), stage_len(itr))
            grads = grad_fn(state.params, jax.random.fold_in(rng, itr),
                            b["imgs"], b["nums"])
            from sqair_tpu.training.train import named_grad_leaves

            for name, leaf in named_grad_leaves(grads):
                writer.write_histogram(itr, f"grads/{name}", leaf)
        except Exception as e:  # noqa: BLE001 - diagnostics must never kill training
            print(f"gradient histograms failed: {e}")

    # ------------------------------------------------------------- loop
    train_itr = state.step
    if steps_per_call > 1 and train_itr % steps_per_call:
        raise ValueError(
            f"resumed step {train_itr} is not aligned to "
            f"--steps_per_call={steps_per_call}; resume with "
            f"--steps_per_call 1 (or a divisor of {train_itr})")
    print(f"Starting training at iter = {train_itr}")
    if F.log_at_start or train_itr == 0:
        log(train_itr)
        try_plot(train_itr)

    report_every = F.report_loss_every
    last_saved_itr = -1

    # Preemption safety (reference: tf.Supervisor saved on stop,
    # scripts/experiment.py:176): SIGTERM/SIGINT request a graceful stop.
    # Single-process: the loop breaks at the next iteration boundary and
    # the final-save path below checkpoints whatever step was reached.
    # Multi-process: a lone process breaking out would deadlock its peers
    # mid-collective, so the local flag is only a VOTE — every
    # `report_loss_every` iterations all processes allgather their votes
    # and, if any process was signalled, ALL break at that same iteration
    # and reach the same (single-writer) save step.  Our handler is
    # installed after jax.distributed.initialize, so it wins over jax's
    # own preemption notifier for SIGTERM.
    stop_signal = {"num": None}
    prev_handlers = {}
    import signal

    def _graceful_stop(signum, frame):
        stop_signal["num"] = signum

    try:
        for s in (signal.SIGTERM, signal.SIGINT):
            prev_handlers[s] = signal.signal(s, _graceful_stop)
    except ValueError:  # not the main thread (in-process tests)
        prev_handlers = {}

    # Handlers stay installed through the loop AND the final save (a
    # second signal during the graceful-shutdown save must not kill the
    # process mid-write, ADVICE r2); the finally restores them even when
    # training raises, so in-process callers (tests invoking main()
    # repeatedly) never inherit the no-op handlers (ADVICE r3).
    try:
        multi_process = jax.process_count() > 1
        if multi_process:
            # a preemption's grace window (typically 30-60s) must not wait for
            # a full report interval (default 1000 iters): bound the vote
            # cadence. The allgather is a tiny host-side collective; at 250
            # iters its cost is noise. (steps_per_call > 1 never coexists
            # with multi-process — it requires the non-mesh on-device path —
            # so iteration alignment is guaranteed.)
            vote_every = min(report_every, 250)
            from jax.experimental import multihost_utils

            def _coordinated_stop() -> bool:
                vote = np.asarray(
                    [1.0 if stop_signal["num"] is not None else 0.0], np.float32
                )
                return float(multihost_utils.process_allgather(vote).max()) > 0.0

        t0 = time.time()
        frames_done = 0
        while train_itr < F.train_itr:
            if stop_signal["num"] is not None and not multi_process:
                print(f"signal {stop_signal['num']}: stopping at iter "
                      f"{train_itr}, saving checkpoint")
                break
            sl = stage_len(train_itr)
            prev_itr = train_itr
            if device_step_for_len is not None:
                state.params, state.opt_state, metrics = device_step_for_len(sl)(
                    state.params, state.opt_state,
                    jnp.asarray(train_itr, jnp.int32), dataset_arrays,
                )
                train_itr += steps_per_call
                frames_done += sl * F.batch_size * steps_per_call
            else:
                batch = shard(truncate_batch(next(data_dict["train_iter"]), sl))
                state.params, state.opt_state, metrics = train_step(
                    state.params, state.opt_state, step_rng_for(train_itr),
                    batch["imgs"], batch["nums"],
                )
                train_itr += 1
                frames_done += sl * F.batch_size
            state.step = train_itr

            if train_itr % report_every == 0:
                # jax dispatch is async: the loop above only ENQUEUES the
                # chained step calls.  Force the last dispatch's metrics
                # (transitively the whole interval's compute) BEFORE
                # reading the clock, otherwise dt measures enqueue time
                # and frames_per_sec is wildly inflated (~20x observed
                # with steps_per_call=10).  A scalar fetch is the sync:
                # block_until_ready does not reliably block over the
                # axon tunnel.
                target_val = float(metrics["target"])
                dt = time.time() - t0
                fps = frames_done / max(dt, 1e-9)
                heartbeat = {
                    "target": target_val,
                    "iwae": float(metrics["normalised_iwae"]),
                    "num_steps": float(metrics["num_steps"]),
                    "num_step_acc": float(metrics.get("num_step_accuracy", np.nan)),
                    "seq_len": sl,
                    "frames_per_sec": fps,
                }
                print(f"{train_itr}: " + ", ".join(f"{k}={v:.5g}" for k, v in heartbeat.items()))
                writer.write(train_itr, heartbeat)
                t0, frames_done = time.time(), 0

            if multi_process and train_itr % vote_every == 0:
                # all processes hit this at the same train_itr (the train
                # step's collectives keep them in lockstep), so the vote
                # allgather lines up and everyone breaks at the same step
                if _coordinated_stop():
                    print(f"coordinated stop (a process was signalled): "
                          f"stopping at iter {train_itr}, saving checkpoint")
                    break

            if train_itr % F.log_itr == 0:
                log(train_itr)
                if F.grad_histograms:
                    log_grad_histograms(train_itr)
            if train_itr % F.save_itr == 0:
                save_checkpoint(logdir, train_itr, state.as_dict())
                last_saved_itr = train_itr
            if train_itr % F.fig_itr == 0:
                try_plot(train_itr)
            if (train_itr % F.log_itr == 0 or train_itr % F.save_itr == 0
                    or train_itr % F.fig_itr == 0):
                # evals/saves/figures ran inside what would otherwise be
                # the next heartbeat's timing window: reset it so
                # frames_per_sec measures training only
                t0, frames_done = time.time(), 0
            # train_itr advances in steps_per_call blocks, so fire on the
            # first boundary at-or-past profile_itr rather than on equality
            if F.profile_itr and train_itr >= F.profile_itr > prev_itr:
                # capture 3 steps; the trace opens in tensorboard's profile tab
                trace_dir = osp.join(logdir, "profile")
                # the on-device-data path never materialises a host batch in
                # the loop: draw one here for the profiled steps
                pbatch = shard(truncate_batch(next(data_dict["train_iter"]), sl))
                with jax.profiler.trace(trace_dir):
                    for k in range(3):
                        state.params, state.opt_state, metrics = train_step(
                            state.params, state.opt_state,
                            step_rng_for(train_itr * 131 + k),
                            pbatch["imgs"], pbatch["nums"],
                        )
                    jax.block_until_ready(metrics["target"])
                print(f"profiler trace written to {trace_dir}")

        if last_saved_itr != train_itr:
            # never re-save an existing step: duplicate saves to one path run
            # the async-write barrier twice, which deadlocks multi-process
            # runs whose peers are one save apart (orbax barrier id reuse)
            save_checkpoint(logdir, train_itr, state.as_dict())
        try_plot(train_itr)
        writer.close()
    finally:
        if prev_handlers:
            for s, h in prev_handlers.items():
                signal.signal(s, h)
    return logdir, state


if __name__ == "__main__":
    main()
