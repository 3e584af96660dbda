"""Worker process for the multi-host test (tests/test_distributed.py).

Run once per process.  Builds a tiny SQAIR model, wires the multi-process
runtime via sqair_tpu.parallel.initialize, trains 3 steps on a mesh over
the GLOBAL device set, and prints the final metrics as one JSON line.
With --num_processes 1 (no coordinator) it is the single-process control:
the same global mesh shape must produce identical metrics.

Not collected by pytest (leading underscore).
"""
import argparse
import json
import os
import sys

ap = argparse.ArgumentParser()
ap.add_argument("--coordinator", default="")
ap.add_argument("--num_processes", type=int, default=1)
ap.add_argument("--process_id", type=int, default=0)
ap.add_argument("--local_devices", type=int, default=2)
args = ap.parse_args()

flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + f" --xla_force_host_platform_device_count={args.local_devices}"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from sqair_tpu.models import (  # noqa: E402
    AIRDecoder,
    Model,
    SequentialAIR,
    SQAIRTimestep,
)
from sqair_tpu.parallel import (  # noqa: E402
    global_shard_batch,
    initialize,
    make_mesh,
    make_parallel_train_step,
    replicate_to_mesh,
)
from sqair_tpu.training import make_optimizer  # noqa: E402

initialize(args.coordinator, args.num_processes, args.process_id)

n_global = len(jax.devices())
assert n_global == args.num_processes * args.local_devices, (
    n_global, args.num_processes, args.local_devices)

T, B, H, S, G, NWHAT, NH, K = 2, 4, 16, 2, 6, 4, 16, 2

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

rng = jax.random.PRNGKey(0)
# the same global batch on every process (identically seeded)
obs = jax.random.uniform(jax.random.PRNGKey(1), (T, B, H, H))
nums = np.zeros((T, B, S + 1), np.float32)
nums[:, :, 0] = 1.0

params = model.init(rng, obs)
opt_state = optimizer.init(params)

mesh = make_mesh()
step = make_parallel_train_step(model, optimizer, mesh, donate=False)

batch = global_shard_batch({"obs": np.asarray(obs), "nums": nums}, mesh)
params = replicate_to_mesh(params, mesh)
opt_state = replicate_to_mesh(opt_state, mesh)

for i in range(3):
    step_rng = replicate_to_mesh(jax.random.fold_in(rng, i), mesh)
    params, opt_state, metrics = step(
        params, opt_state, step_rng, batch["obs"], batch["nums"]
    )

final = {
    k: float(np.asarray(v.addressable_shards[0].data))
    for k, v in metrics.items()
}
if args.process_id == 0:
    print("METRICS " + json.dumps(final, sort_keys=True))
