"""Multi-host (multi-process) backend for the data mesh.

The reference is strictly single-GPU; SURVEY §5.8 asks the rebuild for a
first-class distributed backend: `jax.distributed.initialize` wiring, a
mesh over the GLOBAL device set, and per-process placement of only the
addressable shards of each global batch.

Design (multi-controller JAX / GSPMD):
  - every process runs the same program and calls `initialize(...)` once
    before building arrays;
  - `make_mesh()` (mesh.py) already builds over `jax.devices()`, which is
    the global device list after initialize — nothing to change there;
  - inputs to a pjit-compiled step must be *global* `jax.Array`s.  Each
    process materialises the same global (host) batch — the data pipeline
    is seeded identically everywhere — and `global_shard_batch` /
    `replicate_to_mesh` place only the shards addressable from this
    process; the runtime stitches them into one global array.

Identical-metrics contract: because every process sees the same global
batch and the same replicated params/rng, an N-process run computes
bit-for-bit the same step as a single-process run over the same mesh
shape (verified in tests/test_distributed.py with two localhost CPU
processes).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import Mesh, batch_sharded, replicated


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Wire up the multi-process runtime; returns True if distributed.

    No-op (returns False) when `coordinator_address` is empty — the
    single-process path stays exactly as before.  Call before any jax
    computation builds arrays.
    """
    if not coordinator_address:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    # Establish the all-device collective context NOW, while every process
    # is still in lockstep.  The first collective triggers a Gloo/NCCL
    # rendezvous with a ~30s peer timeout; if it instead fired after a
    # multi-minute jit compile, slow hosts can drift past the window
    # (observed on a 1-core CPU host: "Gloo context initialization
    # failed: DEADLINE_EXCEEDED").  This barrier compiles in under a
    # second, so peers meet well inside the timeout, and later
    # collectives over the same device set reuse the context.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("sqair_tpu:init")
    return True


def _from_callback(x, sharding):
    """Build a global jax.Array from a full (global) host array, placing
    only this process's addressable shards."""
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def global_shard_batch(batch, mesh: Mesh, time_major: bool = True):
    """Every process passes the SAME full global batch; each places its
    addressable shards of the data axis.  Multi-process analogue of
    mesh.shard_batch (which device_puts, and therefore requires all mesh
    devices to be addressable)."""
    sh = batch_sharded(mesh, time_major)
    return jax.tree_util.tree_map(lambda x: _from_callback(x, sh), batch)


def replicate_to_mesh(tree, mesh: Mesh):
    """Replicate host values (params / opt-state / rng) as global arrays.

    Every process must pass identical values (same init seed) — the
    runtime does not check, it just stitches shards."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: _from_callback(jnp.asarray(x), sh), tree
    )
