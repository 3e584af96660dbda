"""Checkpoint save/restore (reference: tf.train.Saver + run-dir protocol).

Uses orbax-checkpoint; layout mirrors the reference's numbered run dirs
(experiment_tools.py:56-132): <results_dir>/<run_name>/<n>/ckpt-<step>/.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

CKPT_PREFIX = "ckpt-"


def save_checkpoint(run_dir: str, step: int, state: Dict[str, Any]) -> str:
    path = os.path.abspath(os.path.join(run_dir, f"{CKPT_PREFIX}{step}"))
    if jax.process_count() > 1:
        return _save_checkpoint_multiprocess(path, state)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, state, force=True)
    ckpt.wait_until_finished()
    return path


def _save_checkpoint_multiprocess(path: str, state: Dict[str, Any]) -> str:
    """Single-writer save for multi-host runs.

    Orbax's default multi-process save synchronises every process through
    coordinator barriers around the async write; on slow/contended hosts
    those barriers time out (observed: "_async_write_complete.ckpt-N
    Barrier timed out" on a 1-core 2-process CPU run).  Our state is
    fully replicated (params/opt-state come out of the train step with
    replicated shardings), so nothing is actually distributed about the
    save: every process materialises the same host values, process 0
    writes them alone (active_processes={0} -> no orbax barriers), and a
    plain jax collective — whose gloo context is established at startup,
    see parallel.distributed.initialize — fences the write.
    """
    from jax.experimental import multihost_utils

    host_state = jax.tree_util.tree_map(lambda x: np.asarray(x), state)
    if jax.process_index() == 0:
        ckpt = ocp.Checkpointer(
            ocp.StandardCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=0, active_processes={0},
            ),
        )
        ckpt.save(path, args=ocp.args.StandardSave(host_state), force=True)
    multihost_utils.sync_global_devices(f"sqair_tpu:save:{os.path.basename(path)}")
    return path


def find_checkpoints(run_dir: str) -> Dict[int, str]:
    """step -> path for all checkpoints in a run dir."""
    if not os.path.isdir(run_dir):
        return {}
    out = {}
    pat = re.compile(rf"^{CKPT_PREFIX}(\d+)$")
    for name in os.listdir(run_dir):
        m = pat.match(name)
        if m:
            out[int(m.group(1))] = os.path.join(run_dir, name)
    return out


def latest_checkpoint(run_dir: str) -> Optional[Tuple[int, str]]:
    ckpts = find_checkpoints(run_dir)
    if not ckpts:
        return None
    step = max(ckpts)
    return step, ckpts[step]


def restore_checkpoint(path: str, example_state: Dict[str, Any]) -> Dict[str, Any]:
    """Restores into the structure of ``example_state``."""
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(os.path.abspath(path), target=example_state)


def restore_params(path: str, example_params) -> Any:
    """Restores only the ``params`` subtree (evaluation/exploration use —
    tolerant of optimizer-state mismatches between save and restore time)."""
    ckpt = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
    restore_args = jax.tree_util.tree_map(
        lambda x: ocp.RestoreArgs(restore_type=np.ndarray),
        {"params": example_params},
    )
    restored = ckpt.restore(
        os.path.abspath(path),
        args=ocp.args.PyTreeRestore(
            item={"params": example_params},
            restore_args=restore_args,
            partial_restore=True,
        ),
    )
    params = restored["params"]

    def fit(example, got):
        arr = np.asarray(got)
        assert arr.shape == tuple(np.shape(example)), (arr.shape, np.shape(example))
        return jax.numpy.asarray(arr, dtype=np.asarray(example).dtype)

    return jax.tree_util.tree_map(fit, example_params, params)
