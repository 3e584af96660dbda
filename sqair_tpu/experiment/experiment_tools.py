"""Experiment framework: config-module loading + run-dir protocol.

Reference: sqair/experiment_tools.py.  Contract kept:
- a config file is a python module exposing ``load(...)``; importing it
  registers its flags (code-as-config);
- run dirs are ``results_dir/run_name/<n>/`` auto-incremented, containing
  flags.json (+ git commit when available) and copies of both configs;
- ``--resume`` restores flags and finds the latest checkpoint.
"""
from __future__ import annotations

import importlib
import importlib.util
import json
import os
import shutil
import subprocess
import sys
from typing import Any, Dict, Optional, Tuple

from . import flags as tf_flags
from ..training.checkpoint import latest_checkpoint

FLAG_FILE = "flags.json"


def json_store(path: str, data: Dict) -> None:
    with open(path, "w") as f:
        json.dump(data, f, sort_keys=True, indent=4, default=str)


def json_load(path: str) -> Dict:
    with open(path, "r") as f:
        return json.load(f)


def _import_module(module_path_or_name: str):
    """(experiment_tools.py:160-180)"""
    if module_path_or_name.endswith(".py"):
        if not os.path.exists(module_path_or_name):
            raise RuntimeError(f"File {module_path_or_name} does not exist.")
        mod_name = os.path.basename(os.path.splitext(module_path_or_name)[0])
        if mod_name in sys.modules:
            return sys.modules[mod_name]
        spec = importlib.util.spec_from_file_location(mod_name, module_path_or_name)
        module = importlib.util.module_from_spec(spec)
        sys.modules[mod_name] = module
        spec.loader.exec_module(module)
        return module
    return importlib.import_module(module_path_or_name)


def load(conf_path: str, *args, **kwargs):
    """Imports a config module and calls its load() (147-157)."""
    module = _import_module(conf_path)
    if not hasattr(module, "load"):
        raise ValueError(
            f"The config file should specify a 'load' function but none was "
            f"found in {module.__file__}"
        )
    print(f"Loading '{module.__name__}' from {module.__file__}")
    return module.load(*args, **kwargs)


def _load_flags(*config_paths):
    for p in config_paths:
        print("loading flags from", p)
        _import_module(p)


def parse_flags() -> Dict[str, Any]:
    leftover = tf_flags.FLAGS.parse()
    sys.argv[1:] = leftover
    return tf_flags.FLAGS.as_dict()


def assert_all_flags_parsed():
    not_parsed = [a for a in sys.argv[1:] if a.startswith("--")]
    if not_parsed:
        raise RuntimeError(f"Failed to parse following flags: {not_parsed}")


def get_git_revision_hash() -> str:
    return subprocess.check_output(["git", "rev-parse", "HEAD"]).decode().strip()


def init_checkpoint(checkpoint_dir: str, data_config: str, model_config: str,
                    resume: bool, attach: bool = False
                    ) -> Tuple[str, Dict, Optional[str]]:
    """Run-dir management (experiment_tools.py:56-132).

    ``attach=True`` joins the latest existing numbered run dir without
    creating or writing anything — used by non-zero processes of a
    multi-host run, which must share process 0's run dir rather than race
    it for the next number.
    """
    exists = os.path.exists(checkpoint_dir)
    if not exists:
        if resume:
            raise ValueError(
                f"Can't resume when the checkpoint dir '{checkpoint_dir}' doesn't exist."
            )
        os.makedirs(checkpoint_dir)
    elif not os.path.isdir(checkpoint_dir):
        raise ValueError(f"Checkpoint dir '{checkpoint_dir}' is not a directory.")

    folders = [f for f in os.listdir(checkpoint_dir)
               if not f.startswith("_") and f.isdigit()]
    if folders:
        n = int(sorted(folders, key=int)[-1])
        if not resume and not attach:
            n += 1
    elif attach:
        raise ValueError(
            f"attach=True but no run dir exists under '{checkpoint_dir}'")
    else:
        if resume:
            raise ValueError(
                f"Can't resume since no experiments were run before in '{checkpoint_dir}'."
            )
        n = 1

    experiment_folder = os.path.join(checkpoint_dir, str(n))
    if not resume and not attach:
        os.mkdir(experiment_folder)

    flag_path = os.path.join(experiment_folder, FLAG_FILE)
    resume_checkpoint = None

    _load_flags(model_config, data_config)
    flags = parse_flags()
    assert_all_flags_parsed()
    # names given explicitly on the CLI (tracked across every parse() call,
    # including the entry script's one that consumed argv)
    cli_names = set(tf_flags.FLAGS._cli_set)

    if resume:
        restored = json_load(flag_path)
        # explicit command-line flags win over the snapshot (the reference
        # re-parses after restoring, experiment_tools.py:194-233) — so a
        # resumed run can e.g. extend --train_itr
        cli_values = {k: flags[k] for k in cli_names if k in flags}
        flags.update(restored)
        flags.update(cli_values)
        tf_flags.FLAGS.restore(flags)
        if any(restored.get(k) != v for k, v in cli_values.items()):
            # Persist the merged flags so a later eval/rollout on this run
            # dir sees the overrides — without this, a resumed-with-new-flags
            # run (e.g. a probe forked from a curriculum checkpoint) leaves a
            # stale snapshot and eval silently drops the lever.  The original
            # git_commit is preserved (it records the run's creation).
            json_store(flag_path, flags)
        found = latest_checkpoint(experiment_folder)
        if found is not None:
            resume_checkpoint = found[1]
    elif attach:
        found = latest_checkpoint(experiment_folder)
        if found is not None:
            resume_checkpoint = found[1]
    else:
        try:
            flags["git_commit"] = get_git_revision_hash()
        except (subprocess.CalledProcessError, FileNotFoundError):
            pass
        json_store(flag_path, flags)
        for src in (model_config, data_config):
            if os.path.exists(src):
                shutil.copy(src, os.path.join(experiment_folder, os.path.basename(src)))

    return experiment_folder, flags, resume_checkpoint


def print_flags():
    flags = tf_flags.FLAGS.as_dict()
    print("Flags:")
    print("=" * 60)
    for k in sorted(flags):
        print(f"\t{k}: {flags[k]}")
    print("=" * 60)


def format_integer(number: int, group_size: int = 3) -> str:
    number = str(number)
    parts = []
    while number:
        number, part = number[:-group_size], number[-group_size:]
        parts.append(part)
    return " ".join(reversed(parts))


def print_num_params(params):
    import jax
    import numpy as np

    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    print(f"Number of trainable parameters: {format_integer(n)}")


def print_variables_by_scope(params):
    import jax
    import numpy as np

    flat = jax.tree_util.tree_leaves_with_path(params)
    rows = sorted(
        (jax.tree_util.keystr(path), list(p.shape)) for path, p in flat
    )
    last_scope, scope_n = None, 0
    for name, shape in rows:
        scope = name.strip("[]'\"").split("'")[1] if "'" in name else name
        if scope != last_scope:
            if last_scope is not None:
                print(f"{last_scope} scope params = {format_integer(scope_n)}\n")
            print("scope:", scope)
            scope_n = 0
        last_scope = scope
        scope_n += int(np.prod(shape))
        print("\t", name, shape)
    if last_scope is not None:
        print(f"{last_scope} scope params = {format_integer(scope_n)}")
