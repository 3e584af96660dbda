"""Warm-start a --disc_coverage_signal run from a flag-off checkpoint.

The coverage lever (models/core.py DiscoveryCore.coverage_signal) appends
COVERAGE_RES^2 features to the DISCOVERY steps predictor's input, growing
its first-layer kernel by that many input rows.  Because the new features
are concatenated LAST and the kernel is [d_in, d_out], zero-filling the
new rows makes the padded model bit-equivalent to the original — training
then learns the coverage weights from a function-preserving start
(tests/test_coverage_signal.py proves the equivalence).

Library use:   new_params = pad_for_coverage(old_params)
CLI use:       python tools/pad_coverage_params.py <run_dir> <step> <out_dir>
  loads <run_dir>/ckpt-<step> (orbax), pads, saves to <out_dir>/ckpt-<step>.
"""
from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sqair_tpu.training.train import is_disc_steps_kernel as _is_disc_steps_kernel  # noqa: E402


def _pad_tree(tree, n_extra: int):
    """Zero-pads every kernel-shaped leaf on the discovery
    steps-predictor w_0 path; returns (padded_tree, hit_paths)."""
    hits = []

    def visit(path, leaf):
        if _is_disc_steps_kernel(path) and getattr(leaf, "ndim", 0) == 2:
            hits.append(jax.tree_util.keystr(path))
            pad = jnp.zeros((n_extra, leaf.shape[1]), leaf.dtype)
            return jnp.concatenate([leaf, pad], 0)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, tree), hits


def pad_for_coverage(params, n_extra: int = 16):
    """Appends ``n_extra`` zero input-rows to the discovery
    steps-predictor first-layer kernel; everything else is unchanged.

    Raises if no (or more than one) matching kernel is found — the
    caller's tree doesn't look like a SQAIR param tree.
    """
    out, hits = _pad_tree(params, n_extra)
    if len(hits) != 1:
        raise ValueError(
            f"expected exactly one discovery steps-predictor kernel, "
            f"found {len(hits)}: {hits}")
    return out


def pad_state_for_coverage(state, n_extra: int = 16):
    """Pads a full train state {params, opt_state, step}: the params
    kernel AND its optimizer-moment twins (zero rows = the moments a
    fresh optax init would give the new inputs)."""
    out, hits = _pad_tree(state, n_extra)
    if not hits:
        raise ValueError("no discovery steps-predictor kernel in state")
    return out, hits


def main(argv):
    if len(argv) != 4:
        print(__doc__)
        return 1
    run_dir, step, out_dir = argv[1], int(argv[2]), argv[3]
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.abspath(f"{run_dir}/ckpt-{step}"))
        state, hits = pad_state_for_coverage(state)
        ckptr.save(os.path.abspath(f"{out_dir}/ckpt-{step}"), state,
                   force=True)
    print(f"padded ckpt-{step} -> {out_dir}; padded leaves:")
    for h in hits:
        print(f"  {h}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
