"""Fused Pallas kernels under a multi-device mesh (VERDICT r2 #5).

`pallas_call` has no GSPMD partitioning rule, so under plain pjit the
fused whole-frame kernels silently force batch replication.  The fix is a
`shard_map` train/eval step (parallel/mesh.py) that runs the kernels on
per-device LOCAL shards with an explicit `lax.pmean` gradient reduction.
Tests here, on the 8-device virtual CPU mesh:

1. an exact oracle for the shard_map semantics on the (cheap) unfused
   path: per-shard grads with the shard-folded rng, averaged by hand,
   must reproduce the shard_map step's update bit-for-bit (up to float
   reassociation);
2. the fused kernels (interpret mode) actually run and train under
   shard_map on both the 1-D data mesh and the 2-D (dcn, data) multislice
   mesh;
3. the auto-switch: fused-active + multi-device mesh selects shard_map.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sqair_tpu.models import AIRDecoder, Model, SequentialAIR, SQAIRTimestep
from sqair_tpu.ops import fused, fused_cells as fc
from sqair_tpu.parallel import make_mesh, make_parallel_train_step, shard_batch
from sqair_tpu.parallel.mesh import (
    _fused_kernels_active,
    make_multislice_mesh,
    make_parallel_eval_step,
)
from sqair_tpu.training import init_train, make_optimizer

B, T, S, HW, NWHAT, NH = 8, 2, 2, 16, 4, 16


def tiny_model(k=2):
    timestep = SQAIRTimestep(
        n_steps=S, img_size=(HW, HW), glimpse_size=(6, 6), n_what=NWHAT,
        n_hidden=NH, steps_pred_hidden=[8],
    )
    decoder = AIRDecoder(
        img_size=(HW, HW), glimpse_size=(6, 6), glimpse_n_hiddens=[NH],
        mean_img=np.zeros((HW, HW), np.float32),
    )
    return Model(SequentialAIR(timestep, decoder), k_particles=k)


def _batch(rng_seed=1):
    obs = jax.random.uniform(jax.random.PRNGKey(rng_seed), (T, B, HW, HW))
    nums = jnp.concatenate([jnp.ones((T, B, 1)), jnp.zeros((T, B, S))], -1)
    return obs, nums


@pytest.fixture
def fused_on(monkeypatch):
    """Force the fused path as it would be on TPU, but in interpret mode
    (fused_cells has its own flag; fused.py/fused_glimpse.py kernels are
    forced through a pallas_call wrapper, same as test_fused_rnn_kernels)."""
    from jax.experimental import pallas as pl

    monkeypatch.setenv("SQAIR_FUSE_CELLS", "1")
    monkeypatch.setattr(fused, "use_pallas", lambda: True)
    monkeypatch.setattr(fc, "_INTERPRET", True)
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


def test_auto_switch_detection(monkeypatch):
    # the switch keys on use_pallas() alone: the default MLP/GRU kernels
    # (not just SQAIR_FUSE_CELLS) emit pallas_call on real TPU backends,
    # and pallas_call has no GSPMD partitioning rule
    monkeypatch.delenv("SQAIR_FUSE_CELLS", raising=False)
    monkeypatch.setattr(fused, "use_pallas", lambda: False)
    assert not _fused_kernels_active()
    monkeypatch.setattr(fused, "use_pallas", lambda: True)
    assert _fused_kernels_active()  # even with SQAIR_FUSE_CELLS unset


@pytest.mark.slow
def test_shard_map_matches_per_shard_oracle():
    """shard_map step == hand-computed pmean of per-shard grad steps."""
    model = tiny_model()
    opt = make_optimizer("sgd", 1e-3)
    mesh = make_mesh()
    n = mesh.size
    rng = jax.random.PRNGKey(0)
    obs, nums = _batch()
    state = init_train(model, opt, rng, obs)

    step = make_parallel_train_step(model, opt, mesh, donate=False,
                                    use_shard_map=True)
    batch = shard_batch({"obs": obs, "nums": nums}, mesh)
    p_sm, _, m_sm = step(state.params, state.opt_state, rng,
                         batch["obs"], batch["nums"])

    # oracle: same math on one device, shard by shard
    def loss_fn(params, r, o, m):
        target, aux = model.loss_and_metrics(params, r, o, m, 0.0,
                                             record_mode="train")
        return target, aux["metrics"]

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    local = B // n
    grads_acc, target_acc = None, 0.0
    for s in range(n):
        r_s = jax.random.fold_in(rng, s)
        o_s = obs[:, s * local:(s + 1) * local]
        m_s = nums[:, s * local:(s + 1) * local]
        (_, metrics_s), g_s = grad_fn(state.params, r_s, o_s, m_s)
        target_acc += float(metrics_s["target"]) / n
        grads_acc = g_s if grads_acc is None else jax.tree_util.tree_map(
            jnp.add, grads_acc, g_s)
    grads_mean = jax.tree_util.tree_map(lambda g: g / n, grads_acc)
    updates, _ = opt.update(grads_mean, state.opt_state, state.params)
    p_oracle = optax.apply_updates(state.params, updates)

    np.testing.assert_allclose(float(m_sm["target"]), target_acc, rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_sm),
                    jax.tree_util.tree_leaves(p_oracle)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


@pytest.mark.slow
def test_shard_map_aspect_is_global_ratio():
    """The aspect metric under shard_map equals sum(sq)/sum(present) over
    the GLOBAL batch — not the pmean of per-shard ratios (ADVICE r3).

    Oracle: run loss_and_metrics per shard with the shard-folded rng and
    combine the raw parts by hand.
    """
    model = tiny_model()
    mesh = make_mesh()
    n = mesh.size
    rng = jax.random.PRNGKey(3)
    obs, nums = _batch(rng_seed=7)
    opt = make_optimizer("sgd", 1e-3)
    state = init_train(model, opt, rng, obs)

    eval_step = make_parallel_eval_step(model, mesh, use_shard_map=True)
    batch = shard_batch({"obs": obs, "nums": nums}, mesh)
    m_sm = eval_step(state.params, rng, batch["obs"], batch["nums"])

    local = B // n
    sq, npres, ratios = 0.0, 0.0, []
    for s in range(n):
        r_s = jax.random.fold_in(rng, s)
        o_s = obs[:, s * local:(s + 1) * local]
        g_s = nums[:, s * local:(s + 1) * local]
        _, aux = model.loss_and_metrics(state.params, r_s, o_s, g_s)
        sq += float(aux["metrics"]["aspect_sq_sum"])
        npres += float(aux["metrics"]["aspect_n"])
        ratios.append(float(aux["metrics"]["aspect"]))
    global_ratio = sq / max(npres, 1.0)

    np.testing.assert_allclose(float(m_sm["aspect"]), global_ratio, rtol=2e-4)
    # the parts never leak into the reported metric set
    assert "aspect_sq_sum" not in m_sm and "aspect_n" not in m_sm
    # sanity that the test can distinguish the two reductions at all:
    # per-shard presence counts differ on random data, so mean-of-ratios
    # and global ratio are distinct values here
    mean_of_ratios = float(np.mean(ratios))
    if abs(mean_of_ratios - global_ratio) > 1e-7:
        assert abs(float(m_sm["aspect"]) - mean_of_ratios) > 1e-7


@pytest.mark.slow
def test_shard_map_aspect_penalty_is_global_ratio():
    """With aspect_penalty > 0, the shard_map TRAIN step must optimise the
    GLOBAL-ratio penalty sq_global/n_global (VERDICT r4 #6) — value AND
    gradient — not the per-shard ratio.

    Oracle: differentiate, on one device, the exact global objective
    mean_shards(base_target_s) + w * sum(sq_s)/sum(n_s), built from a
    penalty-free twin model plus the hand-combined aspect parts.  The
    pmean'd shard_map gradient must match it (model.py scales the local
    numerator by the shard count so grad-pmean telescopes to the global
    ratio's gradient).
    """
    w = 0.7
    model_pen = tiny_model()
    model_pen.aspect_penalty = w
    model_plain = tiny_model()  # same param structure, penalty-free
    opt = make_optimizer("sgd", 1e-2)
    mesh = make_mesh()
    n = mesh.size
    rng = jax.random.PRNGKey(5)
    obs, nums = _batch(rng_seed=11)
    state = init_train(model_plain, opt, rng, obs)

    step = make_parallel_train_step(model_pen, opt, mesh, donate=False,
                                    use_shard_map=True)
    batch = shard_batch({"obs": obs, "nums": nums}, mesh)
    p_sm, _, m_sm = step(state.params, state.opt_state, rng,
                         batch["obs"], batch["nums"])

    local = B // n

    def global_objective(params):
        base, sq, npres = 0.0, 0.0, 0.0
        for s in range(n):
            r_s = jax.random.fold_in(rng, s)
            o_s = obs[:, s * local:(s + 1) * local]
            g_s = nums[:, s * local:(s + 1) * local]
            t_s, aux = model_plain.loss_and_metrics(params, r_s, o_s, g_s,
                                                    record_mode="train")
            base = base + t_s / n
            sq = sq + aux["metrics"]["aspect_sq_sum"]
            npres = npres + aux["metrics"]["aspect_n"]
        return base + w * sq / jnp.maximum(npres, 1.0)

    obj, grads = jax.jit(jax.value_and_grad(global_objective))(state.params)
    updates, _ = opt.update(grads, state.opt_state, state.params)
    p_oracle = optax.apply_updates(state.params, updates)

    # pmean'd target == global objective value
    np.testing.assert_allclose(float(m_sm["target"]), float(obj), rtol=2e-4)
    # one optimizer step under each must agree -> gradients agree
    for a, b in zip(jax.tree_util.tree_leaves(p_sm),
                    jax.tree_util.tree_leaves(p_oracle)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("mesh_fn", [make_mesh,
                                     functools.partial(make_multislice_mesh, 2)])
def test_fused_kernels_train_under_shard_map(fused_on, mesh_fn):
    model = tiny_model()
    opt = make_optimizer("sgd", 1e-3)
    mesh = mesh_fn()
    rng = jax.random.PRNGKey(0)
    obs, nums = _batch()
    state = init_train(model, opt, rng, obs)

    # fused active + multi-device mesh -> the factory must choose shard_map
    # on its own (use_shard_map left as None)
    step = make_parallel_train_step(model, opt, mesh, donate=False)
    batch = shard_batch({"obs": obs, "nums": nums}, mesh)
    params, _, metrics = step(state.params, state.opt_state, rng,
                              batch["obs"], batch["nums"])
    assert np.isfinite(float(metrics["target"]))
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.sharding.is_fully_replicated
    # the step actually updated the params
    before = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.allclose(np.asarray(leaf), np.asarray(before))

    eval_step = make_parallel_eval_step(model, mesh)
    m2 = eval_step(params, rng, batch["obs"], batch["nums"])
    assert np.isfinite(float(m2["target"]))
