"""The explained-so-far coverage signal (round-5 architectural lever).

Diagnosis it answers (docs/NOTES.md, "t=0 residual characterised"): at t=0
the discovery steps predictor cannot tell a genuine box from the universal
spurious +1 box because nothing tells it what is already explained; at
t>=1 propagation conditioning provides that context and stopping is
perfect.  The lever gives the predictor a SPATIAL explained-so-far input:
a low-res ST-crop of a coverage canvas (propagated boxes + earlier
same-frame discovery slots), built from the rank-1 all-ones paste
(ops/stn.py paste_matrices) — no decoder in the loop.

Contract under test:
  1. paste/crop consistency: a claimed box reads back as ~1 coverage
  2. default-off: the param tree is byte-identical to pre-lever models
  3. warm start: zero-padding a flag-off checkpoint's steps-predictor
     kernel (tools/pad_coverage_params.py) is function-preserving
  4. the signal is actually plumbed: coverage changes the presence logits
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqair_tpu.models import AIRDecoder, Model, SequentialAIR, SQAIRTimestep
from sqair_tpu.models.core import coverage_paste
from sqair_tpu.ops import stn

B, T, S, H, GH, NWHAT, NH = 2, 2, 2, 16, 6, 4, 16


def build(**kw):
    ts = SQAIRTimestep(
        n_steps=S, img_size=(H, H), glimpse_size=(GH, GH), n_what=NWHAT,
        n_hidden=NH, steps_pred_hidden=[8], **kw,
    )
    dec = AIRDecoder(img_size=(H, H), glimpse_size=(GH, GH),
                     glimpse_n_hiddens=[NH],
                     mean_img=np.zeros((H, H), np.float32))
    seq = SequentialAIR(ts, dec)
    obs = jax.random.uniform(jax.random.PRNGKey(1), (T, B, H, H))
    params = seq.init(jax.random.PRNGKey(0), obs)
    return seq, params, obs


def test_coverage_paste_reads_back_as_one():
    """Claim a box, then ST-crop the canvas over the same box: interior
    coverage must be ~1; a disjoint box must read ~0."""
    # centred box, half the canvas (logit space: scale sigmoid^-1(0.5)=0)
    where = stn.to_logits(jnp.asarray([[0.5, 0.5, 0.0, 0.0]]))
    coords = stn.to_coords(where)
    cov = coverage_paste(jnp.zeros((1, H, H)), coords,
                         jnp.ones((1, 1)), (GH, GH))
    assert float(cov.max()) <= 1.0 + 1e-6
    back = stn.extract_glimpse(cov, coords, (4, 4))
    # corner samples sit on the box edge (bilinear falloff); the interior
    # must read fully covered and even the corners mostly covered
    assert float(back[:, 1:3, 1:3].min()) > 0.99, "interior must read ~1"
    assert float(back.min()) > 0.5, "claimed box must read as covered"
    # a far-away box reads ~0
    far = stn.to_coords(stn.to_logits(jnp.asarray([[0.2, 0.2, -0.75, -0.75]])))
    cov2 = coverage_paste(jnp.zeros((1, H, H)), far, jnp.ones((1, 1)),
                          (GH, GH))
    other = stn.to_coords(stn.to_logits(jnp.asarray([[0.2, 0.2, 0.75, 0.75]])))
    back2 = stn.extract_glimpse(cov2, other, (4, 4))
    assert float(back2.max()) < 0.05, "disjoint box must read uncovered"
    # absent object claims nothing
    cov3 = coverage_paste(jnp.zeros((1, H, H)), coords,
                          jnp.zeros((1, 1)), (GH, GH))
    assert float(cov3.max()) == 0.0


def test_coverage_paste_slotted_max_composite():
    wh = stn.to_logits(jnp.asarray([[[0.5, 0.5, 0.0, 0.0],
                                     [0.2, 0.2, -0.75, -0.75]]]))
    pres = jnp.asarray([[[1.0], [1.0]]])
    cov = coverage_paste(jnp.zeros((1, H, H)), stn.to_coords(wh), pres,
                         (GH, GH))
    assert cov.shape == (1, H, H)
    assert float(cov.max()) <= 1.0 + 1e-6
    # turning one slot off strictly reduces total coverage
    pres0 = jnp.asarray([[[1.0], [0.0]]])
    cov0 = coverage_paste(jnp.zeros((1, H, H)), stn.to_coords(wh), pres0,
                          (GH, GH))
    assert float(cov0.sum()) < float(cov.sum())


def test_default_off_param_tree_unchanged():
    """coverage_signal=False must not change the param tree (checkpoint
    compatibility with every shipped model)."""
    _, p_off, _ = build()
    _, p_on, _ = build(disc_coverage_signal=True)
    paths_off = {jax.tree_util.keystr(k): v.shape for k, v in
                 jax.tree_util.tree_leaves_with_path(p_off)}
    paths_on = {jax.tree_util.keystr(k): v.shape for k, v in
                jax.tree_util.tree_leaves_with_path(p_on)}
    assert set(paths_off) == set(paths_on), "no new/removed params"
    diff = {k for k in paths_off if paths_off[k] != paths_on[k]}
    assert len(diff) == 1, f"exactly one kernel grows, got {diff}"
    (k,) = diff
    assert "steps_predictor" in k and "w_0" in k
    assert paths_on[k][0] == paths_off[k][0] + 16  # COVERAGE_RES^2 rows


@pytest.mark.slow
def test_warm_start_is_function_preserving():
    """pad_for_coverage(flag-off params) run through the flag-on model
    must reproduce the flag-off outputs (same rng => same samples)."""
    from tools.pad_coverage_params import pad_for_coverage

    seq_off, params, obs = build()
    seq_on, _, _ = build(disc_coverage_signal=True)
    padded = pad_for_coverage(params)

    rng = jax.random.PRNGKey(2)
    out_off = seq_off(params, rng, obs)
    out_on = seq_on(padded, rng, obs)
    for k in ("presence", "presence_logit", "where", "what", "canvas"):
        np.testing.assert_allclose(np.asarray(out_off[k]),
                                   np.asarray(out_on[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


@pytest.mark.slow
def test_coverage_reaches_the_steps_logit():
    """With nonzero coverage weights, seeding the canvas (propagated
    objects present) must move the discovery presence logits — i.e. the
    signal is plumbed end to end, not dead."""
    from tools.pad_coverage_params import pad_for_coverage

    seq_on, _, obs = build(disc_coverage_signal=True)
    _, params, _ = build()
    padded = pad_for_coverage(params)

    # make the coverage rows matter
    def bump(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if keys[-1] == "w_0" and "steps_predictor" in keys and any(
                k == "discover" for k in keys):
            return leaf.at[-16:].set(1.0)
        return leaf

    bumped = jax.tree_util.tree_map_with_path(bump, padded)
    out_zero = seq_on(padded, jax.random.PRNGKey(2), obs)
    out_bump = seq_on(bumped, jax.random.PRNGKey(2), obs)
    live = np.asarray(out_zero["presence_logit"]) > -80.0
    d = np.abs(np.asarray(out_zero["presence_logit"])
               - np.asarray(out_bump["presence_logit"]))
    assert np.any(d[live] > 1e-4), "coverage features must reach the logit"


@pytest.mark.slow
def test_coverage_model_trains():
    """Flag-on model: finite loss and gradients through the full VIMCO
    target (the canvas pastes/crops must be differentiable-safe)."""
    seq, params, obs = build(disc_coverage_signal=True)
    model = Model(seq, k_particles=2)

    def loss(p):
        t, _ = model.loss_and_metrics(p, jax.random.PRNGKey(3), obs)
        return t

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_coverage_lr_mult_scales_only_coverage_rows():
    """scale_coverage_row_updates: (a) opt-state pytree identical to the
    unwrapped optimizer (checkpoint restore compatibility — the whole
    point of the stateless design), (b) emitted updates differ from the
    unwrapped ones ONLY on the last 16 rows of the discovery
    steps-predictor kernel, exactly by the multiplier."""
    import optax

    from sqair_tpu.training.train import (is_disc_steps_kernel,
                                          make_optimizer,
                                          scale_coverage_row_updates)

    _, params, _ = build(disc_coverage_signal=True)
    grads = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 0.01), params)

    base = make_optimizer("rmsprop", 1e-5)
    wrapped = scale_coverage_row_updates(base, 50.0)

    s0, s1 = base.init(params), wrapped.init(params)
    assert (jax.tree_util.tree_structure(s0)
            == jax.tree_util.tree_structure(s1)), "state must be identical"

    u0, _ = base.update(grads, s0, params)
    u1, _ = wrapped.update(grads, s1, params)

    flat0 = jax.tree_util.tree_leaves_with_path(u0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(u1))
    n_hit = 0
    for path, leaf0 in flat0:
        leaf1 = flat1[path]
        if is_disc_steps_kernel(path) and leaf0.ndim == 2:
            n_hit += 1
            np.testing.assert_allclose(np.asarray(leaf1[:-16]),
                                       np.asarray(leaf0[:-16]), rtol=1e-6)
            np.testing.assert_allclose(np.asarray(leaf1[-16:]),
                                       np.asarray(leaf0[-16:]) * 50.0,
                                       rtol=1e-6)
        else:
            np.testing.assert_array_equal(np.asarray(leaf1),
                                          np.asarray(leaf0),
                                          err_msg=jax.tree_util.keystr(path))
    assert n_hit == 1, "exactly one discovery steps-predictor kernel"
