"""Smoke coverage for the reference's model-variant switches.

Reference flag surface: transition/time_transition/prior_transition cells
(common_model_flags.py:45-48), disc_prior_type {geom, cat}
(mlp_mnist_model.py:42-43), prop_prior_type {rnn, rw, guided}
(propagate.py:35-45), rec_where_prior, masked_glimpse.  Every variant must
build, run a sequence, and produce finite outputs + gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqair_tpu.models import AIRDecoder, Model, SequentialAIR, SQAIRTimestep

# heavy (interpret-mode Pallas / full variant matrix): slow tier
pytestmark = pytest.mark.slow

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


def assert_runs(seq, params, obs):
    out = seq(params, jax.random.PRNGKey(2), obs)
    for k, v in out.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    model = Model(seq, k_particles=2)

    def loss(p):
        t, _ = model.loss_and_metrics(p, jax.random.PRNGKey(3), obs)
        return t

    grads = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


@pytest.mark.parametrize("cell", ["VanillaRNN", "GRU", "LSTM"])
def test_transition_cells(cell):
    assert_runs(*build(transition=cell))


@pytest.mark.parametrize("cell", ["VanillaRNN", "LSTM"])
def test_time_and_prior_cells(cell):
    assert_runs(*build(time_transition=cell, prior_transition=cell))


@pytest.mark.parametrize("prior", ["geom", "cat"])
def test_disc_prior_types(prior):
    assert_runs(*build(disc_prior_type=prior))


@pytest.mark.parametrize("mode", ["rnn", "rw", "guided"])
def test_prop_prior_types(mode):
    assert_runs(*build(prop_prior_type=mode))


def test_fixed_where_prior():
    assert_runs(*build(rec_where_prior=False))


def test_unmasked_glimpse():
    assert_runs(*build(masked_glimpse=False))


def test_early_disc_step_bias_shifts_prior_only():
    """The early-frame discovery suppression (round-5 plateau lever) must
    change ONLY the #steps PRIOR log-prob, and only for t < horizon: the
    posterior sampling path and every posterior log-prob are untouched, so
    it can be switched on when resuming an existing checkpoint."""
    seq0, params, obs = build(disc_prior_type="cat")
    seq_b, _, _ = build(disc_prior_type="cat", early_disc_step_bias=2.5,
                        early_disc_horizon=1)

    rng = jax.random.PRNGKey(2)
    out0 = seq0(params, rng, obs)
    out_b = seq_b(params, rng, obs)

    # identical samples (the lever adds no params and never touches q)
    for k in ("presence", "where", "what", "presence_logit"):
        np.testing.assert_allclose(np.asarray(out0[k]), np.asarray(out_b[k]),
                                   err_msg=k)
    np.testing.assert_allclose(np.asarray(out0["disc_log_prob"]),
                               np.asarray(out_b["disc_log_prob"]))

    d = np.asarray(out0["disc_prior_log_prob"]) - np.asarray(
        out_b["disc_prior_log_prob"])  # [T, B]
    assert np.any(np.abs(d[0]) > 1e-6), "prior must shift at t < horizon"
    np.testing.assert_allclose(d[1], 0.0, atol=1e-6,
                               err_msg="prior must not shift at t >= horizon")


def test_early_disc_step_bias_requires_cat():
    with pytest.raises(ValueError):
        build(disc_prior_type="geom", early_disc_step_bias=1.0)


@pytest.mark.parametrize("kw", [dict(early_disc_logit_scale=0.15),
                                dict(early_disc_logit_clamp=3.0)])
def test_early_disc_desaturation_runs(kw):
    """Round-5 desaturation levers (trained-in fix for the saturated t<=1
    discovery posterior): the model must build, run, and pass finite
    gradients with the presence logit scaled/straight-through-clamped for
    t < early_disc_horizon."""
    assert_runs(*build(disc_prior_type="cat", early_disc_horizon=1, **kw))

    # the recorded q log-prob must be evaluated on the desaturated logits
    # (self-consistency: sample and log-prob share one distribution)
    seq, params, obs = build(disc_prior_type="cat", early_disc_horizon=1, **kw)
    out = seq(params, jax.random.PRNGKey(2), obs)
    logits = np.asarray(out["presence_logit"])  # [T, B, S, 1]
    if "early_disc_logit_clamp" in kw:
        # upper side only: dead slots legitimately sit at -88
        assert np.all(logits[0] <= 3.0 + 1e-5), \
            "t=0 recorded logits must be the clamped ones"
