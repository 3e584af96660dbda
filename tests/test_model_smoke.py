"""End-to-end shape/sanity tests for the full SQAIR model (tiny config)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqair_tpu.models import AIRDecoder, Model, SequentialAIR, SQAIRTimestep

B, T, S, H, W, GH, GW, NWHAT, NH = 2, 3, 2, 20, 20, 8, 8, 6, 16


@pytest.fixture(scope="module")
def built():
    timestep = SQAIRTimestep(
        n_steps=S, img_size=(H, W), glimpse_size=(GH, GW), n_what=NWHAT,
        n_hidden=NH, steps_pred_hidden=[8],
    )
    decoder = AIRDecoder(
        img_size=(H, W), glimpse_size=(GH, GW), glimpse_n_hiddens=[NH],
        mean_img=np.zeros((H, W), np.float32),
    )
    seq = SequentialAIR(timestep, decoder)
    rng = jax.random.PRNGKey(0)
    obs = jax.random.uniform(jax.random.PRNGKey(1), (T, B, H, W))
    params = seq.init(rng, obs)
    return seq, params, obs


class TestSequentialAIR:
    def test_output_shapes(self, built):
        seq, params, obs = built
        out = seq(params, jax.random.PRNGKey(2), obs)

        assert out["what"].shape == (T, B, S, NWHAT)
        assert out["where"].shape == (T, B, S, 4)
        assert out["presence"].shape == (T, B, S)
        assert out["canvas"].shape == (T, B, H, W)
        assert out["glimpse"].shape == (T, B, S, GH, GW)
        assert out["obj_id"].shape == (T, B, S)
        assert out["disc_prob"].shape == (T, B, S + 1)
        assert out["prop_prob"].shape == (T, B, S)
        assert out["log_weights_per_timestep"].shape == (T, B)
        assert out["data_ll_per_sample"].shape == (T, B)
        # the full 38-field record
        assert len(out) == 38

    def test_finite(self, built):
        seq, params, obs = built
        out = seq(params, jax.random.PRNGKey(2), obs)
        for k, v in out.items():
            assert np.all(np.isfinite(np.asarray(v))), f"non-finite in {k}"

    def test_presence_binary_and_monotone_ids(self, built):
        seq, params, obs = built
        out = seq(params, jax.random.PRNGKey(2), obs)
        pres = np.asarray(out["presence"])
        assert set(np.unique(pres)) <= {0.0, 1.0}
        # present objects come first in every frame (invariant of the merge)
        for t in range(T):
            for b in range(B):
                p = pres[t, b]
                assert np.all(np.diff(p) <= 0.0 + 1e-6) or p.sum() in (0, S), (
                    f"presence not front-packed at t={t} b={b}: {p}"
                )

    def test_ids_assigned_to_present(self, built):
        seq, params, obs = built
        out = seq(params, jax.random.PRNGKey(2), obs)
        ids = np.asarray(out["obj_id"])
        pres = np.asarray(out["presence"])
        # absent slots have id -1; present slots have ids >= 0
        assert np.all(ids[pres == 0.0] == -1.0)
        assert np.all(ids[pres == 1.0] >= 0.0)

    def test_deterministic_given_rng(self, built):
        seq, params, obs = built
        o1 = seq(params, jax.random.PRNGKey(3), obs)
        o2 = seq(params, jax.random.PRNGKey(3), obs)
        np.testing.assert_array_equal(np.asarray(o1["canvas"]), np.asarray(o2["canvas"]))

    def test_kl_identity(self, built):
        seq, params, obs = built
        out = seq(params, jax.random.PRNGKey(2), obs)
        np.testing.assert_allclose(
            np.asarray(out["kl_per_sample"]),
            np.asarray(out["log_q_z_given_x_per_sample"] - out["log_p_z_per_sample"]),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out["log_weights_per_timestep"]),
            np.asarray(out["data_ll_per_sample"] - out["kl_per_sample"]),
            rtol=1e-5, atol=1e-5,
        )

    def test_shared_encoders_single_param_copy(self, built):
        seq, params, obs = built
        keys = params["timestep"]["params"].keys()
        # shared encoders live at the root, not duplicated in disc/prop cells
        assert "_input_encoder" in keys
        assert "_glimpse_encoder" in keys


class TestModelWrapper:
    @pytest.fixture(scope="class")
    def model(self, built):
        seq, params, obs = built
        return Model(seq, k_particles=3), params, obs

    def test_loss_and_metrics(self, model):
        m, params, obs = model
        gt = jnp.concatenate(
            [jnp.ones((T, B, 1)), jnp.zeros((T, B, S))], -1
        )  # 1 object per example
        target, aux = m.loss_and_metrics(params, jax.random.PRNGKey(4), obs, gt)
        assert np.isfinite(float(target))
        metrics = aux["metrics"]
        for k in ("vae", "iwae", "normalised_iwae", "ess", "data_ll", "kl",
                  "mse", "raw_mse", "num_steps", "num_step_accuracy", "target"):
            assert np.isfinite(float(metrics[k])), k
        assert aux["log_weights"].shape == (B, 3)
        assert 1.0 <= float(metrics["ess"]) <= 3.0 + 1e-5
        assert aux["render"]["resampled_canvas"].shape == (T, B, H, W)

    def test_per_timestep_accuracy(self, model):
        """num_step_acc_per_t is a [T] vector whose time-mean equals the
        scalar num_step_accuracy (eval paths only — absent in 'train'
        record mode so the hot step stays scalar-metrics-only)."""
        m, params, obs = model
        gt = jnp.concatenate([jnp.ones((T, B, 1)), jnp.zeros((T, B, S))], -1)
        rng = jax.random.PRNGKey(9)
        _, aux = m.loss_and_metrics(params, rng, obs, gt)
        per_t = np.asarray(aux["metrics"]["num_step_acc_per_t"])
        assert per_t.shape == (T,)
        assert np.all((per_t >= 0.0) & (per_t <= 1.0 + 1e-6))
        np.testing.assert_allclose(
            per_t.mean(), float(aux["metrics"]["num_step_accuracy"]),
            rtol=1e-5, atol=1e-6)
        _, aux_tr = m.loss_and_metrics(params, rng, obs, gt,
                                       record_mode="train")
        assert "num_step_acc_per_t" not in aux_tr["metrics"]

    def test_train_record_mode_matches_full(self, model):
        """record_mode='train' must give the same target and metrics as
        'full' — it only skips the render stacks."""
        m, params, obs = model
        gt = jnp.concatenate([jnp.ones((T, B, 1)), jnp.zeros((T, B, S))], -1)
        rng = jax.random.PRNGKey(7)
        t_full, aux_full = m.loss_and_metrics(params, rng, obs, gt)
        t_train, aux_train = m.loss_and_metrics(params, rng, obs, gt,
                                                record_mode="train")
        np.testing.assert_allclose(float(t_full), float(t_train), rtol=1e-6)
        for k, v in aux_train["metrics"].items():
            np.testing.assert_allclose(
                np.asarray(aux_full["metrics"][k]), np.asarray(v),
                rtol=1e-5, atol=1e-6, err_msg=k,
            )
        assert aux_train["render"] == {}

    @pytest.mark.slow
    def test_aspect_penalty(self, built, model):
        """Penalty is positive, reduces to target + w*aspect, and is
        identical across record modes (the where/presence fields agree).

        Slow tier (VERDICT r3 #8): three loss_and_metrics traces + a grad
        compile, ~86s of the default tier's budget."""
        seq, params, obs = built
        m0, _, _ = model
        w = 0.7
        m_pen = Model(seq, k_particles=3, aspect_penalty=w)

        rng = jax.random.PRNGKey(11)
        t0, aux0 = m0.loss_and_metrics(params, rng, obs)
        t1, aux1 = m_pen.loss_and_metrics(params, rng, obs)
        aspect = float(aux1["metrics"]["aspect"])
        assert aspect >= 0.0
        np.testing.assert_allclose(float(t1), float(t0) + w * aspect,
                                   rtol=1e-5)

        t_train, aux_train = m_pen.loss_and_metrics(params, rng, obs,
                                                    record_mode="train")
        np.testing.assert_allclose(float(t1), float(t_train), rtol=1e-6)
        np.testing.assert_allclose(
            aspect, float(aux_train["metrics"]["aspect"]), rtol=1e-5)

        # gradient flows through the penalty into the posterior params
        def loss(p):
            t, _ = m_pen.loss_and_metrics(p, rng, obs, record_mode="train")
            return t

        grads = jax.grad(loss)(params)
        assert all(np.all(np.isfinite(np.asarray(g)))
                   for g in jax.tree_util.tree_leaves(grads))

    @pytest.mark.slow
    def test_transient_penalty(self, built, model):
        """Transient-discovery penalty (round-5 early over-counting fix):
        the metric equals the numpy oracle sum_{t<H} relu(E[n_t] - E[n_H])
        with E[n_t] = sum_slots sigmoid(presence_logit[t]); the target
        reduces to target + w*excess; record modes agree; grads finite."""
        seq, params, obs = built
        m0, _, _ = model
        w = 2.5
        m_pen = Model(seq, k_particles=3, transient_penalty=w)

        rng = jax.random.PRNGKey(13)
        t0, aux0 = m0.loss_and_metrics(params, rng, obs)
        excess = float(aux0["metrics"]["transient_excess"])

        # numpy oracle from the same forward record
        out = m0.forward(params, rng, obs)
        pl = np.asarray(out["presence_logit"], np.float64)
        if pl.ndim == 4:
            pl = pl[..., 0]
        n_hat = (1.0 / (1.0 + np.exp(-pl))).sum(-1)  # [T, B*k]
        want = np.mean(np.clip(n_hat[:2] - n_hat[2][None], 0.0, None).sum(0))
        np.testing.assert_allclose(excess, want, rtol=1e-4, atol=1e-7)

        t1, aux1 = m_pen.loss_and_metrics(params, rng, obs)
        np.testing.assert_allclose(float(t1), float(t0) + w * excess,
                                   rtol=1e-5)

        t_train, aux_train = m_pen.loss_and_metrics(params, rng, obs,
                                                    record_mode="train")
        np.testing.assert_allclose(float(t1), float(t_train), rtol=1e-6)
        np.testing.assert_allclose(
            excess, float(aux_train["metrics"]["transient_excess"]),
            rtol=1e-5)

        def loss(p):
            t, _ = m_pen.loss_and_metrics(p, rng, obs, record_mode="train")
            return t

        grads = jax.grad(loss)(params)
        assert all(np.all(np.isfinite(np.asarray(g)))
                   for g in jax.tree_util.tree_leaves(grads))

        # tempered penalty: target = t0 + w*excess_tau; the logged metric
        # stays the true (tau=1) expected-count excess
        tau = 4.0
        m_temp = Model(seq, k_particles=3, transient_penalty=w,
                       transient_temp=tau)
        n_hat_t = (1.0 / (1.0 + np.exp(-pl / tau))).sum(-1)
        want_t = np.mean(
            np.clip(n_hat_t[:2] - n_hat_t[2][None], 0.0, None).sum(0))
        t2, aux2 = m_temp.loss_and_metrics(params, rng, obs)
        np.testing.assert_allclose(float(t2), float(t0) + w * want_t,
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            float(aux2["metrics"]["transient_excess"]), excess,
            rtol=1e-5, atol=1e-7)

    def test_finalize_metrics_recomputes_ratio_and_drops_parts(self):
        """finalize_metrics: aspect = sum(sq)/sum(n) from the (possibly
        pmean'd) parts; part keys removed; other keys untouched (ADVICE
        r3 — mean of per-shard ratios is not the global ratio)."""
        m = {"aspect": 999.0, "aspect_sq_sum": jnp.asarray(6.0),
             "aspect_n": jnp.asarray(4.0), "target": jnp.asarray(-1.0)}
        out = Model.finalize_metrics(m)
        np.testing.assert_allclose(float(out["aspect"]), 1.5)
        assert "aspect_sq_sum" not in out and "aspect_n" not in out
        assert float(out["target"]) == -1.0
        # zero-presence guard: 0/max(0,1) = 0, not nan
        out0 = Model.finalize_metrics(
            {"aspect_sq_sum": jnp.asarray(0.0), "aspect_n": jnp.asarray(0.0)})
        assert float(out0["aspect"]) == 0.0
        # metrics without the parts pass through unchanged
        assert Model.finalize_metrics({"target": 3.0}) == {"target": 3.0}

    def test_iwae_geq_vae_on_average(self, model):
        m, params, obs = model
        _, aux = m.loss_and_metrics(params, jax.random.PRNGKey(4), obs)
        assert float(aux["metrics"]["iwae"]) >= float(aux["metrics"]["vae"]) - 1e-4

    def test_grads_flow_everywhere(self, model):
        """Reference asserts every variable gets a gradient (model.py:163-166)."""
        m, params, obs = model

        def loss(p):
            t, _ = m.loss_and_metrics(p, jax.random.PRNGKey(4), obs)
            return t

        grads = jax.grad(loss)(params)
        flat = jax.tree_util.tree_leaves_with_path(grads)
        n_nonzero = 0
        zero_paths = []
        for path, g in flat:
            assert np.all(np.isfinite(np.asarray(g))), path
            if np.any(np.asarray(g) != 0.0):
                n_nonzero += 1
            else:
                zero_paths.append(jax.tree_util.keystr(path))
        # the overwhelming majority of params must receive nonzero gradient
        assert n_nonzero / len(flat) > 0.8, f"zero-grad params: {zero_paths}"


class TestDebugTools:
    def test_propagate_only_timestep(self, built):
        """Reference's PropagateOnlyTimestep mock (sqair_modules.py:388-414)."""
        seq, params, obs = built
        ts = seq.timestep
        B_ = obs.shape[1]
        carry = ts.apply(params["timestep"], B_, method=ts.initial_carry)
        out = ts.apply(
            params["timestep"], jax.random.PRNGKey(5), obs[0],
            carry["z"], carry["time_state"], carry["prior_state"],
            method=type(ts).propagate_only,
        )
        assert len(out["z_t"]) == 4
        assert out["z_t"][0].shape == (B_, S, NWHAT)
        for v in jax.tree_util.tree_leaves(out):
            assert np.all(np.isfinite(np.asarray(v)))

    def test_delay_training_for(self):
        from sqair_tpu.ops.math import delay_training_for

        f = lambda x, step: jnp.sum(delay_training_for(x, step, 10) ** 2)
        g_before = jax.grad(f)(jnp.ones(3), 5)
        g_after = jax.grad(f)(jnp.ones(3), 15)
        np.testing.assert_array_equal(np.asarray(g_before), 0.0)
        np.testing.assert_array_equal(np.asarray(g_after), 2.0)
        # value unchanged either way
        np.testing.assert_allclose(float(f(jnp.ones(3), 5)), 3.0)
