import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqair_tpu.nn import (
    GRU,
    MLP,
    AffineDiagNormal,
    GaussianFromParamVec,
    RecurrentNormalImpl,
    StepsPredictor,
    StochasticTransformParam,
    VanillaRNN,
    make_cell,
)


class TestMLP:
    def test_nested_hiddens_flattened(self, rng):
        # reference configs pass 1-tuples of lists (trailing commas)
        m = MLP(n_hiddens=([256, 256],), n_out=8)
        params = m.init(rng, jnp.ones((2, 10)))
        out = m.apply(params, jnp.ones((2, 10)))
        assert out.shape == (2, 8)
        layers = list(params["params"].keys())
        assert len(layers) == 6  # (w, b) per layer: two hidden + one output

    def test_output_bias_init(self, rng):
        from sqair_tpu.nn import const_init

        m = MLP(n_hiddens=[4], n_out=1, output_bias_init=const_init(5.0))
        params = m.init(rng, jnp.ones((1, 3)))
        b = params["params"]["b_1"]
        np.testing.assert_allclose(b, 5.0)


class TestCells:
    @pytest.mark.parametrize("name", ["VanillaRNN", "GRU", "LSTM"])
    def test_shapes_and_initial_state(self, rng, name):
        cell = make_cell(name, 16)

        def run(cell, x):
            state = cell.initial_state(4)
            new_state, out = cell(state, x)
            return new_state, out

        params = cell.init(rng, jnp.ones((4, 8)), method=run)
        new_state, out = cell.apply(params, jnp.ones((4, 8)), method=run)
        assert out.shape == (4, 16)
        for s in new_state:
            assert s.shape == (4, 16)

    def test_vanilla_rnn_math(self, rng):
        cell = VanillaRNN(4)

        def run(cell, x, h):
            return cell((h,), x)

        x = jnp.ones((1, 3))
        h = jnp.zeros((1, 4))
        params = cell.init(rng, x, h, method=run)
        (new_h,), out = cell.apply(params, x, h, method=run)
        p = params["params"]
        want = np.tanh(np.ones((1, 3)) @ p["in_to_hidden_w"] + p["in_to_hidden_b"])
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)

    def test_gru_gate_interpolation(self, rng):
        cell = GRU(8)

        def run(cell, x, h):
            return cell((h,), x)

        x = jnp.zeros((2, 8))
        h = jnp.linspace(-1, 1, 16).reshape(2, 8)
        params = cell.init(rng, x, h, method=run)
        (new_h,), _ = cell.apply(params, x, h, method=run)
        assert np.all(np.abs(np.asarray(new_h)) <= 1.0 + 1e-6)


class TestGaussianFromParamVec:
    def test_projects_when_needed(self, rng):
        m = GaussianFromParamVec(n_dim=5)
        params = m.init(rng, jnp.ones((2, 32)))
        d = m.apply(params, jnp.ones((2, 32)))
        assert d.loc.shape == (2, 5)
        assert np.all(np.asarray(d.scale) >= 1e-2)

    def test_no_projection_at_exact_size(self, rng):
        m = GaussianFromParamVec(n_dim=3)
        x = jnp.zeros((2, 6))
        params = m.init(rng, x)
        assert "Dense_0" not in params.get("params", {})
        d = m.apply(params, x)
        np.testing.assert_allclose(d.loc, 0.0)
        # scale = softplus(0) + 1e-2
        np.testing.assert_allclose(d.scale, np.log(2) + 1e-2, rtol=1e-5)


class TestStochasticTransformParam:
    def test_offset_applied(self, rng):
        m = StochasticTransformParam([16], scale_offset=-3.0)
        x = jnp.ones((2, 8))
        params = m.init(rng, x)
        loc, scale_logit = m.apply(params, x)
        assert loc.shape == (2, 4) and scale_logit.shape == (2, 4)
        assert float(params["params"]["scale_offset"]) == -3.0


class TestStepsPredictor:
    def test_dead_object_saturation(self, rng):
        m = StepsPredictor([8], steps_bias=1.0)
        feats = jnp.ones((3, 8))
        prev = jnp.asarray([[1.0], [0.0], [1.0]])
        params = m.init(rng, prev, None, feats)
        d = m.apply(params, prev, None, feats)
        logits = np.asarray(d.logits)
        # dead object: logit = -88 exactly
        assert logits[1, 0] == pytest.approx(-88.0)
        assert logits[0, 0] != pytest.approx(-88.0)

    def test_logit_scale_multiplies_live_logits(self, rng):
        """The round-5 desaturation lever: logit_scale multiplies the MLP
        logit before the dead-object saturation, so live slots scale and
        dead slots stay at exactly -88."""
        m = StepsPredictor([8], steps_bias=1.0)
        feats = jax.random.normal(rng, (3, 8))
        prev = jnp.asarray([[1.0], [0.0], [1.0]])
        params = m.init(rng, prev, None, feats)
        base = np.asarray(m.apply(params, prev, None, feats).logits)
        scaled = np.asarray(
            m.apply(params, prev, None, feats, logit_scale=0.15).logits)
        np.testing.assert_allclose(scaled[0], base[0] * 0.15, rtol=1e-5)
        np.testing.assert_allclose(scaled[2], base[2] * 0.15, rtol=1e-5)
        assert scaled[1, 0] == pytest.approx(-88.0)  # dead stays dead

    def test_logit_clamp_straight_through(self, rng):
        """logit_clamp caps |logit| in the forward pass but passes the
        un-clipped gradient (straight-through), so the MLP keeps the full
        VIMCO signal while sampling desaturates."""
        m = StepsPredictor([8], steps_bias=10.0)  # big bias -> saturated
        feats = jnp.ones((2, 8))
        prev = jnp.ones((2, 1))
        params = m.init(rng, prev, None, feats)

        def logit_sum(p, clamp):
            d = m.apply(p, prev, None, feats, logit_clamp=clamp)
            return jnp.sum(d.logits), d.logits

        (_, raw), g_raw = jax.value_and_grad(logit_sum, has_aux=True)(
            params, None)
        (_, capped), g_cap = jax.value_and_grad(logit_sum, has_aux=True)(
            params, 3.0)
        assert np.all(np.abs(np.asarray(capped)) <= 3.0 + 1e-6)
        assert np.any(np.abs(np.asarray(raw)) > 3.0)  # clamp actually bound
        for a, b in zip(jax.tree_util.tree_leaves(g_raw),
                        jax.tree_util.tree_leaves(g_cap)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5)  # identity backward


class TestAffineDiagNormal:
    def test_structure(self, rng):
        m = AffineDiagNormal(4)
        loc = jnp.zeros((2, 3, 4))
        scale = jnp.ones((2, 3, 4)) * 0.5
        params = m.init(rng, loc, scale)
        d = m.apply(params, loc, scale)
        assert d.scale_tril.shape == (2, 3, 4, 4)
        chol = np.asarray(params["params"]["cholesky_scale"])[:, 0]
        from sqair_tpu.ops.distributions import fill_triangular

        tril = np.asarray(fill_triangular(jnp.asarray(chol), 4))
        want = tril * 0.5 + np.eye(4) * 0.5
        np.testing.assert_allclose(np.asarray(d.scale_tril[0, 0]), want, rtol=1e-5)

    def test_log_prob_finite(self, rng):
        m = AffineDiagNormal(4)
        loc = jnp.zeros((2, 4))
        scale = jnp.full((2, 4), 0.1)
        params = m.init(rng, loc, scale)
        d = m.apply(params, loc, scale)
        lp = d.log_prob(jnp.ones((2, 4)))
        assert np.all(np.isfinite(np.asarray(lp)))


class TestRecurrentNormal:
    def _make(self, rng, conditional=False):
        m = RecurrentNormalImpl(n_dim=4, n_hidden=32, conditional=conditional)
        cond = jnp.ones((3, 8)) if conditional else None
        params = m.init(rng, rng, batch_size=3, seq_len=2, conditioning=cond)
        return m, params

    def test_sample_shapes(self, rng):
        m, params = self._make(rng)
        samples, locs, scales, logps = m.apply(params, rng, batch_size=3, seq_len=5)
        assert samples.shape == (3, 5, 4)
        assert logps.shape == (3, 5, 4)

    def test_log_prob_of_override(self, rng):
        m, params = self._make(rng)
        x = jnp.zeros((3, 4, 4))
        samples, locs, scales, logps = m.apply(params, rng, batch_size=3, override_samples=x)
        np.testing.assert_array_equal(np.asarray(samples), np.asarray(x))
        # hand-check first step log prob
        from sqair_tpu.ops.distributions import Normal

        want = Normal(locs[..., 0, :], scales[..., 0, :]).log_prob(x[..., 0, :])
        np.testing.assert_allclose(np.asarray(logps[..., 0, :]), np.asarray(want), rtol=1e-5)

    def test_conditional(self, rng):
        m, params = self._make(rng, conditional=True)
        cond1 = jnp.zeros((3, 8))
        cond2 = jnp.ones((3, 8))
        _, locs1, _, _ = m.apply(params, rng, batch_size=3, seq_len=2, conditioning=cond1)
        _, locs2, _, _ = m.apply(params, rng, batch_size=3, seq_len=2, conditioning=cond2)
        assert not np.allclose(np.asarray(locs1), np.asarray(locs2))

    def test_output_bias_init_sets_prior_mean(self, rng):
        from sqair_tpu.nn import const_init

        init = const_init_list = None
        bias = [-2.0, -2.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0]

        def bias_init(key, shape, dtype=jnp.float32):
            return jnp.asarray(bias, dtype)

        m = RecurrentNormalImpl(n_dim=4, n_hidden=32, output_bias_init=bias_init)
        params = m.init(rng, rng, batch_size=1, seq_len=1)
        b = np.asarray(params["params"]["_readout"]["bias"])
        np.testing.assert_allclose(b, bias)


class TestConvNets:
    def test_convnet_shapes(self, rng):
        from sqair_tpu.nn.layers import ConvNet

        m = ConvNet(kernel_shape=3, n_hiddens=[8, 16], n_out=4, stride=[2, 1, 1])
        x = jnp.ones((2, 16, 16, 1))
        p = m.init(rng, x)
        y = m.apply(p, x)
        assert y.shape == (2, 8, 8, 4)  # first layer stride 2 halves H, W

    def test_upconvnet_upsamples(self, rng):
        from sqair_tpu.nn.layers import UpConvNet

        m = UpConvNet(kernel_shape=3, n_hiddens=[8], n_out=1, stride=[2, 2])
        x = jnp.ones((2, 5, 5, 4))
        p = m.init(rng, x)
        y = m.apply(p, x)
        assert y.shape == (2, 20, 20, 1)  # two stride-2 subpixel layers: 4x

    def test_depth_to_space_matches_reference_layout(self):
        from sqair_tpu.nn.layers import UpConvNet

        # block 2, 1x1 spatial, 4 channels -> 2x2 spatial, 1 channel
        x = jnp.arange(4.0).reshape(1, 1, 1, 4)
        y = UpConvNet._depth_to_space(x, 2)
        np.testing.assert_array_equal(
            np.asarray(y)[0, :, :, 0], [[0.0, 1.0], [2.0, 3.0]]
        )
