import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from sqair_tpu.ops import distributions as D


class TestNormal:
    def test_log_prob_matches_scipy(self):
        d = D.Normal(loc=jnp.asarray(0.3), scale=jnp.asarray(1.7))
        x = jnp.linspace(-3, 3, 7)
        got = d.log_prob(x)
        want = scipy.stats.norm(0.3, 1.7).logpdf(np.asarray(x))
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_sample_moments(self, rng):
        d = D.Normal(loc=jnp.asarray(2.0), scale=jnp.asarray(0.5))
        s = d.sample(rng, (20000,))
        assert abs(float(s.mean()) - 2.0) < 0.02
        assert abs(float(s.std()) - 0.5) < 0.02


class TestBernoulli:
    def test_log_prob(self):
        logits = jnp.asarray([0.0, 2.0, -3.0])
        d = D.Bernoulli(logits=logits)
        p = jax.nn.sigmoid(logits)
        np.testing.assert_allclose(d.log_prob(jnp.ones(3)), jnp.log(p), rtol=1e-5)
        np.testing.assert_allclose(d.log_prob(jnp.zeros(3)), jnp.log1p(-p), rtol=1e-5)

    def test_float_samples(self, rng):
        d = D.Bernoulli.from_probs(jnp.asarray(0.75))
        s = d.sample(rng, (10000,))
        assert s.dtype == jnp.float32
        assert set(np.unique(np.asarray(s))) <= {0.0, 1.0}
        assert abs(float(s.mean()) - 0.75) < 0.02

    def test_saturated_logits_stable(self):
        # the reference's dead-object trick pushes logits to -88
        d = D.Bernoulli(logits=jnp.asarray([-88.0, 88.0]))
        lp = d.log_prob(jnp.asarray([0.0, 1.0]))
        assert np.all(np.isfinite(np.asarray(lp)))


class TestGeometric:
    def test_log_prob(self):
        q = 0.25  # 1 - step_success_prob for success=.75
        d = D.Geometric(probs=jnp.asarray(q))
        for k in range(4):
            want = scipy.stats.geom(q, loc=-1).logpmf(k)  # failures-before-success form
            got = float(d.log_prob(jnp.asarray(float(k))))
            assert got == pytest.approx(want, rel=1e-5)


class TestCategorical:
    def test_log_prob(self):
        logits = jnp.asarray([[1.0, 2.0, 0.5], [0.0, 0.0, 0.0]])
        d = D.Categorical(logits=logits)
        lp = d.log_prob(jnp.asarray([1, 2]))
        want = jax.nn.log_softmax(logits)[jnp.arange(2), jnp.asarray([1, 2])]
        np.testing.assert_allclose(lp, want, rtol=1e-6)


class TestMVNTril:
    def test_log_prob_matches_scipy(self):
        rng = np.random.RandomState(1)
        a = rng.randn(4, 4)
        tril = np.tril(a) + np.eye(4) * 3
        loc = rng.randn(4)
        d = D.MultivariateNormalTriL(jnp.asarray(loc), jnp.asarray(tril))
        x = rng.randn(4)
        cov = tril @ tril.T
        want = scipy.stats.multivariate_normal(loc, cov).logpdf(x)
        got = float(d.log_prob(jnp.asarray(x)))
        assert got == pytest.approx(want, rel=1e-4)

    def test_batched(self):
        loc = jnp.zeros((3, 5, 4))
        tril = jnp.broadcast_to(jnp.eye(4), (3, 5, 4, 4))
        d = D.MultivariateNormalTriL(loc, tril)
        x = jnp.zeros((3, 5, 4))
        lp = d.log_prob(x)
        assert lp.shape == (3, 5)
        np.testing.assert_allclose(lp, -2.0 * math.log(2 * math.pi), rtol=1e-6)

    def test_sample_cov(self, rng):
        tril = jnp.asarray([[1.0, 0.0], [0.5, 2.0]])
        d = D.MultivariateNormalTriL(jnp.zeros(2), tril)
        s = d.sample(rng, (50000,))
        cov = np.cov(np.asarray(s).T)
        np.testing.assert_allclose(cov, tril @ tril.T, atol=0.1)


class TestFillTriangular:
    def test_shape_and_lower(self):
        v = jnp.arange(10.0)
        m = D.fill_triangular(v, 4)
        assert m.shape == (4, 4)
        assert np.allclose(np.triu(np.asarray(m), 1), 0.0)
        # all 10 values present
        assert set(np.asarray(m)[np.tril_indices(4)]) == set(range(10))


class TestNumSteps:
    def test_pmf_matches_reference_construction(self):
        """Against the reference's float64 cumprod formula (prior.py:61-67)."""
        p = np.asarray([[0.9, 0.6, 0.2], [0.5, 0.5, 0.5]])
        d = D.NumStepsDistribution(steps_probs=jnp.asarray(p))

        p64 = p.astype(np.float64)
        inv = 1.0 - p64
        cum = np.cumprod(p64, -1)
        want = np.concatenate([inv[..., :1], inv[..., 1:] * cum[..., :-1], cum[..., -1:]], -1)
        want /= want.sum(-1, keepdims=True)

        np.testing.assert_allclose(d.probs, want, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(d.probs).sum(-1), 1.0, rtol=1e-6)

    def test_log_prob_gather(self):
        p = jnp.asarray([[0.9, 0.6, 0.2]])
        d = D.NumStepsDistribution(steps_probs=p)
        for n in range(4):
            lp = float(d.log_prob(jnp.asarray([n]))[0])
            assert lp == pytest.approx(float(jnp.log(d.probs[0, n])), rel=1e-3, abs=1e-4)

    def test_saturated_stable(self):
        # dead-object logits at -88, confident at +20
        d = D.NumStepsDistribution(logits=jnp.asarray([[20.0, -88.0, -88.0]]))
        assert np.all(np.isfinite(np.asarray(d.log_prob(jnp.asarray([1])))))
        assert float(d.prob(jnp.asarray([1]))[0]) == pytest.approx(1.0, abs=1e-5)
        # impossible outcome clips at log(1e-16), not -inf
        assert float(d.log_prob(jnp.asarray([3]))[0]) >= math.log(1e-16) - 1e-3

    def test_sample(self, rng):
        p = jnp.broadcast_to(jnp.asarray([0.9, 0.6, 0.2]), (20000, 3))
        d = D.NumStepsDistribution(steps_probs=p)
        s = np.asarray(d.sample(rng))
        pmf = np.asarray(d.probs)[0]
        hist = np.bincount(s.astype(int), minlength=4) / len(s)
        np.testing.assert_allclose(hist, pmf, atol=0.02)

    def test_gradients_finite_at_zero_prob(self):
        def f(logits):
            d = D.NumStepsDistribution(logits=logits)
            return jnp.sum(d.log_prob(jnp.asarray([2])))

        g = jax.grad(f)(jnp.asarray([[30.0, -88.0, -30.0]]))
        assert np.all(np.isfinite(np.asarray(g)))
