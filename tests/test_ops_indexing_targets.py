import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqair_tpu.ops import indexing, targets
from sqair_tpu.ops.math import clip_preserve, ess


class TestTileForIwae:
    def test_contiguous_particles(self):
        x = jnp.arange(6.0).reshape(3, 2)
        t = indexing.tile_input_for_iwae(x, 2)
        assert t.shape == (6, 2)
        np.testing.assert_array_equal(t[0], t[1])
        np.testing.assert_array_equal(t[0], x[0])
        np.testing.assert_array_equal(t[2], x[1])

    def test_with_time(self):
        x = jnp.arange(24.0).reshape(4, 3, 2)
        t = indexing.tile_input_for_iwae(x, 2, with_time=True)
        assert t.shape == (4, 6, 2)
        np.testing.assert_array_equal(t[:, 0], t[:, 1])


class TestSelectPresent:
    def _numpy_oracle(self, x, presence):
        """Stable present-first partition per batch row."""
        out = np.empty_like(x)
        for b in range(x.shape[0]):
            pres_idx = [i for i in range(x.shape[1]) if presence[b, i] > 0.5]
            abs_idx = [i for i in range(x.shape[1]) if presence[b, i] <= 0.5]
            out[b] = x[b, pres_idx + abs_idx]
        return out

    def test_against_oracle(self, np_rng):
        x = np_rng.rand(5, 6, 3).astype(np.float32)
        presence = (np_rng.rand(5, 6) > 0.5).astype(np.float32)
        got = indexing.select_present(jnp.asarray(x), jnp.asarray(presence))
        np.testing.assert_array_equal(np.asarray(got), self._numpy_oracle(x, presence))

    def test_stability(self):
        # equal presence values keep their relative order
        x = jnp.arange(8.0).reshape(1, 8, 1)
        presence = jnp.asarray([[0, 1, 0, 1, 1, 0, 0, 1]], jnp.float32)
        got = np.asarray(indexing.select_present(x, presence))[0, :, 0]
        np.testing.assert_array_equal(got, [1, 3, 4, 7, 0, 2, 5, 6])

    def test_top_k_fused_truncate(self, np_rng):
        x = (np_rng.rand(4, 6, 5).astype(np.float32) - 0.5) * 100.0
        presence = (np_rng.rand(4, 6) > 0.4).astype(np.float32)
        full = indexing.select_present(jnp.asarray(x), jnp.asarray(presence))
        trunc = indexing.select_present(jnp.asarray(x), jnp.asarray(presence), top_k=3)
        np.testing.assert_array_equal(np.asarray(full)[:, :3], np.asarray(trunc))

    def test_exact_for_negative_and_large_values(self):
        # object IDs are negative floats; the one-hot matmul must be bitwise
        x = jnp.asarray([[[-1.0], [12345.678], [-0.0001], [7e7]]], jnp.float32)
        presence = jnp.asarray([[0.0, 1.0, 0.0, 1.0]], jnp.float32)
        got = np.asarray(indexing.select_present(x, presence))[0, :, 0]
        np.testing.assert_array_equal(
            got, np.asarray([12345.678, 7e7, -1.0, -0.0001], np.float32)
        )

    def test_pytree(self, np_rng):
        x = np_rng.rand(2, 4, 3).astype(np.float32)
        y = np_rng.rand(2, 4).astype(np.float32)
        presence = (np_rng.rand(2, 4) > 0.5).astype(np.float32)
        got_x, got_y = indexing.select_present(
            [jnp.asarray(x), jnp.asarray(y)], jnp.asarray(presence)
        )
        np.testing.assert_array_equal(np.asarray(got_x), self._numpy_oracle(x, presence))
        np.testing.assert_array_equal(
            np.asarray(got_y), self._numpy_oracle(y[..., None], presence)[..., 0]
        )


class TestComputeObjectIds:
    def test_basic(self):
        """Mirror of sqair/index.py:198-221 semantics."""
        last_used = jnp.asarray([[2.0], [-1.0]])
        prev_ids = jnp.asarray([[[0.0], [2.0]], [[-1.0], [-1.0]]])
        prop_pres = jnp.asarray([[[1.0], [0.0]], [[0.0], [0.0]]])
        disc_pres = jnp.asarray([[[1.0], [1.0]], [[1.0], [0.0]]])

        new_last, new_ids = indexing.compute_object_ids(last_used, prev_ids, prop_pres, disc_pres)
        # batch 0: prop keeps id 0, second prop slot dead (-1); two discoveries get 3, 4
        np.testing.assert_array_equal(np.asarray(new_ids)[0, :, 0], [0, -1, 3, 4])
        # batch 1: one discovery gets id 0 (last_used was -1)
        np.testing.assert_array_equal(np.asarray(new_ids)[1, :, 0], [-1, -1, 0, -1])
        np.testing.assert_array_equal(np.asarray(new_last)[:, 0], [4, 0])


class TestTargets:
    def test_iwae_known_value(self):
        lw = jnp.asarray([[0.0, 0.0, 0.0]])
        assert float(targets.iwae(lw)[0]) == pytest.approx(0.0, abs=1e-4)
        lw = jnp.asarray([[1.0, 2.0]])
        want = math.log((math.e + math.e**2) / 2)
        assert float(targets.iwae(lw)[0]) == pytest.approx(want, rel=1e-4)

    def test_vimco_control_variate_hand_computed(self):
        """Leave-one-out baseline vs hand computation (targets.py:46-59)."""
        lw = np.asarray([[1.0, 2.0, 3.0]])
        got = np.asarray(targets.vimco_control_variate(jnp.asarray(lw)))[0]
        k = 3
        for j in range(k):
            rest = [lw[0, i] for i in range(k) if i != j]
            replaced = list(lw[0])
            replaced[j] = float(np.mean(rest))
            want = np.log(np.sum(np.exp(replaced))) - math.log(k)
            assert got[j] == pytest.approx(want, rel=1e-4)

    def test_vimco_gradient_paths(self):
        """Gradient flows into log_probs via the learning signal only."""
        lw = jnp.asarray([[1.0, 0.5, -0.3]])

        def loss(lp):
            return targets.vimco(lw, lp)

        g = jax.grad(loss)(jnp.asarray([[0.1, 0.2, 0.3]]))
        signal = np.asarray(lw - targets.vimco_control_variate(lw))
        np.testing.assert_allclose(np.asarray(g), -signal / lw.size, rtol=1e-5)

    def test_l2(self):
        params = {"a": jnp.ones(4), "b": jnp.full(2, 2.0)}
        # tf.nn.l2_loss = sum(x^2)/2 -> 0.5*(4 + 8) = 6
        assert float(targets.l2_reg(params, 1.0)) == pytest.approx(6.0)
        assert float(targets.l2_reg(params, 0.0)) == 0.0


class TestMathOps:
    def test_clip_preserve_value_and_grad(self):
        f = lambda x: clip_preserve(x, 0.0, 1.0) * 2.0
        assert float(f(jnp.asarray(2.0))) == 2.0  # clipped value
        assert float(jax.grad(f)(jnp.asarray(2.0))) == 2.0  # unclipped grad

    def test_ess(self):
        w = jnp.asarray([[0.25, 0.25, 0.25, 0.25]])
        assert float(ess(w)[0]) == pytest.approx(4.0)
        w = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
        assert float(ess(w)[0]) == pytest.approx(1.0)


class TestBroadcastAgainst:
    def test_rank_padding(self):
        from sqair_tpu.ops.math import broadcast_against

        mask = jnp.ones((2, 3))
        data = jnp.ones((2, 3, 4, 5))
        out = broadcast_against(mask, data)
        assert out.shape == (2, 3, 1, 1)
        np.testing.assert_array_equal(np.asarray(out * data), np.asarray(data))

    def test_noop_at_equal_rank(self):
        from sqair_tpu.ops.math import broadcast_against

        x = jnp.ones((2, 3))
        assert broadcast_against(x, jnp.ones((4, 5))).shape == (2, 3)
