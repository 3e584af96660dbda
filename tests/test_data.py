import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqair_tpu.data import (
    Minibatcher,
    NoisyAccelerationTrajectory,
    OnDeviceSeqMNIST,
    create_seq_dataset,
    curriculum_seq_len,
    jax_noisy_acceleration,
    load_pickle,
    make_template_bank,
    save_pickle,
    template_dimensions,
)


class TestSynthetic:
    def test_template_bank(self):
        bank = make_template_bank(8, 28, seed=1)
        assert bank.shape == (8, 28, 28)
        assert bank.dtype == np.uint8
        assert bank.max() > 100  # actually draws something

    def test_template_dimensions(self):
        t = np.zeros((28, 28), np.uint8)
        t[5:15, 8:20] = 100
        (y0, x0), (h, w) = template_dimensions(t)
        assert (y0, x0, h, w) == (5, 8, 10, 12)


class TestTrajectory:
    def test_host_bounds_respected(self):
        tj = NoisyAccelerationTrajectory(0.01, 2, [[0, 22], [0, 22]], 10, 3, True)
        out = tj.create(20, 16, seed=0)
        assert out.shape == (20, 16, 2)
        assert out.min() >= 0 and out.max() <= 22

    def test_device_bounds_respected(self, rng):
        init = jax.random.uniform(rng, (16, 2), minval=0.0, maxval=22.0)
        out = jax_noisy_acceleration(rng, 20, init, [[0, 22], [0, 22]], 10.0, 3.0)
        assert out.shape == (20, 16, 2)
        o = np.asarray(out)
        assert o.min() >= -1e-5 and o.max() <= 22 + 1e-5

    def test_device_objects_move(self, rng):
        init = jnp.full((4, 2), 10.0)
        out = np.asarray(jax_noisy_acceleration(rng, 10, init, [[0, 22], [0, 22]], 10.0, 3.0))
        assert np.abs(np.diff(out, axis=0)).sum() > 1.0


class TestHostDataset:
    def test_create_seq_dataset_contract(self):
        data = create_seq_dataset(n_samples=12, n_timesteps=5, seed=0)
        assert data["imgs"].shape == (5, 12, 50, 50)
        assert data["imgs"].dtype == np.uint8
        assert data["nums"].shape == (1, 12, 3)
        assert data["coords"].shape[0] == 5 and data["coords"].shape[1] == 12
        # cumulative one-hot: monotone non-increasing
        nums = data["nums"][0]
        assert np.all(np.diff(nums.astype(int), axis=-1) <= 0)

    def test_pickle_roundtrip(self, tmp_path):
        data = create_seq_dataset(n_samples=4, n_timesteps=3, seed=0)
        p = str(tmp_path / "d.pickle")
        save_pickle(p, data)
        loaded = load_pickle(p)
        assert loaded["imgs"].dtype == np.float32
        assert loaded["imgs"].max() <= 1.0
        assert loaded["nums"].dtype == np.float32


class TestOnDevice:
    def test_generator_shapes_and_jit(self, rng):
        bank = make_template_bank(16, 14, seed=0)
        gen = OnDeviceSeqMNIST(bank, canvas_size=(28, 28), n_timesteps=4)
        f = jax.jit(lambda r: gen(r, 8))
        out = f(rng)
        assert out["imgs"].shape == (4, 8, 28, 28)
        assert out["nums"].shape == (4, 8, 3)
        assert out["coords"].shape == (4, 8, 2, 4)
        imgs = np.asarray(out["imgs"])
        assert imgs.min() >= 0.0 and imgs.max() <= 1.0 + 1e-5

    def test_zero_objects_blank(self, rng):
        bank = make_template_bank(4, 14, seed=0)
        gen = OnDeviceSeqMNIST(bank, canvas_size=(28, 28), n_timesteps=2, n_objects=(0, 0))
        out = gen(rng, 4)
        np.testing.assert_allclose(np.asarray(out["imgs"]), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["nums"]).sum(), 0.0)

    def test_object_count_matches_nums(self, rng):
        bank = make_template_bank(16, 14, seed=0)
        gen = OnDeviceSeqMNIST(bank, canvas_size=(40, 40), n_timesteps=1, n_objects=(2, 2))
        out = gen(rng, 4)
        assert np.all(np.asarray(out["nums"]).sum(-1) == 2)
        assert np.asarray(out["imgs"]).sum() > 0


class TestBatcherCurriculum:
    def test_minibatcher_rolling(self):
        data = {"imgs": np.arange(10)[:, None].repeat(3, 1).astype(np.float32)}
        b = Minibatcher(data, 4, axes={"imgs": 0}, shuffle=False)
        b1, b2, b3 = next(b), next(b), next(b)
        np.testing.assert_array_equal(b1["imgs"][:, 0], [0, 1, 2, 3])
        np.testing.assert_array_equal(b2["imgs"][:, 0], [4, 5, 6, 7])
        np.testing.assert_array_equal(b3["imgs"][:, 0], [0, 1, 2, 3])  # wraps

    def test_curriculum(self):
        # seq_len 3, +1 every 100k, cap 10 (train_multi_mnist.sh recipe)
        assert curriculum_seq_len(0, 3, 100_000, 10) == 3
        assert curriculum_seq_len(99_999, 3, 100_000, 10) == 3
        assert curriculum_seq_len(100_000, 3, 100_000, 10) == 4
        assert curriculum_seq_len(10_000_000, 3, 100_000, 10) == 10
        assert curriculum_seq_len(0, 0, 100_000, 10) == 10  # disabled
        assert curriculum_seq_len(0, 3, 0, 10) == 10  # disabled


class TestOnDeviceDatasetSampler:
    def test_sample_shapes_and_determinism(self):
        import jax
        import jax.numpy as jnp

        from sqair_tpu.data import OnDeviceDatasetSampler

        T, N, H, W, C = 4, 32, 12, 12, 3
        rng = np.random.RandomState(0)
        data = {
            "imgs": rng.rand(T, N, H, W).astype(np.float32),
            "nums": rng.rand(1, N, C).astype(np.float32),
        }
        s = OnDeviceDatasetSampler(data)
        b = jax.jit(lambda r: s(r, 8))(jax.random.PRNGKey(0))
        assert b["imgs"].shape == (T, 8, H, W)
        assert b["nums"].shape == (T, 8, C)
        b2 = jax.jit(lambda r: s(r, 8))(jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(b["imgs"]), np.asarray(b2["imgs"]))

    def test_batches_are_dataset_rows(self):
        import jax

        from sqair_tpu.data import OnDeviceDatasetSampler

        T, N, H, W = 3, 16, 6, 6
        imgs = np.arange(T * N * H * W, dtype=np.float32).reshape(T, N, H, W)
        s = OnDeviceDatasetSampler({"imgs": imgs / imgs.max(),
                                    "nums": np.ones((1, N, 2), np.float32)})
        b = np.asarray(jax.jit(lambda r: s(r, 4))(jax.random.PRNGKey(3))["imgs"])
        # every sampled sequence must match one dataset column exactly
        src = imgs / imgs.max()
        for j in range(4):
            matches = [np.allclose(b[:, j], src[:, n]) for n in range(N)]
            assert any(matches)


class TestFontDigitBank:
    def test_bank_properties(self):
        from sqair_tpu.data.synthetic import make_font_digit_bank

        bank, labels = make_font_digit_bank(8, 20, seed=1)
        assert bank.shape == (8, 20, 20) and bank.dtype == np.uint8
        assert labels.shape == (8,)
        assert set(labels) <= set(range(10))
        assert bank.max() > 150  # strong strokes
        for t in bank:  # every glyph has ink, none fills the frame
            frac = (t > 0).mean()
            assert 0.02 < frac < 0.7

    def test_deterministic(self):
        from sqair_tpu.data.synthetic import make_font_digit_bank

        a, la = make_font_digit_bank(4, 20, seed=3)
        b, lb = make_font_digit_bank(4, 20, seed=3)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(la, lb)
