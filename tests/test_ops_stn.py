import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqair_tpu.ops import stn


def reference_bilinear_sample(img, u, v):
    """Scalar bilinear sample with zero padding (tf resampler semantics)."""
    H, W = img.shape
    out = 0.0
    for p in (int(np.floor(v)), int(np.floor(v)) + 1):
        for q in (int(np.floor(u)), int(np.floor(u)) + 1):
            wy = max(0.0, 1.0 - abs(v - p))
            wx = max(0.0, 1.0 - abs(u - q))
            if 0 <= p < H and 0 <= q < W:
                out += wy * wx * img[p, q]
    return out


def reference_crop(img, coords, gh, gw):
    sx, sy, tx, ty = coords
    H, W = img.shape
    out = np.zeros((gh, gw))
    for i in range(gh):
        for j in range(gw):
            ty_n = -1 + 2 * i / (gh - 1)
            tx_n = -1 + 2 * j / (gw - 1)
            v = (sy * ty_n + ty + 1) * (H - 1) / 2
            u = (sx * tx_n + tx + 1) * (W - 1) / 2
            out[i, j] = reference_bilinear_sample(img, u, v)
    return out


class TestCoordConversions:
    def test_roundtrip(self):
        logits = jnp.asarray([0.3, -1.2, 0.7, -0.1])
        coords = stn.to_coords(logits)
        back = stn.to_logits(coords)
        np.testing.assert_allclose(back, logits, atol=1e-4)

    def test_coords_ranges(self):
        logits = jnp.asarray([[5.0, -5.0, 5.0, -5.0]])
        c = np.asarray(stn.to_coords(logits))[0]
        assert 0 < c[0] < 1 and 0 < c[1] < 1  # scales in (0,1)
        assert -1 < c[2] < 1 and -1 < c[3] < 1  # shifts in (-1,1)

    def test_pixel_roundtrip(self):
        box = jnp.asarray([10.0, 5.0, 20.0, 15.0])  # y x h w
        c = stn.pixel_to_stn_coords(box, (50, 50))
        # pixel_to_stn uses (L+1) for scale and (L-1) for shift; stn_to_pixel
        # uses the same conventions, so the roundtrip must be exact.
        back = stn.stn_to_pixel_coords(c, (50, 50))
        np.testing.assert_allclose(back, box, atol=1e-4)


class TestExtractGlimpse:
    def test_matches_reference_resampler(self, np_rng):
        img = np_rng.rand(50, 50).astype(np.float32)
        coords = (0.4, 0.35, 0.1, -0.2)
        want = reference_crop(img, coords, 20, 20)
        got = stn.extract_glimpse(jnp.asarray(img), jnp.asarray(coords), (20, 20))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_identity_crop(self, np_rng):
        img = np_rng.rand(30, 30).astype(np.float32)
        # scale 1, shift 0 => output is a resampled identity (same size => exact)
        got = stn.extract_glimpse(jnp.asarray(img), jnp.asarray([1.0, 1.0, 0.0, 0.0]), (30, 30))
        np.testing.assert_allclose(got, img, atol=1e-5)

    def test_out_of_bounds_zero(self, np_rng):
        img = np_rng.rand(30, 30).astype(np.float32)
        got = stn.extract_glimpse(jnp.asarray(img), jnp.asarray([0.3, 0.3, 5.0, 5.0]), (10, 10))
        np.testing.assert_allclose(got, 0.0, atol=1e-6)

    def test_batched_with_channels(self, np_rng):
        img = np_rng.rand(4, 50, 50, 3).astype(np.float32)
        coords = jnp.asarray(np_rng.uniform(0.2, 0.6, (4, 4)).astype(np.float32))
        got = stn.extract_glimpse(jnp.asarray(img), coords, (20, 20))
        assert got.shape == (4, 20, 20, 3)

    def test_gradients_flow_to_coords(self):
        img = jnp.ones((30, 30))

        def f(c):
            return jnp.sum(stn.extract_glimpse(img, c, (10, 10)) ** 2)

        g = jax.grad(f)(jnp.asarray([0.4, 0.4, 0.1, 0.1]))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_scale_clip_preserves_gradient(self):
        img = jnp.ones((30, 30))

        def f(c):
            return jnp.sum(stn.extract_glimpse(img, c, (10, 10)))

        # scale below the 1e-4 clip: value uses clipped scale, grad flows
        g = jax.grad(f)(jnp.asarray([1e-6, 0.4, 0.0, 0.0]))
        assert np.all(np.isfinite(np.asarray(g)))


class TestPasteGlimpse:
    def test_crop_of_paste_recovers(self, np_rng):
        """Pasting then cropping at the same coords ~ identity (away from edges)."""
        glimpse = np_rng.rand(20, 20).astype(np.float32)
        coords = jnp.asarray([0.4, 0.4, 0.0, 0.0])
        canvas = stn.paste_glimpse(jnp.asarray(glimpse), coords, (50, 50))
        assert canvas.shape == (50, 50)
        back = stn.extract_glimpse(canvas, coords, (20, 20))
        # interior agrees well (bilinear blur at 2.5x upsample)
        err = np.abs(np.asarray(back) - glimpse)[2:-2, 2:-2]
        assert err.mean() < 0.12

    def test_paste_mass_location(self):
        glimpse = jnp.ones((10, 10))
        # top-left-ish paste: negative shifts
        canvas = np.asarray(stn.paste_glimpse(glimpse, jnp.asarray([0.3, 0.3, -0.5, -0.5]), (50, 50)))
        top_left = canvas[:25, :25].sum()
        bottom_right = canvas[25:, 25:].sum()
        assert top_left > 10 * bottom_right

    def test_batched_slots(self, np_rng):
        glimpse = jnp.asarray(np_rng.rand(2, 3, 20, 20, 1).astype(np.float32))
        coords = jnp.asarray(np_rng.uniform(0.2, 0.6, (2, 3, 4)).astype(np.float32))
        out = stn.paste_glimpse(glimpse, coords, (50, 50))
        assert out.shape == (2, 3, 50, 50, 1)


class TestMatmulFormIsJittable:
    def test_jit_and_vmap(self, np_rng):
        img = jnp.asarray(np_rng.rand(8, 50, 50).astype(np.float32))
        coords = jnp.asarray(np_rng.uniform(0.2, 0.8, (8, 4)).astype(np.float32))
        f = jax.jit(lambda i, c: stn.extract_glimpse(i, c, (20, 20)))
        out = f(img, coords)
        assert out.shape == (8, 20, 20)
