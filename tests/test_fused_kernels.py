"""Correctness tests for the fused Pallas kernels (interpret mode on CPU).

Each fused op must match its pure-jnp reference in forward values AND in
gradients w.r.t. every differentiable input.
"""
import functools
import unittest.mock as mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from sqair_tpu.ops import fused, fused_glimpse, stn

# heavy (interpret-mode Pallas / full variant matrix): slow tier
pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def interpret_pallas():
    with mock.patch.object(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    ):
        yield


def tree_maxdiff(a, b):
    return max(
        float(jnp.abs(x - y).max())
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


class TestFusedMLP:
    def test_forward_and_grads(self):
        r = np.random.RandomState(0)
        ps = tuple(
            (jnp.asarray(r.randn(a, b) * 0.2, jnp.float32),
             jnp.asarray(r.randn(b) * 0.1, jnp.float32))
            for a, b in ((12, 16), (16, 8), (8, 4))
        )
        x = jnp.asarray(r.randn(6, 12), jnp.float32)
        tr = ("elu", "elu", "id")
        want = fused.mlp_reference(x, ps, tr)
        got = fused._fused_mlp_2d(x, ps, tr)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

        gw = jax.grad(lambda p, x: jnp.sum(fused.mlp_reference(x, p, tr) ** 2),
                      argnums=(0, 1))(ps, x)
        gp = jax.grad(lambda p, x: jnp.sum(fused._fused_mlp_2d(x, p, tr) ** 2),
                      argnums=(0, 1))(ps, x)
        assert tree_maxdiff(gw, gp) < 1e-5

    @pytest.mark.parametrize("act", ["sigmoid", "tanh"])
    def test_other_transfers(self, act):
        r = np.random.RandomState(1)
        ps = ((jnp.asarray(r.randn(5, 7) * 0.3, jnp.float32),
               jnp.asarray(r.randn(7) * 0.1, jnp.float32)),)
        x = jnp.asarray(r.randn(4, 5), jnp.float32)
        want = fused.mlp_reference(x, ps, (act,))
        got = fused._fused_mlp_2d(x, ps, (act,))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


class TestFusedRNNs:
    def test_vanilla(self):
        r = np.random.RandomState(2)
        B, dx, u = 4, 6, 8
        x = jnp.asarray(r.randn(B, dx), jnp.float32)
        h = jnp.asarray(r.randn(B, u), jnp.float32)
        w = jnp.asarray(r.randn(dx, u) * 0.3, jnp.float32)
        uu = jnp.asarray(r.randn(u, u) * 0.3, jnp.float32)
        b = jnp.asarray(r.randn(u) * 0.1, jnp.float32)
        want = jnp.tanh(x @ w + h @ uu + b)
        got = fused._fused_vrnn(x, h, w, uu, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
        g1 = jax.grad(lambda *a: jnp.sum(fused._fused_vrnn(*a) ** 2),
                      argnums=(0, 1, 2, 3, 4))(x, h, w, uu, b)
        g2 = jax.grad(lambda x, h, w, uu, b: jnp.sum(jnp.tanh(x @ w + h @ uu + b) ** 2),
                      argnums=(0, 1, 2, 3, 4))(x, h, w, uu, b)
        assert tree_maxdiff(g1, g2) < 1e-5

    def test_gru(self):
        r = np.random.RandomState(3)
        B, dx, u = 4, 6, 8
        x = jnp.asarray(r.randn(B, dx), jnp.float32)
        h = jnp.asarray(r.randn(B, u), jnp.float32)
        wg = jnp.asarray(r.randn(dx, 2 * u) * 0.3, jnp.float32)
        ug = jnp.asarray(r.randn(u, 2 * u) * 0.3, jnp.float32)
        bg = jnp.asarray(r.randn(2 * u) * 0.1, jnp.float32)
        wc = jnp.asarray(r.randn(dx, u) * 0.3, jnp.float32)
        uc = jnp.asarray(r.randn(u, u) * 0.3, jnp.float32)
        bc = jnp.asarray(r.randn(u) * 0.1, jnp.float32)

        def ref(x, h, wg, ug, bg, wc, uc, bc):
            zr = jax.nn.sigmoid(x @ wg + h @ ug + bg)
            z, rr = zr[:, :u], zr[:, u:]
            c = jnp.tanh(x @ wc + (rr * h) @ uc + bc)
            return (1.0 - z) * h + z * c

        args = (x, h, wg, ug, bg, wc, uc, bc)
        np.testing.assert_allclose(
            np.asarray(fused._fused_gru(*args)), np.asarray(ref(*args)), atol=1e-6
        )
        g1 = jax.grad(lambda *a: jnp.sum(fused._fused_gru(*a) ** 2),
                      argnums=tuple(range(8)))(*args)
        g2 = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2),
                      argnums=tuple(range(8)))(*args)
        assert tree_maxdiff(g1, g2) < 1e-5


class TestFusedGlimpseEncoder:
    B, H, W, GH, GW, NW, DM = 8, 30, 30, 10, 10, 6, 16

    def _inputs(self):
        r = np.random.RandomState(0)
        c = self
        img = jnp.asarray(r.rand(c.B, c.H, c.W), jnp.float32)
        wl = jnp.asarray(r.randn(c.B, 4) * 0.5, jnp.float32)
        mi = jnp.asarray(r.randn(c.B, c.DM), jnp.float32)
        G = c.GH * c.GW
        mp = ((jnp.asarray(r.randn(c.DM, 12) * 0.3, jnp.float32),
               jnp.asarray(r.randn(12) * 0.1, jnp.float32)),
              (jnp.asarray(r.randn(12, G) * 0.3, jnp.float32),
               jnp.ones(G, jnp.float32)))
        ep = ((jnp.asarray(r.randn(G, 32) * 0.1, jnp.float32),
               jnp.zeros(32, jnp.float32)),
              (jnp.asarray(r.randn(32, 32) * 0.2, jnp.float32),
               jnp.zeros(32, jnp.float32)))
        hw = jnp.asarray(r.randn(32, 2 * c.NW) * 0.2, jnp.float32)
        hb = jnp.asarray(r.randn(2 * c.NW) * 0.1, jnp.float32)
        return img, wl, mi, mp, ep, hw, hb

    def _ref(self, img, wl, mi, mp, ep, hw, hb):
        c = self
        coords = stn.to_coords(wl)
        g = stn.extract_glimpse(img, coords, (c.GH, c.GW))
        gflat = g.reshape(c.B, c.GH * c.GW)
        if mi is not None:
            (w0, b0), (w1, b1) = mp
            mask = jax.nn.sigmoid(jax.nn.elu(mi @ w0 + b0) @ w1 + b1)
            gflat = gflat * mask
        (e0, f0), (e1, f1) = ep
        h2 = jax.nn.elu(jax.nn.elu(gflat @ e0 + f0) @ e1 + f1)
        hp = h2 @ hw + hb
        return hp[:, : c.NW], jax.nn.softplus(hp[:, c.NW:]) + 1e-2

    @pytest.mark.parametrize("masked", [True, False])
    def test_forward(self, masked):
        img, wl, mi, mp, ep, hw, hb = self._inputs()
        m = mi if masked else None
        mpp = mp if masked else None
        loc, scale = fused_glimpse._fused_ge(
            img, wl, m, mpp, ep, hw, hb, (self.GH, self.GW, self.NW)
        )
        rloc, rscale = self._ref(img, wl, m, mp, ep, hw, hb)
        np.testing.assert_allclose(np.asarray(loc), np.asarray(rloc), atol=2e-5)
        np.testing.assert_allclose(np.asarray(scale), np.asarray(rscale), atol=2e-5)

    @pytest.mark.parametrize("masked", [True, False])
    def test_gradients_including_where(self, masked):
        img, wl, mi, mp, ep, hw, hb = self._inputs()
        m = mi if masked else None
        mpp = mp if masked else None
        dims = (self.GH, self.GW, self.NW)

        def loss_f(wl, m2, mp2, ep2, hw2, hb2):
            l, s = fused_glimpse._fused_ge(img, wl, m2, mp2, ep2, hw2, hb2, dims)
            return jnp.sum(l ** 2) + jnp.sum(jnp.log(s))

        def loss_r(wl, m2, mp2, ep2, hw2, hb2):
            l, s = self._ref(img, wl, m2, mp2 if m2 is not None else mp, ep2, hw2, hb2)
            return jnp.sum(l ** 2) + jnp.sum(jnp.log(s))

        argnums = (0, 1, 2, 3, 4, 5) if masked else (0, 3, 4, 5)
        gf = jax.grad(loss_f, argnums=argnums)(wl, m, mpp, ep, hw, hb)
        gr = jax.grad(loss_r, argnums=argnums)(wl, m, mpp, ep, hw, hb)
        assert tree_maxdiff(gf, gr) < 5e-5
