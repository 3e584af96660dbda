"""Pallas RNN/GRU cell kernels (ops/fused.py) vs jnp references.

Runs the kernels in pallas interpret mode on CPU and checks the forward
and every hand-derived VJP entry against jax.grad of the plain-jnp math.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sqair_tpu.ops.fused as F

# heavy (interpret-mode Pallas / full variant matrix): slow tier
pytestmark = pytest.mark.slow

B, NIN, U = 8, 23, 16


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    from jax.experimental import pallas

    monkeypatch.setattr(
        pallas, "pallas_call", functools.partial(pallas.pallas_call,
                                                 interpret=True))
    monkeypatch.setattr(F, "use_pallas", lambda: True)


@pytest.fixture
def data():
    rs = np.random.RandomState(0)
    t = lambda *s, scale=0.3: jnp.asarray(rs.randn(*s).astype(np.float32) * scale)
    return rs, t


def _check_grads(ref, fused, args, cot, tol=1e-5):
    loss = lambda fn: lambda *a: jnp.sum(fn(*a) * cot)
    argnums = tuple(range(len(args)))
    gr = jax.grad(loss(ref), argnums=argnums)(*args)
    gf = jax.grad(loss(fused), argnums=argnums)(*args)
    for (kp, a), b in zip(jax.tree_util.tree_flatten_with_path(gr)[0],
                          jax.tree_util.tree_leaves(gf)):
        assert float(jnp.max(jnp.abs(a - b))) < tol, jax.tree_util.keystr(kp)
    assert float(jnp.max(jnp.abs(ref(*args) - fused(*args)))) < tol


def test_fused_vanilla_rnn_matches_reference(data):
    rs, t = data
    args = (t(B, NIN), t(B, U), t(NIN, U), t(U, U), t(U, scale=0.1))

    def ref(x, h, w, u, b):
        return jnp.tanh(x @ w + h @ u + b)

    _check_grads(ref, F.fused_vanilla_rnn, args, t(B, U, scale=1.0))


def test_fused_gru_matches_reference(data):
    rs, t = data
    args = (t(B, NIN), t(B, U), t(NIN, 2 * U), t(U, 2 * U),
            t(2 * U, scale=0.1), t(NIN, U), t(U, U), t(U, scale=0.1))

    def ref(x, h, wg, ug, bg, wc, uc, bc):
        zr = jax.nn.sigmoid(x @ wg + h @ ug + bg)
        z, r = zr[..., :U], zr[..., U:]
        c = jnp.tanh(x @ wc + (r * h) @ uc + bc)
        return (1.0 - z) * h + z * c

    _check_grads(ref, F.fused_gru, args, t(B, U, scale=1.0))


def test_fused_mlp_matches_reference(data):
    rs, t = data
    x = t(B, NIN)
    params = ((t(NIN, U), t(U, scale=0.1)), (t(U, U), t(U, scale=0.1)))
    transfers = ("elu", "elu")

    def ref(x, params):
        return F.mlp_reference(x, params, transfers)

    def fused(x, params):
        return F.fused_mlp(x, params, transfers)

    _check_grads(ref, fused, (x, params), t(B, U, scale=1.0))
