"""Fused multi-layer perceptron kernels (Pallas TPU).

The SQAIR hot loop is ~60 *sequential* tiny cell evaluations per training
step (T timesteps x 2S slots); at [160, <=2500] x [<=2500, 256] sizes every
matmul is launch-overhead-bound, so the win is kernel COUNT, not FLOPs.
``fused_mlp`` runs an entire MLP stack (every layer + activation) as ONE
Pallas kernel, with a custom VJP whose backward is also one kernel.  All
weights and activations of a stack fit comfortably in VMEM (< 6 MB).

Activation derivatives are recovered from post-activations (elu': a+1 for
a<=0 else 1; sigmoid': s(1-s); tanh': 1-t^2), so the forward saves only the
layer outputs.

Replaces the per-layer Dense kernels of the reference's MLP
(sqair/neural.py:111-116) on TPU; a pure-jnp path with identical math backs
CPU runs and the virtual-device mesh tests.
"""
from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name

Params = Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]  # ((W, b), ...)

_ACTS = ("id", "elu", "sigmoid", "tanh")


def _apply_act(z, act: str):
    if act == "elu":
        # jax.nn.elu uses expm1, which Pallas TPU cannot lower; exp(z)-1 on
        # the negative branch is equivalent (z<=0 keeps exp well-behaved)
        return jnp.where(z > 0, z, jnp.exp(jnp.minimum(z, 0.0)) - 1.0)
    if act == "sigmoid":
        return jax.nn.sigmoid(z)
    if act == "tanh":
        return jnp.tanh(z)
    return z


def _act_grad_from_output(a, act: str):
    """d act(z) / dz expressed via the post-activation a."""
    if act == "elu":
        return jnp.where(a > 0, 1.0, a + 1.0)
    if act == "sigmoid":
        return a * (1.0 - a)
    if act == "tanh":
        return 1.0 - a * a
    return jnp.ones_like(a)


def use_pallas() -> bool:
    """Pallas path only on real TPU backends (not CPU/virtual meshes)."""
    if os.environ.get("SQAIR_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


# --------------------------------------------------------------- reference
def mlp_reference(x: jnp.ndarray, params: Params,
                  transfers: Sequence[str]) -> jnp.ndarray:
    for (w, b), act in zip(params, transfers):
        x = _apply_act(x @ w + b, act)
    return x


# ------------------------------------------------------------------ pallas
def _fwd_kernel(transfers, x_ref, *refs):
    n = len(transfers)
    w_refs, b_refs = refs[:n], refs[n : 2 * n]
    out_refs = refs[2 * n :]  # one per layer (post-activation)
    a = x_ref[...]
    for i, act in enumerate(transfers):
        z = (
            jnp.dot(a, w_refs[i][...], preferred_element_type=jnp.float32)
            + b_refs[i][...][None, :]
        )
        a = _apply_act(z, act)
        out_refs[i][...] = a


def _bwd_kernel(transfers, x_ref, *refs):
    n = len(transfers)
    w_refs = refs[:n]
    a_refs = refs[n : 2 * n]  # saved post-activations
    g_ref = refs[2 * n]  # dL/d out
    dx_ref = refs[2 * n + 1]
    dw_refs = refs[2 * n + 2 : 2 * n + 2 + n]
    db_refs = refs[2 * n + 2 + n :]

    g = g_ref[...]
    for i in range(n - 1, -1, -1):
        a_i = a_refs[i][...]
        dz = g * _act_grad_from_output(a_i, transfers[i])
        a_prev = x_ref[...] if i == 0 else a_refs[i - 1][...]
        dw_refs[i][...] = jnp.dot(
            a_prev.T, dz, preferred_element_type=jnp.float32
        )
        db_refs[i][...] = jnp.sum(dz, axis=0)
        g = jnp.dot(dz, w_refs[i][...].T, preferred_element_type=jnp.float32)
    dx_ref[...] = g


def _pallas_forward(x, params, transfers):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = x.shape[0]
    outs = [
        jax.ShapeDtypeStruct((B, w.shape[1]), jnp.float32) for w, _ in params
    ]
    n = len(params)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    acts = pl.pallas_call(
        functools.partial(_fwd_kernel, tuple(transfers)),
        out_shape=outs,
        in_specs=[spec] * (1 + 2 * n),
        out_specs=[spec] * n,
    )(x, *[w for w, _ in params], *[b for _, b in params])
    return acts


def _pallas_backward(x, params, transfers, acts, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = len(params)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = (
        [jax.ShapeDtypeStruct(x.shape, jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w, _ in params]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for _, b in params]
    )
    res = pl.pallas_call(
        functools.partial(_bwd_kernel, tuple(transfers)),
        out_shape=out_shapes,
        in_specs=[spec] * (1 + 2 * n + 1),
        out_specs=[spec] * (1 + 2 * n),
    )(x, *[w for w, _ in params], *acts, g)
    dx = res[0]
    dws = res[1 : 1 + n]
    dbs = res[1 + n :]
    dparams = tuple((dw, db) for dw, db in zip(dws, dbs))
    return dx, dparams


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_mlp_2d(x, params, transfers):
    acts = _pallas_forward(x, params, transfers)
    return acts[-1]


def _fused_fwd(x, params, transfers):
    acts = _pallas_forward(x, params, transfers)
    return acts[-1], (x, params, tuple(acts))


def _fused_bwd(transfers, saved, g):
    x, params, acts = saved
    dx, dparams = _pallas_backward(x, params, transfers, acts, g)
    return dx, dparams


_fused_mlp_2d.defvjp(_fused_fwd, _fused_bwd)


# ------------------------------------------------------------- RNN cells
def _vrnn_fwd_kernel(x_ref, h_ref, w_ref, u_ref, b_ref, out_ref):
    # one concat matmul instead of x@W + h@U: halves the dependent MXU ops
    # (the chain is latency-bound, docs/NOTES.md)
    xh = jnp.concatenate([x_ref[...], h_ref[...]], -1)
    wu = jnp.concatenate([w_ref[...], u_ref[...]], 0)
    z = jnp.dot(xh, wu, preferred_element_type=jnp.float32) + b_ref[...][None, :]
    out_ref[...] = jnp.tanh(z)


def _vrnn_bwd_kernel(x_ref, h_ref, w_ref, u_ref, hn_ref, g_ref,
                     dx_ref, dh_ref, dw_ref, du_ref, db_ref):
    hn = hn_ref[...]
    dz = g_ref[...] * (1.0 - hn * hn)
    wu = jnp.concatenate([w_ref[...], u_ref[...]], 0)
    dxh = jnp.dot(dz, wu.T, preferred_element_type=jnp.float32)
    n_in = x_ref.shape[-1]
    dx_ref[...] = dxh[:, :n_in]
    dh_ref[...] = dxh[:, n_in:]
    xh = jnp.concatenate([x_ref[...], h_ref[...]], -1)
    dwu = jnp.dot(xh.T, dz, preferred_element_type=jnp.float32)
    dw_ref[...] = dwu[:n_in]
    du_ref[...] = dwu[n_in:]
    db_ref[...] = jnp.sum(dz, axis=0)


@jax.custom_vjp
def _fused_vrnn(x, h, w, u, b):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _vrnn_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct(h.shape, jnp.float32),
        in_specs=[spec] * 5, out_specs=spec,
    )(x, h, w, u, b)


def _fused_vrnn_fwd(x, h, w, u, b):
    hn = _fused_vrnn(x, h, w, u, b)
    return hn, (x, h, w, u, hn)


def _fused_vrnn_bwd(saved, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x, h, w, u, hn = saved
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = [jax.ShapeDtypeStruct(a.shape, jnp.float32)
            for a in (x, h, w, u)] + [
        jax.ShapeDtypeStruct((w.shape[1],), jnp.float32)
    ]
    dx, dh, dw, du, db = pl.pallas_call(
        _vrnn_bwd_kernel, out_shape=outs,
        in_specs=[spec] * 6, out_specs=[spec] * 5,
    )(x, h, w, u, hn, g)
    return dx, dh, dw, du, db


_fused_vrnn.defvjp(_fused_vrnn_fwd, _fused_vrnn_bwd)


def fused_vanilla_rnn(x, h, w, u, b):
    """h' = tanh(x W + h U + b) as one fwd kernel + one bwd kernel."""
    if not use_pallas():
        return jnp.tanh(x @ w + h @ u + b)
    return _checkpoint_name(_fused_vrnn(x, h, w, u, b), "fused_out")


def _gru_fwd_kernel(x_ref, h_ref, wg_ref, ug_ref, bg_ref, wc_ref, uc_ref,
                    bc_ref, hn_ref, zr_ref, c_ref):
    x, h = x_ref[...], h_ref[...]
    # concat matmuls: 4 dependent MXU ops -> 2 (latency-bound chain)
    xh = jnp.concatenate([x, h], -1)
    wug = jnp.concatenate([wg_ref[...], ug_ref[...]], 0)
    zr = jax.nn.sigmoid(
        jnp.dot(xh, wug, preferred_element_type=jnp.float32)
        + bg_ref[...][None, :]
    )
    u_dim = h.shape[-1]
    z, r = zr[:, :u_dim], zr[:, u_dim:]
    xrh = jnp.concatenate([x, r * h], -1)
    wuc = jnp.concatenate([wc_ref[...], uc_ref[...]], 0)
    c = jnp.tanh(
        jnp.dot(xrh, wuc, preferred_element_type=jnp.float32)
        + bc_ref[...][None, :]
    )
    hn_ref[...] = (1.0 - z) * h + z * c
    zr_ref[...] = zr
    c_ref[...] = c


def _gru_bwd_kernel(x_ref, h_ref, wg_ref, ug_ref, wc_ref, uc_ref, zr_ref,
                    c_ref, g_ref,
                    dx_ref, dh_ref, dwg_ref, dug_ref, dbg_ref, dwc_ref,
                    duc_ref, dbc_ref):
    x, h, g = x_ref[...], h_ref[...], g_ref[...]
    zr, c = zr_ref[...], c_ref[...]
    u_dim = h.shape[-1]
    z, r = zr[:, :u_dim], zr[:, u_dim:]

    dz = g * (c - h)
    dc_in = (g * z) * (1.0 - c * c)
    n_in = x.shape[-1]
    wuc = jnp.concatenate([wc_ref[...], uc_ref[...]], 0)
    dxrh = jnp.dot(dc_in, wuc.T, preferred_element_type=jnp.float32)
    drh = dxrh[:, n_in:]
    dr = drh * h
    da = jnp.concatenate([dz, dr], axis=-1) * zr * (1.0 - zr)

    xrh = jnp.concatenate([x, r * h], -1)
    dwuc = jnp.dot(xrh.T, dc_in, preferred_element_type=jnp.float32)
    dwc_ref[...] = dwuc[:n_in]
    duc_ref[...] = dwuc[n_in:]
    dbc_ref[...] = jnp.sum(dc_in, axis=0)
    xh = jnp.concatenate([x, h], -1)
    dwug = jnp.dot(xh.T, da, preferred_element_type=jnp.float32)
    dwg_ref[...] = dwug[:n_in]
    dug_ref[...] = dwug[n_in:]
    dbg_ref[...] = jnp.sum(da, axis=0)
    wug = jnp.concatenate([wg_ref[...], ug_ref[...]], 0)
    dxh = jnp.dot(da, wug.T, preferred_element_type=jnp.float32)
    dx_ref[...] = dxrh[:, :n_in] + dxh[:, :n_in]
    dh_ref[...] = g * (1.0 - z) + drh * r + dxh[:, n_in:]


@jax.custom_vjp
def _fused_gru(x, h, wg, ug, bg, wc, uc, bc):
    hn, _, _ = _fused_gru_call(x, h, wg, ug, bg, wc, uc, bc)
    return hn


def _fused_gru_call(x, h, wg, ug, bg, wc, uc, bc):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    B, u_dim = h.shape
    outs = [
        jax.ShapeDtypeStruct((B, u_dim), jnp.float32),
        jax.ShapeDtypeStruct((B, 2 * u_dim), jnp.float32),
        jax.ShapeDtypeStruct((B, u_dim), jnp.float32),
    ]
    return pl.pallas_call(
        _gru_fwd_kernel, out_shape=outs,
        in_specs=[spec] * 8, out_specs=[spec] * 3,
    )(x, h, wg, ug, bg, wc, uc, bc)


def _fused_gru_fwd(x, h, wg, ug, bg, wc, uc, bc):
    hn, zr, c = _fused_gru_call(x, h, wg, ug, bg, wc, uc, bc)
    return hn, (x, h, wg, ug, wc, uc, zr, c)


def _fused_gru_bwd(saved, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x, h, wg, ug, wc, uc, zr, c = saved
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = [
        jax.ShapeDtypeStruct(x.shape, jnp.float32),
        jax.ShapeDtypeStruct(h.shape, jnp.float32),
        jax.ShapeDtypeStruct(wg.shape, jnp.float32),
        jax.ShapeDtypeStruct(ug.shape, jnp.float32),
        jax.ShapeDtypeStruct((wg.shape[1],), jnp.float32),
        jax.ShapeDtypeStruct(wc.shape, jnp.float32),
        jax.ShapeDtypeStruct(uc.shape, jnp.float32),
        jax.ShapeDtypeStruct((wc.shape[1],), jnp.float32),
    ]
    return tuple(
        pl.pallas_call(
            _gru_bwd_kernel, out_shape=outs,
            in_specs=[spec] * 9, out_specs=[spec] * 8,
        )(x, h, wg, ug, wc, uc, zr, c, g)
    )


_fused_gru.defvjp(_fused_gru_fwd, _fused_gru_bwd)


def fused_gru(x, h, wg, ug, bg, wc, uc, bc):
    """Full GRU step as one fwd kernel + one bwd kernel.

    zr = sigmoid(x Wg + h Ug + bg); z, r = split(zr)
    c  = tanh(x Wc + (r*h) Uc + bc); h' = (1-z) h + z c
    """
    if not use_pallas():
        zr = jax.nn.sigmoid(x @ wg + h @ ug + bg)
        u_dim = h.shape[-1]
        z, r = zr[..., :u_dim], zr[..., u_dim:]
        c = jnp.tanh(x @ wc + (r * h) @ uc + bc)
        return (1.0 - z) * h + z * c
    return _checkpoint_name(
        _fused_gru(x, h, wg, ug, bg, wc, uc, bc), "fused_out")


def fused_mlp(x: jnp.ndarray, params: Params,
              transfers: Sequence[str]) -> jnp.ndarray:
    """Runs act_n(...act_1(x W_1 + b_1)...W_n + b_n) as one TPU kernel.

    :param x: [..., d_in] (leading dims flattened internally)
    :param params: ((W [d_i, d_{i+1}], b [d_{i+1}]), ...)
    :param transfers: activation per layer, from {"id","elu","sigmoid","tanh"}
    """
    transfers = tuple(transfers)
    assert len(transfers) == len(params)
    for t in transfers:
        if t not in _ACTS:
            raise ValueError(f"unknown transfer '{t}'")
    if not use_pallas():
        return mlp_reference(x, params, transfers)

    lead = x.shape[:-1]
    x2 = x.reshape((-1, x.shape[-1]))
    out = _fused_mlp_2d(x2, tuple(params), transfers)
    # make the fused output saveable under jax.checkpoint name policies —
    # the dots policy can't see matmuls hidden inside the custom_vjp
    out = _checkpoint_name(out, "fused_out")
    return out.reshape(lead + (out.shape[-1],))
