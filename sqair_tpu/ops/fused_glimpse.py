"""Fused glimpse-encoder Pallas kernel.

The single most repeated block of SQAIR: crop a glimpse at `where` and
encode it to a what-posterior.  Per propagation cell it runs TWICE, once
per discovery cell — ~90 forward invocations per training step, each ~10
XLA kernels (coords, two interp-matrix builds, two batched matmuls, mask
MLP, multiply, encoder MLP, Gaussian head).  This module runs the whole
chain as ONE Pallas kernel forward and ONE backward, including the
`where`-gradient through the bilinear interpolation weights (the
reference's resampler gradient, tf.contrib.resampler).

Math (reference sqair/modules.py:150-364):
  s = sigmoid(wl[:, :2]); t = tanh(wl[:, 2:])        # to_coords
  s = max(s, 1e-4) with straight-through gradient     # clip_preserve
  wy[b,i,p] = relu(1 - |(s_y t_i + t_y + 1)(H-1)/2 - p|)
  g = wy @ img @ wx^T                                 # separable bilinear
  g *= sigmoid(MLP(mask_inpt))                        # masked_glimpse
  h = elu-MLP(g); loc, z = split(h W_h + b_h)
  scale = softplus(z) + 1e-2                          # GaussianFromParamVec

Mosaic cannot reshape across the tiled (last two) dims, so the [B, gh, gw]
glimpse is never flattened in-kernel: the encoder's first layer contracts
it against W reshaped to [gh, gw, d] via a static loop over glimpse rows,
and the backward builds its flat/3-D intermediates with slice writes into
VMEM scratch.

img is observed data: no gradient is propagated into it (the reference's
graph likewise never differentiates w.r.t. the input frames).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name

from .fused import use_pallas  # noqa: F401  (re-exported gate)

MIN_SCALE = 1e-4  # stn.SCALE_EPS
MIN_STD = 1e-2


def _softplus(x):
    return jnp.maximum(x, 0.0) + jnp.log(1.0 + jnp.exp(-jnp.abs(x)))


def _elu(z):
    return jnp.where(z > 0, z, jnp.exp(jnp.minimum(z, 0.0)) - 1.0)


def _delu(a):
    return jnp.where(a > 0, 1.0, a + 1.0)


def _coords_and_interp(wl, H, W, gh, gw):
    """coords + interpolation matrices, shared by fwd and bwd kernels."""
    s = jax.nn.sigmoid(wl[:, :2])
    t = jnp.tanh(wl[:, 2:])
    sx, sy = s[:, 0], s[:, 1]
    tx, ty = t[:, 0], t[:, 1]
    sxc, syc = jnp.maximum(sx, MIN_SCALE), jnp.maximum(sy, MIN_SCALE)

    def interp(scale, shift, src, dst):
        ti = jax.lax.broadcasted_iota(jnp.int32, (dst, 1), 0)[:, 0]
        ti = ti.astype(jnp.float32) * (2.0 / (dst - 1)) - 1.0
        u = (scale[:, None] * ti[None, :] + shift[:, None] + 1.0) * (src - 1) / 2.0
        p = jax.lax.broadcasted_iota(jnp.int32, (1, 1, src), 2).astype(jnp.float32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(u[:, :, None] - p)), u, ti

    wy, uy, ti_y = interp(syc, ty, H, gh)  # [B, gh, H]
    wx, ux, ti_x = interp(sxc, tx, W, gw)  # [B, gw, W]
    return (sx, sy, tx, ty), (wy, uy, ti_y), (wx, ux, ti_x)


def _mm(a, b):
    """Batched [B, m, k] x [B, k, n] matmul (crop path).

    HIGHEST precision to match the jnp ST path (ops/stn.py uses HIGHEST for
    the bilinear einsums; the MLP dots keep the default, which is identical
    between Mosaic and XLA Dense layers).
    """
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _fwd_kernel(masked, dims, img_ref, wl_ref, *refs):
    gh, gw, n_what = dims
    i = 0
    if masked:
        mi_ref, wm1_ref, bm1_ref, wm2_ref, bm2_ref = refs[:5]
        i = 5
    # we1 arrives reshaped [gh, gw, d1]
    we1_ref, be1_ref, we2_ref, be2_ref, wh_ref, bh_ref = refs[i : i + 6]
    (loc_ref, scale_ref, g0_ref, h1_ref, h2_ref) = refs[i + 6 : i + 11]
    out_extra = refs[i + 11 :]

    img = img_ref[...]
    _, H, W = img.shape
    _, (wy, _, _), (wx, _, _) = _coords_and_interp(wl_ref[...], H, W, gh, gw)

    A = _mm(img, jnp.swapaxes(wx, 1, 2))  # [B, H, gw]
    g0 = _mm(wy, A)  # [B, gh, gw]
    g0_ref[...] = g0

    mask = None
    if masked:
        mask_ref, mhid_ref = out_extra
        mhid = _elu(_dot(mi_ref[...], wm1_ref[...]) + bm1_ref[...][None, :])
        mask = jax.nn.sigmoid(_dot(mhid, wm2_ref[...]) + bm2_ref[...][None, :])
        mhid_ref[...] = mhid
        mask_ref[...] = mask  # [B, gh*gw] flat

    # first encoder layer: contract the 3-D glimpse row by row
    z1 = be1_ref[...][None, :]
    for r in range(gh):
        row = g0[:, r, :]  # [B, gw]
        if masked:
            row = row * mask[:, r * gw : (r + 1) * gw]
        z1 = z1 + _dot(row, we1_ref[r])
    h1 = _elu(z1)
    h2 = _elu(_dot(h1, we2_ref[...]) + be2_ref[...][None, :])
    h1_ref[...] = h1
    h2_ref[...] = h2
    hp = _dot(h2, wh_ref[...]) + bh_ref[...][None, :]
    loc_ref[...] = hp[:, :n_what]
    scale_ref[...] = _softplus(hp[:, n_what:]) + MIN_STD


def _bwd_kernel(masked, dims, img_ref, wl_ref, *refs):
    gh, gw, n_what = dims
    i = 0
    if masked:
        mi_ref, wm1_ref, wm2_ref = refs[:3]
        i = 3
    we1_ref, we2_ref, wh_ref = refs[i : i + 3]  # we1 flat [gh*gw, d1]
    i += 3
    if masked:
        mask_ref, mhid_ref = refs[i : i + 2]
        i += 2
    g0_ref, h1_ref, h2_ref, scale_ref, dloc_ref, dscale_ref = refs[i : i + 6]
    i += 6
    dwl_ref = refs[i]
    i += 1
    if masked:
        dmi_ref, dwm1_ref, dbm1_ref, dwm2_ref, dbm2_ref = refs[i : i + 5]
        i += 5
    dwe1_ref, dbe1_ref, dwe2_ref, dbe2_ref, dwh_ref, dbh_ref = refs[i : i + 6]
    i += 6
    # VMEM scratch: flat masked glimpse, flat dmask, 3-D dg0
    gflat_ref, dmask_ref, dg0_ref = refs[i : i + 3]

    img = img_ref[...]
    _, H, W = img.shape
    wl = wl_ref[...]
    (sx, sy, tx, ty), (wy, uy, ti_y), (wx, ux, ti_x) = _coords_and_interp(
        wl, H, W, gh, gw
    )
    g0 = g0_ref[...]
    mask = mask_ref[...] if masked else None

    # flat (masked) glimpse rebuilt by slice writes (no in-kernel reshape)
    for r in range(gh):
        row = g0[:, r, :]
        if masked:
            row = row * mask[:, r * gw : (r + 1) * gw]
        gflat_ref[:, r * gw : (r + 1) * gw] = row
    gflat_in = gflat_ref[...]

    # head backward: softplus' recovered from the saved post-value
    scale = scale_ref[...]
    dsp = 1.0 - jnp.exp(-(scale - MIN_STD))
    dhp = jnp.concatenate([dloc_ref[...], dscale_ref[...] * dsp], axis=-1)
    h2 = h2_ref[...]
    dwh_ref[...] = _dot(h2.T, dhp)
    dbh_ref[...] = jnp.sum(dhp, axis=0)
    dh2 = _dot(dhp, wh_ref[...].T)

    h1 = h1_ref[...]
    dz2 = dh2 * _delu(h2)
    dwe2_ref[...] = _dot(h1.T, dz2)
    dbe2_ref[...] = jnp.sum(dz2, axis=0)
    dh1 = _dot(dz2, we2_ref[...].T)

    dz1 = dh1 * _delu(h1)
    dwe1_ref[...] = _dot(gflat_in.T, dz1)
    dbe1_ref[...] = jnp.sum(dz1, axis=0)
    dgflat = _dot(dz1, we1_ref[...].T)  # [B, gh*gw]

    if masked:
        mhid = mhid_ref[...]
        for r in range(gh):
            sl = slice(r * gw, (r + 1) * gw)
            dmask_ref[:, sl] = dgflat[:, sl] * g0[:, r, :]
            dg0_ref[:, r, :] = dgflat[:, sl] * mask[:, sl]
        dmask = dmask_ref[...]
        dmz2 = dmask * mask * (1.0 - mask)
        dwm2_ref[...] = _dot(mhid.T, dmz2)
        dbm2_ref[...] = jnp.sum(dmz2, axis=0)
        dmhid = _dot(dmz2, wm2_ref[...].T)
        dmz1 = dmhid * _delu(mhid)
        dwm1_ref[...] = _dot(mi_ref[...].T, dmz1)
        dbm1_ref[...] = jnp.sum(dmz1, axis=0)
        dmi_ref[...] = _dot(dmz1, wm1_ref[...].T)
    else:
        for r in range(gh):
            dg0_ref[:, r, :] = dgflat[:, r * gw : (r + 1) * gw]
    dg0 = dg0_ref[...]

    # crop backward: g0 = wy @ A, A = img @ wx^T
    A = _mm(img, jnp.swapaxes(wx, 1, 2))  # [B, H, gw]
    dwy = _mm(dg0, jnp.swapaxes(A, 1, 2))  # [B, gh, H]
    dA = _mm(jnp.swapaxes(wy, 1, 2), dg0)  # [B, H, gw]
    dwx = _mm(jnp.swapaxes(dA, 1, 2), img)  # [B, gw, W]

    # interpolation-weight backward: w = relu(1 - |u - p|)
    def d_interp(dw, w_mat, u, src, dst, ti):
        p = jax.lax.broadcasted_iota(jnp.int32, (1, 1, src), 2).astype(jnp.float32)
        du_dp = jnp.where(w_mat > 0.0, -jnp.sign(u[:, :, None] - p), 0.0)
        du = jnp.sum(dw * du_dp, axis=2)  # [B, dst]
        dscale_ = jnp.sum(du * ti[None, :], axis=1) * (src - 1) / 2.0
        dshift_ = jnp.sum(du, axis=1) * (src - 1) / 2.0
        return dscale_, dshift_

    dsyc, dty = d_interp(dwy, wy, uy, H, gh, ti_y)
    dsxc, dtx = d_interp(dwx, wx, ux, W, gw, ti_x)

    # clip_preserve: straight-through; then to_coords backward
    dwl_ref[...] = jnp.stack(
        [
            dsxc * sx * (1.0 - sx),
            dsyc * sy * (1.0 - sy),
            dtx * (1.0 - tx * tx),
            dty * (1.0 - ty * ty),
        ],
        axis=-1,
    )


def _specs(n):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return [pl.BlockSpec(memory_space=pltpu.VMEM)] * n


def _compiler_params():
    """The backward kernel's stack peaks ~40MB at the paper config (img +
    interp matrices + HIGHEST-precision matmul temporaries); v5e has 128MB
    of physical VMEM, so raise the default 16MB scoped limit."""
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _run_fwd(img, wl, mi, mask_params, enc_params, head_w, head_b, dims):
    from jax.experimental import pallas as pl

    masked = mi is not None
    gh, gw, n_what = dims
    B = img.shape[0]
    f32 = jnp.float32
    d1 = enc_params[0][0].shape[1]
    we1_3d = enc_params[0][0].reshape((gh, gw, d1))  # reshape outside kernel
    outs = [
        jax.ShapeDtypeStruct((B, n_what), f32),  # loc
        jax.ShapeDtypeStruct((B, n_what), f32),  # scale
        jax.ShapeDtypeStruct((B, gh, gw), f32),  # g0
        jax.ShapeDtypeStruct((B, d1), f32),  # h1
        jax.ShapeDtypeStruct((B, enc_params[1][0].shape[1]), f32),  # h2
    ]
    args = [img, wl]
    if masked:
        outs += [
            jax.ShapeDtypeStruct((B, gh * gw), f32),  # mask
            jax.ShapeDtypeStruct((B, mask_params[0][0].shape[1]), f32),  # mhid
        ]
        args += [mi, mask_params[0][0], mask_params[0][1],
                 mask_params[1][0], mask_params[1][1]]
    args += [we1_3d, enc_params[0][1],
             enc_params[1][0], enc_params[1][1], head_w, head_b]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, masked, dims),
        out_shape=outs,
        in_specs=_specs(len(args)),
        out_specs=_specs(len(outs)),
        compiler_params=_compiler_params(),
    )(*args)


def _run_bwd(img, wl, mi, mask_params, enc_params, head_w, saved, dloc,
             dscale, dims):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    masked = mi is not None
    gh, gw, _ = dims
    B = img.shape[0]
    f32 = jnp.float32
    if masked:
        g0, h1, h2, scale, mask, mhid = saved
    else:
        g0, h1, h2, scale = saved
    args = [img, wl]
    if masked:
        args += [mi, mask_params[0][0], mask_params[1][0]]
    args += [enc_params[0][0], enc_params[1][0], head_w]
    if masked:
        args += [mask, mhid]
    args += [g0, h1, h2, scale, dloc, dscale]

    outs = [jax.ShapeDtypeStruct(wl.shape, f32)]  # dwl
    if masked:
        outs += [
            jax.ShapeDtypeStruct(mi.shape, f32),
            jax.ShapeDtypeStruct(mask_params[0][0].shape, f32),
            jax.ShapeDtypeStruct((mask_params[0][0].shape[1],), f32),
            jax.ShapeDtypeStruct(mask_params[1][0].shape, f32),
            jax.ShapeDtypeStruct((mask_params[1][0].shape[1],), f32),
        ]
    outs += [
        jax.ShapeDtypeStruct(enc_params[0][0].shape, f32),
        jax.ShapeDtypeStruct((enc_params[0][0].shape[1],), f32),
        jax.ShapeDtypeStruct(enc_params[1][0].shape, f32),
        jax.ShapeDtypeStruct((enc_params[1][0].shape[1],), f32),
        jax.ShapeDtypeStruct(head_w.shape, f32),
        jax.ShapeDtypeStruct((head_w.shape[1],), f32),
    ]
    scratch = [
        pltpu.VMEM((B, gh * gw), f32),  # flat masked glimpse
        pltpu.VMEM((B, gh * gw), f32),  # flat dmask
        pltpu.VMEM((B, gh, gw), f32),  # dg0
    ]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, masked, dims),
        out_shape=outs,
        in_specs=_specs(len(args)),
        out_specs=_specs(len(outs)),
        scratch_shapes=scratch,
        compiler_params=_compiler_params(),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _fused_ge(img, wl, mi, mask_params, enc_params, head_w, head_b, dims):
    res = _run_fwd(img, wl, mi, mask_params, enc_params, head_w, head_b, dims)
    return res[0], res[1]


def _fused_ge_fwd(img, wl, mi, mask_params, enc_params, head_w, head_b, dims):
    res = _run_fwd(img, wl, mi, mask_params, enc_params, head_w, head_b, dims)
    loc, scale, g0, h1, h2 = res[:5]
    saved_extra = tuple(res[5:])  # (mask, mhid) if masked
    saved = (img, wl, mi, mask_params, enc_params, head_w,
             (g0, h1, h2, scale) + saved_extra)
    return (loc, scale), saved


def _fused_ge_bwd(dims, saved, g):
    img, wl, mi, mask_params, enc_params, head_w, res = saved
    dloc, dscale = g
    outs = _run_bwd(img, wl, mi, mask_params, enc_params, head_w, res,
                    dloc, dscale, dims)
    i = 0
    dwl = outs[i]; i += 1
    if mi is not None:
        dmi = outs[i]; i += 1
        dmask_params = ((outs[i], outs[i + 1]), (outs[i + 2], outs[i + 3]))
        i += 4
    else:
        dmi = None
        dmask_params = None
    denc_params = ((outs[i], outs[i + 1]), (outs[i + 2], outs[i + 3]))
    i += 4
    dhead_w, dhead_b = outs[i], outs[i + 1]
    dimg = jnp.zeros_like(img)  # observed data: no gradient (matches ref)
    return (dimg, dwl, dmi, dmask_params, denc_params, dhead_w, dhead_b)


_fused_ge.defvjp(_fused_ge_fwd, _fused_ge_bwd)


def fused_glimpse_encoder(
    img: jnp.ndarray,
    where_logits: jnp.ndarray,
    mask_inpt: Optional[jnp.ndarray],
    mask_params,  # ((Wm1, bm1), (Wm2, bm2)) or None
    enc_params,  # ((We1, be1), (We2, be2))
    head_w: jnp.ndarray,
    head_b: jnp.ndarray,
    glimpse_size: Tuple[int, int],
    n_what: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full glimpse-encode as one Pallas kernel (see module docstring).

    :return: (loc [B, n_what], scale [B, n_what])
    """
    dims = (int(glimpse_size[0]), int(glimpse_size[1]), int(n_what))
    if mask_inpt is None:
        mask_params = None
    loc, scale = _fused_ge(img, where_logits, mask_inpt, mask_params,
                           enc_params, head_w, head_b, dims)
    loc = _checkpoint_name(loc, "fused_out")
    scale = _checkpoint_name(scale, "fused_out")
    return loc, scale
