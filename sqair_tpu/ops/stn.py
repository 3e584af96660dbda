"""Spatial Transformer as separable bilinear matmuls (TPU-native).

The reference implements the glimpse crop/paste with
``snt.AffineGridWarper`` + the native ``tf.contrib.resampler`` CUDA kernel
(sqair/modules.py:150-280).  The affine transform has no shear, so the 2-D
bilinear resampling factorises into two 1-D interpolations:

    crop  = W_y @ img @ W_x^T          W_y: [crop_h, H], W_x: [crop_w, W]
    paste = U_y @ glimpse @ U_x^T      U_y: [H, crop_h], U_x: [W, crop_w]

where W/U are bilinear interpolation matrices built from the affine params.
This removes every gather from the hot path and maps the (by far) hottest
op of the model onto the MXU.  Boundary semantics match the resampler:
out-of-range source coordinates interpolate against implicit zeros.

Coordinate conventions (identical to the reference):
  * ``where`` latents live in logit space; ``to_coords`` maps them to ST
    space via (sigmoid, tanh)  (sqair/modules.py:220-227).
  * coords order is [sx, sy, tx, ty]; the warp in normalised [-1, 1] space
    is  x_src = sx * x_dst + tx  (and the same for y), then denormalised to
    pixels via  u = (x_src + 1) * (L - 1) / 2.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .math import clip_preserve

SCALE_EPS = 1e-4  # reference clips scale >= 1e-4 (sqair/modules.py:206)


def to_coords(logits: jnp.ndarray) -> jnp.ndarray:
    """where logits -> ST coords: scale=sigmoid, shift=tanh.

    Reference: sqair/modules.py:220-227.
    """
    scale_logit, shift_logit = jnp.split(logits, 2, -1)
    return jnp.concatenate([jax.nn.sigmoid(scale_logit), jnp.tanh(shift_logit)], -1)


def to_logits(coords: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Inverse of to_coords. Reference: sqair/modules.py:229-243."""
    scale, shift = jnp.split(coords, 2, -1)
    scale = jnp.clip(scale, eps, 1.0 - eps)
    scale_logit = jnp.log(scale / (1.0 - scale))
    shift = jnp.clip(shift, eps - 1.0, 1.0 - eps)
    shift_logit = 0.5 * (jnp.log1p(shift) - jnp.log1p(-shift))
    return jnp.concatenate([scale_logit, shift_logit], -1)


def stn_to_pixel_coords(stn_coords, img_size) -> jnp.ndarray:
    """ST coords -> pixel (y, x, h, w) boxes for evaluation/figures.

    Reference: sqair/modules.py:245-262 (kept verbatim, including the
    (length+1) size convention used there).
    """
    sx, sy, tx, ty = jnp.split(jnp.asarray(stn_coords), 4, -1)

    def one(scale, translation, length):
        size = (length + 1.0) * scale
        shift = 0.5 * (length - 1.0) * (translation - scale + 1.0)
        return shift, size

    y, h = one(sy, ty, img_size[0])
    x, w = one(sx, tx, img_size[1])
    return jnp.concatenate([y, x, h, w], -1)


def pixel_to_stn_coords(yxhw, img_size) -> jnp.ndarray:
    """Pixel (y, x, h, w) boxes -> ST coords. Reference: modules.py:264-280."""
    img_size = jnp.asarray(img_size, jnp.float32)
    yxhw = jnp.asarray(yxhw, jnp.float32)
    scale = yxhw[..., 2:] / (img_size + 1.0)
    shift = 2.0 * yxhw[..., :2] / (img_size - 1.0) + scale - 1.0
    sy, sx = jnp.split(scale, 2, -1)
    ty, tx = jnp.split(shift, 2, -1)
    return jnp.concatenate([sx, sy, tx, ty], -1)


def _interp_matrix(scale, shift, src_len: int, dst_len: int) -> jnp.ndarray:
    """Bilinear interpolation matrix for a 1-D affine warp.

    For output pixel i (of dst_len) at normalised t_i = -1 + 2i/(dst_len-1),
    the source coordinate is u_i = (scale*t_i + shift + 1) * (src_len-1)/2
    and  M[..., i, p] = max(0, 1 - |u_i - p|).

    ``scale``/``shift`` have shape [...]; output [..., dst_len, src_len].
    """
    t = jnp.linspace(-1.0, 1.0, dst_len, dtype=jnp.float32)
    u = (scale[..., None] * t + shift[..., None] + 1.0) * (src_len - 1) / 2.0
    p = jnp.arange(src_len, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(u[..., :, None] - p))


def _split_coords(coords):
    sx, sy, tx, ty = (coords[..., i] for i in range(4))
    sx = clip_preserve(sx, SCALE_EPS, jnp.inf)
    sy = clip_preserve(sy, SCALE_EPS, jnp.inf)
    return sx, sy, tx, ty


def extract_glimpse(img: jnp.ndarray, coords: jnp.ndarray,
                    glimpse_size: Sequence[int]) -> jnp.ndarray:
    """Crops a glimpse at ``coords`` (forward ST).

    :param img: [..., H, W] or [..., H, W, C]
    :param coords: [..., 4] ST coords (sx, sy, tx, ty), batch dims matching img
    :param glimpse_size: (gh, gw)
    :return: [..., gh, gw(, C)]
    """
    gh, gw = glimpse_size
    has_c = img.ndim == coords.ndim - 1 + 3
    if not has_c:
        img = img[..., None]
    H, W = img.shape[-3], img.shape[-2]
    sx, sy, tx, ty = _split_coords(coords)
    wy = _interp_matrix(sy, ty, H, gh)  # [..., gh, H]
    wx = _interp_matrix(sx, tx, W, gw)  # [..., gw, W]
    # highest precision: TPU's default bf16 matmul would put ~4e-3 noise on
    # the canvas, which the Gaussian likelihood (std 0.3) would pay in nats
    out = jnp.einsum("...ih,...hwc,...jw->...ijc", wy, img, wx,
                     precision=jax.lax.Precision.HIGHEST)
    if not has_c:
        out = out[..., 0]
    return out


def paste_matrices(coords: jnp.ndarray, glimpse_size: Sequence[int],
                   img_size: Sequence[int]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Interpolation matrices of the inverse-ST paste.

    :param coords: [..., 4] forward-crop ST coords
    :return: (uy [..., H, gh], ux [..., W, gw]) such that
        paste = uy @ glimpse @ ux^T.  Exposed separately so callers can
        share the matrices between the glimpse paste and the written-to
        mask: pasting a glimpse of ones factorises into the rank-1 outer
        product of the row sums, ones_paste = uy.sum(-1) ⊗ ux.sum(-1).
    """
    gh, gw = glimpse_size
    H, W = img_size
    sx, sy, tx, ty = _split_coords(coords)
    uy = _interp_matrix(1.0 / sy, -ty / sy, gh, H)
    ux = _interp_matrix(1.0 / sx, -tx / sx, gw, W)
    return uy, ux


def paste_glimpse(glimpse: jnp.ndarray, coords: jnp.ndarray,
                  img_size: Sequence[int]) -> jnp.ndarray:
    """Pastes a glimpse into a zero canvas (inverse ST).

    Uses the inverse affine transform (scale 1/s, shift -t/s), matching the
    reference's ``AffineGridWarper(...).inverse()`` decoder path
    (sqair/modules.py:164-168, 367-467).

    :param glimpse: [..., gh, gw] or [..., gh, gw, C]
    :param coords: [..., 4] forward-crop ST coords
    :param img_size: (H, W)
    :return: [..., H, W(, C)]
    """
    H, W = img_size
    has_c = glimpse.ndim == coords.ndim - 1 + 3
    if not has_c:
        glimpse = glimpse[..., None]
    gh, gw = glimpse.shape[-3], glimpse.shape[-2]
    sx, sy, tx, ty = _split_coords(coords)
    inv_sx, inv_tx = 1.0 / sx, -tx / sx
    inv_sy, inv_ty = 1.0 / sy, -ty / sy
    uy = _interp_matrix(inv_sy, inv_ty, gh, H)  # [..., H, gh]
    ux = _interp_matrix(inv_sx, inv_tx, gw, W)  # [..., W, gw]
    out = jnp.einsum("...hi,...ijc,...wj->...hwc", uy, glimpse, ux,
                     precision=jax.lax.Precision.HIGHEST)
    if not has_c:
        out = out[..., 0]
    return out
