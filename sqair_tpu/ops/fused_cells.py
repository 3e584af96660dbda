"""Fused per-frame SSM kernels (Pallas TPU): all object slots in ONE kernel.

The SQAIR hot loop is T x (Discover + Propagate), each an inherently
*sequential* unroll over S object slots (explaining-away feeds slot k's
output into slot k+1's input).  ops/fused.py already collapses every MLP
stack / RNN cell into one kernel each, but a slot-cell still costs ~10
launches (glimpse crop, mask, encoder, transition, estimator, sampling,
steps predictor ...) and the step stays launch-bound at ~19ms.

This module fuses the ENTIRE slot unroll of a frame into one forward
kernel and one backward kernel per module:

  fused_disc_ssm  — DiscoveryCore x S  (reference sqair/sqair_modules.py:127-147
                    unrolling sqair/core.py:147-227)
  fused_prop_ssm  — PropagationCore x S (reference sqair/propagate.py:161-184
                    unrolling sqair/core.py:230-359)

Design:
  * Sampling noise (normal eps / uniform u) is generated OUTSIDE by XLA and
    passed in, so the kernel is deterministic given inputs and the VJP is a
    plain reparametrisation gradient.  (The reference samples inside the
    cell; parity is distributional, SURVEY §7.)
  * Slot-major layout [S, B, d] inside the kernel (slot index hits the
    untiled leading dim; Mosaic cannot reshape/index across the tiled last
    two dims).  The public wrappers transpose to the framework's [B, S, d].
  * All residuals the backward needs are packed into ONE [S, B, R] blob by
    last-dim slice writes, so a time-scan stores a single extra tensor per
    frame instead of dozens (residual-stacking DUS was measured to dominate
    remat="none" with per-op kernels, docs/NOTES.md).
  * Pure-jnp reference implementations (``disc_ssm_ref`` / ``prop_ssm_ref``)
    define the exact math; kernels are validated against them (value and
    jax.grad) in tests/test_fused_cells.py via pallas interpret mode.

Weight pytrees are raw arrays extracted from the bound flax modules (see
models/discover.py / models/propagate.py fused paths).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

MIN_SCALE = 1e-4  # stn.SCALE_EPS
MIN_STD = 1e-2


# --------------------------------------------------------------------------
# shared math (runs both in-kernel and in the jnp reference)
# --------------------------------------------------------------------------
def _softplus(x):
    return jnp.maximum(x, 0.0) + jnp.log(1.0 + jnp.exp(-jnp.abs(x)))


def _dsoftplus_from_out(y, min_std):
    """softplus'(x) recovered from y = softplus(x) + min_std."""
    return 1.0 - jnp.exp(-(y - min_std))


def _elu(z):
    return jnp.where(z > 0, z, jnp.exp(jnp.minimum(z, 0.0)) - 1.0)


def _delu(a):
    return jnp.where(a > 0, 1.0, a + 1.0)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _bmm(a, b):
    """Batched [B, m, k] x [B, k, n] matmul for the bilinear crop.

    DEFAULT precision (single bf16 pass; Mosaic lowers only DEFAULT and
    HIGHEST) instead of the jnp ST path's HIGHEST: 6x fewer MXU passes and
    far smaller temporaries.  Lossless end-to-end on the encoder side: the
    glimpse's only consumer is the encoder's first matmul, which itself
    runs at DEFAULT and therefore rounds its inputs to bf16 anyway.  (The
    DECODER paste, where the Gaussian likelihood pays nats for canvas
    noise, stays HIGHEST in ops/stn.py.)"""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _interp_from_logits(wl, H, W, gh, gw):
    """where logits -> (coords pieces, y/x interpolation matrices).

    Matches stn.to_coords + stn.extract_glimpse: s = sigmoid, t = tanh,
    scale clipped >= MIN_SCALE with a straight-through gradient.
    """
    s = jax.nn.sigmoid(wl[:, :2])
    t = jnp.tanh(wl[:, 2:])
    sx, sy = s[:, 0], s[:, 1]
    tx, ty = t[:, 0], t[:, 1]
    # straight-through clip (ops/math.clip_preserve): forward max, bwd id —
    # inside a kernel (never differentiated) this reduces to the plain max
    sxc = sx + jax.lax.stop_gradient(jnp.maximum(sx, MIN_SCALE) - sx)
    syc = sy + jax.lax.stop_gradient(jnp.maximum(sy, MIN_SCALE) - sy)

    def interp(scale, shift, src, dst):
        ti = jax.lax.broadcasted_iota(jnp.int32, (dst, 1), 0)[:, 0]
        ti = ti.astype(jnp.float32) * (2.0 / (dst - 1)) - 1.0
        u = (scale[:, None] * ti[None, :] + shift[:, None] + 1.0) * (src - 1) / 2.0
        p = jax.lax.broadcasted_iota(jnp.int32, (1, 1, src), 2).astype(jnp.float32)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(u[:, :, None] - p))
        return w, u, ti

    wy, uy, ti_y = interp(syc, ty, H, gh)  # [B, gh, H]
    wx, ux, ti_x = interp(sxc, tx, W, gw)  # [B, gw, W]
    return (sx, sy, tx, ty), (wy, uy, ti_y), (wx, ux, ti_x)


def _dinterp(dw, w_mat, u, src, ti):
    """Backward of w = relu(1 - |u - p|) to (dscale, dshift) of the warp."""
    p = jax.lax.broadcasted_iota(jnp.int32, (1, 1, src), 2).astype(jnp.float32)
    du_dp = jnp.where(w_mat > 0.0, -jnp.sign(u[:, :, None] - p), 0.0)
    du = jnp.sum(dw * du_dp, axis=2)  # [B, dst]
    dscale = jnp.sum(du * ti[None, :], axis=1) * (src - 1) / 2.0
    dshift = jnp.sum(du, axis=1) * (src - 1) / 2.0
    return dscale, dshift


def _dwl_from_coords(dsxc, dsyc, dtx, dty, sx, sy, tx, ty):
    """clip_preserve (straight-through) then to_coords backward -> dwl."""
    return jnp.stack(
        [
            dsxc * sx * (1.0 - sx),
            dsyc * sy * (1.0 - sy),
            dtx * (1.0 - tx * tx),
            dty * (1.0 - ty * ty),
        ],
        axis=-1,
    )


def _mlp_fwd(x, layers, acts):
    """Returns (output, [post-activations per layer])."""
    saves = []
    a = x
    for (w, b), act in zip(layers, acts):
        z = _dot(a, w) + b[None, :]
        a = _elu(z) if act == "elu" else (jax.nn.sigmoid(z) if act == "sigmoid" else z)
        saves.append(a)
    return a, saves


def _mlp_bwd(x, layers, acts, saves, g):
    """Returns (dx, [(dw, db) per layer]).  saves = post-activations."""
    grads = [None] * len(layers)
    for i in range(len(layers) - 1, -1, -1):
        a_i = saves[i]
        if acts[i] == "elu":
            dz = g * _delu(a_i)
        elif acts[i] == "sigmoid":
            dz = g * a_i * (1.0 - a_i)
        else:
            dz = g
        a_prev = x if i == 0 else saves[i - 1]
        grads[i] = (_dot(a_prev.T, dz), jnp.sum(dz, axis=0))
        g = _dot(dz, layers[i][0].T)
    return g, grads


# --------------------------------------------------------------------------
# parameter containers (plain tuples so they are jit/pytree friendly)
# --------------------------------------------------------------------------
class DiscParams(NamedTuple):
    enc_in: Tuple  # ((W,b), (W,b)) input encoder, elu elu
    rnn: Tuple  # (W, U, b) VanillaRNN
    stp: Tuple  # ((W,b),(W,b),(W,b)) transform estimator, elu elu id
    stp_offset: jnp.ndarray  # scalar scale offset (transform_var_bias)
    ge_enc: Tuple  # ((W,b),(W,b)) glimpse encoder, elu elu
    ge_head: Tuple  # (W, b) Gaussian head
    sp: Tuple  # ((W,b),(W,b)) steps predictor, elu id


class PropParams(NamedTuple):
    wb: Tuple  # ((W,b),(W,b)) where-bias MLP, elu id
    mask: Tuple  # ((W,b),(W,b)) glimpse mask MLP, elu sigmoid
    ge_enc: Tuple  # shared glimpse encoder
    ge_head: Tuple
    rnn: Tuple  # (W, U, b)
    stp: Tuple  # ((W,b),(W,b),(W,b))
    stp_offset: jnp.ndarray
    tril: jnp.ndarray  # [4,4] AffineDiagNormal lower-tri (incl. diag)
    gru: Tuple  # (Wg, Ug, bg, Wc, Uc, bc) temporal GRU
    td: Tuple  # (W, b) temporal what-distrib Dense
    gates: Tuple  # (W, b) 3-gate sigmoid head
    sp: Tuple  # ((W,b),(W,b)) steps predictor


DISC_OUT_FIELDS = (
    "what", "what_loc", "what_scale", "where", "where_loc", "where_scale",
    "presence_prob", "presence", "presence_logit",
)

PROP_OUT_FIELDS = DISC_OUT_FIELDS + ("what_sample", "where_sample")


# --------------------------------------------------------------------------
# jnp reference: discovery frame (ground truth for the kernel)
# --------------------------------------------------------------------------
def disc_ssm_ref(img, img_flat, conditioning, h0, eps_where, eps_what, u_pres,
                 p: DiscParams, glimpse_size) -> Dict[str, jnp.ndarray]:
    """Pure-jnp S-slot discovery unroll; identical math to
    DiscoveryCore/Discover._discover (models/core.py:42-115).

    :param img: [B, H, W]; img_flat: [B, H*W]
    :param conditioning: [B, C]
    :param h0: [B, U] initial transition state (tiled trainable h0)
    :param eps_where/eps_what/u_pres: [S, B, d] noise
    :return: dict of [S, B, d] stacked outputs
    """
    S = eps_where.shape[0]
    gh, gw = glimpse_size
    H, W = img.shape[1], img.shape[2]
    B = img.shape[0]

    encoded, _ = _mlp_fwd(img_flat, p.enc_in, ("elu", "elu"))

    what = jnp.zeros((B, eps_what.shape[-1]))
    where = jnp.zeros((B, 4))
    pres = jnp.ones((B, 1))
    h = h0

    outs = {k: [] for k in DISC_OUT_FIELDS}
    for k in range(S):
        rnn_in = jnp.concatenate([encoded, conditioning, what, where, pres], -1)
        h = jnp.tanh(_dot(rnn_in, p.rnn[0]) + _dot(h, p.rnn[1]) + p.rnn[2][None])

        stp8, _ = _mlp_fwd(h, p.stp, ("elu", "elu", "id"))
        wloc = stp8[:, :4]
        wscale = _softplus(stp8[:, 4:] + p.stp_offset) + MIN_STD
        where = wloc + wscale * eps_where[k]

        _, (wy, _, _), (wx, _, _) = _interp_from_logits(where, H, W, gh, gw)
        g0 = _bmm(wy, _bmm(img, jnp.swapaxes(wx, 1, 2)))  # [B, gh, gw]
        gflat = g0.reshape((B, gh * gw))
        eh, _ = _mlp_fwd(gflat, p.ge_enc, ("elu", "elu"))
        hp = _dot(eh, p.ge_head[0]) + p.ge_head[1][None]
        n_what = hp.shape[-1] // 2
        gloc = hp[:, :n_what]
        gscale = _softplus(hp[:, n_what:]) + MIN_STD
        what = gloc + gscale * eps_what[k]

        spfeat = jnp.concatenate([h, what], -1)
        logit_raw, _ = _mlp_fwd(spfeat, p.sp, ("elu", "id"))
        logit = pres * logit_raw + (pres - 1.0) * 88.0
        prob = jax.nn.sigmoid(logit)
        psamp = (u_pres[k] < prob).astype(jnp.float32)
        new_pres = psamp * pres

        outs["what"].append(what)
        outs["what_loc"].append(gloc)
        outs["what_scale"].append(gscale)
        outs["where"].append(where)
        outs["where_loc"].append(wloc)
        outs["where_scale"].append(wscale)
        outs["presence_prob"].append(prob)
        outs["presence"].append(new_pres)
        outs["presence_logit"].append(logit)
        pres = new_pres

    return {k: jnp.stack(v, 0) for k, v in outs.items()}


# --------------------------------------------------------------------------
# jnp reference: propagation frame
# --------------------------------------------------------------------------
def prop_ssm_ref(img, z_tm1, temporal_h, h0, eps_where, eps_what, u_pres,
                 p: PropParams, glimpse_size) -> Dict[str, jnp.ndarray]:
    """Pure-jnp S-slot propagation unroll; identical math to
    PropagationCore/Propagate._ssm (models/core.py:118-234).

    :param z_tm1: (what_tm1, where_tm1, pres_tm1, pres_logit_tm1), [S, B, d]
    :param temporal_h: [S, B, U] per-slot temporal GRU state
    :param h0: [B, U] initial transition state
    :return: dict of [S, B, d] outputs + "temporal_h" [S, B, U]
    """
    what_tm1, where_tm1, pres_tm1, _ = z_tm1
    S = what_tm1.shape[0]
    gh, gw = glimpse_size
    H, W = img.shape[1], img.shape[2]
    B = img.shape[0]
    n_what = what_tm1.shape[-1]

    sw = jnp.zeros((B, n_what))
    swh = jnp.zeros((B, 4))
    sp_ = jnp.zeros((B, 1))
    h = h0

    outs = {k: [] for k in PROP_OUT_FIELDS}
    outs["temporal_h"] = []
    for k in range(S):
        wt1, wh1, p1 = what_tm1[k], where_tm1[k], pres_tm1[k]
        ht = temporal_h[k]

        # where-bias glimpse location (core.py:291-293)
        wb_out, _ = _mlp_fwd(ht, p.wb, ("elu", "id"))
        gwl = wh1 + wb_out * 0.1

        # glimpse mask depends only on the temporal feature: one per slot
        mask, _ = _mlp_fwd(ht, p.mask, ("elu", "sigmoid"))  # [B, gh*gw]

        def glimpse_encode(wl):
            _, (wy, _, _), (wx, _, _) = _interp_from_logits(wl, H, W, gh, gw)
            g0 = _bmm(wy, _bmm(img, jnp.swapaxes(wx, 1, 2)))
            gm = g0.reshape((B, gh * gw)) * mask
            eh, _ = _mlp_fwd(gm, p.ge_enc, ("elu", "elu"))
            hp = _dot(eh, p.ge_head[0]) + p.ge_head[1][None]
            return hp[:, :n_what], _softplus(hp[:, n_what:]) + MIN_STD

        g1loc, _ = glimpse_encode(gwl)

        rnn_in = jnp.concatenate([g1loc, sw, swh, sp_, wt1, wh1, p1, ht], -1)
        h = jnp.tanh(_dot(rnn_in, p.rnn[0]) + _dot(h, p.rnn[1]) + p.rnn[2][None])

        # relative where update, full-cov posterior (core.py:321-333)
        stp_in = jnp.concatenate([h, wh1, ht], -1)
        stp8, _ = _mlp_fwd(stp_in, p.stp, ("elu", "elu", "id"))
        wloc = wh1 + stp8[:, :4]
        wscale = _softplus(stp8[:, 4:] + p.stp_offset - 1.0) + MIN_STD
        # AffineDiagNormal sample: loc + scale * (tril @ eps + eps)
        where = wloc + wscale * (
            _dot(eps_where[k], p.tril.T) + eps_where[k]
        )

        g2loc, g2scale = glimpse_encode(where)

        # temporal GRU + gated what fusion (core.py:335-359)
        tin = jnp.concatenate([h, where, g2loc, g2scale], -1)
        zr = jax.nn.sigmoid(_dot(tin, p.gru[0]) + _dot(ht, p.gru[1]) + p.gru[2][None])
        U = ht.shape[-1]
        z_g, r_g = zr[:, :U], zr[:, U:]
        c = jnp.tanh(_dot(tin, p.gru[3]) + _dot(r_g * ht, p.gru[4]) + p.gru[5][None])
        ht_new = (1.0 - z_g) * ht + z_g * c

        td = _dot(ht_new, p.td[0]) + p.td[1][None]
        tloc = td[:, :n_what]
        tscale = _softplus(td[:, n_what:]) + MIN_STD

        gates = jax.nn.sigmoid(_dot(ht_new, p.gates[0]) + p.gates[1][None]) * 0.9999
        f_g, i_g, t_g = (gates[:, :n_what], gates[:, n_what:2 * n_what],
                         gates[:, 2 * n_what:])
        what_loc = f_g * wt1 + (1.0 - i_g) * g2loc + (1.0 - t_g) * tloc
        what_scale = (1.0 - i_g) * g2scale + (1.0 - t_g) * tscale
        what = what_loc + what_scale * eps_what[k]

        # presence (steps predictor uses the OLD temporal feature,
        # core.py:311-313 + the `temporal_state` binding at 284)
        spfeat = jnp.concatenate([h, ht, what], -1)
        logit_raw, _ = _mlp_fwd(spfeat, p.sp, ("elu", "id"))
        logit = p1 * logit_raw + (p1 - 1.0) * 88.0
        prob = jax.nn.sigmoid(logit)
        psamp = (u_pres[k] < prob).astype(jnp.float32)
        pres = psamp * p1

        outs["what"].append(what)
        outs["what_sample"].append(what)
        outs["what_loc"].append(what_loc)
        outs["what_scale"].append(what_scale)
        outs["where"].append(where)
        outs["where_sample"].append(where)
        outs["where_loc"].append(wloc)
        outs["where_scale"].append(wscale)
        outs["presence_prob"].append(prob)
        outs["presence"].append(pres)
        outs["presence_logit"].append(logit)
        outs["temporal_h"].append(ht_new)

        sw, swh, sp_ = what, where, pres

    return {k: jnp.stack(v, 0) for k, v in outs.items()}


# ==========================================================================
# Pallas kernels — discovery frame
# ==========================================================================
# Residual blob layout (per slot), offsets into the last dim of [S, B, R]:
#   h       [U]        rnn state after update
#   a1, a2  [U, U]     transform-estimator post-activations
#   e1, e2  [U, U]     glimpse-encoder post-activations
#   s1      [SP]       steps-predictor hidden
#   lraw    [1]        pre-saturation presence logit
#   gflat   [gh*gw]    unmasked flat glimpse
def _offsets_128(names):
    """Field offsets padded to 128-lane alignment (unaligned VMEM stores
    are read-modify-write on TPU and dominated the first kernel version)."""
    off, out = 0, {}
    for n, d in names:
        out[n] = (off, off + d)
        off += (d + 127) // 128 * 128
    return out, off


def _disc_offsets(U, SP, gh, gw):
    return _offsets_128((("h", U), ("a1", U), ("a2", U), ("e1", U),
                         ("e2", U), ("s1", SP), ("lraw", 1)))


def _glimpse_layer1(g0, we1_3d, be1, mask=None):
    """First glimpse-encoder layer without flattening: contracts the
    [B, gh, gw] glimpse row-by-row against We1 reshaped [gh, gw, d1]
    (Mosaic cannot reshape across the tiled last two dims)."""
    gh, gw = g0.shape[1], g0.shape[2]
    z1 = be1[None, :]
    for r in range(gh):
        row = g0[:, r, :]
        if mask is not None:
            row = row * mask[:, r * gw:(r + 1) * gw]
        z1 = z1 + _dot(row, we1_3d[r])
    return _elu(z1)


def _glimpse_layer1_bwd(g0, we1_3d, dz1, mask=None):
    """Backward of _glimpse_layer1: returns (dwe1 rows list, dg0, dmask)."""
    gh, gw = g0.shape[1], g0.shape[2]
    dwe1_rows, dg0_rows = [], []
    dmask_cols = [] if mask is not None else None
    for r in range(gh):
        row = g0[:, r, :]
        mrow = None if mask is None else mask[:, r * gw:(r + 1) * gw]
        mrowed = row if mrow is None else row * mrow
        dwe1_rows.append(_dot(mrowed.T, dz1))
        drow = _dot(dz1, we1_3d[r].T)
        if mrow is not None:
            dmask_cols.append(drow * row)
            drow = drow * mrow
        dg0_rows.append(drow)
    dg0 = jnp.stack(dg0_rows, axis=1)
    dmask = None if dmask_cols is None else jnp.concatenate(dmask_cols, axis=-1)
    return dwe1_rows, dg0, dmask


def _disc_fwd_kernel(dims, img_ref, imgf_ref, cond_ref, h0_ref,
                     epsw_ref, epsx_ref, u_ref,
                     wi1_ref, bi1_ref, wi2_ref, bi2_ref,
                     rw_ref, ru_ref, rb_ref,
                     s1w_ref, s1b_ref, s2w_ref, s2b_ref, s3w_ref, s3b_ref,
                     we1_ref, be1_ref, we2_ref, be2_ref, wh_ref, bh_ref,
                     sp1w_ref, sp1b_ref, sp2w_ref, sp2b_ref,
                     # outputs
                     what_ref, whatloc_ref, whatsc_ref,
                     where_ref, whereloc_ref, wheresc_ref,
                     prob_ref, pres_ref, logit_ref,
                     res_ref, g0s_ref, fres_ref):
    S, gh, gw, n_what, U, SP = dims
    img = img_ref[...]
    B, H, W = img.shape
    offs, _ = _disc_offsets(U, SP, gh, gw)

    # input encoder (hoisted out of the slot loop)
    ench1 = _elu(_dot(imgf_ref[...], wi1_ref[...]) + bi1_ref[...][None, :])
    encoded = _elu(_dot(ench1, wi2_ref[...]) + bi2_ref[...][None, :])
    fres_ref[:, :U] = ench1
    fres_ref[:, U:] = encoded
    cond = cond_ref[...]
    we1_3d = we1_ref[...]

    what = jnp.zeros((B, n_what), jnp.float32)
    where = jnp.zeros((B, 4), jnp.float32)
    pres = jnp.ones((B, 1), jnp.float32)
    h = h0_ref[...]

    for k in range(S):
        rnn_in = jnp.concatenate([encoded, cond, what, where, pres], -1)
        h = jnp.tanh(_dot(rnn_in, rw_ref[...]) + _dot(h, ru_ref[...])
                     + rb_ref[...][None, :])
        res_ref[k, :, offs["h"][0]:offs["h"][1]] = h

        a1 = _elu(_dot(h, s1w_ref[...]) + s1b_ref[...][None, :])
        a2 = _elu(_dot(a1, s2w_ref[...]) + s2b_ref[...][None, :])
        stp8 = _dot(a2, s3w_ref[...]) + s3b_ref[...][None, :]
        res_ref[k, :, offs["a1"][0]:offs["a1"][1]] = a1
        res_ref[k, :, offs["a2"][0]:offs["a2"][1]] = a2
        wloc = stp8[:, :4]
        wscale = _softplus(stp8[:, 4:]) + MIN_STD  # offset pre-folded into b3
        where = wloc + wscale * epsw_ref[k]

        _, (wy, _, _), (wx, _, _) = _interp_from_logits(where, H, W, gh, gw)
        g0 = _bmm(wy, _bmm(img, jnp.swapaxes(wx, 1, 2)))
        g0s_ref[k] = g0

        e1 = _glimpse_layer1(g0, we1_3d, be1_ref[...])
        e2 = _elu(_dot(e1, we2_ref[...]) + be2_ref[...][None, :])
        res_ref[k, :, offs["e1"][0]:offs["e1"][1]] = e1
        res_ref[k, :, offs["e2"][0]:offs["e2"][1]] = e2
        hp = _dot(e2, wh_ref[...]) + bh_ref[...][None, :]
        gloc = hp[:, :n_what]
        gscale = _softplus(hp[:, n_what:]) + MIN_STD
        what = gloc + gscale * epsx_ref[k]

        spfeat = jnp.concatenate([h, what], -1)
        sp1 = _elu(_dot(spfeat, sp1w_ref[...]) + sp1b_ref[...][None, :])
        lraw = _dot(sp1, sp2w_ref[...]) + sp2b_ref[...][None, :]
        res_ref[k, :, offs["s1"][0]:offs["s1"][1]] = sp1
        res_ref[k, :, offs["lraw"][0]:offs["lraw"][1]] = lraw
        logit = pres * lraw + (pres - 1.0) * 88.0
        prob = jax.nn.sigmoid(logit)
        psamp = (u_ref[k] < prob).astype(jnp.float32)
        new_pres = psamp * pres

        what_ref[k] = what
        whatloc_ref[k] = gloc
        whatsc_ref[k] = gscale
        where_ref[k] = where
        whereloc_ref[k] = wloc
        wheresc_ref[k] = wscale
        prob_ref[k] = prob
        pres_ref[k] = new_pres
        logit_ref[k] = logit
        pres = new_pres


def _disc_bwd_kernel(dims, img_ref, imgf_ref, cond_ref, h0_ref,
                     epsw_ref, epsx_ref, u_ref,
                     wi1_ref, wi2_ref, rw_ref, ru_ref,
                     s1w_ref, s2w_ref, s3w_ref,
                     we1_ref, we2_ref, wh_ref, sp1w_ref, sp2w_ref,
                     # saved primal outputs + residuals
                     what_ref, whatsc_ref, where_ref, wheresc_ref,
                     prob_ref, pres_ref,
                     res_ref, g0s_ref, fres_ref,
                     # cotangents
                     dwhat_ref, dwhatloc_ref, dwhatsc_ref,
                     dwhere_ref, dwhereloc_ref, dwheresc_ref,
                     dprob_ref, dpres_ref, dlogit_ref,
                     # outputs: input grads then param grads
                     dcond_ref, dh0_ref,
                     dwi1_ref, dbi1_ref, dwi2_ref, dbi2_ref,
                     drw_ref, dru_ref, drb_ref,
                     ds1w_ref, ds1b_ref, ds2w_ref, ds2b_ref, ds3w_ref, ds3b_ref,
                     dwe1_ref, dbe1_ref, dwe2_ref, dbe2_ref, dwh_ref, dbh_ref,
                     dsp1w_ref, dsp1b_ref, dsp2w_ref, dsp2b_ref):
    S, gh, gw, n_what, U, SP = dims
    img = img_ref[...]
    B, H, W = img.shape
    offs, _ = _disc_offsets(U, SP, gh, gw)
    we1_3d = we1_ref[...]

    # param-grad accumulators live as values (the slot loop is a static
    # python unroll), written to the output refs once at the end
    acc = {}

    def add(name, val):
        acc[name] = val if name not in acc else acc[name] + val

    ench1 = fres_ref[:, :U]
    encoded = fres_ref[:, U:]

    d_enc = jnp.zeros((B, U), jnp.float32)
    d_cond = jnp.zeros_like(cond_ref[...])
    d_what_c = jnp.zeros((B, n_what), jnp.float32)
    d_where_c = jnp.zeros((B, 4), jnp.float32)
    d_pres_c = jnp.zeros((B, 1), jnp.float32)
    d_h_c = jnp.zeros((B, U), jnp.float32)

    for k in range(S - 1, -1, -1):
        h = res_ref[k, :, offs["h"][0]:offs["h"][1]]
        a1 = res_ref[k, :, offs["a1"][0]:offs["a1"][1]]
        a2 = res_ref[k, :, offs["a2"][0]:offs["a2"][1]]
        e1 = res_ref[k, :, offs["e1"][0]:offs["e1"][1]]
        e2 = res_ref[k, :, offs["e2"][0]:offs["e2"][1]]
        sp1 = res_ref[k, :, offs["s1"][0]:offs["s1"][1]]
        lraw = res_ref[k, :, offs["lraw"][0]:offs["lraw"][1]]
        g0 = g0s_ref[k]
        what = what_ref[k]
        gscale = whatsc_ref[k]
        where = where_ref[k]
        wscale = wheresc_ref[k]
        prob = prob_ref[k]

        if k > 0:
            pres_prev = pres_ref[k - 1]
            what_prev = what_ref[k - 1]
            where_prev = where_ref[k - 1]
        else:
            pres_prev = jnp.ones((B, 1), jnp.float32)
            what_prev = jnp.zeros((B, n_what), jnp.float32)
            where_prev = jnp.zeros((B, 4), jnp.float32)

        # presence chain
        d_pres_tot = dpres_ref[k] + d_pres_c
        dlogit = dlogit_ref[k] + dprob_ref[k] * prob * (1.0 - prob)
        dlraw = dlogit * pres_prev
        psamp = (u_ref[k] < prob).astype(jnp.float32)

        # steps predictor bwd
        dsp1z = _dot(dlraw, sp2w_ref[...].T) * _delu(sp1)
        spfeat = jnp.concatenate([h, what], -1)
        add("dsp2w", _dot(sp1.T, dlraw))
        add("dsp2b", jnp.sum(dlraw, axis=0))
        add("dsp1w", _dot(spfeat.T, dsp1z))
        add("dsp1b", jnp.sum(dsp1z, axis=0))
        dspfeat = _dot(dsp1z, sp1w_ref[...].T)
        dh_acc = dspfeat[:, :U]
        dwhat_sp = dspfeat[:, U:]

        # what sampling + glimpse head/encoder bwd
        d_what_tot = dwhat_ref[k] + d_what_c + dwhat_sp
        dgloc = d_what_tot + dwhatloc_ref[k]
        dgscale = d_what_tot * epsx_ref[k] + dwhatsc_ref[k]
        dhp = jnp.concatenate(
            [dgloc, dgscale * _dsoftplus_from_out(gscale, MIN_STD)], -1
        )
        add("dwh", _dot(e2.T, dhp))
        add("dbh", jnp.sum(dhp, axis=0))
        de2 = _dot(dhp, wh_ref[...].T)
        dz2 = de2 * _delu(e2)
        add("dwe2", _dot(e1.T, dz2))
        add("dbe2", jnp.sum(dz2, axis=0))
        de1 = _dot(dz2, we2_ref[...].T)
        dz1 = de1 * _delu(e1)
        dwe1_rows, dg0, _ = _glimpse_layer1_bwd(g0, we1_3d, dz1)
        add("dwe1", jnp.stack(dwe1_rows, axis=0))
        add("dbe1", jnp.sum(dz1, axis=0))

        # crop bwd (recompute interp matrices from the saved where)
        (sx, sy, tx, ty), (wy, uy, ti_y), (wx, ux, ti_x) = _interp_from_logits(
            where, H, W, gh, gw
        )
        A = _bmm(img, jnp.swapaxes(wx, 1, 2))  # [B, H, gw]
        dwy = _bmm(dg0, jnp.swapaxes(A, 1, 2))
        dA = _bmm(jnp.swapaxes(wy, 1, 2), dg0)
        dwx = _bmm(jnp.swapaxes(dA, 1, 2), img)
        dsyc, dty = _dinterp(dwy, wy, uy, H, ti_y)
        dsxc, dtx = _dinterp(dwx, wx, ux, W, ti_x)
        dwl_crop = _dwl_from_coords(dsxc, dsyc, dtx, dty, sx, sy, tx, ty)

        # where sampling + transform estimator bwd
        d_where_tot = dwhere_ref[k] + d_where_c + dwl_crop
        dwloc = d_where_tot + dwhereloc_ref[k]
        dwscale = d_where_tot * epsw_ref[k] + dwheresc_ref[k]
        dstp8 = jnp.concatenate(
            [dwloc, dwscale * _dsoftplus_from_out(wscale, MIN_STD)], -1
        )
        add("ds3w", _dot(a2.T, dstp8))
        add("ds3b", jnp.sum(dstp8, axis=0))
        da2 = _dot(dstp8, s3w_ref[...].T)
        dz_a2 = da2 * _delu(a2)
        add("ds2w", _dot(a1.T, dz_a2))
        add("ds2b", jnp.sum(dz_a2, axis=0))
        da1 = _dot(dz_a2, s2w_ref[...].T)
        dz_a1 = da1 * _delu(a1)
        add("ds1w", _dot(h.T, dz_a1))
        add("ds1b", jnp.sum(dz_a1, axis=0))
        dh_acc += _dot(dz_a1, s1w_ref[...].T)

        # transition rnn bwd
        dh_tot = dh_acc + d_h_c
        dz = dh_tot * (1.0 - h * h)
        rnn_in = jnp.concatenate(
            [encoded, cond_ref[...], what_prev, where_prev, pres_prev], -1
        )
        h_prev = (res_ref[k - 1, :, offs["h"][0]:offs["h"][1]]
                  if k > 0 else h0_ref[...])
        add("drw", _dot(rnn_in.T, dz))
        add("dru", _dot(h_prev.T, dz))
        add("drb", jnp.sum(dz, axis=0))
        drnn_in = _dot(dz, rw_ref[...].T)
        d_h_c = _dot(dz, ru_ref[...].T)

        C = d_cond.shape[-1]
        d_enc += drnn_in[:, :U]
        d_cond += drnn_in[:, U:U + C]
        d_what_c = drnn_in[:, U + C:U + C + n_what]
        d_where_c = drnn_in[:, U + C + n_what:U + C + n_what + 4]
        d_pres_in = drnn_in[:, U + C + n_what + 4:]

        d_pres_c = d_pres_tot * psamp + dlogit * (lraw + 88.0) + d_pres_in

    # input encoder bwd
    dz2 = d_enc * _delu(encoded)
    dwi2_ref[...] = _dot(ench1.T, dz2)
    dbi2_ref[...] = jnp.sum(dz2, axis=0)
    dz1 = _dot(dz2, wi2_ref[...].T) * _delu(ench1)
    dwi1_ref[...] = _dot(imgf_ref[...].T, dz1)
    dbi1_ref[...] = jnp.sum(dz1, axis=0)

    dcond_ref[...] = d_cond
    dh0_ref[...] = d_h_c

    for name, ref in (
        ("drw", drw_ref), ("dru", dru_ref), ("drb", drb_ref),
        ("ds1w", ds1w_ref), ("ds1b", ds1b_ref), ("ds2w", ds2w_ref),
        ("ds2b", ds2b_ref), ("ds3w", ds3w_ref), ("ds3b", ds3b_ref),
        ("dwe1", dwe1_ref), ("dbe1", dbe1_ref), ("dwe2", dwe2_ref),
        ("dbe2", dbe2_ref), ("dwh", dwh_ref), ("dbh", dbh_ref),
        ("dsp1w", dsp1w_ref), ("dsp1b", dsp1b_ref),
        ("dsp2w", dsp2w_ref), ("dsp2b", dsp2b_ref),
    ):
        ref[...] = acc[name]


# --------------------------------------------------------------------------
# discovery: pallas_call plumbing + custom VJP
# --------------------------------------------------------------------------
def _vmem_specs(n):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return [pl.BlockSpec(memory_space=pltpu.VMEM)] * n


def _cell_compiler_params():
    from jax.experimental.pallas import tpu as pltpu

    # v5e has 128MB of physical VMEM; the prop backward peaks ~121MB at the
    # paper config (unrolled slots + HIGHEST-precision crop backward)
    return pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024)


_INTERPRET = False  # set True in tests to run kernels on CPU


def _disc_weights_flat(p: DiscParams):
    """Kernel argument order; stp offset must be pre-folded into the last
    stp bias by the caller (fused_disc_ssm)."""
    (wi1, bi1), (wi2, bi2) = p.enc_in
    rw, ru, rb = p.rnn
    (s1w, s1b), (s2w, s2b), (s3w, s3b) = p.stp
    (we1, be1), (we2, be2) = p.ge_enc
    wh, bh = p.ge_head
    (sp1w, sp1b), (sp2w, sp2b) = p.sp
    return (wi1, bi1, wi2, bi2, rw, ru, rb, s1w, s1b, s2w, s2b, s3w, s3b,
            we1, be1, we2, be2, wh, bh, sp1w, sp1b, sp2w, sp2b)


def _disc_run_fwd(img, imgf, cond, h0b, epsw, epsx, u, weights, dims):
    from jax.experimental import pallas as pl

    S, gh, gw, n_what, U, SP = dims
    B = img.shape[0]
    _, R = _disc_offsets(U, SP, gh, gw)
    f32 = jnp.float32
    outs = [
        jax.ShapeDtypeStruct((S, B, n_what), f32),  # what
        jax.ShapeDtypeStruct((S, B, n_what), f32),  # what_loc
        jax.ShapeDtypeStruct((S, B, n_what), f32),  # what_scale
        jax.ShapeDtypeStruct((S, B, 4), f32),  # where
        jax.ShapeDtypeStruct((S, B, 4), f32),  # where_loc
        jax.ShapeDtypeStruct((S, B, 4), f32),  # where_scale
        jax.ShapeDtypeStruct((S, B, 1), f32),  # presence_prob
        jax.ShapeDtypeStruct((S, B, 1), f32),  # presence
        jax.ShapeDtypeStruct((S, B, 1), f32),  # presence_logit
        jax.ShapeDtypeStruct((S, B, R), f32),  # residual blob
        jax.ShapeDtypeStruct((S, B, gh, gw), f32),  # glimpses (residual)
        jax.ShapeDtypeStruct((B, 2 * U), f32),  # frame residuals
    ]
    args = (img, imgf, cond, h0b, epsw, epsx, u) + tuple(weights)
    return pl.pallas_call(
        functools.partial(_disc_fwd_kernel, dims),
        out_shape=outs,
        in_specs=_vmem_specs(len(args)),
        out_specs=_vmem_specs(len(outs)),
        compiler_params=_cell_compiler_params(),
        interpret=_INTERPRET,
    )(*args)


def _disc_run_bwd(img, imgf, cond, h0b, epsw, epsx, u, weights, saved_out,
                  res, g0s, fres, cots, dims):
    from jax.experimental import pallas as pl

    S, gh, gw, n_what, U, SP = dims
    B = img.shape[0]
    f32 = jnp.float32
    (wi1, bi1, wi2, bi2, rw, ru, rb, s1w, s1b, s2w, s2b, s3w, s3b,
     we1, be1, we2, be2, wh, bh, sp1w, sp1b, sp2w, sp2b) = weights
    what, whatsc, where, wheresc, prob, pres = saved_out

    args = (img, imgf, cond, h0b, epsw, epsx, u,
            wi1, wi2, rw, ru, s1w, s2w, s3w, we1, we2, wh, sp1w, sp2w,
            what, whatsc, where, wheresc, prob, pres, res, g0s, fres) + tuple(cots)
    outs = [
        jax.ShapeDtypeStruct(cond.shape, f32),  # dcond
        jax.ShapeDtypeStruct(h0b.shape, f32),  # dh0
    ] + [
        jax.ShapeDtypeStruct(w.shape, f32)
        for w in (wi1, bi1, wi2, bi2, rw, ru, rb, s1w, s1b, s2w, s2b, s3w,
                  s3b, we1, be1, we2, be2, wh, bh, sp1w, sp1b, sp2w, sp2b)
    ]
    return pl.pallas_call(
        functools.partial(_disc_bwd_kernel, dims),
        out_shape=outs,
        in_specs=_vmem_specs(len(args)),
        out_specs=_vmem_specs(len(outs)),
        compiler_params=_cell_compiler_params(),
        interpret=_INTERPRET,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _fused_disc(img, imgf, cond, h0b, eps, weights, _unused, dims):
    res = _disc_run_fwd(img, imgf, cond, h0b, *eps, weights, dims)
    return tuple(res[:9])


def _fused_disc_fwd(img, imgf, cond, h0b, eps, weights, _unused, dims):
    res = _disc_run_fwd(img, imgf, cond, h0b, *eps, weights, dims)
    primal = tuple(res[:9])
    (what, _, whatsc, where, _, wheresc, prob, pres, _) = primal
    saved = (img, imgf, cond, h0b, eps, weights,
             (what, whatsc, where, wheresc, prob, pres),
             res[9], res[10], res[11])
    return primal, saved


def _fused_disc_bwd(dims, saved, cots):
    img, imgf, cond, h0b, eps, weights, saved_out, res, g0s, fres = saved
    outs = _disc_run_bwd(img, imgf, cond, h0b, *eps, weights, saved_out,
                         res, g0s, fres, cots, dims)
    dcond, dh0 = outs[0], outs[1]
    dweights = tuple(outs[2:])
    zeros = lambda x: jnp.zeros_like(x)
    return (zeros(img), zeros(imgf), dcond, dh0,
            tuple(zeros(e) for e in eps), dweights, None)


_fused_disc.defvjp(_fused_disc_fwd, _fused_disc_bwd)


def fused_disc_ssm(img, img_flat, conditioning, h0, eps_where, eps_what,
                   u_pres, p: DiscParams, glimpse_size) -> Dict[str, jnp.ndarray]:
    """S-slot discovery unroll as one fwd + one bwd Pallas kernel.

    Same contract as ``disc_ssm_ref`` (which defines the math); noise is
    [S, B, d] slot-major, returns dict of [S, B, d].
    """
    S = eps_where.shape[0]
    gh, gw = int(glimpse_size[0]), int(glimpse_size[1])
    n_what = eps_what.shape[-1]
    U = p.rnn[1].shape[0]
    SP = p.sp[0][0].shape[1]
    B = img.shape[0]
    dims = (S, gh, gw, n_what, U, SP)

    # fold the learnable scale offset into the estimator's output bias so
    # its gradient routes through plain jnp ops outside the kernel
    (s3w, s3b) = p.stp[2]
    fold = jnp.concatenate([jnp.zeros(4), jnp.ones(4)]) * p.stp_offset
    # reshape the first glimpse-encoder weight to [gh, gw, d1] for the
    # in-kernel row contraction (outside the vjp so autodiff maps it back)
    (we1, be1), l2 = p.ge_enc
    p = p._replace(
        stp=(p.stp[0], p.stp[1], (s3w, s3b + fold)),
        ge_enc=((we1.reshape((gh, gw, we1.shape[1])), be1), l2),
    )
    h0b = jnp.broadcast_to(h0, (B, U)).astype(jnp.float32)

    eps = (eps_where, eps_what, u_pres)
    out = _fused_disc(img, img_flat, conditioning, h0b, eps,
                      _disc_weights_flat(p), None, dims)
    return dict(zip(DISC_OUT_FIELDS, out))


# ==========================================================================
# Pallas kernels — propagation frame
# ==========================================================================
# Residual blob layout (per slot); see _disc_offsets for the scheme.
def _prop_offsets(U, SP, NW, WB, MH, GHW):
    return _offsets_128((
        ("wbh", WB), ("maskh", MH), ("mask", GHW),
        ("e11", U), ("e12", U), ("g1loc", NW),
        ("h", U), ("a1", U), ("a2", U),
        ("e21", U), ("e22", U), ("g2loc", NW), ("g2sc", NW),
        ("zr", 2 * U), ("c", U), ("tloc", NW), ("tsc", NW),
        ("gates", 3 * NW), ("s1", SP), ("lraw", 1), ("gwl", 4),
    ))


def _prop_fwd_kernel(dims, img_ref, wt1_ref, wh1_ref, p1_ref, th_ref, h0_ref,
                     epsw_ref, epsx_ref, u_ref,
                     wb1w_ref, wb1b_ref, wb2w_ref, wb2b_ref,
                     m1w_ref, m1b_ref, m2w_ref, m2b_ref,
                     we1_ref, be1_ref, we2_ref, be2_ref, wh_ref, bh_ref,
                     rw_ref, ru_ref, rb_ref,
                     s1w_ref, s1b_ref, s2w_ref, s2b_ref, s3w_ref, s3b_ref,
                     tril_ref,
                     gwg_ref, gug_ref, gbg_ref, gwc_ref, guc_ref, gbc_ref,
                     tdw_ref, tdb_ref, gaw_ref, gab_ref,
                     sp1w_ref, sp1b_ref, sp2w_ref, sp2b_ref,
                     # outputs
                     what_ref, whatloc_ref, whatsc_ref,
                     where_ref, whereloc_ref, wheresc_ref,
                     prob_ref, pres_ref, logit_ref, tnew_ref,
                     res_ref):
    S, gh, gw, n_what, U, SP, WB, MH = dims
    img = img_ref[...]
    B, H, W = img.shape
    GHW = gh * gw
    offs, _ = _prop_offsets(U, SP, n_what, WB, MH, GHW)
    we1_3d = we1_ref[...]

    sw = jnp.zeros((B, n_what), jnp.float32)
    swh = jnp.zeros((B, 4), jnp.float32)
    sp_ = jnp.zeros((B, 1), jnp.float32)
    h = h0_ref[...]
    tril = tril_ref[...]

    for k in range(S):
        wt1, wh1, p1, ht = wt1_ref[k], wh1_ref[k], p1_ref[k], th_ref[k]

        # where-bias glimpse location (core.py:291-293)
        wbh = _elu(_dot(ht, wb1w_ref[...]) + wb1b_ref[...][None, :])
        gwl = wh1 + (_dot(wbh, wb2w_ref[...]) + wb2b_ref[...][None, :]) * 0.1
        res_ref[k, :, offs["wbh"][0]:offs["wbh"][1]] = wbh
        res_ref[k, :, offs["gwl"][0]:offs["gwl"][1]] = gwl

        # glimpse mask — depends only on the temporal feature; the reference
        # evaluates the same MLP twice per slot (identical values)
        maskh = _elu(_dot(ht, m1w_ref[...]) + m1b_ref[...][None, :])
        mask = jax.nn.sigmoid(_dot(maskh, m2w_ref[...]) + m2b_ref[...][None, :])
        res_ref[k, :, offs["maskh"][0]:offs["maskh"][1]] = maskh
        res_ref[k, :, offs["mask"][0]:offs["mask"][1]] = mask

        def glimpse_encode(wl, e1_off, e2_off):
            _, (wy, _, _), (wx, _, _) = _interp_from_logits(wl, H, W, gh, gw)
            g0 = _bmm(wy, _bmm(img, jnp.swapaxes(wx, 1, 2)))
            e1 = _glimpse_layer1(g0, we1_3d, be1_ref[...], mask)
            e2 = _elu(_dot(e1, we2_ref[...]) + be2_ref[...][None, :])
            res_ref[k, :, e1_off:e1_off + U] = e1
            res_ref[k, :, e2_off:e2_off + U] = e2
            return _dot(e2, wh_ref[...]) + bh_ref[...][None, :]

        hp1 = glimpse_encode(gwl, offs["e11"][0], offs["e12"][0])
        g1loc = hp1[:, :n_what]
        res_ref[k, :, offs["g1loc"][0]:offs["g1loc"][1]] = g1loc

        rnn_in = jnp.concatenate([g1loc, sw, swh, sp_, wt1, wh1, p1, ht], -1)
        h = jnp.tanh(_dot(rnn_in, rw_ref[...]) + _dot(h, ru_ref[...])
                     + rb_ref[...][None, :])
        res_ref[k, :, offs["h"][0]:offs["h"][1]] = h

        stp_in = jnp.concatenate([h, wh1, ht], -1)
        a1 = _elu(_dot(stp_in, s1w_ref[...]) + s1b_ref[...][None, :])
        a2 = _elu(_dot(a1, s2w_ref[...]) + s2b_ref[...][None, :])
        stp8 = _dot(a2, s3w_ref[...]) + s3b_ref[...][None, :]
        res_ref[k, :, offs["a1"][0]:offs["a1"][1]] = a1
        res_ref[k, :, offs["a2"][0]:offs["a2"][1]] = a2
        wloc = wh1 + stp8[:, :4]
        wscale = _softplus(stp8[:, 4:]) + MIN_STD  # offset-1 pre-folded
        epsw = epsw_ref[k]
        where = wloc + wscale * (_dot(epsw, tril.T) + epsw)

        hp2 = glimpse_encode(where, offs["e21"][0], offs["e22"][0])
        g2loc = hp2[:, :n_what]
        g2sc = _softplus(hp2[:, n_what:]) + MIN_STD
        res_ref[k, :, offs["g2loc"][0]:offs["g2loc"][1]] = g2loc
        res_ref[k, :, offs["g2sc"][0]:offs["g2sc"][1]] = g2sc

        # temporal GRU (reference snt.GRU)
        tin = jnp.concatenate([h, where, g2loc, g2sc], -1)
        zr = jax.nn.sigmoid(_dot(tin, gwg_ref[...]) + _dot(ht, gug_ref[...])
                            + gbg_ref[...][None, :])
        z_g, r_g = zr[:, :U], zr[:, U:]
        c = jnp.tanh(_dot(tin, gwc_ref[...]) + _dot(r_g * ht, guc_ref[...])
                     + gbc_ref[...][None, :])
        ht_new = (1.0 - z_g) * ht + z_g * c
        res_ref[k, :, offs["zr"][0]:offs["zr"][1]] = zr
        res_ref[k, :, offs["c"][0]:offs["c"][1]] = c

        td = _dot(ht_new, tdw_ref[...]) + tdb_ref[...][None, :]
        tloc = td[:, :n_what]
        tsc = _softplus(td[:, n_what:]) + MIN_STD
        res_ref[k, :, offs["tloc"][0]:offs["tloc"][1]] = tloc
        res_ref[k, :, offs["tsc"][0]:offs["tsc"][1]] = tsc

        gates = jax.nn.sigmoid(_dot(ht_new, gaw_ref[...])
                               + gab_ref[...][None, :]) * 0.9999
        res_ref[k, :, offs["gates"][0]:offs["gates"][1]] = gates
        f_g = gates[:, :n_what]
        i_g = gates[:, n_what:2 * n_what]
        t_g = gates[:, 2 * n_what:]
        what_loc = f_g * wt1 + (1.0 - i_g) * g2loc + (1.0 - t_g) * tloc
        what_scale = (1.0 - i_g) * g2sc + (1.0 - t_g) * tsc
        what = what_loc + what_scale * epsx_ref[k]

        # steps predictor on the OLD temporal feature (core.py:284, 311-313)
        spfeat = jnp.concatenate([h, ht, what], -1)
        sp1 = _elu(_dot(spfeat, sp1w_ref[...]) + sp1b_ref[...][None, :])
        lraw = _dot(sp1, sp2w_ref[...]) + sp2b_ref[...][None, :]
        res_ref[k, :, offs["s1"][0]:offs["s1"][1]] = sp1
        res_ref[k, :, offs["lraw"][0]:offs["lraw"][1]] = lraw
        logit = p1 * lraw + (p1 - 1.0) * 88.0
        prob = jax.nn.sigmoid(logit)
        psamp = (u_ref[k] < prob).astype(jnp.float32)
        pres = psamp * p1

        what_ref[k] = what
        whatloc_ref[k] = what_loc
        whatsc_ref[k] = what_scale
        where_ref[k] = where
        whereloc_ref[k] = wloc
        wheresc_ref[k] = wscale
        prob_ref[k] = prob
        pres_ref[k] = pres
        logit_ref[k] = logit
        tnew_ref[k] = ht_new
        sw, swh, sp_ = what, where, pres


def _prop_bwd_kernel(dims, img_ref, wt1_ref, wh1_ref, p1_ref, th_ref, h0_ref,
                     epsw_ref, epsx_ref, u_ref,
                     wb1w_ref, wb2w_ref, m1w_ref, m2w_ref,
                     we1_ref, we2_ref, wh_ref, rw_ref, ru_ref,
                     s1w_ref, s2w_ref, s3w_ref, tril_ref,
                     gwg_ref, gug_ref, gwc_ref, guc_ref,
                     tdw_ref, gaw_ref, sp1w_ref, sp2w_ref,
                     # saved primal outputs
                     what_ref, whatsc_ref, where_ref, wheresc_ref,
                     prob_ref, pres_ref, tnew_ref, res_ref,
                     # cotangents
                     dwhat_ref, dwhatloc_ref, dwhatsc_ref,
                     dwhere_ref, dwhereloc_ref, dwheresc_ref,
                     dprob_ref, dpres_ref, dlogit_ref, dtnew_ref,
                     # outputs: input grads then param grads
                     dwt1_ref, dwh1_ref, dp1_ref, dth_ref, dh0_ref,
                     dwb1w_ref, dwb1b_ref, dwb2w_ref, dwb2b_ref,
                     dm1w_ref, dm1b_ref, dm2w_ref, dm2b_ref,
                     dwe1_ref, dbe1_ref, dwe2_ref, dbe2_ref, dwh_ref, dbh_ref,
                     drw_ref, dru_ref, drb_ref,
                     ds1w_ref, ds1b_ref, ds2w_ref, ds2b_ref, ds3w_ref, ds3b_ref,
                     dtril_ref,
                     dgwg_ref, dgug_ref, dgbg_ref, dgwc_ref, dguc_ref, dgbc_ref,
                     dtdw_ref, dtdb_ref, dgaw_ref, dgab_ref,
                     dsp1w_ref, dsp1b_ref, dsp2w_ref, dsp2b_ref):
    S, gh, gw, n_what, U, SP, WB, MH = dims
    img = img_ref[...]
    B, H, W = img.shape
    GHW = gh * gw
    offs, _ = _prop_offsets(U, SP, n_what, WB, MH, GHW)
    tril = tril_ref[...]
    we1_3d = we1_ref[...]

    acc = {}

    def add(name, val):
        acc[name] = val if name not in acc else acc[name] + val

    d_sw = jnp.zeros((B, n_what), jnp.float32)
    d_swh = jnp.zeros((B, 4), jnp.float32)
    d_sp = jnp.zeros((B, 1), jnp.float32)
    d_h_c = jnp.zeros((B, U), jnp.float32)

    def r(name, k):
        a, b = offs[name]
        return res_ref[k, :, a:b]

    def crop_recompute(wl):
        _, (wy, _, _), (wx, _, _) = _interp_from_logits(wl, H, W, gh, gw)
        return _bmm(wy, _bmm(img, jnp.swapaxes(wx, 1, 2)))

    def crop_bwd(dg0, wl):
        (sx, sy, tx, ty), (wy, uy, ti_y), (wx, ux, ti_x) = _interp_from_logits(
            wl, H, W, gh, gw
        )
        A = _bmm(img, jnp.swapaxes(wx, 1, 2))
        dwy = _bmm(dg0, jnp.swapaxes(A, 1, 2))
        dA = _bmm(jnp.swapaxes(wy, 1, 2), dg0)
        dwx = _bmm(jnp.swapaxes(dA, 1, 2), img)
        dsyc, dty = _dinterp(dwy, wy, uy, H, ti_y)
        dsxc, dtx = _dinterp(dwx, wx, ux, W, ti_x)
        return _dwl_from_coords(dsxc, dsyc, dtx, dty, sx, sy, tx, ty)

    for k in range(S - 1, -1, -1):
        wt1, wh1, p1, ht = wt1_ref[k], wh1_ref[k], p1_ref[k], th_ref[k]
        h = r("h", k)
        mask = r("mask", k)
        prob = prob_ref[k]
        what = what_ref[k]
        where = where_ref[k]
        wscale = wheresc_ref[k]
        what_scale = whatsc_ref[k]
        ht_new = tnew_ref[k]
        g2loc, g2sc = r("g2loc", k), r("g2sc", k)
        tloc, tsc = r("tloc", k), r("tsc", k)
        gates = r("gates", k)
        lraw = r("lraw", k)
        gwl = r("gwl", k)

        d_wt1 = jnp.zeros((B, n_what), jnp.float32)
        d_wh1 = jnp.zeros((B, 4), jnp.float32)
        d_ht = jnp.zeros((B, U), jnp.float32)

        # ------------------------------------------------ presence chain
        d_pres_tot = dpres_ref[k] + d_sp
        dlogit = dlogit_ref[k] + dprob_ref[k] * prob * (1.0 - prob)
        dlraw = dlogit * p1
        psamp = (u_ref[k] < prob).astype(jnp.float32)
        d_p1 = d_pres_tot * psamp + dlogit * (lraw + 88.0)

        # steps predictor bwd: spfeat = [h, ht(old), what]
        sp1 = r("s1", k)
        dsp1z = _dot(dlraw, sp2w_ref[...].T) * _delu(sp1)
        spfeat = jnp.concatenate([h, ht, what], -1)
        add("dsp2w", _dot(sp1.T, dlraw))
        add("dsp2b", jnp.sum(dlraw, axis=0))
        add("dsp1w", _dot(spfeat.T, dsp1z))
        add("dsp1b", jnp.sum(dsp1z, axis=0))
        dspfeat = _dot(dsp1z, sp1w_ref[...].T)
        dh_acc = dspfeat[:, :U]
        d_ht += dspfeat[:, U:2 * U]
        dwhat_sp = dspfeat[:, 2 * U:]

        # ------------------------------------------- what fusion + gates
        d_what_tot = dwhat_ref[k] + d_sw + dwhat_sp
        dwl_tot = d_what_tot + dwhatloc_ref[k]  # d what_loc
        dws_tot = d_what_tot * epsx_ref[k] + dwhatsc_ref[k]  # d what_scale

        f_g = gates[:, :n_what]
        i_g = gates[:, n_what:2 * n_what]
        t_g = gates[:, 2 * n_what:]
        d_f = dwl_tot * wt1
        d_i = -(dwl_tot * g2loc + dws_tot * g2sc)
        d_t = -(dwl_tot * tloc + dws_tot * tsc)
        d_wt1 += dwl_tot * f_g
        d_g2loc = dwl_tot * (1.0 - i_g)
        d_g2sc = dws_tot * (1.0 - i_g)
        d_tloc = dwl_tot * (1.0 - t_g)
        d_tsc = dws_tot * (1.0 - t_g)

        sg = gates * (1.0 / 0.9999)
        dz_gates = jnp.concatenate([d_f, d_i, d_t], -1) * 0.9999 * sg * (1.0 - sg)
        add("dgaw", _dot(ht_new.T, dz_gates))
        add("dgab", jnp.sum(dz_gates, axis=0))
        d_ht_new = dtnew_ref[k] + _dot(dz_gates, gaw_ref[...].T)

        # temporal what-distrib dense bwd
        dtd = jnp.concatenate(
            [d_tloc, d_tsc * _dsoftplus_from_out(tsc, MIN_STD)], -1
        )
        add("dtdw", _dot(ht_new.T, dtd))
        add("dtdb", jnp.sum(dtd, axis=0))
        d_ht_new += _dot(dtd, tdw_ref[...].T)

        # ------------------------------------------------------- GRU bwd
        zr = r("zr", k)
        c = r("c", k)
        z_g, r_g = zr[:, :U], zr[:, U:]
        tin = jnp.concatenate([h, where, g2loc, g2sc], -1)
        dz_g = d_ht_new * (c - ht)
        dc_in = (d_ht_new * z_g) * (1.0 - c * c)
        drh = _dot(dc_in, guc_ref[...].T)
        dr = drh * ht
        da = jnp.concatenate([dz_g, dr], -1) * zr * (1.0 - zr)
        add("dgwc", _dot(tin.T, dc_in))
        add("dguc", _dot((r_g * ht).T, dc_in))
        add("dgbc", jnp.sum(dc_in, axis=0))
        add("dgwg", _dot(tin.T, da))
        add("dgug", _dot(ht.T, da))
        add("dgbg", jnp.sum(da, axis=0))
        dtin = _dot(dc_in, gwc_ref[...].T) + _dot(da, gwg_ref[...].T)
        d_ht += d_ht_new * (1.0 - z_g) + drh * r_g + _dot(da, gug_ref[...].T)

        dh_acc += dtin[:, :U]
        d_where_tin = dtin[:, U:U + 4]
        d_g2loc += dtin[:, U + 4:U + 4 + n_what]
        d_g2sc += dtin[:, U + 4 + n_what:]

        # -------------------------------------------- glimpse-2 backward
        e21, e22 = r("e21", k), r("e22", k)
        g2 = crop_recompute(where)
        dhp2 = jnp.concatenate(
            [d_g2loc, d_g2sc * _dsoftplus_from_out(g2sc, MIN_STD)], -1
        )
        add("dwh", _dot(e22.T, dhp2))
        add("dbh", jnp.sum(dhp2, axis=0))
        de22 = _dot(dhp2, wh_ref[...].T)
        dz22 = de22 * _delu(e22)
        add("dwe2", _dot(e21.T, dz22))
        add("dbe2", jnp.sum(dz22, axis=0))
        de21 = _dot(dz22, we2_ref[...].T)
        dz21 = de21 * _delu(e21)
        dwe1_rows2, dg2, dmask = _glimpse_layer1_bwd(g2, we1_3d, dz21, mask)
        add("dwe1", jnp.stack(dwe1_rows2, axis=0))
        add("dbe1", jnp.sum(dz21, axis=0))
        dwl2 = crop_bwd(dg2, where)

        # ------------------------------------------ where sampling + stp
        d_where_tot = (dwhere_ref[k] + d_swh + d_where_tin + dwl2)
        dwloc = d_where_tot + dwhereloc_ref[k]
        epsw = epsw_ref[k]
        m_eps = _dot(epsw, tril.T) + epsw
        dwscale = d_where_tot * m_eps + dwheresc_ref[k]
        add("dtril", _dot((d_where_tot * wscale).T, epsw))
        d_wh1 += dwloc

        a1, a2 = r("a1", k), r("a2", k)
        dstp8 = jnp.concatenate(
            [dwloc, dwscale * _dsoftplus_from_out(wscale, MIN_STD)], -1
        )
        add("ds3w", _dot(a2.T, dstp8))
        add("ds3b", jnp.sum(dstp8, axis=0))
        da2 = _dot(dstp8, s3w_ref[...].T)
        dz_a2 = da2 * _delu(a2)
        add("ds2w", _dot(a1.T, dz_a2))
        add("ds2b", jnp.sum(dz_a2, axis=0))
        da1 = _dot(dz_a2, s2w_ref[...].T)
        dz_a1 = da1 * _delu(a1)
        stp_in = jnp.concatenate([h, wh1, ht], -1)
        add("ds1w", _dot(stp_in.T, dz_a1))
        add("ds1b", jnp.sum(dz_a1, axis=0))
        dstp_in = _dot(dz_a1, s1w_ref[...].T)
        dh_acc += dstp_in[:, :U]
        d_wh1 += dstp_in[:, U:U + 4]
        d_ht += dstp_in[:, U + 4:]

        # --------------------------------------------- transition rnn bwd
        dh_tot = dh_acc + d_h_c
        dz = dh_tot * (1.0 - h * h)
        if k > 0:
            sw_prev = what_ref[k - 1]
            swh_prev = where_ref[k - 1]
            sp_prev = pres_ref[k - 1]
            h_prev = r("h", k - 1)
        else:
            sw_prev = jnp.zeros((B, n_what), jnp.float32)
            swh_prev = jnp.zeros((B, 4), jnp.float32)
            sp_prev = jnp.zeros((B, 1), jnp.float32)
            h_prev = h0_ref[...]
        g1loc = r("g1loc", k)
        rnn_in = jnp.concatenate(
            [g1loc, sw_prev, swh_prev, sp_prev, wt1, wh1, p1, ht], -1
        )
        add("drw", _dot(rnn_in.T, dz))
        add("dru", _dot(h_prev.T, dz))
        add("drb", jnp.sum(dz, axis=0))
        drnn_in = _dot(dz, rw_ref[...].T)
        d_h_c = _dot(dz, ru_ref[...].T)

        NW = n_what
        d_g1loc = drnn_in[:, :NW]
        d_sw = drnn_in[:, NW:2 * NW]
        d_swh = drnn_in[:, 2 * NW:2 * NW + 4]
        d_sp = drnn_in[:, 2 * NW + 4:2 * NW + 5]
        d_wt1 += drnn_in[:, 2 * NW + 5:3 * NW + 5]
        d_wh1 += drnn_in[:, 3 * NW + 5:3 * NW + 9]
        d_p1 += drnn_in[:, 3 * NW + 9:3 * NW + 10]
        d_ht += drnn_in[:, 3 * NW + 10:]

        # -------------------------------------------- glimpse-1 backward
        e11, e12 = r("e11", k), r("e12", k)
        g1 = crop_recompute(gwl)
        dhp1 = jnp.concatenate([d_g1loc, jnp.zeros((B, NW), jnp.float32)], -1)
        add("dwh", _dot(e12.T, dhp1))
        add("dbh", jnp.sum(dhp1, axis=0))
        de12 = _dot(dhp1, wh_ref[...].T)
        dz12 = de12 * _delu(e12)
        add("dwe2", _dot(e11.T, dz12))
        add("dbe2", jnp.sum(dz12, axis=0))
        de11 = _dot(dz12, we2_ref[...].T)
        dz11 = de11 * _delu(e11)
        dwe1_rows1, dg1, dmask1 = _glimpse_layer1_bwd(g1, we1_3d, dz11, mask)
        add("dwe1", jnp.stack(dwe1_rows1, axis=0))
        add("dbe1", jnp.sum(dz11, axis=0))
        dmask += dmask1
        dwl1 = crop_bwd(dg1, gwl)
        d_wh1 += dwl1
        d_wb = dwl1 * 0.1

        # where-bias MLP bwd
        wbh = r("wbh", k)
        add("dwb2w", _dot(wbh.T, d_wb))
        add("dwb2b", jnp.sum(d_wb, axis=0))
        dwbh = _dot(d_wb, wb2w_ref[...].T) * _delu(wbh)
        add("dwb1w", _dot(ht.T, dwbh))
        add("dwb1b", jnp.sum(dwbh, axis=0))
        d_ht += _dot(dwbh, wb1w_ref[...].T)

        # mask MLP bwd (both glimpse uses accumulated in dmask)
        maskh = r("maskh", k)
        dmz2 = dmask * mask * (1.0 - mask)
        add("dm2w", _dot(maskh.T, dmz2))
        add("dm2b", jnp.sum(dmz2, axis=0))
        dmaskh = _dot(dmz2, m2w_ref[...].T) * _delu(maskh)
        add("dm1w", _dot(ht.T, dmaskh))
        add("dm1b", jnp.sum(dmaskh, axis=0))
        d_ht += _dot(dmaskh, m1w_ref[...].T)

        dwt1_ref[k] = d_wt1
        dwh1_ref[k] = d_wh1
        dp1_ref[k] = d_p1
        dth_ref[k] = d_ht

    dh0_ref[...] = d_h_c
    for name, ref in (
        ("dwb1w", dwb1w_ref), ("dwb1b", dwb1b_ref), ("dwb2w", dwb2w_ref),
        ("dwb2b", dwb2b_ref), ("dm1w", dm1w_ref), ("dm1b", dm1b_ref),
        ("dm2w", dm2w_ref), ("dm2b", dm2b_ref), ("dwe1", dwe1_ref),
        ("dbe1", dbe1_ref), ("dwe2", dwe2_ref), ("dbe2", dbe2_ref),
        ("dwh", dwh_ref), ("dbh", dbh_ref), ("drw", drw_ref),
        ("dru", dru_ref), ("drb", drb_ref), ("ds1w", ds1w_ref),
        ("ds1b", ds1b_ref), ("ds2w", ds2w_ref), ("ds2b", ds2b_ref),
        ("ds3w", ds3w_ref), ("ds3b", ds3b_ref), ("dtril", dtril_ref),
        ("dgwg", dgwg_ref), ("dgug", dgug_ref), ("dgbg", dgbg_ref),
        ("dgwc", dgwc_ref), ("dguc", dguc_ref), ("dgbc", dgbc_ref),
        ("dtdw", dtdw_ref), ("dtdb", dtdb_ref), ("dgaw", dgaw_ref),
        ("dgab", dgab_ref), ("dsp1w", dsp1w_ref), ("dsp1b", dsp1b_ref),
        ("dsp2w", dsp2w_ref), ("dsp2b", dsp2b_ref),
    ):
        ref[...] = acc[name]


# --------------------------------------------------------------------------
# propagation: pallas_call plumbing + custom VJP
# --------------------------------------------------------------------------
def _prop_weights_flat(p: PropParams):
    """Kernel argument order; (stp_offset - 1) must be pre-folded into the
    last stp bias by the caller (fused_prop_ssm)."""
    (wb1w, wb1b), (wb2w, wb2b) = p.wb
    (m1w, m1b), (m2w, m2b) = p.mask
    (we1, be1), (we2, be2) = p.ge_enc
    wh, bh = p.ge_head
    rw, ru, rb = p.rnn
    (s1w, s1b), (s2w, s2b), (s3w, s3b) = p.stp
    gwg, gug, gbg, gwc, guc, gbc = p.gru
    tdw, tdb = p.td
    gaw, gab = p.gates
    (sp1w, sp1b), (sp2w, sp2b) = p.sp
    return (wb1w, wb1b, wb2w, wb2b, m1w, m1b, m2w, m2b,
            we1, be1, we2, be2, wh, bh, rw, ru, rb,
            s1w, s1b, s2w, s2b, s3w, s3b, p.tril,
            gwg, gug, gbg, gwc, guc, gbc, tdw, tdb, gaw, gab,
            sp1w, sp1b, sp2w, sp2b)


def _prop_run_fwd(img, z3, th, h0b, eps, weights, dims):
    from jax.experimental import pallas as pl

    S, gh, gw, n_what, U, SP, WB, MH = dims
    B = img.shape[0]
    _, R = _prop_offsets(U, SP, n_what, WB, MH, gh * gw)
    f32 = jnp.float32
    outs = [
        jax.ShapeDtypeStruct((S, B, n_what), f32),  # what
        jax.ShapeDtypeStruct((S, B, n_what), f32),  # what_loc
        jax.ShapeDtypeStruct((S, B, n_what), f32),  # what_scale
        jax.ShapeDtypeStruct((S, B, 4), f32),  # where
        jax.ShapeDtypeStruct((S, B, 4), f32),  # where_loc
        jax.ShapeDtypeStruct((S, B, 4), f32),  # where_scale
        jax.ShapeDtypeStruct((S, B, 1), f32),  # presence_prob
        jax.ShapeDtypeStruct((S, B, 1), f32),  # presence
        jax.ShapeDtypeStruct((S, B, 1), f32),  # presence_logit
        jax.ShapeDtypeStruct((S, B, U), f32),  # new temporal state
        jax.ShapeDtypeStruct((S, B, R), f32),  # residual blob
    ]
    args = (img,) + tuple(z3) + (th,) + (h0b,) + tuple(eps) + tuple(weights)
    return pl.pallas_call(
        functools.partial(_prop_fwd_kernel, dims),
        out_shape=outs,
        in_specs=_vmem_specs(len(args)),
        out_specs=_vmem_specs(len(outs)),
        compiler_params=_cell_compiler_params(),
        interpret=_INTERPRET,
    )(*args)


def _prop_run_bwd(img, z3, th, h0b, eps, weights, saved_out, res, cots, dims):
    from jax.experimental import pallas as pl

    S, gh, gw, n_what, U, SP, WB, MH = dims
    B = img.shape[0]
    f32 = jnp.float32
    (wb1w, wb1b, wb2w, wb2b, m1w, m1b, m2w, m2b,
     we1, be1, we2, be2, wh, bh, rw, ru, rb,
     s1w, s1b, s2w, s2b, s3w, s3b, tril,
     gwg, gug, gbg, gwc, guc, gbc, tdw, tdb, gaw, gab,
     sp1w, sp1b, sp2w, sp2b) = weights
    what, whatsc, where, wheresc, prob, pres, tnew = saved_out
    wt1, wh1, p1 = z3

    args = ((img, wt1, wh1, p1, th, h0b) + tuple(eps)
            + (wb1w, wb2w, m1w, m2w, we1, we2, wh, rw, ru,
               s1w, s2w, s3w, tril, gwg, gug, gwc, guc, tdw, gaw, sp1w, sp2w)
            + (what, whatsc, where, wheresc, prob, pres, tnew, res)
            + tuple(cots))
    outs = [
        jax.ShapeDtypeStruct(wt1.shape, f32),
        jax.ShapeDtypeStruct(wh1.shape, f32),
        jax.ShapeDtypeStruct(p1.shape, f32),
        jax.ShapeDtypeStruct(th.shape, f32),
        jax.ShapeDtypeStruct(h0b.shape, f32),
    ] + [
        jax.ShapeDtypeStruct(w.shape, f32)
        for w in (wb1w, wb1b, wb2w, wb2b, m1w, m1b, m2w, m2b,
                  we1, be1, we2, be2, wh, bh, rw, ru, rb,
                  s1w, s1b, s2w, s2b, s3w, s3b, tril,
                  gwg, gug, gbg, gwc, guc, gbc, tdw, tdb, gaw, gab,
                  sp1w, sp1b, sp2w, sp2b)
    ]
    return pl.pallas_call(
        functools.partial(_prop_bwd_kernel, dims),
        out_shape=outs,
        in_specs=_vmem_specs(len(args)),
        out_specs=_vmem_specs(len(outs)),
        compiler_params=_cell_compiler_params(),
        interpret=_INTERPRET,
    )(*args)



@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused_prop(img, z3, th, h0b, eps, weights, dims):
    res = _prop_run_fwd(img, z3, th, h0b, eps, weights, dims)
    return tuple(res[:10])


def _fused_prop_fwd(img, z3, th, h0b, eps, weights, dims):
    res = _prop_run_fwd(img, z3, th, h0b, eps, weights, dims)
    primal = tuple(res[:10])
    (what, _, whatsc, where, _, wheresc, prob, pres, _, tnew) = primal
    saved = (img, z3, th, h0b, eps, weights,
             (what, whatsc, where, wheresc, prob, pres, tnew), res[10])
    return primal, saved


def _fused_prop_bwd(dims, saved, cots):
    img, z3, th, h0b, eps, weights, saved_out, res = saved
    outs = _prop_run_bwd(img, z3, th, h0b, eps, weights, saved_out, res,
                         cots, dims)
    dwt1, dwh1, dp1, dth, dh0 = outs[:5]
    dweights = tuple(outs[5:])
    zeros = lambda x: jnp.zeros_like(x)
    return (zeros(img), (dwt1, dwh1, dp1), dth, dh0,
            tuple(zeros(e) for e in eps), dweights)


_fused_prop.defvjp(_fused_prop_fwd, _fused_prop_bwd)


def fused_prop_ssm(img, z_tm1, temporal_h, h0, eps_where, eps_what, u_pres,
                   p: PropParams, glimpse_size) -> Dict[str, jnp.ndarray]:
    """S-slot propagation unroll as one fwd + one bwd Pallas kernel.

    Same contract as ``prop_ssm_ref`` (which defines the math); z_tm1 /
    temporal_h / noise are [S, B, d] slot-major, returns dict of [S, B, d]
    plus "temporal_h".  ``what_sample``/``where_sample`` alias ``what``/
    ``where`` (they are the same tensors in the reference too,
    core.py:188,210) so cotangents combine automatically.
    """
    S = eps_where.shape[0]
    gh, gw = int(glimpse_size[0]), int(glimpse_size[1])
    n_what = eps_what.shape[-1]
    U = p.rnn[1].shape[0]
    SP = p.sp[0][0].shape[1]
    WB = p.wb[0][0].shape[1]
    MH = p.mask[0][0].shape[1]
    B = img.shape[0]
    dims = (S, gh, gw, n_what, U, SP, WB, MH)

    # fold (scale_offset - 1) into the estimator's output bias (see
    # fused_disc_ssm; the -1 is the reference's softplus(x - 1),
    # core.py:330)
    (s3w, s3b) = p.stp[2]
    fold = jnp.concatenate([jnp.zeros(4), jnp.ones(4)]) * (p.stp_offset - 1.0)
    (we1, be1), l2 = p.ge_enc
    p = p._replace(
        stp=(p.stp[0], p.stp[1], (s3w, s3b + fold)),
        ge_enc=((we1.reshape((gh, gw, we1.shape[1])), be1), l2),
    )
    h0b = jnp.broadcast_to(h0, (B, U)).astype(jnp.float32)

    z3 = (what_tm1, where_tm1, pres_tm1) = tuple(z_tm1[:3])
    eps = (eps_where, eps_what, u_pres)
    out = _fused_prop(img, z3, temporal_h, h0b, eps,
                      _prop_weights_flat(p), dims)
    d = dict(zip(
        ("what", "what_loc", "what_scale", "where", "where_loc",
         "where_scale", "presence_prob", "presence", "presence_logit",
         "temporal_h"), out))
    d["what_sample"] = d["what"]
    d["where_sample"] = d["where"]
    return d


def jit_compiler_options():
    """Compiler options for jits whose body contains the fused frame
    kernels.

    XLA's default 16MB scoped-vmem budget is too small for the fusions
    that copy the kernels' packed residual blobs into the time-scan's
    stacked buffers (measured ~29MB at the paper config); the kernels
    themselves carry their own larger budget via CompilerParams.
    Returns None when the fused path is inactive.
    """
    from .fused import use_pallas

    if not use_pallas():
        return None
    # the options below are TPU-only: on other backends (e.g. interpret-
    # mode kernels forced onto the CPU mesh in tests) XLA rejects them
    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return None
    except Exception:  # pragma: no cover
        return None
    # Needed whenever ANY Pallas kernel is active, not just the opt-in
    # frame kernels: the default-on fused MLP stacks (ops/fused.py) are
    # single-block whole-batch kernels, and the glimpse-decoder MLP's
    # scoped allocation scales with T*B*k*S rows (measured 18.3MB at
    # T=8, paper batch — past the 16MB default; T=10 needs ~25MB).
    return {"xla_tpu_scoped_vmem_limit_kib": "49152"}
