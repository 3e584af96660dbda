"""AIR glimpse encoder and decoder (reference: sqair/modules.py:283-467)."""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.layers import MLP, Decoder, const_init
from ..nn.stochastic import GaussianFromParamVec
from ..ops import distributions as D
from ..ops import stn


class AIREncoder(nn.Module):
    """ST-crop at `where` + optional soft mask + MLP -> what posterior.

    Reference: sqair/modules.py:306-364.  `where` is in *logit* space and is
    converted with to_coords before cropping.  Accepts per-object [B, 4]
    or slotted [B, S, 4] wheres.
    """

    img_size: Sequence[int]
    glimpse_size: Sequence[int]
    n_what: int
    glimpse_encoder: nn.Module  # Encoder MLP over flattened glimpse
    scale_offset: float = 0.0
    masked_glimpse: bool = False

    def setup(self):
        self._what_distrib = GaussianFromParamVec(self.n_what, scale_offset=self.scale_offset)
        if self.masked_glimpse:
            self._mask_mlp = MLP(
                [128],
                n_out=int(np.prod(self.glimpse_size)),
                transfer=jax.nn.sigmoid,
                output_bias_init=const_init(1.0),
            )

    def _fused_param_tree(self):
        """Raw weights for the fused Pallas path, or None if unsupported.

        Only valid when bound post-init (params must already exist) and the
        glimpse encoder is the standard 2-layer elu MLP Encoder.
        """
        try:
            enc = self.glimpse_encoder.variables["params"]["MLP_0"]
            if "w_2" in enc or "w_1" not in enc:
                return None
            enc_params = ((enc["w_0"], enc["b_0"]), (enc["w_1"], enc["b_1"]))
            head = self._what_distrib.variables["params"]["Dense_0"]
            mask_params = None
            if self.masked_glimpse:
                mp = self._mask_mlp.variables["params"]
                mask_params = ((mp["w_0"], mp["b_0"]), (mp["w_1"], mp["b_1"]))
            return enc_params, (head["kernel"], head["bias"]), mask_params
        except (KeyError, AttributeError, ValueError):
            return None

    def __call__(self, img, where=None, mask_inpt=None) -> Tuple[D.Normal, jnp.ndarray]:
        """:param img: [B, H, W]
        :param where: [B, 4] or [B, S, 4] where *logits*
        :param mask_inpt: optional features for the glimpse mask, [B, d] or
            broadcastable against the slot axis
        :return: (what Normal over [..., n_what], glimpse [..., gh, gw];
            glimpse is None on the fused TPU path — no caller consumes it)
        """
        from ..ops import fused as _fused
        from ..ops.fused_glimpse import fused_glimpse_encoder

        import os

        # The fully-fused glimpse-encoder kernel wins in isolation (~2x) but
        # measured slightly slower end-to-end than XLA's pipelined unfused
        # sequence (remat re-runs custom_vjp forwards; layout copies at the
        # kernel boundary). Off by default; flip on to re-evaluate.
        if (
            os.environ.get("SQAIR_FUSE_GLIMPSE")
            and where is not None
            and where.ndim == 2
            and _fused.use_pallas()
            and not self.is_initializing()
            and self.scale_offset == 0.0
        ):
            tree = self._fused_param_tree()
            if tree is not None:
                enc_params, (head_w, head_b), mask_params = tree
                mi = mask_inpt if (self.masked_glimpse and mask_inpt is not None) else None
                loc, scale = fused_glimpse_encoder(
                    img, where, mi, mask_params, enc_params, head_w, head_b,
                    self.glimpse_size, self.n_what,
                )
                return D.Normal(loc, scale), None

        if where is not None:
            coords = stn.to_coords(where)
            if coords.ndim == 3:  # [B, S, 4]: broadcast img over slots
                glimpse = stn.extract_glimpse(
                    img[:, None], coords, self.glimpse_size
                )
            else:
                glimpse = stn.extract_glimpse(img, coords, self.glimpse_size)
        else:
            glimpse = img

        if self.masked_glimpse and mask_inpt is not None:
            glimpse_mask = self._mask_mlp(mask_inpt)
            glimpse_mask = glimpse_mask.reshape(glimpse.shape)
            glimpse = glimpse * glimpse_mask

        flat = glimpse.reshape(glimpse.shape[: glimpse.ndim - 2] + (-1,))
        what_params = self.glimpse_encoder(flat)
        return self._what_distrib(what_params), glimpse


class AIRDecoder(nn.Module):
    """Per-object glimpse decode + inverse-ST paste + mean-image background.

    Reference: sqair/modules.py:367-467.  The output std machinery (sqrt
    reparam with optional lower bound, optional learnable fg/bg stds and the
    bg>=fg constraint) is kept verbatim.
    """

    img_size: Sequence[int]
    glimpse_size: Sequence[int]
    glimpse_n_hiddens: Any
    glimpse_output_scale: float = 0.25
    mean_img: Optional[np.ndarray] = None
    output_std: float = 0.3
    learn_std: bool = False
    bg_std: Optional[float] = None
    learn_bg_std: bool = False
    min_std: float = 0.0
    bg_bigger_than_fg_std: bool = False
    decoder_type: str = "mlp"  # "mlp" | "subpixel"

    def setup(self):
        if self.decoder_type == "subpixel":
            from ..nn.layers import SubpixelDecoder

            self._glimpse_decoder = SubpixelDecoder(
                [16, 16], self.glimpse_size, self.glimpse_output_scale
            )
        else:
            self._glimpse_decoder = Decoder(
                self.glimpse_n_hiddens, self.glimpse_size, self.glimpse_output_scale
            )
        if self.mean_img is not None:
            mean = jnp.asarray(self.mean_img, jnp.float32)
            self._mean_img = self.param("mean_img", lambda key, s: mean, mean.shape)

        bg = self.output_std if self.bg_std is None else self.bg_std

        def make_std_param(name, value, learnable):
            offset = 0.0
            if self.min_std != 0.0:
                assert 0.0 < self.min_std <= value
                offset = 2 * value * self.min_std - self.min_std**2
                value = value - self.min_std
            raw = self.param(name, const_init(math.sqrt(value)), ())
            if not learnable:
                raw = jax.lax.stop_gradient(raw)
            return raw, offset

        self._fg_raw, self._fg_offset = make_std_param(
            "output_std", self.output_std, self.learn_std
        )
        self._bg_raw, self._bg_offset = make_std_param(
            "background_std", bg, self.learn_bg_std
        )

    def _stds(self):
        fg = self._fg_raw**2 + self._fg_offset
        bg = self._bg_raw**2 + self._bg_offset
        if self.bg_bigger_than_fg_std:
            bg = jnp.maximum(bg, fg + 1e-4)
        return fg, bg

    def _decode(self, glimpse, presence=None, where=None):
        """Paste glimpses and sum over the object axis (modules.py:435-445).

        :param glimpse: [B, S, gh, gw]
        :param where: [B, S, 4] where logits (or None)
        :param presence: [B, S, 1] (or None)
        """
        inversed = glimpse
        if where is not None:
            coords = stn.to_coords(where)
            inversed = stn.paste_glimpse(glimpse, coords, self.img_size)
        if presence is not None:
            inversed = inversed * presence[..., None]
        return jnp.sum(inversed, axis=1)  # sum over the object/slot axis

    def __call__(self, what, where=None, presence=None):
        """:param what: [B, S, n_what]
        :return: (Normal over [B, H, W], glimpse [B, S, gh, gw])
        """
        glimpse = self._glimpse_decoder(what)
        if where is not None:
            # one shared pair of paste matrices serves both the glimpse
            # paste and the written-to mask; the mask's all-ones glimpse
            # factorises into a rank-1 outer product of the row sums
            # (reference computes both with full resampler passes,
            # modules.py:435-467)
            coords = stn.to_coords(where)
            uy, ux = stn.paste_matrices(coords, self.glimpse_size, self.img_size)
            pasted = jnp.einsum("bshi,bsij,bswj->bshw", uy, glimpse, ux,
                                precision=jax.lax.Precision.HIGHEST)
            ones_paste = jnp.einsum("bsh,bsw->bshw", jnp.sum(uy, -1),
                                    jnp.sum(ux, -1),
                                    precision=jax.lax.Precision.HIGHEST)
            if presence is not None:
                pasted = pasted * presence[..., None]
                ones_paste = ones_paste * presence[..., None]
            canvas = jnp.sum(pasted, axis=1)
            non_zero_mask = jnp.sum(ones_paste, axis=1)
        else:
            canvas = self._decode(glimpse, presence, None)
            non_zero_mask = self._decode(
                jnp.ones(glimpse.shape), presence, None
            )

        written_to_mask = jax.nn.sigmoid(-10.0 + non_zero_mask * 20.0)
        if self.mean_img is not None:
            canvas = canvas + self._mean_img[None] * written_to_mask

        output_std, background_std = self._stds()
        std = written_to_mask * output_std + (1.0 - written_to_mask) * background_std
        return D.Normal(canvas, std), glimpse
