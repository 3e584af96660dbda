"""NN primitives: MLP and RNN cells (reference: sqair/neural.py + sonnet).

Cells follow a uniform interface:
  ``cell(state, x) -> (new_state, output)`` with ``state`` a tuple of arrays
  (VanillaRNN/GRU: ``(h,)``; LSTM: ``(c, h)``).  ``state[-1]`` is the
  "feature" half used wherever the reference reads
  ``nest.flatten(state)[-1]`` (e.g. sqair/core.py:284).

``initial_state(batch_size)`` returns a trainable initial state, matching
``cell.initial_state(batch_size, trainable=True)`` in the reference.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

State = Tuple[jnp.ndarray, ...]


def const_init(value):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init


def _transfer_name(fn: Optional[Callable]) -> str:
    """Maps a transfer callable to a fused-kernel activation tag."""
    if fn is None:
        return "id"
    name = getattr(fn, "__name__", "")
    if name in ("elu",):
        return "elu"
    if name in ("sigmoid",):
        return "sigmoid"
    if name in ("tanh",):
        return "tanh"
    return ""  # unknown -> apply the callable outside the kernel


class MLP(nn.Module):
    """Elu MLP with optional linear output head.

    Reference: sqair/neural.py:111-116 (MLP of `Nonlinear` layers).
    ``n_hiddens`` may be arbitrarily nested (the reference configs pass
    1-tuples of lists due to trailing commas; nest.flatten tolerates it).

    The whole stack executes as ONE fused Pallas kernel on TPU (see
    ops/fused.py); params are held per-layer as (w_i, b_i) so the kernel
    can consume them directly.
    """

    n_hiddens: Any
    n_out: Optional[int] = None
    hidden_transfer: Callable = nn.elu
    transfer: Optional[Callable] = None
    output_bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        from ..ops import fused

        flat_hiddens = [int(h) for h in jax.tree_util.tree_leaves(self.n_hiddens)]
        dims = flat_hiddens + ([self.n_out] if self.n_out is not None else [])
        hidden_tag = _transfer_name(self.hidden_transfer)
        out_tag = _transfer_name(self.transfer)

        params, transfers = [], []
        d_in = x.shape[-1]
        kernel_init = nn.initializers.lecun_normal()
        for i, d_out in enumerate(dims):
            is_out = self.n_out is not None and i == len(dims) - 1
            if is_out:
                bias_init = self.output_bias_init or nn.initializers.zeros_init()
            else:
                bias_init = nn.initializers.zeros_init()
            w = self.param(f"w_{i}", kernel_init, (d_in, d_out))
            b = self.param(f"b_{i}", bias_init, (d_out,))
            params.append((w, b))
            transfers.append(out_tag if is_out else hidden_tag)
            d_in = d_out

        if not params:
            return x

        # unknown transfers fall outside the kernel
        tail = None
        if transfers and transfers[-1] == "":
            transfers[-1] = "id"
            tail = self.transfer if self.n_out is not None else self.hidden_transfer
        if any(t == "" for t in transfers):  # unknown hidden transfer
            y = x
            for (w, b), is_last in zip(
                params, [False] * (len(params) - 1) + [True]
            ):
                y = y @ w + b
                fn = (self.transfer if (is_last and self.n_out is not None)
                      else self.hidden_transfer)
                if not (is_last and self.n_out is not None and self.transfer is None):
                    y = fn(y) if fn is not None else y
            return y

        y = fused.fused_mlp(x, tuple(params), tuple(transfers))
        if tail is not None:
            y = tail(y)
        return y


class Encoder(nn.Module):
    """MLP over the (pre-flattened) last axis.

    Reference: sqair/modules.py:100-112 (BatchFlatten + MLP).  Callers in
    this codebase flatten spatial dims themselves so the module works for
    both [B, d] and [B, S, d] inputs.
    """

    n_hiddens: Any

    @nn.compact
    def __call__(self, x):
        return MLP(self.n_hiddens)(x)


class Decoder(nn.Module):
    """MLP decoder reshaped to a feature map and scaled by a learned scalar.

    Reference: sqair/modules.py:131-147.
    """

    n_hiddens: Any
    output_size: Sequence[int]
    output_scale: float = 0.25

    @nn.compact
    def __call__(self, x):
        import numpy as np

        n = int(np.prod(self.output_size))
        out = MLP(self.n_hiddens, n_out=n)(x)
        out = out.reshape(out.shape[:-1] + tuple(self.output_size))
        scale = self.param("output_scale", const_init(self.output_scale), ())
        return out * scale


def _per_layer(param, n: int):
    """Per-layer parameter choice (reference neural.py:168-180)."""
    flat = jax.tree_util.tree_leaves(param)
    return flat[n] if len(flat) > 1 else flat[0]


class ConvNet(nn.Module):
    """Elu ConvNet with optional linear conv output head.

    Reference: sqair/neural.py:118-181.  NHWC layout (TPU-native).  The
    reference's batch_norm option is intentionally inert there (frozen
    batch statistics, see its own TODO at neural.py:158-160); we reproduce
    the same semantics with a per-batch LayerNorm-free normalisation off by
    default.
    """

    kernel_shape: int
    n_hiddens: Any
    n_out: Optional[int] = None
    hidden_transfer: Callable = nn.elu
    transfer: Optional[Callable] = None
    stride: Any = 1
    rate: Any = 1

    @nn.compact
    def __call__(self, x):
        """:param x: [..., H, W, C]"""
        hiddens = [int(h) for h in jax.tree_util.tree_leaves(self.n_hiddens)]
        for n, h in enumerate(hiddens):
            s, r = int(_per_layer(self.stride, n)), int(_per_layer(self.rate, n))
            x = nn.Conv(h, (self.kernel_shape, self.kernel_shape),
                        strides=(s, s), kernel_dilation=(r, r))(x)
            x = self.hidden_transfer(x)
        if self.n_out is not None:
            n = len(hiddens)
            s, r = int(_per_layer(self.stride, n)), int(_per_layer(self.rate, n))
            x = nn.Conv(self.n_out, (self.kernel_shape, self.kernel_shape),
                        strides=(s, s), kernel_dilation=(r, r))(x)
            if self.transfer is not None:
                x = self.transfer(x)
        return x


class UpConvNet(nn.Module):
    """Subpixel-convolution upsampler (reference neural.py:184-198).

    Each layer runs a stride-1 conv with ``n_hidden * stride**2`` channels
    followed by depth-to-space (pixel shuffle) by ``stride``.
    """

    kernel_shape: int
    n_hiddens: Any
    n_out: Optional[int] = None
    hidden_transfer: Callable = nn.elu
    transfer: Optional[Callable] = None
    stride: Any = 1

    @staticmethod
    def _depth_to_space(x, block: int):
        B = x.shape[:-3]
        H, W, C = x.shape[-3:]
        c_out = C // (block * block)
        x = x.reshape(B + (H, W, block, block, c_out))
        x = jnp.swapaxes(x, -4, -3)  # [..., H, block, W, block, c]
        return x.reshape(B + (H * block, W * block, c_out))

    @nn.compact
    def __call__(self, x):
        hiddens = [int(h) for h in jax.tree_util.tree_leaves(self.n_hiddens)]
        dims = hiddens + ([self.n_out] if self.n_out is not None else [])
        for n, h in enumerate(dims):
            is_out = self.n_out is not None and n == len(dims) - 1
            s = int(_per_layer(self.stride, n))
            x = nn.Conv(h * s * s, (self.kernel_shape, self.kernel_shape))(x)
            if s > 1:
                x = self._depth_to_space(x, s)
            fn = self.transfer if is_out else self.hidden_transfer
            if fn is not None and not (is_out and self.transfer is None):
                x = fn(x)
        return x


class ConvEncoder(nn.Module):
    """Conv feature extractor over flat image/glimpse vectors.

    Drop-in replacement for ``Encoder`` wherever the framework passes a
    flattened [..., h*w] input (DiscoveryCore.encode_img, AIREncoder):
    reshapes to NHWC, runs the ConvNet, flattens, projects to n_features.
    """

    img_size: Sequence[int]  # (h, w) of the unflattened input
    n_hiddens: Any  # conv channels per layer
    n_features: int = 256
    kernel_shape: int = 3
    stride: Any = 2

    @nn.compact
    def __call__(self, x):
        h, w = self.img_size
        lead = x.shape[:-1]
        img = x.reshape((-1, h, w, 1))
        feats = ConvNet(self.kernel_shape, self.n_hiddens,
                        stride=self.stride)(img)
        feats = feats.reshape((feats.shape[0], -1))
        out = MLP([], n_out=self.n_features)(feats)
        out = nn.elu(out)
        return out.reshape(lead + (self.n_features,))


class SubpixelDecoder(nn.Module):
    """UpConvNet glimpse decoder: what -> feature map -> subpixel upsample.

    Drop-in replacement for ``Decoder`` (MLP) in AIRDecoder; same output
    contract [..., gh, gw] scaled by a learned scalar.
    """

    n_hiddens: Any  # conv channels per layer
    output_size: Sequence[int]  # (gh, gw)
    output_scale: float = 0.25
    base_size: int = 5  # initial feature-map side
    kernel_shape: int = 3

    @nn.compact
    def __call__(self, x):
        gh, gw = self.output_size
        assert gh % self.base_size == 0 and gw % self.base_size == 0, (
            "glimpse size must be a multiple of base_size"
        )
        up = gh // self.base_size
        # factor the total upsampling into stride-2 layers (+ remainder)
        strides, rem = [], up
        while rem % 2 == 0 and rem > 1:
            strides.append(2)
            rem //= 2
        if rem > 1:
            strides.append(rem)
        hiddens = [int(h) for h in jax.tree_util.tree_leaves(self.n_hiddens)]
        while len(strides) < len(hiddens) + 1:
            strides.append(1)

        lead = x.shape[:-1]
        seed = MLP([], n_out=self.base_size * self.base_size * 16)(x)
        seed = nn.elu(seed).reshape((-1, self.base_size, self.base_size, 16))
        out = UpConvNet(self.kernel_shape, hiddens, n_out=1,
                        stride=strides)(seed)
        scale = self.param("output_scale", const_init(self.output_scale), ())
        return out[..., 0].reshape(lead + (gh, gw)) * scale


class VanillaRNN(nn.Module):
    """h' = tanh(W x + U h + b) (sonnet snt.VanillaRNN).

    Runs as one fused Pallas kernel on TPU (ops/fused.py)."""

    units: int

    def setup(self):
        self._h0 = self.param("h0", nn.initializers.zeros_init(), (1, self.units))

    @nn.compact
    def __call__(self, state: State, x) -> Tuple[State, jnp.ndarray]:
        from ..ops import fused

        (h,) = state
        init = nn.initializers.lecun_normal()
        w = self.param("in_to_hidden_w", init, (x.shape[-1], self.units))
        b = self.param("in_to_hidden_b", nn.initializers.zeros_init(), (self.units,))
        u = self.param("hidden_to_hidden_w", init, (self.units, self.units))
        new_h = fused.fused_vanilla_rnn(x, h, w, u, b)
        return (new_h,), new_h

    def initial_state(self, batch_size: int, trainable: bool = True) -> State:
        h0 = self._h0 if trainable else jax.lax.stop_gradient(self._h0)
        return (jnp.tile(h0, (batch_size, 1)),)

    @property
    def state_size(self):
        return (self.units,)

    @property
    def output_size(self):
        return self.units


class GRU(nn.Module):
    """Standard GRU (sonnet snt.GRU).

    Runs as one fused Pallas kernel on TPU (ops/fused.py)."""

    units: int

    def setup(self):
        self._h0 = self.param("h0", nn.initializers.zeros_init(), (1, self.units))

    @nn.compact
    def __call__(self, state: State, x) -> Tuple[State, jnp.ndarray]:
        from ..ops import fused

        (h,) = state
        init = nn.initializers.lecun_normal()
        u_dim = self.units
        wg = self.param("gates_xw", init, (x.shape[-1], 2 * u_dim))
        ug = self.param("gates_hw", init, (u_dim, 2 * u_dim))
        bg = self.param("gates_b", nn.initializers.zeros_init(), (2 * u_dim,))
        wc = self.param("candidate_xw", init, (x.shape[-1], u_dim))
        uc = self.param("candidate_hw", init, (u_dim, u_dim))
        bc = self.param("candidate_b", nn.initializers.zeros_init(), (u_dim,))
        new_h = fused.fused_gru(x, h, wg, ug, bg, wc, uc, bc)
        return (new_h,), new_h

    def initial_state(self, batch_size: int, trainable: bool = True) -> State:
        h0 = self._h0 if trainable else jax.lax.stop_gradient(self._h0)
        return (jnp.tile(h0, (batch_size, 1)),)

    @property
    def state_size(self):
        return (self.units,)

    @property
    def output_size(self):
        return self.units


class LSTM(nn.Module):
    """Standard LSTM with state (c, h)."""

    units: int

    def setup(self):
        self._ifgo = nn.Dense(4 * self.units, name="ifgo")
        self._c0 = self.param("c0", nn.initializers.zeros_init(), (1, self.units))
        self._h0 = self.param("h0", nn.initializers.zeros_init(), (1, self.units))

    def __call__(self, state: State, x) -> Tuple[State, jnp.ndarray]:
        c, h = state
        ifgo = self._ifgo(jnp.concatenate([x, h], -1))
        i, f, g, o = jnp.split(ifgo, 4, -1)
        new_c = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
        return (new_c, new_h), new_h

    def initial_state(self, batch_size: int, trainable: bool = True) -> State:
        c0, h0 = self._c0, self._h0
        if not trainable:
            c0, h0 = jax.lax.stop_gradient((c0, h0))
        return (jnp.tile(c0, (batch_size, 1)), jnp.tile(h0, (batch_size, 1)))

    @property
    def state_size(self):
        return (self.units, self.units)

    @property
    def output_size(self):
        return self.units


RNN_CELLS = {"VanillaRNN": VanillaRNN, "GRU": GRU, "LSTM": LSTM}


def make_cell(name: str, units: int, **kwargs) -> nn.Module:
    """Cell factory mirroring ``maybe_getattr(snt, flag)`` in the config
    (sqair/configs/mlp_mnist_model.py:86-87)."""
    if name not in RNN_CELLS:
        raise ValueError(f"Unknown RNN cell '{name}'. Choose from {sorted(RNN_CELLS)}")
    return RNN_CELLS[name](units, **kwargs)


def state_feature(state: State) -> jnp.ndarray:
    """The reference's ``nest.flatten(state)[-1]`` (h for LSTM)."""
    return state[-1]
