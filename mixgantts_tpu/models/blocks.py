"""Shared neural blocks (flax.linen), channel-LAST [B, T, C] throughout.

TPU-first notes: everything is [batch, time, feature] so the feature axis
(256 = 2x128 lanes) maps onto VPU lanes / MXU columns without transposes; the
reference's channel-first torch layout (`model/blocks.py` in
MaxMax2016/MixGAN-TTS) is not carried over.  Behavior parity targets are
cited per class.
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# Large-negative logit used instead of -inf so fully-masked rows produce a
# uniform (then zeroed) distribution rather than NaNs.
NEG_INF = -1e9


def sinusoid_position_table(n_position, d_hid):
    """Sinusoid table, parity with `model/linguistic_encoder.py:19-39`."""
    position = np.arange(n_position)[:, None].astype(np.float64)
    dim = np.arange(d_hid)[None, :]
    angle = position / np.power(10000, 2 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table.astype(np.float32)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class LayerNorm(nn.Module):
    """LayerNorm over the feature axis with the reference's eps=1e-4
    (`model/blocks.py:258-277`; it normalizes the channel axis, which in our
    channel-last layout is simply the last axis)."""

    eps: float = 1e-4

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + self.eps)
        gamma = self.param("gamma", nn.initializers.ones, (x.shape[-1],))
        beta = self.param("beta", nn.initializers.zeros, (x.shape[-1],))
        return x * gamma + beta


class Conv1d(nn.Module):
    """1D conv on the time axis of [B, T, C] (reference ConvNorm,
    `transformer/Layers.py:34-64`)."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        pad = self.dilation * (self.kernel_size - 1) // 2
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding=[(pad, pad)],
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            name="conv",
        )(x)


class LinearNorm(nn.Module):
    """Dense with xavier-uniform init, bias off by default
    (`model/blocks.py:279-292`)."""

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            name="linear",
        )(x)


class DiffusionEmbedding(nn.Module):
    """Sinusoidal diffusion-step embedding (`model/blocks.py:899-913`)."""

    dim: int

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        freq = jnp.exp(-math.log(10000) / (half - 1) * jnp.arange(half))
        args = t.astype(jnp.float32)[:, None] * freq[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class StepEmbeddingMLP(nn.Module):
    """DiffusionEmbedding -> Linear -> Mish -> Linear
    (`model/modules.py:399-404`, `model/mixgantts.py:203-208`)."""

    channels: int
    out_channels: int

    @nn.compact
    def __call__(self, t):
        emb = DiffusionEmbedding(self.channels)(t)
        emb = LinearNorm(self.channels * 4, name="fc1")(emb)
        emb = mish(emb)
        return LinearNorm(self.out_channels, name="fc2")(emb)


class FFN(nn.Module):
    """Single conv + activation feed-forward used inside RelativeFFTBlock
    (`model/blocks.py:956-976`; note the reference constructs it hidden->
    hidden, never using the 1024 filter size — behavior kept)."""

    features: int
    kernel_size: int
    dropout: float = 0.0
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask, train=False):
        x = Conv1d(self.features, self.kernel_size, name="conv")(x * mask)
        if self.activation == "gelu":
            x = x * jax.nn.sigmoid(1.702 * x)
        else:
            x = jax.nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x * mask


def _rel_to_abs(x):
    """[B, H, L, 2L-1] relative-keyed logits -> [B, H, L, L] absolute.

    The standard skewing trick (pad one column, flatten, re-pad, reshape,
    slice); static shapes only, parity with `model/blocks.py:1098-1112`.
    """
    b, h, length, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = x.reshape(b, h, length * 2 * length)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, length - 1)))
    x = x.reshape(b, h, length + 1, 2 * length - 1)
    return x[:, :, :length, length - 1:]


def _abs_to_rel(x):
    """[B, H, L, L] absolute attention -> [B, H, L, 2L-1] relative-keyed."""
    b, h, length, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, length - 1)))
    x = x.reshape(b, h, length * length + length * (length - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (length, 0)))
    return x.reshape(b, h, length, 2 * length)[:, :, :, 1:]


class RelativeSelfAttention(nn.Module):
    """Multi-head self-attention with windowed relative position embeddings
    (`model/blocks.py:978-1131`; heads share one relative table)."""

    channels: int
    n_heads: int
    window_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, attn_mask, train=False):
        # x: [B, L, C]; attn_mask: [B, 1, L, L] bool True=valid
        B, L, C = x.shape
        k_channels = C // self.n_heads
        xavier = nn.initializers.xavier_uniform()
        q = Conv1d(C, 1, kernel_init=xavier, name="conv_q")(x)
        k = Conv1d(C, 1, kernel_init=xavier, name="conv_k")(x)
        v = Conv1d(C, 1, kernel_init=xavier, name="conv_v")(x)

        def split_heads(t):
            return t.reshape(B, L, self.n_heads, k_channels).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)  # [B,H,L,d]
        scale = 1.0 / math.sqrt(k_channels)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale

        rel_stddev = k_channels ** -0.5
        emb_rel_k = self.param(
            "emb_rel_k", nn.initializers.normal(rel_stddev),
            (1, 2 * self.window_size + 1, k_channels))
        emb_rel_v = self.param(
            "emb_rel_v", nn.initializers.normal(rel_stddev),
            (1, 2 * self.window_size + 1, k_channels))

        rel_k = self._window_to_length(emb_rel_k, L)  # [1, 2L-1, d]
        rel_logits = jnp.einsum("bhld,gmd->bhlm", q, rel_k,
                                preferred_element_type=jnp.float32)
        scores = scores + _rel_to_abs(rel_logits) * scale

        scores = jnp.where(attn_mask, scores, NEG_INF)
        p_attn = jax.nn.softmax(scores, axis=-1)
        p_attn = nn.Dropout(self.dropout, deterministic=not train)(p_attn)

        out = jnp.einsum("bhqk,bhkd->bhqd", p_attn, v,
                         preferred_element_type=jnp.float32)
        rel_weights = _abs_to_rel(p_attn)  # [B,H,L,2L-1]
        rel_v = self._window_to_length(emb_rel_v, L)
        out = out + jnp.einsum("bhlm,gmd->bhld", rel_weights, rel_v,
                               preferred_element_type=jnp.float32)

        out = out.transpose(0, 2, 1, 3).reshape(B, L, C)
        return Conv1d(self.channels, 1, name="conv_o")(out)

    def _window_to_length(self, emb, length):
        """Pad/slice the [1, 2w+1, d] table to [1, 2*length-1, d]."""
        w = self.window_size
        pad_len = max(length - (w + 1), 0)
        start = max((w + 1) - length, 0)
        if pad_len > 0:
            emb = jnp.pad(emb, ((0, 0), (pad_len, pad_len), (0, 0)))
        return emb[:, start:start + 2 * length - 1]


class RelativeFFTBlock(nn.Module):
    """Stack of (relative self-attention + LN + conv FFN + LN) layers
    (`model/blocks.py:915-954`).  Mask is [B, L, 1] float, 1=valid."""

    hidden_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    dropout: float = 0.0
    window_size: int = 4

    @nn.compact
    def __call__(self, x, mask, train=False):
        attn_mask = (mask[:, None, :, 0] > 0)[:, :, None, :] & \
                    (mask[:, None, :, 0] > 0)[:, :, :, None]  # [B,1,L,L]
        for i in range(self.n_layers):
            x = x * mask
            y = RelativeSelfAttention(
                self.hidden_channels, self.n_heads, self.window_size,
                self.dropout, name=f"attn_{i}")(x, attn_mask, train=train)
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
            x = LayerNorm(name=f"norm1_{i}")(x + y)
            y = FFN(self.hidden_channels, self.kernel_size, self.dropout,
                    name=f"ffn_{i}")(x, mask, train=train)
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
            x = LayerNorm(name=f"norm2_{i}")(x + y)
        return x * mask


class WordToPhonemeAttention(nn.Module):
    """Cross-attention Q=frames, K/V=phonemes with mapping/query masks
    applied multiplicatively post-softmax (`model/blocks.py:673-768`)."""

    n_heads: int
    d_model: int

    @nn.compact
    def __call__(self, q, k, v, key_mask, query_mask, map_mask,
                 attn_prior=None, train=False):
        # q: [B, T, C]; k, v: [B, P, C]
        # key_mask [B, P] bool; query_mask [B, T] bool; map_mask [B, T, P] bool
        B, T, C = q.shape
        P = k.shape[1]
        d_k = C // self.n_heads
        residual = q

        def split(t, L):
            return t.reshape(B, L, self.n_heads, d_k).transpose(0, 2, 1, 3)

        qh = split(LinearNorm(C, name="w_qs")(q), T)
        kh = split(LinearNorm(C, name="w_ks")(k), P)
        vh = split(LinearNorm(C, name="w_vs")(v), P)

        scores = jnp.einsum("bhtd,bhpd->bhtp", qh, kh,
                            preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(d_k)
        scores = jnp.where(key_mask[:, None, None, :], scores, NEG_INF)
        if attn_prior is not None:
            # CTC-helper mode: renormalize in log space and add the prior.
            scores = jax.nn.log_softmax(scores, axis=-1) + jnp.log(
                attn_prior.transpose(0, 2, 1)[:, None] + 1e-8)
        attn_logprob = scores  # [B, H, T, P]

        attn = jax.nn.softmax(scores, axis=-1)
        attn = attn * query_mask[:, None, :, None]
        attn_raw = attn
        attn = attn * map_mask[:, None, :, :]

        out = jnp.einsum("bhtp,bhpd->bhtd", attn, vh,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
        out = LinearNorm(C, name="fc")(out)
        out = out + residual
        return out, (attn, attn_raw), attn_logprob


class VariancePredictor(nn.Module):
    """Duration/pitch/energy predictor: (conv-relu-LN-dropout) x2 + linear
    (`model/linguistic_encoder.py:419-478`); mask applied multiplicatively."""

    filter_size: int
    kernel_size: int
    dropout: float

    @nn.compact
    def __call__(self, x, mask, train=False):
        for i in range(2):
            x = Conv1d(self.filter_size, self.kernel_size, name=f"conv_{i}")(x)
            x = jax.nn.relu(x)
            x = nn.LayerNorm(epsilon=1e-5, name=f"ln_{i}")(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        out = nn.Dense(1, name="proj")(x)[..., 0]
        if mask is not None:
            out = out * mask.astype(out.dtype)
        return out
