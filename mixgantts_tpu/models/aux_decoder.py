"""Auxiliary FastSpeech2-style mel decoder + Tacotron2 PostNet.

Parity targets: `transformer/Models.py:103-171` (Decoder of FFTBlocks with
absolute sinusoidal positions), `transformer/SubLayers.py:8-93` (MHA with
post-residual LayerNorm, conv feed-forward), `transformer/Layers.py:67-137`
(PostNet: 5 x conv512 k5 + BatchNorm + tanh, residual added by the caller).
"""

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import LayerNorm, Conv1d, sinusoid_position_table, NEG_INF


class MultiHeadAttention(nn.Module):
    """Post-LN multi-head self-attention (`transformer/SubLayers.py:8-58`)."""

    n_heads: int
    dropout: float

    @nn.compact
    def __call__(self, x, attn_mask, train=False):
        B, L, C = x.shape
        d_k = C // self.n_heads
        residual = x

        def split(t):
            return t.reshape(B, L, self.n_heads, d_k).transpose(0, 2, 1, 3)

        q = split(nn.Dense(C, name="w_qs")(x))
        k = split(nn.Dense(C, name="w_ks")(x))
        v = split(nn.Dense(C, name="w_vs")(x))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(d_k)
        scores = jnp.where(attn_mask[:, None], scores, NEG_INF)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, C)
        out = nn.Dense(C, name="fc")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(out + residual)


class PositionwiseFeedForward(nn.Module):
    """conv(k) -> relu -> conv(1), post-residual LN
    (`transformer/SubLayers.py:61-93`)."""

    d_inner: int
    kernel_size: int
    dropout: float

    @nn.compact
    def __call__(self, x, train=False):
        residual = x
        y = Conv1d(self.d_inner, self.kernel_size, name="w_1")(x)
        y = jax.nn.relu(y)
        y = Conv1d(x.shape[-1], 1, name="w_2")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(y + residual)


class FFTBlock(nn.Module):
    """Self-attention + conv FFN with masked zeroing
    (`transformer/Layers.py:11-30`)."""

    n_heads: int
    d_inner: int
    kernel_size: int
    dropout: float

    @nn.compact
    def __call__(self, x, mask, attn_mask, train=False):
        x = MultiHeadAttention(self.n_heads, self.dropout, name="slf_attn")(
            x, attn_mask, train=train)
        x = x * mask[..., None]
        x = PositionwiseFeedForward(
            self.d_inner, self.kernel_size, self.dropout, name="pos_ffn")(
            x, train=train)
        return x * mask[..., None]


class Decoder(nn.Module):
    """FFT decoder with absolute sinusoidal positions
    (`transformer/Models.py:103-171`).  `mask` is True=valid."""

    hidden: int = 256
    n_layers: int = 6
    n_heads: int = 2
    d_inner: int = 1024
    kernel_size: int = 9
    dropout: float = 0.2
    max_seq_len: int = 1000

    @nn.compact
    def __call__(self, x, mask, train=False):
        B, L, C = x.shape
        # static shapes: L must not exceed the positional table
        table = sinusoid_position_table(self.max_seq_len + 1, self.hidden)
        x = x + jnp.asarray(table)[None, :L, :]
        attn_mask = mask[:, None, :] & mask[:, :, None]
        for i in range(self.n_layers):
            x = FFTBlock(self.n_heads, self.d_inner, self.kernel_size,
                         self.dropout, name=f"layer_{i}")(
                x, mask, attn_mask, train=train)
        return x


class PostNet(nn.Module):
    """Tacotron2 PostNet (`transformer/Layers.py:67-137`): five k5 convs with
    BatchNorm; tanh on all but the last; the residual add happens in the
    caller.  Returns the residual correction."""

    n_mels: int = 80
    embedding_dim: int = 512
    kernel_size: int = 5
    n_convs: int = 5

    @nn.compact
    def __call__(self, x, train=False):
        # x: [B, T, n_mels]
        for i in range(self.n_convs):
            last = i == self.n_convs - 1
            x = Conv1d(self.n_mels if last else self.embedding_dim,
                       self.kernel_size, name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f"bn_{i}")(x)
            if not last:
                x = jnp.tanh(x)
            x = nn.Dropout(0.5, deterministic=not train)(x)
        return x
