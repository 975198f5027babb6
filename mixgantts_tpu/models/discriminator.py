"""JCU (joint conditional/unconditional) discriminator.

Parity target: `model/mixgantts.py:186-288` in the reference — shared conv
trunk over concat(x_{t-1}, x_t), then conditional (+ diffusion-step / speaker
embeddings) and unconditional conv branches; every layer's activations are
returned for feature matching, last element = logits.  Channel-last.
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import Conv1d, LinearNorm, StepEmbeddingMLP


class JCUDiscriminator(nn.Module):
    n_mels: int = 80
    residual_channels: int = 256
    n_layer: int = 3
    n_uncond_layer: int = 2
    n_cond_layer: int = 2
    n_channels: Sequence[int] = (64, 128, 512, 128, 1)
    kernel_sizes: Sequence[int] = (3, 5, 5, 5, 3)
    strides: Sequence[int] = (1, 2, 2, 1, 1)
    multi_speaker: bool = False

    @nn.compact
    def __call__(self, x_ts, x_t_prevs, spk_emb, t):
        """x_ts, x_t_prevs: [B, T, n_mels]; spk_emb: [B, H] | None; t: [B].
        Returns (cond_feats, uncond_feats) lists, logits last."""
        conv_init = nn.initializers.normal(0.02)
        x = LinearNorm(2 * self.n_mels, name="input_projection")(
            jnp.concatenate([x_t_prevs, x_ts], axis=-1))
        step = StepEmbeddingMLP(
            self.residual_channels, self.n_channels[self.n_layer - 1],
            name="mlp")(t)[:, None, :]

        cond_feats, uncond_feats = [], []
        for i in range(self.n_layer):
            x = Conv1d(self.n_channels[i], self.kernel_sizes[i],
                       stride=self.strides[i], kernel_init=conv_init,
                       name=f"conv_{i}")(x)
            x = jax.nn.leaky_relu(x, 0.2)
            cond_feats.append(x)
            uncond_feats.append(x)

        x_cond = x + step
        if self.multi_speaker and spk_emb is not None:
            x_cond = x_cond + LinearNorm(
                self.n_channels[self.n_layer - 1], name="spk_mlp")(
                spk_emb)[:, None, :]
        x_uncond = x

        for j in range(self.n_layer, self.n_layer + self.n_cond_layer):
            x_cond = Conv1d(self.n_channels[j], self.kernel_sizes[j],
                            stride=self.strides[j], kernel_init=conv_init,
                            name=f"cond_conv_{j}")(x_cond)
            x_cond = jax.nn.leaky_relu(x_cond, 0.2)
            cond_feats.append(x_cond)

        for j in range(self.n_layer, self.n_layer + self.n_uncond_layer):
            x_uncond = Conv1d(self.n_channels[j], self.kernel_sizes[j],
                              stride=self.strides[j], kernel_init=conv_init,
                              name=f"uncond_conv_{j}")(x_uncond)
            x_uncond = jax.nn.leaky_relu(x_uncond, 0.2)
            uncond_feats.append(x_uncond)
        return cond_feats, uncond_feats
