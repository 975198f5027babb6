"""MelGAN generator (descript/melgan-neurips architecture), flax channel-last.

Parity target: the torch.hub MelGAN path of the reference
(`utils/model.py:80-90,111-112` — "melgan-neurips" with ratios 8/8/2/2,
ngf 32, 3 residual layers; input mel is divided by ln(10) before inversion).
The reference downloads weights from torch.hub; here the architecture is
in-repo and weights load through `convert_torch_melgan`.
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class MelGANResnetBlock(nn.Module):
    dim: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        y = jax.nn.leaky_relu(x, 0.2)
        # reflect-padded dilated conv (torch ReflectionPad1d(dilation))
        y = jnp.pad(y, ((0, 0), (self.dilation, self.dilation), (0, 0)),
                    mode="reflect")
        y = nn.Conv(self.dim, (3,), kernel_dilation=(self.dilation,),
                    padding="VALID", name="block_conv")(y)
        y = jax.nn.leaky_relu(y, 0.2)
        y = nn.Conv(self.dim, (1,), name="block_out")(y)
        shortcut = nn.Conv(self.dim, (1,), name="shortcut")(x)
        return shortcut + y


class MelGANGenerator(nn.Module):
    n_mels: int = 80
    ngf: int = 32
    n_residual_layers: int = 3
    ratios: Sequence[int] = (8, 8, 2, 2)

    @nn.compact
    def __call__(self, mel):
        """mel: [B, T, n_mels] -> waveform [B, T * prod(ratios)]."""
        mult = int(2 ** len(self.ratios))
        x = jnp.pad(mel, ((0, 0), (3, 3), (0, 0)), mode="reflect")
        x = nn.Conv(mult * self.ngf, (7,), padding="VALID", name="conv_in")(x)
        for i, r in enumerate(self.ratios):
            x = jax.nn.leaky_relu(x, 0.2)
            ch = mult * self.ngf // 2
            x = nn.ConvTranspose(ch, (2 * r,), strides=(r,), padding="VALID",
                                 transpose_kernel=True, name=f"ups_{i}")(x)
            # torch ConvTranspose1d(k=2r, stride=r, padding=r//2+r%2,
            # output_padding=r%2): crop to T*r
            lo = r // 2 + r % 2
            hi = x.shape[1] - (mel.shape[1] * int(np.prod(self.ratios[:i + 1]))
                               + lo)
            x = x[:, lo:x.shape[1] - max(hi, 0)]
            for j in range(self.n_residual_layers):
                x = MelGANResnetBlock(ch, 3 ** j, name=f"res_{i}_{j}")(x)
            mult //= 2
        x = jax.nn.leaky_relu(x, 0.2)
        x = jnp.pad(x, ((0, 0), (3, 3), (0, 0)), mode="reflect")
        x = nn.Conv(1, (7,), padding="VALID", name="conv_out")(x)
        return jnp.tanh(x)[..., 0]


def convert_torch_melgan(state_dict):
    """Map the descript MelGAN generator state_dict onto the flax tree.
    The torch model is a flat nn.Sequential ("model.N..."); indices follow
    the published architecture (conv_in at 1, per-ratio blocks of
    [leaky, convT, 3 resblocks], conv_out at the end)."""
    from .hifigan import fold_weight_norm

    def get(prefix):
        if prefix + ".weight_v" in state_dict:
            w = fold_weight_norm(state_dict[prefix + ".weight_v"],
                                 state_dict[prefix + ".weight_g"])
        else:
            w = np.asarray(state_dict[prefix + ".weight"])
        return w, np.asarray(state_dict[prefix + ".bias"])

    def plain(prefix):
        w, b = get(prefix)
        return {"kernel": np.transpose(w, (2, 1, 0)), "bias": b}

    def transposed(prefix):
        w, b = get(prefix)
        return {"kernel": np.transpose(w, (2, 1, 0)), "bias": b}

    params = {"conv_in": plain("model.1")}
    idx = 2
    ratios = (8, 8, 2, 2)
    for i, _ in enumerate(ratios):
        idx += 1  # leaky relu
        params[f"ups_{i}"] = transposed(f"model.{idx}")
        idx += 1
        for j in range(3):
            params[f"res_{i}_{j}"] = {
                "block_conv": plain(f"model.{idx}.block.2"),
                "block_out": plain(f"model.{idx}.block.4"),
                "shortcut": plain(f"model.{idx}.shortcut"),
            }
            idx += 1
    idx += 1  # leaky relu
    idx += 1  # reflection pad
    params["conv_out"] = plain(f"model.{idx}")
    return jax.tree_util.tree_map(jnp.asarray, params)
