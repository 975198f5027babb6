"""DiffWave-style conditional denoiser (`model/modules.py:382-446` and
`model/blocks.py:1133-1176` in the reference), channel-last.

The hot path of both training and synthesis: 20 gated residual blocks of
(conv-k3 -> gate -> two 1x1 projections).  Channel-last [B, T, C] keeps every
conv an MXU matmul over the feature axis; the whole stack fuses well under
XLA.  `mixgantts_tpu.ops.pallas` carries a fused-kernel variant of the
residual stack for further HBM-traffic reduction.
"""

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import Conv1d, LinearNorm, StepEmbeddingMLP


class ResidualBlock(nn.Module):
    residual_channels: int

    @nn.compact
    def __call__(self, x, cond, step_emb, spk_emb=None):
        # x: [B, T, C]; cond: [B, T, H]; step_emb: [B, C]; spk_emb: [B, H]|None
        C = self.residual_channels
        step = LinearNorm(C, name="diffusion_projection")(step_emb)[:, None, :]
        conditioner = Conv1d(C, 1, name="conditioner_projection")(cond)
        residual = y = x + step
        y = y + conditioner
        if spk_emb is not None:
            y = y + LinearNorm(C, name="speaker_projection")(spk_emb)[:, None, :]
        y = Conv1d(2 * C, 3, name="conv_layer")(y)
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        y = Conv1d(2 * C, 1, name="output_projection")(y)
        x_out, skip = jnp.split(y, 2, axis=-1)
        return (x_out + residual) / math.sqrt(2.0), skip


class Denoiser(nn.Module):
    n_mels: int = 80
    d_encoder: int = 256
    residual_channels: int = 256
    residual_layers: int = 20
    multi_speaker: bool = False
    # route the residual stack through the fused Pallas kernel
    # (`ops/pallas.py`); single-speaker inference only — the speaker
    # projection and autodiff take the flax path.  None = auto: kernel on
    # real TPU for batched inference only.  Measured at the LJSpeech
    # flagship scale (C=256, L=20, one v5e chip, acoustic pass): at B=1
    # XLA's own fusion of the block loop wins (~0.30-0.36 ms vs ~0.44 ms —
    # XLA already feeds the MXU bf16 operands and the kernel's tile-gather
    # prologue dominates), while at B=8 the kernel wins ~20% (0.33 vs
    # 0.41 ms at T=864) because the per-layer activation round-trips it
    # eliminates scale with batch.
    fused: "bool | None" = None

    @nn.compact
    def __call__(self, x_t, t, cond, spk_emb=None):
        """x_t: [B, T, n_mels] noisy mel; t: [B] int diffusion step;
        cond: [B, T, H]; spk_emb: [B, H] or None.  Returns x0 pred
        [B, T, n_mels]."""
        C = self.residual_channels
        x = Conv1d(C, 1, name="input_projection")(x_t)
        x = jax.nn.relu(x)
        step_emb = StepEmbeddingMLP(C, C, name="mlp")(t)
        if not self.multi_speaker:
            spk_emb = None

        fused = self.fused
        if fused is None:  # auto by static shape: batched inference only
            fused = (jax.default_backend() in ("tpu", "axon")
                     and x.shape[0] >= 2)
        use_fused = (fused and spk_emb is None
                     and not self.is_initializing())
        if use_fused:
            from ..ops.pallas import fused_residual_stack, \
                stack_denoiser_params
            stacked = stack_denoiser_params(self.variables["params"])
            # the kernel accumulates in fp32 scratch; its MXU operand
            # dtype follows the params (bf16 under the mixed-precision
            # serving path), so no cast is needed here
            x, skip_sum = fused_residual_stack(x, cond, step_emb, stacked)
        else:
            skip_sum = jnp.zeros_like(x)
            for i in range(self.residual_layers):
                x, skip = ResidualBlock(C, name=f"res_{i}")(
                    x, cond, step_emb, spk_emb)
                skip_sum = skip_sum + skip
        x = skip_sum / math.sqrt(self.residual_layers)
        x = Conv1d(C, 1, name="skip_projection")(x)
        x = jax.nn.relu(x)
        # zero-initialized output projection (reference zeroes its weights)
        x = Conv1d(self.n_mels, 1, name="output_projection",
                   kernel_init=nn.initializers.zeros)(x)
        return x
