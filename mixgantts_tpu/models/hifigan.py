"""HiFi-GAN V1 generator (flax, channel-last).

Parity target: `hifigan/models.py:20-174` + `hifigan/config.json` in the
reference — conv_pre(k7) -> 4 x [leaky_relu -> ConvTranspose (rates 8/8/2/2,
kernels 16/16/4/4) -> 3-kernel MRF resblock stack averaged] -> leaky_relu ->
conv_post(k7) -> tanh.  Weight-normed torch convs are folded to plain convs
at conversion time (`fold_weight_norm`), matching `remove_weight_norm` at
load (`hifigan/models.py` generator.remove_weight_norm()).

Transposed convs use VALID padding + crop so converted torch weights are
numerically exact: torch's ConvTranspose1d(stride=u, padding=(k-u)//2)
equals the VALID transpose cropped by (k-u)//2 on both ends.
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LRELU_SLOPE = 0.1


def subpixel_upsample(x, kernel, bias, u, k, depth_to_space=True):
    """ConvTranspose1d(stride=u, kernel=k, VALID, crop (k-u)//2) as a dense
    stride-1 conv + depth-to-space.

    depth_to_space=False returns the PRE-interleave tensor [B, T, u*C_out]
    (lane r*C_out + c = output frame t*u + r, channel c) with the bias
    already added.  That layout is exactly the time-folded layout the
    fused MRF kernel consumes (`ops/pallas_vocoder.mrf_stack_folded` with
    prefolded=True), so the folded stages skip the audio-rate interleave
    copy entirely — `y.reshape(B, T*u, C_out)` of it equals the
    depth_to_space=True output bit-for-bit.

    Mathematically identical (same multiply-adds, reordered): on TPU,
    XLA lowers strided transposed convs to zero-stuffing `pad` ops that
    copy u x the data through HBM at audio rate — the dominant cost of
    HiFi-GAN synthesis.  The sub-pixel form computes all u output phases
    of a frame as u*C_out channels of one MXU-friendly dense conv, then
    interleaves them with a reshape.

    kernel: flax ConvTranspose(transpose_kernel=True) layout [k, C_out,
    C_in], which scatters y[t*u + q] += x[t] @ K[q]; the phase-r tap j of
    the dense kernel is transpose tap K[j*u + r + c] (pinned by
    test_vocoder parity tests).
    """
    kk, c_out, c_in = kernel.shape
    assert kk == k
    c = (k - u) // 2
    # phase r of output position i*u + r sums x[i - j] * K_t[j*u + r + c]
    # over the j with the tap index in [0, k)
    j_min = -((c + u - 1) // u)
    j_max = (k - 1 - c) // u
    w = j_max - j_min + 1
    # dense conv out[i] = sum_a x[i + a - j_max] * W[a], a = j_max - j.
    # Build [w, c_in, u * c_out] with zeros for out-of-range taps.
    dense = jnp.zeros((w, c_in, u * c_out), kernel.dtype)
    for a in range(w):
        j = j_max - a  # x index offset: x[i - j]
        for r in range(u):
            tap = j * u + r + c
            if 0 <= tap < k:
                # transpose_kernel=True scatters y[t*u+q] += x[t]*K[q]
                dense = dense.at[a, :, r * c_out:(r + 1) * c_out].set(
                    jnp.transpose(kernel[tap], (1, 0)))
    B, T, _ = x.shape
    y = jax.lax.conv_general_dilated(
        x, dense, window_strides=(1,), padding=[(j_max, -j_min)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32)
    if not depth_to_space:
        return (y + jnp.tile(bias, u)).astype(x.dtype)
    y = y.reshape(B, T * u, c_out) + bias
    return y.astype(x.dtype)


class SubpixelUpsample(nn.Module):
    """Drop-in ConvTranspose replacement: same param names ('kernel' in
    the [k, C_out, C_in] transpose_kernel=True layout, 'bias') so
    converted checkpoints load unchanged."""

    channels: int
    kernel_size: int
    stride: int

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.channels, x.shape[-1]))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        return subpixel_upsample(x, kernel, bias, self.stride,
                                 self.kernel_size)


class ResBlock1(nn.Module):
    channels: int
    kernel_size: int
    dilations: Sequence[int] = (1, 3, 5)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            xt = nn.Conv(self.channels, (self.kernel_size,),
                         kernel_dilation=(d,), padding="SAME",
                         name=f"convs1_{i}")(xt)
            xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
            xt = nn.Conv(self.channels, (self.kernel_size,),
                         padding="SAME", name=f"convs2_{i}")(xt)
            x = x + xt
        return x


class HiFiGANGenerator(nn.Module):
    n_mels: int = 80
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))
    # sub-pixel upsampling: numerically identical to the transposed conv
    # but avoids XLA's zero-stuffing pads (the dominant synthesis cost);
    # parameters keep the ConvTranspose layout either way
    subpixel: bool = True

    @nn.compact
    def __call__(self, mel):
        """mel: [B, T, n_mels] log-mel -> waveform [B, T * prod(rates)]."""
        x = nn.Conv(self.upsample_initial_channel, (7,), padding="SAME",
                    name="conv_pre")(mel)
        for i, (u, k) in enumerate(zip(self.upsample_rates,
                                       self.upsample_kernel_sizes)):
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            if self.subpixel:
                x = SubpixelUpsample(ch, k, u, name=f"ups_{i}")(x)
            else:
                x = nn.ConvTranspose(ch, (k,), strides=(u,),
                                     padding="VALID", transpose_kernel=True,
                                     name=f"ups_{i}")(x)
                crop = (k - u) // 2
                if crop > 0:
                    x = x[:, crop:-crop]
            acc = None
            for j, (rk, rd) in enumerate(zip(self.resblock_kernel_sizes,
                                             self.resblock_dilation_sizes)):
                y = ResBlock1(ch, rk, tuple(rd),
                              name=f"resblocks_{i}_{j}")(x)
                acc = y if acc is None else acc + y
            x = acc / len(self.resblock_kernel_sizes)
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = nn.Conv(1, (7,), padding="SAME", name="conv_post")(x)
        return jnp.tanh(x)[..., 0]

    @classmethod
    def from_config(cls, config):
        return cls(
            n_mels=config.get("num_mels", 80),
            upsample_rates=tuple(config["upsample_rates"]),
            upsample_kernel_sizes=tuple(config["upsample_kernel_sizes"]),
            upsample_initial_channel=config["upsample_initial_channel"],
            resblock_kernel_sizes=tuple(config["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in config["resblock_dilation_sizes"]),
        )


def fused_apply(params, mel, config, interpret=None, compute_dtype=None,
                fold_channels=None):
    """Pure-function HiFi-GAN forward with the Pallas-fused MRF stack
    (`ops/pallas_vocoder.mrf_stack`): each stage's 18 resblock convs and
    leaky_relus run in one kernel with the signal tile resident in VMEM,
    instead of round-tripping audio-rate activations through HBM per op.
    Numerically equivalent to `HiFiGANGenerator.__call__` on the same
    params (see test_vocoder.py).

    compute_dtype (default bf16 on TPU, fp32 elsewhere) sets the
    activation dtype of the XLA portions (upsample convs, C > 128 MRF
    stage, conv_post); conv accumulation stays fp32.  The audio path is
    bandwidth-bound, so bf16 activations are a ~2x bandwidth saving;
    waveform SNR vs the fp32 path is validated in test_vocoder.py.

    fold_channels: stage widths to run TIME-FOLDED with the upsample's
    depth-to-space fused away (the sub-pixel pre-interleave output IS the
    folded layout — see subpixel_upsample / mrf_stack_folded).  Default
    None = auto: every lane-divisible narrow stage (C <= 64 with
    128 % C == 0) folds, so non-V1 configs with C=16/8 tails keep their
    folding; pass an explicit tuple to override.  For V1's 256/128/64/32
    stages auto means (64, 32): measured on-chip WITH the preceding
    upsample (u=2, k=4, `bench_mrf_stage.py fused_upsample`) the folds
    win 1.96x at C=32 and 1.06x at C=64 (pipeline RTF
    0.001145 -> 0.001118), and the narrower the stage the larger the
    folding win (unfolded C=16 would waste 112/128 of every lane on the
    highest-rate stage).  The
    prefused fold and fold-after-d2s measure identical (+-1%): XLA's
    d2s here is contiguous reshapes around the bias add, already free —
    the prefused path simply states that fact in the graph (numbers in
    CLAUDE.md)."""
    from ..ops.pallas_vocoder import (
        mrf_stack, mrf_stack_folded, stack_mrf_params,
        stack_mrf_params_folded,
    )

    if compute_dtype is None:
        on_tpu = jax.default_backend() in ("tpu", "axon")
        compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    compute_dtype = jnp.dtype(compute_dtype)
    if compute_dtype != jnp.float32:
        params = jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
        mel = mel.astype(compute_dtype)

    def conv1d(x, p, dilation=1):
        y = jax.lax.conv_general_dilated(
            x, p["kernel"], window_strides=(1,), padding="SAME",
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32)
        return (y + p["bias"]).astype(x.dtype)

    def branchwise_mrf(x, stage, rks, dils):
        # C > 128: the full stage weights exceed VMEM, but one branch's
        # fit — run the same kernel once per branch and average (the
        # signal re-streams 3x, dwarfed by this stage's 32x-lower rate).
        # The whole-stage streamed-weight alternative
        # (`mrf_stack_streamed`) measured 0.36x on the real C=256 stage
        # (1.33 vs 3.70 ms, `bench_mrf_stage.py c256`) — rejected with
        # numbers, see ops/pallas_vocoder.py
        acc = None
        for j, rk in enumerate(rks):
            st = stack_mrf_params(params, stage, (rk,), dils,
                                  branches=[(j, rk)])
            y = mrf_stack(x, st, (rk,), dils, interpret=interpret)
            acc = y if acc is None else acc + y
        return acc / len(rks)

    rates = tuple(config["upsample_rates"])
    kernels = tuple(config["upsample_kernel_sizes"])
    rks = tuple(config["resblock_kernel_sizes"])
    dils = tuple(tuple(d) for d in config["resblock_dilation_sizes"])
    # the fused kernel shares one dilation schedule across branches (true
    # for HiFi-GAN V1's [[1,3,5]]x3); per-branch dilations (V2/V3-style
    # configs) would silently run the wrong taps — fail loudly instead
    # (the flax path `HiFiGANGenerator.__call__` handles them fine)
    if any(d != dils[0] for d in dils):
        raise NotImplementedError(
            f"fused_apply requires identical resblock_dilation_sizes per "
            f"branch, got {dils}; use HiFiGANGenerator.apply instead")
    x = conv1d(mel, params["conv_pre"])
    for i, (u, k) in enumerate(zip(rates, kernels)):
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        p = params[f"ups_{i}"]
        C = p["kernel"].shape[1]  # [k, C_out, C_in]
        T_in = x.shape[1]
        F = 128 // C if (C < 128 and 128 % C == 0) else 0
        fold_this = (C <= 64 if fold_channels is None
                     else C in fold_channels)
        if F and fold_this and (T_in * u) % F == 0:
            # narrow stages waste (128 - C)/128 of every lane: fold F
            # time positions into the lane axis.  The upsample's
            # pre-interleave output [B, T_in, u*C] already IS the folded
            # layout (lane r*C + c = frame t*u + r), so the fold — and
            # the upsample's audio-rate depth-to-space copy — is free:
            # the regroup below is a contiguous reshape for any u/F.
            y = subpixel_upsample(x, p["kernel"], p["bias"], u, k,
                                  depth_to_space=False)
            xf = y.reshape(y.shape[0], T_in * u // F, F * C)
            st = stack_mrf_params_folded(params, i, F, rks, dils[0])
            x = mrf_stack_folded(xf, st, rks, dils[0], interpret=interpret,
                                 prefolded=True)
            continue
        x = subpixel_upsample(x, p["kernel"], p["bias"], u, k)
        if C <= 128:
            stacked = stack_mrf_params(params, i, rks, dils[0])
            x = mrf_stack(x, stacked, rks, dils[0], interpret=interpret)
        else:
            x = branchwise_mrf(x, i, rks, dils[0])
    x = jax.nn.leaky_relu(x, LRELU_SLOPE)
    x = conv1d(x, params["conv_post"])
    return jnp.tanh(x.astype(jnp.float32))[..., 0]


def fold_weight_norm(weight_v, weight_g):
    """Fold torch weight_norm (v, g) into a plain kernel: g * v / ||v||,
    the functional equivalent of `remove_weight_norm`."""
    v = np.asarray(weight_v)
    g = np.asarray(weight_g)
    norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def convert_torch_generator(state_dict, config):
    """Map a torch HiFi-GAN generator state_dict (weight-normed) onto the
    flax parameter tree.  Torch conv kernels are [out, in, k]; flax wants
    [k, in, out] (and transposed convs [k, out, in] with
    transpose_kernel=True -> torch layout [in, out, k] -> [k, out, in])."""

    def conv_kernel(prefix):
        if prefix + ".weight_v" in state_dict:
            w = fold_weight_norm(state_dict[prefix + ".weight_v"],
                                 state_dict[prefix + ".weight_g"])
        else:
            w = np.asarray(state_dict[prefix + ".weight"])
        return w

    def plain(prefix):
        w = conv_kernel(prefix)  # [out, in, k]
        return {"kernel": np.transpose(w, (2, 1, 0)),
                "bias": np.asarray(state_dict[prefix + ".bias"])}

    def transposed(prefix):
        w = conv_kernel(prefix)  # torch convT: [in, out, k]
        return {"kernel": np.transpose(w, (2, 1, 0)),
                "bias": np.asarray(state_dict[prefix + ".bias"])}

    params = {"conv_pre": plain("conv_pre"), "conv_post": plain("conv_post")}
    n_kernels = len(config["resblock_kernel_sizes"])
    for i in range(len(config["upsample_rates"])):
        params[f"ups_{i}"] = transposed(f"ups.{i}")
        for j in range(n_kernels):
            block = {}
            for c in range(len(config["resblock_dilation_sizes"][j])):
                block[f"convs1_{c}"] = plain(
                    f"resblocks.{i * n_kernels + j}.convs1.{c}")
                block[f"convs2_{c}"] = plain(
                    f"resblocks.{i * n_kernels + j}.convs2.{c}")
            params[f"resblocks_{i}_{j}"] = block
    return jax.tree_util.tree_map(jnp.asarray, params)
