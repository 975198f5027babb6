"""Pallas TPU kernel: HiFi-GAN's fused MRF resblock stack.

Parity target: the per-stage multi-receptive-field stack of
`hifigan/models.py:20-174` in the reference — 3 parallel ResBlock branches
(kernel sizes 3/7/11), each a chain of 3 [leaky_relu -> dilated conv ->
leaky_relu -> conv] residual pairs (dilations 1/3/5), branch outputs
averaged.

Under plain XLA every conv and leaky_relu round-trips the audio-rate
activation ([B, T*256 samples, C] at the last stage) through HBM —
measured ~28 ms of a 31 ms synthesis.  This kernel keeps a signal tile
resident in VMEM across all 18 convs of a stage, with ALL stage weights
VMEM-resident too (6.5 MB bf16 at C=128 — they fit for every stage after
the first), so HBM traffic drops to one read + one write of the signal.

Layout
------
grid = (B, n_tiles); the whole 3-branch x 3-pair chain is unrolled in the
kernel body (dilations are static), weight blocks use constant index maps
so Pallas DMAs them once and leaves them resident.  Each conv runs as 11
shifted [tile_h, C] @ [C, C] MXU matmuls with fp32 accumulation; kernels
are zero-padded to 11 taps for a uniform weight block.

The first stage (C = 256) stays on XLA: its weights (26 MB bf16) exceed
VMEM and its frame rate is 32x lower than the last stage's, so it is not
the bottleneck.  `mrf_stack` refuses C > 128.

Halo: the worst-case receptive creep is the k=11 branch,
sum((5*d + 5) for d in (1,3,5)) = 60 frames; tiles carry H = 64 on both
sides and only the centre is written.  Positions outside the real
sequence are re-zeroed before every conv, which reproduces SAME
zero-padding exactly (leaky_relu(0) == 0).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1
TAPS = 11  # all kernels padded to the largest (k=11)
HALO = 64


def stack_mrf_params(params, stage, kernel_sizes=(3, 7, 11),
                     dilations=(1, 3, 5), branches=None):
    """HiFiGANGenerator param tree -> stacked per-(branch, pair) arrays.

    Returns dict with w1/w2 [3, 3, TAPS, C, C] (conv1 is the dilated one)
    and b1/b2 [3, 3, C]; taps are centred in the padded axis so tap t
    contributes at time offset (t - TAPS//2) * d.  `branches` restricts to
    a subset of (branch_index, kernel_size) pairs (single-branch calls for
    C > 128 stages whose full weights exceed VMEM).
    """
    if branches is None:
        branches = list(enumerate(kernel_sizes))
    w1, b1, w2, b2 = [], [], [], []
    for j, rk in branches:
        block = params[f"resblocks_{stage}_{j}"]
        w1j, b1j, w2j, b2j = [], [], [], []
        for c in range(len(dilations)):
            k1 = jnp.asarray(block[f"convs1_{c}"]["kernel"])
            k2 = jnp.asarray(block[f"convs2_{c}"]["kernel"])
            pad = (TAPS - rk) // 2
            w1j.append(jnp.pad(k1, ((pad, pad), (0, 0), (0, 0))))
            w2j.append(jnp.pad(k2, ((pad, pad), (0, 0), (0, 0))))
            b1j.append(jnp.asarray(block[f"convs1_{c}"]["bias"]))
            b2j.append(jnp.asarray(block[f"convs2_{c}"]["bias"]))
        w1.append(jnp.stack(w1j))
        b1.append(jnp.stack(b1j))
        w2.append(jnp.stack(w2j))
        b2.append(jnp.stack(b2j))
    return {"w1": jnp.stack(w1), "b1": jnp.stack(b1),
            "w2": jnp.stack(w2), "b2": jnp.stack(b2)}


def _shift(a, s, C, circular=False):
    """Static shift along the time (sublane) axis.

    `circular=True` uses a rotate instead of zero-fill concat copies: the
    wrapped rows are garbage, but every conv's receptive creep from a tile
    edge totals <= 60 < HALO frames, so the corruption never reaches the
    written tile centre (same argument as the halo itself).  Kept off in
    interpreter mode so CPU tests check the exact zero-padding path."""
    if s == 0:
        return a
    if circular:
        return jnp.roll(a, s, axis=0)
    z = jnp.zeros((abs(s), C), a.dtype)
    if s > 0:  # rows move down: out[i] = a[i - s]
        return jnp.concatenate([z, a[:-s]], axis=0)
    return jnp.concatenate([a[-s:], z], axis=0)


def _conv(t, w, b, d, C, nonzero_taps, circular=False):
    """Padded-11-tap dilated conv: out[i] = sum_t t[i + (tap-5)*d] @ W[tap].
    `nonzero_taps` statically skips the zero-padded taps of small kernels.

    For C < 128 the taps go into the CONTRACTION dimension of one matmul
    ([tile_h, rk*C] @ [rk*C, C]) instead of rk separate [C, C] matmuls:
    a per-tap matmul at C=32 uses ~6% of the 128x128 MXU, while rk*C
    fills the K axis.  At C = 128 a per-tap [128, 128] matmul already
    fills the array, so the concat copy is skipped."""
    half = TAPS // 2
    if C >= 128:
        acc = None
        for tap in nonzero_taps:
            r = jnp.dot(_shift(t, -(tap - half) * d, C, circular),
                        w[tap].astype(t.dtype),
                        preferred_element_type=jnp.float32)
            acc = r if acc is None else acc + r
        return acc + b
    t_cat = jnp.concatenate(
        [_shift(t, -(tap - half) * d, C, circular)
         for tap in nonzero_taps], axis=1)
    w_cat = w[nonzero_taps[0]:nonzero_taps[-1] + 1].reshape(
        len(nonzero_taps) * C, C)
    return jnp.dot(t_cat, w_cat.astype(t.dtype),
                   preferred_element_type=jnp.float32) + b


def _kernel(T, tile, kernel_sizes, dilations, circular, x_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, out_ref, y_s, acc_s):
    t_idx = pl.program_id(1)
    C = x_ref.shape[-1]
    tile_h = tile + 2 * HALO

    pos = (t_idx * tile - HALO
           + jax.lax.broadcasted_iota(jnp.int32, (tile_h, 1), 0))
    mask = ((pos >= 0) & (pos < T)).astype(jnp.float32)
    op_dtype = w1_ref.dtype

    # y/acc live in explicit scratch so the 9 unrolled pairs reuse two
    # buffers instead of 9+ stack temporaries (VMEM budget)
    for br, rk in enumerate(kernel_sizes):
        pad = (TAPS - rk) // 2
        taps = tuple(range(pad, TAPS - pad))
        y_s[:] = x_ref[0, 0].astype(jnp.float32)
        for p, d in enumerate(dilations):
            t = (jax.nn.leaky_relu(y_s[:], LRELU_SLOPE)
                 * mask).astype(op_dtype)
            t = _conv(t, w1_ref[br, p], b1_ref[br, p].astype(jnp.float32),
                      d, C, taps, circular)
            t = (jax.nn.leaky_relu(t, LRELU_SLOPE) * mask).astype(op_dtype)
            t = _conv(t, w2_ref[br, p], b2_ref[br, p].astype(jnp.float32),
                      1, C, taps, circular)
            y_s[:] = y_s[:] + t
        if br == 0:
            acc_s[:] = y_s[:]
        else:
            acc_s[:] = acc_s[:] + y_s[:]
    out_ref[0, 0] = (acc_s[HALO:HALO + tile] / len(kernel_sizes)).astype(
        out_ref.dtype)


def _auto_tile(T, C):
    """VMEM budget: buffers are lane-padded to 128, so the row budget is
    C-independent below 128; weights (resident) shrink with C."""
    # the taps-in-K concat buffer [tile_h, 11*C] dominates VMEM at large C;
    # tiles as large as fit, to amortize the 2*HALO=128-frame halo
    budget = 3072 if C < 128 else (1024 if C == 128 else 512)
    return min(budget, -(-T // 8) * 8)


def mrf_stack(x, stacked, kernel_sizes=(3, 7, 11), dilations=(1, 3, 5),
              tile=None, interpret=None, circular=None):
    """x [B, T, C] with C <= 128, stacked from `stack_mrf_params`.
    Returns the averaged 3-branch MRF output [B, T, C] — identical (fp32
    tolerance) to the ResBlock1 stack in models/hifigan.py."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if not interpret:
        # bf16 MXU operands / fp32 accumulation, matching XLA's default
        # TPU conv precision
        stacked = dict(stacked, w1=stacked["w1"].astype(jnp.bfloat16),
                       w2=stacked["w2"].astype(jnp.bfloat16))
    B, T, C = x.shape
    n_branch, n_pair = stacked["w1"].shape[:2]
    if C > 128 and n_branch > 1 and not interpret:
        raise ValueError(
            f"mrf_stack: C={C} > 128 with {n_branch} branches — stage "
            "weights exceed VMEM; run one single-branch call per branch")
    if tile is None:
        tile = _auto_tile(T, C)
    tile = min(tile, -(-max(8, T) // 8) * 8)
    n_t = pl.cdiv(T, tile)
    Tp = n_t * tile
    tile_h = tile + 2 * HALO

    b1 = stacked["b1"][:, :, None, :]  # [3, 3, 1, C]
    b2 = stacked["b2"][:, :, None, :]

    xp = jnp.pad(x, ((0, 0), (HALO, Tp - T + HALO), (0, 0)))
    gather = (np.arange(n_t)[:, None] * tile
              + np.arange(tile_h)[None, :])
    x_tiles = xp[:, gather]  # [B, n_t, tile_h, C]
    if not interpret and x_tiles.dtype == jnp.float32:
        # half the HBM stream + VMEM block footprint; the kernel promotes
        # to fp32 on load and accumulates in fp32 throughout
        x_tiles = x_tiles.astype(jnp.bfloat16)

    if circular is None:
        # measured: rotate beats the zero-fill concat only at C=32
        # (5.8 vs 7.5 ms for the T=221k stage); at C>=64 it is slower
        circular = (not interpret) and C <= 32
    kernel = functools.partial(_kernel, T, tile, tuple(kernel_sizes),
                               tuple(dilations), circular)
    const = lambda b, t: (0, 0, 0, 0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec((1, 1, tile_h, C), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),           # x_tiles
            # constant index maps: the stage weights are DMA'd once and
            # stay VMEM-resident across all tiles
            pl.BlockSpec((n_branch, n_pair, TAPS, C, C), const,
                         memory_space=pltpu.VMEM),           # w1
            pl.BlockSpec((n_branch, n_pair, 1, C),
                         lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),           # b1
            pl.BlockSpec((n_branch, n_pair, TAPS, C, C), const,
                         memory_space=pltpu.VMEM),           # w2
            pl.BlockSpec((n_branch, n_pair, 1, C),
                         lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),           # b2
        ],
        out_specs=pl.BlockSpec((1, 1, tile, C), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_t, tile, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h, C), jnp.float32),
            pltpu.VMEM((tile_h, C), jnp.float32),
        ],
        interpret=interpret,
    )(x_tiles, stacked["w1"], b1, stacked["w2"], b2)

    return out.reshape(B, Tp, C)[:, :T]
