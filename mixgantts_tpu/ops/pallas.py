"""Pallas TPU kernel: the denoiser's fused residual stack.

The DiffWave-style denoiser (`model/modules.py:382-446` in the reference) is
L=20 gated residual blocks; under plain XLA each block round-trips its
[B, T, 2C] gated intermediate through HBM.  This kernel keeps the frame tile
resident in VMEM across ALL layers and streams only the per-layer weights,
so HBM traffic drops from O(L * T * C) activations to one read of x/cond and
one write of x/skip plus the weights.

Layout
------
grid = (B, n_tiles, L), executed sequentially with the layer axis innermost:
the VMEM scratch carrying the evolving x tile and the skip accumulator
persists across the L grid steps of a tile, while the BlockSpec index maps
stream layer l's weights into VMEM (Pallas double-buffers them
automatically).

Halo: a k=3 conv shrinks the correct region of a tile by one frame per
layer, so each tile is loaded with an H = L frame halo on both sides and
only the tile's center is written back.  Frames outside the real sequence
are re-masked every layer, matching the zero 'SAME' padding of the
reference convs.

Per block (ResidualBlock, `model/blocks.py:1133-1176`):
    y0 = x + step_proj;  y = (y0 + cond @ Wc + bc) * in_seq_mask
    z  = conv_k3(y) -> gate = sigmoid(z_g) * tanh(z_f)
    o  = gate @ Wo + bo;  x' = (o_x + y0) / sqrt(2);  skip += o_s
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stack(params, path):
    leaves = []
    i = 0
    while f"res_{i}" in params:
        node = params[f"res_{i}"]
        for key in path:
            node = node[key]
        leaves.append(node)
        i += 1
    return jnp.stack(leaves, axis=0)


def stack_denoiser_params(params):
    """Denoiser param subtree -> stacked per-layer arrays for the kernel.

    Returns dict with conv_w [L,3,C,2C], conv_b [L,2C], cond_w [L,Hc,C],
    cond_b [L,C], step_w [L,C,C], step_b [L,C], out_w [L,C,2C], out_b [L,2C].
    """
    return {
        "conv_w": _stack(params, ("conv_layer", "conv", "kernel")),
        "conv_b": _stack(params, ("conv_layer", "conv", "bias")),
        "cond_w": _stack(params, ("conditioner_projection", "conv",
                                  "kernel"))[:, 0],
        "cond_b": _stack(params, ("conditioner_projection", "conv", "bias")),
        "step_w": _stack(params, ("diffusion_projection", "linear",
                                  "kernel")),  # LinearNorm has no bias
        "out_w": _stack(params, ("output_projection", "conv", "kernel"))[:, 0],
        "out_b": _stack(params, ("output_projection", "conv", "bias")),
    }


def _kernel(T, L, tile, step_ref, x_ref, condp_ref,
            conv_w_ref, conv_b_ref, out_w_ref, out_b_ref,
            x_out_ref, skip_out_ref, x_s, skip_s):
    H = L
    tile_h = tile + 2 * H
    t_idx = pl.program_id(1)
    l = pl.program_id(2)

    @pl.when(l == 0)
    def _():
        x_s[:] = x_ref[0, 0].astype(x_s.dtype)
        skip_s[:] = jnp.zeros_like(skip_s)

    C = x_s.shape[-1]
    # in-sequence mask for this tile (positions relative to the real axis)
    pos = (t_idx * tile - H
           + jax.lax.broadcasted_iota(jnp.int32, (tile_h, 1), 0))
    mask = ((pos >= 0) & (pos < T)).astype(x_s.dtype)

    # operand dtype = the weights' dtype; scratch accumulation and all
    # dot outputs stay fp32.  The caller downcasts fp32 weights to bf16
    # on real TPU to match XLA's default matmul precision (flax convs
    # run bf16-operand/fp32-accum there too).
    op_dtype = conv_w_ref.dtype
    y0 = x_s[:] + step_ref[0, 0].astype(jnp.float32)
    y = ((y0 + condp_ref[0, 0, 0].astype(jnp.float32))
         * mask).astype(op_dtype)

    # k=3 conv as one MXU matmul over [y_{t-1} | y_t | y_{t+1}]
    zero = jnp.zeros((1, C), dtype=y.dtype)
    y_prev = jnp.concatenate([zero, y[:-1]], axis=0)
    y_next = jnp.concatenate([y[1:], zero], axis=0)
    y_cat = jnp.concatenate([y_prev, y, y_next], axis=1)  # [tile_h, 3C]
    w_cat = conv_w_ref[0].reshape(3 * C, 2 * C)
    z = jnp.dot(y_cat, w_cat, preferred_element_type=jnp.float32)
    z = z + conv_b_ref[0].astype(jnp.float32)

    gate, filt = z[:, :C], z[:, C:]
    g = (jax.nn.sigmoid(gate) * jnp.tanh(filt)).astype(op_dtype)
    o = jnp.dot(g, out_w_ref[0], preferred_element_type=jnp.float32)
    o = o + out_b_ref[0].astype(jnp.float32)

    x_s[:] = (o[:, :C] + y0) * (1.0 / math.sqrt(2.0))
    skip_s[:] = skip_s[:] + o[:, C:]

    @pl.when(l == L - 1)
    def _():
        x_out_ref[0, 0] = x_s[H:H + tile].astype(x_out_ref.dtype)
        skip_out_ref[0, 0] = skip_s[H:H + tile].astype(skip_out_ref.dtype)


def fused_residual_stack(x, cond, step_emb, stacked, tile=None,
                         interpret=None):
    """x [B,T,C], cond [B,T,Hc], step_emb [B,C], stacked from
    `stack_denoiser_params`.  Returns (x_final [B,T,C], skip_sum [B,T,C]) —
    identical (to fp32 tolerance) to looping the flax ResidualBlocks.

    tile=None auto-picks: one tile spanning T when T <= 1024 (halo cost
    amortizes best; measured 1.35x over the XLA loop at T=864), else 512.
    interpret=None auto-selects the Pallas interpreter off-TPU (CPU tests)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if not interpret and x.dtype == jnp.float32:
        # match XLA's default TPU matmul precision: bf16 MXU operands,
        # fp32 accumulation (interpreter/CPU stays fp32-exact for tests)
        stacked = dict(stacked,
                       conv_w=stacked["conv_w"].astype(jnp.bfloat16),
                       out_w=stacked["out_w"].astype(jnp.bfloat16))
    B, T, C = x.shape
    Hc = cond.shape[-1]
    L = stacked["conv_w"].shape[0]
    H = L
    if tile is None:
        tile = -(-T // 8) * 8 if T <= 1024 else 512
    tile = min(tile, -(-max(8, T) // 8) * 8)
    n_t = pl.cdiv(T, tile)
    Tp = n_t * tile
    tile_h = tile + 2 * H

    # step projections for every layer: [L, B, 1, C] (tiny matmul, stays
    # XLA); the singleton row keeps Mosaic's last-two-dims block tiling
    # rule satisfied (blocks must tile (8, 128) or span the full dims)
    step_projs = jnp.einsum("bc,lcd->lbd", step_emb,
                            stacked["step_w"])[:, :, None, :]
    conv_b = stacked["conv_b"][:, None, :]   # [L, 1, 2C]
    out_b = stacked["out_b"][:, None, :]     # [L, 1, 2C]

    # conditioner projections for ALL layers as one MXU-sized XLA matmul
    # ([B*T, Hc] @ [Hc, L*C] beats 20 small per-layer matmuls inside the
    # kernel); cond is layer-invariant so this hoists cleanly
    condp_all = jnp.einsum("bth,lhc->lbtc", cond, stacked["cond_w"])
    condp_all = condp_all + stacked["cond_b"][:, None, None, :]

    # haloed, non-overlapping tiles gathered on the host side of the kernel
    xp = jnp.pad(x, ((0, 0), (H, Tp - T + H), (0, 0)))
    cpp = jnp.pad(condp_all, ((0, 0), (0, 0), (H, Tp - T + H), (0, 0)))
    gather = (np.arange(n_t)[:, None] * tile
              + np.arange(tile_h)[None, :])  # [n_t, tile_h]
    x_tiles = xp[:, gather]          # [B, n_t, tile_h, C]
    condp_tiles = cpp[:, :, gather]  # [L, B, n_t, tile_h, C]

    kernel = functools.partial(_kernel, T, L, tile)
    x_out, skip_out = pl.pallas_call(
        kernel,
        grid=(B, n_t, L),
        in_specs=[
            pl.BlockSpec((1, 1, 1, C), lambda b, t, l: (l, b, 0, 0),
                         memory_space=pltpu.VMEM),          # step_projs
            pl.BlockSpec((1, 1, tile_h, C), lambda b, t, l: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),          # x_tiles
            pl.BlockSpec((1, 1, 1, tile_h, C),
                         lambda b, t, l: (l, b, t, 0, 0),
                         memory_space=pltpu.VMEM),          # condp_tiles
            pl.BlockSpec((1, 3, C, 2 * C), lambda b, t, l: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),          # conv_w
            pl.BlockSpec((1, 1, 2 * C), lambda b, t, l: (l, 0, 0),
                         memory_space=pltpu.VMEM),          # conv_b
            pl.BlockSpec((1, C, 2 * C), lambda b, t, l: (l, 0, 0),
                         memory_space=pltpu.VMEM),          # out_w
            pl.BlockSpec((1, 1, 2 * C), lambda b, t, l: (l, 0, 0),
                         memory_space=pltpu.VMEM),          # out_b
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile, C), lambda b, t, l: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile, C), lambda b, t, l: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_t, tile, C), x.dtype),
            jax.ShapeDtypeStruct((B, n_t, tile, C), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_h, C), jnp.float32),
            pltpu.VMEM((tile_h, C), jnp.float32),
        ],
        interpret=interpret,
    )(step_projs, x_tiles, condp_tiles,
      stacked["conv_w"], conv_b,
      stacked["out_w"], out_b)

    x_out = x_out.reshape(B, Tp, C)[:, :T]
    skip_out = skip_out.reshape(B, Tp, C)[:, :T]
    return x_out, skip_out
