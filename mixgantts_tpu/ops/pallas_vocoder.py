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

    For C <= 128 the taps go into the CONTRACTION dimension of one matmul
    ([tile_h, rk*C] @ [rk*C, C]) instead of rk separate [C, C] matmuls:
    a per-tap matmul at C=32 uses ~6% of the 128x128 MXU, while rk*C
    fills the K axis.  At C = 128 a per-tap [128, 128] matmul fills the
    array too, but one [tile, 1408] @ [1408, 128] matmul pipelines
    better than 11 shifted [128, 128] ones.  Above 128 (the C=256
    branchwise stage) the concat buffer stops paying — per-tap stays."""
    half = TAPS // 2
    if C > 128:
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


# --- Time-folded path (C < 128): fold F = 128//C time positions into the
# lane axis so every buffer runs full-width ------------------------------
#
# At C = 32 the plain kernel wastes 4x everywhere: every [rows, 32] VMEM
# buffer lane-pads to 128, every elementwise op runs at 1/4 lane
# occupancy, and every matmul fills only 32 of the MXU's 128 output
# lanes.  Folding maps x[F*i + f, c] -> X[i, f*C + c] (a pure reshape), so
# the signal is [T/F, 128] and all elementwise work is full-width.  A
# dilated conv becomes ONE matmul per conv: output lane group f at folded
# row i needs x[F*i + f + m] for tap offset m; writing f + m = F*q + g,
# that is folded row i+q, lane group g — so the input is a concat of
# row-shifted copies over the needed q window and the tap weights scatter
# into a block matrix W[(q,g)*C + cin, f*C + cout].  Intra-fold offsets
# live entirely in the (host-built, VMEM-resident) weight layout; the
# kernel does plain row shifts only, no lane rolls.  MXU cycles DROP ~30%
# despite the block-sparse zeros because N goes 32->128 (4x) while the
# widened K window costs only ~1.4-2x.


def _fold_q_window(rk, d, F):
    """Row-shift window Q for a folded (rk, d) conv: all q with some
    (f, tap) needing folded row i+q."""
    half, pad = TAPS // 2, (TAPS - rk) // 2
    ms = [(tap - half) * d for tap in range(pad, TAPS - pad)]
    return list(range(min(ms) // F, (max(ms) + F - 1) // F + 1)), ms


def _fold_weight(w, b, rk, d, F, q_pad):
    """[rk, C, C] conv kernel -> folded block matrix [q_pad*F*C, F*C] and
    bias [F*C] (zero-padded past the real q window)."""
    C = w.shape[-1]
    Q, ms = _fold_q_window(rk, d, F)
    wf = jnp.zeros((q_pad * F * C, F * C), w.dtype)
    for f in range(F):
        for tap_i, m in enumerate(ms):  # raw kernel tap tap_i <-> offset m
            o = f + m
            q, g = o // F, o % F
            qi = Q.index(q)
            row = (qi * F + g) * C
            wf = wf.at[row:row + C, f * C:(f + 1) * C].set(w[tap_i])
    return wf, jnp.tile(b, F)


def _fold_chain_creep(kernel_sizes, dilations, F):
    """Worst per-branch folded-row receptive creep (halo requirement)."""
    def maxq(rk, d):
        Q, _ = _fold_q_window(rk, d, F)
        return max(-Q[0], Q[-1])
    return max(sum(maxq(rk, d) + maxq(rk, 1) for d in dilations)
               for rk in kernel_sizes)


def stack_mrf_params_folded(params, stage, fold, kernel_sizes=(3, 7, 11),
                            dilations=(1, 3, 5)):
    """Folded analogue of `stack_mrf_params`: w1/w2 [3, 3, Qmax*F*C, F*C],
    b1/b2 [3, 3, F*C]; per-conv real q-window lengths are recomputed
    statically in the kernel from (rk, d, F).

    Packing note: a per-dilation w1 split (three arrays each padded only
    to that dilation's q-window, ~40% less resident weight VMEM) was
    measured par-to-slower at C=32/F=4 (2.2-2.5 ms uniform vs 2.5-3.0 ms
    split across reruns) and did not rescue C=64/F=2 either (0.86x vs the
    taps-in-K kernel) — the uniform layout stays."""
    F = fold
    q1 = max(len(_fold_q_window(rk, d, F)[0])
             for rk in kernel_sizes for d in dilations)
    q2 = max(len(_fold_q_window(rk, 1, F)[0]) for rk in kernel_sizes)
    w1, b1, w2, b2 = [], [], [], []
    for j, rk in enumerate(kernel_sizes):
        block = params[f"resblocks_{stage}_{j}"]
        w1j, b1j, w2j, b2j = [], [], [], []
        for c, d in enumerate(dilations):
            wf, bf = _fold_weight(
                jnp.asarray(block[f"convs1_{c}"]["kernel"]),
                jnp.asarray(block[f"convs1_{c}"]["bias"]), rk, d, F, q1)
            w1j.append(wf)
            b1j.append(bf)
            wf, bf = _fold_weight(
                jnp.asarray(block[f"convs2_{c}"]["kernel"]),
                jnp.asarray(block[f"convs2_{c}"]["bias"]), rk, 1, F, q2)
            w2j.append(wf)
            b2j.append(bf)
        w1.append(jnp.stack(w1j))
        b1.append(jnp.stack(b1j))
        w2.append(jnp.stack(w2j))
        b2.append(jnp.stack(b2j))
    return {"w1": jnp.stack(w1), "b1": jnp.stack(b1),
            "w2": jnp.stack(w2), "b2": jnp.stack(b2), "fold": F}


def _conv_folded(t, w, b, rk, d, F, Cf):
    Q, _ = _fold_q_window(rk, d, F)
    cat = jnp.concatenate([_shift(t, -q, Cf) for q in Q], axis=1)
    return jnp.dot(cat, w[:len(Q) * Cf].astype(t.dtype),
                   preferred_element_type=jnp.float32) + b


def _kernel_folded(T, tile, kernel_sizes, dilations, F, halo_r, x_ref,
                   w1_ref, b1_ref, w2_ref, b2_ref, out_ref, y_s, acc_s):
    t_idx = pl.program_id(1)
    Cf = x_ref.shape[-1]
    C = Cf // F
    rows = tile // F
    rows_h = rows + 2 * halo_r

    # frame position of (row, lane): tile_start + F*row + lane//C
    pos = ((t_idx * rows - halo_r
            + jax.lax.broadcasted_iota(jnp.int32, (rows_h, Cf), 0)) * F
           + jax.lax.broadcasted_iota(jnp.int32, (rows_h, Cf), 1) // C)
    mask = ((pos >= 0) & (pos < T)).astype(jnp.float32)
    op_dtype = w2_ref.dtype

    for br, rk in enumerate(kernel_sizes):
        y_s[:] = x_ref[0, 0].astype(jnp.float32)
        for p, d in enumerate(dilations):
            t = (jax.nn.leaky_relu(y_s[:], LRELU_SLOPE)
                 * mask).astype(op_dtype)
            t = _conv_folded(t, w1_ref[br, p],
                             b1_ref[br, p, 0].astype(jnp.float32),
                             rk, d, F, Cf)
            t = (jax.nn.leaky_relu(t, LRELU_SLOPE) * mask).astype(op_dtype)
            t = _conv_folded(t, w2_ref[br, p],
                             b2_ref[br, p, 0].astype(jnp.float32),
                             rk, 1, F, Cf)
            y_s[:] = y_s[:] + t
        if br == 0:
            acc_s[:] = y_s[:]
        else:
            acc_s[:] = acc_s[:] + y_s[:]
    out_ref[0, 0] = (acc_s[halo_r:halo_r + rows]
                     / len(kernel_sizes)).astype(out_ref.dtype)


def mrf_stack_folded(x, stacked, kernel_sizes=(3, 7, 11),
                     dilations=(1, 3, 5), tile=None, interpret=None,
                     prefolded=False):
    """Time-folded MRF stack for C < 128: numerically identical (fp32
    tolerance) to `mrf_stack` / the flax ResBlock1 stack.

    prefolded=True takes x ALREADY in the folded layout [B, T//F, F*C]
    (x_folded[b, i, f*C + c] == x_time[b, F*i + f, c]) and skips the
    host-side fold reshape.  The sub-pixel upsample's pre-interleave
    output (`models/hifigan.subpixel_upsample(depth_to_space=False)`,
    reinterpreted [B, T_in, u*C] -> [B, T//F, F*C] — a contiguous
    reshape for any u/F) is exactly this layout, so the upsample's
    audio-rate depth-to-space copy is fused away."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    F = stacked["fold"]
    if prefolded:
        B, R, Cf_in = x.shape
        T, C = R * F, Cf_in // F
        assert Cf_in == F * C
    else:
        B, T, C = x.shape
    Cf = F * C
    w1, w2 = stacked["w1"], stacked["w2"]
    if not interpret:
        w1 = w1.astype(jnp.bfloat16)
        w2 = w2.astype(jnp.bfloat16)

    halo_r = -(-_fold_chain_creep(kernel_sizes, dilations, F) // 8) * 8
    if tile is None:
        # 512 folded rows/tile: halo overhead <= 9% while the widest
        # concat buffer ([rows_h, Qmax*Cf] bf16) plus the padded resident
        # weights stay ~4 MB under the ~16 MB VMEM budget
        tile = 512 * F
    tile = -(-min(tile, max(F * 8, T)) // (F * 8)) * (F * 8)
    rows, rows_h = tile // F, tile // F + 2 * halo_r
    n_t = pl.cdiv(T, tile)
    Tp = n_t * tile

    b1 = stacked["b1"][:, :, None, :]  # [3, 3, 1, Cf]
    b2 = stacked["b2"][:, :, None, :]

    if prefolded:
        xf = jnp.pad(x, ((0, 0), (0, (Tp - T) // F), (0, 0)))
    else:
        xf = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0))).reshape(
            B, Tp // F, Cf)
    xf = jnp.pad(xf, ((0, 0), (halo_r, halo_r), (0, 0)))
    gather = (np.arange(n_t)[:, None] * rows
              + np.arange(rows_h)[None, :])
    x_tiles = xf[:, gather]  # [B, n_t, rows_h, Cf]
    if not interpret and x_tiles.dtype == jnp.float32:
        x_tiles = x_tiles.astype(jnp.bfloat16)

    kernel = functools.partial(_kernel_folded, T, tile,
                               tuple(kernel_sizes), tuple(dilations),
                               F, halo_r)
    const4 = lambda b, t: (0, 0, 0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec((1, 1, rows_h, Cf), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            # constant index maps: weights are DMA'd once, stay resident
            pl.BlockSpec(w1.shape, const4, memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, const4, memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, const4, memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, const4, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, rows, Cf), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_t, rows, Cf), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows_h, Cf), jnp.float32),
            pltpu.VMEM((rows_h, Cf), jnp.float32),
        ],
        interpret=interpret,
    )(x_tiles, w1, b1, w2, b2)

    return out.reshape(B, Tp, C)[:, :T]


# --- Streamed-weight path (C > 128): weights stream, signal stays -------
#
# The C=256 stage's full weights (26 MB bf16) exceed VMEM, so `mrf_stack`
# refuses it and `models/hifigan.fused_apply` runs one single-branch call
# per branch (8.7 MB resident each), re-streaming the signal 3x.  This
# variant keeps ONE kernel for the whole stage by adding an inner grid
# dimension over the 9 (branch, pair) steps: the weight BlockSpec indexes
# on it, so Pallas streams each pair's 2.9 MB of conv weights through a
# double buffer, while the signal tile and the residual/average state sit
# in scratch that persists across the (sequential) inner grid steps.
# HBM weight traffic is n_tiles * 26 MB (~78 MB at the real stage shape,
# ~0.1 ms at the 819 GB/s roof) versus zero for the branchwise path — the
# trade is 2 fewer audio-rate signal round-trips + 2 fewer kernel
# launches.
#
# MEASURED AND REJECTED (VERDICT r4 #8, `bench_mrf_stage.py c256`, real
# V1 stage C=256 T=6912 B=1): branchwise 1.33-1.39 ms, streamed 3.70 ms
# at the auto tile (0.36x) and no better at tile=1152 (3.91) or 576
# (4.25) — so the loss is structural, not VMEM pressure: the 9-step
# revisiting grid with per-step predicated bodies pipelines far worse
# than three plain unrolled kernels, dwarfing the ~0.5 ms of signal
# re-streaming it saves.  `fused_apply` keeps the branch-per-call path;
# this variant stays correctness-tested (test_pallas.py) as the measured
# record, like the prefused fold.


def _kernel_streamed(T, tile, kernel_sizes, dilations, x_ref, w1_ref,
                     b1_ref, w2_ref, b2_ref, out_ref, y_s, acc_s):
    t_idx = pl.program_id(1)
    s = pl.program_id(2)  # (branch, pair) step, innermost => sequential
    n_pair = len(dilations)
    C = x_ref.shape[-1]
    tile_h = tile + 2 * HALO

    pos = (t_idx * tile - HALO
           + jax.lax.broadcasted_iota(jnp.int32, (tile_h, 1), 0))
    mask = ((pos >= 0) & (pos < T)).astype(jnp.float32)
    op_dtype = w1_ref.dtype

    @pl.when(s % n_pair == 0)
    def _():  # branch start: residual state <- stage input
        y_s[:] = x_ref[0, 0].astype(jnp.float32)

    # all 9 (rk, d) bodies are compiled in, predicated on s; each grid
    # step executes exactly one, against its streamed weight block
    for br, rk in enumerate(kernel_sizes):
        pad = (TAPS - rk) // 2
        taps = tuple(range(pad, TAPS - pad))
        for p, d in enumerate(dilations):
            @pl.when(s == br * n_pair + p)
            def _(taps=taps, d=d):
                t = (jax.nn.leaky_relu(y_s[:], LRELU_SLOPE)
                     * mask).astype(op_dtype)
                t = _conv(t, w1_ref[0, 0],
                          b1_ref[0, 0].astype(jnp.float32), d, C, taps)
                t = (jax.nn.leaky_relu(t, LRELU_SLOPE)
                     * mask).astype(op_dtype)
                t = _conv(t, w2_ref[0, 0],
                          b2_ref[0, 0].astype(jnp.float32), 1, C, taps)
                y_s[:] = y_s[:] + t

    @pl.when(s == n_pair - 1)
    def _():  # first branch done
        acc_s[:] = y_s[:]

    @pl.when(jnp.logical_and(s % n_pair == n_pair - 1, s >= n_pair))
    def _():  # later branch done
        acc_s[:] = acc_s[:] + y_s[:]

    @pl.when(s == len(kernel_sizes) * n_pair - 1)
    def _():
        out_ref[0, 0] = (acc_s[HALO:HALO + tile]
                         / len(kernel_sizes)).astype(out_ref.dtype)


def mrf_stack_streamed(x, stacked, kernel_sizes=(3, 7, 11),
                       dilations=(1, 3, 5), tile=None, interpret=None):
    """Whole-stage MRF for C > 128 (weights streamed per branch-pair).
    Same contract as `mrf_stack`; numerically identical (fp32 tolerance)
    to the flax ResBlock1 stack."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if not interpret:
        stacked = dict(stacked, w1=stacked["w1"].astype(jnp.bfloat16),
                       w2=stacked["w2"].astype(jnp.bfloat16))
    B, T, C = x.shape
    n_branch, n_pair = stacked["w1"].shape[:2]
    if tile is None:
        # fewest <=2048-frame tiles that cover T without gross padding;
        # scoped VMEM at C=256, tile=1728, fp32 in/out: x bf16 + out +
        # y/acc scratch + 2.9 MB/step weight blocks, everything but
        # scratch double-buffered ~= 15 MB (2304 tiles OOM at 17.4M)
        tile = -(-T // pl.cdiv(T, 2048)) if T > 2048 else T
    tile = -(-min(tile, max(8, T)) // 8) * 8
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
        x_tiles = x_tiles.astype(jnp.bfloat16)

    kernel = functools.partial(_kernel_streamed, T, tile,
                               tuple(kernel_sizes), tuple(dilations))
    step_w = lambda b, t, s: (s // n_pair, s % n_pair, 0, 0, 0)
    step_b = lambda b, t, s: (s // n_pair, s % n_pair, 0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_t, n_branch * n_pair),
        in_specs=[
            # constant in s: the signal tile is DMA'd once per (b, t)
            pl.BlockSpec((1, 1, tile_h, C), lambda b, t, s: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            # indexed on s: one (branch, pair)'s weights resident at a
            # time, streamed through Pallas's double buffer
            pl.BlockSpec((1, 1, TAPS, C, C), step_w,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, C), step_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TAPS, C, C), step_w,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, C), step_b, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tile, C),
                               lambda b, t, s: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_t, tile, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h, C), jnp.float32),
            pltpu.VMEM((tile_h, C), jnp.float32),
        ],
        interpret=interpret,
    )(x_tiles, stacked["w1"], b1, stacked["w2"], b2)

    return out.reshape(B, Tp, C)[:, :T]


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
