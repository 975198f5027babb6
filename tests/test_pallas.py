"""Fused Pallas denoiser stack == the flax ResidualBlock loop (interpreter
mode on CPU; the same kernel compiles for TPU)."""

import jax
import numpy as np
import pytest

from mixgantts_tpu.models.denoiser import Denoiser
from mixgantts_tpu.ops.pallas import (
    fused_residual_stack, stack_denoiser_params,
)


def _denoiser_pair(L=4, C=32, Hc=48, n_mels=20):
    ref = Denoiser(n_mels=n_mels, d_encoder=Hc, residual_channels=C,
                   residual_layers=L, fused=False)
    fused = Denoiser(n_mels=n_mels, d_encoder=Hc, residual_channels=C,
                     residual_layers=L, fused=True)
    return ref, fused


def _inputs(B=2, T=50, Hc=48, n_mels=20, seed=0):
    r = np.random.RandomState(seed)
    x_t = r.randn(B, T, n_mels).astype(np.float32)
    t = np.array([1, 3][:B], np.int32)
    cond = r.randn(B, T, Hc).astype(np.float32)
    return x_t, t, cond


def test_fused_denoiser_matches_flax():
    ref, fused = _denoiser_pair()
    x_t, t, cond = _inputs()
    variables = ref.init(jax.random.PRNGKey(0), x_t, t, cond)
    out_ref = ref.apply(variables, x_t, t, cond)
    out_fused = fused.apply(variables, x_t, t, cond)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_stack_multiple_tiles():
    """T spanning several tiles with a ragged final tile."""
    L, C, Hc = 3, 16, 24
    ref, _ = _denoiser_pair(L=L, C=C, Hc=Hc)
    x_t, t, cond = _inputs(B=1, T=70, Hc=Hc)
    variables = ref.init(jax.random.PRNGKey(1), x_t, t, cond)

    # oracle: run the flax blocks manually on the post-projection x
    import flax.linen as nn
    import jax.numpy as jnp
    from mixgantts_tpu.models.blocks import Conv1d, StepEmbeddingMLP
    from mixgantts_tpu.models.denoiser import ResidualBlock

    params = variables["params"]
    x = Conv1d(C, 1).apply(
        {"params": params["input_projection"]}, jnp.asarray(x_t))
    x = jax.nn.relu(x)
    step = StepEmbeddingMLP(C, C).apply(
        {"params": params["mlp"]}, jnp.asarray(t))
    x_ref = x
    skip_ref = jnp.zeros_like(x)
    for i in range(L):
        x_ref, s = ResidualBlock(C).apply(
            {"params": params[f"res_{i}"]}, x_ref, jnp.asarray(cond), step)
        skip_ref = skip_ref + s

    stacked = stack_denoiser_params(params)
    x_f, skip_f = fused_residual_stack(x, jnp.asarray(cond), step, stacked,
                                       tile=32, interpret=True)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(skip_f), np.asarray(skip_ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_stack_single_short_tile():
    L, C, Hc = 2, 8, 8
    ref, _ = _denoiser_pair(L=L, C=C, Hc=Hc, n_mels=4)
    x_t, t, cond = _inputs(B=2, T=9, Hc=Hc, n_mels=4)
    variables = ref.init(jax.random.PRNGKey(2), x_t, t, cond)
    out_ref = ref.apply(variables, x_t, t, cond)
    fused = Denoiser(n_mels=4, d_encoder=Hc, residual_channels=C,
                     residual_layers=L, fused=True)
    out_fused = fused.apply(variables, x_t, t, cond)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_stack_bfloat16():
    """bf16 operands with fp32 accumulation: close to the fp32 kernel."""
    import jax.numpy as jnp

    L, C, Hc = 4, 32, 48
    ref, _ = _denoiser_pair(L=L, C=C, Hc=Hc)
    x_t, t, cond = _inputs(B=1, T=40, Hc=Hc)
    variables = ref.init(jax.random.PRNGKey(3), x_t, t, cond)

    from mixgantts_tpu.models.blocks import Conv1d, StepEmbeddingMLP
    params = variables["params"]
    x = Conv1d(C, 1).apply(
        {"params": params["input_projection"]}, jnp.asarray(x_t))
    x = jax.nn.relu(x)
    step = StepEmbeddingMLP(C, C).apply(
        {"params": params["mlp"]}, jnp.asarray(t))
    stacked = stack_denoiser_params(params)

    x32, s32 = fused_residual_stack(x, jnp.asarray(cond), step, stacked,
                                    interpret=True)
    cast = lambda tr: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), tr)
    x16, s16 = fused_residual_stack(
        x.astype(jnp.bfloat16), jnp.asarray(cond, jnp.bfloat16),
        step.astype(jnp.bfloat16), cast(stacked), interpret=True)
    assert x16.dtype == jnp.bfloat16
    scale = float(np.abs(np.asarray(x32)).max())
    assert np.abs(np.asarray(x16, np.float32)
                  - np.asarray(x32)).mean() / scale < 0.02
    sscale = float(np.abs(np.asarray(s32)).max())
    assert np.abs(np.asarray(s16, np.float32)
                  - np.asarray(s32)).mean() / sscale < 0.02


# --- HiFi-GAN fused MRF stack (ops/pallas_vocoder.py) ------------------------

import jax.numpy as jnp

def _mrf_stage(C, rks=(3, 7, 11)):
    from flax import linen as nn
    from mixgantts_tpu.models.hifigan import ResBlock1

    class Stage(nn.Module):
        @nn.compact
        def __call__(self, x):
            acc = None
            for j, rk in enumerate(rks):
                y = ResBlock1(C, rk, (1, 3, 5), name=f"resblocks_0_{j}")(x)
                acc = y if acc is None else acc + y
            return acc / len(rks)

    return Stage()


def test_mrf_stack_matches_flax():
    from mixgantts_tpu.ops.pallas_vocoder import (
        mrf_stack, stack_mrf_params,
    )

    C, T, B = 16, 100, 2
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, C), jnp.float32)
    stage = _mrf_stage(C)
    params = stage.init(jax.random.PRNGKey(0), x)["params"]
    want = stage.apply({"params": params}, x)
    got = mrf_stack(x, stack_mrf_params(params, 0), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_mrf_stack_tiled_halo():
    """Multi-tile path: the 64-frame halo + circular boundary handling
    must reproduce SAME zero-padding exactly across tile seams."""
    from mixgantts_tpu.ops.pallas_vocoder import (
        mrf_stack, stack_mrf_params,
    )

    C, T = 16, 100
    x = jnp.asarray(np.random.RandomState(1).randn(1, T, C), jnp.float32)
    stage = _mrf_stage(C)
    params = stage.init(jax.random.PRNGKey(1), x)["params"]
    want = stage.apply({"params": params}, x)
    got = mrf_stack(x, stack_mrf_params(params, 0), tile=48, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_mrf_stack_single_branch():
    """Single-branch calls (the C > 128 stage path) match that branch of
    the flax stack."""
    from flax import linen as nn
    from mixgantts_tpu.models.hifigan import ResBlock1
    from mixgantts_tpu.ops.pallas_vocoder import (
        mrf_stack, stack_mrf_params,
    )

    C, T = 16, 64
    x = jnp.asarray(np.random.RandomState(2).randn(1, T, C), jnp.float32)
    stage = _mrf_stage(C)
    params = stage.init(jax.random.PRNGKey(2), x)["params"]
    block = ResBlock1(C, 7, (1, 3, 5), name="resblocks_0_1")
    want = block.apply({"params": params["resblocks_0_1"]}, x)
    st = stack_mrf_params(params, 0, (7,), branches=[(1, 7)])
    got = mrf_stack(x, st, (7,), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_mrf_stack_streamed_matches_flax():
    """Streamed-weight whole-stage path (the C > 128 stage, VERDICT r4
    #8): weight blocks stream per (branch, pair) grid step while signal
    and residual state persist in scratch — must equal the flax stack,
    including across tile seams (tile=48 over T=100) where the scratch
    state is rebuilt per tile."""
    from mixgantts_tpu.ops.pallas_vocoder import (
        mrf_stack_streamed, stack_mrf_params,
    )

    C, T, B = 16, 100, 2
    x = jnp.asarray(np.random.RandomState(7).randn(B, T, C), jnp.float32)
    stage = _mrf_stage(C)
    params = stage.init(jax.random.PRNGKey(7), x)["params"]
    want = stage.apply({"params": params}, x)
    st = stack_mrf_params(params, 0)
    for tile in (None, 48):
        got = mrf_stack_streamed(x, st, tile=tile, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"tile={tile}")


def test_mrf_stack_streamed_wide_per_tap_path():
    """C > 128 exercises the per-tap-matmul branch of `_conv` (the concat
    buffer stops paying above 128) — the layout the real C=256 stage
    runs."""
    from mixgantts_tpu.ops.pallas_vocoder import (
        mrf_stack_streamed, stack_mrf_params,
    )

    C, T = 136, 72
    x = jnp.asarray(np.random.RandomState(8).randn(1, T, C) * 0.3,
                    jnp.float32)
    stage = _mrf_stage(C)
    params = stage.init(jax.random.PRNGKey(8), x)["params"]
    want = stage.apply({"params": params}, x)
    got = mrf_stack_streamed(x, stack_mrf_params(params, 0),
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_mrf_stack_circular_shifts_exact_in_centre():
    """The TPU path uses circular rotates for the tap shifts; the wrapped
    garbage must never reach the written tile centre (receptive creep
    60 < HALO 64).  Force circular=True in the interpreter and require
    equality with the zero-fill reference."""
    from mixgantts_tpu.ops.pallas_vocoder import (
        mrf_stack, stack_mrf_params,
    )

    C, T = 16, 150
    x = jnp.asarray(np.random.RandomState(3).randn(1, T, C), jnp.float32)
    stage = _mrf_stage(C)
    params = stage.init(jax.random.PRNGKey(3), x)["params"]
    want = stage.apply({"params": params}, x)
    st = stack_mrf_params(params, 0)
    got = mrf_stack(x, st, tile=56, interpret=True, circular=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_mrf_stack_folded_matches_flax():
    """Time-folded path (C < 128): fold F time positions into lanes; must
    equal the flax stack bit-for-fp32-tolerance, including at tile seams
    and a T not divisible by the fold."""
    from mixgantts_tpu.ops.pallas_vocoder import (
        mrf_stack_folded, stack_mrf_params_folded,
    )

    C, T, B = 16, 103, 2
    x = jnp.asarray(np.random.RandomState(4).randn(B, T, C), jnp.float32)
    stage = _mrf_stage(C)
    params = stage.init(jax.random.PRNGKey(4), x)["params"]
    want = stage.apply({"params": params}, x)
    for fold in (2, 4, 8):
        st = stack_mrf_params_folded(params, 0, fold)
        got = mrf_stack_folded(x, st, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5,
            err_msg=f"fold={fold}")


def test_mrf_stack_folded_tile_seams():
    from mixgantts_tpu.ops.pallas_vocoder import (
        mrf_stack_folded, stack_mrf_params_folded,
    )

    C, T = 16, 300
    x = jnp.asarray(np.random.RandomState(5).randn(1, T, C), jnp.float32)
    stage = _mrf_stage(C)
    params = stage.init(jax.random.PRNGKey(5), x)["params"]
    want = stage.apply({"params": params}, x)
    st = stack_mrf_params_folded(params, 0, 4)
    got = mrf_stack_folded(x, st, tile=96, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_mrf_stack_taps_in_k_at_c128_boundary():
    """C=128 routes through the taps-in-K concat matmul (one
    [tile, k*C] @ [k*C, C] per conv) rather than per-tap [C, C] matmuls;
    the switch point must stay numerically identical to the flax stack."""
    from mixgantts_tpu.ops.pallas_vocoder import (
        mrf_stack, stack_mrf_params,
    )

    C, T = 128, 40
    x = jnp.asarray(np.random.RandomState(6).randn(1, T, C) * 0.5,
                    jnp.float32)
    stage = _mrf_stage(C, rks=(3,))
    params = stage.init(jax.random.PRNGKey(6), x)["params"]
    want = stage.apply({"params": params}, x)
    st = stack_mrf_params(params, 0, (3,))
    got = mrf_stack(x, st, (3,), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_mrf_stack_prefolded_matches_flax():
    """prefolded=True consumes x already in folded layout
    (x_folded[b, i, f*C + c] == x[b, F*i + f, c]) and must equal both the
    fold-inside path and the flax stack."""
    from mixgantts_tpu.ops.pallas_vocoder import (
        mrf_stack_folded, stack_mrf_params_folded,
    )

    C, T, B = 16, 96, 2
    x = jnp.asarray(np.random.RandomState(6).randn(B, T, C), jnp.float32)
    stage = _mrf_stage(C)
    params = stage.init(jax.random.PRNGKey(6), x)["params"]
    want = stage.apply({"params": params}, x)
    for fold in (2, 4):
        st = stack_mrf_params_folded(params, 0, fold)
        xf = x.reshape(B, T // fold, fold * C)  # contiguous == folded
        got = mrf_stack_folded(xf, st, interpret=True, prefolded=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5,
            err_msg=f"fold={fold}")
        # and across tile seams
        got2 = mrf_stack_folded(xf, st, tile=32, interpret=True,
                                prefolded=True)
        np.testing.assert_allclose(
            np.asarray(got2), np.asarray(want), rtol=1e-4, atol=1e-5,
            err_msg=f"fold={fold} tiled")


def test_subpixel_dense_output_is_folded_layout():
    """subpixel_upsample(depth_to_space=False) returns the pre-interleave
    tensor whose contiguous reshape equals the normal output — i.e. the
    folded layout the prefolded MRF kernel consumes."""
    from mixgantts_tpu.models.hifigan import subpixel_upsample

    r = np.random.RandomState(7)
    B, T, Cin, Cout, u, k = 2, 20, 12, 8, 2, 4
    x = jnp.asarray(r.randn(B, T, Cin), jnp.float32)
    kernel = jnp.asarray(r.randn(k, Cout, Cin), jnp.float32)
    bias = jnp.asarray(r.randn(Cout), jnp.float32)
    want = subpixel_upsample(x, kernel, bias, u, k)
    dense = subpixel_upsample(x, kernel, bias, u, k, depth_to_space=False)
    assert dense.shape == (B, T, u * Cout)
    np.testing.assert_allclose(
        np.asarray(dense.reshape(B, T * u, Cout)), np.asarray(want),
        rtol=1e-6, atol=1e-6)


def test_fused_apply_fold_channels_equivalence():
    """fused_apply with the prefused fold enabled on a stage must match
    the plain flax generator (interpret mode, fp32)."""
    from mixgantts_tpu.models.hifigan import (
        HiFiGANGenerator, fused_apply,
    )

    config = {"num_mels": 8, "upsample_rates": [4, 2],
              "upsample_kernel_sizes": [8, 4],
              "upsample_initial_channel": 64,
              "resblock_kernel_sizes": [3, 7, 11],
              "resblock_dilation_sizes": [[1, 3, 5]] * 3}
    gen = HiFiGANGenerator.from_config(config)
    mel = jnp.asarray(np.random.RandomState(8).randn(1, 24, 8), jnp.float32)
    params = gen.init(jax.random.PRNGKey(8), mel)["params"]
    want = gen.apply({"params": params}, mel)
    # stages are C=32 (F=4) then C=16 (F=8): fold both via the prefused
    # path and compare against the flax stack
    got = fused_apply(params, mel, config, interpret=True,
                      compute_dtype=jnp.float32, fold_channels=(16, 32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    # and with folding disabled (taps-in-K for both stages)
    got2 = fused_apply(params, mel, config, interpret=True,
                       compute_dtype=jnp.float32, fold_channels=())
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
