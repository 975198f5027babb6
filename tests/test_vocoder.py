"""Vocoder parity tests against a torch oracle (torch-cpu is available).

The torch modules here are freshly constructed test oracles with random
weights; we check that `convert_torch_generator` + the flax graph reproduce
torch's outputs, which validates kernel layouts, transposed-conv padding
semantics, and weight-norm folding for real pretrained checkpoints.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from mixgantts_tpu.models.hifigan import (
    HiFiGANGenerator, convert_torch_generator, fold_weight_norm,
)
from mixgantts_tpu.models.vocoder import (
    Vocoder, get_vocoder, vocoder_infer, DEFAULT_HIFIGAN_CONFIG,
)


def build_torch_hifigan(config, seed=0):
    """Minimal torch replica of the HiFi-GAN V1 generator graph."""
    import torch.nn as nn
    torch.manual_seed(seed)

    class ResBlock(nn.Module):
        def __init__(self, ch, k, ds):
            super().__init__()
            self.convs1 = nn.ModuleList([
                nn.utils.weight_norm(nn.Conv1d(
                    ch, ch, k, 1, dilation=d, padding=(k * d - d) // 2))
                for d in ds])
            self.convs2 = nn.ModuleList([
                nn.utils.weight_norm(nn.Conv1d(ch, ch, k, 1,
                                               padding=(k - 1) // 2))
                for _ in ds])

        def forward(self, x):
            for c1, c2 in zip(self.convs1, self.convs2):
                xt = torch.nn.functional.leaky_relu(x, 0.1)
                xt = c1(xt)
                xt = torch.nn.functional.leaky_relu(xt, 0.1)
                xt = c2(xt)
                x = x + xt
            return x

    class Gen(nn.Module):
        def __init__(self):
            super().__init__()
            c = config
            self.conv_pre = nn.utils.weight_norm(
                nn.Conv1d(c["num_mels"], c["upsample_initial_channel"], 7, 1,
                          padding=3))
            self.ups = nn.ModuleList()
            self.resblocks = nn.ModuleList()
            for i, (u, k) in enumerate(zip(c["upsample_rates"],
                                           c["upsample_kernel_sizes"])):
                ch_in = c["upsample_initial_channel"] // (2 ** i)
                ch = c["upsample_initial_channel"] // (2 ** (i + 1))
                self.ups.append(nn.utils.weight_norm(nn.ConvTranspose1d(
                    ch_in, ch, k, u, padding=(k - u) // 2)))
                for rk, rd in zip(c["resblock_kernel_sizes"],
                                  c["resblock_dilation_sizes"]):
                    self.resblocks.append(ResBlock(ch, rk, rd))
            self.conv_post = nn.utils.weight_norm(nn.Conv1d(ch, 1, 7, 1,
                                                            padding=3))

        def forward(self, x):
            c = config
            nk = len(c["resblock_kernel_sizes"])
            x = self.conv_pre(x)
            for i in range(len(self.ups)):
                x = torch.nn.functional.leaky_relu(x, 0.1)
                x = self.ups[i](x)
                xs = None
                for j in range(nk):
                    y = self.resblocks[i * nk + j](x)
                    xs = y if xs is None else xs + y
                x = xs / nk
            x = torch.nn.functional.leaky_relu(x, 0.1)
            x = self.conv_post(x)
            return torch.tanh(x)

    return Gen()


SMALL_CONFIG = {
    "num_mels": 8,
    "upsample_rates": [4, 2],
    "upsample_kernel_sizes": [8, 4],
    "upsample_initial_channel": 16,
    "resblock_kernel_sizes": [3, 5],
    "resblock_dilation_sizes": [[1, 3], [1, 3]],
}


def test_fold_weight_norm():
    v = np.random.RandomState(0).randn(4, 3, 5)
    g = np.random.RandomState(1).rand(4, 1, 1)
    w = fold_weight_norm(v, g)
    norms = np.sqrt((w ** 2).sum(axis=(1, 2)))
    np.testing.assert_allclose(norms, g[:, 0, 0], rtol=1e-6)


def test_hifigan_matches_torch_oracle():
    tg = build_torch_hifigan(SMALL_CONFIG)
    tg.eval()
    mel_t = torch.randn(2, SMALL_CONFIG["num_mels"], 11)
    with torch.no_grad():
        want = tg(mel_t).squeeze(1).numpy()

    state_dict = {k: v.numpy() for k, v in tg.state_dict().items()}
    params = convert_torch_generator(state_dict, SMALL_CONFIG)
    fg = HiFiGANGenerator.from_config(SMALL_CONFIG)
    got = np.asarray(fg.apply({"params": params},
                              jnp.asarray(mel_t.numpy().transpose(0, 2, 1))))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_subpixel_equals_transposed_conv():
    """subpixel=True (dense conv + depth-to-space) must reproduce the
    ConvTranspose path exactly (same params, V1 rates incl. edges)."""
    fg_ref = HiFiGANGenerator.from_config(DEFAULT_HIFIGAN_CONFIG)
    fg_sub = fg_ref.copy(subpixel=True)
    fg_ref = fg_ref.copy(subpixel=False)
    mel = jnp.asarray(np.random.RandomState(0).randn(2, 9, 80), jnp.float32)
    params = fg_ref.init(jax.random.PRNGKey(0), mel)["params"]
    want = np.asarray(fg_ref.apply({"params": params}, mel))
    got = np.asarray(fg_sub.apply({"params": params}, mel))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_mrf_apply_matches_module():
    """`fused_apply` (Pallas MRF kernel, interpreter off-TPU) must match
    the flax module graph on the same params."""
    from mixgantts_tpu.models.hifigan import fused_apply

    fg = HiFiGANGenerator.from_config(SMALL_CONFIG)
    mel = jnp.asarray(
        np.random.RandomState(1).randn(2, 13, SMALL_CONFIG["num_mels"]),
        jnp.float32)
    params = fg.init(jax.random.PRNGKey(0), mel)["params"]
    want = np.asarray(fg.apply({"params": params}, mel))
    got = np.asarray(fused_apply(params, mel, SMALL_CONFIG))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_apply_auto_folds_narrow_stages():
    """fold_channels=None (the default) must time-fold EVERY lane-divisible
    narrow stage, not just V1's (32, 64): a config with C=8/C=4 tails
    regressing to the unfolded kernel would silently waste 120/128 of
    every vector lane on the highest-rate stages.  T is chosen
    fold-divisible so the fold actually engages (F=16 and F=32)."""
    from mixgantts_tpu.models.hifigan import fused_apply

    fg = HiFiGANGenerator.from_config(SMALL_CONFIG)
    mel = jnp.asarray(
        np.random.RandomState(3).randn(1, 16, SMALL_CONFIG["num_mels"]),
        jnp.float32)
    params = fg.init(jax.random.PRNGKey(0), mel)["params"]
    want = np.asarray(fg.apply({"params": params}, mel))
    got = np.asarray(fused_apply(params, mel, SMALL_CONFIG))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # explicit override still wins
    got_off = np.asarray(fused_apply(params, mel, SMALL_CONFIG,
                                     fold_channels=()))
    np.testing.assert_allclose(got_off, want, rtol=1e-4, atol=1e-5)


def test_fused_apply_wide_stage():
    """A config whose first stage exceeds C=128 (like V1's 256) must route
    through the streamed-weight whole-stage kernel and still match the
    flax graph — covers the C > 128 wiring end-to-end that SMALL_CONFIG
    (C=8/4 stages) never reaches."""
    from mixgantts_tpu.models.hifigan import fused_apply

    cfg = dict(SMALL_CONFIG, upsample_initial_channel=288,
               upsample_rates=[2, 2], upsample_kernel_sizes=[4, 4])
    fg = HiFiGANGenerator.from_config(cfg)
    mel = jnp.asarray(
        np.random.RandomState(5).randn(1, 10, cfg["num_mels"]),
        jnp.float32)
    params = fg.init(jax.random.PRNGKey(5), mel)["params"]
    want = np.asarray(fg.apply({"params": params}, mel))
    got = np.asarray(fused_apply(params, mel, cfg))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_apply_bf16_snr():
    """bf16 activations (the TPU default for fused_apply) must keep the
    waveform close to fp32: SNR > 30 dB."""
    from mixgantts_tpu.models.hifigan import fused_apply

    fg = HiFiGANGenerator.from_config(SMALL_CONFIG)
    mel = jnp.asarray(
        np.random.RandomState(2).randn(1, 17, SMALL_CONFIG["num_mels"]),
        jnp.float32)
    params = fg.init(jax.random.PRNGKey(0), mel)["params"]
    ref = np.asarray(fused_apply(params, mel, SMALL_CONFIG,
                                 compute_dtype=jnp.float32))
    lo = np.asarray(fused_apply(params, mel, SMALL_CONFIG,
                                compute_dtype=jnp.bfloat16))
    snr = 10 * np.log10(
        (ref ** 2).mean() / max(((ref - lo) ** 2).mean(), 1e-12))
    assert snr > 30, f"bf16 vocoder SNR too low: {snr:.1f} dB"


def test_hifigan_output_length():
    fg = HiFiGANGenerator.from_config(DEFAULT_HIFIGAN_CONFIG)
    params = fg.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 80)))["params"]
    wav = fg.apply({"params": params}, jnp.zeros((1, 12, 80)))
    assert wav.shape == (1, 12 * 256)


def test_vocoder_infer_trims():
    cfg = {"vocoder": {"model": "HiFi-GAN", "speaker": "LJSpeech"}}
    voc = get_vocoder(cfg, ckpt_dir="/nonexistent")
    pre = {"preprocessing": {"audio": {"max_wav_value": 32768.0},
                             "stft": {"hop_length": 256}}}
    mels = np.zeros((2, 10, 80), np.float32)
    wavs = vocoder_infer(mels, voc, pre, lengths=[10, 7])
    assert wavs[0].dtype == np.int16
    assert len(wavs[0]) == 10 * 256 and len(wavs[1]) == 7 * 256
