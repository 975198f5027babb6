"""TTSPipeline: one-program text->wav serving path with bucketed shapes."""

import jax
import numpy as np
import pytest

from mixgantts_tpu.config import NormStats
from mixgantts_tpu.models.diffusion import DiffusionSchedule
from mixgantts_tpu.models.mixgantts import MixGANTTS
from mixgantts_tpu.models.vocoder import get_vocoder
from mixgantts_tpu.pipeline import TTSPipeline

N_MELS = 20
HOP = 64

PREPROCESS_CONFIG = {
    "preprocessing": {
        "audio": {"sampling_rate": 22050, "max_wav_value": 32768.0},
        "stft": {"hop_length": HOP},
        "mel": {"n_mel_channels": N_MELS},
    },
}
MODEL_CONFIG = {
    "max_seq_len": 128,
    "multi_speaker": False,
    "vocoder": {"model": "HiFi-GAN", "speaker": "LJSpeech"},
    "tpu": {"length_buckets": [64, 128], "phone_buckets": [8, 16, 32]},
}


def tiny_model(mode):
    stats = NormStats.default(n_mels=N_MELS)
    schedule = DiffusionSchedule.create(
        "vpsde", 2 if mode == "naive" else 1, 0.1, 40, 0.008,
        stats.spec_min[:N_MELS], stats.spec_max[:N_MELS])
    return MixGANTTS(
        mode=mode, schedule=schedule, stats=stats, hidden=32,
        encoder_layers=1, encoder_heads=2, conv_kernel_size=3,
        decoder_layers=1, conv_filter_size=64, max_seq_len=128,
        n_mels=N_MELS, n_bins=16, vp_filter_size=16,
        residual_channels=16, residual_layers=2)


def text_batch(B=2, P=10, W=4, seed=0):
    r = np.random.RandomState(seed)
    wb = r.randint(1, 4, (B, W)).astype(np.int64)
    src_lens = wb.sum(-1).astype(np.int64)
    texts = np.zeros((B, P), np.int64)
    for b in range(B):
        texts[b, :src_lens[b]] = r.randint(1, 100, src_lens[b])
    return {
        "ids": [f"utt{i}" for i in range(B)],
        "speakers": np.zeros((B,), np.int64),
        "texts": texts,
        "src_lens": src_lens,
        "word_boundaries": wb,
        "src_w_lens": np.full((B,), W, np.int64),
    }


@pytest.mark.parametrize("mode", ["naive", "aux", "shallow"])
def test_pipeline_synthesizes(mode):
    model = tiny_model(mode)
    batch = text_batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "diffusion": jax.random.PRNGKey(2)},
        speakers=batch["speakers"], texts=batch["texts"],
        src_lens=batch["src_lens"], word_boundaries=batch["word_boundaries"],
        src_w_lens=batch["src_w_lens"], max_mel_len=32, train=False)
    vocoder = get_vocoder(MODEL_CONFIG, ckpt_dir="/nonexistent",
                          num_mels=N_MELS)
    pipe = TTSPipeline(model, variables, vocoder, PREPROCESS_CONFIG,
                       MODEL_CONFIG)
    wavs, mels, mel_lens = pipe(batch, d_control=1.0)
    assert len(wavs) == 2
    for i, wav in enumerate(wavs):
        assert wav.dtype == np.int16
        assert len(wav) == int(mel_lens[i]) * HOP
    assert mels.shape[0] == 2 and mels.shape[2] == N_MELS
    assert np.isfinite(mels).all()


def test_pipeline_return_mel_false():
    """return_mel=False skips the mel device->host transfer (mel is None)
    but returns identical waveforms from the same compiled program."""
    model = tiny_model("naive")
    batch = text_batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "diffusion": jax.random.PRNGKey(2)},
        speakers=batch["speakers"], texts=batch["texts"],
        src_lens=batch["src_lens"], word_boundaries=batch["word_boundaries"],
        src_w_lens=batch["src_w_lens"], max_mel_len=32, train=False)
    vocoder = get_vocoder(MODEL_CONFIG, ckpt_dir="/nonexistent",
                          num_mels=N_MELS)
    pipe = TTSPipeline(model, variables, vocoder, PREPROCESS_CONFIG,
                       MODEL_CONFIG)
    rng = jax.random.PRNGKey(7)
    wavs, mels, mel_lens = pipe(batch, rng=rng)
    wavs2, mels2, mel_lens2 = pipe(batch, rng=rng, return_mel=False)
    assert mels2 is None
    assert len(pipe._programs) == 1  # same compiled program
    np.testing.assert_array_equal(mel_lens, mel_lens2)
    for a, b in zip(wavs, wavs2):
        np.testing.assert_array_equal(a, b)


def test_pipeline_stream_matches_sequential():
    """stream() (double-buffered submit/collect) yields results identical
    to calling the pipeline once per batch, in submission order, drawing
    the same per-call diffusion rngs from the call counter."""
    model = tiny_model("naive")
    batches = [text_batch(seed=s) for s in range(3)]
    b0 = batches[0]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "diffusion": jax.random.PRNGKey(2)},
        speakers=b0["speakers"], texts=b0["texts"],
        src_lens=b0["src_lens"], word_boundaries=b0["word_boundaries"],
        src_w_lens=b0["src_w_lens"], max_mel_len=32, train=False)
    vocoder = get_vocoder(MODEL_CONFIG, ckpt_dir="/nonexistent",
                          num_mels=N_MELS)
    mk = lambda: TTSPipeline(model, variables, vocoder, PREPROCESS_CONFIG,
                             MODEL_CONFIG)
    seq_pipe, stream_pipe = mk(), mk()
    sequential = [seq_pipe(b) for b in batches]
    streamed = list(stream_pipe.stream(batches, return_mel=True))
    assert len(streamed) == len(sequential)
    for (w1, m1, l1), (w2, m2, l2) in zip(sequential, streamed):
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_array_equal(m1, m2)
        for a, b in zip(w1, w2):
            np.testing.assert_array_equal(a, b)
    # wav-only streaming returns mel=None
    wavs, mel, _ = next(iter(mk().stream(batches[:1], return_mel=False)))
    assert mel is None and len(wavs) == 2
    # explicit per-batch rngs override the call counter: a WARMED pipeline
    # streaming with the sequential pipeline's keys reproduces its draws
    warm = mk()
    warm(batches[0])  # advance the call counter
    keyed = list(warm.stream(batches, return_mel=True,
                             rngs=[jax.random.PRNGKey(i)
                                   for i in range(len(batches))]))
    for (w1, m1, l1), (w2, m2, l2) in zip(sequential, keyed):
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_array_equal(m1, m2)
        for a, b in zip(w1, w2):
            np.testing.assert_array_equal(a, b)
    # rngs shorter than batches: a clear ValueError, not the opaque
    # PEP-479 RuntimeError a bare next() inside the generator produced
    with pytest.raises(ValueError, match="rngs.*ran out"):
        list(mk().stream(batches, rngs=[jax.random.PRNGKey(0)]))


def test_pipeline_bucket_reuse():
    model = tiny_model("naive")
    batch = text_batch(P=10, W=4)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "diffusion": jax.random.PRNGKey(2)},
        speakers=batch["speakers"], texts=batch["texts"],
        src_lens=batch["src_lens"], word_boundaries=batch["word_boundaries"],
        src_w_lens=batch["src_w_lens"], max_mel_len=32, train=False)
    vocoder = get_vocoder(MODEL_CONFIG, ckpt_dir="/nonexistent",
                          num_mels=N_MELS)
    pipe = TTSPipeline(model, variables, vocoder, PREPROCESS_CONFIG,
                       MODEL_CONFIG)
    pipe(batch)
    # a different raw length in the same bucket reuses the compiled program
    pipe(text_batch(P=14, W=4, seed=1))
    assert len(pipe._programs) == 1
    # crossing a bucket boundary compiles a second program
    pipe(text_batch(P=20, W=4, seed=2))
    assert len(pipe._programs) == 2


def test_pipeline_control_knobs_do_not_recompile():
    model = tiny_model("naive")
    batch = text_batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "diffusion": jax.random.PRNGKey(2)},
        speakers=batch["speakers"], texts=batch["texts"],
        src_lens=batch["src_lens"], word_boundaries=batch["word_boundaries"],
        src_w_lens=batch["src_w_lens"], max_mel_len=32, train=False)
    vocoder = get_vocoder(MODEL_CONFIG, ckpt_dir="/nonexistent",
                          num_mels=N_MELS)
    pipe = TTSPipeline(model, variables, vocoder, PREPROCESS_CONFIG,
                       MODEL_CONFIG)
    _, _, lens1 = pipe(batch, d_control=1.0, rng=jax.random.PRNGKey(7))
    _, _, lens2 = pipe(batch, d_control=2.0, rng=jax.random.PRNGKey(7))
    assert len(pipe._programs) == 1
    # duration control actually lengthens the output
    assert lens2.sum() >= lens1.sum()


def test_pipeline_bfloat16_compute():
    """tpu.compute_dtype: bfloat16 runs the same program in bf16 and stays
    close to the fp32 output (same rng -> same diffusion noise)."""
    import copy

    model = tiny_model("naive")
    batch = text_batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "diffusion": jax.random.PRNGKey(2)},
        speakers=batch["speakers"], texts=batch["texts"],
        src_lens=batch["src_lens"], word_boundaries=batch["word_boundaries"],
        src_w_lens=batch["src_w_lens"], max_mel_len=32, train=False)
    vocoder = get_vocoder(MODEL_CONFIG, ckpt_dir="/nonexistent",
                          num_mels=N_MELS)

    cfg16 = copy.deepcopy(MODEL_CONFIG)
    cfg16["tpu"]["compute_dtype"] = "bfloat16"
    rng = jax.random.PRNGKey(7)
    pipe32 = TTSPipeline(model, variables, vocoder, PREPROCESS_CONFIG,
                         MODEL_CONFIG)
    pipe16 = TTSPipeline(model, variables, vocoder, PREPROCESS_CONFIG, cfg16)
    wav32, mel32, len32 = pipe32(batch, rng=rng)
    wav16, mel16, len16 = pipe16(batch, rng=rng)
    assert mel16.dtype == np.float32  # outputs come back fp32
    np.testing.assert_array_equal(np.asarray(len32), np.asarray(len16))
    # bf16 has ~3 decimal digits; demand closeness, not parity
    scale = max(np.abs(mel32).max(), 1e-3)
    assert np.abs(mel16 - mel32).mean() / scale < 0.05


def test_pipeline_mesh_sharded():
    """Batched synthesis sharded over the 'data' mesh axis matches the
    single-device pipeline (same rng)."""
    import jax
    from mixgantts_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")

    model = tiny_model("naive")
    batch = text_batch(B=8, P=10, W=4)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "diffusion": jax.random.PRNGKey(2)},
        speakers=batch["speakers"], texts=batch["texts"],
        src_lens=batch["src_lens"], word_boundaries=batch["word_boundaries"],
        src_w_lens=batch["src_w_lens"], max_mel_len=32, train=False)
    vocoder = get_vocoder(MODEL_CONFIG, ckpt_dir="/nonexistent",
                          num_mels=N_MELS)

    rng = jax.random.PRNGKey(11)
    single = TTSPipeline(model, variables, vocoder, PREPROCESS_CONFIG,
                         MODEL_CONFIG)
    sharded = TTSPipeline(model, variables, vocoder, PREPROCESS_CONFIG,
                          MODEL_CONFIG, mesh=make_mesh())
    wav_s, mel_s, len_s = single(batch, rng=rng)
    wav_m, mel_m, len_m = sharded(batch, rng=rng)
    np.testing.assert_array_equal(np.asarray(len_s), np.asarray(len_m))
    np.testing.assert_allclose(mel_m, mel_s, atol=1e-4, rtol=1e-4)


def test_pipeline_warns_when_frame_budget_saturates():
    """A duration blow-up that pins the predicted mel length to the static
    frame cap must warn about truncation instead of silently clipping the
    utterance tail (the mel_len cap in linguistic_encoder.py)."""
    import warnings

    model = tiny_model("naive")
    batch = text_batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "diffusion": jax.random.PRNGKey(2)},
        speakers=batch["speakers"], texts=batch["texts"],
        src_lens=batch["src_lens"], word_boundaries=batch["word_boundaries"],
        src_w_lens=batch["src_w_lens"], max_mel_len=32, train=False)
    vocoder = get_vocoder(MODEL_CONFIG, ckpt_dir="/nonexistent",
                          num_mels=N_MELS)
    pipe = TTSPipeline(model, variables, vocoder, PREPROCESS_CONFIG,
                       MODEL_CONFIG)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        wavs, mels, mel_lens = pipe(batch, d_control=1000.0)
    assert (np.asarray(mel_lens) >= mels.shape[1]).any(), \
        "d_control=1000 was expected to saturate the frame budget"
    msgs = [str(w.message) for w in caught]
    assert any("frame budget saturated" in m for m in msgs), msgs
