"""End-to-end data pipeline test: fabricated corpus (wav + TextGrid) ->
preprocess -> dataset -> one jitted train step (SURVEY.md section 4's
integration-test recommendation)."""

import copy
import os

import jax
import numpy as np
import pytest

from mixgantts_tpu.audio.wav import save_wav
from mixgantts_tpu.config import NormStats
from mixgantts_tpu.data.dataset import AcousticDataset, TextOnlyDataset
from mixgantts_tpu.data.preprocessor import Preprocessor, beta_binomial_prior
from mixgantts_tpu.data.textgrid import (
    IntervalTier, read_textgrid, write_textgrid,
)

SR = 22050
HOP = 64
N_FFT = 256

PREPROCESS_CONFIG = {
    "dataset": "TestCorpus",
    "path": {},
    "preprocessing": {
        "sort_data": True,
        "val_size": 1,
        "speaker_embedder": "none",
        "text": {"text_cleaners": ["english_cleaners"], "language": "en",
                 "sub_divide_word": True, "max_phoneme_num": 7},
        "audio": {"sampling_rate": SR, "max_wav_value": 32768.0},
        "stft": {"filter_length": N_FFT, "hop_length": HOP,
                 "win_length": N_FFT},
        "mel": {"n_mel_channels": 20, "mel_fmin": 0, "mel_fmax": 8000},
        "pitch": {"feature": "phoneme_level", "normalization": True},
        "energy": {"feature": "phoneme_level", "normalization": True},
        "aligner": {"beta_binomial_scaling_factor": 1.0},
    },
}
MODEL_CONFIG = {"multi_speaker": False, "tpu": {
    "length_buckets": [64, 128, 256], "phone_buckets": [8, 16, 32]}}
TRAIN_CONFIG = {"optimizer": {"batch_size": 2, "batch_size_shallow": 2}}


def make_corpus(root, n_utts=5):
    """Sine-tone utterances with 4 phones + a word boundary structure."""
    raw = os.path.join(root, "raw_data", "spk0")
    tg_dir = os.path.join(root, "preprocessed", "TextGrid", "spk0")
    os.makedirs(raw, exist_ok=True)
    os.makedirs(tg_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    for k in range(n_utts):
        dur = 0.30 + 0.1 * k  # seconds, distinct lengths
        n = int(SR * dur)
        t = np.arange(n) / SR
        hz = 120 + 40 * k
        wav = (0.4 * np.sin(2 * np.pi * hz * t)
               + 0.01 * rng.randn(n)).astype(np.float32)
        save_wav(os.path.join(raw, f"utt{k}.wav"), wav, SR)
        with open(os.path.join(raw, f"utt{k}.lab"), "w") as f:
            f.write("hello world")
        # phones: HH AH0 | L OW1 across two words, plus trailing sil
        q = dur / 5.0
        phones = [(0.0, q, "HH"), (q, 2 * q, "AH0"),
                  (2 * q, 3 * q, "L"), (3 * q, 4 * q, "OW1"),
                  (4 * q, 5 * q, "sil")]
        words = [(0.0, 2 * q, "hello"), (2 * q, 4 * q, "world"),
                 (4 * q, 5 * q, "")]
        write_textgrid(
            os.path.join(tg_dir, f"utt{k}.TextGrid"),
            [IntervalTier("words", words), IntervalTier("phones", phones)],
            xmax=dur)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    make_corpus(root)
    cfg = copy.deepcopy(PREPROCESS_CONFIG)
    cfg["path"] = {
        "raw_path": os.path.join(root, "raw_data"),
        "preprocessed_path": os.path.join(root, "preprocessed"),
        "corpus_path": root,
    }
    pre = Preprocessor(cfg, MODEL_CONFIG, TRAIN_CONFIG)
    train, val = pre.build_from_path()
    return root, cfg, train, val


def test_textgrid_roundtrip(tmp_path):
    path = str(tmp_path / "t.TextGrid")
    tiers = [IntervalTier("phones", [(0.0, 0.5, "HH"), (0.5, 1.0, "AH0")]),
             IntervalTier("words", [(0.0, 1.0, "ha")])]
    write_textgrid(path, tiers)
    tg = read_textgrid(path)
    got = tg.get_tier_by_name("phones").intervals
    assert [p for (_, _, p) in got] == ["HH", "AH0"]
    assert got[0][1] == 0.5


def test_beta_binomial_prior_rows_normalized():
    prior = beta_binomial_prior(30, 4)
    assert prior.shape == (4, 30)
    # pmf over support 0..n evaluated at 0..n-1 (reference convention):
    # rows sum to slightly less than 1
    s = prior.sum(axis=1)
    assert (s > 0.8).all() and (s <= 1.0 + 1e-9).all()
    # diagonal prior: the mass center advances with the phone index
    centers = (prior * np.arange(30)).sum(axis=1) / s
    assert (np.diff(centers) > 0).all()


def test_preprocess_artifacts(corpus):
    root, cfg, train, val = corpus
    out = cfg["path"]["preprocessed_path"]
    assert len(train) == 4 and len(val) == 1
    assert os.path.isfile(os.path.join(out, "stats.json"))
    assert os.path.isfile(os.path.join(out, "speakers.json"))
    stats = NormStats.load(out, n_mels=20)
    assert stats.max_seq_len > 0
    # pitch was normalized: mean approx 0 across utterances
    import glob
    pitches = [np.load(p) for p in glob.glob(os.path.join(out, "pitch", "*"))]
    allp = np.concatenate(pitches)
    assert abs(allp.mean()) < 1.0
    # durations sum matches mel length
    for mel_p in glob.glob(os.path.join(out, "mel", "*")):
        base = os.path.basename(mel_p).replace("-mel-", "-duration-")
        dur = np.load(os.path.join(out, "duration", base))
        mel = np.load(mel_p)
        assert mel.shape[0] == dur.sum()
        assert mel.shape[1] == 20
    # metadata format parity
    assert train[0].count("|") == 3
    assert "{" in train[0].split("|")[2]


def test_dataset_batches(corpus):
    root, cfg, train, val = corpus
    ds = AcousticDataset("train.txt", "naive", cfg, MODEL_CONFIG, TRAIN_CONFIG,
                         sort=True, drop_last=False)
    assert len(ds) == 4
    gen = ds.batches(group_size=2, shuffle=True, seed=0, epochs=1)
    batches = [b for b in gen if b is not None]
    assert len(batches) >= 1
    b = batches[0]
    B = b["texts"].shape[0]
    # bucketed static shapes
    assert b["texts"].shape[1] in (8, 16, 32)
    assert b["mels"].shape[1] in (64, 128, 256)
    assert b["attn_priors"].shape == (B, b["texts"].shape[1],
                                      b["mels"].shape[1])
    # within-batch sorted by text length desc
    assert (np.diff(b["src_lens"]) <= 0).all()
    # phones: 4 real + possible sil trim; durations positive
    assert (b["d_targets"].sum(-1) == b["mel_lens"]).all()


def test_train_step_on_real_pipeline(corpus):
    root, cfg, train, val = corpus
    from mixgantts_tpu.models.diffusion import DiffusionSchedule
    from mixgantts_tpu.models.mixgantts import MixGANTTS
    from mixgantts_tpu.train import create_train_state, make_train_step
    from test_train_step import TRAIN_CONFIG as TC, tiny_disc

    out = cfg["path"]["preprocessed_path"]
    stats = NormStats.load(out, n_mels=20)
    schedule = DiffusionSchedule.create(
        "vpsde", 2, 0.1, 40, 0.008, stats.spec_min, stats.spec_max)
    model = MixGANTTS(
        mode="naive", schedule=schedule, stats=stats,
        hidden=32, encoder_layers=1, encoder_heads=2, conv_kernel_size=3,
        decoder_layers=1, decoder_heads=2, conv_filter_size=64,
        max_seq_len=256, n_mels=20, n_bins=8, residual_channels=16,
        residual_layers=2)
    disc = tiny_disc()

    ds = AcousticDataset("train.txt", "naive", cfg, MODEL_CONFIG,
                         {**TC, "optimizer": {**TC["optimizer"],
                                              "batch_size": 2}},
                         sort=True)
    batch = next(b for b in ds.batches(group_size=1, epochs=1)
                 if b is not None)
    model_batch = {k: v for k, v in batch.items()
                   if k not in ("ids", "raw_texts")}
    mc = {"transformer": {"encoder_hidden": 32},
          "discriminator": {"n_layer": 3, "n_cond_layer": 2}}
    state = create_train_state(
        jax.random.PRNGKey(0), model, disc,
        {**model_batch, "max_mel_len": model_batch["mels"].shape[1]},
        TC, mc)
    step_fn = jax.jit(make_train_step("naive", model, disc, mc, TC))
    state, metrics = step_fn(state, model_batch)
    assert np.isfinite(float(metrics["total_loss"]))


def test_text_only_dataset(corpus):
    root, cfg, train, val = corpus
    out = cfg["path"]["preprocessed_path"]
    ds = TextOnlyDataset(os.path.join(out, "val.txt"), cfg, MODEL_CONFIG)
    batch = next(ds.batches(batch_size=4))
    assert batch["texts"].shape[0] == len(ds)
    assert batch["word_boundaries"].shape[0] == batch["texts"].shape[0]
