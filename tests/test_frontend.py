"""Inference frontend (g2p + word boundaries) and speaker embedder tests.

Parity targets: `synthesize.py:25-103` (EN/ZH preprocessing) and
`deepspeaker/` + `model/speaker_embedder.py` in the reference.
"""

import os

import numpy as np
import pytest

from mixgantts_tpu.frontend import (
    letter_to_sound, preprocess_english, preprocess_mandarin, read_lexicon,
)
from mixgantts_tpu.text import text_to_sequence, sequence_to_text


@pytest.fixture()
def en_config(tmp_path):
    lex = tmp_path / "lexicon.txt"
    lex.write_text("hello HH AH0 L OW1\nworld W ER1 L D\n")
    return {
        "path": {"lexicon_path": str(lex)},
        "preprocessing": {"text": {
            "text_cleaners": [],
            "language": "en",
            "sub_divide_word": True,
            "max_phoneme_num": 7,
        }},
    }


@pytest.fixture()
def zh_config(tmp_path):
    lex = tmp_path / "pinyin-lexicon.txt"
    lex.write_text("ni3 n i3\nhao3 h ao3\nshi4 sh ib4\n")
    return {
        "path": {"lexicon_path": str(lex)},
        "preprocessing": {"text": {
            "text_cleaners": [],
            "language": "zh",
            "sub_divide_word": False,
            "max_phoneme_num": 7,
        }},
    }


def test_english_lexicon_words(en_config):
    seq, wb = preprocess_english("hello world", en_config, verbose=False)
    # 4 + 4 phones, two words
    assert wb.tolist() == [4, 4]
    assert len(seq) == 8
    assert wb.sum() == len(seq)


def test_english_oov_falls_back_to_lts(en_config):
    seq, wb = preprocess_english("hello zorp", en_config, verbose=False)
    assert len(wb) == 2
    assert wb.sum() == len(seq)
    assert (seq > 0).all()


def test_english_punctuation_becomes_sp(en_config):
    seq, wb = preprocess_english("hello, world", en_config, verbose=False)
    # comma contributes one "sp" token and its own word slot
    assert wb.sum() == len(seq)
    text = sequence_to_text(seq.tolist())
    assert "sp" in text


def test_english_subdivision(en_config):
    # a 12-phone OOV word must split into <=7-phone chunks
    word = "abcdefgh"
    phones = letter_to_sound(word)
    seq, wb = preprocess_english(word, en_config, verbose=False)
    assert max(wb.tolist()) <= 7
    assert wb.sum() == len(seq) == len(phones)


def test_letter_to_sound_digraphs():
    assert letter_to_sound("singing")[-2:] == ["IH0", "NG"]
    assert "CH" in letter_to_sound("church")
    assert letter_to_sound("") == ["spn"]


def test_mandarin_pinyin(zh_config):
    seq, wb = preprocess_mandarin("ni3 hao3", zh_config, verbose=False)
    assert wb.tolist() == [2, 2]
    assert wb.sum() == len(seq)
    assert (seq > 0).all()


def test_mandarin_hanzi_input(zh_config):
    """Raw Chinese text works like the reference's pypinyin path
    (`synthesize.py:70-103`): same sequence as the equivalent TONE3 input
    (VERDICT r1 #3)."""
    seq_h, wb_h = preprocess_mandarin("你好", zh_config, verbose=False)
    seq_p, wb_p = preprocess_mandarin("ni3 hao3", zh_config, verbose=False)
    np.testing.assert_array_equal(seq_h, seq_p)
    np.testing.assert_array_equal(wb_h, wb_p)


def test_mandarin_hanzi_sentence_with_punctuation(zh_config):
    from mixgantts_tpu.text import sequence_to_text

    seq, wb = preprocess_mandarin(
        "今天天气真不错，我们一起去公园散步吧。", zh_config, verbose=False)
    assert wb.sum() == len(seq)
    assert (seq > 0).all()
    # punctuation becomes "sp" (reference lexicon-miss behavior)
    assert "sp" in sequence_to_text(seq.tolist())


def test_mandarin_rejects_garbage(zh_config):
    with pytest.raises(ValueError):
        preprocess_mandarin("not pinyin!!", zh_config, verbose=False)


def test_hanzi_table_syllables_all_decomposable():
    """Every reading the table or phrase list can emit must resolve into
    lexicon phones, so no hanzi input can produce an unsynthesizable
    token."""
    from mixgantts_tpu.text.hanzi import _PHRASES, _TABLE, get_readings
    from mixgantts_tpu.text.pinyin import pinyin_to_phones

    syllables = {line.split()[0] for line in _TABLE.strip().splitlines()}
    for toks in _PHRASES.values():
        syllables.update(toks)
    for s in sorted(syllables):
        assert pinyin_to_phones(s), f"undcomposable syllable {s!r}"
    assert len(get_readings()) > 2000  # coverage floor


def test_hanzi_polyphone_defaults_and_phrases():
    from mixgantts_tpu.text.hanzi import hanzi_to_pinyin

    # standalone defaults for the nastiest polyphones
    assert hanzi_to_pinyin("行") == ["xing2"]
    assert hanzi_to_pinyin("了") == ["le5"]
    assert hanzi_to_pinyin("着") == ["zhe5"]
    assert hanzi_to_pinyin("的") == ["de5"]
    assert hanzi_to_pinyin("长") == ["chang2"]
    assert hanzi_to_pinyin("重") == ["zhong4"]
    assert hanzi_to_pinyin("还") == ["hai2"]
    # phrase-context overrides
    assert hanzi_to_pinyin("银行") == ["yin2", "hang2"]
    assert hanzi_to_pinyin("行长") == ["hang2", "zhang3"]
    assert hanzi_to_pinyin("了解") == ["liao3", "jie3"]
    assert hanzi_to_pinyin("音乐") == ["yin1", "yue4"]
    assert hanzi_to_pinyin("快乐") == ["kuai4", "le4"]
    assert hanzi_to_pinyin("重新") == ["chong2", "xin1"]
    # neutral tone written as 5 (pypinyin neutral_tone_with_five=True)
    assert hanzi_to_pinyin("我们") == ["wo3", "men5"]
    # unknown characters pass through for the downstream "sp" mapping
    assert hanzi_to_pinyin("你x好") == ["ni3", "x", "hao3"]


def test_read_lexicon_first_pronunciation_wins(tmp_path):
    lex = tmp_path / "l.txt"
    lex.write_text("word W ER1 D\nword X Y Z\n")
    assert read_lexicon(str(lex))["word"] == ["W", "ER1", "D"]


# --- speaker embedder ---------------------------------------------------------

def test_speaker_embedder_shapes():
    from mixgantts_tpu.models.speaker_embedder import PreDefinedEmbedder

    emb = PreDefinedEmbedder({"preprocessing": {
        "audio": {"sampling_rate": 22050},
        "stft": {"win_length": 1024},
        "speaker_embedder": "DeepSpeaker",
    }})
    rng = np.random.RandomState(0)
    wav = rng.randn(22050).astype(np.float32) * 0.1
    out = emb(wav)
    out = np.asarray(out)
    assert out.shape == (512,) or out.shape == (1, 512)
    # embeddings are L2-normalized (DeepSpeaker contract)
    assert abs(np.linalg.norm(out) - 1.0) < 1e-3


def test_external_speaker_projection_forward():
    """multi_speaker + external embedder: spker_embeds drives speaker_proj."""
    import jax
    from mixgantts_tpu.config import NormStats
    from mixgantts_tpu.models.mixgantts import MixGANTTS
    from mixgantts_tpu.models.diffusion import DiffusionSchedule

    stats = NormStats.default(n_mels=20)
    schedule = DiffusionSchedule.create(
        "vpsde", 2, 0.1, 40, 0.008, stats.spec_min[:20], stats.spec_max[:20])
    model = MixGANTTS(
        mode="naive", schedule=schedule, stats=stats, hidden=32,
        encoder_layers=1, encoder_heads=2, conv_kernel_size=3,
        decoder_layers=1, conv_filter_size=64, max_seq_len=64, n_mels=20,
        n_bins=16, vp_filter_size=16, residual_channels=16,
        residual_layers=2, multi_speaker=True, n_speakers=4,
        embedder_type="DeepSpeaker", external_speaker_dim=512)

    B, P, W, T = 2, 8, 4, 16
    r = np.random.RandomState(0)
    wb = r.randint(1, 3, (B, W)).astype(np.int32)
    src_lens = wb.sum(-1).astype(np.int32)
    texts = np.zeros((B, P), np.int64)
    for b in range(B):
        texts[b, :src_lens[b]] = r.randint(1, 100, src_lens[b])
    out = MixGANTTS.init_with_output(
        model,
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "diffusion": jax.random.PRNGKey(2)},
        speakers=np.zeros((B,), np.int32), texts=texts, src_lens=src_lens,
        word_boundaries=wb, src_w_lens=np.full((B,), W, np.int32),
        max_mel_len=T,
        spker_embeds=r.randn(B, 512).astype(np.float32),
        train=False)[0]
    assert out.speaker_emb.shape == (B, 32)
    assert np.isfinite(np.asarray(out.mel_pred)).all()


# --- pinyin decomposition -----------------------------------------------------

def test_pinyin_rules():
    from mixgantts_tpu.text.pinyin import pinyin_to_phones

    assert pinyin_to_phones("zhi1") == ["zh", "iii1"]
    assert pinyin_to_phones("si4") == ["s", "ii4"]
    assert pinyin_to_phones("ang4") == ["ang4"]
    assert pinyin_to_phones("jun1") == ["j", "vn1"]
    assert pinyin_to_phones("yue4") == ["y", "ve4"]
    assert pinyin_to_phones("liu2") == ["l", "iou2"]
    assert pinyin_to_phones("shui3") == ["sh", "uei3"]
    assert pinyin_to_phones("weng1") == ["w", "uen1"]
    assert pinyin_to_phones("bar1") == ["b", "a1", "rr"]   # erhua
    assert pinyin_to_phones("hello") is None
    assert pinyin_to_phones("xyz9") is None


@pytest.mark.skipif(
    not os.path.isfile("/root/reference/lexicon/pinyin-lexicon-r.txt"),
    reason="reference lexicon not available")
def test_pinyin_matches_reference_lexicon_exactly():
    """Every entry of the reference's 4115-syllable lexicon reproduces from
    the rules (first pronunciation wins, matching read_lexicon)."""
    from mixgantts_tpu.text.pinyin import pinyin_to_phones

    ref = {}
    with open("/root/reference/lexicon/pinyin-lexicon-r.txt") as f:
        for line in f:
            parts = line.split()
            if parts and parts[0] not in ref:
                ref[parts[0]] = parts[1:]
    mismatches = [s for s, phones in ref.items()
                  if pinyin_to_phones(s) != phones]
    assert not mismatches, mismatches[:10]


def test_mandarin_rule_fallback_without_lexicon(tmp_path):
    cfg = {
        "path": {"lexicon_path": str(tmp_path / "missing.txt")},
        "preprocessing": {"text": {
            "text_cleaners": [], "language": "zh",
            "sub_divide_word": False, "max_phoneme_num": 7,
        }},
    }
    seq, wb = preprocess_mandarin("zhong1 guo2", cfg, verbose=False)
    assert wb.tolist() == [2, 2]
    assert (seq > 0).all()


def test_build_lexicon_entries_cover_reference_syllables():
    from mixgantts_tpu.text.pinyin import build_lexicon_entries

    entries = dict(build_lexicon_entries())
    for syl, phones in [("zhi1", ["zh", "iii1"]), ("jun1", ["j", "vn1"]),
                        ("a1", ["a1"]), ("r5", ["er5"])]:
        assert entries[syl] == phones


def test_hanzi_mixed_latin_runs_group_to_one_token():
    """pypinyin's errors='default' returns an embedded non-han run (e.g.
    a Latin word) as ONE item -> one 'sp' downstream
    (`/root/reference/synthesize.py:70-103`); per-character pass-through
    would shred 'iPhone' into 6 silences."""
    from mixgantts_tpu.text.hanzi import hanzi_to_pinyin

    toks = hanzi_to_pinyin("我的iPhone坏了")
    assert toks == ["wo3", "de5", "iPhone", "huai4", "le5"]
    # whitespace terminates a run
    assert hanzi_to_pinyin("abc def") == ["abc", "def"]
    # runs between hanzi on both sides
    assert hanzi_to_pinyin("你ok吗") == ["ni3", "ok", "ma5"]
