"""Corpus preparation (prepare_align): LJSpeech metadata.csv and AISHELL3
content.txt formats -> per-speaker raw_data wav (peak-normalized int16) +
.lab transcripts (parity: `preprocessor/ljspeech.py:11-38`,
`preprocessor/aishell3.py:8-34`)."""

import os

import numpy as np

from mixgantts_tpu.audio.wav import load_wav, save_wav
from mixgantts_tpu.data import aishell3, ljspeech

SR = 22050


def _tone(path, seconds=0.2, amp=0.25):
    t = np.arange(int(SR * seconds)) / SR
    wav = (amp * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    save_wav(path, wav, SR)
    return wav


def test_ljspeech_prepare_align(tmp_path):
    corpus = tmp_path / "LJSpeech"
    (corpus / "wavs").mkdir(parents=True)
    _tone(str(corpus / "wavs" / "LJ001-0001.wav"))
    with open(corpus / "metadata.csv", "w") as f:
        f.write("LJ001-0001|Printing|Printing, Mr. Smith said 2 times.\n")
        f.write("LJ001-0002|missing|this wav does not exist\n")

    out = tmp_path / "raw_data"
    config = {
        "path": {"corpus_path": str(corpus), "raw_path": str(out)},
        "preprocessing": {
            "audio": {"sampling_rate": SR, "max_wav_value": 32768.0},
            "text": {"text_cleaners": ["english_cleaners"]},
        },
    }
    ljspeech.prepare_align(config)

    spk = out / "LJSpeech"
    assert sorted(os.listdir(spk)) == ["LJ001-0001.lab", "LJ001-0001.wav"]
    with open(spk / "LJ001-0001.lab") as f:
        lab = f.read()
    # english cleaner: lowercase, abbreviation + number expansion
    assert lab == "printing, mister smith said two times."
    wav, sr = load_wav(str(spk / "LJ001-0001.wav"), SR)
    assert sr == SR
    # peak-normalized to max_wav_value before the int16 write (load_wav
    # returns floats rescaled to [-1, 1])
    assert 0.95 <= np.max(np.abs(wav)) <= 1.0


def test_aishell3_prepare_align(tmp_path):
    corpus = tmp_path / "AISHELL3"
    wav_dir = corpus / "train" / "wav" / "SSB0005"
    wav_dir.mkdir(parents=True)
    _tone(str(wav_dir / "SSB00050001.wav"))
    with open(corpus / "train" / "content.txt", "w", encoding="utf-8") as f:
        f.write("SSB00050001.wav\t你 ni3 好 hao3\n")
        f.write("SSB99990001.wav\t缺 que1 失 shi1\n")  # wav missing -> skip

    out = tmp_path / "raw_data"
    config = {
        "path": {"corpus_path": str(corpus), "raw_path": str(out)},
        "preprocessing": {
            "audio": {"sampling_rate": SR, "max_wav_value": 32768.0},
        },
    }
    aishell3.prepare_align(config)

    spk = out / "SSB0005"
    files = sorted(os.listdir(spk))
    assert files == ["SSB00050001.lab", "SSB00050001.wav"]
    with open(spk / "SSB00050001.lab", encoding="utf-8") as f:
        # pinyin tokens only (content.txt alternates hanzi and pinyin)
        assert f.read() == "ni3 hao3"
