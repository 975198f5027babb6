"""Inference text frontend: grapheme-to-phoneme with word boundaries.

Parity targets: `synthesize.py:25-103` in the reference — lexicon lookup
with a G2P fallback for English, pinyin (TONE3) lookup for Mandarin,
punctuation -> "sp", per-word phone counts (word_boundaries) and optional
word subdivision at max_phoneme_num.

The reference's external `g2p_en` / `pypinyin` packages are not available
here, so:
- English OOV words fall back to an in-repo rule-based letter-to-sound
  (covers the common digraphs; anything unpronounceable becomes "spn"),
- Mandarin input is accepted as raw hanzi (converted by the in-repo
  curated table in `text/hanzi.py`, pypinyin-equivalent TONE3 output) or
  directly as TONE3 pinyin tokens (e.g. "ni3 hao3").
"""

import os
import re
from string import punctuation

import numpy as np

from .text import text_to_sequence
from .utils.tools import word_level_subdivision

_lexicon_cache = {}


def read_lexicon(lex_path):
    """word -> phone list (first pronunciation wins)."""
    lex_path = os.path.abspath(lex_path)
    if lex_path in _lexicon_cache:
        return _lexicon_cache[lex_path]
    lexicon = {}
    with open(lex_path, encoding="utf-8") as f:
        for line in f:
            parts = re.split(r"\s+", line.strip("\n"))
            if not parts or not parts[0]:
                continue
            word, phones = parts[0], parts[1:]
            if word.lower() not in lexicon:
                lexicon[word.lower()] = phones
    _lexicon_cache[lex_path] = lexicon
    return lexicon


# --- rule-based English letter-to-sound fallback -----------------------------
# NRL-style context-rule G2P with measured held-out accuracy
# (tests/test_g2p.py); replaces round 1's ~30-rule greedy digraph mapper.
from .text.lts import letter_to_sound  # noqa: F401  (re-export, stable API)


def preprocess_english(text, preprocess_config, verbose=True):
    text = text.rstrip(punctuation)
    lexicon = read_lexicon(preprocess_config["path"]["lexicon_path"]) \
        if os.path.isfile(preprocess_config["path"]["lexicon_path"]) else {}

    phones, word_boundaries = [], []
    for w in re.split(r"([,;.\-\?\!\s+])", text):
        if w.lower() in lexicon:
            phone_list = lexicon[w.lower()]
        elif re.search(r"[A-Za-z]", w):
            phone_list = letter_to_sound(w)
        else:
            phone_list = list(w.strip())
        if phone_list:
            phones += phone_list
            word_boundaries.append(len(phone_list))
    phone_str = "{" + "}{".join(phones) + "}"
    phone_str = re.sub(r"\{[^\w\s]?\}", "{sp}", phone_str)
    phone_str = phone_str.replace("}{", " ")

    if preprocess_config["preprocessing"]["text"]["sub_divide_word"]:
        word_boundaries = word_level_subdivision(
            word_boundaries,
            preprocess_config["preprocessing"]["text"]["max_phoneme_num"])
    if verbose:
        print(f"Raw Text Sequence: {text}")
        print(f"Phoneme Sequence: {phone_str}")
    sequence = np.array(text_to_sequence(
        phone_str, preprocess_config["preprocessing"]["text"]["text_cleaners"]))
    return sequence, np.array(word_boundaries)


_PINYIN_RE = re.compile(r"^[a-z]+[1-5]$")


def preprocess_mandarin(text, preprocess_config, verbose=True):
    from .text.hanzi import contains_hanzi, hanzi_to_pinyin
    from .text.pinyin import pinyin_to_phones

    lex_path = preprocess_config["path"]["lexicon_path"]
    lexicon = read_lexicon(lex_path) if os.path.isfile(lex_path) else {}

    if contains_hanzi(text):
        # raw Chinese text -> TONE3 tokens, like the reference's pypinyin
        # call (`synthesize.py:78-81`); punctuation/unknowns pass through
        # and miss the lexicon below -> "sp", reference behavior
        tokens = hanzi_to_pinyin(text)
    else:
        tokens = text.strip().split()
        if not all(_PINYIN_RE.match(t) or not t for t in tokens):
            raise ValueError(
                "Mandarin input must be hanzi or TONE3 pinyin tokens "
                "(e.g. '你好' or 'ni3 hao3')")
    phones, word_boundaries = [], []
    for p in tokens:
        # lexicon first (reference behavior), rule-based decomposition as
        # the built-in fallback so no lexicon file is required
        phone_list = lexicon.get(p) or pinyin_to_phones(p) or ["sp"]
        if phone_list:
            phones += phone_list
            word_boundaries.append(len(phone_list))
    phone_str = "{" + " ".join(phones) + "}"
    if preprocess_config["preprocessing"]["text"]["sub_divide_word"]:
        word_boundaries = word_level_subdivision(
            word_boundaries,
            preprocess_config["preprocessing"]["text"]["max_phoneme_num"])
    if verbose:
        print(f"Raw Text Sequence: {text}")
        print(f"Phoneme Sequence: {phone_str}")
    sequence = np.array(text_to_sequence(
        phone_str, preprocess_config["preprocessing"]["text"]["text_cleaners"]))
    return sequence, np.array(word_boundaries)
