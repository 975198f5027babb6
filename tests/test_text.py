import pytest

from mixgantts_tpu.text import (
    text_to_sequence, sequence_to_text, sil_phonemes_ids,
)
from mixgantts_tpu.text.symbols import symbols
from mixgantts_tpu.text.numbers import normalize_numbers
from mixgantts_tpu.text.cleaners import english_cleaners


def test_symbol_table_shape():
    # pad + special(1) + punct(10) + letters(52) + arpabet(84) + pinyin(209) + sil(3)
    assert len(symbols) == 1 + 1 + 10 + 52 + 84 + 209 + 3
    assert symbols[0] == "_"
    assert len(set(symbols)) == len(symbols)  # unique IDs


def test_arpabet_roundtrip():
    seq = text_to_sequence("{HH AH0 L OW1} world!", ["english_cleaners"])
    assert len(seq) > 0
    text = sequence_to_text(seq)
    assert "HH AH0 L OW1" in text
    assert "world!" in text


def test_sil_ids():
    ids = sil_phonemes_ids()
    assert len(ids) == 3
    assert [symbols[i] for i in ids] == ["@sp", "@spn", "@sil"]


@pytest.mark.parametrize("src,expect", [
    ("1", "one"),
    ("15", "fifteen"),
    ("21", "twenty-one"),
    ("100", "one hundred"),
    ("101", "one hundred one"),
    ("1999", "nineteen ninety-nine"),
    ("2000", "two thousand"),
    ("2008", "two thousand eight"),
    ("1900", "nineteen hundred"),
    ("3042", "three thousand forty-two"),
    ("$5", "five dollars"),
    ("$1.50", "one dollar, fifty cents"),
    ("3.14", "three point fourteen"),
    ("2nd", "second"),
    ("21st", "twenty-first"),
    ("30th", "thirtieth"),
    ("12th", "twelfth"),
    # 1234 falls in the (1000, 3000) year-style branch, like the reference
    ("1,234", "twelve thirty-four"),
    ("5,000", "five thousand"),
])
def test_number_expansion(src, expect):
    assert normalize_numbers(src) == expect


def test_english_cleaners():
    assert english_cleaners("Dr. Smith bought 2 CDs.") == \
        "doctor smith bought two cds."
    assert english_cleaners("Café  au\tlait") == "cafe au lait"


def test_cmudict_parser_matches_reference_semantics():
    """`text/cmudict.py` parity (reference `text/cmudict.py:95-140`,
    dead at runtime there but part of the public surface): two-space
    separator, (n) alternates merged, invalid-symbol entries dropped,
    non-A-Z/apostrophe lines ignored, keep_ambiguous filter, and the
    84-symbol inventory identical to the generated @ARPAbet table."""
    import io

    from mixgantts_tpu.text.cmudict import CMUDict, valid_symbols
    from mixgantts_tpu.text.symbols import symbols

    arpabet = [s[1:] for s in symbols if s.startswith("@")
               and not s[1:].islower() and s[1:] not in ("sp", "spn", "sil")]
    assert valid_symbols == arpabet[:len(valid_symbols)]
    assert len(valid_symbols) == 84

    sample = io.StringIO(
        ";;; comment line\n"
        "HELLO  HH AH0 L OW1\n"
        "HELLO(1)  HH EH0 L OW1\n"
        "'BOUT  B AW1 T\n"
        "BOGUS  QQ ZZ\n"          # invalid symbols -> dropped
        "lowercase  L OW1\n"      # doesn't start with A-Z/apostrophe
        "WORLD  W ER1 L D\n"
    )
    d = CMUDict(sample)
    assert len(d) == 3
    assert d.lookup("hello") == ["HH AH0 L OW1", "HH EH0 L OW1"]
    assert d.lookup("'bout") == ["B AW1 T"]
    assert d.lookup("bogus") is None
    assert d.lookup("world") == ["W ER1 L D"]

    sample.seek(0)
    unambiguous = CMUDict(sample, keep_ambiguous=False)
    assert unambiguous.lookup("hello") is None
    assert unambiguous.lookup("world") == ["W ER1 L D"]
