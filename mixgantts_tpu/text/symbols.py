"""Symbol inventory for the text frontend.

The inventory (and its ID ordering) is compatible with the reference
(`/root/reference/text/symbols.py:10-29`): pad, special, punctuation, letters,
@ARPAbet, @pinyin, silences.  Both phone inventories are regular, so instead of
shipping 400 lines of literal tables we *generate* them:

- ARPAbet (`text/cmudict.py:6-90` in the reference): 39 base phones in
  alphabetical order; each vowel contributes [V, V0, V1, V2] (stress variants),
  consonants contribute just themselves — 84 symbols.
- Pinyin (`text/pinyin.py` in the reference): 23 initials in alphabetical
  order, then 37 base finals in alphabetical order x tones 1-5, then "rr" —
  209 symbols.
"""

# --- ARPAbet ----------------------------------------------------------------

_ARPA_VOWELS = [
    "AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER", "EY", "IH", "IY",
    "OW", "OY", "UH", "UW",
]
_ARPA_CONSONANTS = [
    "B", "CH", "D", "DH", "F", "G", "HH", "JH", "K", "L", "M", "N", "NG",
    "P", "R", "S", "SH", "T", "TH", "V", "W", "Y", "Z", "ZH",
]

arpabet_symbols = []
for _base in sorted(_ARPA_VOWELS + _ARPA_CONSONANTS):
    if _base in _ARPA_VOWELS:
        arpabet_symbols += [_base, _base + "0", _base + "1", _base + "2"]
    else:
        arpabet_symbols.append(_base)

# --- Pinyin -----------------------------------------------------------------

pinyin_initials = [
    "b", "c", "ch", "d", "f", "g", "h", "j", "k", "l", "m", "n", "p", "q",
    "r", "s", "sh", "t", "w", "x", "y", "z", "zh",
]
_PINYIN_FINAL_BASES = [
    "a", "ai", "an", "ang", "ao", "e", "ei", "en", "eng", "er", "i", "ia",
    "ian", "iang", "iao", "ie", "ii", "iii", "in", "ing", "iong", "iou",
    "o", "ong", "ou", "u", "ua", "uai", "uan", "uang", "uei", "uen", "uo",
    "v", "van", "ve", "vn",
]
pinyin_finals = [b + str(t) for b in _PINYIN_FINAL_BASES for t in range(1, 6)]
pinyin_symbols = pinyin_initials + pinyin_finals + ["rr"]

# --- Full table -------------------------------------------------------------

_pad = "_"
_punctuation = "!'(),.:;? "
_special = "-"
_letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
_silences = ["@sp", "@spn", "@sil"]

# "@" prefix keeps phone symbols distinct from bare letters.
_arpabet = ["@" + s for s in arpabet_symbols]
_pinyin = ["@" + s for s in pinyin_symbols]

symbols = (
    [_pad]
    + list(_special)
    + list(_punctuation)
    + list(_letters)
    + _arpabet
    + _pinyin
    + _silences
)

silence_symbols = list(_silences)
