"""Host-side helpers (numpy): padding, word subdivision, expansion.

Parity targets live in `utils/tools.py` of the reference (pad_1D/2D/3D at
:334-371, word_level_subdivision at :415-423, expand at :155-159); the
device-side mask/pooling equivalents are in `mixgantts_tpu.ops`.
"""

import numpy as np


def word_level_subdivision(phones_per_word, max_phoneme_num):
    """Split words longer than max_phoneme_num into chunks."""
    res = []
    for l in phones_per_word:
        if l <= max_phoneme_num:
            res.append(int(l))
        else:
            s, r = divmod(int(l), max_phoneme_num)
            res += [max_phoneme_num] * s + ([r] if r else [])
    return res


def pad_1d(inputs, length=None, pad_value=0):
    """Stack 1D arrays padded to a common (or given) length."""
    length = length or max(len(x) for x in inputs)
    return np.stack([
        np.pad(np.asarray(x), (0, length - len(x)), constant_values=pad_value)
        for x in inputs])


def pad_2d(inputs, length=None):
    """Stack [T_i, D] arrays padded on the time axis."""
    length = length or max(np.shape(x)[0] for x in inputs)
    return np.stack([
        np.pad(np.asarray(x), ((0, length - np.shape(x)[0]), (0, 0)))
        for x in inputs])


def pad_3d(inputs, B, T, L):
    """Place [t_i, l_i] arrays into a zero [B, T, L] box."""
    out = np.zeros((B, T, L), dtype=np.float32)
    for i, x in enumerate(inputs):
        x = np.asarray(x)
        out[i, :x.shape[0], :x.shape[1]] = x
    return out


def expand(values, durations):
    """Repeat each value by its duration (host-side logging helper)."""
    out = []
    for value, d in zip(values, durations):
        out += [value] * max(0, int(d))
    return np.array(out)


def bucket_length(n, buckets):
    """Smallest bucket >= n (falls back to n itself past the largest)."""
    for b in buckets:
        if n <= b:
            return b
    return n
