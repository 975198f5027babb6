"""Cross-tracker F0 agreement: bounds the drift risk of the in-repo NCCF
tracker vs the reference's pyworld DIO+StoneMask preprocessing
(`preprocessor/preprocessor.py:294-300`).

pyworld/praat are not installable in this image, so the second opinion is
an in-repo re-derivation of the DIO algorithm itself (`extract_f0_dio`:
band-filtered event-interval candidates + instantaneous-frequency
refinement — no machinery shared with the NCCF tracker).  The agreement
statistics printed by `python tests/test_f0_agreement.py` are recorded in
BASELINE.md; the tests pin floors so they cannot silently regress.
"""

import numpy as np
import pytest

from mixgantts_tpu.audio.f0 import extract_f0, extract_f0_dio

SR, HOP = 22050, 256


def _harmonic(f0_fn, dur=1.0, amps=(1.0, 0.5, 0.3), amp_fn=None,
              noise=0.0, seed=0):
    t = np.arange(int(SR * dur)) / SR
    phase = 2 * np.pi * np.cumsum(f0_fn(t)) / SR
    x = sum(a * np.sin((i + 1) * phase) for i, a in enumerate(amps))
    if amp_fn is not None:
        x = x * amp_fn(t)
    if noise:
        x = x + noise * np.random.RandomState(seed).randn(len(x))
    return x


def _speechlike(seed=0):
    """Recorded-style test signal: voiced vowel-like segments with a
    moving F0 contour and shimmer, separated by unvoiced fricative-like
    noise bursts and silence."""
    r = np.random.RandomState(seed)
    parts, truth = [], []
    for seg in range(4):
        # voiced segment: declination + excursion, rich harmonics
        dur = 0.35
        t = np.arange(int(SR * dur)) / SR
        base = r.uniform(100, 240)
        contour = base * (1 - 0.12 * t / dur) \
            * (1 + 0.04 * np.sin(2 * np.pi * r.uniform(2, 5) * t))
        phase = 2 * np.pi * np.cumsum(contour) / SR
        x = sum(a * np.sin(h * phase) for h, a in
                [(1, 1.0), (2, 0.6), (3, 0.4), (4, 0.2), (5, 0.1)])
        x *= 1 + 0.1 * np.sin(2 * np.pi * 3 * t + seg)   # shimmer
        x += 0.02 * r.randn(len(x))                       # breathiness
        parts.append(0.4 * x)
        truth.append(contour)
        # unvoiced: fricative burst then a short silence
        n_fric = int(SR * 0.08)
        fric = r.randn(n_fric) * np.hanning(n_fric) * 0.15
        parts.append(fric)
        truth.append(np.zeros(n_fric))
        n_sil = int(SR * 0.06)
        parts.append(np.zeros(n_sil))
        truth.append(np.zeros(n_sil))
    wav = np.concatenate(parts)
    truth_t = np.concatenate(truth)
    n_frames = 1 + len(wav) // HOP
    idx = np.minimum(np.arange(n_frames) * HOP, len(truth_t) - 1)
    return wav, truth_t[idx]


CASES = [
    ("tone_110", lambda: (_harmonic(lambda t: 110.0 + 0 * t),
                          lambda t: 110.0 + 0 * t)),
    ("tone_220", lambda: (_harmonic(lambda t: 220.0 + 0 * t),
                          lambda t: 220.0 + 0 * t)),
    ("vibrato", lambda: (
        _harmonic(lambda t: 150.0 * (1 + 0.05 * np.sin(2 * np.pi * 6 * t))),
        lambda t: 150.0 * (1 + 0.05 * np.sin(2 * np.pi * 6 * t)))),
    ("am", lambda: (
        _harmonic(lambda t: 200.0 + 0 * t,
                  amp_fn=lambda t: 0.5 * (1 + 0.95 * np.sin(2 * np.pi * 4 * t))),
        lambda t: 200.0 + 0 * t)),
    ("noisy", lambda: (_harmonic(lambda t: 180.0 + 0 * t, noise=0.35),
                       lambda t: 180.0 + 0 * t)),
    ("creak_75", lambda: (_harmonic(lambda t: 75.0 + 0 * t),
                          lambda t: 75.0 + 0 * t)),
    ("glide", lambda: (_harmonic(lambda t: 120.0 * 2.0 ** (0.5 * t)),
                       lambda t: 120.0 * 2.0 ** (0.5 * t))),
]


def _stats(f0_a, f0_b):
    """(voicing agreement %, mean |Δf0| cents over mutually voiced)."""
    va = (f0_a > 0) == (f0_b > 0)
    both = (f0_a > 0) & (f0_b > 0)
    if both.sum() == 0:
        return va.mean(), np.nan
    cents = 1200 * np.abs(np.log2(f0_a[both] / f0_b[both]))
    return va.mean(), cents.mean()


def _truth_track(truth_fn_or_arr, n_frames):
    if callable(truth_fn_or_arr):
        t = np.arange(n_frames) * HOP / SR
        return truth_fn_or_arr(t)
    return truth_fn_or_arr


def collect():
    rows = []
    for name, make in CASES:
        wav, truth = make()
        nccf = extract_f0(wav, SR, HOP)
        dio = extract_f0_dio(wav, SR, HOP)
        truth_t = _truth_track(truth, len(nccf))
        va, cents = _stats(nccf, dio)
        _, cents_nccf = _stats(nccf, np.maximum(truth_t, 0))
        _, cents_dio = _stats(dio, np.maximum(truth_t, 0))
        rows.append((name, va, cents, cents_nccf, cents_dio))
    for seed in range(3):
        wav, truth_t = _speechlike(seed)
        nccf = extract_f0(wav, SR, HOP)
        dio = extract_f0_dio(wav, SR, HOP)
        va, cents = _stats(nccf, dio)
        _, cents_nccf = _stats(nccf, truth_t)
        _, cents_dio = _stats(dio, truth_t)
        rows.append((f"speechlike_{seed}", va, cents, cents_nccf, cents_dio))
    return rows


@pytest.fixture(scope="module")
def rows():
    return collect()


def test_cross_tracker_voicing_agreement(rows):
    """The two independent trackers agree on voiced/unvoiced >= 95% of
    frames on every case, >= 97.5% on average (BASELINE.md F0 drift bound)."""
    vas = [r[1] for r in rows]
    for name, va, *_ in rows:
        assert va >= 0.95, f"{name}: voicing agreement {va:.2%}"
    assert np.mean(vas) >= 0.975, np.mean(vas)


def test_cross_tracker_f0_drift(rows):
    """Mutually-voiced |Δf0| <= 20 cents mean per case, <= 8 cents
    averaged over the suite (a semitone is 100 cents)."""
    cents = [r[2] for r in rows if np.isfinite(r[2])]
    for name, _, c, *_ in rows:
        assert not np.isfinite(c) or c <= 20.0, f"{name}: {c:.1f} cents"
    assert np.mean(cents) <= 8.0, np.mean(cents)


def test_both_trackers_near_ground_truth(rows):
    """Each tracker independently lands within 10 cents of ground truth
    on mutually-voiced frames (averaged over the suite)."""
    nccf = [r[3] for r in rows if np.isfinite(r[3])]
    dio = [r[4] for r in rows if np.isfinite(r[4])]
    assert np.mean(nccf) <= 10.0, np.mean(nccf)
    assert np.mean(dio) <= 10.0, np.mean(dio)


if __name__ == "__main__":
    print(f"{'case':>14}  {'voicing%':>8}  {'Δcents':>7}  "
          f"{'nccf±GT':>8}  {'dio±GT':>7}")
    rs = collect()
    for name, va, cents, cn, cd in rs:
        print(f"{name:>14}  {va:8.2%}  {cents:7.1f}  {cn:8.1f}  {cd:7.1f}")
    vas = [r[1] for r in rs]
    cs = [r[2] for r in rs if np.isfinite(r[2])]
    print(f"{'MEAN':>14}  {np.mean(vas):8.2%}  {np.mean(cs):7.1f}")
