"""F0 extraction and pitch utilities.

The reference uses two native F0 backends at preprocess time: pyworld
DIO+StoneMask (`preprocessor/preprocessor.py:294-300`) and Praat/parselmouth
autocorrelation (`utils/pitch_tools.py:84-121`).  Neither library exists in
this image, so we ship an in-repo normalized-autocorrelation (NCCF) tracker
with parabolic peak interpolation and median smoothing — the same family of
algorithm as Praat's `to_pitch_ac`.  It runs vectorized numpy at preprocess
time only (F0 never touches the TPU hot path).

The coarse-quantization / normalization helpers mirror
`utils/pitch_tools.py:19-81`, and the continuous-wavelet pitch decomposition
(Mexican-hat CWT, `utils/pitch_tools.py:175-282`) is re-derived without
pycwt.
"""

import numpy as np
from scipy.interpolate import interp1d

f0_bin = 256
f0_max = 1100.0
f0_min = 50.0
f0_mel_min = 1127 * np.log(1 + f0_min / 700)
f0_mel_max = 1127 * np.log(1 + f0_max / 700)


# --- extraction ----------------------------------------------------------------

def extract_f0(wav, sr, hop_length, f0_floor=71.0, f0_ceil=800.0,
               voicing_threshold=0.45):
    """Frame-synchronous F0 track (0 = unvoiced), one value per hop.

    Normalized autocorrelation per frame (via FFT), peak picked in the
    [sr/f0_ceil, sr/f0_floor] lag range with parabolic refinement, a
    voicing decision on the normalized peak height, then 3-tap median
    smoothing.  Frame count = 1 + len(wav) // hop_length, matching the
    mel frame count of the centered STFT.
    """
    wav = np.asarray(wav, dtype=np.float64)
    win = int(2 * sr / f0_floor)
    win = min(win, max(len(wav) - 1, 1))
    n_frames = 1 + len(wav) // hop_length
    pad = win // 2
    x = np.pad(wav, (pad, pad + win), mode="constant")

    starts = np.arange(n_frames) * hop_length
    idx = starts[:, None] + np.arange(win)[None, :]
    frames = x[idx]
    frames = frames - frames.mean(axis=1, keepdims=True)

    # autocorrelation via rfft (power spectrum roundtrip)
    nfft = int(2 ** np.ceil(np.log2(2 * win)))
    spec = np.fft.rfft(frames, n=nfft, axis=1)
    ac = np.fft.irfft(np.abs(spec) ** 2, axis=1)[:, :win]
    ac0 = np.maximum(ac[:, :1], 1e-12)
    # Unbiased normalization: the zero-padded linear autocorrelation of a
    # perfectly periodic frame still decays as (win - lag)/win, so without
    # this correction the small-lag shoulder outscores the true period peak
    # for low F0 (lag near win/2) — Praat divides by the window
    # autocorrelation the same way (`utils/pitch_tools.py:84-121` backend).
    lags = np.arange(win)
    norm = np.maximum(win - lags, 1) / win
    nac = ac / ac0 / norm[None, :]

    lag_min = max(int(sr / f0_ceil), 2)
    lag_max = min(int(sr / f0_floor), win - 2)
    # Period candidates must be true local maxima: a raw argmax that lands
    # on the lag_min boundary is the still-decaying lag-0 shoulder, not a
    # pitch peak.  A small octave cost (Praat-style) favors the shorter
    # lag when two harmonically-related peaks tie within noise.
    is_peak = np.zeros_like(nac, dtype=bool)
    is_peak[:, 1:-1] = ((nac[:, 1:-1] >= nac[:, :-2])
                        & (nac[:, 1:-1] >= nac[:, 2:]))
    octave_cost = 0.01
    score = np.where(is_peak, nac, -np.inf) \
        - octave_cost * np.log2(np.maximum(lags, 1) / lag_min)
    search = score[:, lag_min:lag_max]
    peak_rel = np.argmax(search, axis=1)
    peak = peak_rel + lag_min
    has_peak = np.isfinite(search[np.arange(n_frames), peak_rel])

    # parabolic interpolation around the peak
    rows = np.arange(n_frames)
    y0 = nac[rows, peak - 1]
    y1 = nac[rows, peak]
    y2 = nac[rows, peak + 1]
    denom = (y0 - 2 * y1 + y2)
    offset = np.where(np.abs(denom) > 1e-12,
                      0.5 * (y0 - y2) / np.where(np.abs(denom) > 1e-12,
                                                 denom, 1.0), 0.0)
    offset = np.clip(offset, -1.0, 1.0)
    lag = peak + offset

    f0 = sr / lag
    energy = np.sqrt(np.mean(frames ** 2, axis=1))
    voiced = has_peak & (y1 > voicing_threshold) & (energy > 1e-4) \
        & (f0 >= f0_floor) & (f0 <= f0_ceil)
    f0 = np.where(voiced, f0, 0.0)

    # 3-tap median smoothing on the full track (keeps 0 runs intact)
    if n_frames >= 3:
        padded = np.pad(f0, 1, mode="edge")
        stacked = np.stack([padded[:-2], padded[1:-1], padded[2:]])
        f0 = np.median(stacked, axis=0)
    return f0.astype(np.float64)


def interpolate_unvoiced(pitch):
    """Linear interpolation over unvoiced (zero) regions, edge-filled
    (`preprocessor/preprocessor.py:311-323`)."""
    pitch = np.asarray(pitch, dtype=np.float64).copy()
    nonzero = np.where(pitch != 0)[0]
    if len(nonzero) == 0:
        return pitch
    fn = interp1d(nonzero, pitch[nonzero],
                  fill_value=(pitch[nonzero[0]], pitch[nonzero[-1]]),
                  bounds_error=False)
    return fn(np.arange(len(pitch)))


# --- quantization / normalization (utils/pitch_tools.py parity) ---------------

def f0_to_coarse(f0):
    """256-bin mel-scale pitch quantization (`utils/pitch_tools.py:26-35`)."""
    f0 = np.asarray(f0, dtype=np.float64)
    f0_mel = 1127 * np.log(1 + f0 / 700)
    f0_mel = np.where(
        f0_mel > 0,
        (f0_mel - f0_mel_min) * (f0_bin - 2) / (f0_mel_max - f0_mel_min) + 1,
        f0_mel)
    f0_mel = np.clip(f0_mel, 1, f0_bin - 1)
    return np.rint(f0_mel).astype(np.int64)


def norm_f0(f0, uv, pitch_norm="log", f0_mean=None, f0_std=None, eps=1e-8,
            use_uv=True):
    f0 = np.asarray(f0, dtype=np.float64).copy()
    if pitch_norm == "standard":
        f0 = (f0 - f0_mean) / f0_std
    elif pitch_norm == "log":
        f0 = np.log2(f0 + eps)
    if uv is not None and use_uv:
        f0[uv > 0] = 0
    return f0


def norm_interp_f0(f0, **kwargs):
    f0 = np.asarray(f0, dtype=np.float64)
    uv = f0 == 0
    f0 = norm_f0(f0, uv, **kwargs)
    if uv.all():
        f0[uv] = 0
    elif uv.any():
        f0[uv] = np.interp(np.where(uv)[0], np.where(~uv)[0], f0[~uv])
    return f0, uv


def denorm_f0(f0, uv, pitch_norm="log", f0_mean=None, f0_std=None,
              use_uv=True, pitch_padding=None, fmin=None, fmax=None):
    f0 = np.asarray(f0, dtype=np.float64).copy()
    if pitch_norm == "standard":
        f0 = f0 * f0_std + f0_mean
    elif pitch_norm == "log":
        f0 = 2.0 ** f0
    if fmin is not None:
        f0 = np.maximum(f0, fmin)
    if fmax is not None:
        f0 = np.minimum(f0, fmax)
    if uv is not None and use_uv:
        f0[uv > 0] = 0
    if pitch_padding is not None:
        f0[pitch_padding] = 0
    return f0


# --- continuous wavelet pitch decomposition ------------------------------------

def _mexican_hat(t):
    # Ricker wavelet psi(t) = (2/(sqrt(3) pi^{1/4})) (1 - t^2) exp(-t^2/2)
    c = 2.0 / (np.sqrt(3.0) * np.pi ** 0.25)
    return c * (1 - t ** 2) * np.exp(-t ** 2 / 2)


def get_lf0_cwt(lf0, dt=0.005, dj=1.0, n_scales=10, s0_factor=2.0):
    """Decompose a log-F0 contour into `n_scales` wavelet components
    (Mexican-hat CWT at dyadic scales), the reference's CWT pitch
    representation (`utils/pitch_tools.py:226-249`).

    Returns (components [T, n_scales], scales [n_scales])."""
    lf0 = np.asarray(lf0, dtype=np.float64)
    T = len(lf0)
    s0 = dt * s0_factor
    scales = s0 * 2.0 ** (np.arange(n_scales) * dj)
    t = (np.arange(T) - T / 2.0) * dt
    out = np.zeros((T, n_scales))
    x = lf0 - lf0.mean()
    for i, s in enumerate(scales):
        # sampled, L1-normalized wavelet at this scale
        width = min(T, max(int(10 * s / dt), 3))
        tt = (np.arange(width) - width / 2.0) * dt
        psi = _mexican_hat(tt / s)
        psi = psi / np.sqrt(s)
        wav = np.convolve(x, psi[::-1], mode="same") * dt
        # the standard CWT component scaling for reconstruction
        out[:, i] = wav * (i + 2.5) ** (-2.5)
    return out, scales


def inverse_cwt(components, scales, dj=1.0, dt=0.005):
    """Approximate inverse of `get_lf0_cwt` (sum of rescaled components,
    `utils/pitch_tools.py:251-262` formulation)."""
    components = np.asarray(components, dtype=np.float64)
    out = np.zeros(components.shape[0])
    for i in range(components.shape[1]):
        out += components[:, i] * (i + 2.5) ** 2.5
    return out * dj * dt ** 0.5
