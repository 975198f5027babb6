"""Batched XLA mel-spectrogram pipeline.

Parity with the reference's conv-based TacotronSTFT (`audio/stft.py:15-178`):
reflect padding of n_fft/2 on both sides, periodic Hann window, magnitude
spectrum, Slaney mel basis, log dynamic-range compression with clip 1e-5
(`audio/audio_processing.py:85-91`), and frame energy = L2 norm of the
magnitude spectrum.  The conv-with-Fourier-basis trick is replaced by a
framed rfft, which XLA maps directly onto the TPU; the result is numerically
identical (the conv's weights ARE the DFT basis).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .mel import mel_filterbank


def hann_window(win_length, n_fft):
    """Periodic (fftbins) Hann window zero-padded to n_fft, matching
    `scipy.signal.get_window('hann', win, fftbins=True)` + pad_center."""
    n = np.arange(win_length)
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    pad = n_fft - win_length
    lpad = pad // 2
    return np.pad(win, (lpad, pad - lpad)).astype(np.float32)


def frame_signal(y, n_fft, hop_length):
    """[B, T] -> [B, n_frames, n_fft] centered frames with reflect padding."""
    pad = n_fft // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (y.shape[1] - n_fft) // hop_length
    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(n_fft)[None, :])
    return y[:, idx]


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def _mel_energy(y, n_fft, hop_length, win_length, n_mels, sr, fmax):
    frames = frame_signal(y, n_fft, hop_length)
    win = jnp.asarray(hann_window(win_length, n_fft))
    spec = jnp.fft.rfft(frames * win[None, None, :], axis=-1)
    magnitude = jnp.abs(spec)  # [B, F, n_fft//2+1]
    basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, 0.0, fmax))
    mel = jnp.einsum("mf,btf->bmt", basis, magnitude)
    mel = jnp.log(jnp.clip(mel, 1e-5, None))
    energy = jnp.linalg.norm(magnitude, axis=-1)  # [B, F]
    return mel, energy


class TacotronSTFT:
    """Drop-in equivalent of the reference TacotronSTFT
    (`audio/stft.py:130-178`): `mel_spectrogram(y)` -> (mel [B, n_mels, F],
    energy [B, F]) for y in [-1, 1]."""

    def __init__(self, filter_length, hop_length, win_length, n_mel_channels,
                 sampling_rate, mel_fmin=0.0, mel_fmax=None):
        self.filter_length = filter_length
        self.hop_length = hop_length
        self.win_length = win_length
        self.n_mel_channels = n_mel_channels
        self.sampling_rate = sampling_rate
        self.mel_fmin = mel_fmin
        self.mel_fmax = mel_fmax

    def mel_spectrogram(self, y):
        y = jnp.asarray(y)
        if y.ndim == 1:
            y = y[None]
        return _mel_energy(y, self.filter_length, self.hop_length,
                           self.win_length, self.n_mel_channels,
                           self.sampling_rate, self.mel_fmax)

    def get_mel_from_wav(self, audio):
        """Single-utterance numpy helper (`audio/tools.py:8-15`).

        Pure numpy on purpose: offline preprocessing sees a new waveform
        length per utterance, and a jitted kernel would recompile for every
        one of them (hours over a full corpus).  The batched jax version
        (`mel_spectrogram`) stays for on-device use with bucketed shapes."""
        y = np.clip(np.asarray(audio, dtype=np.float32), -1.0, 1.0)
        n_fft, hop = self.filter_length, self.hop_length
        pad = n_fft // 2
        yp = np.pad(y, pad, mode="reflect")
        n_frames = 1 + (len(yp) - n_fft) // hop
        idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)
        win = hann_window(self.win_length, n_fft)
        spec = np.fft.rfft(yp[idx] * win, axis=-1)
        magnitude = np.abs(spec)                       # [F, n_fft//2+1]
        basis = mel_filterbank(self.sampling_rate, n_fft,
                               self.n_mel_channels, 0.0, self.mel_fmax)
        mel = np.log(np.clip(magnitude @ basis.T, 1e-5, None)).T
        energy = np.linalg.norm(magnitude, axis=-1)
        return mel.astype(np.float32), energy.astype(np.float32)

    # --- inversion (Griffin-Lim) for the reference's inv_mel_spec path -----

    def _linear_from_mel(self, mel):
        basis = mel_filterbank(self.sampling_rate, self.filter_length,
                               self.n_mel_channels, 0.0, self.mel_fmax)
        inv_basis = np.linalg.pinv(basis)
        return np.maximum(1e-10, inv_basis @ np.exp(np.asarray(mel)))

    def griffin_lim(self, magnitude, n_iters=30, seed=0):
        """Phase reconstruction from a [n_freq, F] magnitude (numpy)."""
        rng = np.random.RandomState(seed)
        angles = np.exp(2j * np.pi * rng.rand(*magnitude.shape))
        win = hann_window(self.win_length, self.filter_length)
        n_fft, hop = self.filter_length, self.hop_length

        def istft(stft_matrix):
            frames = np.fft.irfft(stft_matrix.T, n=n_fft, axis=-1) * win
            T = (stft_matrix.shape[1] - 1) * hop + n_fft
            y = np.zeros(T)
            wsum = np.zeros(T)
            for i, frame in enumerate(frames):
                y[i * hop:i * hop + n_fft] += frame
                wsum[i * hop:i * hop + n_fft] += win ** 2
            y[wsum > 1e-8] /= wsum[wsum > 1e-8]
            return y[n_fft // 2:-(n_fft // 2)]

        def stft(y):
            pad = n_fft // 2
            yp = np.pad(y, pad, mode="reflect")
            n_frames = 1 + (len(yp) - n_fft) // hop
            idx = (np.arange(n_frames)[:, None] * hop + np.arange(n_fft))
            return np.fft.rfft(yp[idx] * win, axis=-1).T

        signal = istft(magnitude * angles)
        for _ in range(n_iters):
            angles = np.exp(1j * np.angle(stft(signal)))
            signal = istft(magnitude * angles)
        return signal

    def inv_mel_spec(self, mel, n_iters=30):
        """mel [n_mels, F] log-mel -> waveform via Griffin-Lim
        (`audio/tools.py:18-34`)."""
        return self.griffin_lim(self._linear_from_mel(mel), n_iters=n_iters)
