"""DeepSpeaker ResCNN speaker embedder (flax) + feature pipeline.

Parity targets: `deepspeaker/conv_models.py:22-140` (4-stage ResCNN 64->512
with clipped ReLU, temporal average, 512-d affine, L2 norm),
`deepspeaker/audio_ds.py:34-44,127-137` (energy-threshold trim + 64-filter
log-fbank with per-frame mean/std normalization),
`deepspeaker/batcher.py:23-29` (sample/pad to 160 frames) and the
`PreDefinedEmbedder` wrapper (`model/speaker_embedder.py:11-42`).

The reference runs this in TensorFlow/Keras offline during preprocessing;
here the network is flax (runs on CPU or TPU) and pretrained Keras `.h5`
weights load through `convert_keras_weights` (h5py).  The `fbank` features
replicate python_speech_features' defaults (25 ms/10 ms frames, preemphasis
0.97, HTK mel filterbank, power spectrum 1/NFFT * |FFT|^2).
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

SAMPLE_RATE = 22050
NUM_FRAMES = 160
NUM_FBANKS = 64


# --- feature pipeline (python_speech_features.fbank equivalent) --------------

def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asanyarray(f) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asanyarray(m) / 2595.0) - 1.0)


def _htk_filterbank(nfilt, nfft, sr):
    low, high = 0.0, sr / 2.0
    mel_pts = np.linspace(_hz_to_mel_htk(low), _hz_to_mel_htk(high),
                          nfilt + 2)
    bins = np.floor((nfft + 1) * _mel_to_hz_htk(mel_pts) / sr).astype(int)
    fb = np.zeros((nfilt, nfft // 2 + 1))
    for m in range(1, nfilt + 1):
        f_m_minus, f_m, f_m_plus = bins[m - 1], bins[m], bins[m + 1]
        for k in range(f_m_minus, f_m):
            fb[m - 1, k] = (k - f_m_minus) / max(f_m - f_m_minus, 1)
        for k in range(f_m, f_m_plus):
            fb[m - 1, k] = (f_m_plus - k) / max(f_m_plus - f_m, 1)
    return fb


def calculate_nfft(sample_rate, winlen):
    window_length_samples = winlen * sample_rate
    nfft = 1
    while nfft < window_length_samples:
        nfft *= 2
    return nfft


def psf_fbank(signal, sr, nfft, nfilt=NUM_FBANKS, winlen=0.025, winstep=0.01,
              preemph=0.97):
    """python_speech_features.fbank equivalent (rectangular window)."""
    signal = np.append(signal[0], signal[1:] - preemph * signal[:-1])
    frame_len = int(round(winlen * sr))
    frame_step = int(round(winstep * sr))
    if len(signal) <= frame_len:
        n_frames = 1
    else:
        n_frames = 1 + int(math.ceil((len(signal) - frame_len) / frame_step))
    pad_len = (n_frames - 1) * frame_step + frame_len
    signal = np.pad(signal, (0, max(0, pad_len - len(signal))))
    idx = (np.arange(n_frames)[:, None] * frame_step
           + np.arange(frame_len)[None, :])
    frames = signal[idx]
    pspec = (1.0 / nfft) * np.abs(np.fft.rfft(frames, nfft, axis=1)) ** 2
    fb = _htk_filterbank(nfilt, nfft, sr)
    feat = pspec @ fb.T
    feat = np.where(feat == 0, np.finfo(float).eps, feat)
    return feat


def normalize_frames(m, epsilon=1e-12):
    mean = m.mean(axis=1, keepdims=True)
    std = np.maximum(m.std(axis=1, keepdims=True), epsilon)
    return (m - mean) / std


def read_mfcc(audio, sample_rate, win_length):
    """Energy-trimmed, frame-normalized fbank features
    (`deepspeaker/audio_ds.py:34-44`)."""
    energy = np.abs(audio)
    silence_threshold = np.percentile(energy, 95)
    offsets = np.where(energy > silence_threshold)[0]
    audio = audio[offsets[0]:offsets[-1]] if len(offsets) > 1 else audio
    nfft = calculate_nfft(sample_rate, win_length / sample_rate)
    return normalize_frames(
        psf_fbank(audio, sample_rate, nfft)).astype(np.float32)


def sample_from_mfcc(mfcc, max_length=NUM_FRAMES, rng=None):
    if mfcc.shape[0] >= max_length:
        r = (rng or np.random).randint(0, len(mfcc) - max_length + 1) \
            if mfcc.shape[0] > max_length else 0
        s = mfcc[r:r + max_length]
    else:
        s = np.vstack([mfcc, np.zeros((max_length - len(mfcc),
                                       mfcc.shape[1]))])
    return s[..., None].astype(np.float32)


# --- ResCNN ------------------------------------------------------------------

def clipped_relu(x):
    return jnp.clip(x, 0.0, 20.0)


class IdentityBlock(nn.Module):
    filters: int

    @nn.compact
    def __call__(self, x, train=False):
        y = nn.Conv(self.filters, (3, 3), padding="SAME", name="conv_2a")(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn_2a")(y)
        y = clipped_relu(y)
        y = nn.Conv(self.filters, (3, 3), padding="SAME", name="conv_2b")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn_2b")(y)
        y = clipped_relu(y)
        return clipped_relu(y + x)


class DeepSpeakerResCNN(nn.Module):
    """[B, T, 64, 1] fbank frames -> [B, 512] L2-normalized embedding."""

    @nn.compact
    def __call__(self, x, train=False):
        for stage, filters in enumerate([64, 128, 256, 512], start=1):
            x = nn.Conv(filters, (5, 5), strides=(2, 2), padding="SAME",
                        name=f"conv{filters}-s")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f"conv{filters}-s_bn")(x)
            x = clipped_relu(x)
            for block in range(3):
                x = IdentityBlock(filters,
                                  name=f"res{stage}_{block}")(x, train=train)
        B = x.shape[0]
        x = x.reshape(B, x.shape[1], -1)       # [B, T/16, 4*512]
        x = jnp.mean(x, axis=1)                # temporal average
        x = nn.Dense(512, name="affine")(x)
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def convert_keras_weights(h5_path):
    """Keras ResCNN_triplet .h5 -> flax params/batch_stats trees."""
    import h5py

    params, stats = {}, {}

    def conv(name):
        g = f[name][name]
        return {"kernel": np.asarray(g["kernel:0"]),
                "bias": np.asarray(g["bias:0"])}

    def bn(name):
        g = f[name][name]
        return ({"scale": np.asarray(g["gamma:0"]),
                 "bias": np.asarray(g["beta:0"])},
                {"mean": np.asarray(g["moving_mean:0"]),
                 "var": np.asarray(g["moving_variance:0"])})

    with h5py.File(h5_path, "r") as f0:
        f = f0["model_weights"] if "model_weights" in f0 else f0
        for stage, filters in enumerate([64, 128, 256, 512], start=1):
            cname = f"conv{filters}-s"
            params[cname] = conv(cname)
            p, s = bn(cname + "_bn")
            params[cname + "_bn"], stats[cname + "_bn"] = p, s
            for block in range(3):
                base = f"res{stage}_{block}_branch"
                bp, bs = {}, {}
                bp["conv_2a"] = conv(base + "_2a")
                bp["conv_2b"] = conv(base + "_2b")
                p, s = bn(base + "_2a_bn")
                bp["bn_2a"], bs["bn_2a"] = p, s
                p, s = bn(base + "_2b_bn")
                bp["bn_2b"], bs["bn_2b"] = p, s
                params[f"res{stage}_{block}"] = bp
                stats[f"res{stage}_{block}"] = bs
        params["affine"] = conv("affine") if "affine" in f else {
            "kernel": np.asarray(f["affine"]["affine"]["kernel:0"]),
            "bias": np.asarray(f["affine"]["affine"]["bias:0"])}
    return params, stats


class PreDefinedEmbedder:
    """Preprocess-time wrapper (`model/speaker_embedder.py:11-42`):
    wav -> (1, 512) embedding."""

    def __init__(self, config, ckpt_path=None):
        pp = config["preprocessing"]
        self.sampling_rate = pp["audio"]["sampling_rate"]
        self.win_length = pp["stft"]["win_length"]
        self.embedder_type = pp.get("speaker_embedder", "DeepSpeaker")
        if self.embedder_type != "DeepSpeaker":
            raise NotImplementedError(self.embedder_type)
        self.module = DeepSpeakerResCNN()
        if ckpt_path is None:
            ckpt_path = os.path.join(
                os.path.dirname(os.path.dirname(__file__)), "..",
                "vocoder_ckpt", "ResCNN_triplet_training_checkpoint_265.h5")
        if os.path.isfile(ckpt_path):
            params, stats = convert_keras_weights(ckpt_path)
            self.variables = {"params": params, "batch_stats": stats}
        else:
            x0 = jnp.zeros((1, NUM_FRAMES, NUM_FBANKS, 1))
            self.variables = self.module.init(jax.random.PRNGKey(0), x0)
        self._apply = jax.jit(
            lambda v, x: self.module.apply(v, x, train=False))

    def __call__(self, audio):
        mfcc = read_mfcc(np.asarray(audio), self.sampling_rate,
                         self.win_length)
        feats = sample_from_mfcc(mfcc)[None]
        return np.asarray(self._apply(self.variables, feats))
