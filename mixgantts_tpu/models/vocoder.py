"""Vocoder loading + mel->waveform inference.

Parity target: `utils/model.py:76-126` in the reference — `get_vocoder`
returns a ready generator ('HiFi-GAN' from a speaker-specific checkpoint,
'MelGAN' with its 1/ln10 input scaling), `vocoder_infer` converts a mel
batch to int16 waveforms trimmed to mel_len * hop_length.

Pretrained weights ship as torch `.pth.tar` / hub checkpoints; the
converters in hifigan.py / melgan.py fold weight norm and re-lay kernels.
If no checkpoint file is present the generator runs with random init (shape
-correct, for tests and benchmarking).
"""

import json
import math
import os
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .hifigan import HiFiGANGenerator, convert_torch_generator
from .melgan import MelGANGenerator, convert_torch_melgan

_PKG_DIR = os.path.dirname(os.path.dirname(__file__))
DEFAULT_HIFIGAN_CONFIG = {
    "resblock": "1",
    "upsample_rates": [8, 8, 2, 2],
    "upsample_kernel_sizes": [16, 16, 4, 4],
    "upsample_initial_channel": 512,
    "resblock_kernel_sizes": [3, 7, 11],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    "num_mels": 80,
}


@dataclass
class Vocoder:
    name: str                      # 'HiFi-GAN' | 'MelGAN'
    module: Any
    params: Any
    config: Any = None             # HiFi-GAN config dict (fused path)
    _infer: Any = field(default=None, repr=False)

    @property
    def apply_fn(self):
        """(params, mel) -> waveform; the raw network (no MelGAN input
        scale).  On TPU backends the HiFi-GAN MRF stack runs as a fused
        Pallas kernel (`hifigan.fused_apply`); the flax module path is
        kept for CPU/tests, non-HiFi-GAN models, and V2/V3-style configs
        with per-branch resblock dilations (which the fused kernel rejects
        — it shares one dilation schedule across branches)."""
        if (self.name == "HiFi-GAN" and self.config is not None
                and jax.default_backend() in ("tpu", "axon")):
            dils = [tuple(d)
                    for d in self.config["resblock_dilation_sizes"]]
            if all(d == dils[0] for d in dils):
                from .hifigan import fused_apply
                config = self.config
                return lambda params, mel: fused_apply(params, mel, config)
        module = self.module
        return lambda params, mel: module.apply({"params": params}, mel)

    def __call__(self, mel):
        """mel: [B, T, n_mels] log-mel -> waveform [B, T * hop]."""
        if self._infer is None:
            scale = 1.0 / math.log(10.0) if self.name == "MelGAN" else 1.0
            fn = self.apply_fn
            object.__setattr__(
                self, "_infer", jax.jit(
                    lambda params, mel: fn(params, mel * scale)))
        return self._infer(self.params, mel)


def _load_torch_state_dict(path):
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "generator" in ckpt:
        ckpt = ckpt["generator"]
    if hasattr(ckpt, "state_dict"):
        ckpt = ckpt.state_dict()
    return {k: v.numpy() for k, v in ckpt.items()}


def get_vocoder(model_config, ckpt_dir=None, num_mels=None):
    """Build the configured vocoder; loads converted weights if a
    checkpoint for the configured speaker exists.  `num_mels` overrides the
    input channel count when no vocoder config.json is present (tests /
    non-80-bin corpora with a random-init generator)."""
    name = model_config["vocoder"]["model"]
    speaker = model_config["vocoder"]["speaker"]
    if ckpt_dir is None:
        ckpt_dir = os.path.join(_PKG_DIR, "..", "vocoder_ckpt")

    if name == "HiFi-GAN":
        config = dict(DEFAULT_HIFIGAN_CONFIG)
        cfg_path = os.path.join(ckpt_dir, "config.json")
        if os.path.isfile(cfg_path):
            with open(cfg_path) as f:
                config.update(json.load(f))
        elif num_mels is not None:
            config["num_mels"] = num_mels
        module = HiFiGANGenerator.from_config(config)
        ckpt_path = os.path.join(ckpt_dir, f"generator_{speaker}.pth.tar")
        if os.path.isfile(ckpt_path):
            params = convert_torch_generator(
                _load_torch_state_dict(ckpt_path), config)
        else:
            params = module.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 16, config["num_mels"])))["params"]
        return Vocoder(name, module, params, config=config)

    if name == "MelGAN":
        ckpt_path = os.path.join(ckpt_dir, "melgan_generator.pt")
        if os.path.isfile(ckpt_path):
            # converted torch.hub weights are 80-mel by construction
            module = MelGANGenerator()
            params = convert_torch_melgan(_load_torch_state_dict(ckpt_path))
        else:
            # random-init generator: honor the corpus's mel bin count
            # (tests / non-80-bin corpora), as the HiFi-GAN branch does
            module = MelGANGenerator(n_mels=num_mels or 80)
            params = module.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 16, num_mels or 80)))["params"]
        return Vocoder(name, module, params)

    raise ValueError(f"unknown vocoder {name!r}")


def vocoder_infer(mels, vocoder, preprocess_config, lengths=None):
    """[B, T, n_mels] mel batch -> list of int16 waveforms, trimmed to
    mel_len * hop_length (`utils/model.py:108-126`)."""
    max_wav_value = preprocess_config["preprocessing"]["audio"]["max_wav_value"]
    hop = preprocess_config["preprocessing"]["stft"]["hop_length"]
    wavs = np.asarray(vocoder(jnp.asarray(mels)))
    wavs = (np.clip(wavs, -1.0, 1.0) * max_wav_value).astype(np.int16)
    out = []
    for i in range(len(wavs)):
        if lengths is not None:
            out.append(wavs[i, :int(lengths[i]) * hop])
        else:
            out.append(wavs[i])
    return out
