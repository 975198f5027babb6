"""Config system: the reference's YAML triplet per dataset
(`utils/tools.py:23-31` in MaxMax2016/MixGAN-TTS), preserved verbatim so
workflows are drop-in, plus helpers for stats-derived constants.
"""

import json
import os
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import yaml

_PKG_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")


def get_configs_of(dataset, config_dir=None):
    """Load (preprocess, model, train) config dicts for a dataset.

    Searches `./config/<dataset>` first (reference layout), then the packaged
    configs under `mixgantts_tpu/configs/<dataset>`.
    """
    candidates = []
    if config_dir is not None:
        candidates.append(os.path.join(config_dir, dataset))
    candidates += [
        os.path.join("./config", dataset),
        os.path.join(_PKG_CONFIG_DIR, dataset),
    ]
    for cand in candidates:
        if os.path.isdir(cand):
            config_dir = cand
            break
    else:
        raise FileNotFoundError(f"no config dir found for dataset {dataset!r}")

    def _load(name):
        with open(os.path.join(config_dir, name)) as f:
            return yaml.safe_load(f)

    return _load("preprocess.yaml"), _load("model.yaml"), _load("train.yaml")


@dataclass(frozen=True)
class NormStats:
    """Dataset statistics from preprocessing (`stats.json`).

    Stored as hashable tuples so they can live as static attributes on flax
    modules without breaking jit caching; use `.spec_min_arr` etc. for arrays.
    """

    pitch_min: float
    pitch_max: float
    pitch_mean: float
    pitch_std: float
    energy_min: float
    energy_max: float
    energy_mean: float
    energy_std: float
    spec_min: Tuple[float, ...]
    spec_max: Tuple[float, ...]
    max_seq_len: Optional[int] = None

    @property
    def spec_min_arr(self):
        return np.asarray(self.spec_min, dtype=np.float32)

    @property
    def spec_max_arr(self):
        return np.asarray(self.spec_max, dtype=np.float32)

    @classmethod
    def load(cls, preprocessed_path, n_mels=80):
        path = os.path.join(preprocessed_path, "stats.json")
        with open(path) as f:
            stats = json.load(f)
        p = stats["pitch"]
        e = stats["energy"]
        return cls(
            pitch_min=float(p[0]), pitch_max=float(p[1]),
            pitch_mean=float(p[2]), pitch_std=float(p[3]),
            energy_min=float(e[0]), energy_max=float(e[1]),
            energy_mean=float(e[2]), energy_std=float(e[3]),
            spec_min=tuple(float(x) for x in stats["spec_min"][:n_mels]),
            spec_max=tuple(float(x) for x in stats["spec_max"][:n_mels]),
            max_seq_len=stats.get("max_seq_len"),
        )

    @classmethod
    def default(cls, n_mels=80):
        """Placeholder stats for tests / randomly initialized models."""
        return cls(
            pitch_min=-2.0, pitch_max=10.0, pitch_mean=200.0, pitch_std=50.0,
            energy_min=-1.5, energy_max=8.0, energy_mean=30.0, energy_std=20.0,
            spec_min=tuple([-12.0] * n_mels), spec_max=tuple([2.0] * n_mels),
            max_seq_len=1000,
        )

    @classmethod
    def load_or_default(cls, preprocessed_path, n_mels=80):
        try:
            return cls.load(preprocessed_path, n_mels)
        except (FileNotFoundError, KeyError, json.JSONDecodeError):
            return cls.default(n_mels)
