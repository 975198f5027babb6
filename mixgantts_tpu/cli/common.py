"""Shared CLI plumbing: config loading, path-tag routing, model assembly.

Path routing parity (`train.py:303-314`, `synthesize.py:220-231`):
ckpt/log dirs are suffixed `_naive` or `_shallow` (aux and shallow share),
result dirs by the exact model name, all with an optional extra path tag.
"""

import json
import os

import jax

from ..config import get_configs_of, NormStats
from ..models.discriminator import JCUDiscriminator
from ..models.mixgantts import MixGANTTS


def enable_compilation_cache(cache_dir=None):
    """Persistent XLA compilation cache: the train/synthesize programs
    compile once per machine instead of once per process (first TPU compile
    is minutes; every later CLI invocation then starts in seconds)."""
    cache_dir = cache_dir or os.environ.get(
        "MIXGANTTS_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "mixgantts_xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"compilation cache disabled ({e})")


def route_paths(train_config, model, path_tag=""):
    train_tag = "naive" if model == "naive" else "shallow"
    tag = f"_{path_tag}" if path_tag else ""
    p = train_config["path"]
    p["ckpt_path"] = p["ckpt_path"] + f"_{train_tag}{tag}"
    p["log_path"] = p["log_path"] + f"_{train_tag}{tag}"
    p["result_path"] = p["result_path"] + f"_{model}{tag}"
    return train_config


def load_configs(args):
    enable_compilation_cache()
    preprocess_config, model_config, train_config = get_configs_of(
        args.dataset)
    if args.model == "shallow":
        assert args.restore_step >= train_config["step"]["total_step_aux"], \
            "shallow training must restore from a finished aux checkpoint"
    route_paths(train_config, args.model, getattr(args, "path_tag", ""))
    return preprocess_config, model_config, train_config


def n_speakers_of(preprocess_config, model_config):
    if not model_config["multi_speaker"]:
        return 1
    path = os.path.join(preprocess_config["path"]["preprocessed_path"],
                        "speakers.json")
    with open(path) as f:
        return len(json.load(f))


def build_model(mode, preprocess_config, model_config):
    stats = NormStats.load_or_default(
        preprocess_config["path"]["preprocessed_path"],
        n_mels=preprocess_config["preprocessing"]["mel"]["n_mel_channels"])
    model = MixGANTTS.from_configs(
        mode, preprocess_config, model_config, stats,
        n_speakers=n_speakers_of(preprocess_config, model_config))
    return model, stats


def build_discriminator(preprocess_config, model_config):
    d = model_config["discriminator"]
    return JCUDiscriminator(
        n_mels=preprocess_config["preprocessing"]["mel"]["n_mel_channels"],
        residual_channels=model_config["denoiser"]["residual_channels"],
        n_layer=d["n_layer"],
        n_uncond_layer=d["n_uncond_layer"],
        n_cond_layer=d["n_cond_layer"],
        n_channels=tuple(d["n_channels"]),
        kernel_sizes=tuple(d["kernel_sizes"]),
        strides=tuple(d["strides"]),
        multi_speaker=model_config["multi_speaker"],
    )


def param_count(tree):
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def model_batch_of(batch):
    """Strip host-only fields before handing a batch to the jitted step."""
    return {k: v for k, v in batch.items() if k not in ("ids", "raw_texts")}
