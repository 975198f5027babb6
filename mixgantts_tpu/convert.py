"""Reference-checkpoint conversion: PyTorch MixGAN-TTS `.pth.tar` G/D
state_dicts -> flax parameter trees.

Enables parity testing (BASELINE.md: mel MAE < 1e-3 vs the reference with
converted weights) and lets users of the reference carry their trained
checkpoints over.  Layout rules:
- torch Conv1d [out, in, k]    -> flax [k, in, out]
- torch Linear [out, in]       -> flax [in, out]
- LayerNorm / Embedding        -> carried as-is
- BatchNorm running stats      -> the `batch_stats` collection
Name mapping follows the reference module tree (`model/*.py`,
`transformer/*.py`).
"""

import numpy as np


def _conv(sd, prefix):
    out = {"kernel": np.transpose(np.asarray(sd[prefix + ".weight"]),
                                  (2, 1, 0))}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _linear(sd, prefix):
    out = {"kernel": np.asarray(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _wrapped_conv(sd, prefix):
    return {"conv": _conv(sd, prefix + ".conv")}


def _wrapped_linear(sd, prefix):
    return {"linear": _linear(sd, prefix + ".linear")}


def _ln(sd, prefix):
    return {"gamma": np.asarray(sd[prefix + ".gamma"]),
            "beta": np.asarray(sd[prefix + ".beta"])}


def _torch_ln(sd, prefix):
    return {"scale": np.asarray(sd[prefix + ".weight"]),
            "bias": np.asarray(sd[prefix + ".bias"])}


def _step_mlp(sd, prefix):
    return {"fc1": _wrapped_linear(sd, prefix + ".0"),
            "fc2": _wrapped_linear(sd, prefix + ".2")}


def _variance_predictor(sd, prefix):
    return {
        "conv_0": _wrapped_conv(sd, prefix + ".conv_layer.conv1d_1"),
        "ln_0": _torch_ln(sd, prefix + ".conv_layer.layer_norm_1"),
        "conv_1": _wrapped_conv(sd, prefix + ".conv_layer.conv1d_2"),
        "ln_1": _torch_ln(sd, prefix + ".conv_layer.layer_norm_2"),
        "proj": _linear(sd, prefix + ".linear_layer"),
    }


def _relative_fft(sd, prefix, n_layers):
    out = {}
    for i in range(n_layers):
        out[f"attn_{i}"] = {
            "conv_q": _conv_block(sd, f"{prefix}.attn_layers.{i}.conv_q"),
            "conv_k": _conv_block(sd, f"{prefix}.attn_layers.{i}.conv_k"),
            "conv_v": _conv_block(sd, f"{prefix}.attn_layers.{i}.conv_v"),
            "conv_o": _conv_block(sd, f"{prefix}.attn_layers.{i}.conv_o"),
            "emb_rel_k": np.asarray(
                sd[f"{prefix}.attn_layers.{i}.emb_rel_k"]),
            "emb_rel_v": np.asarray(
                sd[f"{prefix}.attn_layers.{i}.emb_rel_v"]),
        }
        out[f"norm1_{i}"] = _ln(sd, f"{prefix}.norm_layers_1.{i}")
        out[f"ffn_{i}"] = {"conv": _conv_block(
            sd, f"{prefix}.ffn_layers.{i}.conv")}
        out[f"norm2_{i}"] = _ln(sd, f"{prefix}.norm_layers_2.{i}")
    return out


def _conv_block(sd, prefix):
    # bare torch Conv1d (not ConvNorm-wrapped) -> our Conv1d{conv: ...}
    return {"conv": _conv(sd, prefix)}


def _w2p(sd, prefix):
    return {
        "w_qs": _wrapped_linear(sd, prefix + ".w_qs"),
        "w_ks": _wrapped_linear(sd, prefix + ".w_ks"),
        "w_vs": _wrapped_linear(sd, prefix + ".w_vs"),
        "fc": _wrapped_linear(sd, prefix + ".fc"),
    }


def convert_linguistic_encoder(sd, n_layers=4):
    p = "linguistic_encoder"
    out = {
        "src_emb": {"embedding": np.asarray(sd[f"{p}.src_emb.weight"])},
        "q_position_enc": np.asarray(sd[f"{p}.q_position_enc"])[0],
        "kv_position_enc": np.asarray(sd[f"{p}.kv_position_enc"])[0],
        "phoneme_encoder": _relative_fft(sd, f"{p}.phoneme_encoder",
                                         n_layers),
        "word_encoder": _relative_fft(sd, f"{p}.word_encoder", n_layers),
        "duration_predictor": _variance_predictor(
            sd, f"{p}.duration_predictor"),
        "pitch_predictor": _variance_predictor(sd, f"{p}.pitch_predictor"),
        "energy_predictor": _variance_predictor(sd, f"{p}.energy_predictor"),
        "pitch_embedding": {"embedding": np.asarray(
            sd[f"{p}.pitch_embedding.weight"])},
        "energy_embedding": {"embedding": np.asarray(
            sd[f"{p}.energy_embedding.weight"])},
        "w2p_attn": _w2p(sd, f"{p}.w2p_attn"),
    }
    return out


def convert_decoder(sd, n_layers=6):
    out = {}
    for i in range(n_layers):
        p = f"decoder.layer_stack.{i}"
        out[f"layer_{i}"] = {
            "slf_attn": {
                "w_qs": _linear(sd, f"{p}.slf_attn.w_qs"),
                "w_ks": _linear(sd, f"{p}.slf_attn.w_ks"),
                "w_vs": _linear(sd, f"{p}.slf_attn.w_vs"),
                "fc": _linear(sd, f"{p}.slf_attn.fc"),
                "layer_norm": _torch_ln(sd, f"{p}.slf_attn.layer_norm"),
            },
            "pos_ffn": {
                "w_1": _conv_block(sd, f"{p}.pos_ffn.w_1"),
                "w_2": _conv_block(sd, f"{p}.pos_ffn.w_2"),
                "layer_norm": _torch_ln(sd, f"{p}.pos_ffn.layer_norm"),
            },
        }
    return out


def convert_postnet(sd, n_convs=5):
    params, stats = {}, {}
    for i in range(n_convs):
        p = f"postnet.convolutions.{i}"
        params[f"conv_{i}"] = {"conv": _conv(sd, f"{p}.0.conv")}
        params[f"bn_{i}"] = {"scale": np.asarray(sd[f"{p}.1.weight"]),
                             "bias": np.asarray(sd[f"{p}.1.bias"])}
        stats[f"bn_{i}"] = {
            "mean": np.asarray(sd[f"{p}.1.running_mean"]),
            "var": np.asarray(sd[f"{p}.1.running_var"])}
    return params, stats


def convert_denoiser(sd, n_layers=20, multi_speaker=False):
    p = "diffusion.denoise_fn"
    out = {
        "input_projection": {"conv": _conv(
            sd, f"{p}.input_projection.0.conv")},
        "mlp": _step_mlp(sd, f"{p}.mlp"),
        "skip_projection": {"conv": _conv(sd, f"{p}.skip_projection.conv")},
        "output_projection": {"conv": _conv(
            sd, f"{p}.output_projection.conv")},
    }
    for i in range(n_layers):
        rp = f"{p}.residual_layers.{i}"
        block = {
            "conv_layer": {"conv": _conv(sd, f"{rp}.conv_layer.conv")},
            "diffusion_projection": _wrapped_linear(
                sd, f"{rp}.diffusion_projection"),
            "conditioner_projection": {"conv": _conv(
                sd, f"{rp}.conditioner_projection.conv")},
            "output_projection": {"conv": _conv(
                sd, f"{rp}.output_projection.conv")},
        }
        if multi_speaker and f"{rp}.speaker_projection.linear.weight" in sd:
            block["speaker_projection"] = _wrapped_linear(
                sd, f"{rp}.speaker_projection")
        out[f"res_{i}"] = block
    return out


def convert_generator(sd, mode, encoder_layers=4, decoder_layers=6,
                      denoiser_layers=20, multi_speaker=False):
    """Full MixGANTTS G state_dict -> (params, batch_stats)."""
    params = {
        "linguistic_encoder": convert_linguistic_encoder(sd, encoder_layers),
        "denoiser": convert_denoiser(sd, denoiser_layers, multi_speaker),
    }
    batch_stats = {}
    if mode in ("aux", "shallow"):
        params["decoder"] = convert_decoder(sd, decoder_layers)
        params["mel_linear"] = _linear(sd, "mel_linear")
        postnet_params, postnet_stats = convert_postnet(sd)
        params["postnet"] = postnet_params
        batch_stats["postnet"] = postnet_stats
    if multi_speaker:
        if "speaker_emb.weight" in sd and sd["speaker_emb.weight"].ndim == 2 \
                and "speaker_emb.bias" not in sd:
            params["speaker_emb"] = {"embedding": np.asarray(
                sd["speaker_emb.weight"])}
        elif "speaker_emb.weight" in sd:
            params["speaker_proj"] = _linear(sd, "speaker_emb")
    return params, batch_stats


def convert_discriminator(sd, n_layer=3, n_uncond=2, n_cond=2,
                          multi_speaker=False):
    out = {
        "input_projection": _wrapped_linear(sd, "input_projection"),
        "mlp": _step_mlp(sd, "mlp"),
    }
    for i in range(n_layer):
        out[f"conv_{i}"] = {"conv": _conv(sd, f"conv_block.{i}.conv")}
    for j in range(n_cond):
        out[f"cond_conv_{n_layer + j}"] = {"conv": _conv(
            sd, f"cond_conv_block.{j}.conv")}
    for j in range(n_uncond):
        out[f"uncond_conv_{n_layer + j}"] = {"conv": _conv(
            sd, f"uncond_conv_block.{j}.conv")}
    if multi_speaker and "spk_mlp.0.linear.weight" in sd:
        out["spk_mlp"] = _wrapped_linear(sd, "spk_mlp.0")
    return out


def load_reference_checkpoint(path):
    """Read a reference `.pth.tar` -> dict of numpy arrays per key."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out = {}
    for part in ("G", "D"):
        if part in ckpt:
            out[part] = {k: v.numpy() for k, v in ckpt[part].items()}
    return out


def convert_reference_checkpoint_cli():
    """`python -m mixgantts_tpu.convert --dataset D --model M
    --ckpt 600000.pth.tar [--step N]` — migrate a trained reference
    checkpoint (`train.py:251-267` format) into this framework's orbax
    layout so `synthesize.py --restore_step N` / `train.py --restore_step N`
    pick it up directly.  Optimizer/scheduler states are NOT carried over
    (torch Adam moments don't map onto optax MultiSteps/Noam state); resume
    behaves like the reference's aux->shallow handoff: weights restored,
    optimizers fresh."""
    import argparse
    import os
    import re

    import jax
    import numpy as np

    # checkpoint conversion is host-side (param trees -> numpy); CPU is
    # the right backend, avoids holding the single TPU tunnel, and works
    # even when the pinned TPU plugin cannot register in this process.
    # Best-effort: xla_bridge caches backends on first use, so the pin
    # (and its restore on exit) only takes effect if no backend has been
    # initialized yet in this process — in-process test callers rely on
    # conftest's "cpu,axon" ordering already preferring CPU
    prev_platforms = jax.config.jax_platforms
    jax.config.update("jax_platforms", "cpu")
    try:
        _convert_reference_checkpoint(argparse, os, re, jax, np)
    finally:
        jax.config.update("jax_platforms", prev_platforms)


def _convert_reference_checkpoint(argparse, os, re, jax, np):
    from .checkpoint import save_checkpoint
    from .cli.common import (build_discriminator, build_model, load_configs)
    from .train import create_train_state

    parser = argparse.ArgumentParser(description=convert_reference_checkpoint_cli.__doc__)
    parser.add_argument("--ckpt", type=str, required=True,
                        help="reference .pth.tar checkpoint")
    parser.add_argument("--model", type=str, required=True,
                        choices=["naive", "aux", "shallow"])
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--step", type=int, default=None,
                        help="step to file the converted ckpt under "
                             "(default: parsed from the filename)")
    parser.add_argument("--path_tag", type=str, default="")
    parser.add_argument("--restore_step", type=int, default=10**9)  # routing
    args = parser.parse_args()
    if args.step is None:
        m = re.search(r"(\d+)", os.path.basename(args.ckpt))
        args.step = int(m.group(1)) if m else 0

    configs = load_configs(args)
    preprocess_config, model_config, train_config = configs
    model, _ = build_model(args.model, preprocess_config, model_config)
    disc = build_discriminator(preprocess_config, model_config)

    # template state from a tiny synthetic batch
    r = np.random.RandomState(0)
    B, P, W, T = 2, 16, 8, 32
    wb = r.randint(1, 3, (B, W)).astype(np.int32)
    src_lens = wb.sum(-1).astype(np.int32)
    texts = np.zeros((B, P), np.int64)
    for b in range(B):
        texts[b, :src_lens[b]] = r.randint(1, 300, src_lens[b])
    init_batch = dict(
        speakers=np.zeros((B,), np.int32), texts=texts, src_lens=src_lens,
        word_boundaries=wb, src_w_lens=np.full((B,), W, np.int32),
        mels=r.randn(B, T, model.n_mels).astype(np.float32),
        mel_lens=np.full((B,), T, np.int32), max_mel_len=T)
    if (model_config["multi_speaker"]
            and preprocess_config["preprocessing"].get(
                "speaker_embedder", "none") != "none"):
        # external-embedder models take spker_embeds instead of indexing
        # the learned table; init only traces shapes, zeros suffice
        init_batch["spker_embeds"] = np.zeros(
            (B, model_config.get("external_speaker_dim", 512)), np.float32)
    state = create_train_state(jax.random.PRNGKey(0), model, disc,
                               init_batch, train_config, model_config,
                               restore_step=args.step)

    sd = load_reference_checkpoint(args.ckpt)
    t = model_config["transformer"]
    g_params, g_stats = convert_generator(
        sd["G"], args.model,
        encoder_layers=t["encoder_layer"],
        decoder_layers=t["decoder_layer"],
        denoiser_layers=model_config["denoiser"]["residual_layers"],
        multi_speaker=model_config["multi_speaker"])
    state = state.replace(g_params=g_params, g_batch_stats=g_stats)
    if "D" in sd:
        d = model_config["discriminator"]
        state = state.replace(d_params=convert_discriminator(
            sd["D"], n_layer=d["n_layer"], n_uncond=d["n_uncond_layer"],
            n_cond=d["n_cond_layer"],
            multi_speaker=model_config["multi_speaker"]))

    path = save_checkpoint(train_config["path"]["ckpt_path"], state)
    print(f"converted {args.ckpt} (step {args.step}) -> {path}")


if __name__ == "__main__":
    convert_reference_checkpoint_cli()
