"""Reverse checkpoint conversion: flax parameter trees -> PyTorch
MixGAN-TTS state_dicts (`train.py:251-267` checkpoint format).

The exact mirror of `convert.py`: every name/layout rule there is
inverted here, so `export_generator(convert_generator(sd)) == sd`
tensor-for-tensor (pinned in tests/test_reference_parity.py against the
actually-imported reference modules) — with one scoped exception:
BatchNorm's `num_batches_tracked` step counter has no flax-side slot and
is re-emitted as 0 (the reference never reads it — fixed momentum=0.1 —
but a checkpoint exported from a converted-then-trained reference model
will differ in that one integer).  This closes the interop loop —
models trained on TPU with this framework can be loaded by the
reference's `synthesize.py` / torch serving infrastructure.

Layout rules (inverse of convert.py's):
- flax conv kernel [k, in, out] -> torch Conv1d .weight [out, in, k]
- flax linear kernel [in, out]  -> torch Linear .weight [out, in]
- LayerNorm / Embedding         -> carried as-is
- `batch_stats` collection      -> BatchNorm running stats
Optimizer/scheduler states are NOT exported (optax MultiSteps/Noam
state does not map onto torch Adam moments), so the 3-key export is
always loadable by the reference's `synthesize.py` (train=False path),
but by a reference `train.py` resume ONLY when `--restore_step` equals
`total_step_aux` — at any other step the reference unconditionally
reads ckpt["optG_fs2"]/["optG"]/["optD"]/["sdlG"]/["sdlD"]
(`utils/model.py:41-46`) and a 3-key checkpoint raises KeyError.
"""

import numpy as np


def _arr(a):
    return np.asarray(a, dtype=np.float32) if hasattr(a, "dtype") and \
        a.dtype != np.float32 else np.asarray(a)


def _inv_conv(p, prefix, out):
    out[prefix + ".weight"] = np.transpose(_arr(p["kernel"]), (2, 1, 0))
    if "bias" in p:
        out[prefix + ".bias"] = _arr(p["bias"])


def _inv_linear(p, prefix, out):
    out[prefix + ".weight"] = _arr(p["kernel"]).T
    if "bias" in p:
        out[prefix + ".bias"] = _arr(p["bias"])


def _inv_wrapped_conv(p, prefix, out):
    _inv_conv(p["conv"], prefix + ".conv", out)


def _inv_wrapped_linear(p, prefix, out):
    _inv_linear(p["linear"], prefix + ".linear", out)


def _inv_ln(p, prefix, out):
    out[prefix + ".gamma"] = _arr(p["gamma"])
    out[prefix + ".beta"] = _arr(p["beta"])


def _inv_torch_ln(p, prefix, out):
    out[prefix + ".weight"] = _arr(p["scale"])
    out[prefix + ".bias"] = _arr(p["bias"])


def _inv_step_mlp(p, prefix, out):
    _inv_wrapped_linear(p["fc1"], prefix + ".0", out)
    _inv_wrapped_linear(p["fc2"], prefix + ".2", out)


def _inv_variance_predictor(p, prefix, out):
    _inv_wrapped_conv(p["conv_0"], prefix + ".conv_layer.conv1d_1", out)
    _inv_torch_ln(p["ln_0"], prefix + ".conv_layer.layer_norm_1", out)
    _inv_wrapped_conv(p["conv_1"], prefix + ".conv_layer.conv1d_2", out)
    _inv_torch_ln(p["ln_1"], prefix + ".conv_layer.layer_norm_2", out)
    _inv_linear(p["proj"], prefix + ".linear_layer", out)


def _n_layers(p, key_fmt):
    n = 0
    while key_fmt.format(n) in p:
        n += 1
    return n


def _inv_relative_fft(p, prefix, out):
    for i in range(_n_layers(p, "attn_{}")):
        a = p[f"attn_{i}"]
        for name in ("conv_q", "conv_k", "conv_v", "conv_o"):
            _inv_conv(a[name]["conv"],
                      f"{prefix}.attn_layers.{i}.{name}", out)
        out[f"{prefix}.attn_layers.{i}.emb_rel_k"] = _arr(a["emb_rel_k"])
        out[f"{prefix}.attn_layers.{i}.emb_rel_v"] = _arr(a["emb_rel_v"])
        _inv_ln(p[f"norm1_{i}"], f"{prefix}.norm_layers_1.{i}", out)
        _inv_conv(p[f"ffn_{i}"]["conv"]["conv"],
                  f"{prefix}.ffn_layers.{i}.conv", out)
        _inv_ln(p[f"norm2_{i}"], f"{prefix}.norm_layers_2.{i}", out)


def export_linguistic_encoder(p, out):
    pre = "linguistic_encoder"
    out[f"{pre}.src_emb.weight"] = _arr(p["src_emb"]["embedding"])
    # the reference stores position tables [1, len, d] (convert.py took [0])
    out[f"{pre}.q_position_enc"] = _arr(p["q_position_enc"])[None]
    out[f"{pre}.kv_position_enc"] = _arr(p["kv_position_enc"])[None]
    _inv_relative_fft(p["phoneme_encoder"], f"{pre}.phoneme_encoder", out)
    _inv_relative_fft(p["word_encoder"], f"{pre}.word_encoder", out)
    for name in ("duration_predictor", "pitch_predictor",
                 "energy_predictor"):
        _inv_variance_predictor(p[name], f"{pre}.{name}", out)
    out[f"{pre}.pitch_embedding.weight"] = _arr(
        p["pitch_embedding"]["embedding"])
    out[f"{pre}.energy_embedding.weight"] = _arr(
        p["energy_embedding"]["embedding"])
    for name in ("w_qs", "w_ks", "w_vs", "fc"):
        _inv_wrapped_linear(p["w2p_attn"][name],
                            f"{pre}.w2p_attn.{name}", out)


def export_decoder(p, out):
    for i in range(_n_layers(p, "layer_{}")):
        lp = p[f"layer_{i}"]
        pre = f"decoder.layer_stack.{i}"
        for name in ("w_qs", "w_ks", "w_vs", "fc"):
            _inv_linear(lp["slf_attn"][name], f"{pre}.slf_attn.{name}", out)
        _inv_torch_ln(lp["slf_attn"]["layer_norm"],
                      f"{pre}.slf_attn.layer_norm", out)
        _inv_conv(lp["pos_ffn"]["w_1"]["conv"], f"{pre}.pos_ffn.w_1", out)
        _inv_conv(lp["pos_ffn"]["w_2"]["conv"], f"{pre}.pos_ffn.w_2", out)
        _inv_torch_ln(lp["pos_ffn"]["layer_norm"],
                      f"{pre}.pos_ffn.layer_norm", out)


def export_postnet(p, stats, out):
    for i in range(_n_layers(p, "conv_{}")):
        pre = f"postnet.convolutions.{i}"
        _inv_conv(p[f"conv_{i}"]["conv"], f"{pre}.0.conv", out)
        out[f"{pre}.1.weight"] = _arr(p[f"bn_{i}"]["scale"])
        out[f"{pre}.1.bias"] = _arr(p[f"bn_{i}"]["bias"])
        out[f"{pre}.1.running_mean"] = _arr(stats[f"bn_{i}"]["mean"])
        out[f"{pre}.1.running_var"] = _arr(stats[f"bn_{i}"]["var"])
        # torch BatchNorm1d also tracks num_batches; the reference never
        # reads it (fixed momentum=0.1) but load_state_dict(strict=True)
        # wants the key.  convert.py drops it (no flax-side slot), so it
        # is re-emitted as 0 — the one tensor the round trip does not
        # carry (see module docstring)
        out[f"{pre}.1.num_batches_tracked"] = np.asarray(0, np.int64)


def export_denoiser(p, out):
    pre = "diffusion.denoise_fn"
    _inv_conv(p["input_projection"]["conv"],
              f"{pre}.input_projection.0.conv", out)
    _inv_step_mlp(p["mlp"], f"{pre}.mlp", out)
    _inv_conv(p["skip_projection"]["conv"],
              f"{pre}.skip_projection.conv", out)
    _inv_conv(p["output_projection"]["conv"],
              f"{pre}.output_projection.conv", out)
    for i in range(_n_layers(p, "res_{}")):
        rp = p[f"res_{i}"]
        rpre = f"{pre}.residual_layers.{i}"
        _inv_conv(rp["conv_layer"]["conv"], f"{rpre}.conv_layer.conv", out)
        _inv_wrapped_linear(rp["diffusion_projection"],
                            f"{rpre}.diffusion_projection", out)
        _inv_conv(rp["conditioner_projection"]["conv"],
                  f"{rpre}.conditioner_projection.conv", out)
        _inv_conv(rp["output_projection"]["conv"],
                  f"{rpre}.output_projection.conv", out)
        if "speaker_projection" in rp:
            _inv_wrapped_linear(rp["speaker_projection"],
                                f"{rpre}.speaker_projection", out)


def export_diffusion_buffers(betas, spec_min, spec_max, out):
    """The reference's GaussianDiffusion registers its derived schedule
    tables and the mel normalization range as buffers
    (`model/diffusion.py:63-90`), so they appear in `state_dict()` and a
    strict `load_state_dict` requires them.  All are derived from the
    beta schedule + stats.json with the reference's own numpy formulas,
    reproduced here so the exported values match a freshly-initialized
    reference model bit-for-bit."""
    betas = np.asarray(betas, dtype=np.float64)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    posterior_variance = (betas * (1.0 - alphas_cumprod_prev)
                          / (1.0 - alphas_cumprod))
    f32 = lambda a: np.asarray(a, dtype=np.float32)
    p = "diffusion."
    out[p + "betas"] = f32(betas)
    out[p + "alphas_cumprod"] = f32(alphas_cumprod)
    out[p + "alphas_cumprod_prev"] = f32(alphas_cumprod_prev)
    out[p + "sqrt_alphas_cumprod"] = f32(np.sqrt(alphas_cumprod))
    out[p + "sqrt_one_minus_alphas_cumprod"] = f32(
        np.sqrt(1.0 - alphas_cumprod))
    out[p + "log_one_minus_alphas_cumprod"] = f32(
        np.log(1.0 - alphas_cumprod))
    out[p + "sqrt_recip_alphas_cumprod"] = f32(
        np.sqrt(1.0 / alphas_cumprod))
    out[p + "sqrt_recipm1_alphas_cumprod"] = f32(
        np.sqrt(1.0 / alphas_cumprod - 1.0))
    out[p + "posterior_variance"] = f32(posterior_variance)
    out[p + "posterior_log_variance_clipped"] = f32(
        np.log(np.maximum(posterior_variance, 1e-20)))
    out[p + "posterior_mean_coef1"] = f32(
        betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod))
    out[p + "posterior_mean_coef2"] = f32(
        (1.0 - alphas_cumprod_prev) * np.sqrt(alphas)
        / (1.0 - alphas_cumprod))
    out[p + "spec_min"] = f32(spec_min).reshape(1, 1, -1)
    out[p + "spec_max"] = f32(spec_max).reshape(1, 1, -1)


def _sinusoid_table(n_position, d_hid):
    """The reference's `get_sinusoid_encoding_table`
    (`transformer/Models.py:10-28` / `model/linguistic_encoder.py:19`) —
    the model's own parity-pinned table, so the exported buffer can
    never drift from what the flax modules embed."""
    from .models.blocks import sinusoid_position_table
    return sinusoid_position_table(n_position, d_hid)


def export_static_buffers(model_config, stats, out, with_decoder):
    """The reference registers config/stats-derived non-trainable
    parameters that a strict `load_state_dict` requires: sinusoid
    position tables (`linguistic_encoder.py:71-74`, `Models.py:58-62`)
    and the variance quantization bin edges (`linguistic_encoder.py:
    125-155`)."""
    t = model_config["transformer"]
    ve = model_config["variance_embedding"]
    n_pos = model_config["max_seq_len"] + 1
    out["linguistic_encoder.abs_position_enc"] = _sinusoid_table(
        n_pos, t["encoder_hidden"])[None]
    if with_decoder:
        out["decoder.position_enc"] = _sinusoid_table(
            n_pos, t["decoder_hidden"])[None]

    def bins(lo, hi, mode):
        if mode == "log":
            return np.exp(np.linspace(np.log(lo), np.log(hi),
                                      ve["n_bins"] - 1,
                                      dtype=np.float32))
        return np.linspace(lo, hi, ve["n_bins"] - 1, dtype=np.float32)

    out["linguistic_encoder.pitch_bins"] = bins(
        stats.pitch_min, stats.pitch_max, ve["pitch_quantization"])
    out["linguistic_encoder.energy_bins"] = bins(
        stats.energy_min, stats.energy_max, ve["energy_quantization"])


def export_generator(params, batch_stats, betas=None, spec_min=None,
                     spec_max=None, model_config=None, stats=None):
    """Flax (params, batch_stats) -> reference G state_dict (flat numpy).

    The mode is inferred from the tree: decoder/mel_linear/postnet are
    present only for aux/shallow (convert.py:192-197).  Pass the beta
    schedule + spec range + model_config/stats to also emit the
    reference's registered derived buffers (schedule tables, sinusoid
    position tables, variance bins) — required for a strict
    `load_state_dict`."""
    out = {}
    export_linguistic_encoder(params["linguistic_encoder"], out)
    export_denoiser(params["denoiser"], out)
    if "decoder" in params:
        export_decoder(params["decoder"], out)
        _inv_linear(params["mel_linear"], "mel_linear", out)
        export_postnet(params["postnet"], batch_stats["postnet"], out)
    if "speaker_emb" in params:
        out["speaker_emb.weight"] = _arr(
            params["speaker_emb"]["embedding"])
    elif "speaker_proj" in params:
        _inv_linear(params["speaker_proj"], "speaker_emb", out)
    if betas is not None:
        export_diffusion_buffers(betas, spec_min, spec_max, out)
    if model_config is not None:
        export_static_buffers(model_config, stats, out,
                              with_decoder="decoder" in params)
    return out


def export_discriminator(params):
    """Flax JCU discriminator params -> reference D state_dict."""
    out = {}
    _inv_wrapped_linear(params["input_projection"], "input_projection", out)
    _inv_step_mlp(params["mlp"], "mlp", out)
    n_layer = _n_layers(params, "conv_{}")
    for i in range(n_layer):
        _inv_conv(params[f"conv_{i}"]["conv"], f"conv_block.{i}.conv", out)
    for branch in ("cond", "uncond"):
        for j in range(64):
            key = f"{branch}_conv_{n_layer + j}"
            if key not in params:
                break
            _inv_conv(params[key]["conv"],
                      f"{branch}_conv_block.{j}.conv", out)
    if "spk_mlp" in params:
        _inv_wrapped_linear(params["spk_mlp"], "spk_mlp.0", out)
    return out


def export_checkpoint_cli():
    """`python -m mixgantts_tpu.export --dataset D --model M
    --restore_step N --out ckpt.pth.tar` — export a checkpoint trained
    with this framework into the reference's `.pth.tar` format
    (`train.py:251-267`: dict with "G", "D", "epoch"; torch tensors), so
    the reference's `synthesize.py --restore_step`/torch tooling can
    load it.  Optimizer states are not portable (see module docstring)."""
    import argparse

    import jax
    import torch

    # checkpoint export is host-side (param trees -> numpy -> torch); CPU
    # is the right backend, avoids holding the single TPU tunnel, and
    # works even when the pinned TPU plugin cannot register in this
    # process.  Best-effort: xla_bridge caches backends on first use, so
    # the pin (and its restore on exit) only takes effect if no backend
    # has been initialized yet in this process — in-process test callers
    # rely on conftest's "cpu,axon" ordering already preferring CPU
    prev_platforms = jax.config.jax_platforms
    jax.config.update("jax_platforms", "cpu")
    try:
        _export_checkpoint(argparse, jax, torch)
    finally:
        jax.config.update("jax_platforms", prev_platforms)


def _export_checkpoint(argparse, jax, torch):

    from .checkpoint import restore_checkpoint
    from .cli.common import (build_discriminator, build_model, load_configs)
    from .train import create_train_state

    parser = argparse.ArgumentParser(description=export_checkpoint_cli.__doc__)
    parser.add_argument("--restore_step", type=int, required=True)
    parser.add_argument("--model", type=str, required=True,
                        choices=["naive", "aux", "shallow"])
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--out", type=str, required=True,
                        help="output .pth.tar path")
    parser.add_argument("--path_tag", type=str, default="")
    args = parser.parse_args()

    preprocess_config, model_config, train_config = load_configs(args)
    model, stats = build_model(args.model, preprocess_config, model_config)
    disc = build_discriminator(preprocess_config, model_config)
    keep_bins = model_config["denoiser"]["keep_bins"]

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
                               restore_step=args.restore_step)
    state = restore_checkpoint(train_config["path"]["ckpt_path"], state,
                               args.restore_step)

    g_params = jax.device_get(state.g_params)
    g_stats = jax.device_get(state.g_batch_stats)
    g_sd = export_generator(
        g_params, g_stats, betas=model.schedule.betas,
        spec_min=np.asarray(stats.spec_min[:keep_bins]),
        spec_max=np.asarray(stats.spec_max[:keep_bins]),
        model_config=model_config, stats=stats)
    d_sd = export_discriminator(jax.device_get(state.d_params))
    ckpt = {"epoch": int(state.epoch),
            "G": {k: torch.from_numpy(np.ascontiguousarray(v))
                  for k, v in g_sd.items()},
            "D": {k: torch.from_numpy(np.ascontiguousarray(v))
                  for k, v in d_sd.items()}}
    torch.save(ckpt, args.out)
    print(f"exported step {args.restore_step} ({len(g_sd)} G + "
          f"{len(d_sd)} D tensors) -> {args.out}")


if __name__ == "__main__":
    export_checkpoint_cli()
