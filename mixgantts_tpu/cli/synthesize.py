"""Synthesis CLI: single-sentence, batch, and teacher-forced modes with
pitch/energy/duration control knobs.

Parity target: `synthesize.py:106-297` in the reference, including the
energy-control quirk: the reference's `--energy_control` flag exists but its
value never reaches the encoder (p_control drives both pitch and energy,
`model/linguistic_encoder.py:268-271`); the flag is preserved and its value
is forwarded to `e_control`, which the TPU model likewise accepts but — for
behavior parity — does not apply.
"""

import argparse
import json
import os

import jax
import numpy as np

from ..checkpoint import restore_generator_params
from ..data.dataset import AcousticDataset, TextOnlyDataset
from ..frontend import preprocess_english, preprocess_mandarin
from ..models.vocoder import get_vocoder
from ..pipeline import TTSPipeline
from ..train import create_train_state
from ..utils.synth import synth_samples, write_results
from ..utils.tools import bucket_length, pad_1d
from .common import (
    build_discriminator, build_model, load_configs, model_batch_of,
)


def synthesize(model, variables, args, configs, vocoder, batches,
               control_values):
    preprocess_config, model_config, train_config = configs
    pitch_control, energy_control, duration_control = control_values
    result_path = train_config["path"]["result_path"]

    if not args.teacher_forced:
        # single / batch-from-text: the serving pipeline compiles the whole
        # text->waveform path into one bucketed XLA program per shape
        mesh = None
        if getattr(args, "data_parallel", False):
            from ..parallel import make_mesh
            mesh = make_mesh(jax.devices(), model_axis=1)
        pipeline = TTSPipeline(model, variables, vocoder, preprocess_config,
                               model_config, mesh=mesh)
        # double-buffered: batch N's device->host fetch + file writes
        # overlap batch N+1's device compute (pipeline.stream submits
        # ahead).  rng per batch is PRNGKey(i) via the call counter —
        # bit-identical to the sequential loop this replaces.
        batches = list(batches)
        results = pipeline.stream(
            batches, p_control=pitch_control, e_control=energy_control,
            d_control=duration_control, return_mel=True)
        for batch, (wavs, mels, mel_lens) in zip(batches, results):
            write_results(args, batch["ids"], mels, mel_lens, wavs,
                          model_config, preprocess_config, result_path)
        return

    # teacher-forced: duration/pitch/energy targets drive the model.
    # One jitted program per bucket shape (retraced automatically): an
    # eager model.apply would dispatch op-by-op through the host<->TPU
    # tunnel at ~15-30 ms per blocking call.
    import functools

    @functools.partial(jax.jit, static_argnames=("max_mel_len",))
    def tf_forward(kwargs, max_mel_len, p_c, e_c, d_c, rng):
        return model.apply(
            variables, **kwargs, max_mel_len=max_mel_len, train=False,
            p_control=p_c, e_control=e_c, d_control=d_c,
            rngs={"diffusion": rng})

    for i, batch in enumerate(batches):
        kwargs = model_batch_of(batch)
        kwargs.pop("mels", None)
        kwargs.pop("mel_lens", None)
        out = tf_forward(kwargs, batch["mels"].shape[1],
                         np.float32(pitch_control),
                         np.float32(energy_control),
                         np.float32(duration_control),
                         jax.random.PRNGKey(i))
        synth_samples(args, batch, out, vocoder, model_config,
                      preprocess_config, result_path, model.schedule)


def build_single_batch(args, preprocess_config, model_config):
    ids = raw_texts = [args.text[:100]]
    load_spker_embed = (
        model_config["multi_speaker"]
        and preprocess_config["preprocessing"].get(
            "speaker_embedder", "none") != "none")
    if model_config["multi_speaker"]:
        with open(os.path.join(
                preprocess_config["path"]["preprocessed_path"],
                "speakers.json")) as f:
            speaker_map = json.load(f)
        speakers = np.array([speaker_map[str(args.speaker_id)]])
    else:
        speakers = np.array([0])
    spker_embeds = None
    if load_spker_embed:
        spker_embeds = np.load(os.path.join(
            preprocess_config["path"]["preprocessed_path"], "spker_embed",
            f"{args.speaker_id}-spker_embed.npy")).reshape(1, -1)

    lang = preprocess_config["preprocessing"]["text"]["language"]
    fn = preprocess_english if lang == "en" else preprocess_mandarin
    texts, word_boundaries = fn(args.text, preprocess_config)

    batch = {
        "ids": ids,
        "raw_texts": raw_texts,
        "speakers": speakers,
        "texts": texts[None].astype(np.int64),
        "src_lens": np.array([len(texts)]),
        "word_boundaries": word_boundaries[None].astype(np.int64),
        "src_w_lens": np.array([len(word_boundaries)]),
    }
    if spker_embeds is not None:
        batch["spker_embeds"] = spker_embeds.astype(np.float32)
    return batch


def build_argparser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--restore_step", type=int, required=True)
    parser.add_argument("--path_tag", type=str, default="")
    parser.add_argument("--model", type=str,
                        choices=["naive", "aux", "shallow"], required=True)
    parser.add_argument("--teacher_forced", action="store_true")
    parser.add_argument("--mode", type=str, choices=["batch", "single"],
                        required=True)
    parser.add_argument("--source", type=str, default=None)
    parser.add_argument("--text", type=str, default=None)
    parser.add_argument("--speaker_id", type=int, default=42)
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--pitch_control", type=float, default=1.0)
    parser.add_argument("--energy_control", type=float, default=1.0)
    parser.add_argument("--duration_control", type=float, default=1.0)
    parser.add_argument(
        "--data_parallel", action="store_true",
        help="shard batched synthesis over all devices ('data' mesh axis; "
             "batches pad up to a device multiple and trim on return)")
    return parser


def cli():
    args = build_argparser().parse_args()
    if args.mode == "batch":
        assert args.text is None
        if args.teacher_forced:
            assert args.source is None
        else:
            assert args.source is not None
    if args.mode == "single":
        assert args.source is None and args.text is not None \
            and not args.teacher_forced

    configs = load_configs(args)
    preprocess_config, model_config, train_config = configs
    os.makedirs(os.path.join(train_config["path"]["result_path"],
                             str(args.restore_step)), exist_ok=True)

    model, _ = build_model(args.model, preprocess_config, model_config)
    disc = build_discriminator(preprocess_config, model_config)
    vocoder = get_vocoder(
        model_config,
        num_mels=preprocess_config["preprocessing"]["mel"]["n_mel_channels"])

    if args.mode == "batch":
        if args.teacher_forced:
            dataset = AcousticDataset(
                "val.txt", args.model, preprocess_config, model_config,
                train_config, sort=False, drop_last=False)
            batches = [b for b in dataset.batches(group_size=1, shuffle=False,
                                                  epochs=1) if b is not None]
        else:
            dataset = TextOnlyDataset(args.source, preprocess_config,
                                      model_config)
            batches = list(dataset.batches(batch_size=8))
    else:
        batches = [build_single_batch(args, preprocess_config, model_config)]

    # initialize + restore G
    example = dict(batches[0])
    init_kwargs = model_batch_of(example)
    init_kwargs.pop("mels", None)
    init_kwargs.pop("mel_lens", None)
    init_kwargs.pop("attn_priors", None)
    init_kwargs.pop("p_targets", None)
    init_kwargs.pop("e_targets", None)
    init_kwargs.pop("d_targets", None)
    init_kwargs["max_mel_len"] = 64
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1),
         "diffusion": jax.random.PRNGKey(2)},
        **init_kwargs, train=False)
    params, batch_stats = variables["params"], variables.get(
        "batch_stats", {})
    if args.restore_step:
        state = create_train_state(
            jax.random.PRNGKey(0), model, disc,
            {**init_kwargs}, train_config, model_config)
        params, batch_stats = restore_generator_params(
            train_config["path"]["ckpt_path"], args.restore_step, state)
    variables = {"params": params, "batch_stats": batch_stats}

    control_values = (args.pitch_control, args.energy_control,
                      args.duration_control)
    synthesize(model, variables, args, configs, vocoder, batches,
               control_values)


if __name__ == "__main__":
    cli()
