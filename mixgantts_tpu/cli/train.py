"""Training CLI/loop.

Parity target: `train.py:22-279` in the reference — grouped sorted batches,
per-mode train step, periodic console/log.txt/TensorBoard logging, sample
synthesis, validation, checkpointing, per-epoch ExponentialLR decay for the
GAN optimizers.  The step itself is one jitted XLA program (optionally
sharded over a device mesh with --data_parallel).
"""

import argparse
import os

import jax
import numpy as np

from ..checkpoint import restore_checkpoint, save_checkpoint
from ..data.dataset import AcousticDataset
from ..data.prefetch import prefetch
from ..models.vocoder import get_vocoder
from ..parallel import (
    make_mesh, partition_specs, replicate_state, shard_batch, shard_state,
    shard_train_step,
)
from ..train import (
    check_finite_metrics, chunk_train_step, create_train_state, debug_nans,
    make_train_step, make_eval_step,
)
from ..train.optim import fs2_lr_schedule
from ..utils.logging import get_writer, log, loss_message
from ..utils.profiling import StepProfiler, ThroughputMeter, start_server
from ..utils.synth import synth_one_sample
from .common import (
    build_discriminator, build_model, load_configs, model_batch_of,
    param_count,
)
from .evaluate import evaluate


def synthesize_sample(mode, model, state, batch, vocoder, model_config,
                      preprocess_config, schedule):
    """Run inference on the first batch item for TensorBoard panels."""
    variables = {"params": state.g_params,
                 "batch_stats": state.g_batch_stats}
    kwargs = model_batch_of(batch)
    kwargs["max_mel_len"] = batch["mels"].shape[1]
    out = model.apply(variables, **kwargs, train=False,
                      rngs={"diffusion": jax.random.PRNGKey(int(state.step))})
    trace = None
    if mode != "aux":
        infer_kwargs = {k: v for k, v in kwargs.items()
                        if k not in ("mels", "mel_lens", "p_targets",
                                     "e_targets", "d_targets",
                                     "attn_priors")}
        trace_out = model.apply(
            variables, **infer_kwargs, train=False, return_trace=True,
            rngs={"diffusion": jax.random.PRNGKey(int(state.step) + 1)})
        trace = trace_out.mel_pred
    return synth_one_sample(mode, batch, out, trace, vocoder, model_config,
                            preprocess_config, schedule)


def main(args, configs):
    preprocess_config, model_config, train_config = configs
    mode = args.model

    model, stats = build_model(mode, preprocess_config, model_config)
    discriminator = build_discriminator(preprocess_config, model_config)

    dataset = AcousticDataset(
        "train.txt", mode, preprocess_config, model_config, train_config,
        sort=True, drop_last=True)
    batch_gen = prefetch(
        dataset.batches(group_size=4, shuffle=True, seed=args.seed))

    # find a representative batch for initialization
    example = next(b for b in batch_gen if b is not None)
    init_batch = model_batch_of(example)
    init_batch["max_mel_len"] = example["mels"].shape[1]

    state = create_train_state(
        jax.random.PRNGKey(args.seed), model, discriminator, init_batch,
        train_config, model_config, restore_step=args.restore_step)
    if args.restore_step:
        reset = (args.restore_step
                 == train_config["step"]["total_step_aux"])
        state = restore_checkpoint(
            train_config["path"]["ckpt_path"], state, args.restore_step,
            reset_optimizers=reset)

    base_step = make_train_step(mode, model, discriminator, model_config,
                                train_config)
    tpu_cfg = model_config.get("tpu", {}) or {}
    # k-step chunked dispatch: ONE host->device call scans k train steps
    # (the per-call dispatch cost scales with the train state's ~2k buffers
    # and otherwise exceeds the device step time; see train/step.py)
    k = max(1, int(getattr(args, "steps_per_call", 0)
                   or tpu_cfg.get("steps_per_call", 1)))
    tp = max(1, getattr(args, "tensor_parallel", 1))
    if (args.data_parallel or tp > 1) and len(jax.devices()) > 1:
        mesh = make_mesh(model_axis=tp)
        specs = partition_specs(state, mesh) if tp > 1 else None
        step_fn = shard_train_step(base_step, mesh, state_specs=specs)
        chunk_fn = (shard_train_step(chunk_train_step(base_step), mesh,
                                     state_specs=specs, batch_stacked=True)
                    if k > 1 else None)
        state = (shard_state(mesh, state, specs) if tp > 1
                 else replicate_state(mesh, state))
        put = lambda b: shard_batch(mesh, b)
        put_stacked = lambda b: shard_batch(mesh, b, stacked=True)
    else:
        # donate the train state: params/optimizer buffers update in place
        # instead of allocating a second copy every step
        step_fn = jax.jit(base_step, donate_argnums=(0,))
        chunk_fn = (jax.jit(chunk_train_step(base_step), donate_argnums=(0,))
                    if k > 1 else None)
        put = put_stacked = lambda b: b
    eval_fn = jax.jit(make_eval_step(mode, model, discriminator,
                                     model_config, train_config))

    vocoder = None
    try:
        vocoder = get_vocoder(
            model_config,
            num_mels=preprocess_config["preprocessing"]["mel"][
                "n_mel_channels"])
    except Exception as e:  # vocoder is only needed for logging panels
        print(f"vocoder unavailable ({e}); logging without audio")

    for p in train_config["path"].values():
        os.makedirs(p, exist_ok=True)
    train_log_path = os.path.join(train_config["path"]["log_path"], "train")
    val_log_path = os.path.join(train_config["path"]["log_path"], "val")
    os.makedirs(train_log_path, exist_ok=True)
    os.makedirs(val_log_path, exist_ok=True)
    train_logger = get_writer(train_log_path)
    val_logger = get_writer(val_log_path)

    print("Number of MixGAN-TTS Parameters     :",
          param_count(state.g_params))
    print("          JCUDiscriminator Parameters:",
          param_count(state.d_params))

    cfg_step = train_config["step"]
    total_step = cfg_step[f"total_step_{mode}"]
    gamma = train_config["optimizer"]["gamma"]
    fs2_sched = fs2_lr_schedule(
        model_config["transformer"]["encoder_hidden"],
        train_config["optimizer_fs2"]["warm_up_step"],
        train_config["optimizer_fs2"]["anneal_steps"],
        train_config["optimizer_fs2"]["anneal_rate"])
    sr = preprocess_config["preprocessing"]["audio"]["sampling_rate"]

    profile_port = getattr(args, "profile_port", 0)
    if profile_port:
        start_server(profile_port)
        print(f"profiler server listening on :{profile_port}")
    # capture steady-state steps; clamp the window into short runs
    profile_start = min(args.restore_step + 10,
                        max(args.restore_step + 1, total_step - 4))
    profiler = StepProfiler(getattr(args, "profile_dir", None),
                            profile_start)
    meter = ThroughputMeter()

    step = args.restore_step + 1  # next step to run
    strict = bool(tpu_cfg.get("strict_batch_order", False))
    periods = [cfg_step["log_step"], cfg_step["synth_step"],
               cfg_step["val_step"], cfg_step["save_step"]]

    def _run_segment(batch_list):
        nonlocal state, step
        m = len(batch_list)
        first = step
        profiler.step(first)
        if m == k and k > 1:
            stacked = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs),
                *[model_batch_of(b) for b in batch_list])
            state, ms = chunk_fn(state, put_stacked(stacked))
            metric_at = lambda j: jax.tree_util.tree_map(
                lambda x: x[j], ms)
        else:
            ms_list = []
            for b in batch_list:
                state, m1 = step_fn(state, put(model_batch_of(b)))
                ms_list.append(m1)
            metric_at = ms_list.__getitem__

        for j in range(m):
            s = first + j
            meter.update(batch_list[j]["mel_lens"])

            if s % cfg_step["log_step"] == 0:
                metrics = jax.device_get(metric_at(j))
                check_finite_metrics(metrics, s)  # fail loudly on NaN/Inf
                msg = loss_message(s, total_step, metrics)
                it_s, frames_s = meter.read_and_reset()
                print(f"{msg}  ({it_s:.2f} it/s, "
                      f"{frames_s:.0f} mel-frames/s)")
                with open(os.path.join(train_log_path, "log.txt"),
                          "a") as f:
                    f.write(f"Step {s}/{total_step}, "
                            + msg.split(", ", 1)[1] + "\n")
                lr = (float(state.lr_g) if mode != "aux"
                      else float(fs2_sched(s)))
                log(train_logger, s, losses=metrics, lr=lr)
                train_logger.add_scalar("Training/mel_frames_per_sec",
                                        frames_s, s)

            if s % cfg_step["synth_step"] == 0 and vocoder is not None:
                figs, attn_fig, wav_rec, wav_pred, tag = synthesize_sample(
                    mode, model, jax.device_get(state), batch_list[j],
                    vocoder, model_config, preprocess_config,
                    model.schedule)
                log(train_logger, s, figs=figs, tag="Training")
                log(train_logger, figs=attn_fig,
                    tag=f"Training_attn/step_{s}_{tag}")
                log(train_logger, s, audio=wav_rec, sampling_rate=sr,
                    tag="Training/reconstructed")
                log(train_logger, s, audio=wav_pred, sampling_rate=sr,
                    tag="Training/synthesized")

            if s % cfg_step["val_step"] == 0:
                message = evaluate(
                    mode, model, discriminator, jax.device_get(state),
                    configs, val_logger, vocoder, eval_fn)
                with open(os.path.join(val_log_path, "log.txt"), "a") as f:
                    f.write(message + "\n")
                print(message)

            if s % cfg_step["save_step"] == 0:
                path = save_checkpoint(train_config["path"]["ckpt_path"],
                                       jax.device_get(state))
                print(f"saved checkpoint: {path}")

            if s >= total_step:
                profiler.close()
                return True
        step = first + m
        return False

    for event, payload in schedule_segments(
            batch_gen, k, step, total_step, periods, strict=strict):
        if event == "epoch":  # boundary: per-epoch ExponentialLR decay
            if mode != "aux":
                state = state.replace(
                    epoch=state.epoch + 1,
                    lr_g=state.lr_g * gamma,
                    lr_d=state.lr_d * gamma)
            else:
                # aux lr is step-scheduled (Noam), but checkpoints still
                # carry the true epoch like the reference's (train.py:267)
                state = state.replace(epoch=state.epoch + 1)
        elif _run_segment(payload):
            return


def shape_key(batch):
    """The FULL tuple of device-batch leaf shapes (not just mel/text
    lengths): word_boundaries pads to its own phone bucket, so two batches
    can share (mel_len, text_len) but differ on the word axis — np.stack
    would raise on a mixed chunk."""
    return tuple(sorted(
        (name, np.shape(v)) for name, v in model_batch_of(batch).items()))


def schedule_segments(batch_stream, k, first_step, total_step, periods,
                      strict=False, key_fn=shape_key):
    """Chunk-dispatch scheduler: turns a stream of batches (None = epoch
    boundary) into ('run', [batches]) segments of <= k same-shape batches
    plus ('epoch', None) markers, stopping after total_step batches.

    Segments never cross a periodic-action boundary (log/synth/val/save
    see the state at exactly the reference step) or total_step.  Batches
    buffer per shape key until k of one shape are available; partial
    buffers flush at epoch boundaries and end of stream.

    With k > 1 the default mode consumes batches grouped by shape rather
    than in strict arrival order, so the data order a given step sees can
    depart from the reference/k=1 trajectory whenever the corpus spans
    multiple shape buckets (each batch still trains exactly once; only
    the interleaving differs).  `strict=True` keeps ONE buffer and
    flushes it (partially) whenever the incoming shape changes: exact
    reference order at every step, at the cost of shorter scans on
    shape-alternating corpora (sorted-group batching clusters same-shape
    batches, so most of the chunking win survives)."""
    step = first_step
    buffers = {}
    buf_key = None

    def until_boundary(s):
        return min(p - ((s - 1) % p) for p in periods)

    def emit(batch_list):
        nonlocal step
        while batch_list and step <= total_step:
            cap = max(1, min(total_step - step + 1, k,
                             until_boundary(step)))
            seg, batch_list = batch_list[:cap], batch_list[cap:]
            step += len(seg)
            yield ("run", seg)

    for batch in batch_stream:
        if step > total_step:
            return
        if batch is None:  # epoch boundary: flush all pending buffers
            for key in list(buffers):
                yield from emit(buffers.pop(key))
                if step > total_step:
                    return
            yield ("epoch", None)
            continue

        key = key_fn(batch)
        if strict:
            buf = buffers.setdefault("__order__", [])
            if buf and buf_key != key:
                # shape changed: flush the pending run in arrival order
                yield from emit(buffers.pop("__order__"))
                buf = buffers.setdefault("__order__", [])
            buf_key = key
            key = "__order__"
        else:
            buf = buffers.setdefault(key, [])
        buf.append(batch)
        # cap the chunk at total_step and at periodic-action boundaries
        if len(buf) >= max(1, min(k, total_step - step + 1,
                                  until_boundary(step))):
            yield from emit(buffers.pop(key))

    # end of a FINITE stream without a trailing epoch marker: flush the
    # partial buffers rather than silently dropping tail batches (the
    # train CLI's generator always ends epochs with None; this covers
    # any other caller feeding a plain batch list)
    for key in list(buffers):
        yield from emit(buffers.pop(key))
        if step > total_step:
            return


def build_argparser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--restore_step", type=int, default=0)
    parser.add_argument("--path_tag", type=str, default="")
    parser.add_argument("--model", type=str,
                        choices=["naive", "aux", "shallow"], required=True)
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard the batch over all visible devices")
    parser.add_argument("--tensor_parallel", type=int, default=1,
                        help="Megatron-shard attention/FFN/denoiser weights"
                        " (and their optimizer moments) over a 'model' mesh"
                        " axis of this size; composes with --data_parallel"
                        " as a (devices/N, N) dp x tp mesh")
    parser.add_argument("--steps_per_call", type=int, default=0,
                        help="scan this many train steps per device "
                        "dispatch (amortizes per-call host overhead); "
                        "0 = use tpu.steps_per_call from model.yaml")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture an XLA device trace of 5 steady-state "
                             "steps into this dir (TensorBoard profile)")
    parser.add_argument("--profile_port", type=int, default=0,
                        help="start a live jax.profiler server on this port")
    parser.add_argument("--debug_nans", action="store_true",
                        help="enable jax_debug_nans: re-run the offending "
                             "program op-by-op to name the primitive that "
                             "produced the first NaN (slow; for triage)")
    return parser


def cli():
    args = build_argparser().parse_args()
    configs = load_configs(args)
    preprocess_config, model_config, train_config = configs
    print("\n========================= Training Configuration =========================")
    print(" ---> Type of Modeling:", args.model)
    if model_config["multi_speaker"]:
        print(" ---> Type of Speaker Embedder:",
              preprocess_config["preprocessing"].get("speaker_embedder"))
    print(" ---> Total Batch Size:",
          int(train_config["optimizer"]["batch_size"]))
    print(" ---> Path of ckpt:", train_config["path"]["ckpt_path"])
    print(" ---> Path of log:", train_config["path"]["log_path"])
    print(" ---> Path of result:", train_config["path"]["result_path"])
    print("==========================================================================")
    with debug_nans(getattr(args, "debug_nans", False)):
        main(args, configs)


if __name__ == "__main__":
    cli()
