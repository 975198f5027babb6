"""Validation pass.

Parity target: `evaluate.py:19-186` in the reference — run the whole val set
through the same loss graph (no updates), average each loss over samples,
log one synthesized sample, return the formatted message.
"""

import argparse

import jax
import numpy as np

from ..data.dataset import AcousticDataset
from ..utils.logging import LOSS_KEYS, log, loss_message
from .common import model_batch_of


def evaluate(mode, model, discriminator, state, configs, logger=None,
             vocoder=None, eval_fn=None, max_batches=None):
    preprocess_config, model_config, train_config = configs
    if eval_fn is None:
        from ..train import make_eval_step
        eval_fn = jax.jit(make_eval_step(mode, model, discriminator,
                                         model_config, train_config))

    dataset = AcousticDataset(
        "val.txt", mode, preprocess_config, model_config, train_config,
        sort=False, drop_last=False)

    from ..data.prefetch import prefetch

    sums = {k: 0.0 for k in LOSS_KEYS}
    n_samples = 0
    first_batch = None
    for i, batch in enumerate(prefetch(dataset.batches(
            group_size=1, shuffle=False, epochs=1))):
        if batch is None:
            break
        if max_batches is not None and i >= max_batches:
            break
        if first_batch is None:
            first_batch = batch
        losses = jax.device_get(eval_fn(
            state, model_batch_of(batch), jax.random.PRNGKey(i)))
        bsz = len(batch["ids"])
        for k in LOSS_KEYS:
            sums[k] += float(losses.get(k, 0.0)) * bsz
        n_samples += bsz

    means = {k: v / max(n_samples, 1) for k, v in sums.items()}
    step = int(state.step)
    total = train_config["step"][f"total_step_{mode}"]
    message = loss_message(step, total, means)

    if logger is not None:
        log(logger, step, losses=means)
        if vocoder is not None and first_batch is not None:
            from .train import synthesize_sample
            figs, attn_fig, wav_rec, wav_pred, tag = synthesize_sample(
                mode, model, state, first_batch, vocoder, model_config,
                preprocess_config, model.schedule)
            sr = preprocess_config["preprocessing"]["audio"]["sampling_rate"]
            log(logger, step, figs=figs, tag="Validation")
            log(logger, figs=attn_fig,
                tag=f"Validation_attn/step_{step}_{tag}")
            log(logger, step, audio=wav_rec, sampling_rate=sr,
                tag="Validation/reconstructed")
            log(logger, step, audio=wav_pred, sampling_rate=sr,
                tag="Validation/synthesized")
    return message


def cli():
    from ..checkpoint import restore_checkpoint
    from ..train import create_train_state
    from .common import (build_discriminator, build_model, load_configs,
                         model_batch_of)

    parser = argparse.ArgumentParser()
    parser.add_argument("--restore_step", type=int, default=0)
    parser.add_argument("--path_tag", type=str, default="")
    parser.add_argument("--model", type=str,
                        choices=["naive", "aux", "shallow"], required=True)
    parser.add_argument("--dataset", type=str, required=True)
    args = parser.parse_args()
    configs = load_configs(args)
    preprocess_config, model_config, train_config = configs

    model, _ = build_model(args.model, preprocess_config, model_config)
    disc = build_discriminator(preprocess_config, model_config)
    dataset = AcousticDataset(
        "val.txt", args.model, preprocess_config, model_config, train_config)
    example = next(b for b in dataset.batches(group_size=1, epochs=1)
                   if b is not None)
    init_batch = model_batch_of(example)
    init_batch["max_mel_len"] = example["mels"].shape[1]
    state = create_train_state(
        jax.random.PRNGKey(0), model, disc, init_batch, train_config,
        model_config, restore_step=args.restore_step)
    if args.restore_step:
        state = restore_checkpoint(train_config["path"]["ckpt_path"], state,
                                   args.restore_step)
    print(evaluate(args.model, model, disc, state, configs))


if __name__ == "__main__":
    cli()
