"""Train state: all generator/discriminator params + three optimizer states
as one pytree (the reference's checkpoint dict {epoch, G, D, optG_fs2, optG,
optD, sdlG, sdlD} maps onto this structure, `train.py:251-267`)."""

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from .optim import build_fs2_optimizer, build_gan_optimizer


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    epoch: jnp.ndarray
    g_params: Any
    g_batch_stats: Any
    d_params: Any
    opt_g_fs2: Any
    opt_g: Any
    opt_d: Any
    # per-epoch ExponentialLR values (host-updated: init_lr * gamma^epoch)
    lr_g: jnp.ndarray
    lr_d: jnp.ndarray
    rng: jnp.ndarray


def create_train_state(rng, model, discriminator, example_batch, train_config,
                       model_config, restore_step=0):
    """Initialize generator/discriminator variables + optimizer states."""
    opt = train_config["optimizer"]
    rng, g_rng, d_rng = jax.random.split(rng, 3)
    g_vars = model.init(
        {"params": g_rng, "dropout": jax.random.PRNGKey(0),
         "diffusion": jax.random.PRNGKey(1)},
        **example_batch, train=False)
    g_params = g_vars["params"]
    g_batch_stats = g_vars.get("batch_stats", {})

    mels = example_batch.get("mels")
    if mels is not None:
        B, T = mels.shape[:2]
        n_mels = mels.shape[-1]
    else:  # inference-time init (synthesize CLI restores into this state)
        B = example_batch["texts"].shape[0]
        T = int(example_batch.get("max_mel_len", 64))
        n_mels = len(model.schedule.spec_min)
    dummy_x = jnp.zeros((B, T, n_mels))
    dummy_spk = (jnp.zeros((B, model.hidden)) if model.multi_speaker else None)
    d_params = discriminator.init(
        d_rng, dummy_x, dummy_x, dummy_spk, jnp.zeros((B,), jnp.int32),
    )["params"]

    opt_g_fs2 = build_fs2_optimizer(model_config, train_config)
    opt_gan = build_gan_optimizer(opt["betas"], opt["grad_clip_thresh"],
                                  opt.get("grad_acc_step", 1))

    return TrainState(
        step=jnp.asarray(restore_step, jnp.int32),
        epoch=jnp.asarray(1, jnp.int32),
        g_params=g_params,
        g_batch_stats=g_batch_stats,
        d_params=d_params,
        opt_g_fs2=opt_g_fs2.init(g_params),
        opt_g=opt_gan.init(g_params),
        opt_d=opt_gan.init(d_params),
        lr_g=jnp.asarray(opt["init_lr_G"], jnp.float32),
        lr_d=jnp.asarray(opt["init_lr_D"], jnp.float32),
        rng=rng,
    )
