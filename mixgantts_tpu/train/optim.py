"""Optimizers (optax).

Parity targets: `model/optimizer.py:5-56` (ScheduledOptim: Adam b=(0.9,0.98)
eps 1e-9 with Noam warmup x step anneal, lr scale hidden^-0.5) and
`utils/model.py:32-40` + `train.py:276-278` (GAN Adams lr 1e-4/2e-4,
betas (0.5, 0.9), per-epoch ExponentialLR gamma).  Gradient clipping at
global-norm `grad_clip_thresh` happens inside the chain (`train.py:75-85`).
"""

import jax.numpy as jnp
import optax


def fs2_lr_schedule(d_model, warmup_steps, anneal_steps, anneal_rate):
    """Noam warmup/decay with step anneal; lr scale = d_model^-0.5."""
    init_lr = d_model ** -0.5

    def schedule(step):
        s = jnp.asarray(step, dtype=jnp.float32) + 1.0
        lr = jnp.minimum(s ** -0.5, s * warmup_steps ** -1.5)
        for a in anneal_steps:
            lr = lr * jnp.where(s > a, anneal_rate, 1.0)
        return init_lr * lr

    return schedule


def _accumulate(opt, every_k):
    """Gradient accumulation (`grad_acc_step` in train.yaml; the reference
    divides the loss by grad_acc_step and steps every k batches,
    `train.py:75-85`): optax.MultiSteps averages grads over k calls and
    applies the inner optimizer once, which is the same update."""
    if every_k and every_k > 1:
        return optax.MultiSteps(opt, every_k_schedule=int(every_k))
    return opt


def build_fs2_optimizer(model_config, train_config):
    fs2 = train_config["optimizer_fs2"]
    clip = train_config["optimizer"]["grad_clip_thresh"]
    schedule = fs2_lr_schedule(
        model_config["transformer"]["encoder_hidden"],
        fs2["warm_up_step"], fs2["anneal_steps"], fs2["anneal_rate"])
    return _accumulate(optax.chain(
        optax.clip_by_global_norm(clip),
        optax.scale_by_adam(b1=fs2["betas"][0], b2=fs2["betas"][1],
                            eps=fs2["eps"]),
        optax.add_decayed_weights(fs2.get("weight_decay", 0.0)),
        optax.scale_by_schedule(schedule),
        optax.scale(-1.0),
    ), train_config["optimizer"].get("grad_acc_step", 1))


def build_gan_optimizer(betas, clip, grad_acc_step=1):
    """Adam without a baked-in learning rate: the per-epoch ExponentialLR
    value (init_lr * gamma^epoch, tracked in TrainState.lr_g / lr_d on the
    host) is injected per step via `optax.scale_by_learning_rate` impossible
    to schedule by step — so the step fn scales updates by the lr scalar
    itself."""
    return _accumulate(optax.chain(
        optax.clip_by_global_norm(clip),
        optax.scale_by_adam(b1=betas[0], b2=betas[1]),
        optax.scale(-1.0),
    ), grad_acc_step)


def apply_lr(updates, lr):
    """Scale a pytree of optimizer updates by a (possibly traced) lr."""
    import jax
    return jax.tree_util.tree_map(lambda u: u * lr, updates)
