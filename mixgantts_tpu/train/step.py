"""Jitted train/eval steps.

Parity targets: `train.py:93-186` in the reference — aux mode does one
forward + recon backward on the Noam-scheduled optimizer; naive/shallow run
the two-phase GAN step: (1) D update on the detached first forward's
(x_t, x_t_prev[_pred]) pairs, (2) a SECOND generator forward (fresh noise/t
draws, matching `train.py:133,153`) through the *updated* discriminator for
adv + recon + feature-matching.  Both phases compile into ONE XLA program
per step; gradient clipping and the optimizer chains live in `optim.py`.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np

from ..losses import (
    LossConfig, generator_loss, get_adversarial_losses_fn,
)
from .optim import build_fs2_optimizer, build_gan_optimizer, apply_lr

BATCH_MODEL_KEYS = (
    "speakers", "texts", "src_lens", "word_boundaries", "src_w_lens",
    "mels", "mel_lens", "attn_priors", "p_targets", "e_targets",
    "d_targets", "spker_embeds",
)


def _model_kwargs(batch):
    kw = {k: batch[k] for k in BATCH_MODEL_KEYS if k in batch}
    kw["max_mel_len"] = batch["mels"].shape[1]
    return kw


def _cast_floats(tree, dtype):
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


def make_train_step(mode, model, discriminator, model_config, train_config):
    """Returns step_fn(state, batch) -> (state, metrics); jit/pjit-ready.

    tpu.compute_dtype: bfloat16 runs the generator/discriminator forwards
    in bf16 (mixed precision: fp32 master weights and optimizer state,
    fp32 losses; jax.grad of the cast yields fp32 grads).  Opt-in — the
    float32 default matches the reference's numerics."""
    loss_cfg = LossConfig.from_configs(mode, model_config, train_config)
    d_loss_fn, g_loss_fn = get_adversarial_losses_fn(loss_cfg.adv_loss_mode)
    sched = model.schedule
    opt_fs2 = build_fs2_optimizer(model_config, train_config)
    opt_cfg = train_config["optimizer"]
    opt_gan = build_gan_optimizer(opt_cfg["betas"],
                                  opt_cfg["grad_clip_thresh"],
                                  opt_cfg.get("grad_acc_step", 1))
    tpu_cfg = model_config.get("tpu", {}) or {}
    compute_dtype = jnp.dtype(tpu_cfg.get("compute_dtype", "float32"))
    mixed = compute_dtype != jnp.float32

    # Validate the forward-reuse flags for EVERY mode up front.  Real
    # conflicts fail loudly; flags that are merely inert for THIS phase
    # warn instead of raising, because the documented aux→shallow
    # schedule drives both phases from one model.yaml — a shallow-only
    # opt-in must not abort the aux phase that precedes it.
    reuse_g = bool(tpu_cfg.get("reuse_g_forward", False))
    reuse_aux = bool(tpu_cfg.get("reuse_aux_forward", False))
    if reuse_g and reuse_aux:
        raise ValueError(
            "tpu.reuse_g_forward and tpu.reuse_aux_forward are mutually "
            "exclusive (reuse_g_forward already shares the whole forward)")
    if reuse_aux and mode == "naive":
        raise ValueError(
            "tpu.reuse_aux_forward only applies to shallow training "
            "(naive mode never has a frozen aux stack to share); use "
            "tpu.reuse_g_forward to share the whole forward instead")
    if mode == "aux" and (reuse_g or reuse_aux):
        flag = "reuse_g_forward" if reuse_g else "reuse_aux_forward"
        warnings.warn(
            f"tpu.{flag} is inert for the aux phase (aux runs a single "
            f"forward per step); it will take effect in the GAN phase "
            f"of this schedule", stacklevel=2)

    def g_forward(g_params, batch_stats, batch, rngs, train=True):
        if mixed:
            g_params = _cast_floats(g_params, compute_dtype)
            batch = _cast_floats(batch, compute_dtype)
        variables = {"params": g_params, "batch_stats": batch_stats}
        out, mut = model.apply(
            variables, **_model_kwargs(batch), train=train, rngs=rngs,
            mutable=["batch_stats"])
        if mixed:
            out = _cast_floats(out, jnp.float32)
        return out, mut.get("batch_stats", batch_stats)

    def d_apply(d_params, *args):
        if mixed:
            d_params = _cast_floats(d_params, compute_dtype)
            args = _cast_floats(args, compute_dtype)
        feats_c, feats_u = discriminator.apply({"params": d_params}, *args)
        if mixed:
            feats_c = _cast_floats(feats_c, jnp.float32)
            feats_u = _cast_floats(feats_u, jnp.float32)
        return feats_c, feats_u

    def recon_losses(out, batch, step):
        return generator_loss(
            loss_cfg, sched, out, batch["mels"], batch["p_targets"],
            batch["e_targets"], step=step)

    if mode == "aux":

        def step_fn(state, batch):
            rng, r_drop, r_diff = jax.random.split(state.rng, 3)

            def loss_fn(g_params):
                out, new_bs = g_forward(
                    g_params, state.g_batch_stats, batch,
                    {"dropout": r_drop, "diffusion": r_diff})
                losses = recon_losses(out, batch, state.step)
                return losses["recon_loss"], (losses, new_bs)

            grads, (losses, new_bs) = jax.grad(
                loss_fn, has_aux=True)(state.g_params)
            updates, new_opt = opt_fs2.update(
                grads, state.opt_g_fs2, state.g_params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.g_params, updates)
            metrics = dict(losses)
            metrics.update(
                total_loss=losses["recon_loss"],
                G_loss=losses["recon_loss"],
                D_loss=jnp.zeros(()), adv_loss=jnp.zeros(()))
            state = state.replace(
                step=state.step + 1, g_params=new_params,
                g_batch_stats=new_bs, opt_g_fs2=new_opt, rng=rng)
            return state, metrics

        return step_fn

    # --- GAN modes (naive / shallow) ---------------------------------------

    if reuse_g:
        return _make_reuse_gan_step(loss_cfg, sched, opt_gan,
                                    g_forward, d_apply,
                                    d_loss_fn, g_loss_fn)

    if reuse_aux:

        def g_aux_forward(g_params, batch_stats, batch, rngs):
            if mixed:
                g_params = _cast_floats(g_params, compute_dtype)
                batch = _cast_floats(batch, compute_dtype)
            variables = {"params": g_params, "batch_stats": batch_stats}
            aux, mut = model.apply(
                variables, **_model_kwargs(batch), train=True, rngs=rngs,
                aux_only=True, mutable=["batch_stats"])
            if mixed:
                aux = _cast_floats(aux, jnp.float32)
            return aux, mut.get("batch_stats", batch_stats)

        def g_diff_forward(g_params, batch_stats, batch, aux, rng):
            if mixed:
                g_params = _cast_floats(g_params, compute_dtype)
                batch = _cast_floats(batch, compute_dtype)
                aux = _cast_floats(aux, compute_dtype)
            variables = {"params": g_params, "batch_stats": batch_stats}
            out = model.apply(
                variables, **_model_kwargs(batch), train=True,
                rngs={"diffusion": rng}, aux_reuse=aux)
            if mixed:
                out = _cast_floats(out, jnp.float32)
            return out

        return _make_shallow_reuse_aux_step(
            loss_cfg, sched, opt_gan, g_aux_forward, g_diff_forward,
            d_apply, d_loss_fn, g_loss_fn)

    def step_fn(state, batch):
        rng, r1d, r1f, r2d, r2f = jax.random.split(state.rng, 5)

        # Phase 1: discriminator update on the detached first forward.
        out1, _ = g_forward(
            state.g_params, state.g_batch_stats, batch,
            {"dropout": r1d, "diffusion": r1f})
        x_ts = jax.lax.stop_gradient(out1.x_ts)
        x_t_prevs = jax.lax.stop_gradient(out1.x_t_prevs)
        x_t_prev_preds = jax.lax.stop_gradient(out1.x_t_prev_preds)
        spk = (jax.lax.stop_gradient(out1.speaker_emb)
               if out1.speaker_emb is not None else None)
        t = out1.diffusion_step

        def d_loss(d_params):
            fake_c, fake_u = d_apply(d_params, x_ts, x_t_prev_preds, spk, t)
            real_c, real_u = d_apply(d_params, x_ts, x_t_prevs, spk, t)
            r_loss, f_loss = d_loss_fn(
                real_c[-1], real_u[-1], fake_c[-1], fake_u[-1])
            return r_loss + f_loss

        D_loss, d_grads = jax.value_and_grad(d_loss)(state.d_params)
        d_updates, new_opt_d = opt_gan.update(
            d_grads, state.opt_d, state.d_params)
        d_updates = apply_lr(d_updates, state.lr_d)
        new_d_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.d_params, d_updates)

        # Phase 2: generator update through the updated discriminator,
        # with a fresh forward (new t / noise draws).
        def g_loss(g_params):
            out2, new_bs = g_forward(
                g_params, state.g_batch_stats, batch,
                {"dropout": r2d, "diffusion": r2f})
            fake_c, fake_u = d_apply(
                new_d_params, out2.x_ts, out2.x_t_prev_preds,
                out2.speaker_emb, out2.diffusion_step)
            real_c, real_u = d_apply(
                new_d_params, out2.x_ts, out2.x_t_prevs,
                out2.speaker_emb, out2.diffusion_step)
            adv_loss = g_loss_fn(fake_c[-1], fake_u[-1])
            losses = generator_loss(
                loss_cfg, sched, out2, batch["mels"], batch["p_targets"],
                batch["e_targets"], step=state.step,
                Ds=(real_c, real_u, fake_c, fake_u))
            G_loss = adv_loss + losses["recon_loss"] + losses["fm_loss"]
            return G_loss, (losses, adv_loss, new_bs)

        (G_loss, (losses, adv_loss, new_bs)), g_grads = jax.value_and_grad(
            g_loss, has_aux=True)(state.g_params)
        g_updates, new_opt_g = opt_gan.update(
            g_grads, state.opt_g, state.g_params)
        g_updates = apply_lr(g_updates, state.lr_g)
        new_g_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.g_params, g_updates)

        metrics = dict(losses)
        metrics.update(total_loss=D_loss + G_loss, D_loss=D_loss,
                       G_loss=G_loss, adv_loss=adv_loss)
        state = state.replace(
            step=state.step + 1,
            g_params=new_g_params, g_batch_stats=new_bs,
            d_params=new_d_params,
            opt_g=new_opt_g, opt_d=new_opt_d, rng=rng)
        return state, metrics

    return step_fn


def _make_reuse_gan_step(loss_cfg, sched, opt_gan, g_forward, d_apply,
                         d_loss_fn, g_loss_fn):
    """GAN step with ONE generator forward (`tpu.reuse_g_forward: true`).

    The reference runs two full generator forwards per step — the D phase
    trains on pass 1's detached outputs, the G phase re-samples fresh
    noise/timesteps (`train.py:133,153`).  This opt-in variant linearizes
    a single forward with `jax.vjp`: its detached outputs feed the D
    update, then the G losses (against the updated D) are differentiated
    w.r.t. the float outputs and pulled back through the saved
    linearization.  Saves one generator forward (~20%% of the step) at
    the cost of D and G seeing the same (t, noise) draws that step — a
    small departure from reference training semantics, hence off by
    default."""

    def step_fn(state, batch):
        rng, rd, rf = jax.random.split(state.rng, 3)

        def fwd(g_params):
            return g_forward(g_params, state.g_batch_stats, batch,
                             {"dropout": rd, "diffusion": rf})

        out, vjp_fn, new_bs = jax.vjp(fwd, state.g_params, has_aux=True)

        # Phase 1: D update on the (naturally detached) primal outputs.
        def d_loss(d_params):
            fake_c, fake_u = d_apply(d_params, out.x_ts,
                                     out.x_t_prev_preds, out.speaker_emb,
                                     out.diffusion_step)
            real_c, real_u = d_apply(d_params, out.x_ts, out.x_t_prevs,
                                     out.speaker_emb, out.diffusion_step)
            r_loss, f_loss = d_loss_fn(
                real_c[-1], real_u[-1], fake_c[-1], fake_u[-1])
            return r_loss + f_loss

        D_loss, d_grads = jax.value_and_grad(d_loss)(state.d_params)
        d_updates, new_opt_d = opt_gan.update(
            d_grads, state.opt_d, state.d_params)
        d_updates = apply_lr(d_updates, state.lr_d)
        new_d_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.d_params, d_updates)

        # Phase 2: differentiate the G losses w.r.t. the forward's float
        # outputs, then pull back through the saved linearization.
        flat, treedef = jax.tree_util.tree_flatten(out)
        fidx = [i for i, l in enumerate(flat)
                if jnp.issubdtype(l.dtype, jnp.floating)]

        def g_loss_from(floats):
            leaves = list(flat)
            for i, l in zip(fidx, floats):
                leaves[i] = l
            o = jax.tree_util.tree_unflatten(treedef, leaves)
            fake_c, fake_u = d_apply(new_d_params, o.x_ts,
                                     o.x_t_prev_preds, o.speaker_emb,
                                     o.diffusion_step)
            real_c, real_u = d_apply(new_d_params, o.x_ts, o.x_t_prevs,
                                     o.speaker_emb, o.diffusion_step)
            adv_loss = g_loss_fn(fake_c[-1], fake_u[-1])
            losses = generator_loss(
                loss_cfg, sched, o, batch["mels"], batch["p_targets"],
                batch["e_targets"], step=state.step,
                Ds=(real_c, real_u, fake_c, fake_u))
            G_loss = adv_loss + losses["recon_loss"] + losses["fm_loss"]
            return G_loss, (losses, adv_loss)

        (G_loss, (losses, adv_loss)), fgrads = jax.value_and_grad(
            g_loss_from, has_aux=True)([flat[i] for i in fidx])
        fset = dict(zip(fidx, fgrads))
        cot = [fset[i] if i in fset
               else np.zeros(np.shape(l), jax.dtypes.float0)
               for i, l in enumerate(flat)]
        g_grads, = vjp_fn(jax.tree_util.tree_unflatten(treedef, cot))

        g_updates, new_opt_g = opt_gan.update(
            g_grads, state.opt_g, state.g_params)
        g_updates = apply_lr(g_updates, state.lr_g)
        new_g_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.g_params, g_updates)

        metrics = dict(losses)
        metrics.update(total_loss=D_loss + G_loss, D_loss=D_loss,
                       G_loss=G_loss, adv_loss=adv_loss)
        state = state.replace(
            step=state.step + 1,
            g_params=new_g_params, g_batch_stats=new_bs,
            d_params=new_d_params,
            opt_g=new_opt_g, opt_d=new_opt_d, rng=rng)
        return state, metrics

    return step_fn


def _make_shallow_reuse_aux_step(loss_cfg, sched, opt_gan, g_aux_forward,
                                 g_diff_forward, d_apply, d_loss_fn,
                                 g_loss_fn):
    """Shallow GAN step sharing ONE aux-stack forward between the phases
    (`tpu.reuse_aux_forward: true`).

    In shallow mode the aux stack (linguistic encoder -> FFT decoder ->
    PostNet) is frozen toward the diffusion branch — the reference detaches
    cond/coarse/speaker before the denoiser (`model/mixgantts.py:146-159,
    182-183`) — yet its forward runs TWICE per step because the D and G
    phases each do a full generator pass (`train.py:133,153`).  This
    opt-in variant computes the aux stack once (linearized with `jax.vjp`
    so the postnet loss still backpropagates into it, reference
    `model/loss.py:163-170`), then runs only the cheap diffusion branch
    per phase, with INDEPENDENT (t, noise) draws per phase exactly like
    the reference.  The only semantic departure is that both phases see
    the same aux-stack dropout draws — strictly weaker than
    `tpu.reuse_g_forward` (which also shares the diffusion draws)."""

    def step_fn(state, batch):
        # split 5 ways like the two-forward step so the diffusion streams
        # (r1f/r2f) are draw-for-draw identical to it; r2d (phase-2
        # dropout) is unused — the single aux forward takes r1d
        rng, r1d, r1f, _r2d, r2f = jax.random.split(state.rng, 5)

        # ONE aux-stack forward, linearized for the postnet-loss pullback.
        def aux_fwd(g_params):
            return g_aux_forward(g_params, state.g_batch_stats, batch,
                                 {"dropout": r1d})

        aux, aux_vjp, new_bs = jax.vjp(aux_fwd, state.g_params,
                                       has_aux=True)

        # Phase 1: D update on a diffusion branch with its own draws; all
        # its generator-side inputs are detached (model-internal
        # stop_gradient + this apply is never differentiated).
        out1 = g_diff_forward(state.g_params, state.g_batch_stats, batch,
                              jax.lax.stop_gradient(aux), r1f)
        x_ts = out1.x_ts
        x_t_prevs = out1.x_t_prevs
        x_t_prev_preds = out1.x_t_prev_preds
        spk = out1.speaker_emb
        t = out1.diffusion_step

        def d_loss(d_params):
            fake_c, fake_u = d_apply(d_params, x_ts, x_t_prev_preds, spk, t)
            real_c, real_u = d_apply(d_params, x_ts, x_t_prevs, spk, t)
            r_loss, f_loss = d_loss_fn(
                real_c[-1], real_u[-1], fake_c[-1], fake_u[-1])
            return r_loss + f_loss

        D_loss, d_grads = jax.value_and_grad(d_loss)(state.d_params)
        d_updates, new_opt_d = opt_gan.update(
            d_grads, state.opt_d, state.d_params)
        d_updates = apply_lr(d_updates, state.lr_d)
        new_d_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.d_params, d_updates)

        # Phase 2: fresh diffusion draws through the updated D.  Direct
        # grads (denoiser) come from differentiating this apply; aux-stack
        # grads (postnet loss) come from the float-output cotangents
        # pulled back through the saved linearization.
        flat, treedef = jax.tree_util.tree_flatten(aux)
        fidx = [i for i, l in enumerate(flat)
                if jnp.issubdtype(l.dtype, jnp.floating)]

        def g_loss(g_params, floats):
            leaves = list(flat)
            for i, l in zip(fidx, floats):
                leaves[i] = l
            aux2 = jax.tree_util.tree_unflatten(treedef, leaves)
            out2 = g_diff_forward(g_params, state.g_batch_stats, batch,
                                  aux2, r2f)
            fake_c, fake_u = d_apply(
                new_d_params, out2.x_ts, out2.x_t_prev_preds,
                out2.speaker_emb, out2.diffusion_step)
            real_c, real_u = d_apply(
                new_d_params, out2.x_ts, out2.x_t_prevs,
                out2.speaker_emb, out2.diffusion_step)
            adv_loss = g_loss_fn(fake_c[-1], fake_u[-1])
            losses = generator_loss(
                loss_cfg, sched, out2, batch["mels"], batch["p_targets"],
                batch["e_targets"], step=state.step,
                Ds=(real_c, real_u, fake_c, fake_u))
            G_loss = adv_loss + losses["recon_loss"] + losses["fm_loss"]
            return G_loss, (losses, adv_loss)

        (G_loss, (losses, adv_loss)), (g_direct, fgrads) = \
            jax.value_and_grad(g_loss, argnums=(0, 1), has_aux=True)(
                state.g_params, [flat[i] for i in fidx])
        fset = dict(zip(fidx, fgrads))
        cot = [fset[i] if i in fset
               else np.zeros(np.shape(l), jax.dtypes.float0)
               for i, l in enumerate(flat)]
        g_aux_grads, = aux_vjp(jax.tree_util.tree_unflatten(treedef, cot))
        g_grads = jax.tree_util.tree_map(
            lambda a, b: a + b, g_direct, g_aux_grads)

        g_updates, new_opt_g = opt_gan.update(
            g_grads, state.opt_g, state.g_params)
        g_updates = apply_lr(g_updates, state.lr_g)
        new_g_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.g_params, g_updates)

        metrics = dict(losses)
        metrics.update(total_loss=D_loss + G_loss, D_loss=D_loss,
                       G_loss=G_loss, adv_loss=adv_loss)
        state = state.replace(
            step=state.step + 1,
            g_params=new_g_params, g_batch_stats=new_bs,
            d_params=new_d_params,
            opt_g=new_opt_g, opt_d=new_opt_d, rng=rng)
        return state, metrics

    return step_fn


def chunk_train_step(step_fn):
    """Wrap a train step so ONE dispatch runs k steps via `lax.scan` over
    batches stacked on a leading axis ([k, B, ...] per leaf).

    Rationale: per-call dispatch cost through the host<->TPU tunnel scales
    with the number of output buffers (~3-5 us/leaf; the train state has
    1.6k-2.2k leaves => ~7-11 ms/call), which exceeds the device time of a
    full-size step and becomes the training-throughput ceiling.  Scanning k
    steps per call divides that cost by k.  The rng/step stream is carried
    through the scan, so k chunked steps produce exactly the same state as
    k sequential calls.  Returned metrics keep the per-step leading [k]
    axis so the caller can log the value at an exact step."""

    def chunk_fn(state, batches):
        return jax.lax.scan(step_fn, state, batches)

    return chunk_fn


def make_eval_step(mode, model, discriminator, model_config, train_config):
    """Loss computation without updates (parity: `evaluate.py:19-149`)."""
    loss_cfg = LossConfig.from_configs(mode, model_config, train_config)
    d_loss_fn, g_loss_fn = get_adversarial_losses_fn(loss_cfg.adv_loss_mode)
    sched = model.schedule

    def eval_fn(state, batch, rng):
        r_diff, = jax.random.split(rng, 1)
        variables = {"params": state.g_params,
                     "batch_stats": state.g_batch_stats}
        out = model.apply(variables, **_model_kwargs(batch), train=False,
                          rngs={"diffusion": r_diff})
        if mode == "aux":
            losses = generator_loss(
                loss_cfg, sched, out, batch["mels"], batch["p_targets"],
                batch["e_targets"], step=state.step)
            losses.update(D_loss=jnp.zeros(()), adv_loss=jnp.zeros(()),
                          G_loss=losses["recon_loss"],
                          total_loss=losses["recon_loss"])
            return losses
        fake_c, fake_u = discriminator.apply(
            {"params": state.d_params}, out.x_ts, out.x_t_prev_preds,
            out.speaker_emb, out.diffusion_step)
        real_c, real_u = discriminator.apply(
            {"params": state.d_params}, out.x_ts, out.x_t_prevs,
            out.speaker_emb, out.diffusion_step)
        r_loss, f_loss = d_loss_fn(
            real_c[-1], real_u[-1], fake_c[-1], fake_u[-1])
        adv_loss = g_loss_fn(fake_c[-1], fake_u[-1])
        losses = generator_loss(
            loss_cfg, sched, out, batch["mels"], batch["p_targets"],
            batch["e_targets"], step=state.step,
            Ds=(real_c, real_u, fake_c, fake_u))
        G_loss = adv_loss + losses["recon_loss"] + losses["fm_loss"]
        losses.update(
            D_loss=r_loss + f_loss, adv_loss=adv_loss, G_loss=G_loss,
            total_loss=r_loss + f_loss + G_loss)
        return losses

    return eval_fn
