import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixgantts_tpu.models.discriminator import JCUDiscriminator
from mixgantts_tpu.train import create_train_state, make_train_step, make_eval_step

from test_model_forward import tiny_model, tiny_batch

TRAIN_CONFIG = {
    "optimizer": {
        "batch_size": 2, "batch_size_shallow": 2, "betas": [0.5, 0.9],
        "gamma": 0.999, "grad_clip_thresh": 1, "grad_acc_step": 1,
        "init_lr_G": 1e-4, "init_lr_D": 2e-4,
    },
    "optimizer_fs2": {
        "betas": [0.9, 0.98], "eps": 1e-9, "weight_decay": 0.0,
        "warm_up_step": 10, "anneal_steps": [100], "anneal_rate": 0.3,
    },
    "loss": {
        "adv_loss_mode": "lsgan", "noise_loss": "l1", "dur_loss": "mse",
        "pitch_loss": "l1", "lambda_d": 0.1, "lambda_p": 0.1,
        "lambda_e": 0.1, "lambda_fm": 10.0, "lambda_fm_shallow": 0.001,
    },
    "step": {"total_step_aux": 10, "total_step_naive": 10,
             "total_step_shallow": 10, "log_step": 5, "synth_step": 5,
             "val_step": 5, "save_step": 5},
    "aligner": {"helper_type": "dga", "ctc_step": 0, "ctc_weight_start": 1.0,
                "ctc_weight_end": 1.0, "guided_sigma": 0.4,
                "guided_lambda": 1.0, "guided_weight": 1.0},
}
MODEL_CONFIG = {
    "transformer": {"encoder_hidden": 32},
    "discriminator": {"n_layer": 3, "n_cond_layer": 2},
}


def tiny_disc():
    return JCUDiscriminator(n_mels=16, residual_channels=16,
                            n_channels=(8, 16, 32, 16, 1))


def setup(mode, helper="dga"):
    import copy
    tc = copy.deepcopy(TRAIN_CONFIG)
    tc["aligner"]["helper_type"] = helper
    model = tiny_model(mode)
    disc = tiny_disc()
    batch = tiny_batch()
    batch.pop("max_mel_len")
    batch = {k: v for k, v in batch.items()}
    state = create_train_state(
        jax.random.PRNGKey(0), model, disc,
        {**batch, "max_mel_len": batch["mels"].shape[1]},
        tc, MODEL_CONFIG)
    step_fn = jax.jit(make_train_step(mode, model, disc, MODEL_CONFIG, tc))
    return model, disc, state, step_fn, batch, tc


@pytest.mark.parametrize("mode", ["aux", "naive", "shallow"])
def test_train_step_runs_and_updates(mode):
    model, disc, state, step_fn, batch, tc = setup(mode)
    p0 = state.g_params
    state1, metrics = step_fn(state, batch)
    state2, metrics = step_fn(state1, batch)
    assert int(state2.step) == 2
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    # denoiser params must move in naive/shallow; encoder in aux/naive
    def moved(path):
        a = p0
        b = state2.g_params
        for key in path:
            a, b = a[key], b[key]
        leaves_a = jax.tree_util.tree_leaves(a)
        leaves_b = jax.tree_util.tree_leaves(b)
        return any(not np.allclose(x, y) for x, y in zip(leaves_a, leaves_b))

    if mode in ("naive", "shallow"):
        assert moved(["denoiser"])
    if mode in ("aux", "naive"):
        assert moved(["linguistic_encoder"])
    if mode == "shallow":
        # frozen-by-detach: the variance predictors receive no gradient
        assert not moved(["linguistic_encoder", "pitch_predictor"])
        assert not moved(["linguistic_encoder", "duration_predictor"])
        # but the postnet still trains (postnet_loss keeps its gradient)
        assert moved(["postnet"])


@pytest.mark.parametrize("mode", ["aux", "naive"])
def test_chunked_step_matches_sequential(mode):
    """chunk_train_step: one k-step scan dispatch == k sequential calls
    (same rng stream carried through the scan)."""
    from mixgantts_tpu.train import chunk_train_step

    model, disc, state0, step_fn, batch, tc = setup(mode)
    # two different batches: perturb the mels for the second
    batch2 = dict(batch)
    batch2["mels"] = batch["mels"] + 0.1
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), batch, batch2)

    chunk_fn = jax.jit(chunk_train_step(
        make_train_step(mode, model, disc, MODEL_CONFIG, tc)))
    state_c, ms = chunk_fn(state0, stacked)

    state_s, m1 = step_fn(state0, batch)
    state_s, m2 = step_fn(state_s, batch2)

    assert int(state_c.step) == int(state_s.step) == 2
    # metrics keep the per-step leading axis
    assert ms["total_loss"].shape == (2,)
    assert np.allclose(float(ms["total_loss"][0]), float(m1["total_loss"]),
                       rtol=1e-5, atol=1e-6)
    assert np.allclose(float(ms["total_loss"][1]), float(m2["total_loss"]),
                       rtol=1e-5, atol=1e-6)
    # Scan vs inline compile to slightly different fusions.  Leaves whose
    # exact gradient is zero by symmetry (K-projection biases: softmax is
    # shift-invariant; postnet conv biases: absorbed by BatchNorm mean
    # subtraction) see only cancellation noise, and Adam's step-1 update
    # lr*sign(g) amplifies its sign into lr-scale drift — on those leaves
    # ANY two compilations differ.  Require the bulk of leaves to match
    # tightly and bound the degenerate rest by the update scale.
    diffs = [float(np.abs(np.asarray(lc) - np.asarray(ls)).max())
             for lc, ls in zip(jax.tree_util.tree_leaves(state_c.g_params),
                               jax.tree_util.tree_leaves(state_s.g_params))]
    diffs.sort()
    assert diffs[-1] < 1e-2
    assert diffs[int(0.8 * len(diffs))] < 1e-5


@pytest.mark.parametrize("mode", ["naive", "shallow"])
def test_reuse_g_forward_step(mode):
    """tpu.reuse_g_forward: one-forward GAN step (jax.vjp pullback) —
    trains, keeps the shallow freeze semantics, and reduces the loss."""
    import copy

    model_cfg = copy.deepcopy(MODEL_CONFIG)
    model_cfg["tpu"] = {"reuse_g_forward": True}
    model, disc, state, _, batch, tc = setup(mode)
    step_fn = jax.jit(make_train_step(mode, model, disc, model_cfg, tc))
    p0 = state.g_params
    losses = []
    for _ in range(6):
        state, metrics = step_fn(state, batch)
        # the adversarial total is not monotonic; track reconstruction
        losses.append(float(metrics["recon_loss"]))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), f"{k} not finite"

    def moved(path):
        a, b = p0, state.g_params
        for key in path:
            a, b = a[key], b[key]
        return any(not np.allclose(x, y) for x, y in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))

    assert moved(["denoiser"])
    if mode == "shallow":
        # frozen-by-detach must survive the vjp pullback
        assert not moved(["linguistic_encoder", "pitch_predictor"])
        assert not moved(["linguistic_encoder", "duration_predictor"])
        assert moved(["postnet"])
    else:
        assert moved(["linguistic_encoder"])
    if mode == "naive":
        # same fixed batch: reconstruction should trend down (shallow's
        # target is the frozen random aux stack's coarse mel — no
        # meaningful trend at this scale/step count)
        assert np.mean(losses[-2:]) < np.mean(losses[:2])


def test_reuse_aux_forward_step_matches_monolithic():
    """tpu.reuse_aux_forward (shallow): ONE aux-stack forward shared by
    both phases, diffusion branch run per phase with independent draws.
    The step's D and G updates must equal a monolithically-computed step
    using the same rng draws (full forward per phase, aux dropout r1d,
    diffusion r1f/r2f) — proving the vjp pullback of the postnet loss
    through the shared aux stack is the exact gradient."""
    import copy

    from mixgantts_tpu.losses import (
        LossConfig, generator_loss, get_adversarial_losses_fn,
    )
    from mixgantts_tpu.train.optim import build_gan_optimizer, apply_lr

    model_cfg = copy.deepcopy(MODEL_CONFIG)
    model_cfg["tpu"] = {"reuse_aux_forward": True}
    model, disc, state0, _, batch, tc = setup("shallow")
    reuse_fn = jax.jit(make_train_step("shallow", model, disc,
                                       model_cfg, tc))
    state1, metrics = reuse_fn(state0, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"

    # --- monolithic reference computation with the same draws -----------
    rng, r1d, r1f, _r2d, r2f = jax.random.split(state0.rng, 5)
    loss_cfg = LossConfig.from_configs("shallow", model_cfg, tc)
    d_loss_fn, g_loss_fn = get_adversarial_losses_fn("lsgan")
    opt = tc["optimizer"]
    opt_gan = build_gan_optimizer(opt["betas"], opt["grad_clip_thresh"], 1)
    kwargs = dict(batch)
    kwargs["max_mel_len"] = batch["mels"].shape[1]

    def fwd(g_params, rd, rf):
        out, _ = model.apply(
            {"params": g_params, "batch_stats": state0.g_batch_stats},
            **kwargs, train=True, rngs={"dropout": rd, "diffusion": rf},
            mutable=["batch_stats"])
        return out

    # D phase: full forward, draws (r1d, r1f), detached
    out1 = jax.lax.stop_gradient(fwd(state0.g_params, r1d, r1f))

    def d_loss(d_params):
        fake = disc.apply({"params": d_params}, out1.x_ts,
                          out1.x_t_prev_preds, out1.speaker_emb,
                          out1.diffusion_step)
        real = disc.apply({"params": d_params}, out1.x_ts, out1.x_t_prevs,
                          out1.speaker_emb, out1.diffusion_step)
        r_loss, f_loss = d_loss_fn(real[0][-1], real[1][-1],
                                   fake[0][-1], fake[1][-1])
        return r_loss + f_loss

    D_loss, d_grads = jax.value_and_grad(d_loss)(state0.d_params)
    d_updates, _ = opt_gan.update(d_grads, state0.opt_d, state0.d_params)
    d_updates = apply_lr(d_updates, state0.lr_d)
    exp_d_params = jax.tree_util.tree_map(
        lambda p, u: p + u, state0.d_params, d_updates)

    # G phase: full forward, draws (r1d aux dropout, r2f diffusion),
    # through the updated D
    def g_loss(g_params):
        out2 = fwd(g_params, r1d, r2f)
        fake_c, fake_u = disc.apply(
            {"params": exp_d_params}, out2.x_ts, out2.x_t_prev_preds,
            out2.speaker_emb, out2.diffusion_step)
        real_c, real_u = disc.apply(
            {"params": exp_d_params}, out2.x_ts, out2.x_t_prevs,
            out2.speaker_emb, out2.diffusion_step)
        adv = g_loss_fn(fake_c[-1], fake_u[-1])
        losses = generator_loss(
            loss_cfg, model.schedule, out2, batch["mels"],
            batch["p_targets"], batch["e_targets"], step=state0.step,
            Ds=(real_c, real_u, fake_c, fake_u))
        return adv + losses["recon_loss"] + losses["fm_loss"]

    g_grads = jax.grad(g_loss)(state0.g_params)
    g_updates, _ = opt_gan.update(g_grads, state0.opt_g, state0.g_params)
    g_updates = apply_lr(g_updates, state0.lr_g)
    exp_g_params = jax.tree_util.tree_map(
        lambda p, u: p + u, state0.g_params, g_updates)

    assert np.allclose(float(metrics["D_loss"]), float(D_loss),
                       rtol=1e-5, atol=1e-6)
    for exp, got, tag in ((exp_d_params, state1.d_params, "D"),
                          (exp_g_params, state1.g_params, "G")):
        for (kp, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(exp),
                jax.tree_util.tree_leaves_with_path(got)):
            # atol headroom: the split (aux, then diffusion) and monolithic
            # programs fuse differently, so activations differ at float
            # noise (~1e-7); elementwise Adam normalizes each gradient by
            # its own magnitude, amplifying noise-dominated (near-zero-
            # gradient) elements to ~1e-6-scale update differences.  A
            # genuinely missing gradient path would show update-scale
            # (>= 1e-4) diffs across a whole module, well above this atol.
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5,
                err_msg=f"{tag} params diverge at {jax.tree_util.keystr(kp)}")

    # freeze semantics survive the split-apply pullback
    def moved(path):
        a, b = state0.g_params, state1.g_params
        for key in path:
            a, b = a[key], b[key]
        return any(not np.allclose(x, y) for x, y in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))

    assert moved(["denoiser"])
    assert moved(["postnet"])
    assert not moved(["linguistic_encoder", "pitch_predictor"])
    assert not moved(["linguistic_encoder", "duration_predictor"])


def test_reuse_aux_forward_rejected_in_naive():
    """naive never has a frozen aux stack, so reuse_aux_forward there is a
    genuine misconfiguration (not a phase-ordering artifact) → hard error."""
    import copy
    model_cfg = copy.deepcopy(MODEL_CONFIG)
    model_cfg["tpu"] = {"reuse_aux_forward": True}
    model, disc, _, _, _, tc = setup("naive")
    with pytest.raises(ValueError, match="shallow"):
        make_train_step("naive", model, disc, model_cfg, tc)
    model_cfg["tpu"]["reuse_g_forward"] = True
    with pytest.raises(ValueError, match="mutually exclusive"):
        make_train_step("shallow", model, disc, model_cfg, tc)


@pytest.mark.parametrize("mode", ["aux", "naive"])
def test_eval_step(mode):
    model, disc, state, step_fn, batch, tc = setup(mode)
    eval_fn = jax.jit(make_eval_step(mode, model, disc, MODEL_CONFIG, tc))
    losses = eval_fn(state, batch, jax.random.PRNGKey(7))
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite"


def test_ctc_helper_mode():
    model, disc, state, step_fn, batch, tc = setup("naive", helper="ctc")
    state1, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["helper_loss"]))
    assert float(metrics["helper_loss"]) != 0.0


def test_grad_accumulation_matches_mean_grad():
    """grad_acc_step=k: k accumulation calls == one step on the mean grad
    (the reference's loss/k + step-every-k semantics, train.py:75-85)."""
    import jax
    import jax.numpy as jnp
    from mixgantts_tpu.train.optim import build_gan_optimizer, apply_lr

    params = {"w": jnp.ones((4,))}
    g1 = {"w": jnp.full((4,), 0.5)}
    g2 = {"w": jnp.full((4,), 1.5)}
    g_mean = {"w": (g1["w"] + g2["w"]) / 2}

    acc = build_gan_optimizer((0.5, 0.9), 10.0, grad_acc_step=2)
    st = acc.init(params)
    up1, st = acc.update(g1, st, params)
    assert float(jnp.abs(up1["w"]).max()) == 0.0  # no update mid-window
    up2, st = acc.update(g2, st, params)

    plain = build_gan_optimizer((0.5, 0.9), 10.0)
    pst = plain.init(params)
    upm, _ = plain.update(g_mean, pst, params)
    assert jnp.allclose(up2["w"], upm["w"], atol=1e-7)


def test_mixed_precision_train_step():
    """tpu.compute_dtype: bfloat16 — one GAN step runs, losses finite,
    fp32 master params move."""
    import copy

    import jax
    import jax.numpy as jnp

    model_cfg = copy.deepcopy(MODEL_CONFIG)
    model_cfg["tpu"] = {"compute_dtype": "bfloat16"}
    model, disc, state, _, batch, tc = setup("naive")
    step_fn = jax.jit(make_train_step("naive", model, disc, model_cfg, tc))
    new_state, metrics = step_fn(state, batch)
    assert jnp.isfinite(metrics["total_loss"])
    # master weights stay fp32 and move
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(new_state.g_params))
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.g_params, new_state.g_params)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0


def test_reuse_flags_inert_with_warning_in_aux_mode():
    """The aux→shallow schedule drives both phases from ONE model.yaml, so
    a shallow-only reuse opt-in must not abort the aux phase — it warns
    that it is inert for this phase and the step builder still returns."""
    import copy
    import warnings as _warnings
    tc = copy.deepcopy(TRAIN_CONFIG)
    model = tiny_model("aux")
    disc = tiny_disc()
    for flag in ("reuse_g_forward", "reuse_aux_forward"):
        mc = copy.deepcopy(MODEL_CONFIG)
        mc["tpu"] = {flag: True}
        with pytest.warns(UserWarning, match=flag):
            step_fn = make_train_step("aux", model, disc, mc, tc)
        assert callable(step_fn)
    # conflicting flags still fail loudly regardless of mode
    mc = copy.deepcopy(MODEL_CONFIG)
    mc["tpu"] = {"reuse_g_forward": True, "reuse_aux_forward": True}
    with pytest.raises(ValueError, match="mutually exclusive"):
        make_train_step("aux", model, disc, mc, tc)
    # a clean config builds with no warning at all
    mc = copy.deepcopy(MODEL_CONFIG)
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        make_train_step("aux", model, disc, mc, tc)


def test_check_finite_metrics_guard():
    """SURVEY §5 sanitizer: the host-side guard the train CLI runs at every
    log step names the offending step and metric keys."""
    from mixgantts_tpu.train import check_finite_metrics

    check_finite_metrics({"G_loss": np.float32(1.0), "step": np.int32(3),
                          "D_loss": 0.25}, step=10)  # all finite: no raise
    with pytest.raises(FloatingPointError, match=r"step 7.*G_loss"):
        check_finite_metrics({"G_loss": np.float32("nan"), "ok": 1.0}, 7)
    with pytest.raises(FloatingPointError, match="D_loss"):
        check_finite_metrics({"D_loss": np.inf, "ok": 1.0}, 3)


def test_nan_batch_fails_loudly():
    """A poisoned batch propagates NaN into the losses and the guard
    raises instead of letting the run burn its budget silently."""
    from mixgantts_tpu.train import check_finite_metrics

    model, disc, state, step_fn, batch, tc = setup("naive")
    bad = dict(batch)
    mels = np.asarray(bad["mels"]).copy()
    mels[0, 0, 0] = np.nan
    bad["mels"] = mels
    _, metrics = step_fn(state, bad)
    with pytest.raises(FloatingPointError, match="non-finite"):
        check_finite_metrics(jax.device_get(metrics), step=1)


def test_debug_nans_context():
    """`--debug_nans` / CI variant: jax names the producing primitive and
    the config is restored afterwards."""
    from mixgantts_tpu.train import debug_nans

    assert not jax.config.jax_debug_nans
    with debug_nans():
        with pytest.raises(FloatingPointError):
            np.asarray(jax.jit(jnp.log)(jnp.float32(-1.0)))
    assert not jax.config.jax_debug_nans
