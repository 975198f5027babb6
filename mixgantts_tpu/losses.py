"""Training losses.

Parity targets: `model/loss.py` in MaxMax2016/MixGAN-TTS — LSGAN JCU losses
(:12-36), per-mode reconstruction (:90-213), feature matching (:221-227),
weighted nonzero-frame mel L1 (:229-242,255-259), guided attention (:261-418)
and CTC forward-sum (:420-447).  All reductions are mask-aware jnp reductions
(the reference's masked_select/masked_fill patterns are replaced with
sum(x * mask) / sum(mask)); the CTC forward-sum is a vectorized lax.scan over
frames instead of a per-item torch CTC call.
"""


from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


# --- adversarial (LSGAN, JCU) -----------------------------------------------

def _jcu_loss(logit_cond, logit_uncond, target):
    cond = jnp.mean(jnp.square(logit_cond - target))
    uncond = jnp.mean(jnp.square(logit_uncond - target))
    return 0.5 * (cond + uncond)


def d_loss_fn(r_logit_cond, r_logit_uncond, f_logit_cond, f_logit_uncond):
    r_loss = _jcu_loss(r_logit_cond, r_logit_uncond, 1.0)
    f_loss = _jcu_loss(f_logit_cond, f_logit_uncond, 0.0)
    return r_loss, f_loss


def g_loss_fn(f_logit_cond, f_logit_uncond):
    return _jcu_loss(f_logit_cond, f_logit_uncond, 1.0)


def get_adversarial_losses_fn(mode):
    """Adversarial loss pair keyed by `train.yaml loss.adv_loss_mode`
    (`model/loss.py:32-37` raises NotImplementedError likewise)."""
    if mode == "lsgan":
        return d_loss_fn, g_loss_fn
    raise NotImplementedError(
        f"loss.adv_loss_mode={mode!r}: only 'lsgan' is implemented "
        f"(matches the reference)")


# --- reconstruction helpers --------------------------------------------------

def masked_mean(x, mask):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def masked_mse(pred, target, mask):
    return masked_mean(jnp.square(pred - target), mask)


def weighted_mel_l1(pred, target, mel_mask):
    """L1 weighted by nonzero target frames (the reference's
    weights_nonzero_speech), with padded frames zeroed first."""
    maskf = mel_mask[..., None].astype(pred.dtype)
    pred = pred * maskf
    target = target * maskf
    nonzero = (jnp.sum(jnp.abs(target), axis=-1, keepdims=True) != 0)
    w = jnp.broadcast_to(nonzero, target.shape).astype(pred.dtype)
    return jnp.sum(jnp.abs(pred - target) * w) / jnp.maximum(jnp.sum(w), 1.0)


# --- guided attention ---------------------------------------------------------

def guided_attention_loss(attn, src_lens, mel_lens, sigma=0.4, alpha=1.0):
    """Diagonal-prior attention penalty (ESPnet-style).

    attn -- [B, T_mel, T_src] one head's attention weights.
    Penalty weight 1 - exp(-((x/ilen - y/olen)^2) / (2 sigma^2)) averaged over
    the valid [olen, ilen] region.
    """
    B, T, P = attn.shape
    y = jnp.arange(T, dtype=jnp.float32)[None, :, None]  # mel frame
    x = jnp.arange(P, dtype=jnp.float32)[None, None, :]  # phoneme
    il = src_lens.astype(jnp.float32)[:, None, None]
    ol = mel_lens.astype(jnp.float32)[:, None, None]
    w = 1.0 - jnp.exp(-jnp.square(x / il - y / ol) / (2.0 * sigma ** 2))
    valid = (y < ol) & (x < il)
    return alpha * masked_mean(attn * w, valid)


# --- CTC forward-sum ----------------------------------------------------------

def forward_sum_loss(attn_logprob, key_lens, query_lens, blank_logprob=-1.0):
    """CTC forward-sum over attention logits (alignment learning).

    attn_logprob -- [B, T_mel, P] pre-softmax attention logits for one head.
    Each phoneme 1..key_len must be visited once, in order; class 0 is the
    CTC blank (given constant logit `blank_logprob`).  Vectorized alpha
    recursion over frames via lax.scan; per-item lengths handled by masking.
    """
    B, T, P = attn_logprob.shape
    # Build per-frame log-probs over [blank] + phoneme classes, normalizing
    # only over the valid keys + blank.
    key_idx = jnp.arange(P, dtype=jnp.int32)[None, :]
    key_valid = key_idx < key_lens[:, None]  # [B, P]
    logits = jnp.concatenate(
        [jnp.full((B, T, 1), blank_logprob, dtype=attn_logprob.dtype),
         attn_logprob], axis=-1)
    logits = jnp.where(
        jnp.concatenate([jnp.ones((B, 1), bool), key_valid],
                        axis=1)[:, None, :],
        logits, NEG_INF)
    logp = jax.nn.log_softmax(logits, axis=-1)  # [B, T, P+1]

    # CTC states: s = 0..2P ; even -> blank, odd -> phoneme (s+1)//2.
    S = 2 * P + 1
    s = jnp.arange(S)
    state_label = jnp.where(s % 2 == 1, (s + 1) // 2, 0)  # class index
    # all labels distinct -> skip transition allowed from every odd state
    can_skip = (s % 2 == 1) & (s >= 2)

    alpha0 = jnp.full((B, S), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(logp[:, 0, 0])
    alpha0 = alpha0.at[:, 1].set(logp[:, 0, 1])

    def step(alpha, logp_t):
        stay = alpha
        advance = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF), alpha[:, :-1]], axis=1)
        skip = jnp.concatenate(
            [jnp.full((B, 2), NEG_INF), alpha[:, :-2]], axis=1)
        skip = jnp.where(can_skip[None, :], skip, NEG_INF)
        merged = jnp.logaddexp(jnp.logaddexp(stay, advance), skip)
        new_alpha = merged + logp_t[:, state_label]
        return new_alpha, new_alpha

    _, alphas = jax.lax.scan(step, alpha0, jnp.swapaxes(logp[:, 1:], 0, 1))
    alphas = jnp.concatenate([alpha0[None], alphas], axis=0)  # [T, B, S]

    # terminal: frame query_len-1, states 2*key_len and 2*key_len - 1
    t_last = jnp.clip(query_lens - 1, 0, T - 1)
    alpha_last = alphas[t_last, jnp.arange(B)]  # [B, S]
    sl = 2 * key_lens
    final = jnp.logaddexp(
        jnp.take_along_axis(alpha_last, sl[:, None], axis=1)[:, 0],
        jnp.take_along_axis(alpha_last, (sl - 1)[:, None], axis=1)[:, 0])
    # torch.nn.CTCLoss(reduction='mean'): per-item NLL divided by the target
    # length (here: key_lens), then batch-averaged.
    return -jnp.mean(final / key_lens.astype(final.dtype))


# --- feature matching ---------------------------------------------------------

def feature_matching_loss(D_real_cond, D_real_uncond, D_fake_cond,
                          D_fake_uncond, n_layers):
    feat_w = 4.0 / (n_layers + 1)
    loss = 0.0
    for j in range(len(D_fake_cond) - 1):
        loss = loss + feat_w * 0.5 * (
            jnp.mean(jnp.abs(jax.lax.stop_gradient(D_real_cond[j])
                             - D_fake_cond[j]))
            + jnp.mean(jnp.abs(jax.lax.stop_gradient(D_real_uncond[j])
                               - D_fake_uncond[j])))
    return loss


# --- full generator loss -------------------------------------------------------

class LossConfig(NamedTuple):
    mode: str
    lambda_d: float = 0.1
    lambda_p: float = 0.1
    lambda_e: float = 0.1
    lambda_fm: float = 10.0
    helper_type: str = "dga"        # 'dga' | 'ctc' | 'none'
    guided_sigma: float = 0.4
    guided_lambda: float = 1.0
    guided_weight: float = 1.0
    ctc_step: int = 0
    ctc_weight_start: float = 1.0
    ctc_weight_end: float = 1.0
    n_disc_layers: int = 5          # n_layer + n_cond_layer
    adv_loss_mode: str = "lsgan"

    @classmethod
    def from_configs(cls, mode, model_config, train_config):
        lc = train_config["loss"]
        al = train_config["aligner"]
        dc = model_config["discriminator"]
        # Fail loudly on loss-selection keys requesting unimplemented
        # behavior.  In the reference only adv_loss_mode is live
        # (`model/loss.py:74`); noise_loss is stored but never read
        # (`model/diffusion.py:59`) and dur_loss/pitch_loss are decorative
        # config keys (the code hardcodes log-MSE duration and MSE
        # pitch/energy regardless).  We accept exactly the shipped values
        # and raise otherwise rather than silently running the defaults.
        get_adversarial_losses_fn(lc.get("adv_loss_mode", "lsgan"))
        for key, implemented in (("noise_loss", "l1"), ("dur_loss", "mse"),
                                 ("pitch_loss", "l1")):
            val = lc.get(key, implemented)
            if val != implemented:
                raise NotImplementedError(
                    f"train.yaml loss.{key}={val!r}: only {implemented!r} "
                    f"is implemented (the reference ships this value and "
                    f"never branches on it)")
        if al["helper_type"] not in ("dga", "ctc", "none"):
            raise NotImplementedError(
                f"aligner.helper_type={al['helper_type']!r}: "
                f"expected 'dga', 'ctc' or 'none'")
        return cls(
            mode=mode,
            lambda_d=lc["lambda_d"], lambda_p=lc["lambda_p"],
            lambda_e=lc["lambda_e"],
            lambda_fm=lc["lambda_fm" if mode != "shallow"
                         else "lambda_fm_shallow"],
            helper_type=al["helper_type"],
            guided_sigma=al["guided_sigma"],
            guided_lambda=al["guided_lambda"],
            guided_weight=al["guided_weight"],
            ctc_step=al.get("ctc_step", 0),
            ctc_weight_start=al.get("ctc_weight_start", 1.0),
            ctc_weight_end=al.get("ctc_weight_end", 1.0),
            n_disc_layers=dc["n_layer"] + dc["n_cond_layer"],
            adv_loss_mode=lc.get("adv_loss_mode", "lsgan"),
        )


def generator_loss(cfg, schedule, out, mel_targets, pitch_targets,
                   energy_targets, step=0, Ds=None):
    """Reconstruction (+ optional feature-matching) loss.

    out -- GeneratorOutput; mel_targets raw-scale [B, T, n_mels].
    Returns dict of scalars: recon/mel/postnet/pitch/energy/duration/helper/fm.
    """
    src_mask = out.src_mask
    mel_mask = out.mel_mask
    zero = jnp.zeros(())

    log_dur_targets = jnp.log(out.dur_w_rounded.astype(jnp.float32) + 1.0)

    if cfg.mode == "aux":
        postnet_loss = jnp.mean(jnp.abs(out.postnet_output - mel_targets))
        # trace: [S+1, B, T, M] of normalized mels; denorm each, L1 to target
        def trace_l1(x):
            return weighted_mel_l1(schedule.denorm_spec(x), mel_targets,
                                   mel_mask)
        mel_loss = jnp.sum(jax.vmap(trace_l1)(out.mel_pred))
    elif cfg.mode == "shallow":
        postnet_loss = jnp.mean(jnp.abs(out.postnet_output - mel_targets))
        coarse = jax.lax.stop_gradient(out.coarse_mel)
        mel_loss = weighted_mel_l1(
            schedule.denorm_spec(out.mel_pred), coarse, mel_mask)
    else:  # naive
        postnet_loss = zero
        mel_loss = weighted_mel_l1(
            schedule.denorm_spec(out.mel_pred), mel_targets, mel_mask)

    duration_loss = pitch_loss = energy_loss = helper_loss = zero
    if cfg.mode != "shallow":
        duration_loss = masked_mse(out.log_dur_w_pred, log_dur_targets,
                                   out.src_w_mask)
        pitch_loss = masked_mse(out.pitch_pred, pitch_targets, src_mask)
        energy_loss = masked_mse(out.energy_pred, energy_targets, src_mask)

        if cfg.helper_type == "dga":
            attn_raw = out.attn[1]  # [B, H, T, P] before mapping mask
            n_heads = attn_raw.shape[1]
            attn_loss = zero
            for h in range(n_heads):
                attn_loss = attn_loss + guided_attention_loss(
                    attn_raw[:, h], out.src_lens, out.mel_lens,
                    cfg.guided_sigma, cfg.guided_lambda)
            helper_loss = cfg.guided_weight * attn_loss
        elif cfg.helper_type == "ctc":
            lp = out.attn_logprob  # [B, H, T, P]
            n_heads = lp.shape[1]
            ctc = zero
            for h in range(n_heads):
                ctc = ctc + forward_sum_loss(lp[:, h], out.src_lens,
                                             out.mel_lens)
            w = jnp.where(step <= cfg.ctc_step, cfg.ctc_weight_start,
                          cfg.ctc_weight_end)
            helper_loss = w * ctc

    recon_loss = (mel_loss + postnet_loss + cfg.lambda_d * duration_loss
                  + cfg.lambda_p * pitch_loss + cfg.lambda_e * energy_loss
                  + helper_loss)

    fm_loss = zero
    if Ds is not None:
        fm_loss = cfg.lambda_fm * feature_matching_loss(
            *Ds, n_layers=cfg.n_disc_layers)

    return dict(
        fm_loss=fm_loss, recon_loss=recon_loss, mel_loss=mel_loss,
        postnet_loss=postnet_loss, pitch_loss=pitch_loss,
        energy_loss=energy_loss, duration_loss=duration_loss,
        helper_loss=helper_loss,
    )
