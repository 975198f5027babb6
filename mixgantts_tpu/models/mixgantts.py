"""MixGANTTS top-level generator module.

Parity target: `model/mixgantts.py:16-183` in the reference — linguistic
encoder -> (aux/shallow: FFT decoder + mel linear + PostNet -> coarse mel) ->
Gaussian diffusion; speaker embedding table or external-embedding projection;
shallow mode freezes the aux stack by `stop_gradient` on everything it feeds
the diffusion branch (the reference's `_detach`, `model/mixgantts.py:182-183`)
while the postnet output keeps its gradient (it still receives postnet_loss).

Purely functional: conditioning is threaded explicitly (no `self.cond` stash),
randomness comes from the 'diffusion' rng collection, and all shapes are
static with traced lengths + masks (True = valid).
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import NormStats
from ..ops import sequence_mask
from .aux_decoder import Decoder, PostNet
from .denoiser import Denoiser
from .diffusion import DiffusionSchedule
from .linguistic_encoder import LinguisticEncoder


class AuxStage(NamedTuple):
    """Everything the (shallow-mode frozen) aux stack produces: linguistic
    encoder features + FFT-decoder/PostNet coarse mel + speaker embedding,
    plus the encoder side outputs the losses/metrics read.  Returned by
    `MixGANTTS.__call__(aux_only=True)` and accepted back via
    `aux_reuse=` so a train step can run the aux stack ONCE and the
    diffusion branch twice (independent D-phase/G-phase noise draws) —
    see train/step.py `tpu.reuse_aux_forward`."""
    features: jnp.ndarray                    # [B,T,H] encoder output (cond)
    coarse_mel: Optional[jnp.ndarray]        # [B,T,80] raw-scale
    postnet_output: Optional[jnp.ndarray]    # [B,T,80] (= coarse_mel, but
    #                                          kept separate so gradients
    #                                          flow only where they should)
    speaker_emb: Optional[jnp.ndarray]       # [B,H]
    pitch_pred: jnp.ndarray                  # [B,P]
    energy_pred: jnp.ndarray                 # [B,P]
    log_dur_w_pred: jnp.ndarray              # [B,W]
    dur_w_rounded: jnp.ndarray               # [B,W]
    mel_mask: jnp.ndarray                    # [B,T] bool True=valid
    mel_lens: jnp.ndarray                    # [B]
    attn: tuple                              # (masked, raw)
    attn_logprob: jnp.ndarray


class GeneratorOutput(NamedTuple):
    mel_pred: jnp.ndarray                    # train: normalized x0 pred
    #                                          ([B,T,80]; aux: [S+1,B,T,80]
    #                                          diffuse trace); infer: denorm mel
    x_ts: Optional[jnp.ndarray]              # [B,T,80] normalized, masked
    x_t_prevs: Optional[jnp.ndarray]
    x_t_prev_preds: Optional[jnp.ndarray]
    speaker_emb: Optional[jnp.ndarray]       # [B,H]
    diffusion_step: Optional[jnp.ndarray]    # [B]
    pitch_pred: jnp.ndarray                  # [B,P]
    energy_pred: jnp.ndarray                 # [B,P]
    log_dur_w_pred: jnp.ndarray              # [B,W]
    dur_w_rounded: jnp.ndarray               # [B,W]
    src_mask: jnp.ndarray                    # [B,P] bool True=valid
    mel_mask: jnp.ndarray                    # [B,T] bool True=valid
    src_lens: jnp.ndarray
    mel_lens: jnp.ndarray
    attn: tuple                              # (masked, raw)
    attn_logprob: jnp.ndarray
    src_w_mask: jnp.ndarray                  # [B,W]
    postnet_output: Optional[jnp.ndarray]    # [B,T,80] raw-scale coarse mel
    coarse_mel: Optional[jnp.ndarray]        # [B,T,80] (= postnet_output)


def _maybe_stop(x, cond):
    if x is None or not cond:
        return x
    return jax.lax.stop_gradient(x)


class MixGANTTS(nn.Module):
    mode: str                       # 'naive' | 'aux' | 'shallow'
    schedule: DiffusionSchedule
    stats: NormStats
    # architecture (LJSpeech defaults, see configs/*/model.yaml)
    hidden: int = 256
    encoder_layers: int = 4
    encoder_heads: int = 2
    conv_kernel_size: int = 9
    encoder_dropout: float = 0.2
    encoder_window_size: int = 4
    decoder_layers: int = 6
    decoder_heads: int = 2
    decoder_dropout: float = 0.2
    conv_filter_size: int = 1024
    max_seq_len: int = 1000
    n_mels: int = 80
    n_bins: int = 256
    pitch_quantization: str = "linear"
    energy_quantization: str = "linear"
    vp_filter_size: int = 256
    vp_kernel_size: int = 3
    vp_dropout: float = 0.5
    residual_channels: int = 256
    residual_layers: int = 20
    multi_speaker: bool = False
    n_speakers: int = 1
    embedder_type: str = "none"     # 'none' (table) or external embedder name
    external_speaker_dim: int = 512
    # inference-time routing of the denoiser through the fused Pallas
    # residual-stack kernel (ops/pallas.py); training always takes the
    # flax path (the kernel has no custom VJP).  None = auto by batch
    # size (see Denoiser.fused)
    fused_denoiser: Optional[bool] = None

    @classmethod
    def from_configs(cls, mode, preprocess_config, model_config, stats,
                     n_speakers=1):
        """Build from the YAML config triplet + dataset stats."""
        t = model_config["transformer"]
        d = model_config["denoiser"]
        v = model_config["variance_predictor"]
        ve = model_config["variance_embedding"]
        timesteps = d["timesteps"] if mode == "naive" else d["shallow_timesteps"]
        schedule = DiffusionSchedule.create(
            d["noise_schedule_naive"], timesteps, d["min_beta"], d["max_beta"],
            d["s"], stats.spec_min[:d["keep_bins"]],
            stats.spec_max[:d["keep_bins"]])
        return cls(
            mode=mode,
            schedule=schedule,
            stats=stats,
            hidden=t["encoder_hidden"],
            encoder_layers=t["encoder_layer"],
            encoder_heads=t["encoder_head"],
            conv_kernel_size=t["conv_kernel_size"],
            encoder_dropout=t["encoder_dropout"],
            encoder_window_size=t["encoder_window_size"],
            decoder_layers=t["decoder_layer"],
            decoder_heads=t["decoder_head"],
            decoder_dropout=t["decoder_dropout"],
            conv_filter_size=t["conv_filter_size"],
            max_seq_len=model_config["max_seq_len"],
            n_mels=preprocess_config["preprocessing"]["mel"]["n_mel_channels"],
            n_bins=ve["n_bins"],
            pitch_quantization=ve["pitch_quantization"],
            energy_quantization=ve["energy_quantization"],
            vp_filter_size=v["filter_size"],
            vp_kernel_size=v["kernel_size"],
            vp_dropout=v["dropout"],
            residual_channels=d["residual_channels"],
            residual_layers=d["residual_layers"],
            multi_speaker=model_config["multi_speaker"],
            n_speakers=n_speakers,
            embedder_type=preprocess_config["preprocessing"].get(
                "speaker_embedder", "none"),
            external_speaker_dim=model_config.get("external_speaker_dim", 512),
            fused_denoiser=d.get("fused"),  # None = Denoiser's auto rule
        )

    @nn.compact
    def __call__(
        self,
        speakers,            # [B] int
        texts,               # [B, P]
        src_lens,            # [B]
        word_boundaries,     # [B, W]
        src_w_lens,          # [B]
        max_mel_len,         # static int
        mels=None,           # [B, T, n_mels] raw-scale or None (inference)
        mel_lens=None,       # [B] or None
        attn_priors=None,    # [B, P, T] or None
        p_targets=None,
        e_targets=None,
        d_targets=None,
        spker_embeds=None,   # [B, external_dim] or None
        p_control=1.0,
        e_control=1.0,
        d_control=1.0,
        train=False,
        return_trace=False,  # inference only: mel_pred = full [S+1,...] trace
        noise_override=None,  # dict of injected diffusion randomness (below)
        aux_only=False,      # return the AuxStage (no diffusion branch)
        aux_reuse=None,      # AuxStage: skip enc/decoder/postnet, run only
        #                      the diffusion branch on these activations
    ):
        # noise_override makes every diffusion draw deterministic (parity
        # tests vs the torch reference, reproducible synthesis).  Keys —
        # training: 't' [B] int, 'x_t_noise'/'x_t_prev_noise'/
        # 'posterior_noise' [B,T,M]; inference: 'start_noise' [B,T,M]
        # (naive: the initial x_T; shallow: the diffuse-to-x_{T-1} noise
        # applied to the coarse mel) and 'step_noises' [S,B,T,M].
        shallow = self.mode == "shallow"
        if max_mel_len > self.max_seq_len:
            raise ValueError(
                f"max_mel_len={max_mel_len} exceeds max_seq_len="
                f"{self.max_seq_len}; raise model.yaml max_seq_len (the "
                f"positional tables are sized by it) or add a smaller "
                f"length bucket")
        B, P = texts.shape
        src_mask = sequence_mask(src_lens, P)
        src_w_mask = sequence_mask(src_w_lens, word_boundaries.shape[1])
        mel_mask = (sequence_mask(mel_lens, max_mel_len)
                    if mel_lens is not None else None)

        if aux_reuse is not None:
            aux = aux_reuse
        else:
            aux = self._aux_stage(
                speakers, texts, src_lens, word_boundaries, src_w_lens,
                max_mel_len, mel_mask, attn_priors, p_targets, e_targets,
                d_targets, spker_embeds, p_control, d_control, train)
        if aux_only:
            return aux
        output = aux.features
        mel_mask = aux.mel_mask
        mel_len = aux.mel_lens
        speaker_emb = aux.speaker_emb
        coarse_mel = aux.coarse_mel
        postnet_output = aux.postnet_output

        denoiser = Denoiser(
            n_mels=self.n_mels,
            d_encoder=self.hidden,
            residual_channels=self.residual_channels,
            residual_layers=self.residual_layers,
            multi_speaker=self.multi_speaker,
            fused=self.fused_denoiser if mels is None else False,
            name="denoiser",
        )

        x_ts = x_t_prevs = x_t_prev_preds = t_step = None
        sched = self.schedule
        maskf = mel_mask[..., None].astype(output.dtype)

        if self.mode == "aux":
            if self.is_initializing():
                # create denoiser params even though aux never runs it:
                # the reference's aux checkpoint carries the (random)
                # denoiser weights that shallow training restores from
                # (`utils/model.py:18-29`, aux->shallow handoff)
                t0 = jnp.zeros((B,), dtype=jnp.int32)
                denoiser(jnp.zeros_like(coarse_mel), t0, output, speaker_emb)
            rng = self.make_rng("diffusion")
            mel_pred = sched.diffuse_trace(rng, coarse_mel, mel_mask)
        else:
            cond = _maybe_stop(output, shallow)
            spk = _maybe_stop(speaker_emb, shallow)
            coarse_in = _maybe_stop(coarse_mel, shallow)

            def denoise_fn(x, t, c, s):
                return denoiser(x, t, c, s)

            ov = noise_override or {}
            if mels is None:
                # ---- inference: few-step reverse process -------------------
                rng = self.make_rng("diffusion")
                if shallow:
                    rng, sub = jax.random.split(rng)
                    t_start = jnp.full((B,), sched.num_timesteps - 1,
                                       dtype=jnp.int32)
                    noise0 = ov.get("start_noise")
                    if noise0 is None:
                        noise0 = jax.random.normal(sub, coarse_in.shape,
                                                   dtype=output.dtype)
                    start = sched.diffuse(coarse_in, t_start, noise0) * maskf
                else:
                    start = ov.get("start_noise")
                x0 = sched.sampling(denoise_fn, rng, cond, spk, noise=start,
                                    return_trace=return_trace,
                                    step_noises=ov.get("step_noises"))
                mel_pred = sched.denorm_spec(x0) * (
                    maskf[None] if return_trace else maskf)
            else:
                # ---- training: one random step -----------------------------
                rng = self.make_rng("diffusion")
                rngs = jax.random.split(rng, 4)
                t_step = ov.get("t")
                if t_step is None:
                    t_step = jax.random.randint(
                        rngs[0], (B,), 0, sched.num_timesteps)
                n1 = ov.get("x_t_noise")
                if n1 is None:
                    n1 = jax.random.normal(rngs[1], mels.shape,
                                           dtype=output.dtype)
                n2 = ov.get("x_t_prev_noise")
                if n2 is None:
                    n2 = jax.random.normal(rngs[2], mels.shape,
                                           dtype=output.dtype)
                x_ts = sched.diffuse(mels, t_step, n1) * maskf
                x_t_prevs = sched.diffuse(mels, t_step - 1, n2) * maskf
                x0_pred = denoise_fn(x_ts, t_step, cond, spk) * maskf
                x0_pred = jnp.clip(x0_pred, -1.0, 1.0)
                if shallow:
                    x_start = sched.norm_spec(coarse_in)
                else:
                    x_start = x0_pred
                n3 = ov.get("posterior_noise")
                if n3 is None:
                    n3 = jax.random.normal(rngs[3], mels.shape,
                                           dtype=output.dtype)
                x_t_prev_preds = sched.q_posterior_sample(
                    x_start, x_ts, t_step, n3) * maskf
                mel_pred = x0_pred

        stop_aux = shallow
        return GeneratorOutput(
            mel_pred=mel_pred,
            x_ts=x_ts,
            x_t_prevs=x_t_prevs,
            x_t_prev_preds=x_t_prev_preds,
            speaker_emb=_maybe_stop(speaker_emb, stop_aux),
            diffusion_step=t_step,
            pitch_pred=aux.pitch_pred,
            energy_pred=_maybe_stop(aux.energy_pred, stop_aux),
            log_dur_w_pred=aux.log_dur_w_pred,
            dur_w_rounded=_maybe_stop(aux.dur_w_rounded, stop_aux),
            src_mask=src_mask,
            mel_mask=mel_mask,
            src_lens=src_lens,
            mel_lens=mel_len,
            attn=aux.attn,
            attn_logprob=aux.attn_logprob,
            src_w_mask=src_w_mask,
            postnet_output=postnet_output,
            coarse_mel=_maybe_stop(coarse_mel, stop_aux),
        )

    def _aux_stage(self, speakers, texts, src_lens, word_boundaries,
                   src_w_lens, max_mel_len, mel_mask, attn_priors,
                   p_targets, e_targets, d_targets, spker_embeds,
                   p_control, d_control, train):
        """Linguistic encoder -> (aux/shallow: FFT decoder + PostNet) ->
        AuxStage.  In shallow mode this is the (mostly frozen) stack the
        diffusion branch conditions on; factored out so the train step can
        run it once per step (`tpu.reuse_aux_forward`)."""
        enc = LinguisticEncoder(
            hidden=self.hidden,
            n_layers=self.encoder_layers,
            n_heads=self.encoder_heads,
            conv_kernel_size=self.conv_kernel_size,
            dropout=self.encoder_dropout,
            window_size=self.encoder_window_size,
            max_seq_len=self.max_seq_len,
            n_bins=self.n_bins,
            pitch_range=(self.stats.pitch_min, self.stats.pitch_max),
            energy_range=(self.stats.energy_min, self.stats.energy_max),
            pitch_quantization=self.pitch_quantization,
            energy_quantization=self.energy_quantization,
            vp_filter_size=self.vp_filter_size,
            vp_kernel_size=self.vp_kernel_size,
            vp_dropout=self.vp_dropout,
            name="linguistic_encoder",
        )(
            texts, src_lens, word_boundaries, src_w_lens, max_mel_len,
            mel_mask=mel_mask, attn_prior=attn_priors,
            pitch_target=p_targets, energy_target=e_targets,
            duration_target=d_targets, p_control=p_control,
            d_control=d_control, train=train,
        )
        output = enc.features
        mel_mask = enc.mel_mask
        mel_len = enc.mel_len

        speaker_emb = None
        if self.multi_speaker:
            if self.embedder_type == "none":
                speaker_emb = nn.Embed(
                    self.n_speakers, self.hidden, name="speaker_emb")(speakers)
            else:
                assert spker_embeds is not None, \
                    "external speaker embedding required"
                speaker_emb = nn.Dense(
                    self.hidden, name="speaker_proj")(spker_embeds)

        coarse_mel = postnet_output = None
        if self.mode in ("aux", "shallow"):
            dec = Decoder(
                hidden=self.hidden, n_layers=self.decoder_layers,
                n_heads=self.decoder_heads, d_inner=self.conv_filter_size,
                kernel_size=self.conv_kernel_size,
                dropout=self.decoder_dropout, max_seq_len=self.max_seq_len,
                name="decoder",
            )(output, mel_mask, train=train)
            coarse = nn.Dense(self.n_mels, name="mel_linear")(dec)
            postnet_output = coarse + PostNet(
                n_mels=self.n_mels, name="postnet")(coarse, train=train)
            coarse_mel = postnet_output

        return AuxStage(
            features=output,
            coarse_mel=coarse_mel,
            postnet_output=postnet_output,
            speaker_emb=speaker_emb,
            pitch_pred=enc.pitch_pred,
            energy_pred=enc.energy_pred,
            log_dur_w_pred=enc.log_dur_w_pred,
            dur_w_rounded=enc.dur_w_rounded,
            mel_mask=mel_mask,
            mel_lens=mel_len,
            attn=enc.attn,
            attn_logprob=enc.attn_logprob,
        )
