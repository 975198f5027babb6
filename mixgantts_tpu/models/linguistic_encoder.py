"""Linguistic encoder: phoneme encoder -> variance predictors -> word pooling
-> word encoder -> word-level length regulator -> word-to-phoneme attention.

Behavior parity with `model/linguistic_encoder.py:238-380` in the reference,
re-designed TPU-first: the word pooling / length regulation / mapping mask /
relative-position coefficients are the vectorized ops from
`mixgantts_tpu.ops.words` (no Python loops), and all shapes are static — the
output frame axis is always `max_mel_len` with a traced `mel_len` + mask.
"""

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import (
    sequence_mask, word_level_pooling, length_regulate, mapping_mask,
    rel_position_coef,
)
from ..text.symbols import symbols
from .blocks import (
    RelativeFFTBlock, VariancePredictor, WordToPhonemeAttention,
    sinusoid_position_table,
)


class LinguisticEncoderOutput(NamedTuple):
    features: jnp.ndarray            # [B, T_mel, H] frame-level conditioning
    pitch_pred: jnp.ndarray          # [B, P] phoneme-level
    energy_pred: jnp.ndarray         # [B, P]
    log_dur_w_pred: jnp.ndarray      # [B, W] word-level log-durations
    dur_w_rounded: jnp.ndarray       # [B, W] int word durations (frames)
    mel_len: jnp.ndarray             # [B]
    mel_mask: jnp.ndarray            # [B, T_mel] bool True=valid
    attn: tuple                      # (masked, raw) [B, H, T_mel, P]
    attn_logprob: jnp.ndarray        # [B, H, T_mel, P]


class LinguisticEncoder(nn.Module):
    hidden: int = 256
    n_layers: int = 4
    n_heads: int = 2
    conv_kernel_size: int = 9
    dropout: float = 0.2
    window_size: int = 4
    max_seq_len: int = 1000
    n_bins: int = 256
    # (min, max) used to build the variance embedding bin boundaries; from
    # stats.json via NormStats (linear quantization; 'log' also supported)
    pitch_range: tuple = (-2.0, 10.0)
    energy_range: tuple = (-1.5, 8.0)
    pitch_quantization: str = "linear"
    energy_quantization: str = "linear"
    vp_filter_size: int = 256
    vp_kernel_size: int = 3
    vp_dropout: float = 0.5

    def _bins(self, lo, hi, quantization):
        if quantization == "log":
            return jnp.asarray(
                np.exp(np.linspace(np.log(lo), np.log(hi), self.n_bins - 1)),
                dtype=jnp.float32)
        return jnp.asarray(np.linspace(lo, hi, self.n_bins - 1),
                           dtype=jnp.float32)

    @nn.compact
    def __call__(
        self,
        texts,                 # [B, P] int phoneme ids
        src_p_len,             # [B]
        word_boundary,         # [B, W] phones per word
        src_w_len,             # [B]
        max_mel_len,           # static int: frame-axis length of the output
        mel_mask=None,         # [B, T_mel] bool (teacher-forced) or None
        attn_prior=None,       # [B, P, T_mel] or None (ctc helper)
        pitch_target=None,
        energy_target=None,
        duration_target=None,  # [B, P] phoneme-level int frames
        p_control=1.0,
        d_control=1.0,
        train=False,
    ):
        B, P = texts.shape
        W = word_boundary.shape[1]
        H = self.hidden

        src_p_mask = sequence_mask(src_p_len, P)        # [B, P] True=valid
        src_w_mask = sequence_mask(src_w_len, W)

        # --- phoneme encoding ------------------------------------------------
        emb = nn.Embed(
            len(symbols) + 1, H,
            embedding_init=nn.initializers.normal(1.0), name="src_emb")(texts)
        # zero the padding id (reference uses padding_idx=0)
        emb = emb * (texts > 0)[..., None]
        pmask_f = src_p_mask[..., None].astype(emb.dtype)
        enc_p = RelativeFFTBlock(
            H, self.n_heads, self.n_layers, self.conv_kernel_size,
            self.dropout, self.window_size, name="phoneme_encoder",
        )(emb, pmask_f, train=train)

        # --- phoneme-level pitch / energy ------------------------------------
        pitch_pred = VariancePredictor(
            self.vp_filter_size, self.vp_kernel_size, self.vp_dropout,
            name="pitch_predictor")(enc_p, src_p_mask, train=train)
        pitch_bins = self._bins(*self.pitch_range, self.pitch_quantization)
        if pitch_target is not None:
            pitch_val = pitch_target
        else:
            pitch_pred = pitch_pred * p_control
            pitch_val = pitch_pred
        pitch_emb = nn.Embed(self.n_bins, H, name="pitch_embedding")(
            jnp.digitize(pitch_val, pitch_bins))
        enc_p = enc_p + pitch_emb

        energy_pred = VariancePredictor(
            self.vp_filter_size, self.vp_kernel_size, self.vp_dropout,
            name="energy_predictor")(enc_p, src_p_mask, train=train)
        energy_bins = self._bins(*self.energy_range, self.energy_quantization)
        if energy_target is not None:
            energy_val = energy_target
        else:
            # NOTE: the reference scales the energy prediction by p_control
            # too (`linguistic_encoder.py:268-271` passes p_control to
            # get_energy_embedding and e_control is never wired through);
            # we reproduce the interface but keep the same behavior.
            energy_pred = energy_pred * p_control
            energy_val = energy_pred
        energy_emb = nn.Embed(self.n_bins, H, name="energy_embedding")(
            jnp.digitize(energy_val, energy_bins))
        enc_p = enc_p + energy_emb
        # NOTE: no re-masking here — the reference leaves the pitch/energy
        # embeddings in place at padded positions (`linguistic_encoder.py:
        # 263-283`), and the k=3 predictor convs read them at boundaries;
        # masking would change predictions at valid positions near the edge.
        # Word pooling is safe: padded positions map past the last segment.

        # --- word encoding ---------------------------------------------------
        src_w_seq = word_level_pooling(enc_p, word_boundary, W, reduce="mean")
        wmask_f = src_w_mask[..., None].astype(enc_p.dtype)
        enc_w = RelativeFFTBlock(
            H, self.n_heads, self.n_layers, self.conv_kernel_size,
            self.dropout, self.window_size, name="word_encoder",
        )(src_w_seq, wmask_f, train=train)

        # --- durations -------------------------------------------------------
        log_dur_p = VariancePredictor(
            self.vp_filter_size, self.vp_kernel_size, self.vp_dropout,
            name="duration_predictor")(enc_p, src_p_mask, train=train)
        # word-level pooling in the exp domain then back to log
        dur_w_sum = word_level_pooling(
            jnp.exp(log_dur_p)[..., None], word_boundary, W, reduce="sum")[..., 0]
        log_dur_w_pred = jnp.log(jnp.maximum(dur_w_sum, 1e-8))
        log_dur_w_pred = log_dur_w_pred * src_w_mask

        if duration_target is not None:
            dur_w = word_level_pooling(
                duration_target[..., None].astype(jnp.float32), word_boundary,
                W, reduce="sum")[..., 0]
            dur_w = jnp.round(dur_w).astype(jnp.int32)
        else:
            dur_w = jnp.clip(
                jnp.round((jnp.exp(log_dur_w_pred) - 1) * d_control),
                0, None).astype(jnp.int32)
            dur_w = dur_w * src_w_mask
        # cap total duration at the static frame axis so downstream masks
        # stay consistent when predictions overflow max_mel_len
        x, mel_len = length_regulate(enc_w, dur_w, max_mel_len)
        mel_len = jnp.minimum(mel_len, max_mel_len)
        if mel_mask is None:
            # covers both inference and teacher-forced synthesis (duration
            # targets given but no mels)
            mel_mask = sequence_mask(mel_len, max_mel_len)

        # --- word-to-phoneme attention ---------------------------------------
        map_mask = mapping_mask(dur_w, word_boundary, max_mel_len, P, W)

        pos_table = sinusoid_position_table(self.max_seq_len + 1, H)
        q_pos = self.param("q_position_enc", lambda *_: jnp.asarray(pos_table),
                           pos_table.shape)
        kv_pos = self.param("kv_position_enc", lambda *_: jnp.asarray(pos_table),
                            pos_table.shape)

        q_coef = rel_position_coef(dur_w, max_mel_len, mel_mask)
        kv_coef = rel_position_coef(word_boundary, P, src_p_mask)
        q = x + q_coef[..., None] * q_pos[None, :max_mel_len, :]
        k = enc_p + kv_coef[..., None] * kv_pos[None, :P, :]
        v = k

        features, attns, attn_logprob = WordToPhonemeAttention(
            self.n_heads, H, name="w2p_attn",
        )(q, k, v, key_mask=src_p_mask, query_mask=mel_mask,
          map_mask=map_mask, attn_prior=attn_prior, train=train)

        return LinguisticEncoderOutput(
            features=features,
            pitch_pred=pitch_pred,
            energy_pred=energy_pred,
            log_dur_w_pred=log_dur_w_pred,
            dur_w_rounded=dur_w,
            mel_len=mel_len,
            mel_mask=mel_mask,
            attn=attns,
            attn_logprob=attn_logprob,
        )
