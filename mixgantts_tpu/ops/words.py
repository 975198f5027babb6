"""Word/phoneme/frame sequence ops, fully vectorized for XLA.

These replace the reference's per-item Python loops with gather/one-hot-matmul
formulations that tile onto the MXU and compile to static-shape XLA:

- `word_level_pooling`  <- `utils/tools.py:394-413` (pad_sequence + split loop)
- `length_regulate`     <- `model/linguistic_encoder.py:383-416` (.expand loop)
- `mapping_mask`        <- `model/linguistic_encoder.py:185-199` (block loop)
- `rel_position_coef`   <- `model/linguistic_encoder.py:222-236` (repeat loop)

All are functions of duration cumsums; everything is broadcast comparisons and
batched matmuls (SURVEY.md section 7 "hard parts").
"""

import jax
import jax.numpy as jnp


def segment_ids_from_counts(counts, out_len):
    """Map positions to their segment index given per-segment counts.

    counts  -- [B, W] int, number of elements in each segment (0 for padding)
    out_len -- static int, length of the flattened position axis

    Returns [B, out_len] int32: for each position p, the index of the segment
    it belongs to (positions beyond the total count get index W, i.e. one past
    the last segment — mask with a sequence mask before use).
    """
    ends = jnp.cumsum(counts.astype(jnp.int32), axis=-1)  # [B, W] inclusive
    pos = jnp.arange(out_len, dtype=jnp.int32)[None, :, None]  # [1, L, 1]
    # segment id = number of segment-ends <= position
    return jnp.sum(pos >= ends[:, None, :], axis=-1).astype(jnp.int32)


def word_level_pooling(x, counts, n_words, reduce="mean"):
    """Pool phoneme-level features into word-level features.

    x       -- [B, P, H] phoneme features (padding positions must be zero or
               masked out by the caller's encoder; they are excluded here too)
    counts  -- [B, W] phones per word (word_boundaries)
    n_words -- static int W (output length)

    Implemented as a one-hot [B, W, P] matmul so the reduction runs on the
    MXU rather than as a scatter.
    """
    B, P, _ = x.shape
    seg = segment_ids_from_counts(counts, P)  # [B, P]
    one_hot = (seg[:, None, :] == jnp.arange(n_words, dtype=jnp.int32)[None, :, None])
    one_hot = one_hot.astype(x.dtype)  # [B, W, P]
    # HIGHEST precision: the one-hot matmul is a selection/sum, and pooled
    # features feed the parity-sensitive mel path; the op is tiny.
    pooled = jnp.einsum("bwp,bph->bwh", one_hot, x,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32).astype(x.dtype)
    if reduce == "sum":
        return pooled
    if reduce == "mean":
        denom = jnp.maximum(counts.astype(x.dtype), 1.0)[:, :, None]
        return pooled / denom
    raise ValueError(reduce)


def length_regulate(x, durations, max_len):
    """Expand word states by integer durations to frame states.

    x         -- [B, W, H] word features
    durations -- [B, W] int frames per word
    max_len   -- static int output frame axis length

    Returns (frames [B, max_len, H], mel_len [B]).  Frames past the total
    duration are zeroed.
    """
    seg = segment_ids_from_counts(durations, max_len)  # [B, T] word id per frame
    mel_len = jnp.sum(durations.astype(jnp.int32), axis=-1)
    W = x.shape[1]
    gather_ids = jnp.clip(seg, 0, W - 1)
    frames = jnp.take_along_axis(x, gather_ids[:, :, None], axis=1)
    valid = (jnp.arange(max_len, dtype=jnp.int32)[None, :] < mel_len[:, None])
    frames = frames * valid[:, :, None].astype(x.dtype)
    return frames, mel_len


def mapping_mask(dur_w, wb, n_frames, n_phones, n_words):
    """Word-to-phoneme attention mapping mask.

    True where frame f and phoneme p belong to the same word (and both are
    within their word ranges).  dur_w -- [B, W] frames per word; wb -- [B, P']
    phones per word (P' is the word axis of word_boundaries, same W).
    """
    frame_word = segment_ids_from_counts(dur_w, n_frames)   # [B, T]
    phone_word = segment_ids_from_counts(wb, n_phones)      # [B, P]
    same = frame_word[:, :, None] == phone_word[:, None, :]
    in_range = (frame_word[:, :, None] < n_words) & (phone_word[:, None, :] < n_words)
    return same & in_range


def rel_position_coef(counts, out_len, valid_mask):
    """Intra-segment relative position in [0, 1) for each position.

    coef[b, p] = (p - segment_start) / segment_length, 0 on padding.
    Matches the reference's `get_rel_coef` (idx / repeated-lengths with
    padding divided by 1).
    """
    counts = counts.astype(jnp.int32)
    seg = segment_ids_from_counts(counts, out_len)  # [B, L]
    W = counts.shape[1]
    gather_ids = jnp.clip(seg, 0, W - 1)
    starts = jnp.cumsum(counts, axis=-1) - counts  # exclusive cumsum [B, W]
    seg_start = jnp.take_along_axis(starts, gather_ids, axis=1)
    seg_len = jnp.take_along_axis(counts, gather_ids, axis=1)
    pos = jnp.arange(out_len, dtype=jnp.int32)[None, :]
    coef = (pos - seg_start).astype(jnp.float32) / jnp.maximum(
        seg_len.astype(jnp.float32), 1.0)
    return coef * valid_mask.astype(jnp.float32)
