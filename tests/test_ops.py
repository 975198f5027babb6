import numpy as np
import jax.numpy as jnp

from mixgantts_tpu.ops import (
    sequence_mask, segment_ids_from_counts, word_level_pooling,
    length_regulate, mapping_mask, rel_position_coef,
)
from mixgantts_tpu.ops.schedules import get_noise_schedule_list


def test_sequence_mask():
    m = sequence_mask(jnp.array([2, 4]), 5)
    np.testing.assert_array_equal(
        np.asarray(m),
        [[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]],
    )


def test_segment_ids():
    counts = jnp.array([[2, 3, 1, 0]])
    seg = np.asarray(segment_ids_from_counts(counts, 8))
    # positions past the total land past every segment end (zero-count
    # trailing segments are skipped: any id >= W is padding either way)
    np.testing.assert_array_equal(seg[0], [0, 0, 1, 1, 1, 2, 4, 4])
    # zero-count segment in the middle is skipped over
    seg2 = np.asarray(segment_ids_from_counts(jnp.array([[2, 0, 3]]), 5))
    np.testing.assert_array_equal(seg2[0], [0, 0, 2, 2, 2])


def test_word_pooling_vs_numpy_oracle():
    rng = np.random.RandomState(0)
    B, P, H, W = 2, 7, 4, 3
    x = rng.randn(B, P, H).astype(np.float32)
    counts = np.array([[2, 3, 2], [4, 1, 0]], dtype=np.int32)
    # zero out padding phonemes like the encoder would
    x[1, 5:] = 0.0
    got = np.asarray(word_level_pooling(jnp.asarray(x), jnp.asarray(counts), W,
                                        reduce="mean"))
    for b in range(B):
        start = 0
        for w, c in enumerate(counts[b]):
            if c == 0:
                np.testing.assert_allclose(got[b, w], 0.0, atol=1e-6)
                continue
            want = x[b, start:start + c].mean(axis=0)
            np.testing.assert_allclose(got[b, w], want, rtol=1e-5, atol=1e-6)
            start += c


def test_length_regulate_vs_numpy_oracle():
    rng = np.random.RandomState(1)
    B, W, H, T = 2, 3, 4, 10
    x = rng.randn(B, W, H).astype(np.float32)
    dur = np.array([[2, 0, 3], [4, 1, 2]], dtype=np.int32)
    frames, mel_len = length_regulate(jnp.asarray(x), jnp.asarray(dur), T)
    frames = np.asarray(frames)
    np.testing.assert_array_equal(np.asarray(mel_len), [5, 7])
    for b in range(B):
        want = np.concatenate([
            np.repeat(x[b, w][None], dur[b, w], axis=0) for w in range(W)
        ], axis=0)
        np.testing.assert_allclose(frames[b, :want.shape[0]], want, rtol=1e-6)
        np.testing.assert_allclose(frames[b, want.shape[0]:], 0.0)


def test_mapping_mask():
    dur_w = jnp.array([[2, 3]])   # word 0: frames 0-1, word 1: frames 2-4
    wb = jnp.array([[1, 2]])      # word 0: phone 0, word 1: phones 1-2
    m = np.asarray(mapping_mask(dur_w, wb, 6, 4, 2))
    want = np.zeros((6, 4), bool)
    want[0:2, 0] = True
    want[2:5, 1:3] = True
    np.testing.assert_array_equal(m[0], want)


def test_rel_position_coef():
    counts = jnp.array([[2, 3, 0]])
    valid = sequence_mask(jnp.array([5]), 6)
    coef = np.asarray(rel_position_coef(counts, 6, valid))
    np.testing.assert_allclose(
        coef[0], [0.0, 0.5, 0.0, 1 / 3, 2 / 3, 0.0], rtol=1e-6)


def test_noise_schedules():
    for mode, mx in [("linear", 0.01), ("cosine", 0.01), ("vpsde", 40)]:
        betas = get_noise_schedule_list(mode, 4, min_beta=0.1, max_beta=mx)
        assert betas.shape == (4,)
        assert np.all(betas > 0) and np.all(betas < 1)
    # vpsde closed form at T=4
    T, mn, mx = 4, 0.1, 40.0
    want = [1 - np.exp(-mn / T - 0.5 * (mx - mn) * (2 * t - 1) / T ** 2)
            for t in range(1, T + 1)]
    np.testing.assert_allclose(
        get_noise_schedule_list("vpsde", T, mn, mx), want, rtol=1e-12)
