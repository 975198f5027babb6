import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixgantts_tpu.config import NormStats
from mixgantts_tpu.models.diffusion import DiffusionSchedule
from mixgantts_tpu.models.mixgantts import MixGANTTS
from mixgantts_tpu.models.discriminator import JCUDiscriminator


def tiny_model(mode, multi_speaker=False):
    stats = NormStats.default(n_mels=16)
    schedule = DiffusionSchedule.create(
        "vpsde", 4, 0.1, 40, 0.008, stats.spec_min, stats.spec_max)
    return MixGANTTS(
        mode=mode, schedule=schedule, stats=stats,
        hidden=32, encoder_layers=1, encoder_heads=2, conv_kernel_size=3,
        decoder_layers=1, decoder_heads=2, conv_filter_size=64,
        max_seq_len=64, n_mels=16, n_bins=8, residual_channels=16,
        residual_layers=2, multi_speaker=multi_speaker, n_speakers=4,
    )


def tiny_batch(rng=0, B=2, P=6, W=3, T=12):
    r = np.random.RandomState(rng)
    return dict(
        speakers=jnp.array([0, 1]),
        texts=jnp.asarray(r.randint(1, 50, (B, P))),
        src_lens=jnp.array([P, P - 2]),
        word_boundaries=jnp.array([[2, 2, 2], [2, 2, 0]]),
        src_w_lens=jnp.array([W, W - 1]),
        max_mel_len=T,
        mels=jnp.asarray(r.randn(B, T, 16).astype(np.float32)),
        mel_lens=jnp.array([T, T - 4]),
        p_targets=jnp.asarray(r.randn(B, P).astype(np.float32)),
        e_targets=jnp.asarray(r.randn(B, P).astype(np.float32)),
        d_targets=jnp.array([[2, 2, 2, 2, 2, 2], [2, 2, 2, 2, 0, 0]]),
    )


RNGS = dict(params=jax.random.PRNGKey(0),
            dropout=jax.random.PRNGKey(1),
            diffusion=jax.random.PRNGKey(2))


@pytest.mark.parametrize("mode", ["naive", "aux", "shallow"])
def test_training_forward(mode):
    model = tiny_model(mode)
    batch = tiny_batch()
    variables = model.init(RNGS, **batch, train=False)
    out, _ = model.apply(
        variables, **batch, train=True,
        rngs={k: v for k, v in RNGS.items() if k != "params"},
        mutable=["batch_stats"])
    B, T, M = 2, 12, 16
    if mode == "aux":
        assert out.mel_pred.shape == (5, B, T, M)  # trace: x0 + 4 steps
    else:
        assert out.mel_pred.shape == (B, T, M)
        assert out.x_ts.shape == (B, T, M)
        assert out.x_t_prev_preds.shape == (B, T, M)
        assert out.diffusion_step.shape == (B,)
    assert out.pitch_pred.shape == (B, 6)
    assert out.log_dur_w_pred.shape == (B, 3)
    assert np.isfinite(np.asarray(out.mel_pred)).all()
    # mel mask comes from the given mel_lens in teacher-forced mode
    np.testing.assert_array_equal(np.asarray(out.mel_mask.sum(-1)), [12, 8])


@pytest.mark.parametrize("mode", ["naive", "shallow"])
def test_inference_forward(mode):
    model = tiny_model(mode)
    batch = tiny_batch()
    variables = model.init(RNGS, **batch, train=False)
    infer = {k: v for k, v in batch.items()
             if k not in ("mels", "mel_lens", "p_targets", "e_targets",
                          "d_targets")}
    infer["max_mel_len"] = 24
    out = model.apply(
        variables, **infer, train=False,
        rngs={"diffusion": jax.random.PRNGKey(3)})
    assert out.mel_pred.shape == (2, 24, 16)
    assert np.isfinite(np.asarray(out.mel_pred)).all()
    # predicted durations determine mel_lens
    assert (np.asarray(out.mel_lens) <= 24).all()


def test_multi_speaker_table():
    model = tiny_model("naive", multi_speaker=True)
    batch = tiny_batch()
    variables = model.init(RNGS, **batch, train=False)
    out = model.apply(variables, **batch, train=False,
                      rngs={"diffusion": jax.random.PRNGKey(3)})
    assert out.speaker_emb.shape == (2, 32)


def test_discriminator_shapes():
    disc = JCUDiscriminator(n_mels=16, residual_channels=16,
                            n_channels=(8, 16, 32, 16, 1))
    B, T = 2, 12
    r = np.random.RandomState(0)
    x_ts = jnp.asarray(r.randn(B, T, 16).astype(np.float32))
    x_prev = jnp.asarray(r.randn(B, T, 16).astype(np.float32))
    t = jnp.array([0, 3])
    variables = disc.init(jax.random.PRNGKey(0), x_ts, x_prev, None, t)
    cond, uncond = disc.apply(variables, x_ts, x_prev, None, t)
    assert len(cond) == 5 and len(uncond) == 5
    assert cond[-1].shape[-1] == 1  # logits
    # stride 2 twice -> T/4 at the logit layer
    assert cond[-1].shape[1] == T // 4


def test_diffusion_schedule_math():
    sched = DiffusionSchedule.create(
        "vpsde", 4, 0.1, 40, 0.008, [-1.0] * 4, [1.0] * 4)
    x = jnp.ones((1, 3, 4)) * 0.5
    # t = -1 returns the normalized ground truth
    noise = jnp.ones_like(x)
    out = sched.diffuse(x, jnp.array([-1]), noise)
    np.testing.assert_allclose(np.asarray(out), np.asarray(sched.norm_spec(x)),
                               rtol=1e-6)
    # norm/denorm roundtrip
    np.testing.assert_allclose(
        np.asarray(sched.denorm_spec(sched.norm_spec(x))), np.asarray(x),
        rtol=1e-5)
    # t = 0 posterior sample has no noise term
    x0 = jnp.zeros((1, 3, 4))
    xt = jnp.ones((1, 3, 4))
    a = sched.q_posterior_sample(x0, xt, jnp.array([0]), jnp.ones_like(x0))
    b = sched.q_posterior_sample(x0, xt, jnp.array([0]), jnp.zeros_like(x0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
