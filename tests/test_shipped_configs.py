"""The shipped LJSpeech / AISHELL3 yaml triplets stay loadable and build
real models (schema drift in configs/ breaks users before code does)."""

import jax
import numpy as np
import pytest

from mixgantts_tpu.config import NormStats, get_configs_of
from mixgantts_tpu.models.discriminator import JCUDiscriminator
from mixgantts_tpu.models.mixgantts import MixGANTTS


@pytest.mark.parametrize("dataset", ["LJSpeech", "AISHELL3"])
def test_shipped_config_builds_model(dataset):
    pre, mc, tc = get_configs_of(dataset)
    stats = NormStats.default(
        n_mels=pre["preprocessing"]["mel"]["n_mel_channels"])
    for mode in ("naive", "aux", "shallow"):
        model = MixGANTTS.from_configs(mode, pre, mc, stats, n_speakers=4)
        assert model.schedule.num_timesteps >= 1
        if mode == "naive":
            assert model.schedule.num_timesteps == mc["denoiser"]["timesteps"]
        else:
            assert (model.schedule.num_timesteps
                    == mc["denoiser"]["shallow_timesteps"])
    d = mc["discriminator"]
    JCUDiscriminator(
        n_mels=pre["preprocessing"]["mel"]["n_mel_channels"],
        residual_channels=mc["denoiser"]["residual_channels"],
        n_channels=tuple(d["n_channels"]),
        kernel_sizes=tuple(d["kernel_sizes"]),
        strides=tuple(d["strides"]))
    # training schedule keys the loop depends on
    for key in ("total_step_aux", "total_step_naive", "total_step_shallow",
                "log_step", "synth_step", "val_step", "save_step"):
        assert key in tc["step"], key
    assert tc["loss"]["adv_loss_mode"] == "lsgan"
    buckets = mc["tpu"]["length_buckets"]
    assert buckets == sorted(buckets)
    assert buckets[-1] <= mc["max_seq_len"]


def test_unknown_dataset_errors():
    with pytest.raises(FileNotFoundError, match="NoSuch"):
        get_configs_of("NoSuch")


@pytest.mark.parametrize("key,bogus", [
    ("adv_loss_mode", "hinge"),
    ("noise_loss", "l2"),
    ("dur_loss", "l1"),
    ("pitch_loss", "mse"),
])
def test_bogus_loss_config_fails_loudly(key, bogus):
    """Loss-selection keys requesting unimplemented behavior must raise at
    step-build time, not silently run the defaults (VERDICT r1 #6; the
    reference raises only for adv_loss_mode, `model/loss.py:32-37`)."""
    from mixgantts_tpu.losses import LossConfig

    pre, mc, tc = get_configs_of("LJSpeech")
    tc["loss"][key] = bogus
    with pytest.raises(NotImplementedError, match=key if key ==
                       "adv_loss_mode" else bogus):
        LossConfig.from_configs("naive", mc, tc)


def test_shipped_loss_config_validates():
    from mixgantts_tpu.losses import LossConfig

    for dataset in ("LJSpeech", "AISHELL3"):
        pre, mc, tc = get_configs_of(dataset)
        for mode in ("naive", "aux", "shallow"):
            cfg = LossConfig.from_configs(mode, mc, tc)
            assert cfg.adv_loss_mode == "lsgan"
