"""TensorBoard logging with the reference's exact scalar tags and cadence
(`utils/tools.py:113-142`), via tensorboardX."""

import numpy as np

LOSS_KEYS = [
    "total_loss", "D_loss", "G_loss", "recon_loss", "fm_loss", "adv_loss",
    "mel_loss", "postnet_loss", "pitch_loss", "energy_loss",
    "duration_loss", "helper_loss",
]

MESSAGE_KEYS = [
    "total_loss", "D_loss", "adv_loss", "mel_loss", "postnet_loss",
    "pitch_loss", "energy_loss", "duration_loss", "helper_loss",
]


def get_writer(log_dir):
    from tensorboardX import SummaryWriter
    return SummaryWriter(log_dir)


def log(logger, step=None, losses=None, lr=None, figs=None, audio=None,
        sampling_rate=22050, tag=""):
    if losses is not None:
        for key in LOSS_KEYS:
            logger.add_scalar(f"Loss/{key}", float(losses[key]), step)
    if lr is not None:
        logger.add_scalar("Training/learning_rate", lr, step)
    if figs is not None:
        logger.add_figure(tag, figs, step)
    if audio is not None:
        audio = np.asarray(audio, dtype=np.float64)
        logger.add_audio(tag, audio / (np.abs(audio).max() + 1e-9), step,
                         sample_rate=sampling_rate)


def loss_message(step, total_step, losses):
    """The reference's console/log.txt line format (`train.py:189-199`)."""
    vals = [float(losses[k]) for k in MESSAGE_KEYS]
    return (
        f"Step {step}/{total_step}, "
        "Total Loss: {:.4f}, D_loss: {:.4f}, adv_loss: {:.4f}, "
        "mel_loss: {:.4f}, postnet_loss: {:.4f}, pitch_loss: {:.4f}, "
        "energy_loss: {:.4f}, duration_loss: {:.4f}, helper_loss:{:.4f}"
        .format(*vals))
