"""Sample synthesis for logging and the synthesize CLI.

Parity targets: `utils/tools.py:162-262` — `synth_one_sample` renders the
diffusion trajectory / GT / coarse panels + the W2P attention figure and
vocodes reconstruction vs prediction; `synth_samples` writes
{basename}.png/.wav per item into result_path/{restore_step}.
"""

import os

import jax
import numpy as np

from ..models.vocoder import vocoder_infer
from .plotting import plot_mel, plot_multi_attn
from ..audio.wav import save_wav


def synth_one_sample(mode, batch, out, trace, vocoder, model_config,
                     preprocess_config, schedule):
    """One training batch + a fresh inference `trace` ([S+1, B, T, M]
    denormalized for GAN modes, or the aux diffuse trace) -> figures + wavs.

    Returns (figs, attn_fig, wav_reconstruction, wav_prediction, basename).
    """
    basename = batch["ids"][0]
    src_len = int(out.src_lens[0])
    mel_len = int(out.mel_lens[0])
    mel_target = np.asarray(batch["mels"])[0, :mel_len].T
    alignment = np.asarray(out.attn[0])[0, :, :mel_len, :src_len]
    alignment = np.transpose(alignment, (0, 2, 1))  # [H, P, T]

    if mode == "aux":
        # out.mel_pred is the diffuse trace (normalized)
        mel_prediction = np.asarray(
            schedule.denorm_spec(out.mel_pred[0]))[0, :mel_len].T
        mels = [mel_prediction, mel_target]
        titles = ["Sampled Spectrogram", "GT"]
    else:
        steps = [np.asarray(m)[0, :mel_len].T for m in trace]
        mel_prediction = steps[-1]
        mels = list(steps)
        titles = [f"T={t}" for t in range(len(steps) - 1, -1, -1)]
        if mode == "shallow" and out.coarse_mel is not None:
            mels.append(np.asarray(out.coarse_mel)[0, :mel_len].T)
            titles.append("Coarse Spectrogram")
        mels.append(mel_target)
        titles.append("GT")

    figs = plot_mel(mels, titles)
    attn_fig = plot_multi_attn([alignment])

    wav_reconstruction = wav_prediction = None
    if vocoder is not None:
        wav_reconstruction = vocoder_infer(
            mel_target.T[None], vocoder, preprocess_config)[0]
        wav_prediction = vocoder_infer(
            mel_prediction.T[None], vocoder, preprocess_config)[0]
    return figs, attn_fig, wav_reconstruction, wav_prediction, basename


def write_results(args, basenames, mel_preds, mel_lens, wavs, model_config,
                  preprocess_config, path):
    """Write result pngs + wavs for already-synthesized mels/waveforms."""
    import matplotlib.pyplot as plt

    multi_speaker = model_config["multi_speaker"]
    teacher_forced_tag = "_teacher_forced" if getattr(
        args, "teacher_forced", False) else ""
    out_dir = os.path.join(path, str(args.restore_step))
    os.makedirs(out_dir, exist_ok=True)

    def tag_for(basename):
        if multi_speaker and getattr(args, "mode", "") == "single":
            return f"{basename}_{args.speaker_id}{teacher_forced_tag}"
        return f"{basename}{teacher_forced_tag}"

    for i, basename in enumerate(basenames):
        mel_len = int(mel_lens[i])
        fig = plot_mel([mel_preds[i, :mel_len].T], ["Synthetized Spectrogram"])
        fig.savefig(os.path.join(out_dir, f"{tag_for(basename)}.png"))
        plt.close(fig)

    sr = preprocess_config["preprocessing"]["audio"]["sampling_rate"]
    for wav, basename in zip(wavs, basenames):
        save_wav(os.path.join(out_dir, f"{tag_for(basename)}.wav"), wav, sr)


def synth_samples(args, batch, out, vocoder, model_config, preprocess_config,
                  path, schedule):
    """Write result pngs + wavs for a synthesized model output batch."""
    mel_preds = np.asarray(out.mel_pred)
    if args.model == "aux":
        mel_preds = np.asarray(schedule.denorm_spec(out.mel_pred[0]))
    mel_lens = np.asarray(out.mel_lens)
    wavs = vocoder_infer(mel_preds, vocoder, preprocess_config,
                         lengths=mel_lens)
    write_results(args, batch["ids"], mel_preds, mel_lens, wavs,
                  model_config, preprocess_config, path)
