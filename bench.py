"""Benchmark: LJSpeech shallow-model synthesis RTF on one TPU chip.

Measures the full flagship inference path — linguistic encoder (duration/
pitch/energy prediction), aux FFT decoder + PostNet coarse mel, 1-step
shallow diffusion denoising, HiFi-GAN vocoder — end to end on a single
utterance, and reports the real-time factor (synthesis seconds per second
of audio).  BASELINE.md north star: RTF < 0.02 on one v5e chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

TARGET_RTF = 0.02
SAMPLING_RATE = 22050
HOP = 256


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_model, _example_text_batch
    from mixgantts_tpu.cli.common import enable_compilation_cache
    from mixgantts_tpu.models.vocoder import get_vocoder

    enable_compilation_cache()

    model, (pre_cfg, model_cfg, train_cfg) = _flagship_model("shallow")

    # ~real utterance scale: 64 phones / 24 words -> cap mel at 864 frames
    # (~10 s of audio); use fixed durations via d_targets-free inference.
    B, P, W = 1, 64, 24
    max_mel_len = 864
    batch = _example_text_batch(B=B, P=P, W=W, rng=0)

    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "diffusion": jax.random.PRNGKey(2)}
    variables = model.init(rngs, **batch, max_mel_len=max_mel_len,
                           train=False)
    vocoder = get_vocoder(model_cfg)

    # text -> waveform as ONE jitted XLA program: per-call dispatch latency
    # dominates single-utterance synthesis at this model scale, so the
    # acoustic model and vocoder must not be separate dispatches.
    @jax.jit
    def synthesize(params, vparams, batch_stats, rng, speakers, texts,
                   src_lens, word_boundaries, src_w_lens):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            speakers=speakers, texts=texts, src_lens=src_lens,
            word_boundaries=word_boundaries, src_w_lens=src_w_lens,
            max_mel_len=max_mel_len, train=False, rngs={"diffusion": rng})
        wav = vocoder.apply_fn(vparams, out.mel_pred)
        return wav, out.mel_lens

    args = (variables["params"], vocoder.params,
            variables.get("batch_stats", {}),
            jax.random.PRNGKey(3), batch["speakers"], batch["texts"],
            batch["src_lens"], batch["word_boundaries"], batch["src_w_lens"])

    # weights + request tensors device-resident, as a serving system holds
    # them (re-uploading weights per request would measure the tunnel)
    args = jax.device_put(args)

    # warmup/compile
    wav, mel_lens = synthesize(*args)
    np.asarray(wav)

    # steady-state serving latency: pipeline a queue of requests and
    # materialize the final waveform once at the end.  The barrier must be
    # an actual device->host data fetch: on the axon tunnel runtime,
    # jax.block_until_ready can return before the program finishes and
    # reads up to 50x too fast.
    n_iters = 32
    best = float("inf")
    for _ in range(5):
        start = time.perf_counter()
        for _ in range(n_iters):
            wav, mel_lens = synthesize(*args)
        np.asarray(wav)
        best = min(best, (time.perf_counter() - start) / n_iters)
    elapsed = best

    # audio seconds synthesized: shapes are static, so the program always
    # computes (and the vocoder always renders) max_mel_len frames — the
    # random-init model's *predicted* length (a handful of frames) would
    # understate the audio an equally-priced trained-model call yields
    audio_seconds = max_mel_len * HOP / SAMPLING_RATE
    rtf = elapsed / audio_seconds

    print(json.dumps({
        "metric": "rtf_shallow_synthesis_1chip",
        "value": round(rtf, 6),
        "unit": "ratio (synthesis_time / audio_time; lower is better)",
        "vs_baseline": round(TARGET_RTF / rtf, 3),
    }))


if __name__ == "__main__":
    main()
