"""Manual TPU benchmark: end-to-end serving throughput through TTSPipeline.

Times the FULL host->wav path (bucket/pad on host, one combined XLA
program, device int16 conversion, device->host transfer, per-utterance
trim) at a given batch size, and reports utterances/s — the number a
serving deployment cares about (VERDICT r2 #8).

Run directly: python tests/bench_serving.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main(B="8", variant=""):
    from __graft_entry__ import _flagship_model, _example_text_batch
    from mixgantts_tpu.cli.common import enable_compilation_cache
    from mixgantts_tpu.models.vocoder import get_vocoder
    from mixgantts_tpu.pipeline import TTSPipeline

    enable_compilation_cache()
    B = int(B)
    model, (pre_cfg, model_cfg, train_cfg) = _flagship_model("shallow")
    P, W = 64, 24
    batch = _example_text_batch(B=B, P=P, W=W, rng=0)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "diffusion": jax.random.PRNGKey(2)}
    variables = model.init(rngs, **batch, max_mel_len=864, train=False)
    vocoder = get_vocoder(model_cfg)
    pipeline = TTSPipeline(model, variables, vocoder, pre_cfg, model_cfg)

    call_batch = dict(batch)
    call_batch["ids"] = [str(i) for i in range(B)]

    # 'nomel': wav-only serving, skip the mel device->host transfer
    # 'stream': wav-only double-buffered submit/collect (pipeline.stream)
    return_mel = variant not in ("nomel", "stream")

    # warm-up compiles the bucketed program; returned wavs ARE host data
    # (np.asarray inside __call__), so each call is its own data-fetch
    # barrier — no extra materialization needed
    wavs, mel, mel_lens = pipeline(call_batch, rng=jax.random.PRNGKey(9))
    T_bucket = mel.shape[1]
    iters = 20
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        if variant == "stream":
            for wavs, _, _ in pipeline.stream([call_batch] * iters,
                                              return_mel=False):
                pass
        else:
            for i in range(iters):
                wavs, _, _ = pipeline(call_batch, rng=jax.random.PRNGKey(i),
                                      return_mel=return_mel)
        best = min(best, (time.perf_counter() - start) / iters)
    audio_s = sum(len(w) for w in wavs) / pre_cfg[
        "preprocessing"]["audio"]["sampling_rate"]
    print(f"backend={jax.default_backend()} B={B} P={P} "
          f"bucket_T={T_bucket} return_mel={return_mel} "
          f"variant={variant or 'call'}")
    print(f"pipeline call: {best * 1e3:8.2f} ms/batch  "
          f"({B / best:,.1f} utt/s, {best / B * 1e3:.2f} ms/utt, "
          f"{audio_s / best:,.0f}x realtime on generated audio)")


if __name__ == "__main__":
    main(*sys.argv[1:3])
