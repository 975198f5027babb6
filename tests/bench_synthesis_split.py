"""Manual TPU benchmark: where does single-utterance synthesis time go?

Times the acoustic model (linguistic encoder + aux decoder + 1-step
diffusion) and the HiFi-GAN vocoder as separate jitted programs at bench
shapes, plus the fused single-program pipeline for reference.

Run directly: python tests/bench_synthesis_split.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def _fetch(out):
    # data-fetch barrier: on the axon runtime block_until_ready can return
    # before the program tail executes (see CLAUDE.md Measurement rule)
    return np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _fetch(out)
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _fetch(out)
        best = min(best, (time.perf_counter() - start) / iters)
    return best


def main(B="1"):
    from __graft_entry__ import _flagship_model, _example_text_batch
    from mixgantts_tpu.cli.common import enable_compilation_cache
    from mixgantts_tpu.models.vocoder import get_vocoder

    enable_compilation_cache()
    model, (pre_cfg, model_cfg, train_cfg) = _flagship_model("shallow")
    B, P, W = int(B), 64, 24
    max_mel_len = 864
    batch = _example_text_batch(B=B, P=P, W=W, rng=0)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "diffusion": jax.random.PRNGKey(2)}
    variables = model.init(rngs, **batch, max_mel_len=max_mel_len,
                           train=False)
    vocoder = get_vocoder(model_cfg)

    @jax.jit
    def acoustic(params, batch_stats, rng, speakers, texts, src_lens,
                 word_boundaries, src_w_lens):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            speakers=speakers, texts=texts, src_lens=src_lens,
            word_boundaries=word_boundaries, src_w_lens=src_w_lens,
            max_mel_len=max_mel_len, train=False, rngs={"diffusion": rng})
        return out.mel_pred

    @jax.jit
    def vocode(vparams, mel):
        return vocoder.apply_fn(vparams, mel)

    args = jax.device_put(
        (variables["params"], variables.get("batch_stats", {}),
         jax.random.PRNGKey(3), batch["speakers"], batch["texts"],
         batch["src_lens"], batch["word_boundaries"],
         batch["src_w_lens"]))
    @jax.jit
    def combined(params, batch_stats, vparams, rng, speakers, texts,
                 src_lens, word_boundaries, src_w_lens):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            speakers=speakers, texts=texts, src_lens=src_lens,
            word_boundaries=word_boundaries, src_w_lens=src_w_lens,
            max_mel_len=max_mel_len, train=False, rngs={"diffusion": rng})
        wav = vocoder.apply_fn(vparams, out.mel_pred)
        return wav, out.mel_lens

    mel = acoustic(*args)
    t_ac = timeit(acoustic, *args)
    t_voc = timeit(vocode, vocoder.params, mel)
    cargs = jax.device_put(
        (variables["params"], variables.get("batch_stats", {}),
         vocoder.params, jax.random.PRNGKey(3), batch["speakers"],
         batch["texts"], batch["src_lens"], batch["word_boundaries"],
         batch["src_w_lens"]))
    t_comb = timeit(combined, *cargs)
    # two-program chain (acoustic out feeds vocoder, both pipelined)
    def chain(*a):
        m = acoustic(*a)
        return vocode(vocoder.params, m)
    t_chain = timeit(chain, *args)
    print(f"backend={jax.default_backend()} T_mel={max_mel_len}")
    print(f"acoustic : {t_ac * 1e3:8.3f} ms")
    print(f"vocoder  : {t_voc * 1e3:8.3f} ms")
    print(f"combined : {t_comb * 1e3:8.3f} ms (one XLA program)")
    print(f"chained  : {t_chain * 1e3:8.3f} ms (two dispatches)")

    # bf16 compute (tpu.compute_dtype knob) via the serving pipeline
    import copy
    from mixgantts_tpu.pipeline import TTSPipeline
    for dt in ("float32", "bfloat16"):
        cfg = copy.deepcopy(model_cfg)
        cfg.setdefault("tpu", {})["compute_dtype"] = dt
        pipe = TTSPipeline(model, variables, vocoder, pre_cfg, cfg)
        rng = jax.random.PRNGKey(7)
        pipe(batch, rng=rng)  # warmup/compile
        best = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            for _ in range(20):
                out = pipe(batch, rng=rng)
            best = min(best, (time.perf_counter() - start) / 20)
        print(f"pipeline[{dt:9s}]: {best * 1e3:8.3f} ms "
              f"(host roundtrip included)")


if __name__ == "__main__":
    import sys

    main(*sys.argv[1:2])
