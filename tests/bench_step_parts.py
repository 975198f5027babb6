"""Manual TPU micro-benchmark: attribute the naive GAN step's non-denoiser
time (linguistic encoder fwd+bwd, JCU discriminator fwd+bwd).

Companion to bench_denoiser_grad.py (denoiser = 380 of 478 GFLOP); this
covers the remaining ~98 GFLOP so optimization effort goes where the
milliseconds are.

Run: python tests/bench_step_parts.py [B] [T]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, args, n=50):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:4]
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:4]
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def report(name, fn, args):
    jitted = jax.jit(fn)
    compiled = jitted.lower(*args).compile()
    cost = (compiled.cost_analysis() or [{}])
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0))
    hbm = float(cost.get("bytes accessed", 0.0))
    best = timeit(jitted, args)
    tf = flops / best / 1e12
    print(f"{name:24s}: {best * 1e3:7.3f} ms  {flops / 1e9:6.1f} GFLOP "
          f"-> {tf:5.1f} TFLOP/s ({tf / 197 * 100:2.0f}% MXU), "
          f"{hbm / 1e9:5.2f} GB counted ({hbm / best / 1e9:4.0f} GB/s app.)")


def main(B=8, T=512):
    from __graft_entry__ import _flagship_model
    from mixgantts_tpu.cli.common import enable_compilation_cache
    from mixgantts_tpu.models.discriminator import JCUDiscriminator

    enable_compilation_cache()
    B, T = int(B), int(T)
    P, W = 128, 48
    model, (pre_cfg, model_cfg, train_cfg) = _flagship_model("naive")
    r = np.random.RandomState(0)
    wb = r.randint(1, 4, (B, W)).astype(np.int32)
    src_lens = wb.sum(-1).astype(np.int32)
    texts = np.zeros((B, P), np.int64)
    for b in range(B):
        texts[b, :src_lens[b]] = r.randint(1, 300, src_lens[b])
    d_targets = np.zeros((B, P), np.int32)
    for b in range(B):
        d_targets[b, :src_lens[b]] = r.randint(2, 8, src_lens[b])
    mel_lens = np.minimum(d_targets.sum(-1), T).astype(np.int32)
    batch = dict(
        speakers=np.zeros((B,), np.int32), texts=texts, src_lens=src_lens,
        word_boundaries=wb, src_w_lens=np.full((B,), W, np.int32),
        mels=r.randn(B, T, 80).astype(np.float32), mel_lens=mel_lens,
        attn_priors=np.ones((B, P, T), np.float32) / P,
        p_targets=r.randn(B, P).astype(np.float32),
        e_targets=r.randn(B, P).astype(np.float32),
        d_targets=d_targets, max_mel_len=T,
    )
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "diffusion": jax.random.PRNGKey(2)}
    variables = model.init(rngs, **batch, train=False)
    print(f"backend={jax.default_backend()} B={B} T={T}")

    # full generator fwd+bwd (isolates the second forward of the G phase)
    def g_loss(params):
        out, _ = model.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            **batch, train=True,
            rngs={"dropout": jax.random.PRNGKey(3),
                  "diffusion": jax.random.PRNGKey(4)},
            mutable=["batch_stats"])
        return sum(jnp.sum(l * l) for l in
                   (out.mel_pred, out.pitch_pred, out.log_dur_w_pred))

    report("generator fwd", lambda p: g_loss(p), (variables["params"],))
    report("generator fwd+bwd", jax.grad(g_loss), (variables["params"],))

    # discriminator: 4 applies (D phase real/fake + G phase real/fake)
    d = model_cfg["discriminator"]
    disc = JCUDiscriminator(
        n_mels=80, residual_channels=model_cfg["denoiser"][
            "residual_channels"],
        n_channels=tuple(d["n_channels"]),
        kernel_sizes=tuple(d["kernel_sizes"]),
        strides=tuple(d["strides"]))
    x = jnp.asarray(r.randn(B, T, 80), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    dvars = disc.init(jax.random.PRNGKey(5), x, x, None, t)

    def d_loss(params, xa, xb):
        fc, fu = disc.apply({"params": params}, xa, xb, None, t)
        return jnp.sum(fc[-1] ** 2) + jnp.sum(fu[-1] ** 2)

    report("discriminator fwd", d_loss, (dvars["params"], x, x))
    report("discriminator fwd+bwd", jax.grad(d_loss, argnums=(0, 1, 2)),
           (dvars["params"], x, x))


if __name__ == "__main__":
    main(*sys.argv[1:3])
