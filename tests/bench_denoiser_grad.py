"""Manual TPU micro-benchmark: denoiser forward+backward (training shape).

Sizes the custom-VJP opportunity: what fraction of the naive train step
(7.31 ms at B=8 T=512 k=8, see CLAUDE.md) is the denoiser's fwd+bwd, and
how far is it from the MXU floor?

Run: python tests/bench_denoiser_grad.py [B] [T]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main(B=8, T=512):
    from mixgantts_tpu.models.denoiser import Denoiser

    B, T = int(B), int(T)
    model = Denoiser(n_mels=80, d_encoder=256, residual_channels=256,
                     residual_layers=20, fused=False)
    r = np.random.RandomState(0)
    x_t = jnp.asarray(r.randn(B, T, 80), jnp.float32)
    t = jnp.asarray(r.randint(0, 4, (B,)), jnp.int32)
    cond = jnp.asarray(r.randn(B, T, 256), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x_t, t, cond)["params"]

    def loss(params, x_t, t, cond):
        out = model.apply({"params": params}, x_t, t, cond)
        return jnp.sum(out * out)

    grad_fn = jax.jit(jax.grad(loss))
    fwd_fn = jax.jit(loss)

    for name, fn in (("fwd", fwd_fn), ("fwd+bwd", grad_fn)):
        compiled = fn.lower(params, x_t, t, cond).compile()
        cost = (compiled.cost_analysis() or [{}])
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))
        hbm = float(cost.get("bytes accessed", 0.0))
        out = fn(params, x_t, t, cond)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf).reshape(-1)[:4]
        best = float("inf")
        iters = 50
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(params, x_t, t, cond)
            np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:4]
            best = min(best, (time.perf_counter() - t0) / iters)
        tf = flops / best / 1e12
        print(f"{name:8s}: {best * 1e3:7.3f} ms  {flops / 1e9:6.1f} GFLOP "
              f"-> {tf:5.1f} TFLOP/s ({tf / 197 * 100:.0f}% MXU), "
              f"{hbm / 1e9:.2f} GB counted "
              f"({hbm / best / 1e9:.0f} GB/s apparent)")


if __name__ == "__main__":
    main(*sys.argv[1:3])
