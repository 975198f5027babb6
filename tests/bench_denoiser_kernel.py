"""Microbenchmark (manual, real TPU): fused Pallas residual stack vs the
plain flax/XLA block loop at bench shapes.

Run directly:  python tests/bench_denoiser_kernel.py
Not collected by pytest (no test_ prefix).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mixgantts_tpu.models.denoiser import Denoiser


def timeit(fn, *args, iters=30):
    # the trailing np.asarray is a data-fetch barrier: block_until_ready
    # alone is unreliable on the axon runtime (CLAUDE.md Measurement rule)
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - start) / iters


def main():
    B, T, C, Hc, L, M = 1, 864, 256, 256, 20, 80
    r = np.random.RandomState(0)
    x_t = jnp.asarray(r.randn(B, T, M), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    cond = jnp.asarray(r.randn(B, T, Hc), jnp.float32)

    ref = Denoiser(n_mels=M, d_encoder=Hc, residual_channels=C,
                   residual_layers=L, fused=False)
    fused = Denoiser(n_mels=M, d_encoder=Hc, residual_channels=C,
                     residual_layers=L, fused=True)
    variables = ref.init(jax.random.PRNGKey(0), x_t, t, cond)

    f_ref = jax.jit(lambda v, x, tt, c: ref.apply(v, x, tt, c))
    f_fused = jax.jit(lambda v, x, tt, c: fused.apply(v, x, tt, c))

    o1 = f_ref(variables, x_t, t, cond)
    o2 = f_fused(variables, x_t, t, cond)
    err = float(jnp.max(jnp.abs(o1 - o2)))
    t_ref = timeit(f_ref, variables, x_t, t, cond)
    t_fused = timeit(f_fused, variables, x_t, t, cond)
    print(f"backend={jax.default_backend()} B={B} T={T} C={C} L={L}")
    print(f"max_abs_err={err:.3e}")
    print(f"xla_loop : {t_ref * 1e3:8.3f} ms")
    print(f"pallas   : {t_fused * 1e3:8.3f} ms  "
          f"(speedup {t_ref / t_fused:.2f}x)  [default tile]")

    # tile sweep on the raw stack call
    from mixgantts_tpu.models.blocks import Conv1d, StepEmbeddingMLP
    from mixgantts_tpu.ops.pallas import (
        fused_residual_stack, stack_denoiser_params,
    )
    params = variables["params"]
    x = Conv1d(C, 1).apply({"params": params["input_projection"]}, x_t)
    x = jax.nn.relu(x)
    step = StepEmbeddingMLP(C, C).apply({"params": params["mlp"]}, t)
    stacked = stack_denoiser_params(params)
    for tile in (128, 256, 432, 864):
        f = jax.jit(lambda xx, cc, ss, tile=tile: fused_residual_stack(
            xx, cc, ss, stacked, tile=tile))
        dt = timeit(f, x, cond, step)
        print(f"pallas tile={tile:4d}: {dt * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
