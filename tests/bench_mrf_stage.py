"""Manual TPU micro-benchmark: one HiFi-GAN MRF stage, plain vs folded.

Run: python tests/bench_mrf_stage.py [C] [T]
Defaults sweep the real LJSpeech V1 stage shapes (C=32 @ T=221184,
C=64 @ T=110592, C=128 @ T=55296).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, x, *args, iters=30):
    y = fn(x, *args)
    np.asarray(y[0, :8, 0])  # data-fetch barrier (see CLAUDE.md)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(x, *args)
        np.asarray(y[0, :8, 0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main(stages=((32, 221184), (64, 110592), (128, 55296))):
    from flax import linen as nn  # noqa: F401  (init only)
    from mixgantts_tpu.models.hifigan import ResBlock1
    from mixgantts_tpu.ops.pallas_vocoder import (
        mrf_stack, mrf_stack_folded, stack_mrf_params,
        stack_mrf_params_folded,
    )
    from flax import linen

    class Stage(linen.Module):
        C: int

        @linen.compact
        def __call__(self, x):
            acc = None
            for j, rk in enumerate((3, 7, 11)):
                y = ResBlock1(self.C, rk, (1, 3, 5),
                              name=f"resblocks_0_{j}")(x)
                acc = y if acc is None else acc + y
            return acc / 3

    print(f"backend={jax.default_backend()}")
    for C, T in stages:
        x = jnp.asarray(np.random.RandomState(0).randn(1, T, C),
                        jnp.float32)
        params = Stage(C).init(jax.random.PRNGKey(0),
                               x[:, :256])["params"]

        st = stack_mrf_params(params, 0)
        plain = jax.jit(lambda a, s=st: mrf_stack(a, s))
        t_plain = bench(plain, x)
        line = f"C={C:4d} T={T:7d}  plain {t_plain * 1e3:7.3f} ms"

        if 128 % C == 0 and C < 128:
            stf = stack_mrf_params_folded(params, 0, 128 // C)
            folded = jax.jit(lambda a, s=stf: mrf_stack_folded(a, s))
            t_fold = bench(folded, x)
            line += (f"   folded(F={128 // C}) {t_fold * 1e3:7.3f} ms "
                     f"({t_plain / t_fold:.2f}x)")
        print(line)


def main_fused_upsample(stages=((32, 221184), (64, 110592))):
    """Whole-stage comparison INCLUDING the preceding sub-pixel upsample
    (u=2, k=4 like the real ups_2/ups_3): taps-in-K with depth-to-space
    vs folded with the fold fused into the upsample's pre-interleave
    output (prefolded=True, no audio-rate d2s copy)."""
    from mixgantts_tpu.models.hifigan import subpixel_upsample
    from mixgantts_tpu.ops.pallas_vocoder import (
        mrf_stack, mrf_stack_folded, stack_mrf_params,
        stack_mrf_params_folded,
    )

    print(f"backend={jax.default_backend()}  (upsample u=2 k=4 included)")
    for C, T in stages:
        u, k = 2, 4
        r = np.random.RandomState(0)
        x_in = jnp.asarray(r.randn(1, T // u, 2 * C), jnp.float32)
        kernel = jnp.asarray(r.randn(k, C, 2 * C) * 0.05, jnp.float32)
        bias = jnp.asarray(r.randn(C) * 0.05, jnp.float32)

        params = _stage_params(C)
        st = stack_mrf_params(params, 0)
        F = 128 // C
        stf = stack_mrf_params_folded(params, 0, F)

        def taps_in_k(a):
            y = subpixel_upsample(a, kernel, bias, u, k)
            return mrf_stack(y, st)

        def fold_after_d2s(a):
            y = subpixel_upsample(a, kernel, bias, u, k)
            return mrf_stack_folded(y, stf)

        def prefused(a):
            y = subpixel_upsample(a, kernel, bias, u, k,
                                  depth_to_space=False)
            xf = y.reshape(y.shape[0], y.shape[1] * u // F, F * C)
            return mrf_stack_folded(xf, stf, prefolded=True)

        t_a = bench(jax.jit(taps_in_k), x_in)
        t_b = bench(jax.jit(fold_after_d2s), x_in)
        t_c = bench(jax.jit(prefused), x_in)
        print(f"C={C:4d} T={T:7d}  taps-in-K+d2s {t_a * 1e3:7.3f} ms   "
              f"folded+d2s {t_b * 1e3:7.3f} ms ({t_a / t_b:.2f}x)   "
              f"prefused {t_c * 1e3:7.3f} ms ({t_a / t_c:.2f}x)")


def main_c256(C=256, T=6912):
    """The one stage `mrf_stack` refuses (weights > VMEM): branch-per-call
    (status quo in fused_apply) vs the streamed-weight whole-stage kernel
    (VERDICT r4 #8).  Real V1 shape: C=256, T = 864 mel frames x u=8."""
    from mixgantts_tpu.ops.pallas_vocoder import (
        mrf_stack, mrf_stack_streamed, stack_mrf_params,
    )

    print(f"backend={jax.default_backend()}")
    x = jnp.asarray(np.random.RandomState(0).randn(1, T, C) * 0.3,
                    jnp.float32)
    params = _stage_params(C)
    st = stack_mrf_params(params, 0)

    def branchwise(a):
        acc = None
        for j, rk in enumerate((3, 7, 11)):
            stb = stack_mrf_params(params, 0, (rk,), branches=[(j, rk)])
            y = mrf_stack(a, stb, (rk,))
            acc = y if acc is None else acc + y
        return acc / 3

    t_b = bench(jax.jit(branchwise), x, iters=50)
    line = f"C={C:4d} T={T:7d}  branchwise {t_b * 1e3:7.3f} ms  "
    for tile in (None, 1152, 576):
        t_s = bench(jax.jit(
            lambda a, tl=tile: mrf_stack_streamed(a, st, tile=tl)),
            x, iters=50)
        line += (f"  streamed[{tile or 'auto'}] {t_s * 1e3:7.3f} ms "
                 f"({t_b / t_s:.2f}x)")
    print(line)


def _stage_params(C):
    from flax import linen
    from mixgantts_tpu.models.hifigan import ResBlock1

    class Stage(linen.Module):
        C: int

        @linen.compact
        def __call__(self, x):
            acc = None
            for j, rk in enumerate((3, 7, 11)):
                y = ResBlock1(self.C, rk, (1, 3, 5),
                              name=f"resblocks_0_{j}")(x)
                acc = y if acc is None else acc + y
            return acc / 3

    import numpy as _np
    x0 = jnp.asarray(_np.random.RandomState(1).randn(1, 256, C), jnp.float32)
    return Stage(C).init(jax.random.PRNGKey(0), x0)["params"]


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "fused_upsample":
        main_fused_upsample()
    elif len(sys.argv) > 1 and sys.argv[1] == "c256":
        main_c256()
    elif len(sys.argv) == 3:
        main([(int(sys.argv[1]), int(sys.argv[2]))])
    else:
        main()
