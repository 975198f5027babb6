"""MelGAN generator: flax forward vs an inline torch reconstruction of the
descript melgan-neurips architecture (the reference pulls it from torch.hub,
`utils/model.py:80-90`; zero-egress here, so the oracle is built in-test),
exercising `convert_torch_melgan`'s sequential-index mapping."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mixgantts_tpu.models.melgan import MelGANGenerator, convert_torch_melgan

torch = pytest.importorskip("torch")


def build_torch_melgan(n_mels, ngf, n_residual_layers, ratios):
    """descript/melgan-neurips mel2wav/modules.py Generator, verbatim
    architecture (weight-normed convs in one flat nn.Sequential)."""
    import torch.nn as nn
    from torch.nn.utils import weight_norm

    def WNConv1d(*a, **k):
        return weight_norm(nn.Conv1d(*a, **k))

    def WNConvTranspose1d(*a, **k):
        return weight_norm(nn.ConvTranspose1d(*a, **k))

    class ResnetBlock(nn.Module):
        def __init__(self, dim, dilation=1):
            super().__init__()
            self.block = nn.Sequential(
                nn.LeakyReLU(0.2),
                nn.ReflectionPad1d(dilation),
                WNConv1d(dim, dim, kernel_size=3, dilation=dilation),
                nn.LeakyReLU(0.2),
                WNConv1d(dim, dim, kernel_size=1),
            )
            self.shortcut = WNConv1d(dim, dim, kernel_size=1)

        def forward(self, x):
            return self.shortcut(x) + self.block(x)

    class Generator(nn.Module):
        def __init__(self):
            super().__init__()
            mult = int(2 ** len(ratios))
            model = [nn.ReflectionPad1d(3),
                     WNConv1d(n_mels, mult * ngf, kernel_size=7, padding=0)]
            for i, r in enumerate(ratios):
                model += [nn.LeakyReLU(0.2),
                          WNConvTranspose1d(mult * ngf, mult * ngf // 2,
                                            kernel_size=r * 2, stride=r,
                                            padding=r // 2 + r % 2,
                                            output_padding=r % 2)]
                for j in range(n_residual_layers):
                    model += [ResnetBlock(mult * ngf // 2, dilation=3 ** j)]
                mult //= 2
            model += [nn.LeakyReLU(0.2), nn.ReflectionPad1d(3),
                      WNConv1d(ngf, 1, kernel_size=7, padding=0), nn.Tanh()]
            self.model = nn.Sequential(*model)

        def forward(self, x):
            return self.model(x)

    return Generator()


def test_melgan_matches_torch_oracle():
    n_mels, ngf, nres, ratios = 20, 8, 3, (8, 8, 2, 2)
    torch.manual_seed(0)
    oracle = build_torch_melgan(n_mels, ngf, nres, ratios).eval()

    mel = np.random.RandomState(1).randn(2, n_mels, 17).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(mel)).numpy()[:, 0]

    params = convert_torch_melgan(
        {k: v.detach().numpy() for k, v in oracle.state_dict().items()})
    gen = MelGANGenerator(n_mels=n_mels, ngf=ngf, n_residual_layers=nres,
                          ratios=ratios)
    out = gen.apply({"params": params},
                    jnp.asarray(mel.transpose(0, 2, 1)))
    out = np.asarray(out)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_melgan_output_length():
    gen = MelGANGenerator(n_mels=8, ngf=4, n_residual_layers=1,
                          ratios=(4, 2))
    mel = jnp.zeros((1, 13, 8))
    params = gen.init(jax.random.PRNGKey(0), mel)["params"]
    wav = gen.apply({"params": params}, mel)
    assert wav.shape == (1, 13 * 8)
