"""Batched synthesis sharded over the data mesh (serving parallelism).

Training parallelism is covered by test_parallel_dp/tp; this pins the
SERVING side: the full text->wav synthesis program (linguistic encoder ->
decoder -> diffusion -> vocoder) jitted with the batch sharded over an
8-device 'data' axis must produce the same waveforms as the single-device
program.  Runs on the virtual 8-device CPU platform from conftest.py.
"""

import jax
import numpy as np

from jax.sharding import NamedSharding, PartitionSpec as P

from mixgantts_tpu.models.vocoder import get_vocoder
from mixgantts_tpu.parallel import make_mesh

from test_pipeline import (
    MODEL_CONFIG, N_MELS, text_batch, tiny_model,
)


def test_dp8_synthesis_matches_single_device():
    model = tiny_model("naive")
    batch = text_batch(B=8, P=16, seed=3)
    max_mel_len = 64
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "diffusion": jax.random.PRNGKey(2)},
        speakers=batch["speakers"], texts=batch["texts"],
        src_lens=batch["src_lens"], word_boundaries=batch["word_boundaries"],
        src_w_lens=batch["src_w_lens"], max_mel_len=max_mel_len,
        train=False)
    vocoder = get_vocoder(MODEL_CONFIG, ckpt_dir="/nonexistent",
                          num_mels=N_MELS)

    def synth(params, batch_stats, vparams, rng, speakers, texts, src_lens,
              word_boundaries, src_w_lens):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            speakers=speakers, texts=texts, src_lens=src_lens,
            word_boundaries=word_boundaries, src_w_lens=src_w_lens,
            max_mel_len=max_mel_len, train=False, rngs={"diffusion": rng})
        wav = vocoder.apply_fn(vparams, out.mel_pred)
        return wav, out.mel_pred, out.mel_lens

    args = (variables["params"], variables.get("batch_stats", {}),
            vocoder.params, jax.random.PRNGKey(7),
            batch["speakers"], batch["texts"], batch["src_lens"],
            batch["word_boundaries"], batch["src_w_lens"])

    ref_wav, ref_mel, ref_lens = jax.jit(synth)(*args)

    mesh = make_mesh(jax.devices()[:8], model_axis=1)
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    sharded = jax.jit(
        synth,
        in_shardings=(rep, rep, rep, rep, data, data, data, data, data),
        out_shardings=(data, data, data))
    with mesh:
        dp_wav, dp_mel, dp_lens = sharded(*args)

    np.testing.assert_array_equal(np.asarray(dp_lens), np.asarray(ref_lens))
    np.testing.assert_allclose(np.asarray(dp_mel), np.asarray(ref_mel),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dp_wav), np.asarray(ref_wav),
                               rtol=1e-5, atol=1e-5)
