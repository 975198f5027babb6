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


def test_pipeline_mesh_matches_plain_and_pads_ragged_batches():
    """TTSPipeline(mesh=dp8): a divisible batch must match the meshless
    pipeline exactly (same program shapes -> same rng draws); a ragged
    batch pads to the device multiple and trims on return."""
    from mixgantts_tpu.pipeline import TTSPipeline

    from test_pipeline import HOP, PREPROCESS_CONFIG

    model = tiny_model("naive")
    batch = text_batch(B=8, P=16, seed=4)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "diffusion": jax.random.PRNGKey(2)},
        speakers=batch["speakers"], texts=batch["texts"],
        src_lens=batch["src_lens"], word_boundaries=batch["word_boundaries"],
        src_w_lens=batch["src_w_lens"], max_mel_len=64, train=False)
    vocoder = get_vocoder(MODEL_CONFIG, ckpt_dir="/nonexistent",
                          num_mels=N_MELS)
    mesh = make_mesh(jax.devices()[:8], model_axis=1)

    plain = TTSPipeline(model, variables, vocoder, PREPROCESS_CONFIG,
                        MODEL_CONFIG)
    sharded = TTSPipeline(model, variables, vocoder, PREPROCESS_CONFIG,
                          MODEL_CONFIG, mesh=mesh)
    rng = jax.random.PRNGKey(11)
    wavs_p, mels_p, lens_p = plain(batch, rng=rng)
    wavs_s, mels_s, lens_s = sharded(batch, rng=rng)
    np.testing.assert_array_equal(lens_p, lens_s)
    np.testing.assert_allclose(mels_s, mels_p, rtol=1e-4, atol=2e-2)
    for a, b in zip(wavs_p, wavs_s):
        np.testing.assert_allclose(
            b.astype(np.int32), a.astype(np.int32), atol=2)

    # ragged: B=3 pads to 8 on device, returns exactly 3 utterances
    ragged = {k: (v[:3] if hasattr(v, "__len__") else v)
              for k, v in batch.items()}
    wavs_r, mels_r, lens_r = sharded(ragged, rng=rng)
    assert len(wavs_r) == 3 and mels_r.shape[0] == 3 and len(lens_r) == 3
    for i, w in enumerate(wavs_r):
        assert w.dtype == np.int16
        assert len(w) == int(lens_r[i]) * HOP
