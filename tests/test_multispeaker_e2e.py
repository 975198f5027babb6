"""Multi-speaker end-to-end slice (the AISHELL3-shaped path): corpus with
two speakers -> preprocess with the DeepSpeaker embedder (random-init
weights) -> naive GAN training with external speaker embeddings ->
single-utterance synthesis with --speaker_id.

Reference behaviors covered: per-speaker mean spker_embed artifacts
(`preprocessor/preprocessor.py:149-165`), speakers.json, the external
speaker projection in the generator (`model/mixgantts.py:44-53`), and the
speaker-conditioned JCU discriminator branch."""

import copy
import json
import os
import sys
import types

import numpy as np
import pytest
import yaml

from test_data_pipeline import (
    IntervalTier, PREPROCESS_CONFIG, SR, save_wav, write_textgrid,
)
from test_cli import TINY_MODEL_YAML, TINY_TRAIN_YAML


def make_multispeaker_corpus(root, n_speakers=2, n_utts=4):
    rng = np.random.RandomState(0)
    for s in range(n_speakers):
        spk = str(s)
        raw = os.path.join(root, "raw_data", spk)
        tg_dir = os.path.join(root, "preprocessed", "TextGrid", spk)
        os.makedirs(raw, exist_ok=True)
        os.makedirs(tg_dir, exist_ok=True)
        for k in range(n_utts):
            dur = 0.30 + 0.1 * k
            n = int(SR * dur)
            t = np.arange(n) / SR
            hz = 100 + 60 * s + 40 * k  # speakers get distinct registers
            wav = (0.4 * np.sin(2 * np.pi * hz * t)
                   + 0.01 * rng.randn(n)).astype(np.float32)
            save_wav(os.path.join(raw, f"utt{k}.wav"), wav, SR)
            with open(os.path.join(raw, f"utt{k}.lab"), "w") as f:
                f.write("hello world")
            q = dur / 5.0
            phones = [(0.0, q, "HH"), (q, 2 * q, "AH0"),
                      (2 * q, 3 * q, "L"), (3 * q, 4 * q, "OW1"),
                      (4 * q, 5 * q, "sil")]
            words = [(0.0, 2 * q, "hello"), (2 * q, 4 * q, "world"),
                     (4 * q, 5 * q, "")]
            write_textgrid(
                os.path.join(tg_dir, f"utt{k}.TextGrid"),
                [IntervalTier("words", words),
                 IntervalTier("phones", phones)],
                xmax=dur)


@pytest.fixture(scope="module")
def ms_workspace(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ms_ws"))
    make_multispeaker_corpus(root)

    pre_cfg = copy.deepcopy(PREPROCESS_CONFIG)
    pre_cfg["dataset"] = "MSCorpus"
    pre_cfg["preprocessing"]["speaker_embedder"] = "DeepSpeaker"
    pre_cfg["preprocessing"]["speaker_embedder_cuda"] = False
    pre_cfg["path"] = {
        "corpus_path": root,
        "lexicon_path": os.path.join(root, "lexicon.txt"),
        "raw_path": os.path.join(root, "raw_data"),
        "preprocessed_path": os.path.join(root, "preprocessed"),
    }
    with open(pre_cfg["path"]["lexicon_path"], "w") as f:
        f.write("hello HH AH0 L OW1\nworld W ER1 L D\n")

    model_cfg = copy.deepcopy(TINY_MODEL_YAML)
    model_cfg["multi_speaker"] = True

    train_cfg = copy.deepcopy(TINY_TRAIN_YAML)
    train_cfg["path"] = {
        "ckpt_path": os.path.join(root, "output/ckpt/MSCorpus"),
        "log_path": os.path.join(root, "output/log/MSCorpus"),
        "result_path": os.path.join(root, "output/result/MSCorpus"),
    }

    cfg_dir = os.path.join(root, "config", "MSCorpus")
    os.makedirs(cfg_dir, exist_ok=True)
    for name, cfg in [("preprocess.yaml", pre_cfg),
                      ("model.yaml", model_cfg),
                      ("train.yaml", train_cfg)]:
        with open(os.path.join(cfg_dir, name), "w") as f:
            yaml.dump(cfg, f)

    from mixgantts_tpu.data.preprocessor import Preprocessor
    Preprocessor(pre_cfg, model_cfg, train_cfg).build_from_path()

    cwd = os.getcwd()
    os.chdir(root)
    yield root
    os.chdir(cwd)


def _args(**kw):
    return types.SimpleNamespace(**kw)


def test_preprocess_speaker_artifacts(ms_workspace):
    pre = os.path.join(ms_workspace, "preprocessed")
    with open(os.path.join(pre, "speakers.json")) as f:
        speakers = json.load(f)
    assert set(speakers) == {"0", "1"}
    for spk in ("0", "1"):
        emb = np.load(os.path.join(pre, "spker_embed",
                                   f"{spk}-spker_embed.npy"))
        assert emb.reshape(-1).shape == (512,)
        assert np.isfinite(emb).all()
    # distinct speakers get distinct mean embeddings
    e0 = np.load(os.path.join(pre, "spker_embed", "0-spker_embed.npy"))
    e1 = np.load(os.path.join(pre, "spker_embed", "1-spker_embed.npy"))
    assert not np.allclose(e0, e1)
    # t-SNE panel written at preprocess time (reference parity)
    assert os.path.isfile(os.path.join(pre, "spker_embed_tsne.png"))


def test_train_multispeaker_naive(ms_workspace):
    from mixgantts_tpu.cli.common import load_configs
    from mixgantts_tpu.cli.train import main

    args = _args(model="naive", dataset="MSCorpus", restore_step=0,
                 path_tag="", seed=0, data_parallel=False)
    configs = load_configs(args)
    main(args, configs)
    ckpt_dir = configs[2]["path"]["ckpt_path"]
    assert os.path.isdir(os.path.join(ckpt_dir, "4"))

    # proof the EXTERNAL-embedding path trained (not the id table): the
    # checkpoint must hold the 512->hidden speaker projection and no
    # embedding table (reference: `model/mixgantts.py:44-53`)
    import jax
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            os.path.abspath(os.path.join(ckpt_dir, "4")))
    g = restored["g_params"]
    flat = {"/".join(str(getattr(k, "key", k)) for k in path): v
            for path, v in jax.tree_util.tree_flatten_with_path(g)[0]}
    # exact module name: the denoiser's per-block speaker_projection also
    # exists (hidden->C); the EXTERNAL path is the top-level 512->hidden
    # 'speaker_proj' Dense
    kernels = [v for k, v in flat.items()
               if k.endswith("speaker_proj/kernel")]
    assert kernels, f"external speaker projection missing: {list(flat)[:8]}"
    assert kernels[0].shape[0] == 512
    assert not any(k.split("/")[-2] == "speaker_emb" for k in flat), \
        "table path params present in an external-embedder run"


def test_synthesize_with_speaker_id(ms_workspace, monkeypatch):
    from mixgantts_tpu.cli import synthesize as syn

    for spk in (0, 1):
        monkeypatch.setattr(
            sys, "argv",
            ["synthesize.py", "--restore_step", "4", "--model", "naive",
             "--mode", "single", "--text", "hello world",
             "--speaker_id", str(spk), "--dataset", "MSCorpus"])
        syn.cli()
    result_dir = os.path.join(
        ms_workspace, "output/result/MSCorpus_naive", "4")
    wavs = [f for f in os.listdir(result_dir) if f.endswith(".wav")]
    assert wavs, "no wav produced for multi-speaker synthesis"


def test_export_cli_external_embedder(ms_workspace, monkeypatch):
    """Regression: the export CLI's hand-rolled init batch omitted
    spker_embeds, so model.init hit the 'external speaker embedding
    required' assert for every DeepSpeaker/external-embedder checkpoint —
    the CLI could never export the multispeaker variant its own
    export_generator supports (function-level round-trip is pinned in
    test_reference_parity.py::test_export_roundtrip_multispeaker)."""
    torch = pytest.importorskip("torch")
    from mixgantts_tpu.export import export_checkpoint_cli

    out = os.path.join(ms_workspace, "exported_ms_4.pth.tar")
    monkeypatch.setattr(
        sys, "argv",
        ["export.py", "--restore_step", "4", "--model", "naive",
         "--dataset", "MSCorpus", "--out", out])
    export_checkpoint_cli()

    ckpt = torch.load(out, map_location="cpu", weights_only=False)
    G = ckpt["G"]
    # the external 512->hidden projection exports as the reference's
    # speaker_emb Linear (`model/mixgantts.py:49-53`), not an Embedding
    h = TINY_MODEL_YAML["transformer"]["encoder_hidden"]
    assert G["speaker_emb.weight"].shape == (h, 512)
    assert "speaker_emb.bias" in G
    # per-block denoiser speaker projections came along
    assert ("diffusion.denoise_fn.residual_layers.0"
            ".speaker_projection.linear.weight") in G
    # D's speaker mlp exports under the JCU names
    assert "spk_mlp.0.linear.weight" in ckpt["D"]
