"""Long-horizon GAN training stability drive (VERDICT r3 #1).

The reference's implicit capability is that its aux -> shallow schedule
converges (`/root/reference/train.py:22-279`; its only recorded evidence is
TensorBoard screenshots, README.md:120-135).  This script produces the
equivalent evidence for the TPU rebuild: it drives the REAL CLIs
(train.py aux ~1.5k steps, then shallow ~1k steps from the aux checkpoint,
then synthesize.py) on a 24-utterance synthetic corpus on the real chip,
parses the reference-format train logs, and asserts

`python tests/train_horizon.py naive` runs the OTHER reference schedule —
naive-mode GAN training from scratch (4-step diffusion, D+G adversarial
from step 1, no aux warm-start; `/root/reference/train.py --model naive`)
— for the same step count with the same finite/trend/LSGAN-band/audio
assertions, writing docs/horizon_naive_r04.{json,png}.  The default
(no argument) runs aux -> shallow and asserts

  * every logged metric is finite at every log step (the train CLI's
    check_finite_metrics guard would abort the run otherwise),
  * the aux recon losses trend DOWN: the postnet loss (the actual
    spectrogram reconstruction) improves >= 1.5x early-window ->
    final-window, and the trace mel loss decreases >= 1.05x (it carries
    an irreducible noise floor — aux supervises the full diffuse_trace,
    whose noised steps can never reach zero L1 — so only a modest drop
    is required of it; measured 1.15x),
  * the shallow GAN phase stays in sane LSGAN bands (D_loss and adv_loss
    bounded, no collapse to 0 or blow-up) and its mel loss does not
    diverge,
  * the final synthesized waveform is non-silent, finite, and spreads
    energy beyond DC.

Writes the loss trajectories + verdicts to docs/horizon_r04.json (the
artifact the repo commits the way the reference commits TB screenshots).

Run:  python tests/train_horizon.py          (~10-20 min: 2 TPU compiles
      dominate; device time for 2.5k tiny-model steps is seconds)
Only one TPU process may run at a time — do not run concurrently with
bench.py or other TPU tests.
"""

import copy
import json
import os
import re
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

WS = "/tmp/horizon_ws"
AUX_STEPS = 1500
SHALLOW_STEPS = 1000
# the multispeaker drive needs a longer horizon: the sampling-path speaker
# effect is driven only by the (speaker-conditioned) denoiser + JCU D —
# at 1.5k steps it is still below the diffusion-rng noise floor (measured
# cross/within 0.64); see check_speaker_conditioning
MS_STEPS = 4500
LOG_STEP = 25

LINE = re.compile(
    r"Step (\d+)/\d+, Total Loss: ([-\d.na]+), D_loss: ([-\d.na]+), "
    r"adv_loss: ([-\d.na]+), mel_loss: ([-\d.na]+), "
    r"postnet_loss: ([-\d.na]+), pitch_loss: ([-\d.na]+), "
    r"energy_loss: ([-\d.na]+), duration_loss: ([-\d.na]+), "
    r"helper_loss:([-\d.na]+)")
KEYS = ["step", "total", "D", "adv", "mel", "postnet", "pitch", "energy",
        "duration", "helper"]


def build_workspace(multispeaker=False):
    from test_data_pipeline import make_corpus, PREPROCESS_CONFIG
    from test_cli import TINY_MODEL_YAML, TINY_TRAIN_YAML

    shutil.rmtree(WS, ignore_errors=True)
    os.makedirs(WS)
    if multispeaker:
        from test_multispeaker_e2e import make_multispeaker_corpus
        make_multispeaker_corpus(WS, n_speakers=3, n_utts=8)
    else:
        make_corpus(WS, n_utts=24)
    pre = copy.deepcopy(PREPROCESS_CONFIG)
    pre["dataset"] = "TestCorpus"
    pre["path"] = {"corpus_path": WS,
                   "lexicon_path": f"{WS}/lexicon.txt",
                   "raw_path": f"{WS}/raw_data",
                   "preprocessed_path": f"{WS}/preprocessed"}
    if multispeaker:
        # the LEARNED speaker table (embedder "none"), not DeepSpeaker:
        # with no pretrained weights in this image a random-init ResCNN
        # maps the 3 synthetic speakers to 99.5%-cosine-similar vectors,
        # so conditioning has nothing to work with — an input limitation,
        # not a model one (the DeepSpeaker CLI flow is covered in
        # test_multispeaker_e2e.py).  The table gets gradients, so the
        # speakers' distinct F0 registers MUST separate the embeddings
        # for the loss to fall — check_speaker_conditioning then audits
        # exactly that.
        pre["preprocessing"]["speaker_embedder"] = "none"
    with open(pre["path"]["lexicon_path"], "w") as f:
        f.write("hello HH AH0 L OW1\nworld W ER1 L D\n")
    model = copy.deepcopy(TINY_MODEL_YAML)
    if multispeaker:
        model["multi_speaker"] = True
    model["tpu"]["steps_per_call"] = 8
    # the 24-utt corpus draws longer utterances (up to ~2.6 s ~ 660
    # frames) than the 6-utt CLI-test one; size the positional tables /
    # buckets for them
    model["max_seq_len"] = 768
    model["tpu"]["length_buckets"] = [96, 192, 384, 768]
    train = copy.deepcopy(TINY_TRAIN_YAML)
    train["path"] = {k: f"{WS}/output/{k[:-5]}/TestCorpus"
                     for k in ("ckpt_path", "log_path", "result_path")}
    train["step"] = {
        "total_step_aux": AUX_STEPS,
        "total_step_naive": MS_STEPS if multispeaker else AUX_STEPS,
        "total_step_shallow": AUX_STEPS + SHALLOW_STEPS,
        "log_step": LOG_STEP, "synth_step": 10 ** 9, "val_step": 10 ** 9,
        "save_step": 500,
    }
    cfg = f"{WS}/config/TestCorpus"
    os.makedirs(cfg, exist_ok=True)
    import yaml as _y
    for n, c in [("preprocess.yaml", pre), ("model.yaml", model),
                 ("train.yaml", train)]:
        with open(f"{cfg}/{n}", "w") as f:
            _y.dump(c, f)


def run(cmd, log_name, append=False):
    log = os.path.join(WS, log_name)
    with open(log, "a" if append else "w") as f:
        p = subprocess.run([sys.executable, "-u"] + cmd, cwd=WS, stdout=f,
                           stderr=subprocess.STDOUT, timeout=3600)
    if p.returncode != 0:
        print(open(log).read()[-4000:])
        raise SystemExit(f"{cmd} failed (rc={p.returncode}); see {log}")
    return log


def parse_log(mode):
    path = f"{WS}/output/log/TestCorpus_{mode}/train/log.txt"
    rows = []
    with open(path) as f:
        for line in f:
            m = LINE.match(line.strip())
            if m:
                rows.append({k: float(g) for k, g in zip(KEYS, m.groups())})
    # The CLI appends to log.txt, so a phase that died partway and was
    # rerun leaves BOTH attempts' rows for the overlapping steps; keep the
    # last occurrence per step so the asserted windows reflect the run
    # that actually produced the final checkpoint.
    by_step = {r["step"]: r for r in rows}
    return [by_step[s] for s in sorted(by_step)]


def window_mean(rows, key, lo, hi):
    vals = [r[key] for r in rows if lo <= r["step"] <= hi]
    return float(np.mean(vals)) if vals else float("nan")


def write_plot(artifact, path):
    """Loss-curve panel pair for docs/ — the committed analogue of the
    reference's TensorBoard screenshots (README.md:120-135).  Colors are
    the dataviz reference palette's categorical slots in fixed order."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    C = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]  # slots 1-4
    SURFACE, INK, INK2 = "#fcfcfb", "#0b0b0b", "#52514e"
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4), dpi=130)
    fig.patch.set_facecolor(SURFACE)
    for ax in (ax1, ax2):
        ax.set_facecolor(SURFACE)
        ax.grid(True, color="#e4e3df", linewidth=0.7, zorder=0)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color("#c9c8c2")
        ax.tick_params(colors=INK2, labelsize=9)
        ax.set_xlabel("step", color=INK2, fontsize=9)

    aux, sh = artifact["aux_trajectory"], artifact["shallow_trajectory"]
    xs = [r["step"] for r in aux]
    ax1.plot(xs, [r["postnet"] for r in aux], color=C[0], lw=2,
             label="postnet (recon)", zorder=3)
    ax1.plot(xs, [r["mel"] for r in aux], color=C[1], lw=2,
             label="trace mel", zorder=3)
    ax1.set_title(f"aux phase — postnet {artifact['aux_postnet_improvement']:.2f}x down",
                  color=INK, fontsize=10, loc="left")
    ax1.legend(frameon=False, fontsize=9, labelcolor=INK2)

    xs2 = [r["step"] for r in sh]
    ax2.plot(xs2, [r["mel"] for r in sh], color=C[0], lw=2,
             label="mel (diffusion)", zorder=3)
    ax2.plot(xs2, [r["D"] for r in sh], color=C[1], lw=2, label="D loss",
             zorder=3)
    ax2.plot(xs2, [r["adv"] for r in sh], color=C[2], lw=2, label="G adv",
             zorder=3)
    ax2.set_title("shallow GAN phase — LSGAN bands hold", color=INK,
                  fontsize=10, loc="left")
    ax2.legend(frameon=False, fontsize=9, labelcolor=INK2)
    fig.suptitle("Long-horizon training stability (synthetic 24-utt corpus,"
                 " one v5e chip)", color=INK, fontsize=11, x=0.01,
                 ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.94))
    fig.savefig(path, facecolor=SURFACE)
    plt.close(fig)


def ensure_corpus(multispeaker=False):
    """Build + preprocess the workspace only if its artifacts are absent,
    so the naive and aux->shallow drives can share one corpus."""
    if not os.path.isdir(f"{WS}/preprocessed/mel"):
        build_workspace(multispeaker=multispeaker)
        print("== preprocess ==")
        run([f"{REPO}/preprocess.py", "--dataset", "TestCorpus"], "pre.log")


def check_wav(rdir, name=None):
    """Non-degeneracy checks on the synthesized wav; returns stats
    (including the float pcm under "pcm" — pop it before json.dump).

    A barely-trained GAN vocoder legitimately carries a DC offset (tanh
    output) and strong Nyquist ringing (the classic early-training
    checkerboard artifact of stride-2 upsampling, trained away at real
    horizons) — neither is collapse.  What IS collapse: silence, a
    constant, or a single pure tone.  So measure the spectrum with mean
    removed and the DC + Nyquist bins excluded, and require real
    broadband content: >= 20% of energy in the interior bins, spread
    over >= 2 of the speech bands at >= 2% each."""
    import wave
    wavs = [f for f in os.listdir(rdir) if f.endswith(".wav")
            and (name is None or f.startswith(name))]
    assert wavs, (name, os.listdir(rdir))
    with wave.open(os.path.join(rdir, wavs[0])) as w:
        pcm = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
    pcm_f = pcm.astype(np.float32) / 32768.0
    assert len(pcm_f) > 1000, len(pcm_f)
    assert np.isfinite(pcm_f).all()
    assert float(np.std(pcm_f)) > 1e-3, "synthesized audio is silent"
    xc = pcm_f - pcm_f.mean()
    e = np.abs(np.fft.rfft(xc)) ** 2
    interior = float(e[1:-1].sum() / e.sum())
    assert interior > 0.2, f"energy collapsed to DC/Nyquist ({interior})"
    freqs = np.fft.rfftfreq(len(xc), 1.0 / 22050)
    bands = []
    for lo, hi in ((300, 1000), (1000, 4000), (4000, 10000)):
        m = (freqs >= lo) & (freqs < hi)
        bands.append(float(e[m].sum() / e.sum()))
    # the mid + high speech bands specifically must carry real energy
    # (measured across the r4 drives: 13.4-14.0% and 21.2-23.0%; the low
    # band legitimately scrapes ~2% on this corpus, so it stays
    # unasserted rather than keeping a 2-of-3 rule it can satisfy alone)
    assert bands[1] >= 0.03 and bands[2] >= 0.03, (
        f"spectrum is a single tone, band energies {bands}")
    print(f"wav: {len(pcm_f)} samples, std {np.std(pcm_f):.4f}, "
          f"interior energy {interior:.4f}, bands {bands}")
    return {"wav_samples": int(len(pcm_f)), "wav_std": float(np.std(pcm_f)),
            "wav_interior_energy": interior, "wav_band_energy": bands,
            "pcm": pcm_f}


def check_gan_bands(rows, label):
    """LSGAN sanity bands: neither player collapses (D at 0 = D gave up;
    adv stuck at ~1 with D at 0.5 forever = G gave up) nor blows up."""
    d_vals = [r["D"] for r in rows]
    adv_vals = [r["adv"] for r in rows]
    assert 0.0 < float(np.mean(d_vals)) < 2.0, np.mean(d_vals)
    assert 0.0 < float(np.mean(adv_vals)) < 4.0, np.mean(adv_vals)
    assert max(d_vals) < 10 and max(adv_vals) < 10, (max(d_vals),
                                                     max(adv_vals))
    print(f"{label}: D {np.mean(d_vals):.3f}, adv {np.mean(adv_vals):.3f}")
    return float(np.mean(d_vals)), float(np.mean(adv_vals))


def check_speaker_conditioning(steps):
    """Model-level speaker-conditioning audit on the trained multispeaker
    checkpoint (CPU, in-process).

    Reference semantics (`/root/reference/model/mixgantts.py:109-119,155-159`)
    route the speaker embedding ONLY into the denoiser and the JCU
    discriminator — the variance predictors are text-conditioned — so at a
    short GAN horizon the audible per-speaker difference rides the
    diffusion-rng noise floor (measured: wav-pair delta ~0.5% at 1.5k
    steps).  What a short horizon CAN decide, and what this asserts:

      * the learned table TRAINED: its only gradient path is through the
        denoiser/D conditioning, so movement from init proves that path
        carries gradients end to end;
      * the rows SEPARATED (pairwise cosine bounded away from +1: the
        speakers' distinct F0 registers forced distinct embeddings);
      * sampling RESPONDS to the embedding: identical-rng mels for two
        speakers differ by a measurable fraction of the rng noise floor
        (swap-only-the-speaker vs swap-only-the-noise).
    """
    import yaml
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import types

    from mixgantts_tpu.cli.common import (build_model, build_discriminator,
                                          model_batch_of)
    from mixgantts_tpu.cli.synthesize import build_single_batch
    from mixgantts_tpu.train.state import create_train_state
    from mixgantts_tpu.checkpoint import restore_generator_params

    cfg = f"{WS}/config/TestCorpus"
    pre = yaml.safe_load(open(f"{cfg}/preprocess.yaml"))
    model_cfg = yaml.safe_load(open(f"{cfg}/model.yaml"))
    train_cfg = yaml.safe_load(open(f"{cfg}/train.yaml"))
    model, _ = build_model("naive", pre, model_cfg)
    disc = build_discriminator(pre, model_cfg)
    args = types.SimpleNamespace(text="hello world", speaker_id="0")
    batch = build_single_batch(args, pre, model_cfg)
    kw = model_batch_of(dict(batch))
    kw["max_mel_len"] = 64
    # create_train_state(PRNGKey(0)) reproduces the TRUE training init
    # (the train CLI seeds it with --seed, default 0, and param values
    # depend only on the rng + static shapes), so state.g_params is the
    # exact table the run started from — comparing against any other
    # init key would make the "table moved" check vacuous (two unrelated
    # random tables differ by ~1.4x the init scale)
    state = create_train_state(jax.random.PRNGKey(0), model, disc,
                               {**kw}, train_cfg, model_cfg)
    init_emb = np.asarray(state.g_params["speaker_emb"]["embedding"])
    params, batch_stats = restore_generator_params(
        f"{WS}/output/ckpt/TestCorpus_naive", steps, state)
    variables = {"params": params, "batch_stats": batch_stats}

    emb = np.asarray(params["speaker_emb"]["embedding"])
    cosines = {}
    for a in range(len(emb)):
        for b in range(a + 1, len(emb)):
            cosines[f"{a}-{b}"] = float(
                np.dot(emb[a], emb[b])
                / (np.linalg.norm(emb[a]) * np.linalg.norm(emb[b])))
    moved = float(np.abs(emb - init_emb).mean())
    init_scale = float(np.abs(init_emb).mean())

    def sample(spk, key):
        kw2 = dict(kw)
        kw2["speakers"] = jnp.array([spk])
        out = model.apply(variables, **kw2, train=False,
                          rngs={"diffusion": jax.random.PRNGKey(key)})
        T = int(np.asarray(out.mel_lens)[0])
        return np.asarray(out.mel_pred)[0, :T]

    m0, m2, m0b = sample(0, 7), sample(2, 7), sample(0, 8)
    cross = float(np.abs(m0 - m2).mean())       # speaker swap, same rng
    within = float(np.abs(m0 - m0b).mean())     # rng swap, same speaker
    ratio = cross / max(within, 1e-9)
    stats = {"spk_table_cosines": cosines, "spk_table_moved": moved,
             "spk_table_init_scale": init_scale,
             "spk_mel_delta_cross": cross, "spk_mel_delta_rng": within,
             "spk_mel_cross_over_rng": ratio}
    print(f"speaker audit: cosines {cosines}, table moved {moved:.4f} "
          f"(init scale {init_scale:.4f}), mel Δ cross {cross:.4f} / "
          f"rng {within:.4f} (ratio {ratio:.2f})")
    assert moved >= 0.5 * init_scale, (
        "speaker table barely moved — conditioning path carries no "
        "gradient", moved, init_scale)
    assert max(cosines.values()) < 0.9, (
        "speaker embeddings did not separate", cosines)
    # measured on the recorded 4.5k-step run: ratio 3.00 (0.202 vs 0.067;
    # at 1.5k steps it was still 0.64 — the speaker effect emerges
    # between 1.5k and 4.5k as the conditioned D sharpens), table moved
    # 0.183 vs init scale 0.136 (1.34x), cosines 0.32-0.54
    assert ratio >= 1.5, (
        "a speaker swap must change the sampled mel more than a noise "
        "reswap — sampling is not meaningfully speaker-conditioned", stats)
    return stats


def run_naive(multispeaker=False):
    """Naive-schedule horizon: GAN from scratch (4-step diffusion, D+G
    adversarial from step 1) for AUX_STEPS steps, then synthesize via the
    full 4-step sampling loop.

    multispeaker=True runs the AISHELL3-shaped path instead: 3-speaker
    corpus with per-speaker F0 registers, the learned speaker table
    (embedder "none" — see build_workspace for why not DeepSpeaker here),
    speaker-conditioned generator AND discriminator
    (`/root/reference/model/mixgantts.py:34-53,209-212`), a longer horizon
    (MS_STEPS — the speaker effect rides only the denoiser/D conditioning),
    and a final conditioning audit: a same-text per-speaker synthesis pair
    plus model-level checks (check_speaker_conditioning)."""
    tag = "multispeaker" if multispeaker else "naive"
    steps = MS_STEPS if multispeaker else AUX_STEPS
    final_ckpt = f"{WS}/output/ckpt/TestCorpus_naive/{steps}"
    ensure_corpus(multispeaker=multispeaker)
    print(f"== {tag} naive-GAN {steps} steps from scratch ==")
    if not os.path.isdir(final_ckpt):
        # resume from the newest saved step if a partial run was interrupted
        ckdir = f"{WS}/output/ckpt/TestCorpus_naive"
        saved = [int(d) for d in os.listdir(ckdir)
                 if d.isdigit()] if os.path.isdir(ckdir) else []
        resume = ([] if not saved
                  else ["--restore_step", str(max(saved))])
        run([f"{REPO}/train.py", "--model", "naive", "--dataset",
             "TestCorpus"] + resume, "naive.log", append=bool(saved))
    rows = parse_log("naive")
    assert rows and rows[-1]["step"] == steps, (len(rows), rows[-1:])
    for r in rows:
        assert all(np.isfinite(v) for v in r.values()), r
    d_mean, adv_mean = check_gan_bands(rows, "naive GAN")
    # the naive mel loss supervises x0 recon across 4 diffusion levels, so
    # it carries a noise floor.  Measured: single-speaker 1.02x at 1.5k
    # (riding its floor from step 1 — a >=1.0 "improvement" floor was
    # vacuous, ADVICE r4), multispeaker 1.91x at 4.5k.  Single-speaker
    # asserts no-divergence (the variance floors below carry the trend
    # evidence for that schedule); multispeaker asserts a real 1.4x drop.
    early = window_mean(rows, "mel", 1, 4 * LOG_STEP)
    late = window_mean(rows, "mel", steps - 4 * LOG_STEP, steps)
    factor = early / late
    if multispeaker:
        print(f"naive mel: early {early:.4f} -> late {late:.4f} "
              f"({factor:.2f}x, floor {MS_MEL_FLOOR}x)")
        assert factor >= MS_MEL_FLOOR, (
            f"multispeaker mel loss only improved {factor:.2f}x")
    else:
        print(f"naive mel: early {early:.4f} -> late {late:.4f} "
              f"(no-divergence bound: late < 1.1x early)")
        assert late < 1.1 * early, (
            f"naive mel loss diverged ({early:.4f} -> {late:.4f})")
    # the unambiguous learning signals in naive mode are the variance
    # predictors (no diffusion noise floor); measured on the recorded
    # runs: duration 11.6x, energy 16.5x, pitch 2.8x down (single-speaker,
    # 1.5k steps); multispeaker at 4.5k: duration 27.2x, energy 47.7x,
    # pitch 1.22x on the wide window below.
    # The multispeaker pitch trend needs a WIDE late window: every
    # utterance shares one text while its F0 register varies per
    # speaker/utterance by construction, and the pitch predictor is
    # text-conditioned (reference semantics — the speaker embedding feeds
    # only denoiser/D), so its loss converges to, then oscillates around,
    # the irreducible cross-speaker variance (100-step window means in
    # the last 1k steps range 0.43-2.13 on the recorded run; the 800-step
    # window mean is 1.21, a stable 1.22x below the 1.47 early mean)
    trend_stats = {}
    floors = ([("duration", 3.0, 4), ("energy", 3.0, 4),
               ("pitch", 1.05, 32)]
              if multispeaker else
              [("duration", 5.0, 4), ("energy", 5.0, 4),
               ("pitch", 1.5, 4)])
    for key, floor, late_windows in floors:
        e0 = window_mean(rows, key, 1, 4 * LOG_STEP)
        e1 = window_mean(rows, key, steps - late_windows * LOG_STEP, steps)
        f = e0 / e1
        print(f"{tag} {key}: {e0:.4f} -> {e1:.4f} ({f:.2f}x, floor {floor}x,"
              f" late window {late_windows * LOG_STEP} steps)")
        assert f >= floor, f"{tag} {key} loss only improved {f:.2f}x"
        trend_stats[key] = (e0, e1, f)

    print(f"== synthesize from the final {tag} checkpoint (4-step loop) ==")
    rdir = f"{WS}/output/result/TestCorpus_naive/{steps}"
    if multispeaker:
        # SAME text for both speakers: only the conditioning differs (the
        # output wav is named "{text}_{speaker}.wav", so match the exact
        # speaker's file)
        wavs = {}
        for spk in (0, 2):
            run([f"{REPO}/synthesize.py", "--restore_step", str(steps),
                 "--model", "naive", "--mode", "single", "--text",
                 "hello world", "--speaker_id", str(spk),
                 "--dataset", "TestCorpus"], f"synth_spk{spk}.log")
            wav_stats = check_wav(rdir, name=f"hello world_{spk}")
            wavs[spk] = wav_stats.pop("pcm")
            wav_stats_last = wav_stats
        # both CLI runs draw the same diffusion rng (fresh pipeline, same
        # key), so this delta is pure speaker effect at the waveform
        # level.  Measured 7.0% of mean amplitude at 4.5k steps (0.5% at
        # 1.5k — below the rng floor; check_speaker_conditioning carries
        # the finer-grained emergence evidence).  Floor ratcheted to 5%
        # (measured minus margin, VERDICT r4 #4)
        n = min(len(wavs[0]), len(wavs[2]))
        diff = float(np.abs(wavs[0][:n] - wavs[2][:n]).mean())
        scale = float(np.abs(wavs[0][:n]).mean()
                      + np.abs(wavs[2][:n]).mean()) / 2
        print(f"speaker-pair wav mean |Δ| {diff:.4f} vs amplitude {scale:.4f}")
        assert diff > 0.05 * scale, (
            "speaker conditioning effect regressed below 5% of amplitude "
            "(measured 7.0% on the recorded 4.5k-step run)", diff, scale)
        wav_stats = wav_stats_last
        wav_stats["speaker_pair_wav_delta"] = diff
        wav_stats["speaker_pair_wav_scale"] = scale
        wav_stats.update(check_speaker_conditioning(steps))
    else:
        run([f"{REPO}/synthesize.py", "--restore_step", str(steps),
             "--model", "naive", "--mode", "single", "--text",
             "hello world", "--dataset", "TestCorpus"], "synth_naive.log")
        wav_stats = check_wav(rdir)
        wav_stats.pop("pcm")

    artifact = {
        "corpus": ("synthetic-3spk-24utt" if multispeaker
                   else "synthetic-24utt"),
        "naive_steps": steps,
        "log_step": LOG_STEP, "multispeaker": multispeaker,
        "naive_mel_early": early, "naive_mel_late": late,
        "naive_mel_improvement": factor,
        "naive_variance_improvements": {
            k: {"early": v[0], "late": v[1], "factor": v[2]}
            for k, v in trend_stats.items()},
        "naive_D_mean": d_mean, "naive_adv_mean": adv_mean,
        "naive_trajectory": rows, "all_metrics_finite": True,
    }
    artifact.update(wav_stats)
    stem = "horizon_ms_r04" if multispeaker else "horizon_naive_r04"
    out = os.path.join(REPO, "docs", f"{stem}.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    write_plot_naive(artifact, os.path.join(REPO, "docs", f"{stem}.png"))
    print(f"PASS — artifacts written to {out} / {stem}.png")


def write_plot_naive(artifact, path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    C = ["#2a78d6", "#eb6834", "#1baf7a"]
    SURFACE, INK, INK2 = "#fcfcfb", "#0b0b0b", "#52514e"
    fig, ax = plt.subplots(figsize=(6.5, 4), dpi=130)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)
    ax.grid(True, color="#e4e3df", linewidth=0.7, zorder=0)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#c9c8c2")
    ax.tick_params(colors=INK2, labelsize=9)
    ax.set_xlabel("step", color=INK2, fontsize=9)
    rows = artifact["naive_trajectory"]
    xs = [r["step"] for r in rows]
    ax.plot(xs, [r["mel"] for r in rows], color=C[0], lw=2,
            label="mel (diffusion)", zorder=3)
    ax.plot(xs, [r["D"] for r in rows], color=C[1], lw=2, label="D loss",
            zorder=3)
    ax.plot(xs, [r["adv"] for r in rows], color=C[2], lw=2, label="G adv",
            zorder=3)
    kind = ("3-speaker naive GAN" if artifact.get("multispeaker")
            else "naive GAN")
    ax.set_title(f"{kind} from scratch — mel "
                 f"{artifact['naive_mel_improvement']:.2f}x down, "
                 f"LSGAN bands hold", color=INK, fontsize=10, loc="left")
    ax.legend(frameon=False, fontsize=9, labelcolor=INK2)
    fig.tight_layout()
    fig.savefig(path, facecolor=SURFACE)
    plt.close(fig)


MS_MEL_FLOOR = 1.4  # measured 1.91x on the recorded 4.5k-step run


def main():
    aux_ckpt = f"{WS}/output/ckpt/TestCorpus_shallow/{AUX_STEPS}"
    final_ckpt = (f"{WS}/output/ckpt/TestCorpus_shallow/"
                  f"{AUX_STEPS + SHALLOW_STEPS}")
    if not os.path.isdir(aux_ckpt):
        ensure_corpus()
        print(f"== aux {AUX_STEPS} steps (first TPU compile ~5 min) ==")
        run([f"{REPO}/train.py", "--model", "aux", "--dataset",
             "TestCorpus"], "aux.log")
    else:
        print(f"== aux checkpoint {AUX_STEPS} present, reusing its run ==")
    aux = [r for r in parse_log("shallow")  # aux shares the *_shallow dir
           if r["step"] <= AUX_STEPS]
    assert aux and aux[-1]["step"] == AUX_STEPS, (len(aux), aux[-1:])
    for r in aux:
        assert all(np.isfinite(v) for v in r.values()), r

    aux_stats = {}
    # trace-mel floor 1.05: it carries an irreducible noise floor (aux
    # supervises the full diffuse_trace), but the recorded run measured
    # 1.15x down — a bare >=1.0 "monotony" floor was satisfiable by zero
    # improvement, so require at least a third of the measured drop
    for key, floor in [("postnet", 1.5), ("mel", 1.05)]:
        early = window_mean(aux, key, 1, 4 * LOG_STEP)
        late = window_mean(aux, key, AUX_STEPS - 4 * LOG_STEP, AUX_STEPS)
        factor = early / late
        print(f"aux {key}: early {early:.4f} -> late {late:.4f} "
              f"({factor:.2f}x, floor {floor}x)")
        assert factor >= floor, (
            f"aux {key} loss only improved {factor:.2f}x (< {floor}x)")
        aux_stats[key] = (early, late, factor)
    early, late, aux_factor = aux_stats["postnet"]

    print(f"== shallow {SHALLOW_STEPS} steps from aux ckpt ==")
    if not os.path.isdir(final_ckpt):
        run([f"{REPO}/train.py", "--model", "shallow", "--dataset",
             "TestCorpus", "--restore_step", str(AUX_STEPS)], "shallow.log")
    sh = [r for r in parse_log("shallow") if r["step"] > AUX_STEPS]
    assert sh and sh[-1]["step"] == AUX_STEPS + SHALLOW_STEPS
    for r in sh:
        assert all(np.isfinite(v) for v in r.values()), r
    d_mean, adv_mean = check_gan_bands(sh, "shallow GAN")
    sh_mel_early = window_mean(sh, "mel", AUX_STEPS,
                               AUX_STEPS + 4 * LOG_STEP)
    sh_mel_late = window_mean(sh, "mel",
                              AUX_STEPS + SHALLOW_STEPS - 4 * LOG_STEP,
                              AUX_STEPS + SHALLOW_STEPS)
    print(f"shallow mel: {sh_mel_early:.4f} -> {sh_mel_late:.4f}")
    assert sh_mel_late < 2.0 * sh_mel_early + 0.1, "shallow mel diverged"

    print("== synthesize from the final shallow checkpoint ==")
    run([f"{REPO}/synthesize.py", "--restore_step",
         str(AUX_STEPS + SHALLOW_STEPS), "--model", "shallow", "--mode",
         "single", "--text", "hello world", "--dataset", "TestCorpus"],
        "synth.log")
    wav_stats = check_wav(
        f"{WS}/output/result/TestCorpus_shallow/{AUX_STEPS + SHALLOW_STEPS}")
    wav_stats.pop("pcm")

    artifact = {
        "corpus": "synthetic-24utt", "aux_steps": AUX_STEPS,
        "shallow_steps": SHALLOW_STEPS, "log_step": LOG_STEP,
        "aux_postnet_early": aux_stats["postnet"][0],
        "aux_postnet_late": aux_stats["postnet"][1],
        "aux_postnet_improvement": aux_stats["postnet"][2],
        "aux_trace_mel_early": aux_stats["mel"][0],
        "aux_trace_mel_late": aux_stats["mel"][1],
        "aux_trace_mel_improvement": aux_stats["mel"][2],
        "shallow_mel_early": sh_mel_early, "shallow_mel_late": sh_mel_late,
        "shallow_D_mean": d_mean,
        "shallow_adv_mean": adv_mean,
        "aux_trajectory": aux, "shallow_trajectory": sh,
        "all_metrics_finite": True,
    }
    artifact.update(wav_stats)
    out = os.path.join(REPO, "docs", "horizon_r04.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    write_plot(artifact, os.path.join(REPO, "docs", "horizon_r04.png"))
    print(f"PASS — artifacts written to {out} / horizon_r04.png")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "naive":
        run_naive()
    elif len(sys.argv) > 1 and sys.argv[1] == "multispeaker":
        WS = "/tmp/horizon_ms_ws"  # separate corpus/checkpoint workspace
        run_naive(multispeaker=True)
    elif len(sys.argv) > 1:
        # fail loudly rather than silently launching the (long, TPU-
        # exclusive) default aux->shallow drive on a typo
        sys.exit(f"unknown mode {sys.argv[1]!r} "
                 f"(expected 'naive' or 'multispeaker', or no argument "
                 f"for the aux->shallow drive)")
    else:
        main()
