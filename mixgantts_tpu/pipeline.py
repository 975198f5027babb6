"""Serving pipeline: text batch -> waveform as ONE compiled XLA program.

The reference synthesizes in two stages (acoustic model, then vocoder —
`synthesize.py:106-140` + `utils/model.py:108-126`), each a separate device
dispatch.  On TPU, per-dispatch latency dominates single-utterance synthesis
at this model scale, so the pipeline compiles linguistic encoder -> aux
decoder -> diffusion sampling -> vocoder into one jitted function.

Shapes are bucketed (`tpu.length_buckets` / `tpu.phone_buckets` in
model.yaml): inputs pad up to the nearest bucket, so the pipeline compiles a
handful of programs total instead of one per utterance length.  The
pitch/energy/duration control knobs are traced scalars — changing them never
recompiles.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .utils.tools import bucket_length

_RNGS_EXHAUSTED = object()


class _Pending:
    """In-flight synthesis batch: device-resident outputs + host metadata."""

    __slots__ = ("wav", "mel", "mel_lens", "B", "T")

    def __init__(self, wav, mel, mel_lens, B, T):
        self.wav, self.mel, self.mel_lens = wav, mel, mel_lens
        self.B, self.T = B, T


def cast_floats(tree, dtype):
    """Cast every float leaf of a pytree to `dtype` (ints/bools untouched)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


class TTSPipeline:
    """One-call text->wav synthesis on a single chip.

    pipeline = TTSPipeline(model, variables, vocoder, preprocess_config,
                           model_config)
    wavs = pipeline(batch)          # list of int16 waveforms

    Pass `mesh` (from `parallel.make_mesh`) to shard batched synthesis over
    the 'data' axis: params replicate, every per-utterance input/output
    splits across chips; ragged batches pad up to a multiple of the axis
    size (repeating row 0) and trim on return, so any batch size works.
    """

    def __init__(self, model, variables, vocoder, preprocess_config,
                 model_config, mesh=None, mel_dtype=jnp.bfloat16):
        self.model = model
        self.variables = variables
        self.vocoder = vocoder
        self.preprocess_config = preprocess_config
        self.mesh = mesh
        # dtype the returned mel crosses the host<->TPU tunnel in: bf16
        # halves the second-largest transfer and is plenty for the
        # plotting/logging consumers, but quantizes (~0.4% rel.) — pass
        # mel_dtype=jnp.float32 when the mel feeds re-vocoding/analysis
        self.mel_dtype = jnp.dtype(mel_dtype)
        tpu_cfg = model_config.get("tpu", {}) or {}
        self.length_buckets = tuple(tpu_cfg.get("length_buckets", ()))
        self.phone_buckets = tuple(tpu_cfg.get("phone_buckets", ()))
        # 'bfloat16' runs params + activations in bf16 on the MXU (opt-in:
        # the float32 default preserves BASELINE.md's mel-MAE parity target)
        self.compute_dtype = jnp.dtype(
            tpu_cfg.get("compute_dtype", "float32"))
        self.max_seq_len = model_config["max_seq_len"]
        self.hop_length = preprocess_config["preprocessing"]["stft"][
            "hop_length"]
        self.max_wav_value = preprocess_config["preprocessing"]["audio"][
            "max_wav_value"]
        self._call_count = 0
        self._programs = {}

    def _compiled(self, P, W, T, has_spk):
        """One jitted program per (phone, word, frame) bucket triple,
        cached per pipeline instance."""
        key = (P, W, T, has_spk)
        if key in self._programs:
            return self._programs[key]
        import math
        model, vocoder = self.model, self.vocoder
        in_scale = 1.0 / math.log(10.0) if vocoder.name == "MelGAN" else 1.0
        dtype = self.compute_dtype
        mel_dtype = self.mel_dtype
        max_wav = float(self.max_wav_value)

        jit_kwargs = {}
        if self.mesh is not None:
            from .parallel import batch_sharding, replicated
            rep, dat = replicated(self.mesh), batch_sharding(self.mesh)
            # (params, stats, vparams, rng) replicate; per-utterance
            # tensors shard on 'data'; control scalars replicate
            jit_kwargs = dict(
                in_shardings=(rep, rep, rep, rep, dat, dat, dat, dat, dat,
                              rep if not has_spk else dat, rep, rep, rep),
                out_shardings=(dat, dat, dat),
            )

        @functools.partial(jax.jit, **jit_kwargs)
        def run(g_params, batch_stats, v_params, rng, speakers, texts,
                src_lens, word_boundaries, src_w_lens, spker_embeds,
                p_control, e_control, d_control):
            if dtype != jnp.float32:
                g_params = cast_floats(g_params, dtype)
                v_params = cast_floats(v_params, dtype)
                spker_embeds = cast_floats(spker_embeds, dtype)
            out = model.apply(
                {"params": g_params, "batch_stats": batch_stats},
                speakers=speakers, texts=texts, src_lens=src_lens,
                word_boundaries=word_boundaries, src_w_lens=src_w_lens,
                max_mel_len=T, spker_embeds=spker_embeds,
                p_control=p_control, e_control=e_control,
                d_control=d_control, train=False, rngs={"diffusion": rng})
            mel = out.mel_pred
            if model.mode == "aux":
                # aux mel_pred is the diffuse trace; element 0 is the
                # clamped normalized mel (matches `utils/tools.py:227-229`)
                mel = model.schedule.denorm_spec(mel[0])
            wav = vocoder.apply_fn(v_params, (mel * in_scale).astype(dtype))
            # int16 conversion ON DEVICE: the host<->TPU tunnel moves
            # ~20 MB/s, so shipping fp32 waveforms costs ~4x the transfer
            # time of the final int16 (B=8, T=864: ~350 ms -> ~90 ms)
            if wav.ndim == 3:  # [B, T, 1] conv output
                wav = wav[..., 0]
            wav_i16 = jnp.clip(
                wav.astype(jnp.float32) * max_wav,
                -max_wav, max_wav - 1).astype(jnp.int16)
            # mel ships in self.mel_dtype (default bf16: plots/logging
            # don't need fp32; halves the second-largest transfer), upcast
            # host-side — see __init__ for the precision contract
            return wav_i16, mel.astype(mel_dtype), out.mel_lens

        self._programs[key] = run
        return run

    def __call__(self, batch, p_control=1.0, e_control=1.0, d_control=1.0,
                 rng=None, return_mel=True):
        """batch: dict with texts [B, P], src_lens, word_boundaries [B, W],
        src_w_lens, speakers, optional spker_embeds.  Returns (wavs, mel,
        mel_lens): a list of B int16 waveforms trimmed to each predicted
        mel length, and the mel batch as float32 — NOTE the mel crossed
        the device->host tunnel in ``self.mel_dtype`` (default bfloat16,
        ~0.4% rel. quantization; construct with mel_dtype=jnp.float32 for
        full precision).  ``return_mel=False`` skips the mel device->host
        transfer entirely (mel is None; same compiled program) — wav-only
        serving saves the second-largest transfer (~130 ms at B=8,
        T=1000 over the tunnel)."""
        return self.collect(
            self.submit(batch, p_control, e_control, d_control, rng),
            return_mel=return_mel)

    def submit(self, batch, p_control=1.0, e_control=1.0, d_control=1.0,
               rng=None):
        """Dispatch synthesis for one batch WITHOUT blocking on the result.

        Returns an opaque pending handle whose outputs live on device;
        pass it to :meth:`collect` to fetch.  JAX dispatch is async, so a
        second batch can be submitted while the first computes — that is
        how :meth:`stream` overlaps batch N's device->host transfer with
        batch N+1's device time (the reference's loop synthesizes
        strictly serially, `synthesize.py:106-140`)."""
        texts = np.asarray(batch["texts"])
        wb = np.asarray(batch["word_boundaries"])
        B = texts.shape[0]

        P = bucket_length(texts.shape[1], self.phone_buckets)
        W = bucket_length(wb.shape[1], self.phone_buckets)
        # frame budget: generous duration headroom, capped at max_seq_len
        T = bucket_length(min(self.max_seq_len, max(64, texts.shape[1] * 16)),
                          self.length_buckets)

        texts = np.pad(texts, ((0, 0), (0, P - texts.shape[1])))
        wb = np.pad(wb, ((0, 0), (0, W - wb.shape[1])))
        spk = batch.get("spker_embeds")
        speakers = np.asarray(batch["speakers"])
        src_lens = np.asarray(batch["src_lens"])
        src_w_lens = np.asarray(batch["src_w_lens"])
        if self.mesh is not None:
            # the 'data' axis shards the batch dim: pad B up to a multiple
            # of the axis size by repeating row 0, trim outputs below
            n_data = self.mesh.shape["data"]
            pad_b = (-B) % n_data
            if pad_b:
                rep = lambda a: np.concatenate(
                    [a] + [a[:1]] * pad_b, axis=0)
                texts, wb = rep(texts), rep(wb)
                speakers, src_lens, src_w_lens = (
                    rep(speakers), rep(src_lens), rep(src_w_lens))
                spk = rep(np.asarray(spk)) if spk is not None else None
        run = self._compiled(P, W, T, spk is not None)

        if rng is None:
            rng = jax.random.PRNGKey(self._call_count)
            self._call_count += 1
        wav, mel, mel_lens = run(
            self.variables["params"], self.variables.get("batch_stats", {}),
            self.vocoder.params, rng,
            jnp.asarray(speakers), jnp.asarray(texts),
            jnp.asarray(src_lens), jnp.asarray(wb),
            jnp.asarray(src_w_lens),
            None if spk is None else jnp.asarray(spk),
            jnp.float32(p_control), jnp.float32(e_control),
            jnp.float32(d_control))
        return _Pending(wav=wav, mel=mel, mel_lens=mel_lens, B=B, T=T)

    def collect(self, pending, return_mel=True):
        """Fetch a :meth:`submit` handle's outputs to the host (blocking)
        and trim per-utterance.  Same return contract as ``__call__``."""
        B, T = pending.B, pending.T
        wav = np.asarray(pending.wav)[:B]  # int16, converted on device
        mel = (np.asarray(pending.mel)[:B].astype(np.float32)
               if return_mel else None)
        mel_lens = np.asarray(pending.mel_lens)[:B]
        if (mel_lens >= T).any():
            import warnings
            # a legitimate prediction landing exactly on the cap is
            # indistinguishable from a clamped longer one, hence "may"
            warnings.warn(
                f"synthesis frame budget saturated: predicted mel length hit "
                f"the static cap T={T} (max_seq_len={self.max_seq_len}); the "
                f"tail of the utterance may have been truncated — raise "
                f"max_seq_len or split the text", stacklevel=2)
        wavs = [wav[i, :int(mel_lens[i]) * self.hop_length] for i in range(B)]
        return wavs, mel, mel_lens

    def stream(self, batches, p_control=1.0, e_control=1.0, d_control=1.0,
               return_mel=True, depth=2, rngs=None):
        """Double-buffered serving: yield (wavs, mel, mel_lens) for each
        batch in `batches`, keeping up to `depth` batches in flight.

        While batch N's outputs cross the device->host link (the dominant
        cost at B=8: ~160 ms wav transfer vs ~90 ms device time), batch
        N+1 is already dispatched and computing — on a co-located PJRT
        runtime sustained throughput approaches max(transfer, device)
        instead of their sum.  (On THIS environment's axon tunnel the
        transport serializes fetches with subsequent dispatches, so
        stream measures neutral vs sequential wav-only calls — 245.6 vs
        246 ms/batch, see CLAUDE.md; the API contract is still the right
        one for production serving.)  Results arrive in submission
        order, with the same per-batch return contract as ``__call__``
        (including the ``return_mel=True`` default; pass
        ``return_mel=False`` for wav-only serving, which also skips the
        mel device->host transfer).

        rngs: optional iterable of per-batch diffusion PRNG keys,
        forwarded to :meth:`submit` positionally with the batches.  When
        omitted, each batch draws from the pipeline's call counter —
        identical to calling the pipeline sequentially *from the same
        counter state*; note any earlier call on this instance (e.g. a
        warm-up) advances the counter, so pass explicit rngs when exact
        draw reproducibility matters."""
        import collections
        inflight = collections.deque()
        rng_of = iter(rngs) if rngs is not None else None
        for batch in batches:
            if rng_of is None:
                rng = None
            else:
                # a bare next() here would raise StopIteration inside the
                # generator body, which PEP 479 turns into an opaque
                # RuntimeError that drops all in-flight results
                rng = next(rng_of, _RNGS_EXHAUSTED)
                if rng is _RNGS_EXHAUSTED:
                    raise ValueError(
                        "stream(): `rngs` ran out before `batches` did — "
                        "pass one PRNG key per batch (or omit rngs to draw "
                        "from the pipeline's call counter)")
            inflight.append(
                self.submit(batch, p_control, e_control, d_control, rng))
            if len(inflight) >= max(1, depth):
                yield self.collect(inflight.popleft(), return_mel=return_mel)
        while inflight:
            yield self.collect(inflight.popleft(), return_mel=return_mel)
