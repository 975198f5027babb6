"""Dataset loaders over the preprocessed .npy artifacts.

Parity targets: `dataset.py:13-272` in the reference — metadata lines
"basename|speaker|{phones}|raw_text", six per-utterance arrays + optional
spker_embed, grouped sorted batching (collate receives batch_size*group_size
items, sorts by text length desc, splits into real batches,
`dataset.py:171-190`), and the canonical 17-field batch (here a dict).

TPU twist: batches are padded to *bucketed* lengths (`tpu.length_buckets` /
`tpu.phone_buckets` in model.yaml) so jit sees a small closed set of shapes
instead of one compilation per unique max length.
"""

import json
import os

import numpy as np

from ..text import text_to_sequence
from ..utils.tools import pad_1d, pad_2d, pad_3d, bucket_length


class AcousticDataset:
    """Training/validation dataset (the reference's `Dataset`)."""

    def __init__(self, filename, mode, preprocess_config, model_config,
                 train_config, sort=False, drop_last=False):
        pp = preprocess_config["preprocessing"]
        self.preprocessed_path = preprocess_config["path"]["preprocessed_path"]
        self.cleaners = pp["text"]["text_cleaners"]
        self.batch_size = train_config["optimizer"][
            "batch_size" if mode != "shallow" else "batch_size_shallow"]
        self.load_spker_embed = (
            model_config["multi_speaker"]
            and pp.get("speaker_embedder", "none") != "none")
        tpu_cfg = model_config.get("tpu", {})
        self.length_buckets = tuple(tpu_cfg.get("length_buckets", ()))
        self.phone_buckets = tuple(tpu_cfg.get("phone_buckets", ()))
        self.sort = sort
        self.drop_last = drop_last

        self.basename, self.speaker, self.text, self.raw_text = \
            self._process_meta(filename)
        with open(os.path.join(self.preprocessed_path, "speakers.json")) as f:
            self.speaker_map = json.load(f)

    def __len__(self):
        return len(self.text)

    def _process_meta(self, filename):
        path = os.path.join(self.preprocessed_path, filename)
        name, speaker, text, raw_text = [], [], [], []
        with open(path, encoding="utf-8") as f:
            for line in f:
                if not line.strip():
                    continue
                n, s, t, r = line.strip("\n").split("|")
                name.append(n)
                speaker.append(s)
                text.append(t)
                raw_text.append(r)
        return name, speaker, text, raw_text

    def _load(self, kind, speaker, basename):
        return np.load(os.path.join(
            self.preprocessed_path, kind,
            f"{speaker}-{kind}-{basename}.npy"))

    def __getitem__(self, idx):
        basename = self.basename[idx]
        speaker = self.speaker[idx]
        sample = {
            "id": basename,
            "speaker": self.speaker_map[speaker],
            "raw_text": self.raw_text[idx],
            "text": np.array(text_to_sequence(self.text[idx], self.cleaners)),
            "mel": self._load("mel", speaker, basename),
            "pitch": self._load("pitch", speaker, basename),
            "energy": self._load("energy", speaker, basename),
            "duration": self._load("duration", speaker, basename),
            "word_boundary": self._load("phones_per_word", speaker, basename),
            "attn_prior": self._load("attn_prior", speaker, basename),
        }
        if self.load_spker_embed:
            sample["spker_embed"] = np.load(os.path.join(
                self.preprocessed_path, "spker_embed",
                f"{speaker}-spker_embed.npy"))
        return sample

    def reprocess(self, data, idxs):
        """idxs -> one padded batch dict (the 17-field contract)."""
        items = [data[i] for i in idxs]
        text_lens = np.array([len(d["text"]) for d in items])
        word_lens = np.array([len(d["word_boundary"]) for d in items])
        mel_lens = np.array([d["mel"].shape[0] for d in items])

        P = bucket_length(int(text_lens.max()), self.phone_buckets)
        W = bucket_length(int(word_lens.max()), self.phone_buckets)
        T = bucket_length(int(mel_lens.max()), self.length_buckets)

        batch = {
            "ids": [d["id"] for d in items],
            "raw_texts": [d["raw_text"] for d in items],
            "speakers": np.array([d["speaker"] for d in items]),
            "texts": pad_1d([d["text"] for d in items], P),
            "src_lens": text_lens,
            "word_boundaries": pad_1d(
                [d["word_boundary"] for d in items], W),
            "src_w_lens": word_lens,
            "mels": pad_2d([d["mel"] for d in items], T).astype(np.float32),
            "mel_lens": mel_lens,
            "p_targets": pad_1d([d["pitch"] for d in items],
                                P).astype(np.float32),
            "e_targets": pad_1d([d["energy"] for d in items],
                                P).astype(np.float32),
            "d_targets": pad_1d([d["duration"] for d in items], P),
            "attn_priors": pad_3d([d["attn_prior"] for d in items],
                                  len(items), P, T),
        }
        if self.load_spker_embed:
            batch["spker_embeds"] = np.stack(
                [np.asarray(d["spker_embed"]).reshape(-1) for d in items]
            ).astype(np.float32)
        return batch

    def collate(self, data):
        """Grouped sorted batching: sort by text length desc, chunk into
        real batches of batch_size."""
        if self.sort:
            idx_arr = np.argsort(
                -np.array([len(d["text"]) for d in data]))
        else:
            idx_arr = np.arange(len(data))
        tail = idx_arr[len(idx_arr) - (len(idx_arr) % self.batch_size):]
        idx_arr = idx_arr[:len(idx_arr) - (len(idx_arr) % self.batch_size)]
        groups = idx_arr.reshape(-1, self.batch_size).tolist()
        if not self.drop_last and len(tail) > 0:
            groups.append(tail.tolist())
        return [self.reprocess(data, g) for g in groups]

    def batches(self, group_size=4, shuffle=True, seed=0, epochs=None):
        """Iterate padded batch dicts indefinitely (or for `epochs`).

        DataLoader equivalent: draws batch_size*group_size items, sorts by
        text length, yields group_size real batches."""
        rng = np.random.RandomState(seed)
        epoch = 0
        chunk = self.batch_size * group_size
        # small datasets: shrink the group so at least one batch is emitted
        if len(self) < chunk:
            chunk = max((len(self) // self.batch_size) * self.batch_size,
                        min(len(self), self.batch_size))
        while epochs is None or epoch < epochs:
            order = np.arange(len(self))
            if shuffle:
                rng.shuffle(order)
            for i in range(0, len(order) - chunk + 1, chunk):
                data = [self[j] for j in order[i:i + chunk]]
                yield from self.collate(data)
            epoch += 1
            yield None  # epoch boundary marker (for ExponentialLR parity)


class TextOnlyDataset:
    """Batch-synthesis dataset (the reference's `TextDataset`): text +
    word boundaries only (`dataset.py:193-272`)."""

    def __init__(self, filepath, preprocess_config, model_config):
        pp = preprocess_config["preprocessing"]
        self.cleaners = pp["text"]["text_cleaners"]
        self.preprocessed_path = preprocess_config["path"]["preprocessed_path"]
        self.load_spker_embed = (
            model_config["multi_speaker"]
            and pp.get("speaker_embedder", "none") != "none")
        tpu_cfg = model_config.get("tpu", {})
        self.phone_buckets = tuple(tpu_cfg.get("phone_buckets", ()))

        self.basename, self.speaker, self.text, self.raw_text = [], [], [], []
        with open(filepath, encoding="utf-8") as f:
            for line in f:
                if not line.strip():
                    continue
                n, s, t, r = line.strip("\n").split("|")
                self.basename.append(n)
                self.speaker.append(s)
                self.text.append(t)
                self.raw_text.append(r)
        with open(os.path.join(self.preprocessed_path, "speakers.json")) as f:
            self.speaker_map = json.load(f)

    def __len__(self):
        return len(self.text)

    def __getitem__(self, idx):
        speaker = self.speaker[idx]
        item = {
            "id": self.basename[idx],
            "speaker": self.speaker_map[speaker],
            "raw_text": self.raw_text[idx],
            "text": np.array(text_to_sequence(self.text[idx], self.cleaners)),
            "word_boundary": np.load(os.path.join(
                self.preprocessed_path, "phones_per_word",
                f"{speaker}-phones_per_word-{self.basename[idx]}.npy")),
        }
        if self.load_spker_embed:
            item["spker_embed"] = np.load(os.path.join(
                self.preprocessed_path, "spker_embed",
                f"{speaker}-spker_embed.npy"))
        return item

    def collate(self, items):
        text_lens = np.array([len(d["text"]) for d in items])
        word_lens = np.array([len(d["word_boundary"]) for d in items])
        P = bucket_length(int(text_lens.max()), self.phone_buckets)
        W = bucket_length(int(word_lens.max()), self.phone_buckets)
        batch = {
            "ids": [d["id"] for d in items],
            "raw_texts": [d["raw_text"] for d in items],
            "speakers": np.array([d["speaker"] for d in items]),
            "texts": pad_1d([d["text"] for d in items], P),
            "src_lens": text_lens,
            "word_boundaries": pad_1d([d["word_boundary"] for d in items], W),
            "src_w_lens": word_lens,
        }
        if self.load_spker_embed:
            batch["spker_embeds"] = np.stack(
                [np.asarray(d["spker_embed"]).reshape(-1) for d in items]
            ).astype(np.float32)
        return batch

    def batches(self, batch_size=8):
        for i in range(0, len(self), batch_size):
            yield self.collate([self[j]
                                for j in range(i, min(i + batch_size,
                                                      len(self)))])
