"""Dataset + collate: manifest entries → padded numpy batches.

Capability parity with reference ppasr/data_utils/reader.py:17-117 (txt or
binary manifest; per-item audio read → audio augmentation → featurize → CMVN →
feature augmentation) and collate_fn.py:7-41 (pad time and label axes, label
pad −1, int64 lengths, shuffle within the sorted batch).

TPU-first addition: ``collate_fn`` can round the padded time/label axes up to
a bucket multiple so the jitted train step sees a small, fixed set of shapes
(pad-to-bucket avoids an XLA recompile per batch — SURVEY.md §7.3
"variable-length batches").
"""
import random

import numpy as np

from ppasr_tpu.data.audio import AudioSegment
from ppasr_tpu.data.augmentor.augmentation import AugmentationPipeline
from ppasr_tpu.data.binary import DatasetReader
from ppasr_tpu.data.featurizer.audio_featurizer import AudioFeaturizer
from ppasr_tpu.data.featurizer.text_featurizer import TextFeaturizer
from ppasr_tpu.data.manifest import read_manifest
from ppasr_tpu.data.normalizer import FeatureNormalizer


class ASRDataset:
    """Indexable dataset of (features [T, D] float32, token ids [U] int32)."""

    def __init__(self,
                 manifest_path: str,
                 vocab_filepath: str,
                 mean_istd_filepath: str = None,
                 preprocess_conf: dict = None,
                 min_duration: float = 0.5,
                 max_duration: float = 20,
                 manifest_type: str = 'txt',
                 augmentation_config: list = None,
                 train: bool = False,
                 return_raw: bool = False):
        preprocess_conf = dict(preprocess_conf or {})
        self.dataset_reader = None
        if manifest_type == 'txt':
            if max_duration < 0:
                max_duration = float('inf')
            self.manifest = read_manifest(manifest_path,
                                          max_duration=max_duration,
                                          min_duration=min_duration)
        elif manifest_type == 'binary':
            self.dataset_reader = DatasetReader(manifest_path,
                                                min_duration=min_duration,
                                                max_duration=max_duration)
            self.manifest = None
        else:
            raise ValueError(f"unsupported manifest_type: {manifest_type}")

        self.audio_featurizer = AudioFeaturizer(**preprocess_conf, train=train)
        self.text_featurizer = TextFeaturizer(vocab_filepath)
        self.normalizer = (FeatureNormalizer(mean_istd_filepath)
                           if mean_istd_filepath else None)
        self.augmentation = AugmentationPipeline(augmentation_config) \
            if (train and augmentation_config) else None
        self._feature_pools = {}
        # raw mode (device-frontend training, ops/frontend.py): __getitem__
        # returns the int16-scaled float waveform after host audio
        # augmentation; fbank/dither/SpecAugment run on device inside the
        # train step. Feature-domain host augmentors are skipped — the
        # frontend applies them from the same augmentation config.
        self.return_raw = bool(return_raw)
        if self.return_raw and manifest_type != 'txt':
            raise ValueError("return_raw requires a txt manifest of wavs")
        # native C++ batch loader (csrc/audio_pipeline.cpp): used by
        # DataLoader when every enabled audio-augmentation stage has a
        # native implementation; per-item fallback to the Python path
        self._native_raw = False
        if self.return_raw:
            try:
                from ppasr_tpu.data import native_pipeline as _np_mod
                self._native_raw = (_np_mod.available()
                                    and _np_mod.native_stages_only(
                                        self.augmentation))
                self._native_mod = _np_mod
            except Exception:
                self._native_raw = False
        self._sample_rate = int(preprocess_conf.get('sample_rate', 16000))
        self._target_db = (float(preprocess_conf.get('target_dB', -20))
                           if preprocess_conf.get('use_dB_normalization',
                                                  True)
                           else None)

    def __len__(self):
        if self.dataset_reader is not None:
            return len(self.dataset_reader)
        return len(self.manifest)

    def entry(self, idx: int) -> dict:
        if self.dataset_reader is not None:
            return self.dataset_reader.get_data(idx)
        return self.manifest[idx]

    @property
    def durations(self):
        return [self.entry(i).get('duration', 0.0) for i in range(len(self))]

    def __getitem__(self, idx: int):
        instance = self.entry(idx)
        path = instance['audio_filepath']
        if self.return_raw:
            if path.endswith('.npy'):
                raise ValueError(
                    "raw mode cannot read precomputed feature manifests; "
                    "point train_manifest at the wav manifest")
            if 'start_time' in instance:
                audio = AudioSegment.slice_from_file(
                    path, start=instance['start_time'],
                    end=instance['end_time'])
            else:
                audio = AudioSegment.from_file(path)
            if self.augmentation is not None:
                self.augmentation.transform_audio(audio)
            samples = self.audio_featurizer.waveform(audio)
            tokens = np.asarray(
                self.text_featurizer.featurize(instance['text']), np.int32)
            return samples.astype(np.float32), tokens
        if path.endswith('.npy'):
            # precomputed pooled feature file with frame-slice bounds
            # (reference reader.py:52-60 / trainer extract_features).
            # Pooled files are ~20 MB; np.load per item would re-read the
            # whole pool for a ~100 KB slice, so keep a read-only mmap per
            # path (shared safely across loader threads) and copy the slice.
            pool = self._feature_pools.get(path)
            if pool is None:
                pool = np.load(path, mmap_mode='r')
                self._feature_pools[path] = pool
            feature = np.array(pool[instance['start_frame']:
                                    instance['end_frame'], :])
        else:
            if 'start_time' in instance:
                audio = AudioSegment.slice_from_file(
                    path, start=instance['start_time'],
                    end=instance['end_time'])
            else:
                audio = AudioSegment.from_file(path)
            if self.augmentation is not None:
                self.augmentation.transform_audio(audio)
            feature = self.audio_featurizer.featurize(audio)
        if self.normalizer is not None and self.normalizer.mean is not None:
            feature = self.normalizer.apply(feature)
        if self.augmentation is not None:
            feature = self.augmentation.transform_feature(feature)
        tokens = np.asarray(self.text_featurizer.featurize(instance['text']),
                            np.int32)
        return feature.astype(np.float32), tokens

    def load_raw_batch(self, indices, label_bucket: int = 16, pad_to=None,
                       n_threads: int = 4):
        """Native-batched raw collate: indices → (wavs [B, S] int16, labels
        [B, U] i32 pad −1, wav_lens [B] i64, label_lens [B] i64).

        Runs the whole wav-read → augment → normalize chain in C++ threads
        (csrc/audio_pipeline.cpp) with per-item Python fallback; returns
        None when the native path is unavailable (caller uses __getitem__)."""
        if not self._native_raw:
            return None
        entries = [self.entry(i) for i in indices]
        params = [self._native_mod.draw_augment_params(self.augmentation)
                  for _ in entries]
        # capacity: duration × slowest speed rate (longest stretch) + slack
        stretch = 1.0
        for p in params:
            if p.speed_rate > 0:
                stretch = max(stretch, 1.0 / p.speed_rate)
        max_s = max(int(float(e.get('duration', 0.0)) * self._sample_rate
                        * stretch) + 256 for e in entries)
        if pad_to is not None:
            max_s = max(max_s, int(pad_to[0]))
        max_s = _round_up(max_s, RAW_SAMPLE_BUCKET)
        wavs, lens = self._native_mod.load_raw_batch(
            entries, params, self._sample_rate, self._target_db, max_s,
            n_threads=n_threads)
        for j, i in enumerate(indices):
            if lens[j] < 0:  # native fast path rejected → Python item path
                w, _ = self[i]
                n = min(len(w), max_s)
                wavs[j, :n] = w[:n]
                wavs[j, n:] = 0.0
                lens[j] = n
        texts = [np.asarray(self.text_featurizer.featurize(e['text']),
                            np.int32) for e in entries]
        max_u = max(max(len(t) for t in texts), 1)
        if pad_to is not None:
            max_u = max(max_u, int(pad_to[1]))
        max_u = _round_up(max_u, max(label_bucket, 1))
        labels = np.full((len(entries), max_u), -1, np.int32)
        label_lens = np.zeros((len(entries),), np.int64)
        for j, t in enumerate(texts):
            labels[j, :len(t)] = t
            label_lens[j] = len(t)
        return (_wav_to_int16(wavs), labels, lens.astype(np.int64),
                label_lens)

    @property
    def feature_dim(self):
        return self.audio_featurizer.feature_dim

    @property
    def vocab_size(self):
        return self.text_featurizer.vocab_size

    @property
    def vocab_list(self):
        return self.text_featurizer.vocab_list


def _round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def collate_fn(batch, time_bucket: int = 1, label_bucket: int = 1,
               shuffle: bool = True, pad_to=None):
    """List of (feature [T, D], tokens [U]) → padded arrays.

    Returns (inputs [B, Tmax, D] f32, labels [B, Umax] i32 pad −1,
    input_lens [B] i64, label_lens [B] i64) — the reference collate contract
    (collate_fn.py:7-41). ``time_bucket``/``label_bucket`` round the padded
    axes up to a multiple for shape stability under jit.

    ``pad_to=(frames, labels)`` raises the pad targets to at least these
    values: multi-process DP ranks must agree on the GLOBAL batch shape
    fed to make_array_from_process_local_data, so every rank pads to a
    hint computed from the global batch's manifest metadata; it also
    implements dataset_conf.pad_to_max (one static shape → one jit
    compile)."""
    if shuffle:
        batch = list(batch)
        random.shuffle(batch)
    if batch[0][0].ndim == 1:
        # raw-waveform items ([S] samples) — device-frontend training path
        return collate_raw_fn(batch, label_bucket=max(label_bucket, 1),
                              pad_to=pad_to)
    bsz = len(batch)
    dim = batch[0][0].shape[1]
    max_t = max(f.shape[0] for f, _ in batch)
    max_u = max(max(len(t) for _, t in batch), 1)
    if pad_to is not None:
        max_t = max(max_t, int(pad_to[0]))
        max_u = max(max_u, int(pad_to[1]))
    max_t = _round_up(max_t, time_bucket)
    max_u = _round_up(max_u, label_bucket)

    inputs = np.zeros((bsz, max_t, dim), np.float32)
    labels = np.full((bsz, max_u), -1, np.int32)
    input_lens = np.zeros((bsz,), np.int64)
    label_lens = np.zeros((bsz,), np.int64)
    for i, (feature, tokens) in enumerate(batch):
        t, u = feature.shape[0], len(tokens)
        inputs[i, :t] = feature
        labels[i, :u] = tokens
        input_lens[i] = t
        label_lens[i] = u
    return inputs, labels, input_lens, label_lens


# raw-waveform collate buckets: samples rounded to 64 frame shifts (0.64 s)
# for jit shape stability — mirrors collate_fn's time_bucket=64 on frames
RAW_SAMPLE_BUCKET = 64 * 160


def _wav_to_int16(wavs: np.ndarray) -> np.ndarray:
    """Quantize int16-scaled float waveforms to int16 for the host→device
    transfer: halves the raw-batch bytes (the device-frontend train step
    ships the audio every step, and the transfer link — PCIe, or a tunnel
    in dev environments — is the constrained resource). Audio is 16-bit at
    the source; the ≤0.5-LSB rounding this re-introduces after float
    augmentation sits well below the frontend's train-time dither (±1.0 on
    the same scale). The train step casts back to f32 on device."""
    return np.clip(np.rint(wavs), -32768, 32767).astype(np.int16)


def collate_raw_fn(batch, sample_bucket: int = RAW_SAMPLE_BUCKET,
                   label_bucket: int = 16, shuffle: bool = False,
                   pad_to=None):
    """List of (waveform [S], tokens [U]) → padded raw batch.

    Returns (wavs [B, Smax] int16, labels [B, Umax] i32 pad −1, wav_lens
    [B] i64 sample counts, label_lens [B] i64). ``pad_to=(samples,
    labels)`` raises the pad targets (same cross-rank-agreement contract
    as collate_fn)."""
    if shuffle:
        batch = list(batch)
        random.shuffle(batch)
    bsz = len(batch)
    max_s = max(w.shape[0] for w, _ in batch)
    max_u = max(max(len(t) for _, t in batch), 1)
    if pad_to is not None:
        max_s = max(max_s, int(pad_to[0]))
        max_u = max(max_u, int(pad_to[1]))
    max_s = _round_up(max_s, sample_bucket)
    max_u = _round_up(max_u, label_bucket)

    wavs = np.zeros((bsz, max_s), np.float32)
    labels = np.full((bsz, max_u), -1, np.int32)
    wav_lens = np.zeros((bsz,), np.int64)
    label_lens = np.zeros((bsz,), np.int64)
    for i, (w, tokens) in enumerate(batch):
        s, u = w.shape[0], len(tokens)
        wavs[i, :s] = w
        labels[i, :u] = tokens
        wav_lens[i] = s
        label_lens[i] = u
    return _wav_to_int16(wavs), labels, wav_lens, label_lens
