"""Host-side audio featurizer.

Capability parity with reference
ppasr/data_utils/featurizer/audio_featurizer.py:8-154: resample →
dB-normalize → one of linear / mfcc / fbank. The kaldi math lives in
ppasr_tpu/ops/fbank.py (shared with the batched on-device path); dither is
applied only when train=True, as in the reference (:106,128).
"""
import numpy as np

from ppasr_tpu.data.audio import AudioSegment
from ppasr_tpu.ops import fbank as F


class AudioFeaturizer:
    def __init__(self,
                 feature_method: str = 'fbank',
                 n_mels: int = 80,
                 n_mfcc: int = 40,
                 sample_rate: int = 16000,
                 use_dB_normalization: bool = True,
                 target_dB: float = -20,
                 train: bool = False):
        self._feature_method = feature_method
        self._target_sample_rate = sample_rate
        self._n_mels = n_mels
        self._n_mfcc = n_mfcc
        self._use_dB_normalization = use_dB_normalization
        self._target_dB = target_dB
        self._train = train
        self._rng = np.random.default_rng()

    def featurize(self, audio_segment: AudioSegment) -> np.ndarray:
        """AudioSegment → [T, D] float32 features."""
        if audio_segment.sample_rate != self._target_sample_rate:
            audio_segment.resample(self._target_sample_rate)
        if self._use_dB_normalization:
            audio_segment.normalize(target_db=self._target_dB)
        sr = audio_segment.sample_rate
        if self._feature_method == 'linear':
            return F.linear_numpy(audio_segment.samples, sr)
        dither = 1.0 if self._train else 0.0
        samples = audio_segment.to('int16').astype(np.float32)
        if self._feature_method == 'mfcc':
            return F.mfcc_numpy(samples, sr, num_mel_bins=self._n_mels,
                                num_ceps=self._n_mfcc, dither=dither,
                                rng=self._rng)
        if self._feature_method == 'fbank':
            return F.fbank_numpy(samples, sr, num_mel_bins=self._n_mels,
                                 dither=dither, rng=self._rng)
        raise ValueError(f"unsupported feature method: {self._feature_method}")

    def waveform(self, audio_segment: AudioSegment) -> np.ndarray:
        """AudioSegment → int16-scaled float32 waveform with the same
        sample-domain prep as featurize (resample + dB-normalize), for the
        on-device training frontend (ops/frontend.py) which runs the
        fbank/dither stage inside the jitted train step."""
        if audio_segment.sample_rate != self._target_sample_rate:
            audio_segment.resample(self._target_sample_rate)
        if self._use_dB_normalization:
            audio_segment.normalize(target_db=self._target_dB)
        return audio_segment.to('int16').astype(np.float32)

    @property
    def feature_dim(self) -> int:
        """Feature dimensionality (reference audio_featurizer.py:140-154)."""
        if self._feature_method == 'linear':
            return 161
        if self._feature_method == 'mfcc':
            return self._n_mfcc
        if self._feature_method == 'fbank':
            return self._n_mels
        raise ValueError(f"unsupported feature method: {self._feature_method}")
