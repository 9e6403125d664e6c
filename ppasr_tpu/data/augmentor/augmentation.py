"""Augmentation pipeline: JSON spec → ordered audio/feature stages with
per-stage probability (reference ppasr/data_utils/augmentor/augmentation.py:
19-154)."""
import random

from ppasr_tpu.data.augmentor.audio_augmentors import (NoisePerturbAugmentor,
                                                       ResampleAugmentor,
                                                       ShiftPerturbAugmentor,
                                                       SpeedPerturbAugmentor,
                                                       VolumePerturbAugmentor)
from ppasr_tpu.data.augmentor.feature_augmentors import (SpecAugmentor,
                                                         SpecSubAugmentor)
from ppasr_tpu.utils.logger import setup_logger

logger = setup_logger(__name__)

_AUDIO_TYPES = {
    'noise': NoisePerturbAugmentor,
    'resample': ResampleAugmentor,
    'speed': SpeedPerturbAugmentor,
    'shift': ShiftPerturbAugmentor,
    'volume': VolumePerturbAugmentor,
}
_FEATURE_TYPES = {
    'specaug': SpecAugmentor,
    'specsub': SpecSubAugmentor,
}


class AugmentationPipeline:
    def __init__(self, config: list):
        """``config`` is the parsed augmentation.json list:
        [{type, aug_type, params, prob}, ...]."""
        self._audio_stages = []
        self._feature_stages = []
        for spec in (config or []):
            aug_type = spec.get('aug_type')
            name = spec.get('type')
            prob = float(spec.get('prob', 0.0))
            params = dict(spec.get('params', {}))
            try:
                if aug_type == 'audio':
                    aug = _AUDIO_TYPES[name](**params)
                    self._audio_stages.append((aug, prob, name))
                elif aug_type == 'feature':
                    aug = _FEATURE_TYPES[name](**params)
                    self._feature_stages.append((aug, prob, name))
                else:
                    logger.warning(f"unknown aug_type: {aug_type}")
            except Exception as e:
                logger.warning(f"skipping augmentor {name}: {e}")

    def transform_audio(self, audio_segment):
        for aug, prob, _ in self._audio_stages:
            if random.random() < prob:
                aug.transform_audio(audio_segment)

    def transform_feature(self, feature):
        for aug, prob, _ in self._feature_stages:
            if random.random() < prob:
                feature = aug.transform_feature(feature)
        return feature
