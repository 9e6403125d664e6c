"""ctypes binding for the native raw-audio loader (csrc/audio_pipeline.cpp).

The C++ core executes the host-side job of device-frontend training — wav
read → noise/speed/shift/volume augmentation → dB-normalize → int16-scaled
floats — on a real thread pool, replacing the GIL-bound numpy chain in
loader threads (the reference runs this stage in paddle DataLoader worker
subprocesses, reference ppasr/trainer.py:107-112).

Randomness stays in Python: ``draw_augment_params`` samples the SAME
distributions as the host AugmentationPipeline (data/augmentor/
audio_augmentors.py) with the ``random`` module, and the C++ side applies
the drawn parameters deterministically. Items the native core can't handle
(non-PCM wav, resample-needed, odd-rate noise) come back with len −1 and
the caller falls back to the Python path per item.
"""
import ctypes
import os
import random
import subprocess

import numpy as np

from ppasr_tpu.utils.logger import setup_logger

logger = setup_logger(__name__)

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         'libaudio_pipeline.so')
_SRC_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), 'csrc', 'audio_pipeline.cpp')

MAX_NOISE = 2  # overlays per item (augmentation.json repetition default)


def _ensure_built():
    if os.path.exists(_LIB_PATH):
        return True
    if not os.path.exists(_SRC_PATH):
        return False
    try:
        logger.info("building native audio pipeline ...")
        subprocess.run(['g++', '-O3', '-std=c++17', '-fPIC', '-Wall',
                        '-pthread', '-shared', '-o', _LIB_PATH, _SRC_PATH],
                       check=True, capture_output=True)
        return True
    except Exception as e:
        logger.warning(f"native audio pipeline build failed: {e}")
        return False


_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _ensure_built():
        raise OSError("native audio pipeline unavailable")
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ap_load_batch.restype = ctypes.c_int
    lib.ap_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,          # paths, n
        ctypes.POINTER(ctypes.c_double),                        # starts
        ctypes.POINTER(ctypes.c_double),                        # ends
        ctypes.POINTER(ctypes.c_char_p),                        # noise paths
        ctypes.POINTER(ctypes.c_double),                        # snr
        ctypes.POINTER(ctypes.c_double),                        # noise offset
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,             # n_noise, max
        ctypes.POINTER(ctypes.c_double),                        # speed
        ctypes.POINTER(ctypes.c_double),                        # shift ms
        ctypes.POINTER(ctypes.c_double),                        # volume dB
        ctypes.c_int, ctypes.c_double, ctypes.c_int,            # rate/db/norm
        ctypes.POINTER(ctypes.c_float),                         # out
        ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,   # lens, max_s
        ctypes.c_int,                                           # threads
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


class ItemParams:
    """Augmentation decisions for one utterance (drawn in Python)."""
    __slots__ = ('noise_paths', 'snr_db', 'noise_offsets', 'speed_rate',
                 'shift_ms', 'volume_gain_db')

    def __init__(self):
        self.noise_paths = []
        self.snr_db = []
        self.noise_offsets = []
        self.speed_rate = 1.0
        self.shift_ms = 0.0
        self.volume_gain_db = 0.0


def draw_augment_params(augmentation) -> ItemParams:
    """Sample one utterance's augmentation decisions from the SAME stage
    list/probabilities as AugmentationPipeline.transform_audio
    (augmentation.py:53-56) using the same ``random`` module."""
    p = ItemParams()
    if augmentation is None:
        return p
    for aug, prob, name in augmentation._audio_stages:
        if random.random() >= prob:
            continue
        if name == 'noise':
            if not aug.noise_manifest:
                continue
            for _ in range(random.randint(1, aug.repetition)):
                entry = random.choice(aug.noise_manifest)
                snr = random.uniform(aug.min_snr_dB, aug.max_snr_dB)
                if len(p.noise_paths) < MAX_NOISE:
                    p.noise_paths.append(entry['audio_filepath'])
                    p.snr_db.append(snr)
                    p.noise_offsets.append(random.random())
        elif name == 'speed':
            p.speed_rate = float(random.choice(aug._rates))
        elif name == 'shift':
            p.shift_ms = random.uniform(aug.min_shift_ms, aug.max_shift_ms)
        elif name == 'volume':
            p.volume_gain_db = random.uniform(aug.min_gain_dBFS,
                                              aug.max_gain_dBFS)
        # 'resample' (prob 0.0 in the stock config) and unknown stages
        # have no native fast path; the Python fallback covers them when
        # enabled — draw_augment_params is only consulted for stages it
        # knows, so enabling resample disables the native path upstream.
    return p


def native_stages_only(augmentation) -> bool:
    """True when every enabled audio stage has a native implementation."""
    if augmentation is None:
        return True
    for _, prob, name in augmentation._audio_stages:
        if prob > 0.0 and name not in ('noise', 'speed', 'shift', 'volume'):
            return False
    return True


def load_raw_batch(entries, params, sample_rate: int, target_db,
                   max_samples: int, n_threads: int = 4):
    """Batched native load: list of manifest entries + per-item ItemParams →
    (wavs [n, max_samples] float32 int16-scaled, lens [n] int64).

    lens[i] == -1 marks items the native core rejected (caller falls back)."""
    lib = _load()
    n = len(entries)
    paths = (ctypes.c_char_p * n)(*[
        e['audio_filepath'].encode() for e in entries])
    starts = (ctypes.c_double * n)(*[
        float(e.get('start_time', -1.0)) for e in entries])
    ends = (ctypes.c_double * n)(*[
        float(e.get('end_time', -1.0)) for e in entries])
    noise_paths = (ctypes.c_char_p * (n * MAX_NOISE))()
    snr = (ctypes.c_double * (n * MAX_NOISE))()
    noff = (ctypes.c_double * (n * MAX_NOISE))()
    n_noise = (ctypes.c_int * n)()
    speed = (ctypes.c_double * n)()
    shift = (ctypes.c_double * n)()
    vol = (ctypes.c_double * n)()
    for i, pp in enumerate(params):
        n_noise[i] = len(pp.noise_paths)
        for k, (npth, s, off) in enumerate(zip(pp.noise_paths, pp.snr_db,
                                               pp.noise_offsets)):
            noise_paths[i * MAX_NOISE + k] = npth.encode()
            snr[i * MAX_NOISE + k] = s
            noff[i * MAX_NOISE + k] = off
        speed[i] = pp.speed_rate
        shift[i] = pp.shift_ms
        vol[i] = pp.volume_gain_db

    out = np.zeros((n, max_samples), np.float32)
    lens = np.zeros((n,), np.int64)
    rc = lib.ap_load_batch(
        paths, n, starts, ends, noise_paths, snr, noff, n_noise, MAX_NOISE,
        speed, shift, vol, int(sample_rate),
        float(target_db if target_db is not None else 0.0),
        1 if target_db is not None else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        max_samples, int(n_threads))
    if rc != 0:
        raise RuntimeError(f"ap_load_batch failed: {rc}")
    return out, lens
