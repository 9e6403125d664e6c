"""ctypes bindings for the native C++ CTC beam-search decoder.

The C++ core (csrc/ctc_decoder.cpp) is the native equivalent of the
reference's ``paddlespeech_ctcdecoders`` SWIG extension: utterance-parallel
offline batch decoding + stateful streaming decoders + ARPA LM fusion. Build
with ``make -C csrc`` (the library auto-builds on first import when a
compiler is available).
"""
import ctypes
import os
import subprocess

import numpy as np

from ppasr_tpu.utils.logger import setup_logger

logger = setup_logger(__name__)

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         'libctc_decoder.so')
_SRC_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), 'csrc', 'ctc_decoder.cpp')


def _ensure_built():
    if os.path.exists(_LIB_PATH):
        return True
    if not os.path.exists(_SRC_PATH):
        return False
    try:
        logger.info("building native CTC decoder ...")
        subprocess.run(['g++', '-O3', '-std=c++17', '-fPIC', '-Wall',
                        '-pthread', '-shared', '-o', _LIB_PATH, _SRC_PATH],
                       check=True, capture_output=True)
        return True
    except Exception as e:
        logger.warning(f"native decoder build failed: {e}")
        return False


_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _ensure_built():
        raise OSError("native CTC decoder unavailable")
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ctc_decoder_create.restype = ctypes.c_void_p
    lib.ctc_decoder_create.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double]
    lib.ctc_decoder_load_lm.restype = ctypes.c_int
    lib.ctc_decoder_load_lm.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p]
    lib.ctc_decoder_destroy.argtypes = [ctypes.c_void_p]
    lib.ctc_decoder_decode_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double)]
    lib.ctc_decoder_stream_reset.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ctc_decoder_stream_next.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int]
    lib.ctc_decoder_stream_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double)]
    _lib = lib
    return lib


class NativeBeamSearchDecoder:
    """Drop-in decoder with the BeamSearchDecoder surface, running in C++.

    Config parity with the reference decoder (beam_search_decoder.py:8-96):
    alpha/beta/beam_size/num_processes/cutoff_prob/cutoff_top_n +
    language_model_path (ARPA)."""

    def __init__(self, vocab_list, alpha: float = 2.2, beta: float = 4.3,
                 beam_size: int = 300, num_processes: int = 10,
                 cutoff_prob: float = 0.99, cutoff_top_n: int = 40,
                 language_model_path: str = None, blank_index: int = 0,
                 **_):
        self._lib = _load()
        self.vocab_list = list(vocab_list)
        self.num_processes = max(1, num_processes)
        self._handle = self._lib.ctc_decoder_create(
            len(vocab_list), blank_index, beam_size, cutoff_top_n,
            cutoff_prob, alpha, beta)
        self._lm_loaded = False
        if language_model_path and os.path.exists(language_model_path):
            joined = '\n'.join(self.vocab_list).encode('utf-8')
            rc = self._lib.ctc_decoder_load_lm(
                self._handle, language_model_path.encode('utf-8'), joined)
            if rc != 0:
                logger.warning(f"failed to load LM (ARPA/.klm) "
                               f"{language_model_path}; decoding LM-free")
            self._lm_loaded = rc == 0
        self.reset()

    def __del__(self):
        try:
            if getattr(self, '_handle', None):
                self._lib.ctc_decoder_destroy(self._handle)
        except Exception:
            pass

    def _to_text(self, ids):
        return ''.join(self.vocab_list[i] for i in ids)

    # ------------------------------------------------------------- offline

    def decode_batch(self, probs_batch, lens):
        probs = np.ascontiguousarray(np.asarray(probs_batch), np.float32)
        bsz, t_max, vocab = probs.shape
        lens_arr = np.ascontiguousarray(np.asarray(lens), np.int32)
        max_out = t_max
        out_tokens = np.zeros((bsz, max_out), np.int32)
        out_lens = np.zeros((bsz,), np.int32)
        out_scores = np.zeros((bsz,), np.float64)
        self._lib.ctc_decoder_decode_batch(
            self._handle,
            probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            bsz, t_max, vocab,
            lens_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            self.num_processes, max_out,
            out_tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return [(float(out_scores[b]),
                 self._to_text(out_tokens[b, :out_lens[b]]))
                for b in range(bsz)]

    def decode(self, probs):
        probs = np.asarray(probs)
        return self.decode_batch(probs[None], [probs.shape[0]])[0]

    # ------------------------------------------------------------ streaming

    def reset(self, num_streams: int = 1):
        self._lib.ctc_decoder_stream_reset(self._handle, num_streams)

    def decode_chunk(self, chunk_probs, stream_idx: int = 0):
        probs = np.ascontiguousarray(np.asarray(chunk_probs), np.float32)
        if probs.size:
            self._lib.ctc_decoder_stream_next(
                self._handle, stream_idx,
                probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                probs.shape[0], probs.shape[1])
        return self.current(stream_idx)

    def current(self, stream_idx: int = 0):
        max_out = 4096
        out_tokens = np.zeros((max_out,), np.int32)
        out_len = ctypes.c_int(0)
        out_score = ctypes.c_double(0.0)
        self._lib.ctc_decoder_stream_decode(
            self._handle, stream_idx, max_out,
            out_tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ctypes.byref(out_len), ctypes.byref(out_score))
        return float(out_score.value), \
            self._to_text(out_tokens[:out_len.value])
