"""Inference engine wrapper: exported artifact → jitted callables.

Capability parity with reference ppasr/infer_utils/inference_predictor.py:
11-220 (paddle.inference wrapper with named handles, predict /
predict_chunk_conformer / predict_chunk_deepspeech / reset_stream). Under
JAX the "engine" is a set of AOT-compiled jit functions over the loaded
params; streaming caches are the device-resident state pytree instead of
named input/output handles — they never cross the host boundary (the
round-trip SURVEY.md §3.5 flags as the reference's key inefficiency).

``PPASRPredictor`` (ppasr_tpu/predict.py) layers featurization and decoding
on top; use this class directly for raw feature→posterior serving.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ppasr_tpu.models.factory import build_model
from ppasr_tpu.utils.logger import setup_logger

logger = setup_logger(__name__)


class InferencePredictor:
    def __init__(self, model_dir: str, mean_istd_path: str = None,
                 use_gpu: bool = True, use_stablehlo: bool = None):
        """``use_stablehlo``: None = auto (use serialized StableHLO
        artifacts when present), True/False to force. In StableHLO mode
        the model zoo is never imported — the computation comes from
        ``offline.stablehlo``/``chunk.stablehlo`` and the params from
        msgpack, mirroring the reference predictor that only ever loads
        the exported static graph (SURVEY.md §1 control-flow note)."""
        with open(os.path.join(model_dir, 'inference.json'), 'r',
                  encoding='utf-8') as f:
            conf = json.load(f)
        self.use_model = conf['use_model']
        self.streaming = conf['streaming']
        self.input_dim = conf['input_dim']
        self.vocab_size = conf['vocab_size']

        from ppasr_tpu.infer_utils.stablehlo_export import (
            load_exported, exported_arg, zero_state_from_exported)
        exp_off = exp_chunk = None
        if use_stablehlo is not False:
            exp_off, exp_chunk = load_exported(model_dir)
        # a streaming model needs BOTH artifacts — offline-only would leave
        # predict_chunk_* broken; auto mode falls back to the code path
        complete = exp_off is not None and (exp_chunk is not None
                                            or not self.streaming)
        if use_stablehlo and not complete:
            raise FileNotFoundError(
                f"use_stablehlo=True but StableHLO artifacts in {model_dir}"
                f" are missing/incomplete (re-export with "
                f"save_stablehlo=True)")
        self.stablehlo = complete

        if self.stablehlo:
            if mean_istd_path:
                logger.warning(
                    "mean_istd_path is ignored in StableHLO mode — CMVN "
                    "stats were baked into the graph at export time")
            self.model = None
            params_spec = exported_arg(exp_off, 0)
            self.params = self._load_params(
                model_dir,
                jax.tree.map(lambda a: np.zeros(a.shape, a.dtype),
                             params_spec))
            self._predict = jax.jit(exp_off.call)
            self._chunk = jax.jit(exp_chunk.call) if exp_chunk else None
            state_index = 3 if self.use_model == 'deepspeech2' else 2
            self._init_state = (
                lambda *_: zero_state_from_exported(exp_chunk, state_index)
            ) if exp_chunk else None
            logger.info("serving from StableHLO artifacts (no model code)")
        else:
            self.model = build_model(
                self.use_model, self.input_dim, self.vocab_size,
                streaming=self.streaming,
                encoder_conf=conf.get('encoder_conf'),
                decoder_conf=conf.get('decoder_conf'),
                model_conf=conf.get('model_conf'),
                mean_istd_path=mean_istd_path)
            self.params = self._load_params(model_dir, self._params_shape())
            self._predict = jax.jit(lambda p, s, l: self.model.apply(
                p, s, l, method='get_encoder_out'))
            if self.use_model == 'deepspeech2':
                self._chunk = jax.jit(lambda p, x, xl, st: self.model.apply(
                    p, x, xl, st, method='get_encoder_out_chunk'))
                self._init_state = lambda b, *_: self.model.init_state(b)
            else:
                self._chunk = jax.jit(lambda p, x, st: self.model.apply(
                    p, x, st, method='get_encoder_out_chunk'))
                self._init_state = \
                    lambda b, cache: self.model.init_state(b, cache)
        self._state = None

    def _load_params(self, model_dir, shape_tree):
        full = os.path.join(model_dir, 'model.msgpack')
        quant = os.path.join(model_dir, 'model_quant.msgpack')
        if os.path.exists(full):
            with open(full, 'rb') as f:
                return serialization.from_bytes(shape_tree, f.read())
        if os.path.exists(quant):
            from ppasr_tpu.utils.quant import dequantize_params
            with open(quant, 'rb') as f:
                blob = serialization.msgpack_restore(f.read())
            zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                                 shape_tree)
            return dequantize_params(blob, zeros)
        raise FileNotFoundError(f"no model artifact in {model_dir}")

    def _params_shape(self):
        rng = jax.random.PRNGKey(0)
        return jax.eval_shape(lambda: self.model.init(
            {'params': rng, 'dropout': rng, 'chunk': rng},
            jnp.zeros((1, 64, self.input_dim), jnp.float32),
            jnp.asarray([64]), jnp.asarray([[1, -1]], jnp.int32),
            jnp.asarray([1]), deterministic=True))

    # ---------------------------------------------------------------- offline

    def predict(self, speech: np.ndarray, speech_lens: np.ndarray):
        """[B, T, D] features → ([B, T', V] CTC posteriors, [B] lens)."""
        if self.stablehlo:
            from ppasr_tpu.infer_utils.stablehlo_export import MAX_FRAMES
            if speech.shape[1] > MAX_FRAMES:
                raise ValueError(
                    f"input of {speech.shape[1]} frames exceeds the "
                    f"exported graph's bound ({MAX_FRAMES}); use VAD "
                    f"long-audio mode or the code path")
            # the exported graph's time dim is symbolic in 16-frame units
            # with tb >= 2 (T >= 32); padding is masked out via speech_lens
            target = max(32, -(-speech.shape[1] // 16) * 16)
            if speech.shape[1] != target:
                pad = target - speech.shape[1]
                speech = np.pad(np.asarray(speech),
                                ((0, 0), (0, pad), (0, 0)))
        probs, olens = self._predict(self.params, jnp.asarray(speech),
                                     jnp.asarray(speech_lens))
        return np.asarray(probs), np.asarray(olens)

    # -------------------------------------------------------------- streaming

    def predict_chunk_conformer(self, x_chunk: np.ndarray,
                                required_cache_size: int = 64):
        """[1, T, D] feature chunk → [1, T', V] posteriors; the attention/
        conv cache state persists on device between calls (reference
        :184-212 carried att_cache/cnn_cache through host handles).
        StableHLO artifacts fix the window/cache sizes at export time
        (like the reference's streaming input spec)."""
        if self._state is None:
            self._state = self._init_state(x_chunk.shape[0],
                                           max(required_cache_size, 1))
        probs, self._state = self._chunk(self.params, jnp.asarray(x_chunk),
                                         self._state)
        return np.asarray(probs)

    def predict_chunk_deepspeech(self, x_chunk: np.ndarray):
        """[1, T, D] chunk → posteriors with h/c state carry
        (reference :147-182)."""
        if self._state is None:
            self._state = self._init_state(x_chunk.shape[0])
        lens = jnp.asarray([x_chunk.shape[1]])
        probs, olens, self._state = self._chunk(
            self.params, jnp.asarray(x_chunk), lens, self._state)
        return np.asarray(probs[:, :int(olens[0])])

    def reset_stream(self):
        """Drop the streaming state (reference :215-220)."""
        self._state = None
