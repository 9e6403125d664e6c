"""Voice activity detection with the reference's segmentation API.

API parity with reference ppasr/infer_utils/vad_predictor.py:11-213
(``get_speech_timestamps`` offline segmentation with prob threshold 0.5 /
neg-threshold hysteresis, min-speech 250 ms, min-silence 100 ms, 30 ms pad;
``stream_vad`` incremental start/end events; ``reset_states``).

The reference runs the Silero ONNX model. Here:
- default scoring is a log-RMS-energy sigmoid calibrated against the
  utterance's noise floor — dependency-free and adequate for segmenting
  long recordings;
- ``model_dir`` loads a learned Silero-style conv+LSTM JAX model
  (``VADModel`` below) trained with tools-of-your-choice; it plugs into the
  same ``_frame_probs`` hook.
"""
import os

import numpy as np


class VADModel:
    """Silero-style conv + LSTM frame classifier in flax (the JAX
    re-implementation obligation of SURVEY.md §2.3 item 5). Weights live in
    ``vad_model.msgpack``; architecture: 4× strided conv1d → LSTM → dense
    sigmoid per 512-sample window."""

    def __init__(self, model_dir: str):
        import flax.linen as nn
        import jax
        import jax.numpy as jnp
        from flax import serialization

        class _Net(nn.Module):
            @nn.compact
            def __call__(self, x, carry=None):
                # x: [B, 512] raw samples
                h = x[..., None]
                for feat, stride in [(16, 4), (32, 4), (48, 4), (64, 2)]:
                    h = nn.Conv(feat, (5,), strides=(stride,),
                                padding='SAME')(h)
                    h = nn.relu(h)
                h = h.reshape(h.shape[0], -1)
                cell = nn.OptimizedLSTMCell(64)
                if carry is None:
                    carry = cell.initialize_carry(
                        jax.random.PRNGKey(0), (h.shape[0], 64))
                carry, out = cell(carry, nn.Dense(64)(h))
                prob = nn.sigmoid(nn.Dense(1)(out))[:, 0]
                return prob, carry

        self._net = _Net()
        path = os.path.join(model_dir, 'vad_model.msgpack')
        shape = jax.eval_shape(lambda: self._net.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 512))))
        with open(path, 'rb') as f:
            self._params = serialization.from_bytes(shape, f.read())
        self._carry = None
        self._fn = jax.jit(lambda p, x, c: self._net.apply(p, x, carry=c))
        self._jnp = jnp

    def reset(self):
        self._carry = None

    def __call__(self, windows: np.ndarray) -> np.ndarray:
        """[N, 512] windows → [N] speech probabilities (stateful)."""
        probs = []
        for i in range(windows.shape[0]):
            p, self._carry = self._fn(self._params,
                                      self._jnp.asarray(windows[i:i + 1]),
                                      self._carry)
            probs.append(float(p[0]))
        return np.asarray(probs, np.float32)


def _packaged_silero_path():
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        '..', 'assets', 'silero_vad_v3.npz')


class VADPredictor:
    """Scoring backend priority: converted Silero-VAD v3 weights (packaged
    asset or ``model_dir/silero_vad_v3.npz``) > trained ``VADModel``
    checkpoint > log-RMS energy heuristic."""

    def __init__(self, window_size_samples: int = 512,
                 sampling_rate: int = 16000, model_dir: str = None):
        self.window_size_samples = window_size_samples
        self.sampling_rate = sampling_rate
        self.model = None
        silero_candidates = [_packaged_silero_path()]
        if model_dir:
            silero_candidates.insert(
                0, os.path.join(model_dir, 'silero_vad_v3.npz'))
        for path in silero_candidates:
            if os.path.exists(path):
                try:
                    from ppasr_tpu.infer_utils.silero_jax import SileroVAD
                    self.model = SileroVAD(
                        path, 16000 if sampling_rate >= 16000 else 8000)
                    break
                except Exception:
                    self.model = None
        if self.model is None and model_dir and os.path.exists(
                os.path.join(model_dir, 'vad_model.msgpack')):
            try:
                self.model = VADModel(model_dir)
            except Exception:
                self.model = None
        self.reset_states()

    def reset_states(self):
        self._stream_buf = np.zeros(0, np.float32)
        self._stream_pos = 0
        self._triggered = False
        self._temp_end = 0
        self._noise_floor = None
        if self.model is not None:
            self.model.reset()

    # ------------------------------------------------------------- scoring

    def _frame_probs(self, wav: np.ndarray) -> np.ndarray:
        """[num_windows] speech probabilities: learned model when loaded,
        else log-RMS energy relative to the estimated noise floor."""
        w = self.window_size_samples
        n = len(wav) // w
        if n == 0:
            return np.zeros(0, np.float32)
        frames = wav[:n * w].reshape(n, w)
        if self.model is not None:
            return self.model(frames)
        rms_db = 10 * np.log10(np.mean(frames ** 2, axis=1) + 1e-10)
        floor = self._noise_floor
        if floor is None:
            floor = np.percentile(rms_db, 10)
        # keep a running floor for streaming use
        self._noise_floor = floor if self._noise_floor is None \
            else 0.95 * self._noise_floor + 0.05 * np.percentile(rms_db, 10)
        # ~12 dB above floor → confident speech
        return 1.0 / (1.0 + np.exp(-(rms_db - floor - 6.0) / 3.0))

    # ------------------------------------------------------------- offline

    def get_speech_timestamps(self, wav: np.ndarray,
                              threshold: float = 0.5,
                              min_speech_duration_ms: int = 250,
                              min_silence_duration_ms: int = 100,
                              speech_pad_ms: int = 30):
        """Offline segmentation (reference vad_predictor.py:106-175).
        Returns [{'start': sample, 'end': sample}, ...]."""
        wav = np.asarray(wav, np.float32)
        sr, w = self.sampling_rate, self.window_size_samples
        self._noise_floor = None
        if self.model is not None:
            self.model.reset()   # fresh LSTM state per offline utterance
        probs = self._frame_probs(wav)
        neg_threshold = threshold - 0.15
        min_speech = sr * min_speech_duration_ms / 1000
        min_silence = sr * min_silence_duration_ms / 1000
        pad = int(sr * speech_pad_ms / 1000)

        speeches = []
        triggered = False
        current = {}
        temp_end = 0
        for i, p in enumerate(probs):
            pos = i * w
            if p >= threshold and temp_end:
                temp_end = 0
            if p >= threshold and not triggered:
                triggered = True
                current = {'start': pos}
                continue
            if p < neg_threshold and triggered:
                if not temp_end:
                    temp_end = pos
                if pos - temp_end < min_silence:
                    continue
                current['end'] = temp_end
                if current['end'] - current['start'] > min_speech:
                    speeches.append(current)
                current = {}
                triggered = False
                temp_end = 0
        if triggered and current:
            current['end'] = len(wav)
            if current['end'] - current['start'] > min_speech:
                speeches.append(current)

        for i, s in enumerate(speeches):
            s['start'] = int(max(0, s['start'] - pad))
            s['end'] = int(min(len(wav), s['end'] + pad))
        return speeches

    # ------------------------------------------------------------ streaming

    def stream_vad(self, chunk: np.ndarray, threshold: float = 0.5,
                   min_silence_duration_ms: int = 100):
        """Incremental start/end events (reference vad_predictor.py:177-213).
        Returns list of {'start': sample} / {'end': sample} events."""
        sr, w = self.sampling_rate, self.window_size_samples
        self._stream_buf = np.concatenate(
            [self._stream_buf, np.asarray(chunk, np.float32)])
        min_silence = sr * min_silence_duration_ms / 1000
        neg_threshold = threshold - 0.15
        events = []
        while len(self._stream_buf) >= w:
            window = self._stream_buf[:w]
            self._stream_buf = self._stream_buf[w:]
            p = float(self._frame_probs(window)[0]) \
                if len(window) >= w else 0.0
            pos = self._stream_pos
            self._stream_pos += w
            if p >= threshold and self._temp_end:
                self._temp_end = 0
            if p >= threshold and not self._triggered:
                self._triggered = True
                events.append({'start': pos})
                continue
            if p < neg_threshold and self._triggered:
                if not self._temp_end:
                    self._temp_end = pos
                if pos - self._temp_end >= min_silence:
                    events.append({'end': self._temp_end + w})
                    self._triggered = False
                    self._temp_end = 0
        return events
