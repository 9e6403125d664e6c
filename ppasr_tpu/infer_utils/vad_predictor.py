"""Voice activity detection with the reference's segmentation API.

API parity with reference ppasr/infer_utils/vad_predictor.py:11-213
(``get_speech_timestamps`` offline segmentation with prob threshold 0.5 /
neg-threshold hysteresis, min-speech 250 ms, min-silence 100 ms, 30 ms pad;
``stream_vad`` incremental start/end events; ``reset_states``).

The reference runs the Silero ONNX model; this implementation scores frames
with a log-RMS-energy sigmoid calibrated against the utterance's noise floor
— dependency-free and adequate for segmentation of long recordings. The
scoring function is isolated in ``_frame_probs`` so a learned JAX VAD can
drop in.
"""
import numpy as np


class VADPredictor:
    def __init__(self, window_size_samples: int = 512,
                 sampling_rate: int = 16000):
        self.window_size_samples = window_size_samples
        self.sampling_rate = sampling_rate
        self.reset_states()

    def reset_states(self):
        self._stream_buf = np.zeros(0, np.float32)
        self._stream_pos = 0
        self._triggered = False
        self._temp_end = 0
        self._noise_floor = None

    # ------------------------------------------------------------- scoring

    def _frame_probs(self, wav: np.ndarray) -> np.ndarray:
        """[num_windows] speech probabilities from log-RMS energy relative to
        the estimated noise floor."""
        w = self.window_size_samples
        n = len(wav) // w
        if n == 0:
            return np.zeros(0, np.float32)
        frames = wav[:n * w].reshape(n, w)
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
