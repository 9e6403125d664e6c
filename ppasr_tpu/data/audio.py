"""In-memory mono float32 audio segment.

Capability parity with reference ppasr/data_utils/audio.py:14-574
(constructors from_file / slice_from_file / from_bytes / from_pcm_bytes /
from_ndarray / concatenate / make_silence; transforms gain_db, change_speed,
normalize, resample, pad_silence, shift, subsegment, random_subsegment,
convolve, add_noise; properties samples/sample_rate/num_samples/duration/
rms_db), re-built on the standard library + scipy:

- WAV I/O uses the stdlib ``wave``/``struct`` modules (this image has no
  soundfile/PyAV); other containers raise a clear error.
- Resampling uses ``scipy.signal.resample_poly`` (no resampy in the image);
  the polyphase filter is the standard high-quality choice.
"""
import io
import random
import struct
import wave

import numpy as np
from scipy import signal


class AudioSegment:
    """Mono float32 audio in [-1, 1] with a sample rate."""

    def __init__(self, samples: np.ndarray, sample_rate: int):
        self._samples = self._convert_samples_to_float32(samples)
        self._sample_rate = int(sample_rate)
        if self._samples.ndim >= 2:
            self._samples = np.mean(self._samples, axis=1)

    def __eq__(self, other):
        if type(other) is not type(self):
            return False
        return (self._sample_rate == other._sample_rate
                and self._samples.shape == other._samples.shape
                and np.allclose(self._samples, other._samples, atol=1e-6))

    def __str__(self):
        return (f"AudioSegment(num_samples={self.num_samples}, "
                f"sample_rate={self.sample_rate}, duration={self.duration:.2f}s, "
                f"rms={self.rms_db:.2f}dB)")

    # ------------------------------------------------------------- constructors

    @classmethod
    def from_file(cls, file) -> "AudioSegment":
        """Load an audio file (WAV). Reference audio.py:55-71."""
        samples, sr = _read_wav(file)
        return cls(samples, sr)

    @classmethod
    def slice_from_file(cls, file, start=None, end=None) -> "AudioSegment":
        """Seek-read a [start, end] second subsegment without loading the whole
        file (reference audio.py:74-107)."""
        with wave.open(_as_reader(file), "rb") as wf:
            sr = wf.getframerate()
            n_frames = wf.getnframes()
            duration = n_frames / sr
            start = 0.0 if start is None else start
            end = duration if end is None else end
            if start < 0.0:
                start += duration
            if end < 0.0:
                end += duration
            start = max(0.0, start)
            end = min(duration, end)
            if end < start:
                raise ValueError(f"slice end ({end}) < start ({start})")
            start_frame = int(start * sr)
            wf.setpos(start_frame)
            count = int(end * sr) - start_frame
            data = wf.readframes(count)
            samples = _decode_frames(data, wf.getsampwidth(), wf.getnchannels())
        return cls(samples, sr)

    @classmethod
    def from_bytes(cls, data: bytes) -> "AudioSegment":
        """Decode a full audio container from bytes (reference audio.py:109)."""
        return cls.from_file(io.BytesIO(data))

    @classmethod
    def from_pcm_bytes(cls, data: bytes, channels=1, samp_width=2,
                       sample_rate=16000) -> "AudioSegment":
        """Raw PCM bytes → segment (reference audio.py:121-143)."""
        dtype = {1: np.int8, 2: np.int16, 4: np.int32}[samp_width]
        samples = np.frombuffer(data, dtype=dtype)
        if channels > 1:
            samples = samples.reshape(-1, channels)
        return cls(samples, sample_rate)

    @classmethod
    def from_ndarray(cls, data: np.ndarray, sample_rate=16000) -> "AudioSegment":
        return cls(data, sample_rate)

    @classmethod
    def concatenate(cls, *segments) -> "AudioSegment":
        """Concatenate same-rate segments (reference audio.py:158-185)."""
        if len(segments) == 0:
            raise ValueError("no segments to concatenate")
        sr = segments[0].sample_rate
        for seg in segments:
            if seg.sample_rate != sr:
                raise ValueError("all segments must share a sample rate")
            if not isinstance(seg, cls):
                raise TypeError("can only concatenate AudioSegment instances")
        samples = np.concatenate([seg.samples for seg in segments])
        return cls(samples, sr)

    @classmethod
    def make_silence(cls, duration, sample_rate) -> "AudioSegment":
        """Silent segment of ``duration`` seconds (reference audio.py:187-200)."""
        samples = np.zeros(int(duration * sample_rate), np.float32)
        return cls(samples, sample_rate)

    # ---------------------------------------------------------------- file out

    def to_wav_file(self, filepath, dtype="int16"):
        samples = self._convert_samples_from_float32(self._samples, dtype)
        width = {"int16": 2, "int32": 4}[dtype]
        with wave.open(filepath, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(width)
            wf.setframerate(self._sample_rate)
            wf.writeframes(samples.tobytes())

    def to_bytes(self, dtype="float32") -> bytes:
        return self._convert_samples_from_float32(self._samples, dtype).tobytes()

    def to(self, dtype="int16") -> np.ndarray:
        """Samples rescaled to an integer dtype's range (reference audio.py:241-254).

        Note: kaldi-style featurizers consume int16-scaled float samples."""
        return self._convert_samples_from_float32(self._samples, dtype)

    # --------------------------------------------------------------- transforms

    def superimpose(self, other: "AudioSegment"):
        """Add another same-shape segment in place (reference audio.py:219-239)."""
        if self._sample_rate != other._sample_rate:
            raise ValueError("sample rates mismatch")
        if len(self._samples) != len(other._samples):
            raise ValueError("segment lengths mismatch")
        self._samples += other._samples

    def gain_db(self, gain: float):
        """Apply gain in dB in place (reference audio.py:256-264)."""
        self._samples *= 10. ** (gain / 20.)

    def change_speed(self, speed_rate: float):
        """Time-stretch by linear interpolation (reference audio.py:266-285)."""
        if speed_rate == 1.0:
            return
        if speed_rate <= 0:
            raise ValueError("speed_rate must be positive")
        old_length = self._samples.shape[0]
        new_length = int(old_length / speed_rate)
        old_indices = np.arange(old_length)
        new_indices = np.linspace(0, old_length, new_length)
        self._samples = np.interp(new_indices, old_indices,
                                  self._samples).astype(np.float32)

    def normalize(self, target_db=-20, max_gain_db=300.0):
        """Gain to an RMS target in dBFS (reference audio.py:287-304)."""
        gain = target_db - self.rms_db
        if gain > max_gain_db:
            raise ValueError(
                f"cannot normalize to {target_db}dB without exceeding "
                f"max_gain_db ({max_gain_db}dB)")
        self.gain_db(min(max_gain_db, gain))

    def resample(self, target_sample_rate: int, filter="kaiser_best"):
        """Polyphase resample (reference audio.py:306-317 uses resampy)."""
        if target_sample_rate == self._sample_rate:
            return
        g = np.gcd(self._sample_rate, target_sample_rate)
        up, down = target_sample_rate // g, self._sample_rate // g
        self._samples = signal.resample_poly(self._samples, up,
                                             down).astype(np.float32)
        self._sample_rate = target_sample_rate

    def pad_silence(self, duration, sides="both"):
        """Pad with silence (reference audio.py:319-345)."""
        if duration == 0.0:
            return
        cls = type(self)
        silence = cls.make_silence(duration, self._sample_rate)
        if sides == "beginning":
            padded = cls.concatenate(silence, self)
        elif sides == "end":
            padded = cls.concatenate(self, silence)
        elif sides == "both":
            padded = cls.concatenate(silence, self, silence)
        else:
            raise ValueError(f"unknown sides: {sides}")
        self._samples = padded._samples

    def shift(self, shift_ms: float):
        """Shift in time, zero-filling the vacated span (reference audio.py:347-367)."""
        shift_samples = int(shift_ms * self._sample_rate / 1000)
        if abs(shift_samples) > self.num_samples:
            raise ValueError("shift_ms exceeds audio duration")
        if shift_samples > 0:
            self._samples[shift_samples:] = self._samples[:-shift_samples]
            self._samples[:shift_samples] = 0
        elif shift_samples < 0:
            self._samples[:shift_samples] = self._samples[-shift_samples:]
            self._samples[shift_samples:] = 0

    def subsegment(self, start_sec=None, end_sec=None):
        """Cut to [start, end] seconds in place (reference audio.py:369-397)."""
        start_sec = 0.0 if start_sec is None else start_sec
        end_sec = self.duration if end_sec is None else end_sec
        if start_sec < 0.0:
            start_sec += self.duration
        if end_sec < 0.0:
            end_sec += self.duration
        if start_sec < 0.0 or end_sec > self.duration or end_sec < start_sec:
            raise ValueError(f"bad subsegment bounds [{start_sec}, {end_sec}]")
        start_sample = int(round(start_sec * self._sample_rate))
        end_sample = int(round(end_sec * self._sample_rate))
        self._samples = self._samples[start_sample:end_sample]

    def random_subsegment(self, subsegment_length: float):
        """Random cut of given duration (reference audio.py:399-413)."""
        if subsegment_length > self.duration:
            raise ValueError("subsegment length > audio duration")
        start_time = random.uniform(0.0, self.duration - subsegment_length)
        self.subsegment(start_time, start_time + subsegment_length)

    def convolve(self, impulse_segment: "AudioSegment", allow_resample=False):
        """Convolve with an impulse response (reference audio.py:415-436)."""
        if allow_resample and self.sample_rate != impulse_segment.sample_rate:
            impulse_segment.resample(self.sample_rate)
        if self.sample_rate != impulse_segment.sample_rate:
            raise ValueError("impulse sample rate mismatch")
        samples = signal.fftconvolve(self.samples, impulse_segment.samples,
                                     "full")
        self._samples = samples[:self.num_samples].astype(np.float32)

    def convolve_and_normalize(self, impulse_segment, allow_resample=False):
        target = self.rms_db
        self.convolve(impulse_segment, allow_resample=allow_resample)
        self.normalize(target_db=target)

    def add_noise(self, noise: "AudioSegment", snr_dB: float,
                  max_gain_db=300.0):
        """Overlay noise at the given SNR (reference audio.py:452-480).

        The noise segment must be at least as long; a random subsegment of the
        right length is used."""
        if noise.sample_rate != self.sample_rate:
            raise ValueError("noise sample rate mismatch")
        if noise.duration < self.duration:
            raise ValueError("noise shorter than audio")
        noise_gain_db = min(self.rms_db - noise.rms_db - snr_dB, max_gain_db)
        noise_new = AudioSegment(noise.samples.copy(), noise.sample_rate)
        noise_new.random_subsegment(self.duration)
        noise_new.gain_db(noise_gain_db)
        # length can differ by 1 sample from float rounding
        n = min(self.num_samples, noise_new.num_samples)
        self._samples[:n] += noise_new.samples[:n]

    # -------------------------------------------------------------- properties

    @property
    def samples(self) -> np.ndarray:
        return self._samples.copy()

    @property
    def sample_rate(self) -> int:
        return self._sample_rate

    @property
    def num_samples(self) -> int:
        return self._samples.shape[0]

    @property
    def duration(self) -> float:
        return self._samples.shape[0] / float(self._sample_rate)

    @property
    def rms_db(self) -> float:
        mean_square = np.mean(self._samples ** 2)
        if mean_square <= 0:
            return -np.inf
        return 10 * np.log10(mean_square)

    # ----------------------------------------------------------------- helpers

    @staticmethod
    def _convert_samples_to_float32(samples: np.ndarray) -> np.ndarray:
        """int PCM → float32 in [-1, 1] (reference audio.py:531-550)."""
        samples = np.asarray(samples)
        float32_samples = samples.astype(np.float32)
        if samples.dtype.kind in "iu":
            bits = np.iinfo(samples.dtype).bits
            float32_samples *= 1.0 / 2 ** (bits - 1)
        elif samples.dtype.kind != "f":
            raise TypeError(f"unsupported sample dtype: {samples.dtype}")
        return float32_samples

    @staticmethod
    def _convert_samples_from_float32(samples: np.ndarray, dtype) -> np.ndarray:
        """float32 [-1,1] → target dtype with scaling (reference audio.py:552-574)."""
        dtype = np.dtype(dtype)
        output = samples.copy()
        if dtype.kind in "iu":
            bits = np.iinfo(dtype).bits
            output *= 2 ** (bits - 1)
            min_val, max_val = np.iinfo(dtype).min, np.iinfo(dtype).max
            output = np.clip(output, min_val, max_val)
        elif dtype.kind != "f":
            raise TypeError(f"unsupported target dtype: {dtype}")
        return output.astype(dtype)


# --------------------------------------------------------------------- wav io

def _as_reader(file):
    if isinstance(file, (str, bytes)) and not isinstance(file, bytes):
        return file
    return file


def _decode_frames(data: bytes, sampwidth: int, nchannels: int) -> np.ndarray:
    if sampwidth == 2:
        samples = np.frombuffer(data, dtype=np.int16)
    elif sampwidth == 4:
        samples = np.frombuffer(data, dtype=np.int32)
    elif sampwidth == 1:
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128
        samples = (samples * 256).astype(np.int16)
    elif sampwidth == 3:
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        samples = ((raw[:, 2].astype(np.int32) << 24)
                   | (raw[:, 1].astype(np.int32) << 16)
                   | (raw[:, 0].astype(np.int32) << 8)) >> 8
    else:
        raise ValueError(f"unsupported sample width: {sampwidth}")
    if nchannels > 1:
        samples = samples.reshape(-1, nchannels)
    return samples


def _read_wav(file):
    """Read a (possibly non-PCM-header) WAV file. Falls back to
    scipy.io.wavfile for float WAVs the wave module rejects, then to an
    ffmpeg subprocess for non-WAV containers (mp3/flac/opus — the
    reference's PyAV fallback, audio.py:55-71 / utils.py:313-345) when
    ffmpeg is installed."""
    try:
        with wave.open(_as_reader(file), "rb") as wf:
            sr = wf.getframerate()
            data = wf.readframes(wf.getnframes())
            samples = _decode_frames(data, wf.getsampwidth(), wf.getnchannels())
        return samples, sr
    except (wave.Error, EOFError, struct.error):
        pass
    try:
        from scipy.io import wavfile
        if hasattr(file, "seek"):
            file.seek(0)
        sr, samples = wavfile.read(file)
        return samples, sr
    except Exception:
        pass
    return _read_via_ffmpeg(file)


def _read_via_ffmpeg(file, target_sr: int = 16000):
    import shutil
    import subprocess
    if shutil.which("ffmpeg") is None:
        raise ValueError(
            f"cannot decode {file!r}: not a readable WAV and ffmpeg is not "
            f"installed (needed for mp3/flac/opus)")
    if hasattr(file, "read"):
        if hasattr(file, "seek"):
            file.seek(0)
        data = file.read()
        cmd_in = ["-i", "pipe:0"]
    else:
        data = None
        cmd_in = ["-i", str(file)]
    proc = subprocess.run(
        ["ffmpeg", "-loglevel", "quiet"] + cmd_in
        + ["-f", "s16le", "-acodec", "pcm_s16le", "-ac", "1",
           "-ar", str(target_sr), "pipe:1"],
        input=data, capture_output=True)
    if proc.returncode != 0 or not proc.stdout:
        raise ValueError(f"ffmpeg failed to decode {file!r}")
    samples = np.frombuffer(proc.stdout, dtype=np.int16)
    return samples, target_sr
