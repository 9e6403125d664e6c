"""Kaldi-compatible fbank / MFCC / linear-spectrogram features.

The reference delegates to paddleaudio's kaldi-compliance ops
(ppasr/data_utils/featurizer/audio_featurizer.py:97-138: 25 ms window,
10 ms shift, dither only in training, log-mel on int16-scaled samples).
Here the same math is implemented twice from the Kaldi definition:

- a numpy host path (`fbank_numpy`, `mfcc_numpy`, `linear_numpy`) used by the
  data-prep pipeline (CMVN stats, manifest feature extraction);
- a batched jnp device path (`fbank_jax`) whose hot ops are two matmuls
  (frames @ DFT-basis and power @ mel-weights) — the MXU-native formulation;
  `jnp.fft.rfft` is avoided on purpose so XLA tiles everything onto the MXU.

Kaldi specifics implemented: povey window, snip_edges framing, per-frame DC
removal, pre-emphasis 0.97 with edge replication, round-to-power-of-two FFT
(400 → 512), power spectrum, mel triangles in mel space (low 20 Hz, high
nyquist), log with 1.19e-7 floor.
"""
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = 1.1920928955078125e-07  # float32 eps, kaldi's log floor
MILLISECONDS_TO_SECONDS = 0.001


def next_power_of_2(x: int) -> int:
    return 1 if x == 0 else 2 ** (x - 1).bit_length()


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


def inverse_mel_scale(mel):
    return 700.0 * (np.exp(mel / 1127.0) - 1.0)


@functools.lru_cache(maxsize=8)
def get_mel_banks(num_bins: int, window_length_padded: int, sample_freq: float,
                  low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    """[num_bins, window_length_padded // 2 + 1] kaldi mel triangle weights.

    high_freq <= 0 means nyquist + high_freq. The nyquist column is zero
    (kaldi computes bins only up to padded//2 and pads one zero)."""
    num_fft_bins = window_length_padded // 2
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    assert 0.0 <= low_freq < high_freq <= nyquist

    fft_bin_width = sample_freq / window_length_padded
    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bin_idx = np.arange(num_bins)[:, None]
    left_mel = mel_low + bin_idx * mel_delta
    center_mel = mel_low + (bin_idx + 1) * mel_delta
    right_mel = mel_low + (bin_idx + 2) * mel_delta

    freqs = fft_bin_width * np.arange(num_fft_bins)[None, :]
    mel = mel_scale(freqs)
    up_slope = (mel - left_mel) / (center_mel - left_mel)
    down_slope = (right_mel - mel) / (right_mel - center_mel)
    weights = np.maximum(0.0, np.minimum(up_slope, down_slope))
    # zero column for nyquist bin
    weights = np.concatenate(
        [weights, np.zeros((num_bins, 1))], axis=1)
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=8)
def povey_window(window_size: int) -> np.ndarray:
    n = np.arange(window_size)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * n / (window_size - 1))
    return (hann ** 0.85).astype(np.float32)


@functools.lru_cache(maxsize=8)
def dft_basis(padded: int) -> tuple:
    """Real/imag DFT matrices [padded, padded//2+1] so that the power spectrum
    is (frames @ cos)² + (frames @ sin)² — two MXU matmuls instead of an FFT."""
    k = np.arange(padded // 2 + 1)[None, :]
    n = np.arange(padded)[:, None]
    ang = -2.0 * np.pi * n * k / padded
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def num_frames(num_samples: int, sample_rate: int,
               frame_shift_ms: float = 10.0,
               frame_length_ms: float = 25.0) -> int:
    """snip_edges frame count."""
    window_size = int(sample_rate * frame_length_ms * MILLISECONDS_TO_SECONDS)
    window_shift = int(sample_rate * frame_shift_ms * MILLISECONDS_TO_SECONDS)
    if num_samples < window_size:
        return 0
    return 1 + (num_samples - window_size) // window_shift


# ------------------------------------------------------------------ numpy path

def _frame_signal(waveform: np.ndarray, window_size: int,
                  window_shift: int) -> np.ndarray:
    m = 1 + (len(waveform) - window_size) // window_shift
    if m <= 0:
        return np.zeros((0, window_size), np.float32)
    idx = (np.arange(m)[:, None] * window_shift + np.arange(window_size)[None, :])
    return waveform[idx].astype(np.float32)


def _preprocess_frames(frames: np.ndarray, dither: float,
                       remove_dc_offset: bool, preemphasis: float,
                       window: np.ndarray, rng: np.random.Generator = None):
    if dither != 0.0:
        rng = rng or np.random.default_rng()
        frames = frames + dither * rng.standard_normal(frames.shape).astype(np.float32)
    if remove_dc_offset:
        frames = frames - frames.mean(axis=1, keepdims=True)
    if preemphasis != 0.0:
        prev = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - preemphasis * prev
    return frames * window[None, :]


def fbank_numpy(waveform: np.ndarray, sample_rate: int = 16000,
                num_mel_bins: int = 80, frame_length_ms: float = 25.0,
                frame_shift_ms: float = 10.0, dither: float = 0.0,
                preemphasis: float = 0.97, remove_dc_offset: bool = True,
                low_freq: float = 20.0, high_freq: float = 0.0,
                use_log_fbank: bool = True,
                rng: np.random.Generator = None) -> np.ndarray:
    """[T, num_mel_bins] kaldi-style log-mel filterbank of a 1-D waveform.

    ``waveform`` must be int16-scaled float (reference passes
    audio_segment.to('int16'), audio_featurizer.py:63)."""
    window_size = int(sample_rate * frame_length_ms * MILLISECONDS_TO_SECONDS)
    window_shift = int(sample_rate * frame_shift_ms * MILLISECONDS_TO_SECONDS)
    padded = next_power_of_2(window_size)

    frames = _frame_signal(np.asarray(waveform, np.float32), window_size,
                           window_shift)
    if frames.shape[0] == 0:
        return np.zeros((0, num_mel_bins), np.float32)
    frames = _preprocess_frames(frames, dither, remove_dc_offset, preemphasis,
                                povey_window(window_size), rng)
    spec = np.fft.rfft(frames, n=padded, axis=1)
    power = np.abs(spec).astype(np.float32) ** 2
    mel = power @ get_mel_banks(num_mel_bins, padded, float(sample_rate),
                                low_freq, high_freq).T
    if use_log_fbank:
        mel = np.log(np.maximum(mel, EPSILON))
    return mel.astype(np.float32)


@functools.lru_cache(maxsize=8)
def dct_matrix(num_ceps: int, num_mel_bins: int) -> np.ndarray:
    """[num_mel_bins, num_ceps] orthonormal DCT-II basis (kaldi layout)."""
    n = np.arange(num_mel_bins)[:, None]
    k = np.arange(num_ceps)[None, :]
    dct = np.cos(np.pi * k * (2 * n + 1) / (2.0 * num_mel_bins))
    dct *= np.sqrt(2.0 / num_mel_bins)
    dct[:, 0] = 1.0 / np.sqrt(num_mel_bins)
    return dct.astype(np.float32)


@functools.lru_cache(maxsize=8)
def lifter_coeffs(num_ceps: int, cepstral_lifter: float = 22.0) -> np.ndarray:
    i = np.arange(num_ceps)
    return (1.0 + 0.5 * cepstral_lifter * np.sin(np.pi * i / cepstral_lifter)
            ).astype(np.float32)


def mfcc_numpy(waveform: np.ndarray, sample_rate: int = 16000,
               num_mel_bins: int = 80, num_ceps: int = 40,
               frame_length_ms: float = 25.0, frame_shift_ms: float = 10.0,
               dither: float = 0.0, cepstral_lifter: float = 22.0,
               rng: np.random.Generator = None) -> np.ndarray:
    """[T, num_ceps] kaldi-style MFCC (log-mel → DCT → liftering)."""
    logmel = fbank_numpy(waveform, sample_rate, num_mel_bins,
                         frame_length_ms, frame_shift_ms, dither, rng=rng)
    ceps = logmel @ dct_matrix(num_ceps, num_mel_bins)
    if cepstral_lifter != 0.0:
        ceps = ceps * lifter_coeffs(num_ceps, cepstral_lifter)[None, :]
    return ceps.astype(np.float32)


def linear_numpy(samples: np.ndarray, sample_rate: int,
                 frame_shift_ms: float = 10.0, frame_length_ms: float = 20.0,
                 eps: float = 1e-14) -> np.ndarray:
    """[T, 161] log power spectrogram with hanning window and kaldi-free
    scaling — behavior parity with the reference's hand-rolled linear feature
    (audio_featurizer.py:72-94): 20 ms window / 10 ms shift at 16 kHz → 161
    frequency bins up to nyquist."""
    shift = int(MILLISECONDS_TO_SECONDS * sample_rate * frame_shift_ms)
    size = int(MILLISECONDS_TO_SECONDS * sample_rate * frame_length_ms)
    frames = _frame_signal(np.asarray(samples, np.float32), size, shift)
    if frames.shape[0] == 0:
        return np.zeros((0, size // 2 + 1), np.float32)
    window = np.hanning(size).astype(np.float32)
    spec = np.fft.rfft(frames * window[None, :], axis=1)
    power = np.abs(spec) ** 2
    scale = np.sum(window ** 2) * sample_rate
    power[:, 1:-1] *= 2.0 / scale
    power[:, (0, -1)] /= scale
    freqs = float(sample_rate) / size * np.arange(power.shape[1])
    ind = np.where(freqs <= sample_rate / 2)[0][-1] + 1
    return np.log(power[:, :ind] + eps).astype(np.float32)


# -------------------------------------------------------------------- jnp path

def frame_jax(waveform: jnp.ndarray, window_size: int, window_shift: int,
              max_frames: int) -> jnp.ndarray:
    """[B, S] → [B, max_frames, window_size] strided framing with static shape.

    Frames past the end of the buffer read zeros (callers mask by length)."""
    bsz, s = waveform.shape
    pad = max(0, (max_frames - 1) * window_shift + window_size - s)
    wav = jnp.pad(waveform, ((0, 0), (0, pad)))
    starts = jnp.arange(max_frames) * window_shift
    idx = starts[:, None] + jnp.arange(window_size)[None, :]
    return wav[:, idx]


def fbank_jax(waveform: jnp.ndarray, lengths: jnp.ndarray,
              sample_rate: int = 16000, num_mel_bins: int = 80,
              frame_length_ms: float = 25.0, frame_shift_ms: float = 10.0,
              preemphasis: float = 0.97, remove_dc_offset: bool = True,
              low_freq: float = 20.0, high_freq: float = 0.0,
              use_matmul_dft: bool = False, dtype=jnp.float32,
              dither: float = 0.0, dither_rng=None):
    """Batched on-device kaldi fbank: [B, S] int16-scaled float waveforms (+
    [B] sample counts) → ([B, T, M] log-mel, [B] frame counts).

    T is the static frame capacity implied by S. The spectrum uses XLA's FFT
    by default: in float32 a naive DFT matmul loses the pre-emphasis-
    suppressed low bins to catastrophic cancellation (intermediate sums are
    ~1e7 while the true bin value is ~1e1), whereas FFT butterflies keep
    partial sums balanced (error O(log N) vs O(N)). ``use_matmul_dft=True``
    switches to the two-matmul MXU formulation for experimentation. The
    mel projection is a matmul either way.

    ``dither``/``dither_rng``: kaldi-style per-framed-sample Gaussian dither
    (matching fbank_numpy/_preprocess_frames: independent draws per frame so
    overlapping samples get independent noise). Used by the device-frontend
    *training* path; inference/eval callers leave it 0."""
    bsz, s = waveform.shape
    window_size = int(sample_rate * frame_length_ms * MILLISECONDS_TO_SECONDS)
    window_shift = int(sample_rate * frame_shift_ms * MILLISECONDS_TO_SECONDS)
    padded = next_power_of_2(window_size)
    max_t = max(1 + (s - window_size) // window_shift, 0)
    if max_t == 0:
        return (jnp.zeros((bsz, 0, num_mel_bins), dtype),
                jnp.zeros((bsz,), jnp.int32))

    frames = frame_jax(waveform.astype(jnp.float32), window_size, window_shift,
                       max_t)
    if dither != 0.0 and dither_rng is not None:
        frames = frames + dither * jax.random.normal(
            dither_rng, frames.shape, jnp.float32)
    if remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemphasis != 0.0:
        prev = jnp.concatenate([frames[:, :, :1], frames[:, :, :-1]], axis=-1)
        frames = frames - preemphasis * prev
    frames = frames * jnp.asarray(povey_window(window_size))[None, None, :]
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, padded - window_size)))

    if use_matmul_dft:
        cos_b, sin_b = dft_basis(padded)
        re = jnp.einsum("btw,wk->btk", frames, jnp.asarray(cos_b),
                        preferred_element_type=jnp.float32)
        im = jnp.einsum("btw,wk->btk", frames, jnp.asarray(sin_b),
                        preferred_element_type=jnp.float32)
        power = re * re + im * im
    else:
        spec = jnp.fft.rfft(frames, n=padded, axis=-1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    mel_w = jnp.asarray(get_mel_banks(num_mel_bins, padded, float(sample_rate),
                                      low_freq, high_freq))
    mel = jnp.einsum("btk,mk->btm", power, mel_w,
                     preferred_element_type=jnp.float32)
    logmel = jnp.log(jnp.maximum(mel, EPSILON)).astype(dtype)

    frame_lens = jnp.where(
        lengths >= window_size,
        1 + (lengths.astype(jnp.int32) - window_size) // window_shift, 0)
    frame_lens = jnp.minimum(frame_lens, max_t)
    return logmel, frame_lens
