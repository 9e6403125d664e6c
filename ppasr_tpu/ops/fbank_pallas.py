"""Pallas TPU kernel: fused kaldi-fbank frontend.

One kernel fuses, per 256-frame tile resident in VMEM:
  DC removal → pre-emphasis (edge-replicated) → povey window →
  DFT as two MXU matmuls (cos/sin bases) → power spectrum →
  mel projection (MXU matmul) → log floor
so the whole frontend after framing is 3 MXU matmuls + VPU elementwise with
zero intermediate HBM traffic (the XLA path materializes the complex
spectrum and power arrays in HBM between ops).

Accuracy: the DFT matmuls run at Precision.HIGHEST (f32 accumulate on the
MXU), which measures within 2e-4 log-mel of a float64 FFT reference on the
real chip — the naive-bf16 cancellation at pre-emphasis-suppressed low bins
(see ppasr_tpu/ops/fbank.py docstring) does not occur.

Replaces paddleaudio's kaldi fbank (reference audio_featurizer.py:120-138)
as the device featurization path; numerics match ppasr_tpu/ops/fbank.py.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ppasr_tpu.ops.fbank import (EPSILON, MILLISECONDS_TO_SECONDS, dft_basis,
                                 get_mel_banks, next_power_of_2, povey_window)

TILE = 256          # frames per grid step
LANE = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _padded_consts(window_size: int, padded: int, num_mel_bins: int,
                   sample_rate: float, low_freq: float, high_freq: float):
    """Lane-aligned constant operands: window (zero tail), valid-mask,
    cos/sin DFT bases [padded, K], mel weights [K, M]."""
    n_bins = padded // 2 + 1           # 257
    k = _round_up(n_bins, LANE)        # 384
    m = _round_up(num_mel_bins, LANE)  # 128

    window = np.zeros((padded,), np.float32)
    window[:window_size] = povey_window(window_size)
    mask = np.zeros((padded,), np.float32)
    mask[:window_size] = 1.0

    cos_b, sin_b = dft_basis(padded)   # [padded, n_bins]
    cos_p = np.zeros((padded, k), np.float32)
    sin_p = np.zeros((padded, k), np.float32)
    cos_p[:, :n_bins] = cos_b
    sin_p[:, :n_bins] = sin_b

    mel = get_mel_banks(num_mel_bins, padded, sample_rate, low_freq,
                        high_freq)    # [M, n_bins]
    mel_p = np.zeros((k, m), np.float32)
    mel_p[:n_bins, :num_mel_bins] = mel.T
    return window, mask, cos_p, sin_p, mel_p


def _fbank_kernel(frames_ref, window_ref, mask_ref, cos_ref, sin_ref,
                  mel_ref, out_ref, *, window_size: int,
                  preemphasis: float, remove_dc: bool):
    x = frames_ref[:]                                   # [T, padded]
    mask = mask_ref[:]                                  # [1, padded]
    if remove_dc:
        mean = jnp.sum(x * mask, axis=1, keepdims=True) / window_size
        x = x - mean                                    # tail = -mean (killed
                                                        # by the window below)
    if preemphasis != 0.0:
        prev = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
        x = x - preemphasis * prev
    x = x * window_ref[:]                               # zero tail restored

    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(x, cos_ref[:], precision=hi,
                 preferred_element_type=jnp.float32)    # [T, K]
    im = jnp.dot(x, sin_ref[:], precision=hi,
                 preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jnp.dot(power, mel_ref[:], precision=hi,
                  preferred_element_type=jnp.float32)   # [T, M]
    out_ref[:] = jnp.log(jnp.maximum(mel, EPSILON))


def fbank_frames_pallas(frames: jnp.ndarray, sample_rate: int = 16000,
                        num_mel_bins: int = 80,
                        frame_length_ms: float = 25.0,
                        preemphasis: float = 0.97,
                        remove_dc_offset: bool = True,
                        low_freq: float = 20.0, high_freq: float = 0.0,
                        interpret: bool = False) -> jnp.ndarray:
    """[N, window_size] preprocessed-less frames → [N, num_mel_bins] log-mel.

    N is padded to a TILE multiple internally; callers slice the result."""
    window_size = int(sample_rate * frame_length_ms * MILLISECONDS_TO_SECONDS)
    padded = next_power_of_2(window_size)
    window, mask, cos_p, sin_p, mel_p = _padded_consts(
        window_size, padded, num_mel_bins, float(sample_rate), low_freq,
        high_freq)
    k, m = cos_p.shape[1], mel_p.shape[1]

    n = frames.shape[0]
    n_pad = _round_up(max(n, 1), TILE)
    x = jnp.zeros((n_pad, padded), jnp.float32)
    x = x.at[:n, :frames.shape[1]].set(frames.astype(jnp.float32))

    kernel = functools.partial(_fbank_kernel, window_size=window_size,
                               preemphasis=preemphasis,
                               remove_dc=remove_dc_offset)
    grid = (n_pad // TILE,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, padded), lambda i: (i, 0)),
            pl.BlockSpec((1, padded), lambda i: (0, 0)),
            pl.BlockSpec((1, padded), lambda i: (0, 0)),
            pl.BlockSpec((padded, k), lambda i: (0, 0)),
            pl.BlockSpec((padded, k), lambda i: (0, 0)),
            pl.BlockSpec((k, m), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, m), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, m), jnp.float32),
        interpret=interpret,
    )(x, window[None, :], mask[None, :], cos_p, sin_p, mel_p)
    return out[:n, :num_mel_bins]


def fbank_pallas(waveform: jnp.ndarray, lengths: jnp.ndarray,
                 sample_rate: int = 16000, num_mel_bins: int = 80,
                 frame_length_ms: float = 25.0, frame_shift_ms: float = 10.0,
                 interpret: bool = False, **kw):
    """Batched device fbank with the fused Pallas kernel: [B, S] int16-scaled
    waveforms → ([B, T, M] log-mel, [B] frame counts). Same contract as
    ppasr_tpu.ops.fbank.fbank_jax."""
    from ppasr_tpu.ops.fbank import frame_jax
    bsz, s = waveform.shape
    window_size = int(sample_rate * frame_length_ms * MILLISECONDS_TO_SECONDS)
    window_shift = int(sample_rate * frame_shift_ms * MILLISECONDS_TO_SECONDS)
    max_t = max(1 + (s - window_size) // window_shift, 0)
    if max_t == 0:
        return (jnp.zeros((bsz, 0, num_mel_bins), jnp.float32),
                jnp.zeros((bsz,), jnp.int32))
    frames = frame_jax(waveform.astype(jnp.float32), window_size,
                       window_shift, max_t)             # [B, T, W]
    flat = frames.reshape(bsz * max_t, window_size)
    logmel = fbank_frames_pallas(flat, sample_rate, num_mel_bins,
                                 frame_length_ms, interpret=interpret, **kw)
    logmel = logmel.reshape(bsz, max_t, num_mel_bins)
    frame_lens = jnp.where(
        lengths >= window_size,
        1 + (lengths.astype(jnp.int32) - window_size) // window_shift, 0)
    return logmel, jnp.minimum(frame_lens, max_t)
