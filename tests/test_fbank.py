"""Feature frontend: numpy host path vs batched jnp device path must agree,
and basic kaldi-shape invariants hold."""
import numpy as np
import jax.numpy as jnp

from ppasr_tpu.data.audio import AudioSegment
from ppasr_tpu.ops import fbank as F

FIXTURE = "/root/reference/dataset/test.wav"


def _int16_samples():
    seg = AudioSegment.from_file(FIXTURE)
    seg.normalize(target_db=-20)
    return seg.to('int16').astype(np.float32)


def test_fbank_shape_and_framecount():
    samples = _int16_samples()
    feat = F.fbank_numpy(samples, 16000, num_mel_bins=80)
    expected_t = 1 + (len(samples) - 400) // 160
    assert feat.shape == (expected_t, 80)
    assert np.isfinite(feat).all()
    # log-mel of real speech should span a reasonable dynamic range
    assert feat.max() > 10 and feat.min() < feat.max() - 5


def _assert_logmel_close(out, ref):
    """The jnp path computes the DFT in float32 (as kaldi itself does) while
    numpy's rfft runs in float64; low-energy bins (esp. pre-emphasis-killed
    low frequencies) show f32 cancellation. Assert on the error distribution
    instead of pointwise."""
    diff = np.abs(out - ref)
    assert diff.mean() < 0.02
    assert np.quantile(diff, 0.99) < 0.2
    assert diff.max() < 2.0


def test_fbank_numpy_vs_jax():
    samples = _int16_samples()
    ref = F.fbank_numpy(samples, 16000, num_mel_bins=80)
    out, lens = F.fbank_jax(jnp.asarray(samples)[None, :],
                            jnp.asarray([len(samples)]), num_mel_bins=80)
    assert int(lens[0]) == ref.shape[0]
    _assert_logmel_close(np.asarray(out[0, :ref.shape[0]]), ref)


def test_fbank_jax_batched_lengths():
    samples = _int16_samples()
    half = samples[:len(samples) // 2]
    s = len(samples)
    batch = np.zeros((2, s), np.float32)
    batch[0] = samples
    batch[1, :len(half)] = half
    out, lens = F.fbank_jax(jnp.asarray(batch),
                            jnp.asarray([s, len(half)]), num_mel_bins=80)
    ref_half = F.fbank_numpy(half, 16000, num_mel_bins=80)
    assert int(lens[1]) == ref_half.shape[0]
    _assert_logmel_close(np.asarray(out[1, :ref_half.shape[0]]), ref_half)


def test_mel_banks_properties():
    banks = F.get_mel_banks(80, 512, 16000.0)
    assert banks.shape == (80, 257)
    assert (banks >= 0).all()
    # triangles: every bin has some support, nyquist column zero
    assert (banks.sum(axis=1) > 0).all()
    assert banks[:, -1].sum() == 0
    # filters tile the spectrum: inner fft bins sum close to piecewise 1
    mid = banks.sum(axis=0)[10:250]
    assert (mid > 0.2).all() and (mid < 1.2).all()


def test_mfcc_shape():
    samples = _int16_samples()
    feat = F.mfcc_numpy(samples, 16000, num_mel_bins=80, num_ceps=40)
    assert feat.shape[1] == 40
    assert np.isfinite(feat).all()


def test_linear_shape():
    seg = AudioSegment.from_file(FIXTURE)
    feat = F.linear_numpy(seg.samples, 16000)
    assert feat.shape[1] == 161
    assert np.isfinite(feat).all()


def test_dither_only_changes_train():
    samples = _int16_samples()[:8000]
    a = F.fbank_numpy(samples, 16000, dither=0.0)
    b = F.fbank_numpy(samples, 16000, dither=0.0)
    np.testing.assert_array_equal(a, b)
    c = F.fbank_numpy(samples, 16000, dither=1.0,
                      rng=np.random.default_rng(0))
    assert not np.allclose(a, c)
    # dither is tiny relative to speech energy
    np.testing.assert_allclose(a, c, atol=1.0)
