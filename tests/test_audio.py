"""AudioSegment I/O and transform checks against the real test fixture."""
import numpy as np
import pytest

from ppasr_tpu.data.audio import AudioSegment

FIXTURE = "/root/reference/dataset/test.wav"


def test_from_file_fixture():
    seg = AudioSegment.from_file(FIXTURE)
    assert seg.sample_rate == 16000
    assert seg.num_samples == 134240
    assert -1.0 <= seg.samples.min() and seg.samples.max() <= 1.0
    assert 8.0 < seg.duration < 8.5


def test_slice_from_file():
    full = AudioSegment.from_file(FIXTURE)
    part = AudioSegment.slice_from_file(FIXTURE, start=1.0, end=2.0)
    assert abs(part.duration - 1.0) < 1e-3
    np.testing.assert_allclose(part.samples,
                               full.samples[16000:32000], atol=1e-6)


def test_pcm_bytes_roundtrip():
    seg = AudioSegment.from_file(FIXTURE)
    pcm = seg.to('int16').tobytes()
    seg2 = AudioSegment.from_pcm_bytes(pcm, samp_width=2, sample_rate=16000)
    np.testing.assert_allclose(seg.samples, seg2.samples, atol=1e-4)


def test_wav_roundtrip(tmp_path):
    seg = AudioSegment.from_file(FIXTURE)
    out = str(tmp_path / "out.wav")
    seg.to_wav_file(out)
    seg2 = AudioSegment.from_file(out)
    assert seg2.sample_rate == seg.sample_rate
    np.testing.assert_allclose(seg.samples, seg2.samples, atol=1e-4)


def test_normalize_and_gain():
    seg = AudioSegment.from_file(FIXTURE)
    seg.normalize(target_db=-20)
    assert abs(seg.rms_db - (-20)) < 0.1
    rms_before = seg.rms_db
    seg.gain_db(6)
    assert abs(seg.rms_db - rms_before - 6) < 0.1


def test_resample():
    seg = AudioSegment.from_file(FIXTURE)
    dur = seg.duration
    seg.resample(8000)
    assert seg.sample_rate == 8000
    assert abs(seg.duration - dur) < 0.01


def test_change_speed():
    seg = AudioSegment.from_file(FIXTURE)
    n = seg.num_samples
    seg.change_speed(1.1)
    assert abs(seg.num_samples - int(n / 1.1)) <= 1


def test_concat_silence_shift_subsegment():
    seg = AudioSegment.make_silence(1.0, 16000)
    assert seg.num_samples == 16000
    seg2 = AudioSegment.concatenate(seg, seg)
    assert abs(seg2.duration - 2.0) < 1e-6
    seg3 = AudioSegment.from_file(FIXTURE)
    seg3.subsegment(0.5, 1.5)
    assert abs(seg3.duration - 1.0) < 1e-3
    seg3.shift(10)
    np.testing.assert_array_equal(seg3.samples[:160], np.zeros(160))


def test_add_noise_snr():
    rng = np.random.default_rng(0)
    sig = AudioSegment(rng.standard_normal(16000).astype(np.float32) * 0.1,
                       16000)
    noise = AudioSegment(rng.standard_normal(32000).astype(np.float32) * 0.1,
                         16000)
    before = sig.rms_db
    sig.add_noise(noise, snr_dB=0)
    # SNR 0 → power roughly doubles → +3 dB
    assert 2.0 < sig.rms_db - before < 4.0
