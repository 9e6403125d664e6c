"""Native C++ raw-audio loader (csrc/audio_pipeline.cpp) vs the Python
AudioSegment/augmentor chain: bit-close parity on every transform."""
import json
import wave

import numpy as np
import pytest

from ppasr_tpu.data import native_pipeline as npipe
from ppasr_tpu.data.audio import AudioSegment

SR = 16000

pytestmark = pytest.mark.skipif(not npipe.available(),
                                reason="native audio pipeline unavailable")


def _write_wav(path, samples_f32, sr=SR):
    pcm = np.clip(samples_f32 * 32768.0, -32768, 32767).astype(np.int16)
    with wave.open(str(path), 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def _mk_corpus(tmp_path, n=3, dur=1.0):
    rng = np.random.default_rng(0)
    entries = []
    for i in range(n):
        x = (rng.standard_normal(int(SR * dur)) * 0.1).astype(np.float32)
        p = tmp_path / f'u{i}.wav'
        _write_wav(p, x)
        entries.append({'audio_filepath': str(p), 'duration': dur,
                        'text': '你好'})
    return entries


def _params(n, **kw):
    out = []
    for _ in range(n):
        p = npipe.ItemParams()
        for k, v in kw.items():
            setattr(p, k, v)
        out.append(p)
    return out


def _native_one(entry, p, target_db=-20, max_s=SR * 4):
    wavs, lens = npipe.load_raw_batch([entry], [p], SR, target_db, max_s,
                                      n_threads=1)
    assert lens[0] >= 0
    return wavs[0, :lens[0]]


def _python_ref(entry, target_db=-20, speed=None, shift_ms=None,
                gain=None, noise=None, snr=None):
    seg = AudioSegment.from_file(entry['audio_filepath'])
    if noise is not None:
        nseg = AudioSegment.from_file(noise)
        if nseg.duration < seg.duration:
            reps = int(np.ceil(seg.num_samples / nseg.num_samples))
            nseg = AudioSegment(
                np.tile(nseg.samples, reps)[:seg.num_samples + 1],
                nseg.sample_rate)
        # offset_frac=0 → subsegment starting at 0 (random_subsegment with
        # start pinned)
        gain_db_v = min(seg.rms_db - nseg.rms_db - snr, 300.0)
        cut = AudioSegment(nseg.samples.copy(), nseg.sample_rate)
        cut.subsegment(0.0, seg.duration)
        cut.gain_db(gain_db_v)
        nn = min(seg.num_samples, cut.num_samples)
        mixed = seg.samples  # property copies — mix on arrays
        mixed[:nn] += cut.samples[:nn]
        seg = AudioSegment(mixed, seg.sample_rate)
    if speed is not None:
        seg.change_speed(speed)
    if shift_ms is not None:
        seg.shift(shift_ms)
    if gain is not None:
        seg.gain_db(gain)
    if target_db is not None:
        seg.normalize(target_db=target_db)
    return seg.to('int16').astype(np.float32)


def test_plain_load_parity(tmp_path):
    entries = _mk_corpus(tmp_path)
    for e in entries:
        got = _native_one(e, npipe.ItemParams())
        ref = _python_ref(e)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1.0)


def test_speed_parity(tmp_path):
    e = _mk_corpus(tmp_path, n=1)[0]
    for rate in (0.9, 1.0, 1.1):
        got = _native_one(e, _params(1, speed_rate=rate)[0])
        ref = _python_ref(e, speed=rate)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1.5)


def test_shift_and_volume_parity(tmp_path):
    e = _mk_corpus(tmp_path, n=1)[0]
    p = _params(1, shift_ms=3.5, volume_gain_db=6.0)[0]
    got = _native_one(e, p)
    ref = _python_ref(e, shift_ms=3.5, gain=6.0)
    np.testing.assert_allclose(got, ref, atol=1.5)
    p = _params(1, shift_ms=-2.25, volume_gain_db=-9.0)[0]
    got = _native_one(e, p)
    ref = _python_ref(e, shift_ms=-2.25, gain=-9.0)
    np.testing.assert_allclose(got, ref, atol=1.5)


def test_noise_parity(tmp_path):
    e = _mk_corpus(tmp_path, n=1, dur=1.0)[0]
    rng = np.random.default_rng(7)
    noise = (rng.standard_normal(int(SR * 0.4)) * 0.05).astype(np.float32)
    npath = tmp_path / 'noise.wav'
    _write_wav(npath, noise)  # shorter than audio → wrap-pad path
    p = npipe.ItemParams()
    p.noise_paths = [str(npath)]
    p.snr_db = [15.0]
    p.noise_offsets = [0.0]
    got = _native_one(e, p)
    ref = _python_ref(e, noise=str(npath), snr=15.0)
    np.testing.assert_allclose(got, ref, atol=2.0)


def test_fallback_on_bad_file(tmp_path):
    entries = _mk_corpus(tmp_path, n=1)
    bad = tmp_path / 'bad.wav'
    bad.write_bytes(b'NOTAWAV' * 10)
    wavs, lens = npipe.load_raw_batch(
        entries + [{'audio_filepath': str(bad), 'duration': 0.5,
                    'text': 'x'}],
        [npipe.ItemParams(), npipe.ItemParams()], SR, -20, SR * 2,
        n_threads=2)
    assert lens[0] > 0
    assert lens[1] == -1  # marked for the Python fallback


def test_dataset_native_batch_matches_python_items(tmp_path):
    from ppasr_tpu.data.dataset import ASRDataset
    entries = _mk_corpus(tmp_path, n=4)
    manifest = tmp_path / 'manifest.train'
    vocab = tmp_path / 'vocab.txt'
    vocab.write_text('<blank>\t9\n<unk>\t9\n你\t9\n好\t9\n<eos>\t9\n',
                     encoding='utf-8')
    with open(manifest, 'w', encoding='utf-8') as f:
        for e in entries:
            f.write(json.dumps(e, ensure_ascii=False) + '\n')
    ds = ASRDataset(str(manifest), str(vocab),
                    preprocess_conf={'feature_method': 'fbank', 'n_mels': 80,
                                     'sample_rate': SR},
                    min_duration=0, max_duration=-1, return_raw=True)
    assert ds._native_raw
    batch = ds.load_raw_batch([0, 1, 2, 3], label_bucket=4)
    assert batch is not None
    wavs, labels, wav_lens, label_lens = batch
    assert wavs.shape[0] == 4 and wavs.shape[1] % (64 * 160) == 0
    for j in range(4):
        w_py, t_py = ds[j]
        assert int(wav_lens[j]) == len(w_py)
        np.testing.assert_allclose(wavs[j, :len(w_py)], w_py, atol=1.0)
        assert list(labels[j, :int(label_lens[j])]) == list(t_py)


def test_native_multithread_deterministic(tmp_path):
    entries = _mk_corpus(tmp_path, n=8)
    params = _params(8, speed_rate=1.1, shift_ms=2.0, volume_gain_db=3.0)
    a, la = npipe.load_raw_batch(entries, params, SR, -20, SR * 2,
                                 n_threads=1)
    b, lb = npipe.load_raw_batch(entries, params, SR, -20, SR * 2,
                                 n_threads=4)
    np.testing.assert_array_equal(la, lb)
    np.testing.assert_array_equal(a, b)
