"""Golden-fixture parity: the production fbank/MFCC paths must match a
committed float64 oracle computed straight from the Kaldi definition by an
independently-coded implementation (tests/make_fbank_golden.py). This pins
the frontend to kaldi compliance — the contract the reference inherits from
paddleaudio (/root/reference/ppasr/data_utils/featurizer/
audio_featurizer.py:120-138) — instead of only checking the repo's paths
against each other."""
import hashlib
import os

import numpy as np
import jax.numpy as jnp
import pytest

from ppasr_tpu.data.audio import AudioSegment
from ppasr_tpu.ops import fbank as F

FIXTURE_WAV = "/root/reference/dataset/test.wav"
GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures",
                      "fbank_golden.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def samples(golden):
    seg = AudioSegment.from_file(FIXTURE_WAV)
    seg.normalize(target_db=-20)
    s = seg.to('int16').astype(np.float32)
    # the fixture records the exact input it was computed from
    sha = hashlib.sha256(s.astype('<f8').tobytes()).digest()
    assert sha == golden["input_sha256"].tobytes(), (
        "audio preprocessing changed; regenerate tests/fixtures via "
        "tests/make_fbank_golden.py if intentional")
    return s


def test_numpy_fbank_matches_golden(samples, golden):
    out = F.fbank_numpy(samples, 16000, num_mel_bins=80)
    ref = golden["fbank"]
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_numpy_mfcc_matches_golden(samples, golden):
    out = F.mfcc_numpy(samples, 16000, num_mel_bins=80, num_ceps=40)
    ref = golden["mfcc"]
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-3)


def test_jax_fbank_matches_golden(samples, golden):
    ref = golden["fbank"]
    out, lens = F.fbank_jax(jnp.asarray(samples)[None],
                            jnp.asarray([len(samples)]), num_mel_bins=80)
    assert int(lens[0]) == ref.shape[0]
    diff = np.abs(np.asarray(out[0, :ref.shape[0]]) - ref)
    # f32 FFT vs f64 oracle: distributional bound (see test_fbank.py note)
    assert diff.mean() < 0.02
    assert np.quantile(diff, 0.99) < 0.2
    assert diff.max() < 2.0


def test_pallas_fbank_matches_golden(samples, golden):
    from ppasr_tpu.ops.fbank_pallas import fbank_pallas
    ref = golden["fbank"]
    out, lens = fbank_pallas(jnp.asarray(samples)[None],
                             jnp.asarray([len(samples)]),
                             num_mel_bins=80, interpret=True)
    assert int(lens[0]) == ref.shape[0]
    diff = np.abs(np.asarray(out[0, :ref.shape[0]], np.float32) - ref)
    assert diff.mean() < 0.03
    assert np.quantile(diff, 0.99) < 0.3
