"""Silero-VAD JAX implementation vs the actual ONNX graph (numpy oracle).

The oracle (tests/onnx_eval.py) interprets the reference's silero_vad.onnx
file directly, so these tests check the hand-mapped JAX graph
(ppasr_tpu/infer_utils/silero_jax.py) against real ONNX semantics —
covering the STFT basis conv, adaptive normalization, separable conv
blocks, LSTM gate order/state threading, and the sigmoid/mean head.
"""
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ONNX_PATH = '/root/reference/ppasr/infer_utils/silero_vad.onnx'
NPZ_PATH = os.path.join(REPO, 'ppasr_tpu', 'assets', 'silero_vad_v3.npz')

needs_onnx = pytest.mark.skipif(not os.path.exists(ONNX_PATH),
                                reason='reference onnx blob not present')


@pytest.fixture(scope='module')
def oracle():
    from onnx_eval import OnnxGraphEvaluator
    return OnnxGraphEvaluator(ONNX_PATH)


def _oracle_run(oracle, wav, sr, h, c):
    out, hn, cn = oracle.run({
        'input': wav.astype(np.float32),
        'sr': np.asarray(sr, np.int64),
        'h': h.astype(np.float32), 'c': c.astype(np.float32)})
    return out, hn, cn


@needs_onnx
@pytest.mark.parametrize('sr,window', [(16000, 512), (16000, 1536),
                                       (8000, 256)])
def test_matches_onnx_graph(oracle, sr, window):
    from ppasr_tpu.infer_utils.silero_jax import load_params, score_windows
    params, config = load_params(NPZ_PATH, sr)
    rng = np.random.default_rng(7)
    h = np.zeros((2, 1, 64), np.float32)
    c = np.zeros((2, 1, 64), np.float32)
    jh, jc = h.copy(), c.copy()
    for step in range(4):
        wav = (rng.standard_normal((1, window)) * 0.1).astype(np.float32)
        ref, h, c = _oracle_run(oracle, wav, sr, h, c)
        got, jh, jc = score_windows(params, config, wav, jh, jc)
        got = np.asarray(got)
        assert np.allclose(got[0], ref[0, 0], atol=2e-4), \
            (step, got[0], ref[0, 0])
        assert np.allclose(np.asarray(jh), h, atol=2e-4)
        assert np.allclose(np.asarray(jc), c, atol=2e-4)


@needs_onnx
def test_matches_onnx_on_speech(oracle):
    """Real speech through both implementations, stateful across windows."""
    import wave
    from ppasr_tpu.infer_utils.silero_jax import SileroVAD
    wav_path = '/root/reference/dataset/test.wav'
    if not os.path.exists(wav_path):
        pytest.skip('no reference test.wav')
    with wave.open(wav_path, 'rb') as f:
        pcm = np.frombuffer(f.readframes(f.getnframes()),
                            np.int16).astype(np.float32) / 32768.0
    n = min(len(pcm) // 512, 40)
    windows = pcm[:n * 512].reshape(n, 512)

    vad = SileroVAD(NPZ_PATH)
    got = vad(windows)

    h = np.zeros((2, 1, 64), np.float32)
    c = np.zeros((2, 1, 64), np.float32)
    ref = []
    for i in range(n):
        out, h, c = _oracle_run(oracle, windows[i:i + 1], 16000, h, c)
        ref.append(out[0, 0])
    ref = np.asarray(ref)
    assert np.abs(got - ref).max() < 5e-3, np.abs(got - ref).max()
    # and the probabilities must actually discriminate
    assert ref.max() > 0.9 and ref.min() < 0.1


def test_speech_vs_silence_discrimination():
    if not os.path.exists(NPZ_PATH):
        pytest.skip('no converted weights')
    from ppasr_tpu.infer_utils.silero_jax import SileroVAD
    vad = SileroVAD(NPZ_PATH)
    assert vad(np.zeros((10, 512), np.float32)).max() < 0.2
    vad.reset()
    wav_path = '/root/reference/dataset/test.wav'
    if not os.path.exists(wav_path):
        pytest.skip('no real speech fixture for the positive case')
    import wave
    with wave.open(wav_path, 'rb') as f:
        pcm = np.frombuffer(f.readframes(f.getnframes()),
                            np.int16).astype(np.float32) / 32768.0
    n = len(pcm) // 512
    probs = vad(pcm[:n * 512].reshape(n, 512))
    assert probs.max() > 0.9 and probs.min() < 0.1  # speech and pauses
