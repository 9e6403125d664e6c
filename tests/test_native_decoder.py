"""Native C++ CTC decoder vs the numpy oracle (auto-builds via g++)."""
import shutil

import numpy as np
import pytest

from ppasr_tpu.decoders.beam_search import ctc_prefix_beam_search

pytestmark = pytest.mark.skipif(shutil.which('g++') is None,
                                reason="no C++ compiler")

VOCAB = ['<blank>'] + [chr(ord('a') + i) for i in range(25)]
V = len(VOCAB)


def _native(**kw):
    from ppasr_tpu.decoders.native import NativeBeamSearchDecoder
    return NativeBeamSearchDecoder(VOCAB, **kw)


def test_native_matches_oracle():
    rng = np.random.default_rng(0)
    dec = _native(beam_size=10, cutoff_prob=1.0, cutoff_top_n=V,
                  alpha=0, beta=0)
    for trial in range(3):
        probs = rng.dirichlet(np.ones(V) * 0.5, size=20)
        host = ctc_prefix_beam_search(probs, beam_size=10, blank=0,
                                      cutoff_prob=1.0, cutoff_top_n=V)
        score, text = dec.decode(probs.astype(np.float32))
        host_text = ''.join(VOCAB[i] for i in host[0][1])
        assert text == host_text
        assert abs(score - host[0][0]) < 1e-4


def test_native_batch_and_lengths():
    rng = np.random.default_rng(1)
    probs = rng.dirichlet(np.ones(V) * 0.5, size=(2, 15)).astype(np.float32)
    dec = _native(beam_size=8, cutoff_prob=1.0, cutoff_top_n=V,
                  alpha=0, beta=0, num_processes=2)
    res = dec.decode_batch(probs, [15, 7])
    host = ctc_prefix_beam_search(probs[1, :7].astype(np.float64),
                                  beam_size=8, blank=0, cutoff_prob=1.0,
                                  cutoff_top_n=V)
    assert res[1][1] == ''.join(VOCAB[i] for i in host[0][1])


def test_native_streaming_equals_offline():
    rng = np.random.default_rng(2)
    probs = rng.dirichlet(np.ones(V) * 0.5, size=24).astype(np.float32)
    dec = _native(beam_size=8, cutoff_prob=1.0, cutoff_top_n=V,
                  alpha=0, beta=0)
    off_score, off_text = dec.decode(probs)
    dec.reset()
    for chunk in np.split(probs, [8, 16]):
        score, text = dec.decode_chunk(chunk)
    assert text == off_text
    assert abs(score - off_score) < 1e-4


def test_native_lm_fusion(tmp_path):
    arpa = tmp_path / "lm.arpa"
    arpa.write_text("""
\\data\\
ngram 1=2

\\1-grams:
-0.1\tb
-3.0\ta

\\end\\
""")
    vocab = ['<blank>', 'a', 'b']
    from ppasr_tpu.decoders.native import NativeBeamSearchDecoder
    probs = np.array([[0.05, 0.5, 0.45], [0.9, 0.05, 0.05]], np.float32)
    no_lm = NativeBeamSearchDecoder(vocab, beam_size=4, cutoff_prob=1.0,
                                    cutoff_top_n=3, alpha=0, beta=0)
    assert no_lm.decode(probs)[1] == 'a'
    with_lm = NativeBeamSearchDecoder(vocab, beam_size=4, cutoff_prob=1.0,
                                      cutoff_top_n=3, alpha=2.0, beta=0,
                                      language_model_path=str(arpa))
    assert with_lm.decode(probs)[1] == 'b'
