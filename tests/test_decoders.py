"""Decoders: greedy collapse rules, prefix beam search vs exhaustive oracle,
streaming ≡ offline, ARPA LM scorer."""
import itertools
import math

import numpy as np
import pytest

from ppasr_tpu.decoders.beam_search import (BeamSearchDecoder,
                                            ctc_prefix_beam_search)
from ppasr_tpu.decoders.greedy import (GreedyStreamingDecoder, greedy_decoder,
                                       greedy_decoder_batch)

VOCAB = ['<blank>', 'a', 'b', 'c']


def test_greedy_collapse():
    # argmax path: a a blank b b -> "ab"
    probs = np.zeros((5, 4), np.float32)
    probs[0, 1] = 0.9
    probs[1, 1] = 0.8
    probs[2, 0] = 0.9
    probs[3, 2] = 0.7
    probs[4, 2] = 0.6
    for t in range(5):
        probs[t] /= probs[t].sum() + 1e-9
        probs[t, probs[t].argmax()] = max(probs[t])
    score, text = greedy_decoder(probs, VOCAB)
    assert text == 'ab'
    assert score > 0


def test_greedy_streaming_matches_offline():
    rng = np.random.default_rng(0)
    probs = rng.dirichlet(np.ones(4), size=20).astype(np.float32)
    off_score, off_text = greedy_decoder(probs, VOCAB)
    sd = GreedyStreamingDecoder(VOCAB)
    for chunk in np.split(probs, [7, 15]):
        score, text = sd.decode_chunk(chunk)
    assert text == off_text
    assert abs(score - off_score) < 1e-6


def _brute_force_ctc(probs, blank=0):
    """Exhaustive path-sum oracle: P(label) = sum over all alignments."""
    t_max, v = probs.shape
    scores = {}
    for path in itertools.product(range(v), repeat=t_max):
        p = math.prod(probs[t, path[t]] for t in range(t_max))
        # collapse
        label = []
        prev = -1
        for c in path:
            if c != prev and c != blank:
                label.append(c)
            prev = c
        key = tuple(label)
        scores[key] = scores.get(key, 0.0) + p
    return scores


def test_beam_search_matches_bruteforce():
    rng = np.random.default_rng(1)
    probs = rng.dirichlet(np.ones(3) * 2, size=4).astype(np.float64)
    # vocab = blank, a, b ; T=4 → 81 paths, exhaustive is cheap
    oracle = _brute_force_ctc(probs)
    best_label = max(oracle.items(), key=lambda kv: kv[1])
    results = ctc_prefix_beam_search(probs, beam_size=50, blank=0,
                                     cutoff_prob=1.0, cutoff_top_n=3)
    score, prefix = results[0]
    assert prefix == best_label[0]
    assert abs(math.exp(score) - best_label[1]) < 1e-6
    # scores for the top few prefixes must match the oracle exactly
    for s, pfx in results[:5]:
        assert abs(math.exp(s) - oracle.get(pfx, 0.0)) < 1e-6


def test_beam_search_streaming_matches_offline():
    rng = np.random.default_rng(2)
    probs = rng.dirichlet(np.ones(4), size=30).astype(np.float64)
    dec = BeamSearchDecoder(VOCAB, beam_size=20, cutoff_prob=1.0,
                            cutoff_top_n=4, alpha=0, beta=0)
    off_score, off_text = dec.decode(probs)
    dec.reset()
    for chunk in np.split(probs, [10, 20]):
        score, text = dec.decode_chunk(chunk)
    assert text == off_text
    assert abs(score - off_score) < 1e-6


def test_beam_beats_greedy_on_merging_case():
    """Classic case where greedy is suboptimal: probability mass of one label
    split across alignments."""
    # blank=0; P(t0)= [0.4, 0.6, 0], P(t1) = [0.4, 0.6, 0]
    probs = np.array([[0.4, 0.6, 0.0], [0.4, 0.6, 0.0]])
    # P("a") = 0.6*0.4 + 0.4*0.6 + 0.6*0.6 = 0.84; P("") = 0.16
    results = ctc_prefix_beam_search(probs, beam_size=10, cutoff_prob=1.0,
                                     cutoff_top_n=3)
    score, prefix = results[0]
    assert prefix == (1,)
    assert abs(math.exp(score) - 0.84) < 1e-9


def test_arpa_lm_scorer(tmp_path):
    arpa = tmp_path / "test.arpa"
    arpa.write_text("""
\\data\\
ngram 1=4
ngram 2=2

\\1-grams:
-0.5\ta\t-0.3
-1.0\tb\t-0.2
-1.5\tc\t0.0
-2.0\t<unk>

\\2-grams:
-0.2\ta b
-0.9\tb c

\\end\\
""")
    from ppasr_tpu.decoders.lm import NgramScorer
    vocab = ['<blank>', 'a', 'b', 'c']
    lm = NgramScorer(str(arpa), vocab)
    # bigram hit: P(b | a) = -0.2
    assert abs(lm.score((1,), 2) - (-0.2)) < 1e-9
    # backoff: P(a | c) = backoff(c)=0.0 + P(a) = -0.5
    assert abs(lm.score((3,), 1) - (-0.5)) < 1e-9
    # backoff with weight: P(a | b) = backoff(b) + P(a) = -0.2 + -0.5
    assert abs(lm.score((2,), 1) - (-0.7)) < 1e-9


def test_lm_fusion_changes_ranking():
    probs = np.array([[0.05, 0.5, 0.45], [0.9, 0.05, 0.05]])

    class FavorB:
        def score(self, prefix, new_id):
            return 0.0 if new_id == 2 else -3.0

    no_lm = ctc_prefix_beam_search(probs, beam_size=10, cutoff_prob=1.0,
                                   cutoff_top_n=3)
    with_lm = ctc_prefix_beam_search(probs, beam_size=10, cutoff_prob=1.0,
                                     cutoff_top_n=3, scorer=FavorB(),
                                     alpha=1.0, beta=0.0)
    assert no_lm[0][1] == (1,)
    assert with_lm[0][1] == (2,)
