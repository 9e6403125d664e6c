"""Vectorized on-device beam search vs the host numpy oracle."""
import numpy as np
import jax.numpy as jnp

from ppasr_tpu.decoders.beam_search import ctc_prefix_beam_search
from ppasr_tpu.decoders.beam_search_jax import (JaxBeamSearchDecoder,
                                                beam_state_to_results,
                                                ctc_beam_search_jax)

VOCAB = ['<blank>'] + [chr(ord('a') + i) for i in range(25)]
V = len(VOCAB)


def test_matches_host_oracle():
    rng = np.random.default_rng(0)
    for trial in range(3):
        t = 20
        probs = rng.dirichlet(np.ones(V) * 0.5, size=t).astype(np.float32)
        host = ctc_prefix_beam_search(probs.astype(np.float64),
                                      beam_size=10, blank=0,
                                      cutoff_prob=1.0, cutoff_top_n=V)
        dev = ctc_beam_search_jax(jnp.asarray(probs[None]),
                                  jnp.asarray([t]), beam_size=10,
                                  cutoff_top_n=V, cutoff_prob=1.0)
        res = beam_state_to_results(dev, VOCAB)
        host_text = ''.join(VOCAB[i] for i in host[0][1])
        assert res[0][1] == host_text
        assert abs(res[0][0] - host[0][0]) < 1e-3


def test_batch_respects_lengths():
    rng = np.random.default_rng(1)
    t = 15
    probs = rng.dirichlet(np.ones(V) * 0.5, size=(2, t)).astype(np.float32)
    lens = [t, 7]
    dev = ctc_beam_search_jax(jnp.asarray(probs), jnp.asarray(lens),
                              beam_size=8, cutoff_top_n=V, cutoff_prob=1.0)
    res = beam_state_to_results(dev, VOCAB)
    # second utterance must equal decoding only its first 7 frames
    host = ctc_prefix_beam_search(probs[1, :7].astype(np.float64),
                                  beam_size=8, blank=0, cutoff_prob=1.0,
                                  cutoff_top_n=V)
    host_text = ''.join(VOCAB[i] for i in host[0][1])
    assert res[1][1] == host_text


def test_streaming_equals_offline():
    rng = np.random.default_rng(2)
    probs = rng.dirichlet(np.ones(V) * 0.5, size=24).astype(np.float32)
    dec = JaxBeamSearchDecoder(VOCAB, beam_size=8, cutoff_prob=1.0,
                               cutoff_top_n=V, alpha=0, beta=0)
    off_score, off_text = dec.decode(probs)
    dec.reset()
    score = text = None
    for chunk in np.split(probs, [8, 16]):
        score, text = dec.decode_chunk(chunk)
    assert text == off_text
    assert abs(score - off_score) < 1e-3


def test_lm_fusion_changes_ranking(tmp_path):
    arpa = tmp_path / "lm.arpa"
    arpa.write_text("""
\\data\\
ngram 1=2

\\1-grams:
-0.1\tb
-3.0\ta

\\end\\
""")
    probs = np.array([[0.05, 0.5, 0.45], [0.9, 0.05, 0.05]], np.float32)
    vocab = ['<blank>', 'a', 'b']
    no_lm = JaxBeamSearchDecoder(vocab, beam_size=4, cutoff_prob=1.0,
                                 cutoff_top_n=3, alpha=0, beta=0)
    assert no_lm.decode(probs)[1] == 'a'
    with_lm = JaxBeamSearchDecoder(vocab, beam_size=4, cutoff_prob=1.0,
                                   cutoff_top_n=3, alpha=2.0, beta=0,
                                   language_model_path=str(arpa))
    assert with_lm.decode(probs)[1] == 'b'


def test_match_merge_equals_sort_merge():
    """The default 'match' merge (stay↔extend hash compare) must agree with
    the 'sort' merge (sort + neighbor pair-merge) and the host oracle —
    both are exact up to 32-bit hash collisions."""
    rng = np.random.default_rng(7)
    t = 40
    probs = rng.dirichlet(np.ones(V) * 0.4, size=(3, t)).astype(np.float32)
    lens = jnp.asarray([t, t - 9, t])
    out = {}
    for mode in ('match', 'sort'):
        dev = ctc_beam_search_jax(jnp.asarray(probs), lens, beam_size=10,
                                  cutoff_top_n=20, cutoff_prob=0.99,
                                  merge_mode=mode)
        out[mode] = beam_state_to_results(dev, VOCAB)
    for (s_m, t_m), (s_s, t_s) in zip(out['match'], out['sort']):
        assert t_m == t_s
        assert abs(s_m - s_s) < 1e-4
    host = ctc_prefix_beam_search(probs[1, :t - 9].astype(np.float64),
                                  beam_size=10, blank=0, cutoff_prob=0.99,
                                  cutoff_top_n=20)
    assert out['match'][1][1] == ''.join(VOCAB[i] for i in host[0][1])


def test_all_blank_utterance_compaction():
    """A silence clip (every frame blank-dominated) must decode to the
    empty hypothesis with compaction on, exactly like the full path —
    the synthetic forced frame may not leak real candidates."""
    probs = np.full((2, 30, V), 0.001 / (V - 1), np.float32)
    probs[:, :, 0] = 0.999
    probs /= probs.sum(-1, keepdims=True)
    lens = [30, 17]
    dec_c = JaxBeamSearchDecoder(VOCAB, beam_size=6, cutoff_prob=0.99,
                                 cutoff_top_n=10, alpha=0, beta=0,
                                 blank_skip_threshold=0.98)
    dec_f = JaxBeamSearchDecoder(VOCAB, beam_size=6, cutoff_prob=0.99,
                                 cutoff_top_n=10, alpha=0, beta=0,
                                 blank_skip_threshold=1.0)
    rc = dec_c.decode_batch(jnp.asarray(probs), lens)
    rf = dec_f.decode_batch(jnp.asarray(probs), lens)
    for (sc, tc), (sf, tf) in zip(rc, rf):
        assert tc == tf == ''
    # and the full BeamState view (rescoring input) carries no junk
    # hypotheses beyond the empty one
    states = dec_c.decode_batch_states(jnp.asarray(probs), lens)
    from ppasr_tpu.decoders.beam_search_jax import all_hypotheses
    prefixes, lengths, scores = all_hypotheses(states, 8)
    alive = np.asarray(scores) > -1e15
    assert np.asarray(lengths)[alive].max() == 0
