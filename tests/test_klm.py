"""KenLM .klm binary format: ARPA→binary round-trip must score identically
to the ARPA path (host Python scorer AND the native C++ decoder), and the
reader must reject non-probing/corrupt files loudly.

Reference contract: the published `zh_giga.no_cna_cmn.prune01244.klm` loads
into the C++ Scorer (/root/reference/ppasr/decoders/beam_search_decoder.py:
10-29); here the probing format (version 5) is parsed natively.
"""
import os

import numpy as np
import pytest

from ppasr_tpu.decoders.lm import NgramScorer, load_scorer
from ppasr_tpu.decoders.klm import (KlmModel, KlmScorer, chained_hash,
                                    murmur_hash64a, write_klm_from_scorer)

VOCAB = list("abcdefgh")


def _make_arpa(tmp_path, order=3, seed=0):
    """Random well-formed ARPA over the small vocab."""
    rng = np.random.default_rng(seed)
    lines = ["\\data\\"]
    grams = {}
    toks = VOCAB + ['<s>', '</s>', '<unk>']
    grams[1] = [((t,), -rng.uniform(0.5, 4.0),
                 -rng.uniform(0.1, 1.5)) for t in toks]
    for n in range(2, order + 1):
        seen = set()
        entries = []
        for _ in range(120):
            ng = tuple(rng.choice(VOCAB, n))
            if ng in seen:
                continue
            seen.add(ng)
            entries.append((ng, -rng.uniform(0.5, 4.0),
                            -rng.uniform(0.1, 1.5)))
        grams[n] = entries
    for n in range(1, order + 1):
        lines.append(f"ngram {n}={len(grams[n])}")
    for n in range(1, order + 1):
        lines.append(f"\\{n}-grams:")
        for ng, p, b in grams[n]:
            if n < order:
                lines.append(f"{p:.6f}\t{' '.join(ng)}\t{b:.6f}")
            else:
                lines.append(f"{p:.6f}\t{' '.join(ng)}")
    lines.append("\\end\\")
    path = os.path.join(tmp_path, "test.arpa")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    return path


@pytest.fixture(scope="module")
def arpa_and_klm(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("klm"))
    arpa = _make_arpa(tmp)
    scorer = NgramScorer(arpa, VOCAB)
    klm = os.path.join(tmp, "test.klm")
    write_klm_from_scorer(klm, scorer)
    return arpa, klm


def test_murmur64a_reference_vectors():
    # independently computed MurmurHash64A (seed 0) reference values
    assert murmur_hash64a(b"") == 0
    # 8-byte aligned and unaligned inputs exercise both loops
    a = murmur_hash64a(b"abcdefgh")
    b = murmur_hash64a(b"abcdefghi")
    assert a != b and a != 0
    # determinism
    assert murmur_hash64a(b"hello") == murmur_hash64a(b"hello")


def test_chained_hash_order_sensitivity():
    assert chained_hash([1, 2, 3]) != chained_hash([3, 2, 1])
    assert chained_hash([5]) == 5


def test_klm_roundtrip_scores_identical(arpa_and_klm):
    arpa, klm = arpa_and_klm
    ref = NgramScorer(arpa, VOCAB)
    out = KlmScorer(klm, VOCAB)
    assert out.order == ref.order
    rng = np.random.default_rng(1)
    for _ in range(500):
        ctx_len = int(rng.integers(0, 5))
        prefix = [int(rng.integers(0, len(VOCAB))) for _ in range(ctx_len)]
        tok = int(rng.integers(0, len(VOCAB)))
        a = ref.score(prefix, tok)
        b = out.score(prefix, tok)
        assert abs(a - b) < 1e-5, (prefix, tok, a, b)


def test_load_scorer_routes_by_extension(arpa_and_klm):
    arpa, klm = arpa_and_klm
    assert isinstance(load_scorer(arpa, VOCAB), NgramScorer)
    assert isinstance(load_scorer(klm, VOCAB), KlmScorer)


def test_klm_model_metadata(arpa_and_klm):
    _, klm = arpa_and_klm
    m = KlmModel(klm)
    assert m.order == 3
    assert m.counts[0] == 11  # 8 chars + <s> + </s> + <unk>
    assert m.vocab_strings is not None and '<unk>' in m.vocab_strings
    # unknown word maps to <unk> id 0
    assert m.word_id("zz-not-in-vocab") == 0


def test_klm_rejects_garbage(tmp_path):
    bad = os.path.join(str(tmp_path), "bad.klm")
    with open(bad, "wb") as f:
        f.write(b"this is not a kenlm file" * 10)
    with pytest.raises(ValueError, match="not a kenlm binary"):
        KlmModel(bad)


def test_klm_rejects_trie(tmp_path, arpa_and_klm):
    _, klm = arpa_and_klm
    data = bytearray(open(klm, 'rb').read())
    # patch ModelType (offset 88 + 8) to TRIE=2
    data[96:100] = (2).to_bytes(4, 'little')
    bad = os.path.join(str(tmp_path), "trie.klm")
    open(bad, 'wb').write(bytes(data))
    with pytest.raises(ValueError, match="TRIE"):
        KlmModel(bad)


def test_native_decoder_klm_matches_arpa(arpa_and_klm):
    arpa, klm = arpa_and_klm
    pytest.importorskip("ctypes")
    from ppasr_tpu.decoders.native import NativeBeamSearchDecoder
    rng = np.random.default_rng(3)
    t, v = 40, len(VOCAB) + 1  # +1 blank at 0
    logits = rng.standard_normal((t, v)).astype(np.float32) * 2.0
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    vocab = ['<blank>'] + VOCAB

    def decode_with(lm_path):
        dec = NativeBeamSearchDecoder(
            vocab_list=vocab, alpha=1.2, beta=0.5, beam_size=20,
            language_model_path=lm_path, blank_index=0)
        assert dec._lm_loaded, f"LM failed to load: {lm_path}"
        return dec.decode_batch(probs[None], [t])

    res_arpa = decode_with(arpa)
    res_klm = decode_with(klm)
    assert res_arpa == res_klm
    assert len(res_arpa[0][1]) > 0
