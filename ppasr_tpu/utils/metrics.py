"""Error-rate metrics (CER / WER).

Behavior parity with reference ppasr/utils/metrics.py:4-30:
- ``cer``: Levenshtein distance over characters divided by reference length,
  with all whitespace stripped first.
- ``wer``: word-level error rate computed by remapping each distinct word to a
  single unicode character and reusing the character-level distance.
"""
import Levenshtein


def cer(hypothesis: str, reference: str) -> float:
    """Character error rate; whitespace is ignored (reference metrics.py:4-14)."""
    hypothesis = hypothesis.replace(" ", "")
    reference = reference.replace(" ", "")
    if len(reference) == 0:
        return 0.0 if len(hypothesis) == 0 else 1.0
    return Levenshtein.distance(hypothesis, reference) / len(reference)


def wer(hypothesis: str, reference: str) -> float:
    """Word error rate via the char-remapping trick (reference metrics.py:17-30)."""
    hyp_words = hypothesis.split()
    ref_words = reference.split()
    if len(ref_words) == 0:
        return 0.0 if len(hyp_words) == 0 else 1.0
    vocab = {}
    for w in ref_words + hyp_words:
        if w not in vocab:
            vocab[w] = chr(len(vocab))
    hyp_str = "".join(vocab[w] for w in hyp_words)
    ref_str = "".join(vocab[w] for w in ref_words)
    return Levenshtein.distance(hyp_str, ref_str) / len(ref_words)
