"""CTC greedy decoding.

Behavior parity with reference ppasr/decoders/ctc_greedy_decoder.py:
- greedy_decoder (:6-31): argmax → collapse repeats → drop blank; score =
  mean of non-blank frame max-probs × 100.
- greedy_decoder_batch (:34-49).
- greedy_decoder_chunk (:52-89): running argmax history across chunks so
  streaming re-decodes the full utterance cheaply.

TPU-first split: the argmax/max-prob reduction (``ctc_argmax``) is a jnp
function that runs on device inside the jitted decode step; the tiny
collapse-to-text step is host-side numpy over int ids.
"""
import jax.numpy as jnp
import numpy as np


def ctc_argmax(probs: jnp.ndarray):
    """[B, T, V] probs → ([B, T] argmax ids, [B, T] max probs), on device."""
    return jnp.argmax(probs, axis=-1), jnp.max(probs, axis=-1)


def _collapse(ids: np.ndarray, max_probs: np.ndarray, vocabulary,
              blank_index: int = 0):
    """Collapse repeats → drop blanks → map to text + confidence score."""
    prev = -1
    tokens, scores = [], []
    for t, idx in enumerate(ids):
        idx = int(idx)
        if idx != prev:
            prev = idx
            if idx != blank_index:
                tokens.append(idx)
                scores.append(float(max_probs[t]))
    score = float(np.mean(scores) * 100) if scores else 0.0
    text = ''.join(vocabulary[i] for i in tokens)
    return score, text


def greedy_decoder(probs, vocabulary, blank_index: int = 0):
    """[T, V] probs → (score, text)."""
    probs = np.asarray(probs)
    ids = probs.argmax(axis=-1)
    return _collapse(ids, probs.max(axis=-1), vocabulary, blank_index)


def greedy_decoder_batch(probs_batch, lens, vocabulary, blank_index: int = 0):
    """[B, T, V] padded probs + [B] lens → list of (score, text).

    Pass DEVICE arrays straight in: the argmax/max reduction then runs on
    device and only the [B, T] id/score planes cross to the host — ~V×
    less device→host traffic than fetching the posteriors, which matters
    enormously through a high-latency/low-bandwidth device tunnel
    (per-epoch eval went ~7 min → seconds when the [B,T,V] transfer was
    eliminated)."""
    if isinstance(probs_batch, jnp.ndarray) \
            and not isinstance(probs_batch, np.ndarray):
        ids_dev, maxp_dev = ctc_argmax(probs_batch)
        ids_b, maxp_b = np.asarray(ids_dev), np.asarray(maxp_dev)
    else:
        arr = np.asarray(probs_batch)
        ids_b, maxp_b = arr.argmax(-1), arr.max(-1)
    out = []
    for b in range(ids_b.shape[0]):
        t = int(lens[b])
        out.append(_collapse(ids_b[b, :t], maxp_b[b, :t], vocabulary,
                             blank_index))
    return out


class GreedyStreamingDecoder:
    """Accumulates per-chunk argmax history (reference :52-89)."""

    def __init__(self, vocabulary, blank_index: int = 0):
        self.vocabulary = vocabulary
        self.blank_index = blank_index
        self.reset()

    def reset(self):
        self._ids = []
        self._probs = []

    def decode_chunk(self, chunk_probs):
        """chunk_probs: [T_chunk, V] for the new chunk. Returns (score, text)
        for the WHOLE utterance so far."""
        probs = np.asarray(chunk_probs)
        if probs.size:
            self._ids.extend(probs.argmax(axis=-1).tolist())
            self._probs.extend(probs.max(axis=-1).tolist())
        return self.current()

    def current(self):
        """(score, text) for everything decoded so far."""
        if not self._ids:
            return 0.0, ''
        return _collapse(np.asarray(self._ids), np.asarray(self._probs),
                         self.vocabulary, self.blank_index)
