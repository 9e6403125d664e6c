"""Train a character n-gram LM in ARPA format from a corpus file.

The reference relies on external KenLM binaries (docs/beam_search.md); this
in-repo trainer produces a standard ARPA file with modified Kneser-Ney-lite
(absolute discounting + backoff) that both the host and on-device beam-search
decoders consume directly — no external toolchain needed.
"""
import argparse
import functools
import math
import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ppasr_tpu.utils.common import add_arguments, print_arguments

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg('corpus', str, 'lm/corpus.txt', 'space-separated token corpus')
add_arg('output_path', str, 'lm/lm.arpa', 'ARPA output file')
add_arg('order', int, 3, 'n-gram order')
add_arg('discount', float, 0.75, 'absolute discount')
add_arg('min_count', int, 1, 'prune n-grams below this count (order>1)')
args = parser.parse_args()


def train():
    print_arguments(args=args)
    order = args.order
    counts = [Counter() for _ in range(order + 1)]  # index by n
    with open(args.corpus, 'r', encoding='utf-8') as f:
        for line in f:
            toks = ['<s>'] + line.split() + ['</s>']
            for n in range(1, order + 1):
                for i in range(len(toks) - n + 1):
                    counts[n][tuple(toks[i:i + n])] += 1

    # absolute discounting with backoff
    probs = [dict() for _ in range(order + 1)]
    backoffs = [defaultdict(float) for _ in range(order + 1)]
    total_uni = sum(counts[1].values())
    vocab = len(counts[1])
    for w, c in counts[1].items():
        probs[1][w] = (c - args.discount) / total_uni + \
            args.discount * vocab / total_uni * (1.0 / vocab)
    for n in range(2, order + 1):
        ctx_totals = Counter()
        ctx_types = Counter()
        for ng, c in counts[n].items():
            ctx_totals[ng[:-1]] += c
            ctx_types[ng[:-1]] += 1
        for ng, c in counts[n].items():
            if c < args.min_count:
                continue
            ctx = ng[:-1]
            probs[n][ng] = max(c - args.discount, 0) / ctx_totals[ctx]
        for ctx in ctx_totals:
            mass = args.discount * ctx_types[ctx] / ctx_totals[ctx]
            backoffs[n - 1][ctx] = max(mass, 1e-8)

    os.makedirs(os.path.dirname(args.output_path) or '.', exist_ok=True)
    with open(args.output_path, 'w', encoding='utf-8') as f:
        f.write('\\data\\\n')
        for n in range(1, order + 1):
            f.write(f'ngram {n}={len(probs[n])}\n')
        f.write('\n')
        for n in range(1, order + 1):
            f.write(f'\\{n}-grams:\n')
            for ng, p in sorted(probs[n].items()):
                logp = math.log10(max(p, 1e-12))
                tok = ' '.join(ng)
                if n < order and ng in backoffs[n]:
                    bo = math.log10(max(backoffs[n][ng], 1e-12))
                    f.write(f'{logp:.6f}\t{tok}\t{bo:.6f}\n')
                else:
                    f.write(f'{logp:.6f}\t{tok}\n')
            f.write('\n')
        f.write('\\end\\\n')
    print(f"ARPA LM ({order}-gram) written to {args.output_path}")


if __name__ == '__main__':
    train()
