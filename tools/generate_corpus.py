"""Generate a TTS sentence list (utt_id<space>sentence) from manifests or a
raw text file (parity with reference tools/generate_audio/generate_corpus.py)
— feed the output to tools/generate_audio.py."""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ppasr_tpu.utils.common import add_arguments, print_arguments

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg('input_path', str, 'corpus_raw.txt',
        'raw text file (one sentence per line) or JSON-lines manifest')
add_arg('output_path', str, 'corpus.txt', 'sentence list output')
add_arg('prefix', str, 'gen', 'utt_id prefix')
args = parser.parse_args()


def main():
    print_arguments(args=args)
    sentences = []
    with open(args.input_path, 'r', encoding='utf-8') as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith('{'):
                import json
                line = json.loads(line).get('text', '')
            if line:
                sentences.append(line)
    with open(args.output_path, 'w', encoding='utf-8') as f:
        for i, s in enumerate(sentences):
            f.write(f"{args.prefix}{i:06d} {s}\n")
    print(f"wrote {len(sentences)} sentences to {args.output_path}")


if __name__ == '__main__':
    main()
