"""Dump the training manifest transcripts as an LM training corpus
(parity with reference tools/create_kenlm_corpus.py): one space-separated
character sequence per line, ready for kenlm/lmplz or any ARPA trainer."""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ppasr_tpu.data.manifest import read_manifest
from ppasr_tpu.utils.common import add_arguments, print_arguments

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg('train_manifest', str, 'dataset/manifest.train', 'training manifest')
add_arg('output_path', str, 'lm/corpus.txt', 'corpus output file')
args = parser.parse_args()
print_arguments(args=args)

os.makedirs(os.path.dirname(args.output_path) or '.', exist_ok=True)
manifest = read_manifest(args.train_manifest)
with open(args.output_path, 'w', encoding='utf-8') as f:
    for entry in manifest:
        text = entry['text'].strip()
        if text:
            f.write(' '.join(list(text.replace(' ', ''))) + '\n')
print(f"wrote {len(manifest)} lines to {args.output_path}")
