"""Synthesize a training corpus with a TTS engine
(parity with reference tools/generate_audio/: sentences file → wavs +
annotation list). The reference uses paddlespeech TTS; this version accepts
any CLI TTS through --tts_command (e.g. piper, espeak-ng) with {text} and
{output} placeholders, keeping the corpus/annotation plumbing identical.
"""
import argparse
import functools
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ppasr_tpu.utils.common import add_arguments, print_arguments

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg('text', str, 'corpus.txt',
        'sentence list: "utt_id<space>sentence" per line')
add_arg('output_dir', str, '../dataset/audio/generate', 'wav output dir')
add_arg('annotation_path', str, '../dataset/annotation/generate.txt',
        'annotation output file')
add_arg('tts_command', str,
        'espeak-ng -v zh -w {output} "{text}"',
        'TTS shell command with {text}/{output} placeholders')
args = parser.parse_args()


def main():
    print_arguments(args=args)
    sentences = []
    with open(args.text, 'r', encoding='utf-8') as f:
        for line in f:
            parts = line.strip().split(maxsplit=1)
            if len(parts) == 2:
                sentences.append(parts)
    os.makedirs(args.output_dir, exist_ok=True)
    os.makedirs(os.path.dirname(args.annotation_path) or '.', exist_ok=True)
    start = 0
    if os.path.exists(args.annotation_path):
        with open(args.annotation_path, 'r', encoding='utf-8') as f:
            start = len(f.readlines())
    with open(args.annotation_path, 'a', encoding='utf-8') as f_ann:
        for utt_id, sentence in sentences[start:]:
            out_wav = os.path.join(args.output_dir, f'{utt_id}.wav')
            cmd = args.tts_command.format(text=sentence, output=out_wav)
            try:
                subprocess.run(cmd, shell=True, check=True,
                               capture_output=True)
            except subprocess.CalledProcessError as e:
                print(f"TTS failed for {utt_id}: {e}")
                continue
            clean = sentence.replace('。', '').replace('，', '')
            f_ann.write(f"{out_wav.replace(chr(92), '/')}\t{clean}\n")
    print(f"synthesized {len(sentences) - start} utterances")


if __name__ == '__main__':
    main()
