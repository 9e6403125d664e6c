"""Download LibriSpeech and produce annotation files
(parity with reference download_data/librispeech.py: train splits →
librispeech.txt, test-clean → test.txt; transcripts lower-cased,
flac paths tab-separated)."""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from utility import add_arguments, download, print_arguments, unpack

URL_ROOT = "https://openslr.trmal.net/resources/12"
SPLITS = {
    'test-clean': ("32fa31d27d2e1cad72775fee3f4849a9", 'test'),
    'dev-clean': ("42e2234ba48799c1f50f24a7926300a1", 'train'),
    'train-clean-100': ("2a93770f6d5c6c964bc36631d331a522", 'train'),
    'train-clean-360': ("c0e676e450a7ff2f54aeade5171606fa", 'train'),
    'train-other-500': ("d1a0fd59409feb2c614ce4d30c387708", 'train'),
}

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg("target_dir", str, "../dataset/audio/", "audio download dir")
add_arg("annotation_text", str, "../dataset/annotation/", "annotation dir")
add_arg("subsets", str, "test-clean,train-clean-100",
        "comma-separated LibriSpeech subsets")
args = parser.parse_args()


def create_annotation_text(split_dir, out_file, mode):
    with open(out_file, mode, encoding='utf-8') as f_out:
        for subfolder, _, filelist in sorted(os.walk(split_dir)):
            for fname in sorted(filelist):
                if not fname.endswith('.trans.txt'):
                    continue
                with open(os.path.join(subfolder, fname), 'r',
                          encoding='utf-8') as f:
                    for line in f:
                        line = line.strip()
                        if not line:
                            continue
                        audio_id, text = line.split(' ', 1)
                        audio_path = os.path.join(
                            subfolder, audio_id + '.flac').replace('\\', '/')
                        f_out.write(f"{audio_path.replace('../', '')}\t"
                                    f"{text.lower()}\n")


def prepare(subset, md5, kind, target_dir, annotation_path):
    url = f"{URL_ROOT}/{subset}.tar.gz"
    split_dir = os.path.join(target_dir, 'LibriSpeech', subset)
    if not os.path.exists(split_dir):
        filepath = download(url, md5, target_dir)
        unpack(filepath, target_dir)
    else:
        print(f"skip downloading existing {split_dir}")
    os.makedirs(annotation_path, exist_ok=True)
    if kind == 'test':
        out = os.path.join(annotation_path, 'test.txt')
        create_annotation_text(split_dir, out,
                               'a' if os.path.exists(out) else 'w')
    else:
        out = os.path.join(annotation_path, 'librispeech.txt')
        create_annotation_text(split_dir, out,
                               'a' if os.path.exists(out) else 'w')


if __name__ == '__main__':
    print_arguments(args=args)
    for subset in args.subsets.split(','):
        subset = subset.strip()
        if subset not in SPLITS:
            print(f"unknown subset {subset}; options: {list(SPLITS)}")
            continue
        md5, kind = SPLITS[subset]
        prepare(subset, md5, kind, args.target_dir, args.annotation_text)
