"""Download AIShell-1 and produce annotation files
(parity with reference download_data/aishell.py: train+dev → aishell.txt,
test → test.txt, tab-separated path\ttext with spaces stripped)."""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from utility import add_arguments, download, print_arguments, unpack

DATA_URL = 'https://openslr.trmal.net/resources/33/data_aishell.tgz'
MD5_DATA = '2f494334227864a8a8fec932999db9d8'

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg("target_dir", str, "../dataset/audio/", "audio download dir")
add_arg("annotation_text", str, "../dataset/annotation/", "annotation dir")
args = parser.parse_args()


def create_annotation_text(data_dir, annotation_path):
    os.makedirs(annotation_path, exist_ok=True)
    transcript_path = os.path.join(data_dir, 'transcript',
                                   'aishell_transcript_v0.8.txt')
    transcript = {}
    with open(transcript_path, 'r', encoding='utf-8') as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            audio_id, text = line.split(' ', 1)
            transcript[audio_id] = ''.join(text.split())

    def walk_split(split, out_file, mode):
        with open(out_file, mode, encoding='utf-8') as f:
            audio_dir = os.path.join(data_dir, 'wav', split)
            for subfolder, _, filelist in sorted(os.walk(audio_dir)):
                for fname in sorted(filelist):
                    audio_id = fname[:-4]
                    if audio_id not in transcript:
                        continue
                    path = os.path.join(subfolder, fname).replace('\\', '/')
                    f.write(f"{path.replace('../', '')}\t"
                            f"{transcript[audio_id]}\n")

    train_txt = os.path.join(annotation_path, 'aishell.txt')
    with open(train_txt, 'w', encoding='utf-8'):
        pass
    for split in ['train', 'dev']:
        walk_split(split, train_txt, 'a')
    test_txt = os.path.join(annotation_path, 'test.txt')
    walk_split('test', test_txt,
               'a' if os.path.exists(test_txt) else 'w')


def prepare_dataset(url, md5sum, target_dir, annotation_path):
    data_dir = os.path.join(target_dir, 'data_aishell')
    if not os.path.exists(data_dir):
        filepath = download(url, md5sum, target_dir)
        unpack(filepath, target_dir)
        # audio files are packed per-speaker inside
        audio_dir = os.path.join(data_dir, 'wav')
        for subfolder, _, filelist in sorted(os.walk(audio_dir)):
            for ftar in filelist:
                if ftar.endswith('.tar.gz'):
                    unpack(os.path.join(subfolder, ftar), subfolder, True)
    else:
        print(f"skip downloading existing {data_dir}")
    create_annotation_text(data_dir, annotation_path)


if __name__ == '__main__':
    print_arguments(args=args)
    prepare_dataset(DATA_URL, MD5_DATA, args.target_dir,
                    args.annotation_text)
