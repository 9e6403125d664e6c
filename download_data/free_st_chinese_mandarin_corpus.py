"""Download Free ST-Chinese-Mandarin-Corpus and produce annotations
(parity with reference download_data/free_st_chinese_mandarin_corpus.py)."""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from utility import add_arguments, download, print_arguments, unpack

DATA_URL = ('https://openslr.trmal.net/resources/38/'
            'ST-CMDS-20170001_1-OS.tar.gz')
MD5_DATA = 'c28ddfc8e4ebe48949bc79a0c23c5545'

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg("target_dir", str, "../dataset/audio/", "audio download dir")
add_arg("annotation_text", str, "../dataset/annotation/", "annotation dir")
args = parser.parse_args()


def create_annotation_text(data_dir, annotation_path):
    os.makedirs(annotation_path, exist_ok=True)
    out = os.path.join(annotation_path,
                       'free_st_chinese_mandarin_corpus.txt')
    with open(out, 'w', encoding='utf-8') as f_a:
        for subfolder, _, filelist in sorted(os.walk(data_dir)):
            for file in sorted(filelist):
                if not file.endswith('.wav'):
                    continue
                wav = os.path.join(subfolder, file).replace('\\', '/')
                with open(wav[:-4] + '.txt', 'r', encoding='utf-8') as f:
                    text = f.readline().strip()
                f_a.write(f"{wav.replace('../', '')}\t{text}\n")


def prepare_dataset(url, md5sum, target_dir, annotation_path):
    data_dir = os.path.join(target_dir, 'ST-CMDS-20170001_1-OS')
    if not os.path.exists(data_dir):
        filepath = download(url, md5sum, target_dir)
        unpack(filepath, target_dir)
        os.remove(filepath)
    else:
        print(f"skip downloading existing {data_dir}")
    create_annotation_text(data_dir, annotation_path)


if __name__ == '__main__':
    print_arguments(args=args)
    prepare_dataset(DATA_URL, MD5_DATA, args.target_dir,
                    args.annotation_text)
