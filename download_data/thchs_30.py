"""Download THCHS-30 and produce annotation files
(parity with reference download_data/thchs_30.py)."""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from utility import add_arguments, download, print_arguments, unpack

DATA_URL = 'https://openslr.trmal.net/resources/18/data_thchs30.tgz'
MD5_DATA = '2d2252bde5c8429929e1841d4cb95e90'

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg("target_dir", str, "../dataset/audio/", "audio download dir")
add_arg("annotation_text", str, "../dataset/annotation/", "annotation dir")
args = parser.parse_args()


def create_annotation_text(data_dir, annotation_path):
    os.makedirs(annotation_path, exist_ok=True)
    out = os.path.join(annotation_path, 'thchs_30.txt')
    with open(out, 'w', encoding='utf-8') as f_a:
        data_path = os.path.join(data_dir, 'data')
        for file in sorted(os.listdir(data_path)):
            if not file.endswith('.trn'):
                continue
            trn = os.path.join(data_path, file).replace('\\', '/')
            with open(trn, 'r', encoding='utf-8') as f:
                text = ''.join(f.readline().split())
            f_a.write(f"{trn[:-4].replace('../', '')}\t{text}\n")


def prepare_dataset(url, md5sum, target_dir, annotation_path):
    data_dir = os.path.join(target_dir, 'data_thchs30')
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
