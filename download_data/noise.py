"""Download the RIRS_NOISES corpus for noise augmentation
(parity with reference download_data/noise.py: pointsource noises moved to
the noise dir)."""
import argparse
import functools
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from utility import add_arguments, download, print_arguments, unpack

DATA_URL = 'https://openslr.trmal.net/resources/28/rirs_noises.zip'
MD5_DATA = 'e6f48e257286e05de56413b4779d8ffb'

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg("target_dir", str, "../dataset/audio/", "download dir")
add_arg("noise_path", str, "../dataset/audio/noise/", "noise output dir")
args = parser.parse_args()


def prepare_dataset(url, md5sum, target_dir, noise_path):
    data_dir = os.path.join(target_dir, 'RIRS_NOISES')
    if not os.path.exists(data_dir):
        filepath = download(url, md5sum, target_dir)
        unpack(filepath, target_dir)
        os.remove(filepath)
    else:
        print(f"skip downloading existing {data_dir}")
    os.makedirs(noise_path, exist_ok=True)
    src = os.path.join(data_dir, 'pointsource_noises')
    for file in sorted(os.listdir(src)):
        if file.endswith('.wav'):
            shutil.copy(os.path.join(src, file),
                        os.path.join(noise_path, file))
    print(f"noise wavs copied to {noise_path}")


if __name__ == '__main__':
    print_arguments(args=args)
    prepare_dataset(DATA_URL, MD5_DATA, args.target_dir, args.noise_path)
