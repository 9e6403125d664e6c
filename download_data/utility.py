"""Shared download/unpack helpers for the dataset downloaders
(parity with reference download_data/utility.py)."""
import hashlib
import os
import tarfile
import urllib.request
import zipfile

from ppasr_tpu.utils.common import add_arguments, print_arguments  # noqa: F401


def md5file(fname: str) -> str:
    hash_md5 = hashlib.md5()
    with open(fname, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            hash_md5.update(chunk)
    return hash_md5.hexdigest()


def download(url: str, md5sum: str, target_dir: str) -> str:
    """Download a file to target_dir, verifying md5 (skips if present)."""
    os.makedirs(target_dir, exist_ok=True)
    filepath = os.path.join(target_dir, url.split("/")[-1])
    if os.path.exists(filepath) and (md5sum is None
                                     or md5file(filepath) == md5sum):
        print(f"skip downloading existing {filepath}")
        return filepath
    print(f"downloading {url} ...")

    def _progress(count, block_size, total_size):
        done = count * block_size * 100 // max(total_size, 1)
        print(f"\r{min(done, 100)}%", end="", flush=True)

    urllib.request.urlretrieve(url, filepath, _progress)
    print()
    if md5sum is not None and md5file(filepath) != md5sum:
        raise RuntimeError(f"md5 mismatch for {filepath}")
    return filepath


def unpack(filepath: str, target_dir: str, rm_tar: bool = False):
    """Unpack a tar/zip archive."""
    print(f"unpacking {filepath} ...")
    if filepath.endswith('.zip'):
        with zipfile.ZipFile(filepath) as z:
            z.extractall(target_dir)
    else:
        with tarfile.open(filepath) as tar:
            tar.extractall(path=target_dir)
    if rm_tar:
        os.remove(filepath)
