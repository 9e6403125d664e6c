"""Small shared utilities.

Capability parity with reference ppasr/utils/utils.py: attribute-access config
dicts (``dict_to_object``, :45-56), argparse helpers (``add_arguments`` :36-42,
``print_arguments`` :13-33), and ``labels_to_string`` (:59-65).
"""
import distutils.util
from typing import Sequence

from ppasr_tpu.utils.logger import setup_logger

logger = setup_logger(__name__)


class AttrDict(dict):
    """dict with attribute access, recursively applied by ``dict_to_object``."""

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key, value):
        self[key] = value


def dict_to_object(d):
    """Recursively convert a plain dict into an AttrDict (reference utils.py:45-56)."""
    if isinstance(d, dict):
        return AttrDict({k: dict_to_object(v) for k, v in d.items()})
    if isinstance(d, (list, tuple)):
        return type(d)(dict_to_object(v) for v in d)
    return d


def add_arguments(argname, type, default, help, argparser, **kwargs):
    """argparse helper with bool-string coercion (reference utils.py:36-42)."""
    type = distutils.util.strtobool if type == bool else type
    argparser.add_argument("--" + argname,
                           default=default,
                           type=type,
                           help=help + ' 默认: %(default)s.',
                           **kwargs)


def print_arguments(args=None, configs=None, title=None):
    """Echo resolved CLI args and config tree (reference utils.py:13-33)."""
    if args is not None:
        logger.info("----------- 额外配置参数 -----------")
        for arg, value in sorted(vars(args).items()):
            logger.info(f"{arg}: {value}")
        logger.info("------------------------------------------------")
    if configs is not None:
        title = title or "配置文件参数"
        logger.info(f"----------- {title} -----------")
        def _print(d, indent=0):
            for k, v in d.items():
                if isinstance(v, dict):
                    logger.info(f"{' ' * indent}{k}:")
                    _print(v, indent + 2)
                else:
                    logger.info(f"{' ' * indent}{k}: {v}")
        _print(configs)
        logger.info("------------------------------------------------")


def download(url: str, download_target: str) -> str:
    """Download a file with progress (reference utils.py:88-99)."""
    import os
    import urllib.request
    os_dir = os.path.dirname(download_target)
    if os_dir:
        os.makedirs(os_dir, exist_ok=True)

    def _progress(count, block_size, total_size):
        pct = count * block_size * 100 // max(total_size, 1)
        print(f"\rdownloading {url}: {min(pct, 100)}%", end='', flush=True)

    urllib.request.urlretrieve(url, download_target, _progress)
    print()
    return download_target


def download_model(url: str, download_target_dir: str) -> str:
    """Fetch + unpack a packaged model zip (reference utils.py:101-116;
    the reference's model zoo hosts Paddle checkpoints — point this at your
    own exported-artifact zips)."""
    import os
    import zipfile
    os.makedirs(download_target_dir, exist_ok=True)
    zip_path = os.path.join(download_target_dir, url.split('/')[-1])
    if not os.path.exists(zip_path):
        download(url, zip_path)
    with zipfile.ZipFile(zip_path) as z:
        z.extractall(download_target_dir)
    os.remove(zip_path)
    return download_target_dir


def labels_to_string(labels: Sequence[int],
                     vocabulary: Sequence[str],
                     eos: int = None,
                     blank_index: int = 0) -> str:
    """ids → text, dropping blank / -1 padding / eos (reference utils.py:59-65)."""
    if eos is None:
        eos = len(vocabulary) - 1
    chars = []
    for t in labels:
        t = int(t)
        if t == blank_index or t == -1 or t == eos:
            continue
        chars.append(vocabulary[t])
    return "".join(chars)
