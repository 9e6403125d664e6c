"""Model summary: parameter table + shape probe.

Capability parity with reference ppasr/utils/model_summary.py:361 (paddle
summary clone invoked at train start, trainer.py:213-217). For flax models
the parameter tree is statically known, so the summary walks the params
pytree and prints per-module parameter counts; the shape probe comes free
from model.init.
"""
import jax
import numpy as np

from ppasr_tpu.utils.logger import setup_logger

logger = setup_logger(__name__)


def summary(params, max_depth: int = 2, print_fn=None) -> int:
    """Print a per-module parameter-count table; returns total params."""
    print_fn = print_fn or logger.info
    counts = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = [str(getattr(p, 'key', getattr(p, 'idx', p))) for p in path]
        group = '/'.join(keys[:max_depth + 1])
        counts[group] = counts.get(group, 0) + int(np.prod(leaf.shape))
    total = sum(counts.values())
    width = max((len(k) for k in counts), default=10) + 2
    print_fn("-" * (width + 16))
    for k in sorted(counts):
        print_fn(f"{k:<{width}}{counts[k]:>12,}")
    print_fn("-" * (width + 16))
    print_fn(f"{'total':<{width}}{total:>12,}  "
             f"({total * 4 / 1024 / 1024:.1f} MB fp32)")
    return total
