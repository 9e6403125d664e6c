"""Int8 weight quantization for exported models.

Capability parity with the reference's PaddleSlim post-training dynamic
quantization on export (ppasr/trainer.py:684-694): weights of matmul-bearing
layers are stored as int8 + per-output-channel float scales (~4× smaller
artifact); activations stay floating point. On load the weights are
dequantized (to f32 or bf16) — the TPU runs the matmuls from HBM at bf16
speed either way, so this is a storage/IO optimization exactly like the
reference's dynamic quant mode.
"""
import numpy as np

import jax


def _is_quantizable(path_keys, leaf) -> bool:
    name = path_keys[-1] if path_keys else ''
    return leaf.ndim >= 2 and name in ('kernel', 'embedding')


def quantize_params(params):
    """float param pytree → {'q': int8/raw tree, 's': scales tree} dicts
    (flattened path → array), json-free binary-safe structure."""
    flat = jax.tree_util.tree_leaves_with_path(params)
    q, s, raw = {}, {}, {}
    for path, leaf in flat:
        keys = tuple(str(getattr(p, 'key', getattr(p, 'idx', p)))
                     for p in path)
        key = '/'.join(keys)
        arr = np.asarray(leaf)
        if _is_quantizable(keys, arr):
            # per-output-channel (last dim) symmetric int8
            amax = np.max(np.abs(arr), axis=tuple(range(arr.ndim - 1)),
                          keepdims=True)
            scale = np.maximum(amax, 1e-8) / 127.0
            qv = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
            q[key] = qv
            s[key] = scale.astype(np.float32)
        else:
            raw[key] = arr
    return {'q': q, 's': s, 'raw': raw}


def dequantize_params(blob, like_params, dtype=np.float32):
    """Inverse of quantize_params, reshaped onto the ``like_params`` tree."""
    flat = jax.tree_util.tree_leaves_with_path(like_params)
    leaves = []
    for path, leaf in flat:
        keys = tuple(str(getattr(p, 'key', getattr(p, 'idx', p)))
                     for p in path)
        key = '/'.join(keys)
        if key in blob['q']:
            arr = blob['q'][key].astype(dtype) * blob['s'][key]
        else:
            arr = blob['raw'][key].astype(dtype)
        leaves.append(arr)
    treedef = jax.tree_util.tree_structure(like_params)
    return jax.tree_util.tree_unflatten(treedef, leaves)
