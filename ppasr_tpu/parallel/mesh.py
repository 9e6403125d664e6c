"""Device mesh + sharding rules (DP over hosts/chips, TP over ICI).

The reference's only parallelism is fleet data-parallel NCCL allreduce
(ppasr/trainer.py:529-544). The TPU-native design (SURVEY.md §2.2) is a
2-D ``(data, model)`` mesh:

- ``data``: batch axis — gradients are psum-reduced by GSPMD when the batch
  is sharded and params are replicated along it.
- ``model``: tensor parallelism for large encoders — Dense/attention kernels
  are sharded on their output features, the following layer on input
  features, so XLA inserts all-gather/reduce-scatter over ICI.

All sharding is expressed with NamedSharding/PartitionSpec consumed by jit —
no hand-written collectives in the model code.
"""
import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = None, n_model: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), \
        f"mesh {n_data}x{n_model} > {len(devices)} devices"
    grid = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ('data', 'model'))


def _leaf_spec(path: tuple, leaf) -> P:
    """TP rule: 2-D kernels shard output features over 'model'; embeddings
    shard features; everything else replicated. GSPMD propagates/reshards
    as needed."""
    name = '/'.join(str(getattr(p, 'key', getattr(p, 'idx', p)))
                    for p in path)
    if leaf.ndim >= 2 and ('kernel' in name or 'embedding' in name):
        spec = [None] * leaf.ndim
        spec[-1] = 'model'
        # don't shard dims that are not divisible — fall back to replicated
        return P(*spec)
    return P()


def param_shardings(mesh: Mesh, params, tp: bool = True):
    """NamedSharding tree for a param pytree; tp=False replicates all."""
    def to_sharding(path, leaf):
        if not tp:
            return NamedSharding(mesh, P())
        spec = _leaf_spec(path, leaf)
        # divisibility check: replicate anything that doesn't tile evenly
        for dim, axis in enumerate(spec):
            if axis is not None:
                if leaf.shape[dim] % mesh.shape[axis] != 0:
                    return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)
    return jax.tree_util.tree_map_with_path(to_sharding, params)


def batch_shardings(mesh: Mesh, batch, batch_axis: int = 0):
    """Shard the batch dim over 'data'."""
    def to_sharding(leaf):
        spec = [None] * leaf.ndim
        spec[batch_axis] = 'data'
        return NamedSharding(mesh, P(*spec))
    return jax.tree_util.tree_map(to_sharding, batch)
