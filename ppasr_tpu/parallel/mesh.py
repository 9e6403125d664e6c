"""Device mesh + sharding rules (DP over hosts/chips, TP over ICI).

The reference's only parallelism is fleet data-parallel NCCL allreduce
(ppasr/trainer.py:529-544). The TPU-native design (SURVEY.md §2.2) is a
2-D ``(data, model)`` mesh:

- ``data``: batch axis — gradients are psum-reduced by GSPMD when the batch
  is sharded and params are replicated along it.
- ``model``: tensor parallelism for large encoders, Megatron-style pairing
  so each attention/FFN block needs exactly ONE reduce per direction.

TP sharding table (dims are over the 'model' axis; anything whose sharded
dim is not divisible by the TP degree is replicated):

| param                                  | shape      | sharded dim |
|----------------------------------------|------------|-------------|
| linear_q/k/v kernel (attention in)     | [D, D]     | out (heads) |
| linear_pos kernel (rel-pos proj)       | [D, D]     | out (heads) |
| pos_bias_u / pos_bias_v                | [H, dk]    | 0 (heads)   |
| linear_q/k/v/pos bias                  | [D]        | 0           |
| linear_out kernel (attention out)      | [D, D]     | in          |
| w_1 kernel (FFN in), pointwise_conv1   | [D, F]     | out         |
| w_1 / pointwise_conv1 bias             | [F]        | 0           |
| w_2 kernel (FFN out), pointwise_conv2  | [F, D]     | in          |
| depthwise_conv kernel                  | [k, 1, C]  | channels    |
| other 2-D+ kernel / embedding          | [..., O]   | out         |
| row-parallel biases, norms, scalars    |            | replicated  |

Column-parallel (output-sharded) layers produce activations already split
over 'model'; the paired row-parallel (input-sharded) layer consumes them
shard-local and its output is the partial sum GSPMD reduces once. Activation
constraints (``shard_activation``) pin the per-head attention tensors and the
FFN hidden so the propagation pass can't pick a worse layout.

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


# Megatron pairing (see module docstring). Matched against the LAST module
# name in the param path, so the rules apply uniformly across conformer /
# squeezeformer / efficient-conformer / transformer-decoder blocks.
_COLUMN_PARALLEL = ('linear_q', 'linear_k', 'linear_v', 'linear_pos',
                    'w_1', 'pointwise_conv1')
_ROW_PARALLEL = ('linear_out', 'w_2', 'pointwise_conv2')
_HEAD_PARAMS = ('pos_bias_u', 'pos_bias_v')


def _leaf_spec(path: tuple, leaf) -> P:
    parts = [str(getattr(p, 'key', getattr(p, 'idx', p))) for p in path]
    name, parent = parts[-1], (parts[-2] if len(parts) > 1 else '')
    if name in _HEAD_PARAMS:                       # [H, dk]
        return P('model')
    if name == 'kernel':
        spec = [None] * leaf.ndim
        if parent in _ROW_PARALLEL:
            # input-sharded: consumes column-parallel activations locally;
            # conv kernels keep trailing dims, input is dim -2
            spec[0 if leaf.ndim == 2 else -2] = 'model'
        else:
            # column-parallel + the generic fallback (subsampling convs,
            # CTC head [D, V], DS2 recurrent kernels): shard output features
            spec[-1] = 'model'
        return P(*spec)
    if name == 'bias' and parent in _COLUMN_PARALLEL and leaf.ndim == 1:
        return P('model')
    if name == 'embedding' and leaf.ndim >= 2:
        spec = [None] * leaf.ndim
        spec[-1] = 'model'
        return P(*spec)
    return P()


# --- activation sharding constraints -------------------------------------
# Model code calls shard_activation(x, 'data', None, 'model') at the few
# points where GSPMD's propagation pass has a real choice (per-head attention
# tensors, FFN hidden). A global mesh is armed by whoever builds the sharded
# step (trainer / dryrun / tests) BEFORE the first traced call and disarmed
# after; when no mesh is armed the helper is an exact no-op, so single-device
# training/inference and the CPU test suite never see a constraint.
_ACTIVATION_MESH = [None]


def set_activation_mesh(mesh):
    """Arm (or with None, disarm) the mesh used by shard_activation."""
    _ACTIVATION_MESH[0] = mesh


def shard_activation(x, *spec):
    """with_sharding_constraint against the armed mesh; no-op when disarmed
    or when a named dim doesn't divide evenly (small heads vs big TP)."""
    mesh = _ACTIVATION_MESH[0]
    if mesh is None:
        return x
    spec = tuple(spec) + (None,) * (x.ndim - len(spec))
    for dim, axis in enumerate(spec):
        if axis is not None and x.shape[dim] % mesh.shape[axis] != 0:
            return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


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
