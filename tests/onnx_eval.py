"""Minimal numpy ONNX-graph interpreter — test oracle for silero_jax.

Executes the graph file node-by-node (only the op types Silero-VAD v3 uses),
so tests/test_silero_vad.py can check the hand-mapped JAX implementation
against the *actual* ONNX semantics rather than against itself. Parsing uses
tools/onnx_minimal (hand-written subset of the public ONNX protobuf schema).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools',
                                'onnx_minimal'))

_DTYPES = {1: np.float32, 6: np.int32, 7: np.int64, 9: np.bool_,
           11: np.float64}
_INT_MAX = 9223372036854775807


def _tensor(t):
    dt = _DTYPES[t.data_type]
    if t.raw_data:
        a = np.frombuffer(t.raw_data, dt)
    elif t.float_data:
        a = np.asarray(t.float_data, dt)
    elif t.int64_data:
        a = np.asarray(t.int64_data, dt)
    else:
        a = np.zeros(0, dt)
    return a.reshape(list(t.dims)) if t.dims else a.reshape(())


def _attr(node, name, default=None):
    for a in node.attribute:
        if a.name == name:
            if a.ints:
                return list(a.ints)
            if a.s:
                return a.s.decode()
            if a.t.data_type:
                return _tensor(a.t)
            return a.i
    return default


def _conv(x, w, b, node):
    strides = _attr(node, 'strides', [1])
    pads = _attr(node, 'pads', [0, 0])
    groups = _attr(node, 'group', 1) or 1
    n, cin, length = x.shape
    cout, cin_g, k = w.shape
    x = np.pad(x, ((0, 0), (0, 0), (pads[0], pads[1])))
    out_len = (x.shape[2] - k) // strides[0] + 1
    out = np.zeros((n, cout, out_len), np.float32)
    og = cout // groups
    for g in range(groups):
        xg = x[:, g * cin_g:(g + 1) * cin_g]                 # [N, cin_g, L]
        wg = w[g * og:(g + 1) * og]                          # [og, cin_g, k]
        # im2col
        idx = np.arange(out_len)[:, None] * strides[0] + np.arange(k)[None]
        patches = xg[:, :, idx]                              # [N, cin_g, O, k]
        out[:, g * og:(g + 1) * og] = np.einsum(
            'ncok,mck->nmo', patches, wg, optimize=True)
    if b is not None:
        out += b[None, :, None]
    return out.astype(np.float32)


def _lstm(x, w, r, b, h0, c0):
    """ONNX LSTM, single direction, iofc gate order.
    x [T, B, I]; w [1, 4H, I]; r [1, 4H, H]; b [1, 8H]; h0/c0 [1, B, H]."""
    w, r, b = w[0], r[0], b[0]
    hid = r.shape[1]
    h, c = h0[0], c0[0]
    ys = []
    for t in range(x.shape[0]):
        g = x[t] @ w.T + h @ r.T + b[:4 * hid] + b[4 * hid:]
        i, o, f, cc = np.split(g, 4, axis=-1)
        i = 1 / (1 + np.exp(-i))
        o = 1 / (1 + np.exp(-o))
        f = 1 / (1 + np.exp(-f))
        c = f * c + i * np.tanh(cc)
        h = o * np.tanh(c)
        ys.append(h.copy())
    y = np.stack(ys)[:, None]                                # [T, 1, B, H]
    return y, h[None], c[None]


def _slice(data, starts, ends, axes=None, steps=None):
    starts = np.atleast_1d(np.asarray(starts)).tolist()
    ends = np.atleast_1d(np.asarray(ends)).tolist()
    axes = list(range(len(starts))) if axes is None \
        else np.atleast_1d(np.asarray(axes)).tolist()
    steps = [1] * len(starts) if steps is None \
        else np.atleast_1d(np.asarray(steps)).tolist()
    sl = [slice(None)] * data.ndim
    for s, e, a, st in zip(starts, ends, axes, steps):
        s = None if s in (-_INT_MAX, -_INT_MAX - 1) else int(s)
        if e >= _INT_MAX:
            e = None
        elif e <= -_INT_MAX:
            e = None
        else:
            e = int(e)
        sl[a] = slice(s, e, int(st))
    return data[tuple(sl)]


class OnnxGraphEvaluator:
    def __init__(self, model_path):
        import onnx_minimal_pb2 as pb
        self.model = pb.ModelProto()
        with open(model_path, 'rb') as f:
            self.model.ParseFromString(f.read())

    def run(self, feeds):
        env = dict(feeds)
        self._run_graph(self.model.graph, env)
        return [env[o.name] for o in self.model.graph.output]

    def _run_graph(self, graph, env):
        for t in graph.initializer:
            env.setdefault(t.name, _tensor(t))
        for node in graph.node:
            self._run_node(node, env)

    def _run_node(self, n, env):
        op = n.op_type
        x = [env[i] if i else None for i in n.input]

        if op == 'If':
            cond = bool(np.asarray(x[0]).reshape(()))
            branch = _attr(n, 'then_branch' if cond else 'else_branch')
            # attributes holding graphs need the raw proto, not _attr
            sub = None
            for a in n.attribute:
                if a.name == ('then_branch' if cond else 'else_branch'):
                    sub = a.g
            self._run_graph(sub, env)
            for out_name, sub_out in zip(n.output, sub.output):
                env[out_name] = env[sub_out.name]
            return

        if op == 'Conv':
            r = _conv(x[0], x[1], x[2] if len(x) > 2 else None, n)
        elif op == 'LSTM':
            y, h, c = _lstm(x[0], x[1], x[2], x[3], x[5], x[6])
            env[n.output[0]] = y
            env[n.output[1]] = h
            env[n.output[2]] = c
            return
        elif op == 'Shape':
            r = np.asarray(x[0].shape, np.int64)
        elif op == 'Gather':
            r = np.take(x[0], x[1].astype(np.int64),
                        axis=_attr(n, 'axis', 0) or 0)
        elif op == 'Unsqueeze':
            r = np.expand_dims(x[0], tuple(np.atleast_1d(x[1]).tolist()))
        elif op == 'Squeeze':
            axes = tuple(np.atleast_1d(x[1]).tolist()) if len(x) > 1 else None
            r = np.squeeze(x[0], axis=axes)
        elif op == 'Concat':
            r = np.concatenate([v for v in x], axis=_attr(n, 'axis', 0) or 0)
        elif op == 'Reshape':
            r = x[0].reshape([int(v) for v in x[1]])
        elif op == 'Pad':
            pads = np.asarray(x[1]).tolist()
            nd = x[0].ndim
            pairs = [(pads[i], pads[i + nd]) for i in range(nd)]
            mode = _attr(n, 'mode', 'constant')
            r = np.pad(x[0], pairs, mode=mode if mode != 'constant'
                       else 'constant')
        elif op == 'Slice':
            r = _slice(x[0], x[1], x[2], x[3] if len(x) > 3 else None,
                       x[4] if len(x) > 4 else None)
        elif op == 'Equal':
            r = np.equal(x[0], x[1])
        elif op == 'Cast':
            r = x[0].astype(_DTYPES[_attr(n, 'to', 1)])
        elif op == 'Identity':
            r = x[0]
        elif op == 'Pow':
            r = np.power(x[0], x[1]).astype(x[0].dtype)
        elif op == 'Add':
            r = x[0] + x[1]
        elif op == 'Mul':
            r = x[0] * x[1]
        elif op == 'Sqrt':
            r = np.sqrt(x[0])
        elif op == 'Log':
            r = np.log(x[0])
        elif op == 'Neg':
            r = -x[0]
        elif op == 'ReduceMean':
            axes = tuple(_attr(n, 'axes'))
            keep = _attr(n, 'keepdims', 1)
            keep = 1 if keep is None else keep
            r = np.mean(x[0], axis=axes, keepdims=bool(keep),
                        dtype=np.float32)
        elif op == 'Transpose':
            r = np.transpose(x[0], _attr(n, 'perm'))
        elif op == 'Relu':
            r = np.maximum(x[0], 0)
        elif op == 'Sigmoid':
            r = (1 / (1 + np.exp(-x[0]))).astype(np.float32)
        elif op == 'ConstantOfShape':
            val = _attr(n, 'value')
            fill = val.reshape(-1)[0] if val is not None else 0.0
            r = np.full([int(v) for v in x[0]], fill,
                        val.dtype if val is not None else np.float32)
        else:
            raise NotImplementedError(f'op {op}')
        env[n.output[0]] = r
