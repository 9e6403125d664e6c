"""Convert the public Silero-VAD v3 ONNX model into ppasr_tpu's npz format.

The reference ships `silero_vad.onnx` (MIT-licensed, snakers4/silero-vad) and
runs it through onnxruntime (reference ppasr/infer_utils/vad_predictor.py:5,36).
Here the same public weights are extracted into a plain npz consumed by the
JAX re-implementation (ppasr_tpu/infer_utils/silero_jax.py) so VAD runs
on-device with no ONNX runtime.

Usage:
    python tools/convert_silero_vad.py <silero_vad.onnx> <out.npz>

The parser uses a minimal hand-written subset of the public ONNX protobuf
schema (tools/onnx_minimal/), since the `onnx` package is not available.

Graph structure recovered (both 16 kHz and 8 kHz branches of the top-level
`If(sr == 16000)`):
  reflect-pad 96 → conv1d(stride 64, k 256) with the fused window+rFFT basis
  → |.| magnitude (129 bins) → spect = log(1 + mag * 2^20)
  → adaptive normalization (channel mean, reflect-3 pad, 7-tap smooth,
    subtract time-mean) → concat(magnitude, norm) [258 ch]
  → dw/pw-separable conv blocks 258→16→32→32→64 with stride-2 1x1 convs
  → 2-layer LSTM(64) (ONNX iofc gate order) → 1x1 conv → sigmoid → time-mean.
"""
import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), 'onnx_minimal'))


def _tensor(t):
    dtypes = {1: np.float32, 6: np.int32, 7: np.int64, 9: np.bool_,
              11: np.float64}
    dt = dtypes[t.data_type]
    if t.raw_data:
        a = np.frombuffer(t.raw_data, dt)
    elif t.float_data:
        a = np.asarray(t.float_data, dt)
    elif t.int64_data:
        a = np.asarray(t.int64_data, dt)
    elif t.double_data:
        a = np.asarray(t.double_data, dt)
    else:
        a = np.zeros(0, dt)
    return a.reshape(list(t.dims)) if t.dims else a.reshape(())


def _collect_inits(graph, into):
    for t in graph.initializer:
        into[t.name] = _tensor(t)
    for n in graph.node:
        for a in n.attribute:
            if a.g.node or a.g.initializer:
                _collect_inits(a.g, into)
            for g in a.graphs:
                _collect_inits(g, into)


def _attr_ints(node, name, default=None):
    for a in node.attribute:
        if a.name == name:
            return list(a.ints) if a.ints else [a.i]
    return default


def _extract_branch(branch_graph, inits, prefix):
    """Walk one sample-rate branch and emit the weight dict."""
    out = {}
    convs = [n for n in branch_graph.node if n.op_type == 'Conv']

    # STFT basis: the stride-64 conv; adaptive-norm filter: the k=7 conv.
    stft = [n for n in convs if _attr_ints(n, 'strides') == [64]]
    assert len(stft) == 1, 'expected one stride-64 STFT conv'
    out['stft_basis'] = inits[stft[0].input[1]]
    an = [n for n in convs if _attr_ints(n, 'kernel_shape') == [7]]
    assert len(an) == 1
    out['an_filter'] = inits[an[0].input[1]]

    # Scalar constants on the log-magnitude path.
    muls = [n for n in branch_graph.node if n.op_type == 'Mul']
    scale = [inits[i] for n in muls for i in n.input
             if i in inits and inits[i].ndim == 0]
    assert scale and float(scale[0]) == 1048576.0, 'unexpected mag scale'
    out['mag_scale'] = np.float32(scale[0])
    pads = [n for n in branch_graph.node if n.op_type == 'Pad']
    pad_vals = inits[pads[0].input[1]]
    out['reflect_pad'] = np.int64(pad_vals[3])
    assert pad_vals[3] == pad_vals[7]

    # Depthwise-separable blocks, identified by weight name.
    def conv_by_weight(substr):
        for n in convs:
            if substr in n.input[1]:
                return n
        return None

    def put_block(key, name_prefix):
        dw = conv_by_weight(name_prefix + '.dw_conv.0.weight')
        pw = conv_by_weight(name_prefix + '.pw_conv.0.weight')
        proj = conv_by_weight(name_prefix + '.proj.weight')
        out[f'{key}.dw_w'] = inits[dw.input[1]]
        out[f'{key}.dw_b'] = inits[dw.input[2]]
        out[f'{key}.pw_w'] = inits[pw.input[1]]
        out[f'{key}.pw_b'] = inits[pw.input[2]]
        if proj is not None:
            out[f'{key}.proj_w'] = inits[proj.input[1]]
            out[f'{key}.proj_b'] = inits[proj.input[2]]

    model_name = 'model_8k' if prefix == '8k' else 'model'
    put_block('first', f'{model_name}.first_layer.0')
    put_block('block1', f'{model_name}.encoder.3.0')
    put_block('block2', f'{model_name}.encoder.7.0')   # no proj (identity)
    put_block('block3', f'{model_name}.encoder.11.0')

    # The four numerically-named 1x1 convs, in node order:
    # down0(16,s2) down1(32,s2) down2(32,s2) final(64,s1).
    numeric = [n for n in convs
               if n.input[1].split('.')[0].isdigit()
               and _attr_ints(n, 'kernel_shape') == [1]]
    assert len(numeric) == 4, f'expected 4 numeric 1x1 convs, got {numeric}'
    # strides differ per branch: 16k = [2,2,2,1], 8k = [2,2,1,1]
    for key, n in zip(['down0', 'down1', 'down2', 'final'], numeric):
        out[f'{key}_w'] = inits[n.input[1]]
        out[f'{key}_b'] = inits[n.input[2]]
        out[f'{key}_stride'] = np.int64(_attr_ints(n, 'strides')[0])

    # Decoder head: 64→1 conv (weight name contains 'decoder').
    dec = conv_by_weight('decoder.decoder')
    out['dec_w'] = inits[dec.input[1]]
    out['dec_b'] = inits[dec.input[2]]

    # LSTMs: inside the inner If on h/c. Both its branches carry identical
    # weights (one zero-inits state); take the provided-state branch and
    # assert equality against the other.
    inner_ifs = [n for n in branch_graph.node if n.op_type == 'If'
                 and len(n.output) == 3]
    assert len(inner_ifs) == 1
    by_branch = {}
    for a in inner_ifs[0].attribute:
        lstms = [n for n in a.g.node if n.op_type == 'LSTM']
        assert len(lstms) == 2
        by_branch[a.name] = [(inits[n.input[1]], inits[n.input[2]],
                              inits[n.input[3]]) for n in lstms]
    for t, e in zip(by_branch['then_branch'], by_branch['else_branch']):
        for x, y in zip(t, e):
            assert np.array_equal(x, y), 'then/else LSTM weights differ'
    for key, (w, r, b) in zip(['lstm1', 'lstm2'], by_branch['then_branch']):
        out[f'{key}.W'] = w[0]   # [4H, input]  (iofc rows)
        out[f'{key}.R'] = r[0]   # [4H, H]
        out[f'{key}.B'] = b[0]   # [8H] = Wb ++ Rb
    return {f'{prefix}.{k}': v for k, v in out.items()}


def convert(onnx_path, out_path):
    import onnx_minimal_pb2 as pb
    model = pb.ModelProto()
    with open(onnx_path, 'rb') as f:
        model.ParseFromString(f.read())
    inits = {}
    _collect_inits(model.graph, inits)

    top_if = [n for n in model.graph.node if n.op_type == 'If'][0]
    branches = {a.name: a.g for a in top_if.attribute if a.g.node}
    # then_branch runs when sr == 16000 (Equal against initializer 16000).
    eq = [n for n in model.graph.node if n.op_type == 'Equal'][0]
    sr_const = int(inits[eq.input[1]])
    assert sr_const == 16000, f'unexpected Equal constant {sr_const}'

    weights = {}
    weights.update(_extract_branch(branches['then_branch'], inits, '16k'))
    weights.update(_extract_branch(branches['else_branch'], inits, '8k'))
    np.savez(out_path, **weights)
    total = sum(v.size for v in weights.values())
    print(f'wrote {out_path}: {len(weights)} arrays, {total} params')


if __name__ == '__main__':
    src = sys.argv[1] if len(sys.argv) > 1 else \
        '/root/reference/ppasr/infer_utils/silero_vad.onnx'
    dst = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(os.path.dirname(__file__), '..', 'ppasr_tpu', 'assets',
                     'silero_vad_v3.npz')
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    convert(src, dst)
