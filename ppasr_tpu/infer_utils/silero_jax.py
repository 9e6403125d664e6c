"""Silero-VAD v3 as a pure JAX function (exact ONNX-graph re-implementation).

The reference executes `silero_vad.onnx` through onnxruntime (reference
ppasr/infer_utils/vad_predictor.py:5,36-104). Here the same public weights —
extracted by tools/convert_silero_vad.py into an npz — drive a functional
JAX implementation, so VAD scoring runs on-device and batches over windows.

Graph (per sample-rate branch, recovered node-by-node from the ONNX):
  [B, W] samples
  → reflect-pad 96 each side
  → conv1d(basis [258,1,256], stride 64)    # fused hann-window + rFFT
  → magnitude = sqrt(re² + im²)             # 129 bins
  → spect = log(1 + magnitude · 2²⁰)
  → adaptive norm: channel-mean → reflect-3 pad → 7-tap smooth →
    time-mean → norm = spect − time-mean
  → x = concat(magnitude, norm)             # 258 channels
  → first block  (dw5 g258 → relu → pw 258→16) + proj(258→16), relu
  → down0 1x1 s2 relu → block1 (16→32, proj) relu
  → down1 1x1 s2 relu → block2 (32→32, identity residual) relu
  → down2 1x1 s*  relu → block3 (32→64, proj) relu → final 1x1 relu
  → 2-layer LSTM(64), ONNX iofc gate order, state [2, B, 64] h and c
  → relu → 1x1 conv 64→1 → sigmoid → mean over frames → [B] prob.

Batched scoring exploits that the conv frontend is stateless across windows:
all N windows run as one batch on the MXU, then a single `lax.scan` threads
the LSTM state through the N·T' frame sequence — bit-identical to feeding
windows one at a time (each window's frames are consecutive LSTM steps).
"""
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

_CONV_DN = ('NCH', 'OIH', 'NCH')


def load_params(npz_path: str, sample_rate: int = 16000):
    """npz (tools/convert_silero_vad.py) → (float param pytree, static int
    config dict) for one sample-rate branch."""
    prefix = '16k.' if sample_rate == 16000 else '8k.'
    raw = np.load(npz_path)
    params, config = {}, {}
    for key in raw.files:
        if key.startswith(prefix):
            name, val = key[len(prefix):], raw[key]
            if val.dtype == np.float32:
                params[name] = jnp.asarray(val)
            else:
                config[name] = int(val)   # reflect_pad, *_stride
    if not params:
        raise ValueError(f'no {prefix}* arrays in {npz_path}')
    return params, config


def _conv1d(x, w, b=None, stride=1, pad=0, groups=1):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(pad, pad)],
        dimension_numbers=_CONV_DN, feature_group_count=groups)
    if b is not None:
        out = out + b[None, :, None]
    return out


def _sep_block(x, p, key):
    """Depthwise-separable residual block: dw5 → relu → pw1, + proj/identity."""
    ch = x.shape[1]
    h = _conv1d(x, p[f'{key}.dw_w'], p[f'{key}.dw_b'], pad=2, groups=ch)
    h = jax.nn.relu(h)
    h = _conv1d(h, p[f'{key}.pw_w'], p[f'{key}.pw_b'])
    res = _conv1d(x, p[f'{key}.proj_w'], p[f'{key}.proj_b']) \
        if f'{key}.proj_w' in p else x
    return jax.nn.relu(h + res)


def encode_windows(params, config, x):
    """Stateless conv frontend: [B, W] samples → [B, T', 64] features."""
    p = params
    pad = config['reflect_pad']
    x = jnp.pad(x[:, None, :], ((0, 0), (0, 0), (pad, pad)), mode='reflect')
    ft = _conv1d(x, p['stft_basis'], stride=64)          # [B, 258, F]
    nbin = ft.shape[1] // 2
    mag = jnp.sqrt(ft[:, :nbin] ** 2 + ft[:, nbin:] ** 2)
    spect = jnp.log1p(mag * p['mag_scale'])
    mean = jnp.mean(spect, axis=1, keepdims=True)        # [B, 1, F]
    mean_padded = jnp.concatenate(
        [mean[:, :, 1:4][:, :, ::-1], mean, mean[:, :, -4:-1][:, :, ::-1]],
        axis=2)
    smooth = _conv1d(mean_padded, p['an_filter'])         # [B, 1, F]
    norm = spect - jnp.mean(smooth, axis=2, keepdims=True)
    h = jnp.concatenate([mag, norm], axis=1)              # [B, 258, F]

    h = _sep_block(h, p, 'first')
    for down, block in (('down0', 'block1'), ('down1', 'block2'),
                        ('down2', 'block3')):
        h = jax.nn.relu(_conv1d(h, p[f'{down}_w'], p[f'{down}_b'],
                                stride=config[f'{down}_stride']))
        h = _sep_block(h, p, block)
    h = jax.nn.relu(_conv1d(h, p['final_w'], p['final_b']))
    return jnp.transpose(h, (0, 2, 1))                    # [B, T', 64]


def _lstm_cell(p, key, x, h, c):
    """One ONNX-LSTM step, iofc gate order. x,h,c: [B, H_in]/[B, H]."""
    W, R, B = p[f'{key}.W'], p[f'{key}.R'], p[f'{key}.B']
    hid = R.shape[1]
    gates = x @ W.T + h @ R.T + B[:4 * hid] + B[4 * hid:]
    i, o, f, g = jnp.split(gates, 4, axis=-1)
    i, o, f = jax.nn.sigmoid(i), jax.nn.sigmoid(o), jax.nn.sigmoid(f)
    c_new = f * c + i * jnp.tanh(g)
    return o * jnp.tanh(c_new), c_new


def score_windows(params, config, windows, h, c):
    """[N, W] windows (one stream, consecutive) + LSTM state [2, 1, 64] →
    ([N] speech probs, new h, new c). Conv frontend batched; LSTM scanned
    over the N·T' frame sequence."""
    feats = encode_windows(params, config, windows)       # [N, T', 64]
    n, t, d = feats.shape
    seq = feats.reshape(n * t, 1, d)                      # stream-ordered

    def step(carry, x_t):
        h1, c1, h2, c2 = carry
        h1, c1 = _lstm_cell(params, 'lstm1', x_t, h1, c1)
        h2, c2 = _lstm_cell(params, 'lstm2', h1, h2, c2)
        return (h1, c1, h2, c2), h2

    init = (h[0], c[0], h[1], c[1])
    (h1, c1, h2, c2), outs = jax.lax.scan(step, init, seq)  # outs [N*T',1,64]
    dec = jax.nn.relu(outs[:, 0, :]) @ params['dec_w'][:, :, 0].T \
        + params['dec_b']                                  # [N*T', 1]
    probs = jax.nn.sigmoid(dec).reshape(n, t).mean(axis=1)
    return probs, jnp.stack([h1, h2]), jnp.stack([c1, c2])


class SileroVAD:
    """Stateful wrapper matching the reference's onnxruntime session usage:
    feed consecutive windows, carry hidden state, `reset()` between streams."""

    def __init__(self, npz_path: str, sample_rate: int = 16000):
        self.params, config = load_params(npz_path, sample_rate)
        self._fn = jax.jit(partial(score_windows, config=config))
        self.reset()

    def reset(self):
        self._h = jnp.zeros((2, 1, 64), jnp.float32)
        self._c = jnp.zeros((2, 1, 64), jnp.float32)

    def __call__(self, windows: np.ndarray) -> np.ndarray:
        """[N, W] consecutive windows → [N] speech probabilities."""
        if windows.size == 0:
            return np.zeros(0, np.float32)
        probs, self._h, self._c = self._fn(
            self.params, windows=jnp.asarray(windows, jnp.float32),
            h=self._h, c=self._c)
        return np.asarray(probs)
