"""EfficientConformer: progressive time stride + grouped attention.

Behavior parity with reference ppasr/model_utils/efficient_conformer/:
- EfficientConformerEncoder (encoder.py:22-394): conformer whose
  ``stride_layer_idx`` layers downsample time ×stride via a strided depthwise
  conv with an AvgPool residual (StrideConformerEncoderLayer, :497-531);
  masks/pos_emb strided after those layers (:252-257); ``group_layer_idx``
  layers use grouped relative-position attention; ``stride_kernel`` halves
  the cnn kernel after each stride.
- GroupedRelPositionMultiHeadedAttention (attention.py:16-193): time axis
  folded into groups of ``group_size`` (pad4group :40-79), head feature dim
  becomes d_k·group, scores scaled by sqrt(d_k·group).
- Conv2dSubsampling2 (subsampling.py:10-58).

TPU-native streaming (replacing encoder.py:342-383's cache stride /
repeat_interleave): per-layer STATIC ring caches sized C/factor(i), exactly
as in ppasr_tpu/models/squeezeformer.py — no runtime cache rescaling.
"""
import math
from typing import Any, List, NamedTuple, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ppasr_tpu.models.attention import MultiHeadedAttention, _neg_inf
from ppasr_tpu.models.base import Dropout, GlobalCMVN, get_activation, kaiming_uniform
from ppasr_tpu.models.convolution import ConvolutionModule
from ppasr_tpu.models.ctc import CTCHead
from ppasr_tpu.models.embedding import sinusoid_table
from ppasr_tpu.models.positionwise import PositionwiseFeedForward
from ppasr_tpu.models.subsampling import SUBSAMPLING_CLASSES
from ppasr_tpu.models.transformer_decoder import BiTransformerDecoder
from ppasr_tpu.ops.common import (IGNORE_ID, add_sos_eos, reverse_pad_list,
                                  th_accuracy)
from ppasr_tpu.ops.label_smoothing import label_smoothing_loss
from ppasr_tpu.ops.masks import add_optional_chunk_mask, make_non_pad_mask


class EffConState(NamedTuple):
    offset: jnp.ndarray      # [B] int32 (per-stream)
    cache_len: jnp.ndarray   # [B] int32
    att_k: Tuple[jnp.ndarray, ...]   # layer i: [B, C//factor(i), H, dk]
    att_v: Tuple[jnp.ndarray, ...]
    cnn_cache: Tuple[jnp.ndarray, ...]  # layer i: [B, lorder_i, D]


class Conv2dSubsampling2(nn.Module):
    """Single stride-2 3×3 VALID conv (reference subsampling.py:10-58)."""
    odim: int
    dtype: jnp.dtype = jnp.float32

    subsampling_rate = 2
    right_context = 2

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = x[..., None]
        x = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding='VALID',
                    kernel_init=kaiming_uniform, dtype=self.dtype)(x)
        x = nn.relu(x)
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        return nn.Dense(self.odim, kernel_init=kaiming_uniform,
                        dtype=self.dtype)(x)

    @staticmethod
    def out_len(t):
        return (t - 1) // 2


class GroupedRelPositionAttention(nn.Module):
    """Grouped Transformer-XL attention (reference attention.py:16-193)."""
    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    group_size: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.d_k = self.n_feat // self.n_head
        d = dict(kernel_init=kaiming_uniform, dtype=self.dtype)
        self.linear_q = nn.Dense(self.n_feat, **d)
        self.linear_k = nn.Dense(self.n_feat, **d)
        self.linear_v = nn.Dense(self.n_feat, **d)
        self.linear_out = nn.Dense(self.n_feat, **d)
        self.linear_pos = nn.Dense(self.n_feat, **d)
        self.dropout = Dropout(self.dropout_rate)
        self.pos_bias_u = self.param(
            'pos_bias_u', nn.initializers.xavier_uniform(),
            (self.n_head, self.d_k * self.group_size))
        self.pos_bias_v = self.param(
            'pos_bias_v', nn.initializers.xavier_uniform(),
            (self.n_head, self.d_k * self.group_size))

    @staticmethod
    def _pad_time(x, g):
        t = x.shape[1]
        pad = (g - t % g) % g
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
        return x, pad

    def _group(self, x, g):
        """[B, T, H, dk] → [B, T/g, H, dk*g]."""
        b, t, h, dk = x.shape
        return x.reshape(b, t // g, g, h, dk).transpose(0, 1, 3, 2, 4) \
            .reshape(b, t // g, h, g * dk)

    def __call__(self, query, key, value, mask=None, pos_emb=None,
                 kv_cache=None, deterministic=True):
        g = self.group_size
        b = query.shape[0]

        def heads(x, proj):
            return proj(x).reshape(b, x.shape[1], self.n_head, self.d_k)

        q = heads(query, self.linear_q)
        k = heads(key, self.linear_k)
        v = heads(value, self.linear_v)
        if kv_cache is not None:
            k_cache, v_cache = kv_cache
            k = jnp.concatenate([k_cache, k], axis=1)
            v = jnp.concatenate([v_cache, v], axis=1)
        new_cache = (k, v)

        p = self.linear_pos(pos_emb)  # [1|B, S, D]
        p = p.reshape(pos_emb.shape[0], -1, self.n_head, self.d_k)

        q, pad_q = self._pad_time(q, g)
        k, _ = self._pad_time(k, g)
        v, _ = self._pad_time(v, g)
        p, _ = self._pad_time(p, g)
        qg = self._group(q, g)   # [B, T1/g, H, g*dk]
        kg = self._group(k, g)
        vg = self._group(v, g)
        pg = self._group(p, g)

        q_u = qg + self.pos_bias_u.astype(qg.dtype)[None, None]
        q_v = qg + self.pos_bias_v.astype(qg.dtype)[None, None]
        matrix_ac = jnp.einsum('bthd,bshd->bhts', q_u, kg)
        pos_spec = 'ushd' if pg.shape[0] == 1 else 'bshd'
        matrix_bd = jnp.einsum(f'bthd,{pos_spec}->bhts', q_v, pg)
        scores = (matrix_ac + matrix_bd) / math.sqrt(self.d_k * g)

        if mask is not None:
            m = mask[:, ::g, ::g] if mask.shape[1] > 1 else mask[:, :, ::g]
            m = m[:, None, :, :scores.shape[-1]]
            scores = jnp.where(m, scores, _neg_inf(scores.dtype))
            attn = nn.softmax(scores, axis=-1)
            attn = jnp.where(m, attn, 0.0)
        else:
            attn = nn.softmax(scores, axis=-1)
        attn = self.dropout(attn, deterministic=deterministic)
        x = jnp.einsum('bhts,bshd->bthd', attn, vg)  # [B, T1/g, H, g*dk]
        t1g = x.shape[1]
        x = x.reshape(b, t1g, self.n_head, g, self.d_k) \
            .transpose(0, 1, 3, 2, 4).reshape(b, t1g * g, self.n_feat)
        if pad_q:
            x = x[:, :x.shape[1] - pad_q]
        return self.linear_out(x), new_cache


class EffConLayer(nn.Module):
    """Conformer block, optionally strided (StrideConformerEncoderLayer,
    reference encoder.py:497-640): the conv module's depthwise conv carries
    the stride and the conv residual goes through AvgPool(ceil)."""
    size: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    macaron_style: bool = True
    cnn_module_kernel: int = 15
    cnn_module_norm: str = 'layer_norm'
    causal: bool = False
    activation: Any = nn.swish
    final_norm: bool = True   # block-final LayerNorm; see conformer_encoder
    grouped: bool = False
    group_size: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, pos_emb, mask_pad=None, kv_cache=None,
                 cnn_cache=None, deterministic=True):
        ff_scale = 0.5 if self.macaron_style else 1.0
        dropout = Dropout(self.dropout_rate)

        if self.macaron_style:
            residual = x
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name='norm_ff_macaron')(x) \
                if self.normalize_before else x
            y = PositionwiseFeedForward(self.size, self.linear_units,
                                        self.dropout_rate, self.activation,
                                        dtype=self.dtype,
                                        name='feed_forward_macaron')(
                y, deterministic)
            x = residual + ff_scale * dropout(y, deterministic=deterministic)
            if not self.normalize_before:
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name='norm_ff_macaron')(x)

        residual = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm_mha')(x) \
            if self.normalize_before else x
        if self.grouped:
            y_att, new_kv = GroupedRelPositionAttention(
                self.attention_heads, self.size,
                self.attention_dropout_rate, self.group_size,
                dtype=self.dtype, name='self_attn')(
                y, y, y, mask=mask, pos_emb=pos_emb, kv_cache=kv_cache,
                deterministic=deterministic)
        else:
            y_att, new_kv = MultiHeadedAttention(
                self.attention_heads, self.size,
                self.attention_dropout_rate, rel_pos=True,
                dtype=self.dtype, name='self_attn')(
                y, y, y, mask=mask, pos_emb=pos_emb, kv_cache=kv_cache,
                deterministic=deterministic)
        x = residual + dropout(y_att, deterministic=deterministic)
        if not self.normalize_before:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name='norm_mha')(x)

        # conv module (with optional stride)
        residual = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm_conv')(x) \
            if self.normalize_before else x
        y, new_cnn = StridedConvolutionModule(
            self.size, self.cnn_module_kernel, self.activation,
            self.cnn_module_norm, self.causal, self.stride,
            dtype=self.dtype, name='conv_module')(
            y, mask_pad, cnn_cache, deterministic)
        if self.stride > 1:
            # AvgPool1D(stride, ceil_mode=True) on the residual
            t = residual.shape[1]
            pad = (self.stride - t % self.stride) % self.stride
            r = jnp.pad(residual, ((0, 0), (0, pad), (0, 0)))
            denom = jnp.minimum(
                jnp.arange(0, r.shape[1], self.stride) + self.stride,
                t) - jnp.arange(0, r.shape[1], self.stride)
            r = r.reshape(r.shape[0], -1, self.stride, r.shape[2]).sum(2) \
                / jnp.maximum(denom, 1)[None, :, None].astype(r.dtype)
            residual = r
        x = residual + dropout(y, deterministic=deterministic)
        if not self.normalize_before:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name='norm_conv')(x)

        residual = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm_ff')(x) \
            if self.normalize_before else x
        y = PositionwiseFeedForward(self.size, self.linear_units,
                                    self.dropout_rate, self.activation,
                                    dtype=self.dtype, name='feed_forward')(
            y, deterministic)
        x = residual + ff_scale * dropout(y, deterministic=deterministic)
        if not self.normalize_before:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm_ff')(x)
        if self.final_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name='norm_final')(x)
        return x, new_kv, new_cnn


class StridedConvolutionModule(nn.Module):
    """Conformer conv module whose depthwise conv may be strided
    (reference efficient_conformer/convolution.py:26-80)."""
    channels: int
    kernel_size: int = 15
    activation: Any = nn.swish
    norm: str = 'layer_norm'
    causal: bool = False
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @property
    def lorder(self):
        return self.kernel_size - 1 if self.causal else 0

    @nn.compact
    def __call__(self, x, mask_pad=None, cache=None, deterministic=True):
        if self.stride == 1:
            return ConvolutionModule(self.channels, self.kernel_size,
                                     self.activation, self.norm, self.causal,
                                     dtype=self.dtype, name='inner')(
                x, mask_pad, cache, deterministic)
        if mask_pad is not None:
            x = jnp.where(mask_pad.transpose(0, 2, 1), x, 0.0)
        if self.causal:
            pad = cache if cache is not None else jnp.zeros(
                (x.shape[0], self.lorder, x.shape[2]), x.dtype)
            x_padded = jnp.concatenate([pad, x], axis=1)
            new_cache = x_padded[:, -self.lorder:, :] if self.lorder \
                else x_padded[:, :0, :]
            dw_padding = 'VALID'
        else:
            x_padded = x
            new_cache = jnp.zeros((x.shape[0], 0, x.shape[2]), x.dtype)
            dw_padding = [( (self.kernel_size - 1) // 2,
                            (self.kernel_size - 1) // 2)]
        y = nn.Dense(2 * self.channels, kernel_init=kaiming_uniform,
                     dtype=self.dtype, name='pointwise_conv1')(x_padded)
        a, b = jnp.split(y, 2, axis=-1)
        y = a * nn.sigmoid(b)
        y = nn.Conv(self.channels, (self.kernel_size,),
                    strides=(self.stride,), padding=dw_padding,
                    feature_group_count=self.channels,
                    kernel_init=kaiming_uniform, dtype=self.dtype,
                    name='depthwise_conv')(y)
        if self.norm == 'layer_norm':
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm')(y)
        else:
            y = nn.BatchNorm(use_running_average=deterministic,
                             momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             name='norm')(y)
        y = self.activation(y)
        y = nn.Dense(self.channels, kernel_init=kaiming_uniform,
                     dtype=self.dtype, name='pointwise_conv2')(y)
        return y, new_cache


def _as_list(v):
    if v is None:
        return []
    return [v] if isinstance(v, int) else list(v)


class EfficientConformerEncoder(nn.Module):
    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 12
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: str = 'conv2d'
    pos_enc_layer_type: str = 'rel_pos'
    normalize_before: bool = True
    static_chunk_size: int = 0
    use_dynamic_chunk: bool = False
    use_dynamic_left_chunk: bool = False
    macaron_style: bool = True
    activation_type: str = 'swish'
    use_cnn_module: bool = True
    cnn_module_kernel: int = 15
    causal: bool = False
    cnn_module_norm: str = 'layer_norm'
    stride_layer_idx: Union[int, List[int]] = 3
    stride: Union[int, List[int]] = 2
    group_layer_idx: Union[int, List[int], tuple] = (0, 1, 2, 3)
    group_size: int = 3
    stride_kernel: bool = True
    max_len: int = 5000
    cmvn_mean: Optional[tuple] = None
    cmvn_istd: Optional[tuple] = None
    # per-block main-path LayerNorm: keeping the reference function class by
    # default; campaign/zoo configs disable it (see conformer_encoder
    # block_final_norm — at 12 blocks it delays CTC blank-escape ~10x)
    block_final_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def subsampling_rate(self):
        if self.input_layer == 'conv2d2':
            return Conv2dSubsampling2.subsampling_rate
        return SUBSAMPLING_CLASSES[self.input_layer].subsampling_rate

    @property
    def right_context(self):
        if self.input_layer == 'conv2d2':
            return Conv2dSubsampling2.right_context
        return SUBSAMPLING_CLASSES[self.input_layer].right_context

    def out_len(self, t):
        if self.input_layer == 'conv2d2':
            return Conv2dSubsampling2.out_len(t)
        return SUBSAMPLING_CLASSES[self.input_layer].out_len(t)

    def factor(self, i: int) -> int:
        """Downsampling factor the INPUT of layer i sees
        (reference encoder.py:205-210)."""
        f = 1
        for idx, s_idx in zip(_as_list(self.stride),
                              _as_list(self.stride_layer_idx)):
            if i > s_idx:
                f *= idx
        return f

    @property
    def total_factor(self) -> int:
        return self.factor(self.num_blocks + 1)

    def _kernels(self):
        """Per-stride-segment cnn kernels (reference encoder.py:126-132)."""
        kernels = [self.cnn_module_kernel]
        for s in _as_list(self.stride):
            kernels.append(kernels[-1] // s if self.stride_kernel
                           else kernels[-1])
        return kernels

    def setup(self):
        if self.cmvn_mean is not None:
            self.global_cmvn = GlobalCMVN(self.cmvn_mean, self.cmvn_istd)
        if self.input_layer == 'conv2d2':
            self.embed = Conv2dSubsampling2(self.output_size,
                                            dtype=self.dtype)
        else:
            self.embed = SUBSAMPLING_CLASSES[self.input_layer](
                self.output_size, dtype=self.dtype)
        self.pos_dropout = Dropout(self.positional_dropout_rate)
        act = get_activation(self.activation_type)
        stride_idx = _as_list(self.stride_layer_idx)
        strides = _as_list(self.stride)
        group_idx = set(_as_list(self.group_layer_idx))
        kernels = self._kernels()
        layers = []
        seg = 0
        for i in range(self.num_blocks):
            is_stride = i in stride_idx
            layers.append(EffConLayer(
                size=self.output_size,
                attention_heads=self.attention_heads,
                linear_units=self.linear_units,
                dropout_rate=self.dropout_rate,
                attention_dropout_rate=self.attention_dropout_rate,
                normalize_before=self.normalize_before,
                macaron_style=self.macaron_style,
                cnn_module_kernel=kernels[seg],
                cnn_module_norm=self.cnn_module_norm,
                causal=self.causal,
                activation=act,
                grouped=(i in group_idx),
                group_size=self.group_size,
                stride=strides[stride_idx.index(i)] if is_stride else 1,
                final_norm=self.block_final_norm,
                dtype=self.dtype))
            if is_stride:
                seg += 1
        self.layers = layers
        if self.normalize_before:
            self.after_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)

    def _pos_table(self, left_pad: int = 0):
        pe = sinusoid_table(self.output_size, self.max_len)
        if left_pad:
            pe = np.concatenate(
                [np.zeros((left_pad, self.output_size), np.float32), pe])
        return jnp.asarray(pe, self.dtype)

    def _embed(self, xs, deterministic):
        if self.cmvn_mean is not None:
            xs = self.global_cmvn(xs)
        return self.embed(xs, deterministic)

    def __call__(self, xs, xs_lens, decoding_chunk_size: int = 0,
                 num_decoding_left_chunks: int = -1, deterministic=True):
        """Full forward (reference encoder.py:212-265). Output time is
        T' / total_factor; the returned masks are strided accordingly."""
        xs = self._embed(xs, deterministic)
        t_sub = xs.shape[1]
        out_lens = self.out_len(xs_lens.astype(jnp.int32))
        masks = make_non_pad_mask(out_lens, t_sub)[:, None, :]
        mask_pad = masks

        pos_emb = self._pos_table()[None, :t_sub]
        xs = xs * jnp.asarray(np.sqrt(self.output_size), self.dtype)
        xs = self.pos_dropout(xs, deterministic=deterministic)

        rng = (self.make_rng('chunk')
               if (self.use_dynamic_chunk and decoding_chunk_size == 0
                   and not deterministic) else None)
        dcs = decoding_chunk_size
        if rng is None and self.use_dynamic_chunk and dcs == 0:
            dcs = -1
        chunk_masks = add_optional_chunk_mask(
            t_sub, masks, self.use_dynamic_chunk, self.use_dynamic_left_chunk,
            dcs, self.static_chunk_size, num_decoding_left_chunks, rng=rng)

        stride_idx = _as_list(self.stride_layer_idx)
        strides = _as_list(self.stride)
        for i, layer in enumerate(self.layers):
            xs, _, _ = layer(xs, chunk_masks, pos_emb, mask_pad=mask_pad,
                             deterministic=deterministic)
            if i in stride_idx:
                s = strides[stride_idx.index(i)]
                masks = masks[:, :, ::s]
                chunk_masks = chunk_masks[:, ::s, ::s]
                mask_pad = masks
                pos_emb = pos_emb[:, ::s, :]
                xs = xs[:, :mask_pad.shape[-1], :]
        if self.normalize_before:
            xs = self.after_norm(xs)
        return xs, masks

    # ------------------------------------------------------------ streaming

    def init_state(self, batch_size: int, cache_size: int) -> EffConState:
        h = self.attention_heads
        dk = self.output_size // h
        kernels = self._kernels()
        stride_idx = _as_list(self.stride_layer_idx)
        att_k, att_v, cnn = [], [], []
        seg = 0
        for i in range(self.num_blocks):
            f = self.factor(i)
            c_i = max(cache_size // f, 1)
            att_k.append(jnp.zeros((batch_size, c_i, h, dk), self.dtype))
            att_v.append(jnp.zeros((batch_size, c_i, h, dk), self.dtype))
            lorder = kernels[seg] - 1 if self.causal else 0
            cnn.append(jnp.zeros((batch_size, lorder, self.output_size),
                                 self.dtype))
            if i in stride_idx:
                seg += 1
        return EffConState(offset=jnp.zeros((batch_size,), jnp.int32),
                           cache_len=jnp.zeros((batch_size,), jnp.int32),
                           att_k=tuple(att_k), att_v=tuple(att_v),
                           cnn_cache=tuple(cnn))

    def forward_chunk(self, xs, state: EffConState):
        """One streaming chunk with per-scale static ring caches."""
        c = state.att_k[0].shape[1]
        xs = self._embed(xs, True)
        t_out = xs.shape[1]
        s = c + t_out
        xs = xs * jnp.asarray(np.sqrt(self.output_size), self.dtype)

        pe = self._pos_table(left_pad=c)
        offsets = jnp.broadcast_to(
            jnp.asarray(state.offset, jnp.int32).reshape(-1),
            (xs.shape[0],))
        pos_base = jax.vmap(lambda off: jax.lax.dynamic_slice(
            pe, (off, jnp.zeros((), jnp.int32)),
            (s, self.output_size)))(offsets)      # [B, S, D]

        stride_idx = _as_list(self.stride_layer_idx)
        strides = _as_list(self.stride)
        new_k = [None] * self.num_blocks
        new_v = [None] * self.num_blocks
        new_cnn = [None] * self.num_blocks
        cur = xs
        for i, layer in enumerate(self.layers):
            f = self.factor(i)
            c_i = state.att_k[i].shape[1]
            t_i = cur.shape[1]
            s_i = c_i + t_i
            pos_i = pos_base[:, ::f, :][:, -s_i:, :] if f > 1 \
                else pos_base[:, -s_i:, :]
            cache_len_i = jnp.minimum(
                jnp.broadcast_to(
                    jnp.asarray(state.cache_len, jnp.int32).reshape(-1),
                    (cur.shape[0],)) // f, c_i)
            j = jnp.arange(s_i, dtype=jnp.int32)[None, None, :]
            att_mask = j >= (c_i - cache_len_i)[:, None, None]
            cur, (k_all, v_all), cnn_c = layer(
                cur, att_mask, pos_i, mask_pad=None,
                kv_cache=(state.att_k[i], state.att_v[i]),
                cnn_cache=state.cnn_cache[i]
                if state.cnn_cache[i].shape[1] else None,
                deterministic=True)
            new_k[i] = k_all[:, -c_i:]
            new_v[i] = v_all[:, -c_i:]
            new_cnn[i] = cnn_c if cnn_c is not None and cnn_c.shape[1] \
                else state.cnn_cache[i]
        if self.normalize_before:
            cur = self.after_norm(cur)
        new_state = EffConState(
            offset=state.offset + t_out,
            cache_len=jnp.minimum(state.cache_len + t_out, c),
            att_k=tuple(new_k), att_v=tuple(new_v),
            cnn_cache=tuple(new_cnn))
        return cur, new_state


class EfficientConformerModel(nn.Module):
    """Hybrid CTC/attention efficient-conformer (reference
    efficient_conformer/model.py)."""
    input_size: int
    vocab_size: int
    streaming: bool = True
    encoder_conf: Optional[dict] = None
    decoder_conf: Optional[dict] = None
    ctc_weight: float = 0.3
    lsm_weight: float = 0.1
    reverse_weight: float = 0.3
    length_normalized_loss: bool = False
    cmvn_mean: Optional[tuple] = None
    cmvn_istd: Optional[tuple] = None
    dtype: jnp.dtype = jnp.float32

    @property
    def sos(self):
        return self.vocab_size - 1

    @property
    def eos(self):
        return self.vocab_size - 1

    @staticmethod
    def _flatten_conf(conf):
        """The reference config nests efficient options under
        ``efficient_conf`` (configs/efficient_conformer.yml:16-21)."""
        conf = dict(conf or {})
        eff = conf.pop('efficient_conf', None) or {}
        conf.update(eff)
        return conf

    def setup(self):
        conf = self._flatten_conf(self.encoder_conf)
        if self.streaming:
            conf['use_dynamic_chunk'] = True
            conf['causal'] = True
        self.encoder = EfficientConformerEncoder(
            input_size=self.input_size, cmvn_mean=self.cmvn_mean,
            cmvn_istd=self.cmvn_istd, dtype=self.dtype, **conf)
        output_size = conf.get('output_size', 256)
        self.decoder = BiTransformerDecoder(
            vocab_size=self.vocab_size, encoder_output_size=output_size,
            dtype=self.dtype, **(self.decoder_conf or {}))
        self.ctc = CTCHead(self.vocab_size, dtype=self.dtype)

    def __call__(self, speech, speech_lens, text, text_lens,
                 deterministic=False):
        encoder_out, encoder_mask = self.encoder(
            speech, speech_lens, deterministic=deterministic)
        encoder_lens = encoder_mask[:, 0, :].sum(axis=-1).astype(jnp.int32)
        encoder_lens = jnp.minimum(encoder_lens, encoder_out.shape[1])
        loss_ctc = self.ctc(encoder_out, encoder_lens, text, text_lens,
                            deterministic=deterministic)
        loss_att, acc_att = None, None
        if self.ctc_weight < 1.0:
            ys_in, ys_out = add_sos_eos(text, text_lens, self.sos, self.eos)
            r_text = reverse_pad_list(text, text_lens, pad_value=IGNORE_ID)
            r_ys_in, r_ys_out = add_sos_eos(r_text, text_lens, self.sos,
                                            self.eos)
            dec_out, r_dec_out = self.decoder(
                encoder_out, encoder_mask, ys_in,
                text_lens.astype(jnp.int32) + 1, r_ys_in_pad=r_ys_in,
                reverse_weight=self.reverse_weight,
                deterministic=deterministic)
            loss_l2r = label_smoothing_loss(
                dec_out.astype(jnp.float32), ys_out, self.lsm_weight,
                self.length_normalized_loss)
            if r_dec_out is not None and self.reverse_weight > 0.0:
                loss_r2l = label_smoothing_loss(
                    r_dec_out.astype(jnp.float32), r_ys_out,
                    self.lsm_weight, self.length_normalized_loss)
                loss_att = (loss_l2r * (1 - self.reverse_weight)
                            + loss_r2l * self.reverse_weight)
            else:
                loss_att = loss_l2r
            acc_att = th_accuracy(dec_out.astype(jnp.float32), ys_out)
        loss = loss_ctc if loss_att is None else \
            self.ctc_weight * loss_ctc + (1 - self.ctc_weight) * loss_att
        return {'loss': loss, 'loss_att': loss_att, 'loss_ctc': loss_ctc,
                'th_accuracy': acc_att}

    def get_encoder_out(self, speech, speech_lens):
        encoder_out, encoder_mask = self.encoder(
            speech, speech_lens,
            decoding_chunk_size=-1 if self.streaming else 0)
        probs = self.ctc.softmax(encoder_out)
        out_lens = encoder_mask[:, 0, :].sum(axis=-1).astype(jnp.int32)
        return probs, out_lens

    def get_encoder_logits(self, speech, speech_lens):
        """CTC logits (compute dtype) for the softmax-free decode path."""
        encoder_out, encoder_mask = self.encoder(
            speech, speech_lens,
            decoding_chunk_size=-1 if self.streaming else 0)
        logits = self.ctc.logits(encoder_out)
        out_lens = encoder_mask[:, 0, :].sum(axis=-1).astype(jnp.int32)
        return logits, out_lens

    def get_ctc_log_probs(self, speech, speech_lens):
        encoder_out, encoder_mask = self.encoder(
            speech, speech_lens,
            decoding_chunk_size=-1 if self.streaming else 0)
        log_probs = self.ctc.log_softmax(encoder_out)
        out_lens = encoder_mask[:, 0, :].sum(axis=-1).astype(jnp.int32)
        return log_probs, out_lens

    def encode_for_rescore(self, speech, speech_lens):
        """(encoder_out, CTC probs, out_lens) in one forward — see
        ppasr_tpu/models/conformer.py:encode_for_rescore."""
        encoder_out, encoder_mask = self.encoder(
            speech, speech_lens,
            decoding_chunk_size=-1 if self.streaming else 0)
        probs = self.ctc.softmax(encoder_out)
        out_lens = encoder_mask[:, 0, :].sum(axis=-1).astype(jnp.int32)
        return encoder_out, probs, out_lens

    def attention_rescore_scores(self, encoder_out, encoder_lens,
                                 hyps, hyps_lens):
        from ppasr_tpu.models.rescore import attention_rescore_scores
        return attention_rescore_scores(self.decoder, encoder_out,
                                        encoder_lens, hyps, hyps_lens,
                                        self.sos, self.eos,
                                        self.reverse_weight)

    def get_encoder_out_chunk(self, xs, state: EffConState):
        encoder_out, new_state = self.encoder.forward_chunk(xs, state)
        probs = self.ctc.softmax(encoder_out)
        return probs, new_state

    def get_encoder_out_chunk_rescore(self, xs, state: EffConState):
        """(encoder_out, probs, new_state) — see conformer.py."""
        encoder_out, new_state = self.encoder.forward_chunk(xs, state)
        probs = self.ctc.softmax(encoder_out)
        return encoder_out, probs, new_state

    def init_state(self, batch_size: int, cache_size: int) -> EffConState:
        conf = self._flatten_conf(self.encoder_conf)
        num_blocks = int(conf.get('num_blocks', 12))
        dim = int(conf.get('output_size', 256))
        heads = int(conf.get('attention_heads', 4))
        kernel = int(conf.get('cnn_module_kernel', 15))
        causal = self.streaming or bool(conf.get('causal', False))
        stride_idx = _as_list(conf.get('stride_layer_idx', 3))
        strides = _as_list(conf.get('stride', 2))
        stride_kernel = bool(conf.get('stride_kernel', True))
        kernels = [kernel]
        for st in strides:
            kernels.append(kernels[-1] // st if stride_kernel
                           else kernels[-1])

        def factor(i):
            f = 1
            for st, s_idx in zip(strides, stride_idx):
                if i > s_idx:
                    f *= st
            return f

        dk = dim // heads
        att_k, att_v, cnn = [], [], []
        seg = 0
        for i in range(num_blocks):
            c_i = max(cache_size // factor(i), 1)
            att_k.append(jnp.zeros((batch_size, c_i, heads, dk), self.dtype))
            att_v.append(jnp.zeros((batch_size, c_i, heads, dk), self.dtype))
            lorder = kernels[seg] - 1 if causal else 0
            cnn.append(jnp.zeros((batch_size, lorder, dim), self.dtype))
            if i in stride_idx:
                seg += 1
        return EffConState(offset=jnp.zeros((batch_size,), jnp.int32),
                           cache_len=jnp.zeros((batch_size,), jnp.int32),
                           att_k=tuple(att_k), att_v=tuple(att_v),
                           cnn_cache=tuple(cnn))

    @property
    def subsampling_rate(self):
        conf = self._flatten_conf(self.encoder_conf)
        if conf.get('input_layer', 'conv2d') == 'conv2d2':
            return 2
        return SUBSAMPLING_CLASSES[
            conf.get('input_layer', 'conv2d')].subsampling_rate

    @property
    def right_context(self):
        conf = self._flatten_conf(self.encoder_conf)
        if conf.get('input_layer', 'conv2d') == 'conv2d2':
            return 2
        return SUBSAMPLING_CLASSES[
            conf.get('input_layer', 'conv2d')].right_context

    @property
    def output_factor(self):
        """Extra time reduction applied by stride layers (for the
        predictor's chunk output-length math)."""
        conf = self._flatten_conf(self.encoder_conf)
        f = 1
        if _as_list(conf.get('stride_layer_idx', 3)):
            for s in _as_list(conf.get('stride', 2)):
                f *= s
        return f
