"""Squeezeformer: U-Net-style time reduce/recover encoder + CTC/attention.

Behavior parity with reference ppasr/model_utils/squeezeformer/:
- DepthwiseConv2DSubsampling4 (subsampling.py:13-69): pointwise→depthwise
  stride-2 conv pair, input projection after positional scaling.
- SqueezeformerEncoder (encoder.py:22-383): pre-LN, blocks of
  MHSA→FFN→conv→FFN each POST-LN, time reduction at ``reduce_idx`` (×2) with
  residual push, recovery at ``recover_idx`` via repeat_interleave + linear +
  residual add (encoder.py:211-231); per-layer downsampling factor
  (``calculate_downsampling_factor``, :246-258).
- Time reduction layers (time_reduction.py): 'conv1d' (dw+pw stride 2,
  kernel 5), 'stream' (kernel 1 — cache-free, used by streaming models,
  model.py:35-41).
- Adaptive-scale attention/FFN/conv (attention.py:24-53 etc.).

TPU-native streaming (replacing encoder.py:342-383's per-chunk cache
stride/repeat_interleave): per-layer STATIC caches sized C/factor(i) — each
layer group keeps its own ring at its own time scale, so no cache rescaling
happens at runtime and every chunk step is one fixed-shape compiled program.
"""
from typing import Any, List, NamedTuple, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ppasr_tpu.models.attention import MultiHeadedAttention
from ppasr_tpu.models.base import Dropout, GlobalCMVN, get_activation, kaiming_uniform
from ppasr_tpu.models.convolution import ConvolutionModule
from ppasr_tpu.models.ctc import CTCHead
from ppasr_tpu.models.embedding import sinusoid_table
from ppasr_tpu.models.positionwise import PositionwiseFeedForward
from ppasr_tpu.models.subsampling import subsampled_len4
from ppasr_tpu.models.transformer_decoder import BiTransformerDecoder
from ppasr_tpu.ops.common import (IGNORE_ID, add_sos_eos, reverse_pad_list,
                                  th_accuracy)
from ppasr_tpu.ops.label_smoothing import label_smoothing_loss
from ppasr_tpu.ops.masks import add_optional_chunk_mask, make_non_pad_mask


class SqueezeformerState(NamedTuple):
    """Streaming state: per-layer caches at each layer's own time scale."""
    offset: jnp.ndarray            # [B] int32, base-scale frames consumed
    cache_len: jnp.ndarray         # [B] int32, base-scale valid cache frames
    att_k: Tuple[jnp.ndarray, ...]  # layer i: [B, C // factor(i), H, dk]
    att_v: Tuple[jnp.ndarray, ...]
    cnn_cache: Tuple[jnp.ndarray, ...]  # layer i: [B, lorder, D]


class DepthwiseConv2DSubsampling4(nn.Module):
    odim: int
    dw_stride: bool = False
    input_dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    subsampling_rate = 4
    right_context = 6

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = x[..., None]  # NHWC
        x = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding='VALID',
                    kernel_init=kaiming_uniform, dtype=self.dtype,
                    name='pw_conv')(x)
        x = nn.relu(x)
        x = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding='VALID',
                    feature_group_count=self.odim if self.dw_stride else 1,
                    kernel_init=kaiming_uniform, dtype=self.dtype,
                    name='dw_conv')(x)
        x = nn.relu(x)
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        return x  # input_proj applied by the encoder after pos scaling


class TimeReductionLayer1D(nn.Module):
    """dw(k=5,s=2,pad=3) + pw conv (reference time_reduction.py:14-85)."""
    channel: int
    kernel_size: int = 5
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_pad=None):
        if mask_pad is not None:
            x = jnp.where(mask_pad.transpose(0, 2, 1), x, 0.0)
        pad = max(0, self.kernel_size - self.stride)
        y = nn.Conv(self.channel, (self.kernel_size,),
                    strides=(self.stride,), padding=[(pad, pad)],
                    feature_group_count=self.channel,
                    kernel_init=kaiming_uniform, dtype=self.dtype,
                    name='dw_conv')(x)
        y = nn.Dense(self.channel, kernel_init=kaiming_uniform,
                     dtype=self.dtype, name='pw_conv')(y)
        return y


class TimeReductionLayerStream(nn.Module):
    """kernel-1 stride-2 — cache-free streaming variant (reference
    time_reduction.py:138-210)."""
    channel: int
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_pad=None):
        if mask_pad is not None:
            x = jnp.where(mask_pad.transpose(0, 2, 1), x, 0.0)
        y = nn.Conv(self.channel, (1,), strides=(self.stride,),
                    padding='VALID', feature_group_count=self.channel,
                    kernel_init=kaiming_uniform, dtype=self.dtype,
                    name='dw_conv')(x)
        y = nn.Dense(self.channel, kernel_init=kaiming_uniform,
                     dtype=self.dtype, name='pw_conv')(y)
        return y


class SqueezeformerEncoderLayer(nn.Module):
    """MHSA → FFN → conv → FFN, post-LN (reference encoder.py:386-506)."""
    size: int
    attention_heads: int
    feed_forward_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.1
    normalize_before: bool = False
    cnn_module_kernel: int = 31
    cnn_norm_type: str = 'layer_norm'
    causal: bool = False
    adaptive_scale: bool = True
    activation: Any = nn.swish
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, pos_emb, mask_pad=None, kv_cache=None,
                 cnn_cache=None, deterministic=True):
        dropout = Dropout(self.dropout_rate)

        def maybe_pre(x, norm):
            return norm(x) if self.normalize_before else x

        def maybe_post(x, norm):
            return norm(x) if not self.normalize_before else x

        norm1 = nn.LayerNorm(dtype=self.dtype, name='layer_norm1')
        residual = x
        xn = maybe_pre(x, norm1)
        y, new_kv = MultiHeadedAttention(
            self.attention_heads, self.size, self.attention_dropout_rate,
            rel_pos=True, adaptive_scale=self.adaptive_scale, pos_bias=True,
            init_weights=True, dtype=self.dtype, name='self_attn')(
            xn, xn, xn, mask=mask, pos_emb=pos_emb, kv_cache=kv_cache,
            deterministic=deterministic)
        x = residual + dropout(y, deterministic=deterministic)
        x = maybe_post(x, norm1)

        norm2 = nn.LayerNorm(dtype=self.dtype, name='layer_norm2')
        residual = x
        y = PositionwiseFeedForward(self.size, self.feed_forward_units,
                                    self.dropout_rate, self.activation,
                                    adaptive_scale=self.adaptive_scale,
                                    init_weights=True,
                                    dtype=self.dtype, name='ffn1')(
            maybe_pre(x, norm2), deterministic)
        x = residual + dropout(y, deterministic=deterministic)
        x = maybe_post(x, norm2)

        norm3 = nn.LayerNorm(dtype=self.dtype, name='layer_norm3')
        residual = x
        y, new_cnn = ConvolutionModule(
            self.size, self.cnn_module_kernel, self.activation,
            self.cnn_norm_type, self.causal,
            adaptive_scale=self.adaptive_scale, init_weights=True,
            dtype=self.dtype, name='conv_module')(
            maybe_pre(x, norm3), mask_pad, cnn_cache, deterministic)
        x = residual + dropout(y, deterministic=deterministic)
        x = maybe_post(x, norm3)

        norm4 = nn.LayerNorm(dtype=self.dtype, name='layer_norm4')
        residual = x
        y = PositionwiseFeedForward(self.size, self.feed_forward_units,
                                    self.dropout_rate, self.activation,
                                    adaptive_scale=self.adaptive_scale,
                                    init_weights=True,
                                    dtype=self.dtype, name='ffn2')(
            maybe_pre(x, norm4), deterministic)
        x = residual + dropout(y, deterministic=deterministic)
        x = maybe_post(x, norm4)
        return x, new_kv, new_cnn


def _as_list(v) -> Optional[List[int]]:
    if v is None:
        return None
    return [v] if isinstance(v, int) else list(v)


class SqueezeformerEncoder(nn.Module):
    input_size: int
    encoder_dim: int = 256
    output_size: int = 256
    attention_heads: int = 4
    num_blocks: int = 12
    reduce_idx: Union[int, List[int], None] = 5
    recover_idx: Union[int, List[int], None] = 11
    feed_forward_expansion_factor: int = 8
    dw_stride: bool = False
    input_dropout_rate: float = 0.1
    pos_enc_layer_type: str = 'rel_pos'
    time_reduction_layer_type: str = 'conv1d'
    feed_forward_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.1
    cnn_module_kernel: int = 31
    cnn_norm_type: str = 'layer_norm'
    dropout: float = 0.1
    causal: bool = False
    adaptive_scale: bool = True
    activation_type: str = 'swish'
    normalize_before: bool = False
    use_dynamic_chunk: bool = False
    static_chunk_size: int = 0
    use_dynamic_left_chunk: bool = False
    max_len: int = 5000
    cmvn_mean: Optional[tuple] = None
    cmvn_istd: Optional[tuple] = None
    dtype: jnp.dtype = jnp.float32

    @property
    def subsampling_rate(self):
        return 4

    @property
    def right_context(self):
        return 6

    def out_len(self, t):
        return subsampled_len4(t)

    def _reduce_idx(self):
        return _as_list(self.reduce_idx)

    def _recover_idx(self):
        return _as_list(self.recover_idx)

    def factor(self, i: int) -> int:
        """Per-layer time downsampling factor (reference encoder.py:246-258)."""
        reduce_idx, recover_idx = self._reduce_idx(), self._recover_idx()
        if reduce_idx is None:
            return 1
        reduce_exp = sum(1 for r in reduce_idx if i >= r)
        recover_exp = sum(1 for r in (recover_idx or []) if i >= r)
        return int(2 ** (reduce_exp - recover_exp))

    def setup(self):
        if self.cmvn_mean is not None:
            self.global_cmvn = GlobalCMVN(self.cmvn_mean, self.cmvn_istd)
        self.embed = DepthwiseConv2DSubsampling4(
            self.encoder_dim, self.dw_stride, self.input_dropout_rate,
            dtype=self.dtype)
        # scale-aware init ±(odim·idim/4)^-0.5 (reference subsampling.py
        # init_weights) — with the module-level inits this stabilizes the
        # post-LN stack
        from ppasr_tpu.models.base import symmetric_uniform
        proj_init = symmetric_uniform(
            (self.encoder_dim * self.input_size / 4) ** -0.5)
        self.input_proj = nn.Dense(self.encoder_dim,
                                   kernel_init=proj_init,
                                   bias_init=proj_init,
                                   dtype=self.dtype)
        self.input_dropout = Dropout(self.input_dropout_rate)
        self.preln = nn.LayerNorm(dtype=self.dtype)
        act = get_activation(self.activation_type)
        self.layers = [SqueezeformerEncoderLayer(
            size=self.encoder_dim,
            attention_heads=self.attention_heads,
            feed_forward_units=self.encoder_dim
            * self.feed_forward_expansion_factor,
            dropout_rate=self.dropout,
            attention_dropout_rate=self.attention_dropout_rate,
            normalize_before=self.normalize_before,
            cnn_module_kernel=self.cnn_module_kernel,
            cnn_norm_type=self.cnn_norm_type,
            causal=self.causal,
            adaptive_scale=self.adaptive_scale,
            activation=act,
            dtype=self.dtype) for _ in range(self.num_blocks)]
        if self.time_reduction_layer_type == 'stream':
            self.time_reduction_layer = TimeReductionLayerStream(
                self.encoder_dim, dtype=self.dtype)
        else:
            self.time_reduction_layer = TimeReductionLayer1D(
                self.encoder_dim, dtype=self.dtype)
        self.time_recover_layer = nn.Dense(self.encoder_dim,
                                           kernel_init=kaiming_uniform,
                                           dtype=self.dtype)
        if self.output_size != self.encoder_dim:
            self.final_proj = nn.Dense(self.output_size,
                                       kernel_init=kaiming_uniform,
                                       dtype=self.dtype)

    def _pos_table(self, left_pad: int = 0):
        pe = sinusoid_table(self.encoder_dim, self.max_len)
        if left_pad:
            pe = np.concatenate(
                [np.zeros((left_pad, self.encoder_dim), np.float32), pe])
        return jnp.asarray(pe, self.dtype)

    def _embed_and_project(self, xs, offset, deterministic, left_pad=0,
                           pos_len=None):
        if self.cmvn_mean is not None:
            xs = self.global_cmvn(xs)
        xs = self.embed(xs, deterministic)
        t_sub = xs.shape[1]
        xs = xs * jnp.asarray(np.sqrt(self.encoder_dim), self.dtype)
        pe = self._pos_table(left_pad)
        size = pos_len if pos_len is not None else t_sub
        pos_emb = jax.lax.dynamic_slice(
            pe, (jnp.asarray(offset, jnp.int32),
                 jnp.zeros((), jnp.int32)),
            (size, self.encoder_dim))[None]
        xs = self.input_proj(xs)
        xs = self.input_dropout(xs, deterministic=deterministic)
        return xs, pos_emb

    def __call__(self, xs, xs_lens, decoding_chunk_size: int = 0,
                 num_decoding_left_chunks: int = -1, deterministic=True):
        """Full-utterance forward (reference encoder.py:172-240)."""
        xs, pos_emb = self._embed_and_project(xs, 0, deterministic)
        t_sub = xs.shape[1]
        out_lens = self.out_len(xs_lens.astype(jnp.int32))
        masks = make_non_pad_mask(out_lens, t_sub)[:, None, :]
        mask_pad = masks

        rng = (self.make_rng('chunk')
               if (self.use_dynamic_chunk and decoding_chunk_size == 0
                   and not deterministic) else None)
        dcs = decoding_chunk_size
        if rng is None and self.use_dynamic_chunk and dcs == 0:
            dcs = -1
        chunk_masks = add_optional_chunk_mask(
            t_sub, masks, self.use_dynamic_chunk, self.use_dynamic_left_chunk,
            dcs, self.static_chunk_size, num_decoding_left_chunks, rng=rng)

        xs = self.preln(xs)
        reduce_idx = self._reduce_idx() or []
        recover_idx = (self._recover_idx() or []) \
            if self._reduce_idx() is not None else []
        recover_stack = []
        for i, layer in enumerate(self.layers):
            if i in reduce_idx:
                recover_stack.append((xs, chunk_masks, pos_emb, mask_pad))
                xs = self.time_reduction_layer(xs, mask_pad)
                chunk_masks = chunk_masks[:, ::2, ::2]
                mask_pad = mask_pad[:, :, ::2]
                pos_emb = pos_emb[:, ::2, :]
                # clip xs to strided mask length (stride of odd T)
                xs = xs[:, :mask_pad.shape[-1], :]
            if i in recover_idx and recover_stack:
                (r_x, r_masks, r_pos, r_pad) = recover_stack.pop()
                xs = jnp.repeat(xs, 2, axis=1)
                xs = self.time_recover_layer(xs)
                t_rec = r_x.shape[1]
                xs = r_x + xs[:, :t_rec, :]
                chunk_masks, pos_emb, mask_pad = r_masks, r_pos, r_pad
            xs, _, _ = layer(xs, chunk_masks, pos_emb, mask_pad=mask_pad,
                             deterministic=deterministic)
        if self.output_size != self.encoder_dim:
            xs = self.final_proj(xs)
        return xs, masks

    # ------------------------------------------------------------ streaming

    def init_state(self, batch_size: int, cache_size: int
                   ) -> SqueezeformerState:
        h = self.attention_heads
        dk = self.encoder_dim // h
        lorder = self.cnn_module_kernel - 1 if self.causal else 0
        att_k, att_v, cnn = [], [], []
        for i in range(self.num_blocks):
            f = self.factor(i)
            c_i = max(cache_size // f, 1)
            att_k.append(jnp.zeros((batch_size, c_i, h, dk), self.dtype))
            att_v.append(jnp.zeros((batch_size, c_i, h, dk), self.dtype))
            cnn.append(jnp.zeros((batch_size, lorder, self.encoder_dim),
                                 self.dtype))
        return SqueezeformerState(
            offset=jnp.zeros((batch_size,), jnp.int32),
            cache_len=jnp.zeros((batch_size,), jnp.int32),
            att_k=tuple(att_k), att_v=tuple(att_v), cnn_cache=tuple(cnn))

    def forward_chunk(self, xs, state: SqueezeformerState):
        """One streaming chunk with per-scale static ring caches (re-design
        of reference encoder.py:260-383)."""
        c = state.att_k[0].shape[1]  # base-scale cache size
        xs, _ = self._embed_and_project(xs, 0, True)
        t_out = xs.shape[1]
        s = c + t_out

        # base-scale per-stream positions, left-padded table so each slice
        # start is that stream's offset
        pe = self._pos_table(left_pad=c)
        offsets = jnp.broadcast_to(
            jnp.asarray(state.offset, jnp.int32).reshape(-1),
            (xs.shape[0],))
        pos_base = jax.vmap(lambda off: jax.lax.dynamic_slice(
            pe, (off, jnp.zeros((), jnp.int32)),
            (s, self.encoder_dim)))(offsets)      # [B, S, D]

        xs = self.preln(xs)
        reduce_idx = self._reduce_idx() or []
        recover_idx = (self._recover_idx() or []) \
            if self._reduce_idx() is not None else []
        recover_stack = []
        new_k = [None] * self.num_blocks
        new_v = [None] * self.num_blocks
        new_cnn = [None] * self.num_blocks

        cur = xs
        for i, layer in enumerate(self.layers):
            f = self.factor(i)
            if i in reduce_idx:
                recover_stack.append(cur)
                cur = self.time_reduction_layer(cur, None)
            if i in recover_idx and recover_stack:
                r_x = recover_stack.pop()
                cur = jnp.repeat(cur, 2, axis=1)
                cur = self.time_recover_layer(cur)
                t_rec = r_x.shape[1]
                cur = r_x + cur[:, :t_rec, :]

            c_i = state.att_k[i].shape[1]
            t_i = cur.shape[1]
            s_i = c_i + t_i
            # per-scale positions: stride-f subsample of the base window,
            # aligned to its tail
            pos_i = pos_base[:, ::f, :][:, -(s_i):, :] if f > 1 \
                else pos_base[:, -(s_i):, :]
            cache_len_i = jnp.minimum(
                jnp.broadcast_to(
                    jnp.asarray(state.cache_len, jnp.int32).reshape(-1),
                    (cur.shape[0],)) // f, c_i)
            j = jnp.arange(s_i, dtype=jnp.int32)[None, None, :]
            att_mask = j >= (c_i - cache_len_i)[:, None, None]

            cur, (k_all, v_all), cnn_c = layer(
                cur, att_mask, pos_i, mask_pad=None,
                kv_cache=(state.att_k[i], state.att_v[i]),
                cnn_cache=state.cnn_cache[i] if state.cnn_cache[i].shape[1]
                else None,
                deterministic=True)
            new_k[i] = k_all[:, -c_i:]
            new_v[i] = v_all[:, -c_i:]
            new_cnn[i] = cnn_c if cnn_c is not None and cnn_c.shape[1] \
                else state.cnn_cache[i]

        if self.output_size != self.encoder_dim:
            cur = self.final_proj(cur)

        new_state = SqueezeformerState(
            offset=state.offset + t_out,
            cache_len=jnp.minimum(state.cache_len + t_out, c),
            att_k=tuple(new_k), att_v=tuple(new_v),
            cnn_cache=tuple(new_cnn))
        return cur, new_state


class SqueezeformerModel(nn.Module):
    """Hybrid CTC/attention squeezeformer (reference squeezeformer/model.py):
    streaming=True swaps the time-reduction layer to the cache-free 'stream'
    variant and enables dynamic-chunk + causal conv (model.py:35-41)."""
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

    def setup(self):
        conf = dict(self.encoder_conf or {})
        if self.streaming:
            conf['use_dynamic_chunk'] = True
            conf['causal'] = True
            conf['time_reduction_layer_type'] = 'stream'
        self.encoder = SqueezeformerEncoder(input_size=self.input_size,
                                            cmvn_mean=self.cmvn_mean,
                                            cmvn_istd=self.cmvn_istd,
                                            dtype=self.dtype, **conf)
        output_size = (self.encoder_conf or {}).get('output_size', 256)
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
        out_lens = jnp.minimum(out_lens, encoder_out.shape[1])
        return encoder_out, probs, out_lens

    def attention_rescore_scores(self, encoder_out, encoder_lens,
                                 hyps, hyps_lens):
        from ppasr_tpu.models.rescore import attention_rescore_scores
        return attention_rescore_scores(self.decoder, encoder_out,
                                        encoder_lens, hyps, hyps_lens,
                                        self.sos, self.eos,
                                        self.reverse_weight)

    def get_encoder_out_chunk(self, xs, state: SqueezeformerState):
        encoder_out, new_state = self.encoder.forward_chunk(xs, state)
        probs = self.ctc.softmax(encoder_out)
        return probs, new_state

    def get_encoder_out_chunk_rescore(self, xs, state: SqueezeformerState):
        """(encoder_out, probs, new_state) — see conformer.py."""
        encoder_out, new_state = self.encoder.forward_chunk(xs, state)
        probs = self.ctc.softmax(encoder_out)
        return encoder_out, probs, new_state

    def init_state(self, batch_size: int, cache_size: int
                   ) -> SqueezeformerState:
        # shapes computed from config directly (no module construction —
        # flax forbids creating submodules inside bound methods)
        conf = dict(self.encoder_conf or {})
        num_blocks = int(conf.get('num_blocks', 12))
        dim = int(conf.get('encoder_dim', 256))
        heads = int(conf.get('attention_heads', 4))
        kernel = int(conf.get('cnn_module_kernel', 31))
        causal = self.streaming or bool(conf.get('causal', False))
        lorder = kernel - 1 if causal else 0
        reduce_idx = _as_list(conf.get('reduce_idx', 5))
        recover_idx = _as_list(conf.get('recover_idx', 11))

        def factor(i):
            if reduce_idx is None:
                return 1
            re = sum(1 for r in reduce_idx if i >= r)
            rc = sum(1 for r in (recover_idx or []) if i >= r)
            return int(2 ** (re - rc))

        dk = dim // heads
        att_k, att_v, cnn = [], [], []
        for i in range(num_blocks):
            c_i = max(cache_size // factor(i), 1)
            att_k.append(jnp.zeros((batch_size, c_i, heads, dk), self.dtype))
            att_v.append(jnp.zeros((batch_size, c_i, heads, dk), self.dtype))
            cnn.append(jnp.zeros((batch_size, lorder, dim), self.dtype))
        return SqueezeformerState(
            offset=jnp.zeros((batch_size,), jnp.int32),
            cache_len=jnp.zeros((batch_size,), jnp.int32),
            att_k=tuple(att_k), att_v=tuple(att_v), cnn_cache=tuple(cnn))

    @property
    def subsampling_rate(self):
        return 4

    @property
    def right_context(self):
        return 6
