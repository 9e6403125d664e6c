"""Conformer encoder: offline/training forward + streaming chunk forward.

Behavior parity with reference ppasr/model_utils/conformer/encoder.py:
- ConformerEncoder.forward (:164-206): CMVN → conv subsampling →
  add_optional_chunk_mask (dynamic-chunk training) → N ConformerEncoderLayer →
  final LN.
- ConformerEncoderLayer (:286-431): macaron FFN ×0.5 → rel-pos MHSA → conv
  module → FFN → final LN.
- forward_chunk (:208-283): single-chunk step carrying per-layer attention KV
  cache and causal-conv cache with offset-based positional encoding.

TPU-native re-design of the streaming caches (SURVEY.md §7.3): the reference
grows ``att_cache`` dynamically and trims it per chunk; under jit that would
recompile every step. Here the cache is a STATIC ring:

  state = StreamingState(
    offset    : int32 scalar — encoder-output frames consumed so far,
    cache_len : int32 scalar — valid frames in the attention cache (≤ C),
    att_k/att_v : [L, B, C, H, dk] right-aligned valid window,
    cnn_cache   : [L, B, kernel−1, D])

with C = decoding_chunk_size × num_left_chunks (``required_cache_size``);
``required_cache_size < 0`` (unbounded history) is emulated with a generous
static cap. Invalid cache slots are masked out of attention; the positional
table is left-padded by C so a traced ``offset`` indexes it with one
dynamic_slice. One compiled program thus serves every chunk of every stream,
and the whole state lives in device memory between predict_stream() calls.
"""
from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ppasr_tpu.models.attention import MultiHeadedAttention
from ppasr_tpu.models.base import Dropout, GlobalCMVN, get_activation
from ppasr_tpu.models.convolution import ConvolutionModule
from ppasr_tpu.models.embedding import sinusoid_table
from ppasr_tpu.models.positionwise import PositionwiseFeedForward
from ppasr_tpu.models.subsampling import SUBSAMPLING_CLASSES
from ppasr_tpu.ops.masks import add_optional_chunk_mask, make_non_pad_mask


class StreamingState(NamedTuple):
    """Device-resident per-stream encoder state. ``offset``/``cache_len``
    are PER-STREAM vectors so a batched engine can serve streams that
    started at different times (each element positions its own cache)."""
    offset: jnp.ndarray     # [B] int32
    cache_len: jnp.ndarray  # [B] int32
    att_k: jnp.ndarray      # [L, B, C, H, dk]
    att_v: jnp.ndarray      # [L, B, C, H, dk]
    cnn_cache: jnp.ndarray  # [L, B, lorder, D]


class ConformerEncoderLayer(nn.Module):
    """Macaron-FFN / MHSA / conv / FFN block (reference encoder.py:286-431)."""
    size: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    macaron_style: bool = True
    use_cnn_module: bool = True
    cnn_module_kernel: int = 15
    cnn_module_norm: str = 'layer_norm'
    causal: bool = False
    activation: Any = nn.swish
    rel_pos: bool = True
    # depth-scaled residual init: every residual branch's output projection
    # initialized at scale (2*num_blocks)^-1/2 (base.scaled_kaiming) so a
    # fresh deep encoder optimizes like a shallow one (CTC blank-escape at
    # 12 blocks goes from >900 to ~300 updates in tools/probe_overfit runs)
    out_init_scale: float = 1.0
    final_norm: bool = True    # block-final LayerNorm (conformer paper);
    #                            disable to diagnose main-path norm effects
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
                                        out_init_scale=self.out_init_scale,
                                        dtype=self.dtype,
                                        name='feed_forward_macaron')(
                y, deterministic)
            x = residual + ff_scale * dropout(y, deterministic=deterministic)
            if not self.normalize_before:
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name='norm_ff_macaron')(x)

        # self-attention
        residual = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm_mha')(x) \
            if self.normalize_before else x
        y_att, new_kv = MultiHeadedAttention(
            self.attention_heads, self.size, self.attention_dropout_rate,
            rel_pos=self.rel_pos, out_init_scale=self.out_init_scale,
            dtype=self.dtype, name='self_attn')(
            y, y, y, mask=mask, pos_emb=pos_emb, kv_cache=kv_cache,
            deterministic=deterministic)
        x = residual + dropout(y_att, deterministic=deterministic)
        if not self.normalize_before:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name='norm_mha')(x)

        # convolution module
        new_cnn_cache = None
        if self.use_cnn_module:
            residual = x
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name='norm_conv')(x) \
                if self.normalize_before else x
            y, new_cnn_cache = ConvolutionModule(
                self.size, self.cnn_module_kernel, self.activation,
                self.cnn_module_norm, self.causal,
                out_init_scale=self.out_init_scale, dtype=self.dtype,
                name='conv_module')(y, mask_pad, cnn_cache, deterministic)
            x = residual + dropout(y, deterministic=deterministic)
            if not self.normalize_before:
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name='norm_conv')(x)

        # feed-forward
        residual = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm_ff')(x) \
            if self.normalize_before else x
        y = PositionwiseFeedForward(self.size, self.linear_units,
                                    self.dropout_rate, self.activation,
                                    out_init_scale=self.out_init_scale,
                                    dtype=self.dtype, name='feed_forward')(
            y, deterministic)
        x = residual + ff_scale * dropout(y, deterministic=deterministic)
        if not self.normalize_before:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm_ff')(x)

        if self.use_cnn_module and self.final_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name='norm_final')(x)
        return x, new_kv, new_cnn_cache


class ConformerEncoder(nn.Module):
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
    max_len: int = 5000
    cmvn_mean: Optional[tuple] = None
    cmvn_istd: Optional[tuple] = None
    # depth-scaled residual init (on by default): residual-branch output
    # projections start at (2·num_blocks)^-1/2 of the reference Kaiming
    # scale. Pure training-dynamics fix — without it a fresh 12-block
    # encoder needs ~5-10x more updates than a 4-block one before CTC
    # leaves the all-blank optimum (see base.scaled_kaiming). Checkpoints
    # are unaffected (init only matters for fresh params).
    depth_scaled_init: bool = True
    block_final_norm: bool = True
    dtype: jnp.dtype = jnp.float32
    remat: bool = False   # checkpoint each block: recompute in bwd, trading
    #                       ~1/3 more FLOPs for O(layers) less activation HBM

    @property
    def subsampling_rate(self):
        return SUBSAMPLING_CLASSES[self.input_layer].subsampling_rate

    @property
    def right_context(self):
        return SUBSAMPLING_CLASSES[self.input_layer].right_context

    def out_len(self, t):
        return SUBSAMPLING_CLASSES[self.input_layer].out_len(t)

    def setup(self):
        cls = SUBSAMPLING_CLASSES[self.input_layer]
        if self.cmvn_mean is not None:
            self.global_cmvn = GlobalCMVN(self.cmvn_mean, self.cmvn_istd)
        self.embed = cls(self.output_size, dtype=self.dtype)
        self.pos_dropout = Dropout(self.positional_dropout_rate)
        layer_cls = ConformerEncoderLayer
        if self.remat:
            # deterministic (arg 7, counting self=0) is a static python bool
            layer_cls = nn.remat(ConformerEncoderLayer, static_argnums=(7,))
        self.layers = [layer_cls(
            size=self.output_size,
            attention_heads=self.attention_heads,
            linear_units=self.linear_units,
            dropout_rate=self.dropout_rate,
            attention_dropout_rate=self.attention_dropout_rate,
            normalize_before=self.normalize_before,
            macaron_style=self.macaron_style,
            use_cnn_module=self.use_cnn_module,
            cnn_module_kernel=self.cnn_module_kernel,
            cnn_module_norm=self.cnn_module_norm,
            causal=self.causal,
            activation=get_activation(self.activation_type),
            rel_pos=(self.pos_enc_layer_type == 'rel_pos'),
            out_init_scale=(2.0 * self.num_blocks) ** -0.5
            if self.depth_scaled_init else 1.0,
            final_norm=self.block_final_norm,
            dtype=self.dtype) for _ in range(self.num_blocks)]
        if self.normalize_before:
            self.after_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)

    def _pos_table(self, left_pad: int = 0):
        """Sinusoid table, optionally left-padded by C zeros so that a traced
        ``offset`` can slice it without going negative."""
        pe = sinusoid_table(self.output_size, self.max_len)
        if left_pad:
            pe = np.concatenate(
                [np.zeros((left_pad, self.output_size), np.float32), pe])
        return jnp.asarray(pe, self.dtype)

    def _embed(self, xs, deterministic):
        if self.cmvn_mean is not None:
            xs = self.global_cmvn(xs)
        return self.embed(xs, deterministic)

    def _apply_pos(self, xs, pos_emb):
        if self.pos_enc_layer_type == 'no_pos':
            return xs, None
        if self.pos_enc_layer_type == 'abs_pos':
            # ×sqrt(d) balances the additive positional embedding
            # (reference embedding.py PositionalEncoding xscale)
            xs = xs * jnp.asarray(np.sqrt(self.output_size), self.dtype)
            xs = xs + pos_emb[:, -xs.shape[1]:]
        # rel_pos: NO xscale. The reference keeps the legacy ×sqrt(d) even
        # though the rel-pos table never adds into the stream, which blows
        # the residual stream to std≈57 at entry; each block's norm_final
        # then renormalizes to 1, creating a backward cliff at block 0
        # (measured 10-20× param-grad starvation at init, and a 12-block
        # encoder that needs >3000 updates to leave the CTC blank optimum
        # while 4 blocks need 300). Dropping the pointless scale equalizes
        # gradient flow across depth; every sublayer input is LayerNormed,
        # so nothing else observes the absolute stream scale.
        return xs, pos_emb

    def __call__(self, xs, xs_lens, decoding_chunk_size: int = 0,
                 num_decoding_left_chunks: int = -1, deterministic=True):
        """Full-utterance forward (training / offline decode).

        Args:
          xs: [B, T, D] padded features; xs_lens: [B] frame counts.
          decoding_chunk_size / num_decoding_left_chunks: reference semantics
            (0 = random dynamic chunk for training, <0 full context,
            >0 fixed chunk).
        Returns: (out [B, T', D'], out_masks [B, 1, T'])."""
        xs = self._embed(xs, deterministic)
        t_sub = xs.shape[1]
        out_lens = self.out_len(xs_lens.astype(jnp.int32))
        masks = make_non_pad_mask(out_lens, t_sub)[:, None, :]  # [B,1,T']

        pos_emb = self._pos_table()[None, :t_sub]
        xs, pos_emb = self._apply_pos(xs, pos_emb)
        xs = self.pos_dropout(xs, deterministic=deterministic)

        rng = (self.make_rng('chunk')
               if (self.use_dynamic_chunk and decoding_chunk_size == 0
                   and not deterministic) else None)
        dcs = decoding_chunk_size
        if rng is None and self.use_dynamic_chunk and dcs == 0:
            # deterministic eval on a dynamic-chunk model: full context
            dcs = -1
        chunk_masks = add_optional_chunk_mask(
            t_sub, masks, self.use_dynamic_chunk, self.use_dynamic_left_chunk,
            dcs, self.static_chunk_size, num_decoding_left_chunks, rng=rng)

        for layer in self.layers:
            # positional args so remat's static_argnums line up
            xs, _, _ = layer(xs, chunk_masks, pos_emb, masks, None, None,
                             deterministic)
        if self.normalize_before:
            xs = self.after_norm(xs)
        return xs, masks

    def init_state(self, batch_size: int, cache_size: int) -> StreamingState:
        """Zero streaming state with static attention cache size C."""
        h, dk = self.attention_heads, self.output_size // self.attention_heads
        lorder = self.cnn_module_kernel - 1 if self.causal else 0
        z = jnp.zeros
        return StreamingState(
            offset=jnp.zeros((batch_size,), jnp.int32),
            cache_len=jnp.zeros((batch_size,), jnp.int32),
            att_k=z((self.num_blocks, batch_size, cache_size, h, dk),
                    self.dtype),
            att_v=z((self.num_blocks, batch_size, cache_size, h, dk),
                    self.dtype),
            cnn_cache=z((self.num_blocks, batch_size, lorder,
                         self.output_size), self.dtype))

    def forward_chunk(self, xs, state: StreamingState):
        """One streaming chunk (reference encoder.py:208-283, static-cache
        re-design — see module docstring).

        Args:
          xs: [B, T_in, D] feature chunk where
            T_in = (chunk−1)·subsampling_rate + right_context + 1.
          state: StreamingState with static cache size C.
        Returns: (out [B, T_out, D'], new_state)."""
        c = state.att_k.shape[2]
        xs = self._embed(xs, True)
        t_out = xs.shape[1]
        s = c + t_out

        # positions for key slot j are offset_b − C + j; the table is
        # left-padded by C so each stream's slice start is its own offset.
        pe = self._pos_table(left_pad=c)
        offsets = jnp.broadcast_to(
            jnp.asarray(state.offset, jnp.int32).reshape(-1),
            (xs.shape[0],))
        pos_emb = jax.vmap(lambda off: jax.lax.dynamic_slice(
            pe, (off, jnp.zeros((), jnp.int32)),
            (s, self.output_size)))(offsets)      # [B, S, D]
        xs, pos_emb = self._apply_pos(xs, pos_emb)

        # key slot j valid iff j ≥ C − cache_len_b (cache right-aligned) or
        # in the current chunk
        j = jnp.arange(s, dtype=jnp.int32)[None, None, :]
        cache_len = jnp.broadcast_to(
            jnp.asarray(state.cache_len, jnp.int32).reshape(-1),
            (xs.shape[0],))
        att_mask = j >= (c - cache_len)[:, None, None]  # [B, 1, S]

        new_k, new_v, new_cnn = [], [], []
        for i, layer in enumerate(self.layers):
            kv_cache = (state.att_k[i], state.att_v[i])
            cnn_cache = (state.cnn_cache[i]
                         if state.cnn_cache.shape[2] else None)
            xs, (k_all, v_all), cnn_c = layer(
                xs, att_mask, pos_emb, mask_pad=None, kv_cache=kv_cache,
                cnn_cache=cnn_cache, deterministic=True)
            new_k.append(k_all[:, -c:] if c else k_all[:, :0])
            new_v.append(v_all[:, -c:] if c else v_all[:, :0])
            new_cnn.append(cnn_c if cnn_c is not None
                           else jnp.zeros((xs.shape[0], 0, self.output_size),
                                          self.dtype))
        if self.normalize_before:
            xs = self.after_norm(xs)

        new_state = StreamingState(
            offset=state.offset + t_out,
            cache_len=jnp.minimum(state.cache_len + t_out, c),
            att_k=jnp.stack(new_k), att_v=jnp.stack(new_v),
            cnn_cache=jnp.stack(new_cnn))
        return xs, new_state
