"""Transformer decoder (train-time attention branch of the hybrid loss).

Behavior parity with reference ppasr/model_utils/transformer/decoder.py:
- TransformerDecoder (:126-270): token embedding + abs positional encoding,
  N blocks of (causal self-attn, cross-attn to encoder memory, FFN), final
  LN + output projection.
- BiTransformerDecoder (:15-123): an L2R decoder plus an R2L decoder over
  reversed labels; ``reverse_weight`` mixes their losses
  (conformer model.py:140-143).
"""
import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ppasr_tpu.models.attention import MultiHeadedAttention
from ppasr_tpu.models.base import Dropout, kaiming_uniform
from ppasr_tpu.models.embedding import sinusoid_table
from ppasr_tpu.models.positionwise import PositionwiseFeedForward
from ppasr_tpu.ops.masks import make_non_pad_mask, subsequent_mask


class DecoderLayer(nn.Module):
    """Self-attn + cross-attn + FFN block (reference decoder.py:273-394)."""
    size: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, tgt_mask, memory, memory_mask, deterministic=True):
        dropout = Dropout(self.dropout_rate)

        residual = tgt
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name='norm1')(tgt) \
            if self.normalize_before else tgt
        y, _ = MultiHeadedAttention(self.attention_heads, self.size,
                                    self.self_attention_dropout_rate,
                                    dtype=self.dtype, name='self_attn')(
            x, x, x, mask=tgt_mask, deterministic=deterministic)
        x = residual + dropout(y, deterministic=deterministic)
        if not self.normalize_before:
            x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name='norm1')(x)

        residual = x
        y = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name='norm2')(x) \
            if self.normalize_before else x
        y, _ = MultiHeadedAttention(self.attention_heads, self.size,
                                    self.src_attention_dropout_rate,
                                    dtype=self.dtype, name='src_attn')(
            y, memory, memory, mask=memory_mask, deterministic=deterministic)
        x = residual + dropout(y, deterministic=deterministic)
        if not self.normalize_before:
            x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name='norm2')(x)

        residual = x
        y = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name='norm3')(x) \
            if self.normalize_before else x
        y = PositionwiseFeedForward(self.size, self.linear_units,
                                    self.dropout_rate, nn.relu,
                                    dtype=self.dtype, name='feed_forward')(
            y, deterministic)
        x = residual + dropout(y, deterministic=deterministic)
        if not self.normalize_before:
            x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name='norm3')(x)
        return x


class TransformerDecoder(nn.Module):
    vocab_size: int
    encoder_output_size: int
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    use_output_layer: bool = True
    max_len: int = 5000
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, memory, memory_mask, ys_in_pad, ys_in_lens,
                 deterministic=True):
        """Args:
          memory: [B, T, D] encoder output; memory_mask: [B, 1, T] bool.
          ys_in_pad: [B, U+1] decoder input ids (sos + labels).
          ys_in_lens: [B] input lengths.
        Returns: [B, U+1, V] logits."""
        d = self.encoder_output_size
        u = ys_in_pad.shape[1]
        x = nn.Embed(self.vocab_size, d,
                     embedding_init=nn.initializers.normal(1.0),
                     dtype=self.dtype, name='embed')(ys_in_pad)
        pe = jnp.asarray(sinusoid_table(d, self.max_len)[:u], self.dtype)
        x = x * jnp.asarray(math.sqrt(d), self.dtype) + pe[None]
        x = Dropout(self.positional_dropout_rate)(
            x, deterministic=deterministic)

        # causal mask ∧ pad mask
        tgt_mask = make_non_pad_mask(ys_in_lens, u)[:, None, :] \
            & subsequent_mask(u)[None]

        for i in range(self.num_blocks):
            x = DecoderLayer(d, self.attention_heads, self.linear_units,
                             self.dropout_rate,
                             self.self_attention_dropout_rate,
                             self.src_attention_dropout_rate,
                             self.normalize_before, dtype=self.dtype,
                             name=f'layer_{i}')(
                x, tgt_mask, memory, memory_mask, deterministic)
        if self.normalize_before:
            x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                             name='after_norm')(x)
        if self.use_output_layer:
            x = nn.Dense(self.vocab_size, kernel_init=kaiming_uniform,
                         dtype=self.dtype, name='output_layer')(x)
        return x


class BiTransformerDecoder(nn.Module):
    """L2R + R2L decoder pair (reference decoder.py:15-123)."""
    vocab_size: int
    encoder_output_size: int
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 3
    r_num_blocks: int = 3
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, memory, memory_mask, ys_in_pad, ys_in_lens,
                 r_ys_in_pad=None, reverse_weight: float = 0.0,
                 deterministic=True):
        common = dict(vocab_size=self.vocab_size,
                      encoder_output_size=self.encoder_output_size,
                      attention_heads=self.attention_heads,
                      linear_units=self.linear_units,
                      dropout_rate=self.dropout_rate,
                      positional_dropout_rate=self.positional_dropout_rate,
                      self_attention_dropout_rate=self.self_attention_dropout_rate,
                      src_attention_dropout_rate=self.src_attention_dropout_rate,
                      normalize_before=self.normalize_before,
                      dtype=self.dtype)
        l_x = TransformerDecoder(num_blocks=self.num_blocks,
                                 name='left_decoder', **common)(
            memory, memory_mask, ys_in_pad, ys_in_lens, deterministic)
        # The R2L decoder is created whenever reversed labels are supplied so
        # the parameter tree is stable regardless of reverse_weight (which
        # only mixes the losses).
        r_x = None
        if self.r_num_blocks > 0 and r_ys_in_pad is not None:
            r_x = TransformerDecoder(num_blocks=self.r_num_blocks,
                                     name='right_decoder', **common)(
                memory, memory_mask, r_ys_in_pad, ys_in_lens, deterministic)
        return l_x, r_x
