"""Multi-head attention (absolute + Transformer-XL relative position).

Behavior parity with reference ppasr/model_utils/conformer/attention.py:
- MultiHeadedAttention (:13-176): scaled dot-product, KV-cache concat
  (:164-171), post-softmax re-masking (:112-118).
- RelPositionMultiHeadedAttention (:179-262): pos_bias_u/v (XavierUniform),
  scores = (q+u)·kᵀ + (q+v)·pᵀ, rel-shift removed (:256-258).

TPU-first: einsum formulation (no transposes materialized); caches are
STATIC-SHAPE tensors handled by the caller (the encoder keeps a fixed-size
ring cache and passes the full key window + validity mask), so the whole
streaming step compiles once.
"""
import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ppasr_tpu.models.base import Dropout, kaiming_uniform
from ppasr_tpu.parallel.mesh import shard_activation


def _neg_inf(dtype):
    return jnp.asarray(jnp.finfo(dtype).min / 2, dtype)


class MultiHeadedAttention(nn.Module):
    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    rel_pos: bool = False
    # Squeezeformer adaptive scale (reference squeezeformer/attention.py:
    # 33-37,120-123): learned per-feature scale/bias on q/k/v inputs; the
    # squeezeformer variant's linear_pos also carries a bias.
    adaptive_scale: bool = False
    pos_bias: bool = False
    # Squeezeformer scale-aware init: all projections ±n_feat^-0.5
    # (reference squeezeformer/attention.py init_weights) — post-LN needs it
    init_weights: bool = False
    # depth-scaled residual init (base.scaled_kaiming) on linear_out
    out_init_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.n_feat % self.n_head == 0
        self.d_k = self.n_feat // self.n_head
        if self.init_weights:
            from ppasr_tpu.models.base import symmetric_uniform
            init = symmetric_uniform(self.n_feat ** -0.5)
            d = dict(kernel_init=init, bias_init=init, dtype=self.dtype)
        else:
            d = dict(kernel_init=kaiming_uniform, dtype=self.dtype)
        self.linear_q = nn.Dense(self.n_feat, **d)
        self.linear_k = nn.Dense(self.n_feat, **d)
        self.linear_v = nn.Dense(self.n_feat, **d)
        if self.init_weights or self.out_init_scale == 1.0:
            self.linear_out = nn.Dense(self.n_feat, **d)
        else:
            from ppasr_tpu.models.base import scaled_kaiming
            self.linear_out = nn.Dense(
                self.n_feat,
                kernel_init=scaled_kaiming(self.out_init_scale),
                dtype=self.dtype)
        self.dropout = Dropout(self.dropout_rate)
        if self.rel_pos:
            self.linear_pos = nn.Dense(self.n_feat, use_bias=self.pos_bias,
                                       **d)
            self.pos_bias_u = self.param(
                'pos_bias_u', nn.initializers.xavier_uniform(),
                (self.n_head, self.d_k))
            self.pos_bias_v = self.param(
                'pos_bias_v', nn.initializers.xavier_uniform(),
                (self.n_head, self.d_k))
        if self.adaptive_scale:
            self.ada_scale = self.param('ada_scale', nn.initializers.ones,
                                        (1, 1, self.n_feat))
            self.ada_bias = self.param('ada_bias', nn.initializers.zeros,
                                       (1, 1, self.n_feat))

    def _heads(self, x, proj):
        b, t, _ = x.shape
        return proj(x).reshape(b, t, self.n_head, self.d_k)

    def __call__(self, query, key, value, mask=None, pos_emb=None,
                 kv_cache=None, deterministic=True):
        """Args:
          query/key/value: [B, T1/T2, D].
          mask: [B, 1 or T1, T2_total] bool, True = attend. T2_total includes
            the cache when kv_cache is given.
          pos_emb: [1, T2_total, D] relative position embedding (rel_pos).
          kv_cache: optional (k_cache, v_cache) each [B, C, H, dk]; new keys
            are appended after the cache along time.
        Returns: (output [B, T1, D], (k_all, v_all) each [B, C+T2, H, dk]).
        """
        if self.adaptive_scale:
            scale = self.ada_scale.astype(query.dtype)
            bias = self.ada_bias.astype(query.dtype)
            query = scale * query + bias
            key = scale * key + bias
            value = scale * value + bias
        # per-head tensors sharded over 'model' (heads) under TP — pins the
        # Megatron layout so scores/attn stay shard-local until linear_out
        q = shard_activation(self._heads(query, self.linear_q),
                             'data', None, 'model')  # [B, T1, H, dk]
        k = shard_activation(self._heads(key, self.linear_k),
                             'data', None, 'model')  # [B, T2, H, dk]
        v = shard_activation(self._heads(value, self.linear_v),
                             'data', None, 'model')

        if kv_cache is not None:
            k_cache, v_cache = kv_cache
            k = jnp.concatenate([k_cache, k], axis=1)
            v = jnp.concatenate([v_cache, v], axis=1)
        new_cache = (k, v)

        if self.rel_pos:
            assert pos_emb is not None
            p = self.linear_pos(pos_emb).reshape(
                pos_emb.shape[0], -1, self.n_head, self.d_k)  # [1|B, S, H, dk]
            q_u = q + self.pos_bias_u.astype(q.dtype)[None, None]
            q_v = q + self.pos_bias_v.astype(q.dtype)[None, None]
            matrix_ac = jnp.einsum('bthd,bshd->bhts', q_u, k)
            # pos_emb is [1, S, D] offline (shared) or [B, S, D] streaming
            # (per-stream offsets)
            pos_spec = 'ushd' if p.shape[0] == 1 else 'bshd'
            matrix_bd = jnp.einsum(f'bthd,{pos_spec}->bhts', q_v, p)
            scores = (matrix_ac + matrix_bd) / math.sqrt(self.d_k)
        else:
            scores = jnp.einsum('bthd,bshd->bhts', q, k) / math.sqrt(self.d_k)

        if mask is not None:
            m = mask[:, None, :, :scores.shape[-1]]  # [B, 1, T1|1, S]
            scores = jnp.where(m, scores, _neg_inf(scores.dtype))
            attn = nn.softmax(scores, axis=-1)
            # re-zero masked entries: fully-masked rows produce NaN otherwise
            # (reference attention.py:118)
            attn = jnp.where(m, attn, 0.0)
        else:
            attn = nn.softmax(scores, axis=-1)

        attn = self.dropout(attn, deterministic=deterministic)
        x = jnp.einsum('bhts,bshd->bthd', attn, v)
        b, t1 = x.shape[0], x.shape[1]
        return self.linear_out(x.reshape(b, t1, self.n_feat)), new_cache
