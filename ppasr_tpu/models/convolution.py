"""Conformer convolution module (pointwise → GLU → depthwise → norm → swish
→ pointwise) with causal left-padding and streaming cache.

Behavior parity with reference ppasr/model_utils/conformer/convolution.py:
13-143: causal mode left-pads the raw module input by kernel−1 (zeros on the
first chunk, the cache thereafter :108-117), new cache = last kernel−1 raw
input frames; pad positions are zeroed with the batch mask before and after.

TPU-first: data stays [B, T, C]; pointwise convs are Dense (XLA fuses them);
the depthwise conv is nn.Conv with feature_group_count=channels.
"""
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ppasr_tpu.models.base import kaiming_uniform


class ConvolutionModule(nn.Module):
    channels: int
    kernel_size: int = 15
    activation: callable = nn.swish
    norm: str = 'layer_norm'  # 'layer_norm' | 'batch_norm'
    causal: bool = False
    # Squeezeformer adaptive scale on the module input (reference
    # squeezeformer/convolution.py:26-105)
    adaptive_scale: bool = False
    # Squeezeformer scale-aware init: pointwise ±channels^-0.5, depthwise
    # ±kernel^-0.5 (reference convolution.py init_weights)
    init_weights: bool = False
    # depth-scaled residual init (base.scaled_kaiming) on pointwise_conv2
    out_init_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @property
    def lorder(self):
        return self.kernel_size - 1 if self.causal else 0

    @nn.compact
    def __call__(self, x, mask_pad=None, cache=None, deterministic=True):
        """Args:
          x: [B, T, C].
          mask_pad: [B, 1, T] bool, True = valid (reference passes ~pad).
          cache: [B, lorder, C] raw-input left context (causal only).
        Returns: (y [B, T, C], new_cache [B, lorder, C])."""
        if self.adaptive_scale:
            scale = self.param('ada_scale', nn.initializers.ones,
                               (1, 1, self.channels)).astype(x.dtype)
            bias = self.param('ada_bias', nn.initializers.zeros,
                              (1, 1, self.channels)).astype(x.dtype)
            x = scale * x + bias
        if mask_pad is not None:
            x = jnp.where(mask_pad.transpose(0, 2, 1), x, 0.0)

        if self.causal:
            if cache is None:
                pad = jnp.zeros((x.shape[0], self.lorder, x.shape[2]), x.dtype)
            else:
                pad = cache
            x_padded = jnp.concatenate([pad, x], axis=1)
            new_cache = x_padded[:, -self.lorder:, :]
            dw_padding = 'VALID'
        else:
            x_padded = x
            new_cache = jnp.zeros((x.shape[0], 0, x.shape[2]), x.dtype)
            dw_padding = 'SAME'

        if self.init_weights:
            from ppasr_tpu.models.base import symmetric_uniform
            pw_init = symmetric_uniform(self.channels ** -0.5)
            dw_init = symmetric_uniform(self.kernel_size ** -0.5)
            pw = dict(kernel_init=pw_init, bias_init=pw_init)
            dw = dict(kernel_init=dw_init, bias_init=dw_init)
            pw2 = pw
        else:
            from ppasr_tpu.models.base import scaled_kaiming
            pw = dw = dict(kernel_init=kaiming_uniform)
            # depth-scaled residual init on the branch output projection
            pw2 = dict(kernel_init=scaled_kaiming(self.out_init_scale))

        # pointwise 1 + GLU (runs over the padded frames, matching the
        # reference which pads the raw input before pointwise_conv1)
        y = nn.Dense(2 * self.channels, dtype=self.dtype,
                     name='pointwise_conv1', **pw)(x_padded)
        a, b = jnp.split(y, 2, axis=-1)
        y = a * nn.sigmoid(b)

        y = nn.Conv(self.channels, (self.kernel_size,), padding=dw_padding,
                    feature_group_count=self.channels, dtype=self.dtype,
                    name='depthwise_conv', **dw)(y)

        if self.norm == 'layer_norm':
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm')(y)
        else:
            y = nn.BatchNorm(use_running_average=deterministic,
                             momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             name='norm')(y)
        y = self.activation(y)
        y = nn.Dense(self.channels, dtype=self.dtype,
                     name='pointwise_conv2', **pw2)(y)

        if mask_pad is not None:
            y = jnp.where(mask_pad.transpose(0, 2, 1), y, 0.0)
        return y, new_cache
