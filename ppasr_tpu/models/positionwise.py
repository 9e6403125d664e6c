"""Position-wise feed-forward (reference
ppasr/model_utils/conformer/positionwise.py:7-39)."""
import flax.linen as nn
import jax.numpy as jnp

from ppasr_tpu.models.base import (Dropout, kaiming_uniform, scaled_kaiming,
                                   symmetric_uniform)
from ppasr_tpu.parallel.mesh import shard_activation


class PositionwiseFeedForward(nn.Module):
    idim: int
    hidden_units: int
    dropout_rate: float = 0.1
    activation: callable = nn.swish
    # Squeezeformer adaptive scale on the module input (reference
    # squeezeformer/positionwise.py:29-55)
    adaptive_scale: bool = False
    # Squeezeformer scale-aware init: w_1 ±idim^-0.5, w_2 ±hidden^-0.5
    # (reference positionwise.py init_weights) — needed for post-LN
    init_weights: bool = False
    # depth-scaled residual init (base.scaled_kaiming) on the output proj
    out_init_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        if self.adaptive_scale:
            scale = self.param('ada_scale', nn.initializers.ones,
                               (1, 1, self.idim)).astype(x.dtype)
            bias = self.param('ada_bias', nn.initializers.zeros,
                              (1, 1, self.idim)).astype(x.dtype)
            x = scale * x + bias
        if self.init_weights:
            w1_init = symmetric_uniform(self.idim ** -0.5)
            w2_init = symmetric_uniform(self.hidden_units ** -0.5)
            w1 = dict(kernel_init=w1_init, bias_init=w1_init)
            w2 = dict(kernel_init=w2_init, bias_init=w2_init)
        else:
            w1 = dict(kernel_init=kaiming_uniform)
            w2 = dict(kernel_init=scaled_kaiming(self.out_init_scale))
        x = nn.Dense(self.hidden_units, dtype=self.dtype, name='w_1',
                     **w1)(x)
        # FFN hidden sharded over 'model' under TP (column→row pairing)
        x = shard_activation(self.activation(x), 'data', None, 'model')
        x = Dropout(self.dropout_rate, deterministic=deterministic)(x)
        return nn.Dense(self.idim, dtype=self.dtype, name='w_2', **w2)(x)
