"""Position-wise feed-forward (reference
ppasr/model_utils/conformer/positionwise.py:7-39)."""
import flax.linen as nn
import jax.numpy as jnp

from ppasr_tpu.models.base import kaiming_uniform


class PositionwiseFeedForward(nn.Module):
    idim: int
    hidden_units: int
    dropout_rate: float = 0.1
    activation: callable = nn.swish
    # Squeezeformer adaptive scale on the module input (reference
    # squeezeformer/positionwise.py:29-55)
    adaptive_scale: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        if self.adaptive_scale:
            scale = self.param('ada_scale', nn.initializers.ones,
                               (1, 1, self.idim)).astype(x.dtype)
            bias = self.param('ada_bias', nn.initializers.zeros,
                              (1, 1, self.idim)).astype(x.dtype)
            x = scale * x + bias
        x = nn.Dense(self.hidden_units, kernel_init=kaiming_uniform,
                     dtype=self.dtype, name='w_1')(x)
        x = self.activation(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        return nn.Dense(self.idim, kernel_init=kaiming_uniform,
                        dtype=self.dtype, name='w_2')(x)
