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
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Dense(self.hidden_units, kernel_init=kaiming_uniform,
                     dtype=self.dtype, name='w_1')(x)
        x = self.activation(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        return nn.Dense(self.idim, kernel_init=kaiming_uniform,
                        dtype=self.dtype, name='w_2')(x)
