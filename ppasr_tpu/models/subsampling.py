"""Input embedding / conv subsampling layers.

Behavior parity with reference ppasr/model_utils/conformer/subsampling.py:
LinearNoSubsampling (:25-65), Conv2dSubsampling4 (:68-115, two stride-2 3×3
VALID convs, right_context 6, mask slice [:-2:2][:-2:2]),
Conv2dSubsampling6 (:118-168), Conv2dSubsampling8 (:171-220).

TPU-first: convs run in NHWC ([B, T, F, C]) — the native TPU conv layout —
with VALID padding to match paddle's padding=0.
"""
import flax.linen as nn
import jax.numpy as jnp

from ppasr_tpu.models.base import Dropout, kaiming_uniform


def subsampled_len4(t):
    return (((t - 1) // 2) - 1) // 2


def subsampled_len6(t):
    return (((t - 1) // 2) - 2) // 3


def subsampled_len8(t):
    return ((((t - 1) // 2 - 1) // 2) - 1) // 2


class LinearNoSubsampling(nn.Module):
    odim: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    subsampling_rate = 1
    right_context = 0

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Dense(self.odim, kernel_init=kaiming_uniform,
                     dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype)(x)
        x = Dropout(self.dropout_rate, deterministic=deterministic)(x)
        return nn.relu(x)

    @staticmethod
    def out_len(t):
        return t


class Conv2dSubsampling4(nn.Module):
    """Two stride-2 3×3 VALID convs + linear; ×4 time reduction."""
    odim: int
    dtype: jnp.dtype = jnp.float32

    subsampling_rate = 4
    right_context = 6

    @nn.compact
    def __call__(self, x, deterministic=True):
        # [B, T, F] → NHWC [B, T, F, 1]
        x = x[..., None]
        x = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding='VALID',
                    kernel_init=kaiming_uniform, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding='VALID',
                    kernel_init=kaiming_uniform, dtype=self.dtype)(x)
        x = nn.relu(x)
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        return nn.Dense(self.odim, kernel_init=kaiming_uniform,
                        dtype=self.dtype)(x)

    @staticmethod
    def out_len(t):
        return subsampled_len4(t)


class Conv2dSubsampling6(nn.Module):
    """3×3/2 then 5×5/3 VALID convs; ×6 time reduction."""
    odim: int
    dtype: jnp.dtype = jnp.float32

    subsampling_rate = 6
    right_context = 10

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = x[..., None]
        x = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding='VALID',
                    kernel_init=kaiming_uniform, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.odim, (5, 5), strides=(3, 3), padding='VALID',
                    kernel_init=kaiming_uniform, dtype=self.dtype)(x)
        x = nn.relu(x)
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        return nn.Dense(self.odim, kernel_init=kaiming_uniform,
                        dtype=self.dtype)(x)

    @staticmethod
    def out_len(t):
        return subsampled_len6(t)


class Conv2dSubsampling8(nn.Module):
    """Three stride-2 3×3 VALID convs; ×8 time reduction."""
    odim: int
    dtype: jnp.dtype = jnp.float32

    subsampling_rate = 8
    right_context = 14

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = x[..., None]
        for _ in range(3):
            x = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding='VALID',
                        kernel_init=kaiming_uniform, dtype=self.dtype)(x)
            x = nn.relu(x)
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        return nn.Dense(self.odim, kernel_init=kaiming_uniform,
                        dtype=self.dtype)(x)

    @staticmethod
    def out_len(t):
        return subsampled_len8(t)


SUBSAMPLING_CLASSES = {
    'linear': LinearNoSubsampling,
    'conv2d': Conv2dSubsampling4,
    'conv2d6': Conv2dSubsampling6,
    'conv2d8': Conv2dSubsampling8,
}
