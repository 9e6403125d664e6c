"""Positional encodings with streaming offset access.

Behavior parity with reference ppasr/model_utils/conformer/embedding.py:
- PositionalEncoding (:26-85): x*sqrt(d) + pe[offset:offset+T]; streaming
  accessor ``position_encoding(offset, size)``.
- RelPositionalEncoding (:88-115): x*sqrt(d); pe returned separately.
- NoPositionalEncoding (:10-23).

TPU-first: the sinusoid table is a pure function of (d_model, max_len) — jit
folds it into the compiled program as a constant; ``offset`` may be a traced
scalar (dynamic_slice) so one compiled chunk-step serves the whole stream.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np


def sinusoid_table(d_model: int, max_len: int = 5000) -> np.ndarray:
    """[max_len, d_model] interleaved sin/cos table (reference :46-53)."""
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                      * -(math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


def position_encoding(d_model: int, offset, size: int,
                      max_len: int = 5000, dtype=jnp.float32) -> jnp.ndarray:
    """pe[offset : offset+size] with a possibly-traced offset (clamped), as a
    [1, size, d_model] tensor — the streaming accessor (reference :71-85)."""
    pe = jnp.asarray(sinusoid_table(d_model, max_len), dtype)
    offset = jnp.clip(jnp.asarray(offset, jnp.int32), 0, max_len - size)
    return jax.lax.dynamic_slice(pe, (offset, 0), (size, d_model))[None]


def apply_abs_pos(x: jnp.ndarray, offset=0, max_len: int = 5000):
    """x*sqrt(d) + pe; returns (x, pos_emb) (reference :55-69)."""
    d_model = x.shape[-1]
    pos = position_encoding(d_model, offset, x.shape[1], max_len, x.dtype)
    x = x * math.sqrt(d_model) + pos
    return x, pos


def apply_rel_pos(x: jnp.ndarray, offset=0, max_len: int = 5000):
    """x*sqrt(d); pos_emb returned separately (reference :102-115)."""
    d_model = x.shape[-1]
    pos = position_encoding(d_model, offset, x.shape[1], max_len, x.dtype)
    return x * math.sqrt(d_model), pos


def apply_no_pos(x: jnp.ndarray, offset=0, max_len: int = 5000):
    return x, None
