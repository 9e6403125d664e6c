"""Attention / padding masks, built TPU-first.

Capability parity with reference ppasr/model_utils/utils/mask.py (make_pad_mask
:22, make_non_pad_mask :46, subsequent_mask :71, subsequent_chunk_mask :93,
add_optional_chunk_mask :125), re-designed for XLA:

- every mask is produced by broadcasted integer arithmetic (no Python loops,
  no data-dependent branching), so all functions trace under jit;
- ``chunk_size`` / ``num_left_chunks`` may be traced scalars — the reference
  samples the dynamic-chunk size with host randomness per batch, here the
  sampling happens inside jit from a jax PRNG key so the whole train step
  stays one compiled program.
"""
from typing import Union

import jax
import jax.numpy as jnp

Scalar = Union[int, jnp.ndarray]


def make_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B, T] bool, True on PADDED positions (reference mask.py:22-43).

    ``max_len`` must be static under jit (the padded buffer length).
    """
    seq = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    return seq >= lengths.astype(jnp.int32)[:, None]


def make_non_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B, T] bool, True on VALID positions (reference mask.py:46-68)."""
    return ~make_pad_mask(lengths, max_len)


def subsequent_mask(size: int) -> jnp.ndarray:
    """[size, size] lower-triangular causal mask (reference mask.py:71-90)."""
    i = jnp.arange(size, dtype=jnp.int32)
    return i[:, None] >= i[None, :]


def subsequent_chunk_mask(size: int,
                          chunk_size: Scalar,
                          num_left_chunks: Scalar = -1) -> jnp.ndarray:
    """[size, size] block-causal chunk mask (reference mask.py:93-122).

    Position i may attend to [start, (i//chunk + 1) * chunk) where
    start = 0 when num_left_chunks < 0
    else max(0, (i//chunk - num_left_chunks) * chunk).

    ``chunk_size`` / ``num_left_chunks`` may be traced int scalars, enabling
    in-jit dynamic-chunk training.
    """
    chunk_size = jnp.asarray(chunk_size, jnp.int32)
    num_left_chunks = jnp.asarray(num_left_chunks, jnp.int32)
    i = jnp.arange(size, dtype=jnp.int32)[:, None]
    j = jnp.arange(size, dtype=jnp.int32)[None, :]
    chunk_idx = i // chunk_size
    ending = (chunk_idx + 1) * chunk_size
    start = jnp.where(num_left_chunks < 0,
                      jnp.zeros_like(chunk_idx),
                      jnp.maximum(0, (chunk_idx - num_left_chunks) * chunk_size))
    return (j >= start) & (j < ending)


def add_optional_chunk_mask(max_len: int,
                            masks: jnp.ndarray,
                            use_dynamic_chunk: bool,
                            use_dynamic_left_chunk: bool,
                            decoding_chunk_size: int,
                            static_chunk_size: int,
                            num_decoding_left_chunks: int,
                            rng: jax.Array = None) -> jnp.ndarray:
    """Combine the pad mask with an (optional) chunk mask.

    Reference semantics (mask.py:125-186):
      decoding_chunk_size  < 0 → full context
      decoding_chunk_size  > 0 → that fixed chunk with num_decoding_left_chunks
      decoding_chunk_size == 0 → TRAIN: random chunk in [1, 25] or full context
                                 (chosen per batch), optional random left chunks.

    Args:
      max_len: static padded sequence length (post-subsampling).
      masks: [B, 1, T] bool pad mask (True = valid).
      rng: PRNG key, required when use_dynamic_chunk and decoding_chunk_size==0.
    Returns: [B, T, T] bool attention mask.

    The flags (use_dynamic_chunk etc.) are Python-static; only the sampled
    chunk size is traced, so one compiled program covers every random draw.
    """
    if use_dynamic_chunk:
        if decoding_chunk_size < 0:
            chunk_size = jnp.int32(max_len)
            num_left_chunks = jnp.int32(-1)
        elif decoding_chunk_size > 0:
            chunk_size = jnp.int32(decoding_chunk_size)
            num_left_chunks = jnp.int32(num_decoding_left_chunks)
        else:
            if rng is None:
                raise ValueError("rng key required for dynamic-chunk training")
            k1, k2 = jax.random.split(rng)
            draw = jax.random.randint(k1, (), 1, max(max_len, 2), dtype=jnp.int32)
            full_ctx = draw > max_len // 2
            small = draw % 25 + 1
            chunk_size = jnp.where(full_ctx, jnp.int32(max_len), small)
            if use_dynamic_left_chunk:
                max_left_chunks = jnp.maximum((max_len - 1) // chunk_size, 1)
                left_draw = jax.random.randint(k2, (), 0, 2 ** 30, dtype=jnp.int32)
                num_left_chunks = jnp.where(full_ctx, jnp.int32(-1),
                                            left_draw % max_left_chunks)
            else:
                num_left_chunks = jnp.int32(-1)
        chunk_masks = subsequent_chunk_mask(max_len, chunk_size, num_left_chunks)
        return masks & chunk_masks[None, :, :]
    elif static_chunk_size > 0:
        chunk_masks = subsequent_chunk_mask(max_len, static_chunk_size,
                                            num_decoding_left_chunks)
        return masks & chunk_masks[None, :, :]
    else:
        return masks
