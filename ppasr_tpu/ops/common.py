"""Shared sequence ops for the hybrid CTC/attention models.

Capability parity with reference ppasr/model_utils/utils/common.py
(IGNORE_ID :5, add_sos_eos :102, th_accuracy :147, reverse_pad_list :166),
re-designed as pure jnp functions over static padded shapes.
"""
import jax.numpy as jnp

IGNORE_ID = -1


def add_sos_eos(ys_pad: jnp.ndarray, ys_lens: jnp.ndarray,
                sos: int, eos: int, ignore_id: int = IGNORE_ID):
    """Prepend sos / append eos to padded label batch (reference common.py:102-144).

    Args:
      ys_pad: [B, U] padded with ignore_id.
      ys_lens: [B] true label lengths.
    Returns:
      ys_in  [B, U+1]: sos + labels, padded with eos (decoder input)
      ys_out [B, U+1]: labels + eos, padded with ignore_id (decoder target)
    """
    bsz, max_u = ys_pad.shape
    pos = jnp.arange(max_u + 1, dtype=jnp.int32)[None, :]
    lens = ys_lens.astype(jnp.int32)[:, None]
    ys = jnp.where(ys_pad < 0, 0, ys_pad)

    # ys_in: position 0 = sos, 1..U = labels, rest = eos.
    shifted = jnp.pad(ys, ((0, 0), (1, 0)))[:, :max_u + 1]
    ys_in = jnp.where(pos == 0, sos, shifted)
    ys_in = jnp.where(pos > lens, eos, ys_in)

    # ys_out: 0..U-1 = labels, position U = eos, rest = ignore_id.
    ys_ext = jnp.pad(ys, ((0, 0), (0, 1)))
    ys_out = jnp.where(pos == lens, eos, ys_ext)
    ys_out = jnp.where(pos > lens, ignore_id, ys_out)
    return ys_in, ys_out


def reverse_pad_list(ys_pad: jnp.ndarray, ys_lens: jnp.ndarray,
                     pad_value: float = -1.0) -> jnp.ndarray:
    """Reverse each padded sequence in time (reference common.py:166-186).

    E.g. [1,2,3,0,0] with len 3 → [3,2,1,0,0] (pad_value fills the tail).
    """
    bsz, max_u = ys_pad.shape
    pos = jnp.arange(max_u, dtype=jnp.int32)[None, :]
    lens = ys_lens.astype(jnp.int32)[:, None]
    rev_idx = jnp.clip(lens - 1 - pos, 0, max_u - 1)
    gathered = jnp.take_along_axis(ys_pad, rev_idx, axis=1)
    return jnp.where(pos < lens, gathered, jnp.asarray(pad_value, ys_pad.dtype))


def th_accuracy(pad_outputs: jnp.ndarray, pad_targets: jnp.ndarray,
                ignore_label: int = IGNORE_ID) -> jnp.ndarray:
    """Token accuracy over non-ignored positions (reference common.py:147-163).

    Args:
      pad_outputs: [B, U, V] logits (or [B*U, V]).
      pad_targets: [B, U] int targets with ignore_label padding.
    """
    if pad_outputs.ndim == 3:
        pred = jnp.argmax(pad_outputs, axis=-1)
    else:
        pred = jnp.argmax(pad_outputs, axis=-1).reshape(pad_targets.shape)
    mask = pad_targets != ignore_label
    correct = jnp.sum((pred == pad_targets) & mask)
    total = jnp.maximum(jnp.sum(mask), 1)
    return correct / total
