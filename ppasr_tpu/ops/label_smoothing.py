"""Label-smoothing KL-divergence loss for the attention decoder branch.

Behavior parity with reference ppasr/model_utils/loss/label_smoothing_loss.py
:31-91: KLDiv between log-softmax outputs and the smoothed one-hot
distribution, with IGNORE_ID positions masked, normalized by batch size
(normalize_length=False) or by token count (True).
"""
import jax
import jax.numpy as jnp

from ppasr_tpu.ops.common import IGNORE_ID


def label_smoothing_loss(logits: jnp.ndarray,
                         targets: jnp.ndarray,
                         smoothing: float = 0.1,
                         normalize_length: bool = False,
                         ignore_id: int = IGNORE_ID) -> jnp.ndarray:
    """Args:
      logits: [B, U, V].
      targets: [B, U] int ids, padding = ignore_id.
    Returns: scalar loss.
    """
    bsz, _, vocab = logits.shape
    confidence = 1.0 - smoothing
    low = smoothing / (vocab - 1)

    mask = targets != ignore_id
    tgt = jnp.where(mask, targets, 0)
    log_probs = jax.nn.log_softmax(logits, axis=-1)

    true_dist = jnp.full_like(log_probs, low)
    true_dist = jnp.put_along_axis(
        true_dist, tgt[..., None], confidence, axis=-1, inplace=False)

    # KL(true || pred) = sum true * (log true - log pred); the log-true term is
    # constant w.r.t. params but kept for value parity with paddle KLDivLoss.
    log_true = jnp.where(true_dist > 0, jnp.log(true_dist), 0.0)
    kl = jnp.sum(true_dist * (log_true - log_probs), axis=-1)  # [B, U]
    kl = jnp.where(mask, kl, 0.0)
    denom = jnp.maximum(jnp.sum(mask), 1) if normalize_length else bsz
    return jnp.sum(kl) / denom
