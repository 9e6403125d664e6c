"""CTC head: projection + loss + prob heads.

Behavior parity with reference ppasr/model_utils/loss/ctc.py:27-80 (linear
``ctc_lo`` projection, sum-reduced loss divided by batch, softmax/log_softmax/
argmax inference heads); the loss itself is the in-house log-semiring scan
(ppasr_tpu/ops/ctc.py) instead of warp-ctc.
"""
import flax.linen as nn
import jax.numpy as jnp

from ppasr_tpu.models.base import Dropout, kaiming_uniform
from ppasr_tpu.ops.ctc import ctc_loss_from_logits


class CTCHead(nn.Module):
    vocab_size: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, encoder_out, encoder_lens, labels, label_lens,
                 deterministic=True):
        """Returns the batch-averaged CTC loss."""
        logits = self.logits(encoder_out, deterministic)
        # straight from logits: the dense f32 log-softmax (and its autodiff
        # residual) never materializes — see ops/ctc.py:ctc_loss_from_logits
        return ctc_loss_from_logits(logits, encoder_lens, labels,
                                    label_lens)

    @nn.compact
    def logits(self, encoder_out, deterministic=True):
        x = Dropout(self.dropout_rate)(encoder_out,
                                          deterministic=deterministic)
        return nn.Dense(self.vocab_size, kernel_init=kaiming_uniform,
                        dtype=self.dtype, name='ctc_lo')(x)

    def log_softmax(self, encoder_out):
        return nn.log_softmax(
            self.logits(encoder_out).astype(jnp.float32), axis=-1)

    def softmax(self, encoder_out):
        return nn.softmax(
            self.logits(encoder_out).astype(jnp.float32), axis=-1)
