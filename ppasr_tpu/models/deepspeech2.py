"""DeepSpeech2: conv subsampling ×4 + (bi)LSTM/GRU stack + CTC.

Behavior parity with reference ppasr/model_utils/deepspeech2/:
- Conv2dSubsampling4Pure (conv.py:5-21): two stride-2 3×3 VALID convs, 32
  channels, NO positional encoding, output flattened to ((D−1)//2−1)//2·32.
- CRNNEncoder (encoder.py:7-104): N× single-layer LSTM/GRU (uni-directional
  when streaming, bidirectional otherwise), LayerNorm after each layer,
  streaming h/c state threaded through forward.
- DeepSpeech2Model (model.py:12-92): CTC-only loss; get_encoder_out /
  get_encoder_out_chunk with h/c state carry.

TPU-native: recurrence runs as ``lax.scan`` via flax nn.RNN (XLA unrolls and
pipelines the cell matmuls onto the MXU); streaming state is an explicit
(h, c) pytree [L, B, H] that stays in device memory between chunks.
"""
from typing import NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp

from ppasr_tpu.models.base import GlobalCMVN, kaiming_uniform
from ppasr_tpu.models.ctc import CTCHead
from ppasr_tpu.ops.masks import make_non_pad_mask


class DS2State(NamedTuple):
    """Streaming RNN state: h/c each [num_layers, B, rnn_size]."""
    h: jnp.ndarray
    c: jnp.ndarray


class Conv2dSubsampling4Pure(nn.Module):
    odim: int = 32
    dtype: jnp.dtype = jnp.float32

    subsampling_rate = 4

    @nn.compact
    def __call__(self, x):
        x = x[..., None]  # NHWC
        x = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding='VALID',
                    kernel_init=kaiming_uniform, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding='VALID',
                    kernel_init=kaiming_uniform, dtype=self.dtype)(x)
        x = nn.relu(x)
        b, t, f, c = x.shape
        return x.reshape(b, t, f * c)

    @staticmethod
    def out_len(lens):
        return ((lens - 1) // 2 - 1) // 2


class CRNNEncoder(nn.Module):
    input_dim: int
    num_rnn_layers: int = 5
    rnn_size: int = 1024
    use_gru: bool = False
    bidirectional: bool = False
    cmvn_mean: Optional[tuple] = None
    cmvn_istd: Optional[tuple] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.cmvn_mean is not None:
            self.global_cmvn = GlobalCMVN(self.cmvn_mean, self.cmvn_istd)
        self.conv = Conv2dSubsampling4Pure(32, dtype=self.dtype)
        cell_cls = nn.GRUCell if self.use_gru else nn.OptimizedLSTMCell
        self.fwd_rnns = [nn.RNN(cell_cls(self.rnn_size, dtype=self.dtype),
                                return_carry=True)
                         for _ in range(self.num_rnn_layers)]
        if self.bidirectional:
            self.bwd_rnns = [nn.RNN(cell_cls(self.rnn_size, dtype=self.dtype),
                                    return_carry=True, reverse=True,
                                    keep_order=True)
                             for _ in range(self.num_rnn_layers)]
        self.norms = [nn.LayerNorm(dtype=self.dtype)
                      for _ in range(self.num_rnn_layers)]

    @property
    def output_size(self):
        return 2 * self.rnn_size if self.bidirectional else self.rnn_size

    def __call__(self, x, x_lens, state: Optional[DS2State] = None):
        """Returns (out [B, T', D], out_lens [B], new_state)."""
        if self.cmvn_mean is not None:
            x = self.global_cmvn(x)
        x = self.conv(x)
        out_lens = Conv2dSubsampling4Pure.out_len(x_lens.astype(jnp.int32))
        seq_lens = jnp.minimum(out_lens, x.shape[1])

        new_h, new_c = [], []
        for i in range(self.num_rnn_layers):
            cell = self.fwd_rnns[i]
            if state is not None:
                if self.use_gru:
                    carry0 = state.h[i]
                else:
                    carry0 = (state.c[i], state.h[i])
                carry, y = cell(x, initial_carry=carry0, seq_lengths=seq_lens)
            else:
                carry, y = cell(x, seq_lengths=seq_lens)
            if self.use_gru:
                new_h.append(carry)
                new_c.append(jnp.zeros_like(carry))
            else:
                new_c.append(carry[0])
                new_h.append(carry[1])
            if self.bidirectional:
                _, y_b = self.bwd_rnns[i](x, seq_lengths=seq_lens)
                y = jnp.concatenate([y, y_b], axis=-1)
            x = self.norms[i](y)
        new_state = DS2State(h=jnp.stack(new_h), c=jnp.stack(new_c))
        return x, out_lens, new_state

    def init_state(self, batch_size: int) -> DS2State:
        shape = (self.num_rnn_layers, batch_size, self.rnn_size)
        return DS2State(h=jnp.zeros(shape, self.dtype),
                        c=jnp.zeros(shape, self.dtype))


class DeepSpeech2Model(nn.Module):
    input_size: int
    vocab_size: int
    streaming: bool = True
    encoder_conf: Optional[dict] = None
    decoder_conf: Optional[dict] = None
    cmvn_mean: Optional[tuple] = None
    cmvn_istd: Optional[tuple] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        conf = dict(self.encoder_conf or {})
        conf.pop('rnn_direction', None)
        self.encoder = CRNNEncoder(input_dim=self.input_size,
                                   bidirectional=not self.streaming,
                                   cmvn_mean=self.cmvn_mean,
                                   cmvn_istd=self.cmvn_istd,
                                   dtype=self.dtype, **conf)
        self.ctc = CTCHead(self.vocab_size, dtype=self.dtype,
                           **(self.decoder_conf or {}))

    def __call__(self, speech, speech_lens, text, text_lens,
                 deterministic=False):
        eouts, eouts_len, _ = self.encoder(speech, speech_lens)
        loss = self.ctc(eouts, eouts_len, text, text_lens,
                        deterministic=deterministic)
        return {'loss': loss, 'loss_ctc': loss, 'loss_att': None,
                'th_accuracy': None}

    def get_encoder_out(self, speech, speech_lens):
        eouts, eouts_len, _ = self.encoder(speech, speech_lens)
        return self.ctc.softmax(eouts), eouts_len

    def get_ctc_log_probs(self, speech, speech_lens):
        eouts, eouts_len, _ = self.encoder(speech, speech_lens)
        return self.ctc.log_softmax(eouts), eouts_len

    def get_encoder_logits(self, speech, speech_lens):
        """CTC logits (compute dtype) for the softmax-free decode path."""
        eouts, eouts_len, _ = self.encoder(speech, speech_lens)
        return self.ctc.logits(eouts), eouts_len

    def get_encoder_out_chunk(self, speech, speech_lens, state: DS2State):
        eouts, eouts_len, new_state = self.encoder(speech, speech_lens, state)
        return self.ctc.softmax(eouts), eouts_len, new_state

    def init_state(self, batch_size: int, cache_size: int = 0) -> DS2State:
        conf = dict(self.encoder_conf or {})
        num_layers = int(conf.get('num_rnn_layers', 5))
        rnn_size = int(conf.get('rnn_size', 1024))
        shape = (num_layers, batch_size, rnn_size)
        return DS2State(h=jnp.zeros(shape, self.dtype),
                        c=jnp.zeros(shape, self.dtype))

    @property
    def subsampling_rate(self):
        return 4

    @property
    def right_context(self):
        return 6
