"""Conformer hybrid CTC + attention model.

Behavior parity with reference ppasr/model_utils/conformer/model.py:
- forward (:68-109): loss = ctc_weight·ctc + (1−ctc_weight)·att.
- _calc_att_loss (:111-146): add_sos_eos, R2L decoder over reversed labels,
  label-smoothing losses mixed by reverse_weight, th_accuracy.
- get_encoder_out (:148-162): full-context encoder → CTC softmax.
- get_encoder_out_chunk (:164-184): streaming chunk step (device-resident
  StreamingState instead of dynamic att/cnn caches).
- streaming=True ⇒ use_dynamic_chunk=True, causal=True (:35-39).

Entry points are plain methods dispatched via ``model.apply(variables, ...,
method=...)``; ``__call__`` is the training loss.
"""
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ppasr_tpu.models.conformer_encoder import ConformerEncoder, StreamingState
from ppasr_tpu.models.ctc import CTCHead
from ppasr_tpu.models.transformer_decoder import BiTransformerDecoder
from ppasr_tpu.ops.common import (IGNORE_ID, add_sos_eos, reverse_pad_list,
                                  th_accuracy)
from ppasr_tpu.ops.label_smoothing import label_smoothing_loss


class ConformerModel(nn.Module):
    input_size: int
    vocab_size: int
    streaming: bool = True
    encoder_conf: Optional[dict] = None
    decoder_conf: Optional[dict] = None
    ctc_weight: float = 0.3
    lsm_weight: float = 0.1
    reverse_weight: float = 0.3
    length_normalized_loss: bool = False
    cmvn_mean: Optional[tuple] = None
    cmvn_istd: Optional[tuple] = None
    dtype: jnp.dtype = jnp.float32

    @property
    def sos(self):
        return self.vocab_size - 1

    @property
    def eos(self):
        return self.vocab_size - 1

    def setup(self):
        conf = dict(self.encoder_conf or {})
        if self.streaming:
            conf['use_dynamic_chunk'] = True
            conf['causal'] = True
        self.encoder = ConformerEncoder(input_size=self.input_size,
                                        cmvn_mean=self.cmvn_mean,
                                        cmvn_istd=self.cmvn_istd,
                                        dtype=self.dtype, **conf)
        output_size = (self.encoder_conf or {}).get('output_size', 256)
        self.decoder = BiTransformerDecoder(
            vocab_size=self.vocab_size, encoder_output_size=output_size,
            dtype=self.dtype, **(self.decoder_conf or {}))
        self.ctc = CTCHead(self.vocab_size, dtype=self.dtype)

    def __call__(self, speech, speech_lens, text, text_lens,
                 deterministic=False):
        """Training loss (reference model.py:68-109).
        Returns dict(loss, loss_att, loss_ctc, th_accuracy)."""
        encoder_out, encoder_mask = self.encoder(
            speech, speech_lens, deterministic=deterministic)
        encoder_lens = encoder_mask[:, 0, :].sum(axis=-1).astype(jnp.int32)

        loss_ctc = self.ctc(encoder_out, encoder_lens, text, text_lens,
                            deterministic=deterministic)

        loss_att = None
        acc_att = None
        if self.ctc_weight < 1.0:
            ys_in, ys_out = add_sos_eos(text, text_lens, self.sos, self.eos)
            r_text = reverse_pad_list(text, text_lens, pad_value=IGNORE_ID)
            r_ys_in, r_ys_out = add_sos_eos(r_text, text_lens, self.sos,
                                            self.eos)
            dec_out, r_dec_out = self.decoder(
                encoder_out, encoder_mask, ys_in,
                text_lens.astype(jnp.int32) + 1,
                r_ys_in_pad=r_ys_in, reverse_weight=self.reverse_weight,
                deterministic=deterministic)
            loss_l2r = label_smoothing_loss(
                dec_out.astype(jnp.float32), ys_out, self.lsm_weight,
                self.length_normalized_loss)
            if r_dec_out is not None and self.reverse_weight > 0.0:
                loss_r2l = label_smoothing_loss(
                    r_dec_out.astype(jnp.float32), r_ys_out, self.lsm_weight,
                    self.length_normalized_loss)
                loss_att = (loss_l2r * (1 - self.reverse_weight)
                            + loss_r2l * self.reverse_weight)
            else:
                loss_att = loss_l2r
            acc_att = th_accuracy(dec_out.astype(jnp.float32), ys_out)

        if loss_att is None:
            loss = loss_ctc
        else:
            loss = self.ctc_weight * loss_ctc + (1 - self.ctc_weight) * loss_att
        return {'loss': loss, 'loss_att': loss_att, 'loss_ctc': loss_ctc,
                'th_accuracy': acc_att}

    def _encode_full(self, speech, speech_lens):
        return self.encoder(
            speech, speech_lens,
            decoding_chunk_size=-1 if self.streaming else 0,
            deterministic=True)

    def get_encoder_out(self, speech, speech_lens):
        """Full-context CTC softmax (reference model.py:148-162).
        Returns (probs [B, T', V], out_lens [B])."""
        encoder_out, encoder_mask = self._encode_full(speech, speech_lens)
        probs = self.ctc.softmax(encoder_out)
        out_lens = encoder_mask[:, 0, :].sum(axis=-1).astype(jnp.int32)
        return probs, out_lens

    def get_ctc_log_probs(self, speech, speech_lens):
        encoder_out, encoder_mask = self._encode_full(speech, speech_lens)
        log_probs = self.ctc.log_softmax(encoder_out)
        out_lens = encoder_mask[:, 0, :].sum(axis=-1).astype(jnp.int32)
        return log_probs, out_lens

    def get_encoder_logits(self, speech, speech_lens):
        """CTC LOGITS in the model compute dtype (no f32 [B, T', V] softmax
        materialization — the batch-decode fast path derives beam candidates
        from logits + logsumexp directly; see
        JaxBeamSearchDecoder.decode_batch_from_logits)."""
        encoder_out, encoder_mask = self._encode_full(speech, speech_lens)
        logits = self.ctc.logits(encoder_out)
        out_lens = encoder_mask[:, 0, :].sum(axis=-1).astype(jnp.int32)
        return logits, out_lens

    def encode_for_rescore(self, speech, speech_lens):
        """One forward producing both the encoder output (for attention
        rescoring) and the CTC posteriors (for the beam's first pass).
        Returns (encoder_out [B,T',D], probs [B,T',V], out_lens [B])."""
        encoder_out, encoder_mask = self._encode_full(speech, speech_lens)
        probs = self.ctc.softmax(encoder_out)
        out_lens = encoder_mask[:, 0, :].sum(axis=-1).astype(jnp.int32)
        return encoder_out, probs, out_lens

    def attention_rescore_scores(self, encoder_out, encoder_lens,
                                 hyps, hyps_lens):
        """[B,K] attention log-prob scores of beam hypotheses
        (ppasr_tpu/models/rescore.py; beyond-reference capability)."""
        from ppasr_tpu.models.rescore import attention_rescore_scores
        return attention_rescore_scores(self.decoder, encoder_out,
                                        encoder_lens, hyps, hyps_lens,
                                        self.sos, self.eos,
                                        self.reverse_weight)

    def get_encoder_out_chunk(self, xs, state: StreamingState):
        """Streaming chunk step → (probs [B, T_out, V], new_state)
        (reference model.py:164-184)."""
        encoder_out, new_state = self.encoder.forward_chunk(xs, state)
        probs = self.ctc.softmax(encoder_out)
        return probs, new_state

    def get_encoder_out_chunk_rescore(self, xs, state: StreamingState):
        """Chunk step that also exposes the encoder output, so streaming
        sessions can run a final attention-rescoring pass over the
        accumulated utterance → (encoder_out, probs, new_state)."""
        encoder_out, new_state = self.encoder.forward_chunk(xs, state)
        probs = self.ctc.softmax(encoder_out)
        return encoder_out, probs, new_state

    def init_state(self, batch_size: int, cache_size: int) -> StreamingState:
        conf = dict(self.encoder_conf or {})
        num_blocks = int(conf.get('num_blocks', 12))
        output_size = int(conf.get('output_size', 256))
        heads = int(conf.get('attention_heads', 4))
        kernel = int(conf.get('cnn_module_kernel', 15))
        causal = self.streaming or bool(conf.get('causal', False))
        lorder = kernel - 1 if causal else 0
        dk = output_size // heads
        z = jnp.zeros
        return StreamingState(
            offset=z((batch_size,), jnp.int32),
            cache_len=z((batch_size,), jnp.int32),
            att_k=z((num_blocks, batch_size, cache_size, heads, dk),
                    self.dtype),
            att_v=z((num_blocks, batch_size, cache_size, heads, dk),
                    self.dtype),
            cnn_cache=z((num_blocks, batch_size, lorder, output_size),
                        self.dtype))

    @property
    def subsampling_rate(self):
        conf = self.encoder_conf or {}
        from ppasr_tpu.models.subsampling import SUBSAMPLING_CLASSES
        return SUBSAMPLING_CLASSES[
            conf.get('input_layer', 'conv2d')].subsampling_rate

    @property
    def right_context(self):
        conf = self.encoder_conf or {}
        from ppasr_tpu.models.subsampling import SUBSAMPLING_CLASSES
        return SUBSAMPLING_CLASSES[
            conf.get('input_layer', 'conv2d')].right_context
