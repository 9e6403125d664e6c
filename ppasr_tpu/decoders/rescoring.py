"""Attention-rescoring decoder: CTC prefix beam search + decoder rescore.

Beyond-reference capability (the reference decodes CTC-only; its attention
decoder exists solely for the training loss — see
ppasr_tpu/models/rescore.py). Pipeline, fully on device:

  1. the JAX CTC prefix beam search produces a BeamState holding ALL top-K
     hypotheses + CTC scores (ppasr_tpu/decoders/beam_search_jax.py);
  2. the model's attention decoder scores every hypothesis in one batched
     pass (L2R and, with reverse_weight > 0, R2L over reversed tokens);
  3. total = att_score + ctc_weight · ctc_score; the argmax hypothesis per
     utterance is packed into a single int32 buffer → one D2H transfer.

Requires the hybrid models (conformer / squeezeformer / efficient_conformer);
deepspeech2 has no attention decoder, callers fall back to plain beam/greedy.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ppasr_tpu.decoders.beam_search_jax import (
    NEG_INF, JaxBeamSearchDecoder, all_hypotheses, pack_hypothesis_at,
    unpack_results)


class AttentionRescoringDecoder:
    """Wraps a JaxBeamSearchDecoder with on-device attention rescoring.

    ``needs_encoder_out`` marks the different decode contract: callers run
    the model's ``encode_for_rescore`` (one forward producing both encoder
    output and CTC posteriors) and call ``decode_batch_rescore``.
    """
    needs_encoder_out = True

    def __init__(self, model, vocab_list, ctc_weight: float = 0.3,
                 max_hyp_len: int = 200, **beam_conf):
        self.model = model
        self.vocab_list = list(vocab_list)
        self.ctc_weight = float(ctc_weight)
        self.max_hyp_len = int(max_hyp_len)
        self.beam = JaxBeamSearchDecoder(vocab_list, **beam_conf)
        self._jit_score = None

    def _build(self):
        if self._jit_score is not None:
            return

        def score_and_pack(params, encoder_out, encoder_lens, states):
            hyps, hyp_lens, ctc_scores = all_hypotheses(states,
                                                        self.max_hyp_len)
            att = self.model.apply(params, encoder_out, encoder_lens,
                                   hyps, hyp_lens,
                                   method='attention_rescore_scores')
            total = att + self.ctc_weight * ctc_scores
            total = jnp.where(ctc_scores > NEG_INF / 2, total, NEG_INF)
            best = jnp.argmax(total, axis=1)
            return pack_hypothesis_at(states, best, total)
        self._jit_score = jax.jit(score_and_pack)

    def decode_batch_rescore(self, params, encoder_out, probs_batch, lens):
        """params + [B,T,D] encoder_out + [B,T',V] CTC probs + [B] lens →
        list of (score, text). Everything device-side until the final
        packed transfer; ``encoder_out``/``probs_batch`` may be device
        arrays straight from the jitted model."""
        self._build()
        states = self.beam.decode_batch_states(probs_batch, lens)
        lens_dev = jnp.asarray(np.asarray(lens), jnp.int32)
        packed = self._jit_score(params, encoder_out, lens_dev, states)
        return unpack_results(packed, self.vocab_list)

    def rescore_utterance(self, params, enc_chunks, probs_chunks):
        """Final pass for one streamed utterance: lists of per-chunk
        [T_i, D] encoder outputs and [T_i, V] posteriors (host) →
        (score, text). Time is padded to a 64-frame bucket so repeated
        stream endings reuse a handful of compiled programs."""
        probs = np.concatenate(probs_chunks, axis=0)
        enc = np.concatenate(enc_chunks, axis=0)
        t = probs.shape[0]
        bucket = max(16, -(-t // 64) * 64)
        probs_p = np.zeros((1, bucket, probs.shape[1]), np.float32)
        probs_p[0, :t] = probs
        enc_p = np.zeros((1, bucket, enc.shape[1]), np.float32)
        enc_p[0, :t] = enc
        return self.decode_batch_rescore(
            params, jnp.asarray(enc_p), jnp.asarray(probs_p),
            np.asarray([t], np.int32))[0]
