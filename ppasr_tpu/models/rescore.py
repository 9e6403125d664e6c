"""Attention-decoder rescoring of CTC beam hypotheses (on-device).

A capability the reference does NOT have: its BiTransformerDecoder is used
only for the training loss (ppasr/model_utils/transformer/decoder.py:15-123,
mixed into the hybrid loss at conformer/model.py:111-146) and every decode
path is CTC-only. Here the same trained decoder re-scores the CTC prefix
beam's top-K hypotheses (wenet-style "attention_rescoring"), which lowers
CER at the cost of one extra batched decoder pass. Everything runs on
device: hypotheses come straight from the JAX beam's BeamState, scores are
combined and argmax-selected without materialising per-hypothesis results
on the host.
"""
import jax
import jax.numpy as jnp

from ppasr_tpu.ops.common import IGNORE_ID, add_sos_eos, reverse_pad_list
from ppasr_tpu.ops.masks import make_non_pad_mask


def _sequence_log_prob(logits, targets):
    """Sum of per-token log-probs of `targets` under `logits`.

    logits [N, U+1, V]; targets [N, U+1] padded with IGNORE_ID (the eos
    position is a real target, so the eos term is included).
    Returns [N] float32."""
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    safe = jnp.where(targets == IGNORE_ID, 0, targets)
    tok = jnp.take_along_axis(log_probs, safe[..., None], axis=-1)[..., 0]
    return jnp.where(targets != IGNORE_ID, tok, 0.0).sum(axis=-1)


def attention_rescore_scores(decoder, encoder_out, encoder_lens,
                             hyps, hyps_lens, sos: int, eos: int,
                             reverse_weight: float):
    """Score beam hypotheses with the attention decoder.

    Args:
      decoder: the model's BiTransformerDecoder submodule (call inside a
        bound model method, e.g. ``model.apply(..., method=...)``).
      encoder_out: [B, T, D] full-context encoder output.
      encoder_lens: [B] valid encoder frames.
      hyps: [B, K, U] int32 token ids (content beyond each length is
        ignored; any pad value is fine).
      hyps_lens: [B, K] hypothesis lengths.
      reverse_weight: mixes the R2L decoder score exactly as the training
        loss does (score = (1-w)·L2R + w·R2L).
    Returns: [B, K] float32 attention log-prob scores (incl. the eos term).
    """
    b, k, u = hyps.shape
    flat_hyps = hyps.reshape(b * k, u)
    flat_lens = hyps_lens.reshape(b * k).astype(jnp.int32)

    pos = jnp.arange(u, dtype=jnp.int32)[None, :]
    ys_pad = jnp.where(pos < flat_lens[:, None], flat_hyps, IGNORE_ID)
    ys_in, ys_out = add_sos_eos(ys_pad, flat_lens, sos, eos)
    r_ys = reverse_pad_list(ys_pad, flat_lens, pad_value=IGNORE_ID)
    r_ys_in, r_ys_out = add_sos_eos(r_ys, flat_lens, sos, eos)

    memory = jnp.repeat(encoder_out, k, axis=0)
    memory_mask = make_non_pad_mask(
        jnp.repeat(encoder_lens, k), encoder_out.shape[1])[:, None, :]

    dec_out, r_dec_out = decoder(
        memory, memory_mask, ys_in, flat_lens + 1,
        r_ys_in_pad=r_ys_in, reverse_weight=reverse_weight,
        deterministic=True)

    score = _sequence_log_prob(dec_out, ys_out)
    if r_dec_out is not None and reverse_weight > 0.0:
        r_score = _sequence_log_prob(r_dec_out, r_ys_out)
        score = score * (1.0 - reverse_weight) + r_score * reverse_weight
    return score.reshape(b, k)
