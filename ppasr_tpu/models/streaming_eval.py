"""Batched chunked-streaming encode for evaluation.

Drives ``get_encoder_out_chunk`` over decoding windows exactly like the
production streaming predictor (reference ppasr/predict.py:232-337 chunk
math: window (chunk-1)*4+7 input frames, stride chunk*4), but with B
parallel streams sharing one device-resident StreamingState — the way a
TPU wants to run many live sessions. Used by trainer.evaluate
(streaming_eval=True / eval.py --streaming_eval) and by bench.py's live
streaming-CER metric.
"""
import numpy as np

import jax
import jax.numpy as jnp

SUBSAMPLING = 4
CONTEXT = 7


def make_chunk_fn(model):
    """Jitted chunk step for the attention-family streaming API."""
    return jax.jit(lambda p, xs, st: model.apply(
        p, xs, st, method='get_encoder_out_chunk'))


def streaming_encode_batch(model, params, inputs, in_lens,
                           chunk: int = 16, left_chunks: int = 16,
                           chunk_fn=None):
    """[B, T, F] features → (probs [B, T', V] device, out_lens [B] np)
    through the chunked-streaming path.

    Tail windows are zero-padded up to the decoding window and clipped by
    out_lens — the same approximation the single-stream predictor makes
    on its final flush (attention inside the last window sees the pad;
    conv subsampling of frames before out_lens does not)."""
    window = (chunk - 1) * SUBSAMPLING + CONTEXT
    stride = chunk * SUBSAMPLING
    inputs = np.asarray(inputs)
    in_lens = np.asarray(in_lens)
    bsz, t_max, feat_dim = inputs.shape
    out_total = max(1, max(int(t_max) - CONTEXT, 0) // SUBSAMPLING + 1)
    n_win = -(-out_total // chunk)
    pad_t = (n_win - 1) * stride + window
    x = np.zeros((bsz, pad_t, feat_dim), np.float32)
    x[:, :t_max] = inputs
    if chunk_fn is None:
        chunk_fn = make_chunk_fn(model)
    state = model.init_state(bsz, chunk * left_chunks)
    chunks = []
    for k in range(n_win):
        xs = jnp.asarray(x[:, k * stride:k * stride + window])
        probs_k, state = chunk_fn(params, xs, state)
        chunks.append(probs_k[:, :chunk])
    probs = jnp.concatenate(chunks, axis=1) if len(chunks) > 1 else chunks[0]
    out_factor = getattr(model, 'output_factor', 1)
    olens = np.maximum(in_lens - CONTEXT, 0) // SUBSAMPLING + 1
    olens = (olens + out_factor - 1) // out_factor
    olens = np.minimum(olens, probs.shape[1]).astype(np.int32)
    return probs, olens
