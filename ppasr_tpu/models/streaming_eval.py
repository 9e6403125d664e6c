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


def make_chunk_argmax_fn(model):
    """Jitted chunk step + per-frame argmax/max — the greedy streaming-eval
    path. Every window is the same [B, window, F] shape, so this is ONE
    compiled program regardless of utterance length; only tiny [B, chunk]
    id/score planes cross to the host per window (the [B, T', V] probs
    concat varies in shape per batch and was costing a fresh 30-40 s
    tunnel compile per distinct window count)."""
    def step(p, xs, st):
        probs, new_st = model.apply(p, xs, st,
                                    method='get_encoder_out_chunk')
        return (jnp.argmax(probs, axis=-1).astype(jnp.int32),
                jnp.max(probs, axis=-1), new_st)
    return jax.jit(step)


def _window_plan(inputs, in_lens, chunk):
    """Shared padding/window math → (x padded, n_win, window, stride)."""
    window = (chunk - 1) * SUBSAMPLING + CONTEXT
    stride = chunk * SUBSAMPLING
    inputs = np.asarray(inputs)
    bsz, t_max, feat_dim = inputs.shape
    out_total = max(1, max(int(t_max) - CONTEXT, 0) // SUBSAMPLING + 1)
    n_win = -(-out_total // chunk)
    pad_t = (n_win - 1) * stride + window
    x = np.zeros((bsz, pad_t, feat_dim), np.float32)
    x[:, :t_max] = inputs
    return x, n_win, window, stride


def _out_lens(model, in_lens, t_cap):
    out_factor = getattr(model, 'output_factor', 1)
    olens = np.maximum(np.asarray(in_lens) - CONTEXT, 0) // SUBSAMPLING + 1
    olens = (olens + out_factor - 1) // out_factor
    return np.minimum(olens, t_cap).astype(np.int32)


def streaming_encode_batch(model, params, inputs, in_lens,
                           chunk: int = 16, left_chunks: int = 16,
                           chunk_fn=None):
    """[B, T, F] features → (probs [B, T', V] device, out_lens [B] np)
    through the chunked-streaming path.

    Tail windows are zero-padded up to the decoding window and clipped by
    out_lens — the same approximation the single-stream predictor makes
    on its final flush (attention inside the last window sees the pad;
    conv subsampling of frames before out_lens does not)."""
    x, n_win, window, stride = _window_plan(inputs, in_lens, chunk)
    if chunk_fn is None:
        chunk_fn = make_chunk_fn(model)
    state = model.init_state(x.shape[0], chunk * left_chunks)
    chunks = []
    for k in range(n_win):
        xs = jnp.asarray(x[:, k * stride:k * stride + window])
        probs_k, state = chunk_fn(params, xs, state)
        chunks.append(probs_k[:, :chunk])
    probs = jnp.concatenate(chunks, axis=1) if len(chunks) > 1 else chunks[0]
    return probs, _out_lens(model, in_lens, probs.shape[1])


def streaming_greedy_batch(model, params, inputs, in_lens,
                           chunk: int = 16, left_chunks: int = 16,
                           argmax_fn=None):
    """Greedy variant: [B, T, F] → (ids [B, T'] np, max_probs [B, T'] np,
    out_lens [B] np). Per-window device argmax + host concat — ONE
    compiled program for any utterance length (see make_chunk_argmax_fn);
    feed the planes to decoders.greedy._collapse / greedy_decoder_batch
    semantics."""
    x, n_win, window, stride = _window_plan(inputs, in_lens, chunk)
    if argmax_fn is None:
        argmax_fn = make_chunk_argmax_fn(model)
    state = model.init_state(x.shape[0], chunk * left_chunks)
    ids, mp = [], []
    for k in range(n_win):
        xs = jnp.asarray(x[:, k * stride:k * stride + window])
        ids_k, mp_k, state = argmax_fn(params, xs, state)
        ids.append(np.asarray(ids_k[:, :chunk]))
        mp.append(np.asarray(mp_k[:, :chunk]))
    ids = np.concatenate(ids, axis=1)
    mp = np.concatenate(mp, axis=1)
    return ids, mp, _out_lens(model, in_lens, ids.shape[1])
