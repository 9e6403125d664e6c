"""Batched multi-stream state: a staggered stream in a batch must produce
exactly the same outputs as the same stream run alone (per-stream
offset/cache_len vectors)."""
import numpy as np
import jax
import jax.numpy as jnp

from ppasr_tpu.models.factory import build_model

RNG = jax.random.PRNGKey(0)


def _model():
    return build_model(
        'conformer', 80, 30, streaming=True,
        encoder_conf={'output_size': 64, 'attention_heads': 2,
                      'linear_units': 128, 'num_blocks': 2,
                      'cnn_module_kernel': 15},
        decoder_conf={'attention_heads': 2, 'linear_units': 128,
                      'num_blocks': 1, 'r_num_blocks': 1},
        model_conf={'ctc_weight': 0.3})


def test_staggered_batch_equals_single():
    m = _model()
    rng = np.random.default_rng(0)
    window = 67
    chunks = [jnp.asarray(rng.standard_normal((1, window, 80)) * 0.3,
                          jnp.float32) for _ in range(3)]
    speech = jnp.zeros((1, 64, 80), jnp.float32)
    params = m.init({'params': RNG, 'dropout': RNG, 'chunk': RNG},
                    speech, jnp.asarray([64]),
                    jnp.asarray([[1, -1]], jnp.int32), jnp.asarray([2]),
                    deterministic=False)
    fn = jax.jit(lambda p, x, st: m.apply(
        p, x, st, method='get_encoder_out_chunk'))

    # single-stream reference: stream A processes chunks 0,1,2
    state1 = m.init_state(1, 32)
    singles = []
    for ch in chunks:
        out, state1 = fn(params, ch, state1)
        singles.append(np.asarray(out[0]))

    # batch of 2: slot 0 = stream A; slot 1 starts one tick later with the
    # SAME chunk sequence. Ticks where a slot has no data keep its state via
    # masked select (mirroring ppasr_tpu/serving.py).
    state2 = m.init_state(2, 32)

    from ppasr_tpu.serving import StreamingBatchEngine
    axes = StreamingBatchEngine.stream_axes(state2)

    def select(mask, new, old):
        def sel(axis, n, o):
            shape = [1] * n.ndim
            shape[axis] = 2
            return jnp.where(mask.reshape(shape), n, o)
        return jax.tree.map(sel, axes, new, old)

    outs_a, outs_b = [], []
    schedule = [  # (slot0 chunk idx or None, slot1 chunk idx or None)
        (0, None), (1, 0), (2, 1), (None, 2)]
    for a_idx, b_idx in schedule:
        batch = jnp.concatenate([
            chunks[a_idx] if a_idx is not None else jnp.zeros_like(chunks[0]),
            chunks[b_idx] if b_idx is not None else jnp.zeros_like(chunks[0]),
        ], axis=0)
        mask = jnp.asarray([a_idx is not None, b_idx is not None])
        out, new_state = fn(params, batch, state2)
        state2 = select(mask, new_state, state2)
        if a_idx is not None:
            outs_a.append(np.asarray(out[0]))
        if b_idx is not None:
            outs_b.append(np.asarray(out[1]))

    for i in range(3):
        np.testing.assert_allclose(outs_a[i], singles[i], rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(outs_b[i], singles[i], rtol=1e-5,
                                   atol=1e-5)
