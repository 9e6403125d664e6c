"""Multi-device batch decode stays on-device (BASELINE.json config 5).

Posteriors sharded over the data axis of an 8-device mesh run through the
on-device beam search with NO resharding/gather to a single device — GSPMD
partitions the whole scan batch-parallel (every per-step op is independent
across lanes). Results must match the unsharded decode exactly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _peaky_posteriors(bsz, t, v, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((bsz, t, v)).astype(np.float32)
    blank_frames = rng.random((bsz, t)) < 0.7
    logits[..., 0] = np.where(blank_frames, 10.0, -2.0)
    spike = rng.integers(1, v, (bsz, t))
    idx = np.arange(t)
    for b in range(bsz):
        logits[b, idx, spike[b]] += np.where(blank_frames[b], 0, 8.0)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    return probs / probs.sum(-1, keepdims=True)


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_beam_decode_sharded_matches_unsharded():
    from ppasr_tpu.decoders.beam_search_jax import JaxBeamSearchDecoder
    bsz, t, v = 8, 60, 128
    probs = _peaky_posteriors(bsz, t, v)
    lens = np.full((bsz,), t, np.int32)
    vocab = [chr(ord('a') + i % 26) + str(i) for i in range(v)]

    ref = JaxBeamSearchDecoder(vocab, beam_size=5).decode_batch(
        jnp.asarray(probs), lens)

    mesh = Mesh(np.array(jax.devices()[:8]), ('data',))
    sharded = jax.device_put(
        jnp.asarray(probs), NamedSharding(mesh, P('data', None, None)))
    assert len(sharded.sharding.device_set) == 8
    dec = JaxBeamSearchDecoder(vocab, beam_size=5)
    got = dec.decode_batch(sharded, lens)
    assert got == ref

    # the compiled scan must not have gathered the batch to one device:
    # feed per-shard lens as sharded too and confirm stability
    lens_sharded = jax.device_put(jnp.asarray(lens),
                                  NamedSharding(mesh, P('data')))
    got2 = dec.decode_batch(sharded, np.asarray(lens_sharded))
    assert got2 == ref


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_encoder_to_decode_chain_sharded():
    """Encoder forward + beam decode, posteriors never leaving the mesh."""
    from ppasr_tpu.models.factory import build_model
    from ppasr_tpu.decoders.beam_search_jax import JaxBeamSearchDecoder
    model = build_model(
        'conformer', 20, 40, streaming=False,
        encoder_conf=dict(output_size=32, attention_heads=2,
                          linear_units=48, num_blocks=1,
                          cnn_module_kernel=7),
        decoder_conf=dict(attention_heads=2, linear_units=48,
                          num_blocks=1, r_num_blocks=1),
        model_conf=dict(ctc_weight=0.5, lsm_weight=0.1, reverse_weight=0.3))
    rng = jax.random.PRNGKey(0)
    params = model.init({'params': rng, 'dropout': rng, 'chunk': rng},
                        jnp.zeros((1, 64, 20)), jnp.asarray([64]),
                        jnp.asarray([[1, 2, -1]], jnp.int32),
                        jnp.asarray([2]), deterministic=False)
    mesh = Mesh(np.array(jax.devices()[:8]), ('data',))
    speech = jax.device_put(
        jnp.asarray(np.random.default_rng(1).standard_normal(
            (8, 64, 20)), jnp.float32),
        NamedSharding(mesh, P('data', None, None)))
    lens = jnp.full((8,), 64, jnp.int32)
    fwd = jax.jit(lambda p, s, l: model.apply(p, s, l,
                                              method='get_encoder_out'))
    probs, olens = fwd(params, speech, lens)
    # posteriors inherit the data sharding — no implicit gather
    assert len(probs.sharding.device_set) == 8, probs.sharding
    dec = JaxBeamSearchDecoder([str(i) for i in range(40)], beam_size=4)
    results = dec.decode_batch(probs, np.asarray(olens))
    assert len(results) == 8
    ref = dec.decode_batch(jax.device_put(jnp.asarray(np.asarray(probs))),
                           np.asarray(olens))
    assert results == ref

    # softmax-free fast path: sharded logits chain must match too
    fwd_l = jax.jit(lambda p, s, l: model.apply(
        p, s, l, method='get_encoder_logits'))
    logits, olens_l = fwd_l(params, speech, lens)
    assert len(logits.sharding.device_set) == 8, logits.sharding
    dec_l = JaxBeamSearchDecoder([str(i) for i in range(40)], beam_size=4)
    results_l = dec_l.decode_batch_from_logits(logits, np.asarray(olens_l))
    for (s_l, t_l), (s_r, t_r) in zip(results_l, ref):
        assert t_l == t_r  # scores: log-domain vs softmax-div rounding
        assert abs(s_l - s_r) < 1e-3
