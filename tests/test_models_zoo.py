"""Squeezeformer + EfficientConformer: shapes, losses, streaming equivalence.

The streaming checks verify the per-scale static-ring-cache re-design against
the full-context forward with the equivalent chunk mask (the property the
reference's forward_chunk guarantees)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ppasr_tpu.models.factory import build_model

RNG = jax.random.PRNGKey(0)


def _squeezeformer(streaming=True):
    return build_model(
        'squeezeformer', 80, 30, streaming=streaming,
        encoder_conf={'encoder_dim': 64, 'output_size': 64,
                      'attention_heads': 2, 'num_blocks': 6,
                      'reduce_idx': 2, 'recover_idx': 4,
                      'feed_forward_expansion_factor': 2,
                      'cnn_module_kernel': 15},
        decoder_conf={'attention_heads': 2, 'linear_units': 128,
                      'num_blocks': 1, 'r_num_blocks': 1},
        model_conf={'ctc_weight': 0.3, 'lsm_weight': 0.1,
                    'reverse_weight': 0.3})


def _effcon(streaming=True, group_size=3, group_layers=(0, 1, 2)):
    return build_model(
        'efficient_conformer', 80, 30, streaming=streaming,
        encoder_conf={'output_size': 64, 'attention_heads': 2,
                      'linear_units': 128, 'num_blocks': 5,
                      'cnn_module_kernel': 15,
                      'efficient_conf': {'stride_layer_idx': [2],
                                         'stride': [2],
                                         'group_layer_idx': list(group_layers),
                                         'group_size': group_size,
                                         'stride_kernel': True}},
        decoder_conf={'attention_heads': 2, 'linear_units': 128,
                      'num_blocks': 1, 'r_num_blocks': 1},
        model_conf={'ctc_weight': 0.3, 'lsm_weight': 0.1,
                    'reverse_weight': 0.3})


def _init(m, t=128):
    speech = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, t, 80)) * 0.3, jnp.float32)
    lens = jnp.asarray([t, t - 28])
    text = jnp.asarray([[1, 2, 3, -1, -1], [4, 5, -1, -1, -1]], jnp.int32)
    tlens = jnp.asarray([3, 2])
    params = m.init({'params': RNG, 'dropout': RNG, 'chunk': RNG},
                    speech, lens, text, tlens, deterministic=False)
    return params, speech, lens, text, tlens


def test_squeezeformer_paths():
    m = _squeezeformer()
    params, speech, lens, text, tlens = _init(m)
    out = m.apply(params, speech, lens, text, tlens, deterministic=False,
                  rngs={'dropout': RNG, 'chunk': RNG})
    assert np.isfinite(float(out['loss']))
    probs, olens = m.apply(params, speech, lens, method='get_encoder_out')
    assert probs.shape[2] == 30
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-4)
    # U-Net recovery restores full time resolution
    assert probs.shape[1] == 31


def test_effcon_paths():
    m = _effcon()
    params, speech, lens, text, tlens = _init(m)
    out = m.apply(params, speech, lens, text, tlens, deterministic=False,
                  rngs={'dropout': RNG, 'chunk': RNG})
    assert np.isfinite(float(out['loss']))
    probs, olens = m.apply(params, speech, lens, method='get_encoder_out')
    # stride layer halves time: 31 → 16
    assert probs.shape[1] == 16
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-4)


def _streaming_check(m, chunk=16, left=2, n_chunks=3, atol=3e-3):
    sub, ctx = 4, 7
    t_in = (chunk * n_chunks - 1) * sub + ctx
    speech = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, t_in, 80)) * 0.3, jnp.float32)
    lens = jnp.asarray([t_in])
    text = jnp.asarray([[1, 2, -1]], jnp.int32)
    tlens = jnp.asarray([2])
    params = m.init({'params': RNG, 'dropout': RNG, 'chunk': RNG},
                    speech, lens, text, tlens, deterministic=False)

    full_out, _ = m.apply(
        params, speech, lens, decoding_chunk_size=chunk,
        num_decoding_left_chunks=left, deterministic=True,
        method=lambda mdl, s, l, **kw: mdl.encoder(s, l, **kw))
    full_out = np.asarray(full_out)

    window = (chunk - 1) * sub + ctx
    stride = chunk * sub
    state = m.init_state(1, chunk * left)
    fn = jax.jit(lambda p, x, st: m.apply(
        p, x, st, method=lambda mdl, xx, ss: mdl.encoder.forward_chunk(
            xx, ss)))
    outs = []
    pos = 0
    while pos + window <= t_in:
        out, state = fn(params, speech[:, pos:pos + window], state)
        outs.append(np.asarray(out))
        pos += stride
    stream_out = np.concatenate(outs, axis=1)
    t = min(stream_out.shape[1], full_out.shape[1])
    np.testing.assert_allclose(stream_out[:, :t], full_out[:, :t],
                               rtol=atol, atol=atol)


def test_squeezeformer_streaming_equivalence():
    _streaming_check(_squeezeformer())


def test_effcon_streaming_equivalence_no_group():
    """Stride layers + per-scale caches are exact."""
    _streaming_check(_effcon(group_layers=()))


def test_effcon_streaming_equivalence_aligned_group():
    """group_size=4 divides chunk(16) and cache(32) → group boundaries align
    between streaming windows and the offline pass → exact."""
    _streaming_check(_effcon(group_size=4))


def test_effcon_streaming_group3_approximate():
    """group_size=3 does NOT divide the chunk/cache: streaming group
    boundaries shift per chunk, exactly as in the reference C++/paddle
    streaming path (pad4group groups the concatenated cache+chunk window
    from slot 0 — efficient_conformer/attention.py:40-79). Outputs are
    approximately equal; verify correlation rather than equality."""
    m = _effcon(group_size=3)
    chunk, left, sub, ctx, n_chunks = 16, 2, 4, 7, 3
    t_in = (chunk * n_chunks - 1) * sub + ctx
    speech = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, t_in, 80)) * 0.3, jnp.float32)
    lens = jnp.asarray([t_in])
    text = jnp.asarray([[1, 2, -1]], jnp.int32)
    tlens = jnp.asarray([2])
    params = m.init({'params': RNG, 'dropout': RNG, 'chunk': RNG},
                    speech, lens, text, tlens, deterministic=False)
    full_out, _ = m.apply(
        params, speech, lens, decoding_chunk_size=chunk,
        num_decoding_left_chunks=left, deterministic=True,
        method=lambda mdl, s, l, **kw: mdl.encoder(s, l, **kw))
    full_out = np.asarray(full_out)
    window, stride = (chunk - 1) * sub + ctx, chunk * sub
    state = m.init_state(1, chunk * left)
    fn = jax.jit(lambda p, x, st: m.apply(
        p, x, st, method=lambda mdl, xx, ss: mdl.encoder.forward_chunk(
            xx, ss)))
    outs, pos = [], 0
    while pos + window <= t_in:
        out, state = fn(params, speech[:, pos:pos + window], state)
        outs.append(np.asarray(out))
        pos += stride
    stream_out = np.concatenate(outs, axis=1)
    t = min(stream_out.shape[1], full_out.shape[1])
    a, b = stream_out[0, :t].ravel(), full_out[0, :t].ravel()
    corr = np.corrcoef(a, b)[0, 1]
    rel_rms = float(np.sqrt(np.mean((a - b) ** 2))
                    / np.sqrt(np.mean(b ** 2)))
    # Golden deviation fixture: this computation is fully deterministic
    # (PRNGKey(0) params, seeded input), measured once on the CPU backend:
    #   corr = 0.868407, rel_rms = 0.513017
    # Pin the approximation MAGNITUDE to ±20% of the golden values (plus a
    # small backend-difference allowance) so drift in the group-shift
    # handling is caught in either direction — a "fix" that silently makes
    # streaming exact would ALSO fail here and force re-measuring, which is
    # the point: the deviation is reference behavior, not noise
    # (/root/reference/ppasr/model_utils/efficient_conformer/encoder.py:342-383).
    GOLDEN_CORR, GOLDEN_REL_RMS = 0.868407, 0.513017
    assert abs(corr - GOLDEN_CORR) < 0.10, (corr, GOLDEN_CORR)
    assert abs(rel_rms - GOLDEN_REL_RMS) < 0.20 * GOLDEN_REL_RMS + 0.02, \
        (rel_rms, GOLDEN_REL_RMS)
