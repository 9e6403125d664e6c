"""Model zoo: forward shapes, loss finiteness, and the key streaming
property — chunked forward with device caches must match the full-context
forward with the equivalent chunk mask (SURVEY.md §4: "chunked ≡ full-context
outputs on identical weights", implied by reference forward_chunk)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ppasr_tpu.models.factory import build_model

RNG = jax.random.PRNGKey(0)


def _small_conformer(streaming=True):
    return build_model(
        'conformer', 80, 30, streaming=streaming,
        encoder_conf={'output_size': 64, 'attention_heads': 2,
                      'linear_units': 128, 'num_blocks': 2,
                      'cnn_module_kernel': 15},
        decoder_conf={'attention_heads': 2, 'linear_units': 128,
                      'num_blocks': 1, 'r_num_blocks': 1},
        model_conf={'ctc_weight': 0.3, 'lsm_weight': 0.1,
                    'reverse_weight': 0.3})


@pytest.fixture(scope="module")
def conformer_setup():
    m = _small_conformer()
    speech = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 50, 80)), jnp.float32)
    lens = jnp.asarray([50, 40])
    text = jnp.asarray([[1, 2, 3, -1, -1], [4, 5, -1, -1, -1]], jnp.int32)
    tlens = jnp.asarray([3, 2])
    params = m.init({'params': RNG, 'dropout': RNG, 'chunk': RNG},
                    speech, lens, text, tlens, deterministic=False)
    return m, params, speech, lens, text, tlens


def test_conformer_training_loss(conformer_setup):
    m, params, speech, lens, text, tlens = conformer_setup
    out = m.apply(params, speech, lens, text, tlens, deterministic=False,
                  rngs={'dropout': RNG, 'chunk': RNG})
    assert np.isfinite(float(out['loss']))
    assert np.isfinite(float(out['loss_ctc']))
    assert np.isfinite(float(out['loss_att']))
    # hybrid mixing
    mix = 0.3 * float(out['loss_ctc']) + 0.7 * float(out['loss_att'])
    assert abs(float(out['loss']) - mix) < 1e-3


def test_conformer_encoder_out(conformer_setup):
    m, params, speech, lens, *_ = conformer_setup
    probs, olens = m.apply(params, speech, lens, method='get_encoder_out')
    assert probs.shape[0] == 2 and probs.shape[2] == 30
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-4)
    assert olens.tolist() == [11, 9]


def test_conformer_streaming_equivalence():
    """Chunked forward (static ring cache) ≡ full forward with fixed-chunk
    mask, on the same weights."""
    m = _small_conformer(streaming=True)
    chunk, left_chunks = 16, 2
    sub, ctx = 4, 7
    n_chunks = 3
    t_in = (chunk * n_chunks - 1) * sub + ctx  # enough for n_chunks windows
    speech = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, t_in, 80)) * 0.5, jnp.float32)
    lens = jnp.asarray([t_in])
    text = jnp.asarray([[1, 2, -1]], jnp.int32)
    tlens = jnp.asarray([2])
    params = m.init({'params': RNG, 'dropout': RNG, 'chunk': RNG},
                    speech, lens, text, tlens, deterministic=False)

    # full-context forward with the equivalent fixed chunk mask
    def full(params, speech, lens):
        enc_out, mask = m.apply(
            params, speech, lens,
            decoding_chunk_size=chunk, num_decoding_left_chunks=left_chunks,
            deterministic=True,
            method=lambda mdl, s, l, **kw: mdl.encoder(s, l, **kw))
        return enc_out

    full_out = np.asarray(full(params, speech, lens))

    # streaming: windows of 67 frames, stride 64
    window = (chunk - 1) * sub + ctx  # 67
    stride = chunk * sub              # 64
    state = m.init_state(1, chunk * left_chunks)
    chunk_fn = jax.jit(lambda p, x, st: m.apply(
        p, x, st, method=lambda mdl, xx, ss: mdl.encoder.forward_chunk(xx, ss)))
    outs = []
    pos = 0
    while pos + window <= t_in:
        xs = speech[:, pos:pos + window]
        out, state = chunk_fn(params, xs, state)
        outs.append(np.asarray(out))
        pos += stride
    stream_out = np.concatenate(outs, axis=1)

    t = min(stream_out.shape[1], full_out.shape[1])
    np.testing.assert_allclose(stream_out[:, :t], full_out[:, :t],
                               rtol=2e-3, atol=2e-3)


def test_deepspeech2_paths():
    m = build_model('deepspeech2', 80, 30, streaming=True,
                    encoder_conf={'num_rnn_layers': 2, 'rnn_size': 64})
    speech = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 50, 80)), jnp.float32)
    lens = jnp.asarray([50, 40])
    text = jnp.asarray([[1, 2, 3, -1, -1], [4, 5, -1, -1, -1]], jnp.int32)
    tlens = jnp.asarray([3, 2])
    params = m.init(RNG, speech, lens, text, tlens, deterministic=True)
    out = m.apply(params, speech, lens, text, tlens, deterministic=True)
    assert np.isfinite(float(out['loss']))
    probs, olens = m.apply(params, speech, lens, method='get_encoder_out')
    assert probs.shape == (2, 11, 30)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-4)


def test_deepspeech2_streaming_equivalence():
    """Uni-directional RNN: feeding two half-utterance chunks with carried
    h/c state must equal one full forward."""
    m = build_model('deepspeech2', 80, 30, streaming=True,
                    encoder_conf={'num_rnn_layers': 2, 'rnn_size': 64})
    rng = np.random.default_rng(3)
    # 4-divisible chunks: conv ×4 consumes 2 frames of right context; feed
    # chunks the way the predictor does (aligned windows)
    t = 64
    speech = jnp.asarray(rng.standard_normal((1, t, 80)) * 0.5, jnp.float32)
    lens = jnp.asarray([t])
    text = jnp.asarray([[1, -1]], jnp.int32)
    tlens = jnp.asarray([1])
    params = m.init(RNG, speech, lens, text, tlens, deterministic=True)

    full_probs, full_lens = m.apply(params, speech, lens,
                                    method='get_encoder_out')
    full_probs = np.asarray(full_probs)[0, :int(full_lens[0])]

    # stream in two windows replicating predictor chunking: window length
    # must satisfy out = (w-1)//2-1)//2; choose w=35 → 8 frames, stride 32
    window, stride = 35, 32
    state = m.init_state(1)
    outs = []
    pos = 0
    while pos + window <= t + 3:
        xs = speech[:, pos:pos + window]
        w = xs.shape[1]
        probs, olens, state = m.apply(params, xs, jnp.asarray([w]), state,
                                      method='get_encoder_out_chunk')
        outs.append(np.asarray(probs)[0, :int(olens[0])])
        pos += stride
    stream_probs = np.concatenate(outs, axis=0)
    n = min(len(stream_probs), len(full_probs))
    np.testing.assert_allclose(stream_probs[:n], full_probs[:n],
                               rtol=2e-3, atol=2e-3)


def test_conformer_nonstreaming_full_context():
    m = _small_conformer(streaming=False)
    speech = jnp.asarray(np.random.default_rng(4).standard_normal(
        (1, 50, 80)), jnp.float32)
    lens = jnp.asarray([50])
    text = jnp.asarray([[1, 2, -1]], jnp.int32)
    tlens = jnp.asarray([2])
    params = m.init({'params': RNG, 'dropout': RNG}, speech, lens, text,
                    tlens, deterministic=True)
    probs, olens = m.apply(params, speech, lens, method='get_encoder_out')
    assert probs.shape == (1, 11, 30)


def test_trainer_streaming_encode_batch_matches_masked_full():
    """trainer._streaming_encode_batch (batched eval-time chunk driver,
    eval.py --streaming_eval) ≡ full forward with the equivalent
    fixed-chunk mask, per stream, up to each stream's out_len — including
    a short stream whose tail window is zero-padded."""
    from ppasr_tpu.trainer import PPASRTrainer

    m = _small_conformer(streaming=True)
    chunk, left_chunks = 16, 16
    sub, ctx = 4, 7
    t_full = (chunk * 3 - 1) * sub + ctx  # 3 full windows
    t_short = t_full - 100
    rng = np.random.default_rng(7)
    speech = jnp.asarray(rng.standard_normal((2, t_full, 80)) * 0.5,
                         jnp.float32)
    speech = speech.at[1, t_short:].set(0.0)
    lens = np.asarray([t_full, t_short], np.int32)
    text = jnp.asarray([[1, 2, -1], [1, 2, -1]], jnp.int32)
    tlens = jnp.asarray([2, 2])
    params = m.init({'params': RNG, 'dropout': RNG, 'chunk': RNG},
                    speech, jnp.asarray(lens), text, tlens,
                    deterministic=False)

    class _Host:  # bare attribute carrier for the unbound trainer method
        use_model = 'conformer'
    host = _Host()
    probs_s, olens_s = PPASRTrainer._streaming_encode_batch(
        host, m, params, np.asarray(speech), lens,
        chunk=chunk, left_chunks=left_chunks)
    probs_s = np.asarray(probs_s)

    def full_probs(sp, ln):
        def fn(mdl, s, l, **kw):
            enc_out, mask = mdl.encoder(s, l, **kw)
            return mdl.ctc.softmax(enc_out), mask
        probs, mask = m.apply(params, sp, ln, decoding_chunk_size=chunk,
                              num_decoding_left_chunks=left_chunks,
                              deterministic=True, method=fn)
        return np.asarray(probs), np.asarray(mask[:, 0].sum(-1))

    probs_f, olens_f = full_probs(speech, jnp.asarray(lens))
    # expected out lens: (len - ctx) // sub + 1
    assert olens_s.tolist() == [(t_full - ctx) // sub + 1,
                                (t_short - ctx) // sub + 1]
    window, stride = (chunk - 1) * sub + ctx, chunk * sub
    for b in range(2):
        # frames from windows fully inside the stream are exact; the final
        # partial window zero-pads inside the attention window — the same
        # approximation the production predictor's flush makes — so the
        # tail frames are checked loosely (argmax), not bitwise
        n_exact = ((int(lens[b]) - window) // stride + 1) * chunk
        n_exact = min(n_exact, int(olens_s[b]), int(olens_f[b]))
        assert n_exact >= chunk
        np.testing.assert_allclose(probs_s[b, :n_exact],
                                   probs_f[b, :n_exact],
                                   rtol=3e-3, atol=3e-3)
        n = min(int(olens_s[b]), int(olens_f[b]))
        agree = np.mean(probs_s[b, :n].argmax(-1) ==
                        probs_f[b, :n].argmax(-1))
        assert agree >= 0.9, agree


def test_streaming_greedy_batch_matches_probs_argmax():
    """streaming_greedy_batch (per-window device argmax, one fixed-shape
    program) must produce exactly argmax/max of streaming_encode_batch's
    probs on every valid frame, for uneven stream lengths."""
    from ppasr_tpu.models.streaming_eval import (streaming_encode_batch,
                                                 streaming_greedy_batch)
    m = _small_conformer(streaming=True)
    t_full = 16 * 3 * 4 + 7
    speech = np.random.default_rng(3).standard_normal(
        (2, t_full, 80)).astype(np.float32) * 0.5
    lens = np.asarray([t_full, t_full - 60], np.int32)
    params = m.init({'params': RNG, 'dropout': RNG, 'chunk': RNG},
                    jnp.asarray(speech), jnp.asarray(lens),
                    jnp.asarray([[1, 2, -1], [1, 2, -1]], jnp.int32),
                    jnp.asarray([2, 2]), deterministic=False)
    probs, ol1 = streaming_encode_batch(m, params, speech, lens)
    ids, mp, ol2 = streaming_greedy_batch(m, params, speech, lens)
    assert (ol1 == ol2).all()
    ref_ids = np.asarray(jnp.argmax(probs, -1))
    ref_mp = np.asarray(jnp.max(probs, -1))
    for b in range(2):
        n = int(ol1[b])
        assert (ids[b, :n] == ref_ids[b, :n]).all()
        np.testing.assert_allclose(mp[b, :n], ref_mp[b, :n], rtol=1e-5)
