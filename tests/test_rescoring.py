"""Attention rescoring: hypothesis extraction, decoder scoring math, and the
end-to-end rescoring decoder (beyond-reference capability — see
ppasr_tpu/models/rescore.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from ppasr_tpu.decoders.beam_search_jax import (
    JaxBeamSearchDecoder, all_hypotheses, beam_state_to_results)
from ppasr_tpu.decoders.rescoring import AttentionRescoringDecoder
from ppasr_tpu.models.factory import build_model
from ppasr_tpu.ops.masks import make_non_pad_mask

VOCAB = ['<blank>', '<unk>'] + [chr(ord('a') + i) for i in range(10)] \
    + ['<eos>']
V = len(VOCAB)


def tiny_model():
    model = build_model(
        'conformer', 16, V, streaming=False,
        encoder_conf=dict(output_size=16, attention_heads=2,
                          linear_units=32, num_blocks=1,
                          cnn_module_kernel=7),
        decoder_conf=dict(attention_heads=2, linear_units=32,
                          num_blocks=1, r_num_blocks=1),
        model_conf=dict(ctc_weight=0.3, lsm_weight=0.1, reverse_weight=0.3))
    rng = jax.random.PRNGKey(0)
    params = model.init({'params': rng, 'dropout': rng, 'chunk': rng},
                        jnp.zeros((1, 32, 16), jnp.float32),
                        jnp.asarray([32]),
                        jnp.asarray([[1, 2, -1]], jnp.int32),
                        jnp.asarray([2]), deterministic=True)
    return model, params


def peaky_probs(rng, b, t):
    logits = rng.standard_normal((b, t, V)).astype(np.float32)
    blank_frames = rng.random((b, t)) < 0.5
    logits[..., 0] = np.where(blank_frames, 8.0, -2.0)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    return p / p.sum(-1, keepdims=True)


def test_all_hypotheses_best_matches_packed_best():
    rng = np.random.default_rng(0)
    probs = peaky_probs(rng, 2, 18)
    dec = JaxBeamSearchDecoder(VOCAB, beam_size=6, cutoff_prob=1.0,
                               cutoff_top_n=V, alpha=0, beta=0,
                               blank_skip_threshold=1.0)
    states = dec.decode_batch_states(jnp.asarray(probs),
                                     np.asarray([18, 12]))
    hyps, lens, scores = all_hypotheses(states, max_hyp_len=16)
    best_results = beam_state_to_results(states, VOCAB)
    for b in range(2):
        k = int(jnp.argmax(scores[b]))
        text = ''.join(VOCAB[i] for i in np.asarray(hyps[b, k])
                       [:int(lens[b, k])])
        assert text == best_results[b][1]
        assert abs(float(scores[b, k]) - best_results[b][0]) < 1e-4


def test_rescore_scores_match_manual_gather():
    """attention_rescore_scores must equal an independently coded
    log-softmax gather over the decoder's raw logits."""
    model, params = tiny_model()
    rng = np.random.default_rng(1)
    speech = jnp.asarray(rng.standard_normal((1, 32, 16)) * 0.3, jnp.float32)
    enc_out, probs, olens = model.apply(params, speech, jnp.asarray([32]),
                                        method='encode_for_rescore')

    hyps = jnp.asarray([[[3, 4, 5, 0], [6, 7, 0, 0]]], jnp.int32)  # [1,2,4]
    hyp_lens = jnp.asarray([[3, 2]], jnp.int32)
    scores = model.apply(params, enc_out, olens, hyps, hyp_lens,
                         method='attention_rescore_scores')
    assert scores.shape == (1, 2)

    # manual recomputation per hypothesis through the raw decoder submodule
    bound = model.bind(params)
    sos = eos = V - 1
    t = enc_out.shape[1]
    memory_mask = make_non_pad_mask(olens, t)[:, None, :]
    rw = 0.3
    for k, (hyp, ln) in enumerate([([3, 4, 5], 3), ([6, 7], 2)]):
        ys_in = jnp.asarray([[sos] + hyp], jnp.int32)
        r_ys_in = jnp.asarray([[sos] + hyp[::-1]], jnp.int32)
        dec_out, r_dec_out = bound.decoder(
            enc_out, memory_mask, ys_in, jnp.asarray([ln + 1]),
            r_ys_in_pad=r_ys_in, reverse_weight=rw, deterministic=True)
        lp = jax.nn.log_softmax(np.asarray(dec_out, np.float32), axis=-1)
        r_lp = jax.nn.log_softmax(np.asarray(r_dec_out, np.float32),
                                  axis=-1)
        tgt = hyp + [eos]
        r_tgt = hyp[::-1] + [eos]
        l2r = sum(float(lp[0, i, tok]) for i, tok in enumerate(tgt))
        r2l = sum(float(r_lp[0, i, tok]) for i, tok in enumerate(r_tgt))
        expected = (1 - rw) * l2r + rw * r2l
        assert abs(float(scores[0, k]) - expected) < 1e-3, \
            (k, float(scores[0, k]), expected)


def test_rescoring_decoder_end_to_end():
    model, params = tiny_model()
    rng = np.random.default_rng(2)
    speech = jnp.asarray(rng.standard_normal((2, 32, 16)) * 0.3, jnp.float32)
    lens = jnp.asarray([32, 24])
    enc_out, probs, olens = model.apply(params, speech, lens,
                                        method='encode_for_rescore')
    dec = AttentionRescoringDecoder(
        model, VOCAB, ctc_weight=0.3, max_hyp_len=16, beam_size=5,
        cutoff_prob=1.0, cutoff_top_n=V, alpha=0, beta=0,
        blank_skip_threshold=1.0)
    results = dec.decode_batch_rescore(params, enc_out, probs,
                                       np.asarray(olens))
    assert len(results) == 2
    for score, text in results:
        assert isinstance(score, float) and np.isfinite(score)
        assert isinstance(text, str)


def test_zoo_models_rescore():
    """Squeezeformer and EfficientConformer expose the same rescoring
    surface (shared helper, own encoders)."""
    rng = np.random.default_rng(4)
    speech = jnp.asarray(rng.standard_normal((1, 64, 16)) * 0.3, jnp.float32)
    lens = jnp.asarray([64])
    zoo = {
        'squeezeformer': dict(
            encoder_conf=dict(encoder_dim=16, output_size=16,
                              attention_heads=2, num_blocks=2, reduce_idx=0,
                              recover_idx=1,
                              feed_forward_expansion_factor=2,
                              cnn_module_kernel=7),
            decoder_conf=dict(attention_heads=2, linear_units=32,
                              num_blocks=1, r_num_blocks=1)),
        'efficient_conformer': dict(
            encoder_conf=dict(output_size=16, attention_heads=2,
                              linear_units=32, num_blocks=2,
                              cnn_module_kernel=7,
                              efficient_conf=dict(stride_layer_idx=[0],
                                                  stride=[2],
                                                  group_layer_idx=[])),
            decoder_conf=dict(attention_heads=2, linear_units=32,
                              num_blocks=1, r_num_blocks=1)),
    }
    for name, confs in zoo.items():
        model = build_model(name, 16, V, streaming=False,
                            model_conf=dict(ctc_weight=0.3, lsm_weight=0.1,
                                            reverse_weight=0.3), **confs)
        rngk = jax.random.PRNGKey(0)
        params = model.init({'params': rngk, 'dropout': rngk, 'chunk': rngk},
                            jnp.zeros((1, 64, 16), jnp.float32),
                            jnp.asarray([64]),
                            jnp.asarray([[1, 2, -1]], jnp.int32),
                            jnp.asarray([2]), deterministic=True)
        enc_out, probs, olens = model.apply(params, speech, lens,
                                            method='encode_for_rescore')
        dec = AttentionRescoringDecoder(
            model, VOCAB, ctc_weight=0.3, max_hyp_len=16, beam_size=4,
            cutoff_prob=1.0, cutoff_top_n=V, alpha=0, beta=0,
            blank_skip_threshold=1.0)
        results = dec.decode_batch_rescore(params, enc_out, probs,
                                           np.asarray(olens))
        assert len(results) == 1 and np.isfinite(results[0][0]), name


def test_huge_ctc_weight_recovers_beam_best():
    """With ctc_weight >> att scale, rescoring must select the CTC-best
    hypothesis — ties the two pipelines together."""
    model, params = tiny_model()
    rng = np.random.default_rng(3)
    speech = jnp.asarray(rng.standard_normal((2, 32, 16)) * 0.3, jnp.float32)
    lens = jnp.asarray([32, 32])
    enc_out, probs, olens = model.apply(params, speech, lens,
                                        method='encode_for_rescore')
    beam_conf = dict(beam_size=5, cutoff_prob=1.0, cutoff_top_n=V,
                     alpha=0, beta=0, blank_skip_threshold=1.0)
    plain = JaxBeamSearchDecoder(VOCAB, **beam_conf)
    plain_results = plain.decode_batch(probs, np.asarray(olens))
    dec = AttentionRescoringDecoder(model, VOCAB, ctc_weight=1e6,
                                    max_hyp_len=16, **beam_conf)
    rescored = dec.decode_batch_rescore(params, enc_out, probs,
                                        np.asarray(olens))
    for (ps, pt), (rs, rt) in zip(plain_results, rescored):
        assert pt == rt
