"""Device training frontend (ops/frontend.py): raw audio → fbank →
SpecAugment inside jit. Parity with the host featurize path
(reference reader.py:52-77 semantics) and train-step integration."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppasr_tpu.data.audio import AudioSegment
from ppasr_tpu.ops import fbank as F
from ppasr_tpu.ops.frontend import (make_device_frontend,
                                    spec_augment_device)

FIXTURE = "/root/reference/dataset/test.wav"
RNG = jax.random.PRNGKey(7)


def _int16_samples():
    seg = AudioSegment.from_file(FIXTURE)
    seg.normalize(target_db=-20)
    return seg.to('int16').astype(np.float32)


# ---------------------------------------------------------------------------
# fbank dither
# ---------------------------------------------------------------------------

def test_fbank_jax_dither_zero_is_identity():
    samples = _int16_samples()[:16000]
    wav = jnp.asarray(samples)[None, :]
    lens = jnp.asarray([len(samples)])
    a, _ = F.fbank_jax(wav, lens)
    b, _ = F.fbank_jax(wav, lens, dither=0.0, dither_rng=RNG)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fbank_jax_dither_perturbs_slightly():
    samples = _int16_samples()[:16000]
    wav = jnp.asarray(samples)[None, :]
    lens = jnp.asarray([len(samples)])
    a, _ = F.fbank_jax(wav, lens)
    b, _ = F.fbank_jax(wav, lens, dither=1.0, dither_rng=RNG)
    d = np.abs(np.asarray(a) - np.asarray(b))
    assert d.max() > 0  # it did something
    # dither of 1.0 on int16-scaled speech is a tiny perturbation of
    # log-mel except in near-silent bins
    assert np.quantile(d, 0.9) < 0.5


# ---------------------------------------------------------------------------
# device SpecAugment
# ---------------------------------------------------------------------------

def _feat_batch():
    rng = np.random.default_rng(3)
    feat = rng.standard_normal((2, 120, 40)).astype(np.float32) + 5.0
    lens = np.asarray([120, 73])
    # zero padding region like the real pipeline
    feat[1, 73:] = 0.0
    return jnp.asarray(feat), jnp.asarray(lens)


def test_specaug_masks_and_padding_untouched():
    feat, lens = _feat_batch()
    out = np.asarray(spec_augment_device(
        feat, lens, RNG, max_time_warp=0, n_freq_masks=2, n_time_masks=2,
        replace_with_zero=True))
    # padding region of the short utterance stays exactly zero
    np.testing.assert_array_equal(out[1, 73:], np.zeros((47, 40)))
    # masks introduced zeros inside the valid region (input has none)
    assert (np.asarray(feat[0]) != 0).all()
    assert (out[0] == 0).any()


def test_specaug_mean_fill():
    feat, lens = _feat_batch()
    out = np.asarray(spec_augment_device(
        feat, lens, jax.random.PRNGKey(12), max_time_warp=0,
        n_freq_masks=2, n_time_masks=2, replace_with_zero=False))
    vals = np.unique(out[0])
    mean0 = float(np.asarray(feat[0]).mean())
    # the fill value (per-utterance mean over valid frames) appears in the
    # masked cells
    assert np.any(np.abs(vals - mean0) < 1e-3)


def test_specaug_warp_preserves_shape_and_padding():
    feat, lens = _feat_batch()
    out = np.asarray(spec_augment_device(
        feat, lens, jax.random.PRNGKey(5), max_time_warp=5,
        n_freq_masks=0, n_time_masks=0))
    assert out.shape == feat.shape
    np.testing.assert_array_equal(out[1, 73:], np.zeros((47, 40)))
    # warp is an interpolation: values stay within the input's range
    assert out[0].min() >= float(np.asarray(feat[0]).min()) - 1e-4
    assert out[0].max() <= float(np.asarray(feat[0]).max()) + 1e-4
    # and it actually moved frames
    assert np.abs(out[0] - np.asarray(feat[0])).max() > 1e-3


def test_specsub_copies_earlier_frames():
    feat, lens = _feat_batch()
    out = np.asarray(spec_augment_device(
        feat, lens, jax.random.PRNGKey(9), max_time_warp=0,
        n_freq_masks=0, n_time_masks=0,
        spec_sub_max_t=20, spec_sub_num=3))
    x = np.asarray(feat[0])
    changed = np.where(np.any(out[0] != x, axis=1))[0]
    assert changed.size > 0
    # every substituted frame equals SOME earlier original frame
    for t in changed[:10]:
        assert any(np.allclose(out[0, t], x[s], atol=1e-5)
                   for s in range(0, t + 1))


def test_specaug_jits():
    feat, lens = _feat_batch()
    fn = jax.jit(lambda f, l, r: spec_augment_device(
        f, l, r, max_time_warp=5, n_freq_masks=2, n_time_masks=2,
        spec_sub_max_t=20, spec_sub_num=2))
    out = fn(feat, lens, RNG)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# full frontend
# ---------------------------------------------------------------------------

def test_frontend_deterministic_matches_host_fbank():
    samples = _int16_samples()
    frontend = make_device_frontend({'feature_method': 'fbank',
                                     'n_mels': 80, 'sample_rate': 16000})
    wav = jnp.asarray(samples)[None, :]
    lens = jnp.asarray([len(samples)])
    feat, flens = frontend(wav, lens, rng=None, deterministic=True)
    ref = F.fbank_numpy(samples, 16000, num_mel_bins=80)
    assert int(flens[0]) == ref.shape[0]
    diff = np.abs(np.asarray(feat[0, :ref.shape[0]]) - ref)
    assert diff.mean() < 0.02 and diff.max() < 2.0


def test_frontend_rejects_non_fbank():
    with pytest.raises(ValueError):
        make_device_frontend({'feature_method': 'mfcc'})


def test_frontend_applies_specaug_from_config():
    samples = _int16_samples()[:32000]
    aug = [{'type': 'specaug', 'aug_type': 'feature', 'prob': 1.0,
            'params': {'inplace': True, 'max_time_warp': 5,
                       'max_t_ratio': 0.05, 'n_freq_masks': 2,
                       'max_f_ratio': 0.15, 'n_time_masks': 2,
                       'replace_with_zero': False}},
           {'type': 'specsub', 'aug_type': 'feature', 'prob': 1.0,
            'params': {'max_t': 30, 'num_t_sub': 3}}]
    frontend = make_device_frontend({'feature_method': 'fbank',
                                     'n_mels': 80, 'sample_rate': 16000},
                                    augment_configs=aug, train=True)
    wav = jnp.asarray(samples)[None, :]
    lens = jnp.asarray([len(samples)])
    det, _ = frontend(wav, lens, rng=None, deterministic=True)
    aug_out, _ = frontend(wav, lens, rng=RNG, deterministic=False)
    # augmentation changed the features, finitely
    assert np.isfinite(np.asarray(aug_out)).all()
    assert np.abs(np.asarray(aug_out) - np.asarray(det)).max() > 0.01


# ---------------------------------------------------------------------------
# train-step integration (raw batches)
# ---------------------------------------------------------------------------

def _tiny_model(input_dim=80, vocab=30):
    from ppasr_tpu.models.factory import build_model
    return build_model(
        'conformer', input_size=input_dim, vocab_size=vocab, streaming=True,
        encoder_conf={'output_size': 32, 'attention_heads': 2,
                      'linear_units': 48, 'num_blocks': 1,
                      'cnn_module_kernel': 7},
        decoder_conf={'attention_heads': 2, 'linear_units': 48,
                      'num_blocks': 1, 'r_num_blocks': 1},
        model_conf={'ctc_weight': 0.5, 'lsm_weight': 0.1,
                    'reverse_weight': 0.3})


def test_train_step_raw_mode_runs_and_matches_feature_mode():
    import optax
    from ppasr_tpu.train_state import (create_train_state, make_train_step)

    samples = _int16_samples()[:32000]
    bsz = 2
    wav = np.zeros((bsz, len(samples)), np.float32)
    wav[0] = samples
    wav[1, :24000] = samples[:24000]
    wav_lens = np.asarray([len(samples), 24000], np.int64)
    text = np.asarray([[1, 2, 3, -1], [2, 3, -1, -1]], np.int32)
    text_lens = np.asarray([3, 2], np.int64)

    model = _tiny_model()
    init_wav_feat, _ = F.fbank_jax(jnp.asarray(wav),
                                   jnp.asarray(wav_lens))
    params = model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1),
         'chunk': jax.random.PRNGKey(2)},
        init_wav_feat, jnp.asarray([init_wav_feat.shape[1]] * bsz),
        jnp.asarray(text), jnp.asarray(text_lens), deterministic=False)
    tx = optax.sgd(0.0)  # lr 0: params unchanged, loss comparable
    state = create_train_state(params, tx)

    # frontend WITHOUT dither/specaug → features are deterministic, so the
    # raw-mode loss must equal the feature-mode loss on the same batch
    frontend = make_device_frontend({'feature_method': 'fbank',
                                     'n_mels': 80, 'sample_rate': 16000},
                                    train=False)
    raw_step = jax.jit(make_train_step(model, tx, 1, frontend=frontend))
    feat_step = jax.jit(make_train_step(model, tx, 1))

    raw_batch = {'wav': jnp.asarray(wav)[None],
                 'wav_lens': jnp.asarray(wav_lens)[None],
                 'text': jnp.asarray(text)[None],
                 'text_lens': jnp.asarray(text_lens)[None]}
    feat, feat_lens = F.fbank_jax(jnp.asarray(wav), jnp.asarray(wav_lens))
    feat_batch = {'speech': feat[None], 'speech_lens': feat_lens[None],
                  'text': jnp.asarray(text)[None],
                  'text_lens': jnp.asarray(text_lens)[None]}

    step_rng = jax.random.PRNGKey(42)
    _, m_raw = raw_step(state, raw_batch, step_rng)
    state2 = create_train_state(params, tx)
    _, m_feat = feat_step(state2, feat_batch, step_rng)
    assert np.isfinite(float(m_raw['loss']))
    np.testing.assert_allclose(float(m_raw['loss']),
                               float(m_feat['loss']), rtol=1e-3)


def test_collate_raw_and_dataset_raw_mode(tmp_path):
    import wave
    from ppasr_tpu.data.dataset import ASRDataset, collate_fn

    sr = 16000
    wav_dir = tmp_path / 'wavs'
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    manifest = tmp_path / 'manifest.train'
    vocab = tmp_path / 'vocab.txt'
    vocab.write_text('<blank>\t9\n<unk>\t9\n你\t9\n好\t9\n<eos>\t9\n',
                     encoding='utf-8')
    import json
    with open(manifest, 'w', encoding='utf-8') as f:
        for i, dur in enumerate([0.8, 1.3]):
            n = int(sr * dur)
            pcm = (rng.standard_normal(n) * 3000).astype(np.int16)
            p = wav_dir / f'{i}.wav'
            with wave.open(str(p), 'wb') as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sr)
                w.writeframes(pcm.tobytes())
            f.write(json.dumps({'audio_filepath': str(p), 'duration': dur,
                                'text': '你好'}, ensure_ascii=False) + '\n')

    ds = ASRDataset(str(manifest), str(vocab),
                    preprocess_conf={'feature_method': 'fbank', 'n_mels': 80,
                                     'sample_rate': sr},
                    min_duration=0, max_duration=-1, return_raw=True)
    w0, t0 = ds[0]
    assert w0.ndim == 1 and w0.dtype == np.float32
    assert np.abs(w0).max() > 100  # int16-scaled
    batch = collate_fn([ds[0], ds[1]], shuffle=False)
    wavs, labels, wav_lens, label_lens = batch
    assert wavs.ndim == 2 and wavs.shape[0] == 2
    assert wavs.shape[1] % (64 * 160) == 0
    assert int(wav_lens[1]) == int(sr * 1.3)
    assert labels.shape[0] == 2 and int(label_lens[0]) == 2
