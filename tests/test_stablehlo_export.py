"""StableHLO export/serve roundtrip: the InferencePredictor must produce
identical posteriors from the serialized computation (no model code) and
from the jitted model zoo path, offline and streaming."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import serialization

from ppasr_tpu.infer_utils.inference_predictor import InferencePredictor
from ppasr_tpu.infer_utils.stablehlo_export import export_stablehlo
from ppasr_tpu.models.factory import build_model

DIM, VOCAB = 80, 60


@pytest.fixture(scope='module')
def artifact(tmp_path_factory):
    out = tmp_path_factory.mktemp('shlo_infer')
    enc = dict(output_size=32, attention_heads=2, linear_units=64,
               num_blocks=2, cnn_module_kernel=7)
    dec = dict(attention_heads=2, linear_units=64, num_blocks=1,
               r_num_blocks=1)
    mc = dict(ctc_weight=0.3, lsm_weight=0.1, reverse_weight=0.3)
    model = build_model('conformer', DIM, VOCAB, streaming=True,
                        encoder_conf=enc, decoder_conf=dec, model_conf=mc)
    rng = jax.random.PRNGKey(0)
    params = model.init({'params': rng, 'dropout': rng, 'chunk': rng},
                        jnp.zeros((1, 64, DIM)), jnp.asarray([64]),
                        jnp.asarray([[1, -1]], jnp.int32), jnp.asarray([1]),
                        deterministic=False)
    with open(out / 'model.msgpack', 'wb') as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    with open(out / 'inference.json', 'w') as f:
        json.dump({'use_model': 'conformer', 'streaming': True,
                   'input_dim': DIM, 'vocab_size': VOCAB,
                   'encoder_conf': enc, 'decoder_conf': dec,
                   'model_conf': mc}, f)
    export_stablehlo(model, params, str(out), 'conformer', DIM)
    return str(out)


def test_offline_posteriors_match(artifact):
    assert os.path.exists(os.path.join(artifact, 'offline.stablehlo'))
    shlo = InferencePredictor(artifact)            # auto-detects artifacts
    code = InferencePredictor(artifact, use_stablehlo=False)
    assert shlo.stablehlo and shlo.model is None   # no model code in play
    assert not code.stablehlo
    rng = np.random.default_rng(0)
    speech = rng.standard_normal((2, 96, DIM)).astype(np.float32) * 0.3
    lens = np.asarray([96, 70], np.int32)
    p1, l1 = shlo.predict(speech, lens)
    p2, l2 = code.predict(speech, lens)
    np.testing.assert_array_equal(l1, l2)
    assert float(np.abs(p1 - p2).max()) < 1e-6
    # non-multiple-of-16 T: the stablehlo path pads (lens-masked) — valid
    # rows must still match the code path exactly
    speech70 = speech[:, :70]
    lens70 = np.asarray([70, 58], np.int32)
    p1, l1 = shlo.predict(speech70, lens70)
    p2, l2 = code.predict(speech70, lens70)
    np.testing.assert_array_equal(l1, l2)
    for i, n in enumerate(l1):
        assert float(np.abs(p1[i, :n] - p2[i, :n]).max()) < 1e-6


def test_streaming_chunks_match(artifact):
    shlo = InferencePredictor(artifact)
    code = InferencePredictor(artifact, use_stablehlo=False)
    rng = np.random.default_rng(1)
    for i in range(3):
        chunk = rng.standard_normal((1, 67, DIM)).astype(np.float32) * 0.3
        p1 = shlo.predict_chunk_conformer(chunk, required_cache_size=64)
        p2 = code.predict_chunk_conformer(chunk, required_cache_size=64)
        assert float(np.abs(p1 - p2).max()) < 1e-6, f"chunk {i}"
    shlo.reset_stream()
    code.reset_stream()


def test_force_flag_errors_without_artifacts(tmp_path, artifact):
    import shutil
    bare = tmp_path / 'bare'
    shutil.copytree(artifact, bare)
    os.remove(bare / 'offline.stablehlo')
    os.remove(bare / 'chunk.stablehlo')
    with pytest.raises(FileNotFoundError):
        InferencePredictor(str(bare), use_stablehlo=True)
    # and auto mode falls back to the code path cleanly
    pred = InferencePredictor(str(bare))
    assert not pred.stablehlo


@pytest.mark.parametrize('family', ['deepspeech2', 'squeezeformer'])
def test_other_families_roundtrip(tmp_path, family):
    """The zoo's other streaming-state layouts (h/c for DS2, per-scale
    caches for squeezeformer) must survive the tuple-flattened export."""
    if family == 'deepspeech2':
        model = build_model(family, DIM, VOCAB, streaming=True,
                            encoder_conf=dict(rnn_size=32, num_rnn_layers=2))
    else:
        model = build_model(
            family, DIM, VOCAB, streaming=True,
            encoder_conf=dict(encoder_dim=64, output_size=64,
                              attention_heads=2, num_blocks=6,
                              reduce_idx=2, recover_idx=4,
                              feed_forward_expansion_factor=2,
                              cnn_module_kernel=15),
            decoder_conf=dict(attention_heads=2, linear_units=64,
                              num_blocks=1, r_num_blocks=1),
            model_conf=dict(ctc_weight=0.3, lsm_weight=0.1,
                            reverse_weight=0.3))
    rng = jax.random.PRNGKey(0)
    params = model.init({'params': rng, 'dropout': rng, 'chunk': rng},
                        jnp.zeros((1, 64, DIM)), jnp.asarray([64]),
                        jnp.asarray([[1, -1]], jnp.int32), jnp.asarray([1]),
                        deterministic=False)
    export_stablehlo(model, params, str(tmp_path), family, DIM,
                     chunk_cache=32)
    from ppasr_tpu.infer_utils.stablehlo_export import (
        load_exported, zero_state_from_exported)
    exp_off, exp_chunk = load_exported(str(tmp_path))
    rngd = np.random.default_rng(0)
    speech = jnp.asarray(rngd.standard_normal((1, 96, DIM)), jnp.float32)
    lens = jnp.asarray([96], jnp.int32)
    out = exp_off.call(params, speech, lens)
    ref = model.apply(params, speech, lens, method='get_encoder_out')
    assert float(jnp.abs(out[0] - ref[0]).max()) < 1e-6
    chunk = jnp.asarray(rngd.standard_normal((1, 67, DIM)), jnp.float32)
    if family == 'deepspeech2':
        st = zero_state_from_exported(exp_chunk, 3)
        probs, olens, _ = exp_chunk.call(params, chunk, jnp.asarray([67]), st)
        rp, rl, _ = model.apply(params, chunk, jnp.asarray([67]),
                                model.init_state(1),
                                method='get_encoder_out_chunk')
    else:
        st = zero_state_from_exported(exp_chunk, 2)
        probs, _ = exp_chunk.call(params, chunk, st)
        rp, _ = model.apply(params, chunk, model.init_state(1, 32),
                            method='get_encoder_out_chunk')
    assert float(jnp.abs(probs - rp).max()) < 1e-6


def test_short_and_padded_inputs(artifact):
    """T < 32 (below the exported tb>=2 bound) must be padded, not crash."""
    shlo = InferencePredictor(artifact)
    code = InferencePredictor(artifact, use_stablehlo=False)
    rng = np.random.default_rng(2)
    speech = rng.standard_normal((1, 15, DIM)).astype(np.float32) * 0.3
    lens = np.asarray([15], np.int32)
    p1, l1 = shlo.predict(speech, lens)
    p2, l2 = code.predict(speech, lens)
    np.testing.assert_array_equal(l1, l2)
    n = int(l1[0])
    assert float(np.abs(p1[0, :n] - p2[0, :n]).max()) < 1e-6


def test_streaming_dir_without_chunk_artifact(tmp_path, artifact):
    """Offline-only artifacts on a streaming model: auto mode must fall
    back to the code path (stablehlo mode would break predict_chunk_*)."""
    import shutil
    d = tmp_path / 'no_chunk'
    shutil.copytree(artifact, d)
    os.remove(d / 'chunk.stablehlo')
    pred = InferencePredictor(str(d))
    assert not pred.stablehlo
    with pytest.raises(FileNotFoundError):
        InferencePredictor(str(d), use_stablehlo=True)
