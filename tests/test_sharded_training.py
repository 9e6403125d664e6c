"""Distributed-training correctness on the virtual 8-device mesh.

The DP×TP-sharded train step must be numerically equivalent to the
single-device step (GSPMD inserts the gradient psum / TP collectives —
SURVEY.md §2.2); gradient accumulation must match one big batch. Dropout
rates are zeroed so the comparison is exact up to float reassociation.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from ppasr_tpu.models.factory import build_model
from ppasr_tpu.parallel.mesh import (batch_shardings, make_mesh,
                                     param_shardings)
from ppasr_tpu.train_state import TrainState, make_train_step

VOCAB = 64
DIM = 20


def _tiny_model(streaming=True):
    return build_model(
        'conformer', DIM, VOCAB, streaming=streaming,
        encoder_conf=dict(output_size=32, attention_heads=4,
                          linear_units=64, num_blocks=2,
                          cnn_module_kernel=7, dropout_rate=0.0,
                          positional_dropout_rate=0.0,
                          attention_dropout_rate=0.0),
        decoder_conf=dict(attention_heads=2, linear_units=64,
                          num_blocks=1, r_num_blocks=1,
                          dropout_rate=0.0, positional_dropout_rate=0.0,
                          self_attention_dropout_rate=0.0,
                          src_attention_dropout_rate=0.0),
        model_conf=dict(ctc_weight=0.5, lsm_weight=0.1, reverse_weight=0.3))


def _batch(accum, bsz, frames=48, seed=0):
    rng = np.random.default_rng(seed)
    speech = rng.standard_normal((accum, bsz, frames, DIM)).astype(
        np.float32) * 0.3
    text = rng.integers(1, VOCAB - 1, (accum, bsz, 4)).astype(np.int32)
    return {
        'speech': jnp.asarray(speech),
        'speech_lens': jnp.full((accum, bsz), frames, jnp.int32),
        'text': jnp.asarray(text),
        'text_lens': jnp.full((accum, bsz), 4, jnp.int32),
    }


def _init(model, batch):
    rng = jax.random.PRNGKey(0)
    return model.init({'params': rng, 'dropout': rng, 'chunk': rng},
                      batch['speech'][0], batch['speech_lens'][0],
                      batch['text'][0], batch['text_lens'][0],
                      deterministic=False)


def _max_param_diff(a, b):
    diffs = jax.tree.map(
        lambda x, y: float(jnp.abs(jnp.asarray(x, jnp.float32)
                                   - jnp.asarray(y, jnp.float32)).max()),
        a, b)
    return max(jax.tree.leaves(diffs))


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
@pytest.mark.parametrize('n_data,n_model', [(4, 2), (2, 4)])
def test_dp_tp_step_matches_single_device(n_data, n_model):
    """DP4×TP2 and DP2×TP4 (wide TP: 4 heads sharded one-per-device, full
    Megatron column/row pairing + activation constraints) must match the
    single-device step."""
    from ppasr_tpu.parallel.mesh import set_activation_mesh

    model = _tiny_model()
    batch = _batch(accum=1, bsz=4)
    params = _init(model, batch)
    # sgd: the update is linear in the gradient, so float-reassociation
    # noise stays at its own (tiny) scale — adam's g/sqrt(v) first-step
    # update amplifies last-bit gradient differences to full lr scale
    tx = optax.sgd(1e-2)
    rng = jax.random.PRNGKey(7)

    # single device
    state0 = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                        opt_state=tx.init(params))
    step = jax.jit(make_train_step(model, tx, accum_grad=1))
    ref_state, ref_metrics = step(state0, batch, rng)

    # DP × TP mesh: shard params + batch, same step function (fresh jit so
    # the activation constraints trace against the armed mesh)
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    set_activation_mesh(mesh)
    try:
        step = jax.jit(make_train_step(model, tx, accum_grad=1))
        p_shard = param_shardings(mesh, params, tp=True)
        sharded_params = jax.device_put(params, p_shard)
        sh_state = TrainState(step=jnp.zeros((), jnp.int32),
                              params=sharded_params,
                              opt_state=tx.init(sharded_params))
        sh_batch = jax.device_put(batch, batch_shardings(batch_axis=1,
                                                         mesh=mesh,
                                                         batch=batch))
        sh_new, sh_metrics = step(sh_state, sh_batch, rng)

        assert abs(float(ref_metrics['loss'])
                   - float(sh_metrics['loss'])) < 1e-4
        assert _max_param_diff(ref_state.params, sh_new.params) < 1e-4
    finally:
        set_activation_mesh(None)


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_accum_grad_matches_single_big_batch():
    """accum_grad=2 over two equal micro-batches == one 2×-batch step
    (mean-of-means == global mean for equal micro sizes). Covers the
    accum_grad==1 fast path against the accumulation scan. Offline model:
    the dynamic-chunk rng draws once per micro-batch, which is the one
    intended semantic difference between the two schedules."""
    model = _tiny_model(streaming=False)
    big = _batch(accum=1, bsz=4, seed=3)
    micro = jax.tree.map(
        lambda x: x.reshape((2, 2) + x.shape[2:]), big)
    params = _init(model, big)
    tx = optax.sgd(1e-2)  # linear in the gradient: exact mean equivalence
    rng = jax.random.PRNGKey(9)

    s_big = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    out_big, m_big = jax.jit(make_train_step(model, tx, accum_grad=1))(
        s_big, big, rng)

    s_micro = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                         opt_state=tx.init(params))
    out_micro, m_micro = jax.jit(make_train_step(model, tx, accum_grad=2))(
        s_micro, micro, rng)

    assert _max_param_diff(out_big.params, out_micro.params) < 5e-5


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_device_frontend_step_matches_single_device():
    """Raw-audio DP: the device-frontend train step (on-device fbank inside
    the jitted step, ops/frontend.py) sharded over data must match the
    single-device step — the frontend is elementwise per utterance, so the
    batch-sharded fbank/feature path must not change the math."""
    from ppasr_tpu.ops.frontend import make_device_frontend

    model = build_model(
        'conformer', 80, VOCAB, streaming=True,
        encoder_conf=dict(output_size=32, attention_heads=4,
                          linear_units=64, num_blocks=1,
                          cnn_module_kernel=7, dropout_rate=0.0,
                          positional_dropout_rate=0.0,
                          attention_dropout_rate=0.0),
        decoder_conf=dict(attention_heads=2, linear_units=64,
                          num_blocks=1, r_num_blocks=1,
                          dropout_rate=0.0, positional_dropout_rate=0.0,
                          self_attention_dropout_rate=0.0,
                          src_attention_dropout_rate=0.0),
        model_conf=dict(ctc_weight=0.5, lsm_weight=0.1, reverse_weight=0.3))
    # deterministic frontend (no dither/specaug) so single vs sharded
    # compare exactly
    frontend = make_device_frontend(
        {'feature_method': 'fbank', 'n_mels': 80, 'sample_rate': 16000},
        train=False)

    rng_np = np.random.default_rng(3)
    bsz, n_samp = 8, 16000
    wav = (rng_np.standard_normal((1, bsz, n_samp)) * 3000).astype(np.float32)
    text = rng_np.integers(1, VOCAB - 1, (1, bsz, 4)).astype(np.int32)
    batch = {
        'wav': jnp.asarray(wav),
        'wav_lens': jnp.full((1, bsz), n_samp, jnp.int32),
        'text': jnp.asarray(text),
        'text_lens': jnp.full((1, bsz), 4, jnp.int32),
    }
    feat0, flens0 = frontend(batch['wav'][0], batch['wav_lens'][0])
    rng = jax.random.PRNGKey(0)
    params = model.init({'params': rng, 'dropout': rng, 'chunk': rng},
                        feat0, flens0, batch['text'][0],
                        batch['text_lens'][0], deterministic=False)
    tx = optax.sgd(1e-2)
    step_rng = jax.random.PRNGKey(11)

    state0 = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                        opt_state=tx.init(params))
    step = jax.jit(make_train_step(model, tx, accum_grad=1,
                                   frontend=frontend))
    ref_state, ref_metrics = step(state0, batch, step_rng)

    mesh = make_mesh(n_data=8, n_model=1)
    p_shard = param_shardings(mesh, params, tp=False)
    sharded_params = jax.device_put(params, p_shard)
    sh_state = TrainState(step=jnp.zeros((), jnp.int32),
                          params=sharded_params,
                          opt_state=tx.init(sharded_params))
    sh_batch = jax.device_put(batch, batch_shardings(batch_axis=1, mesh=mesh,
                                                     batch=batch))
    step = jax.jit(make_train_step(model, tx, accum_grad=1,
                                   frontend=frontend))
    sh_new, sh_metrics = step(sh_state, sh_batch, step_rng)

    assert abs(float(ref_metrics['loss'])
               - float(sh_metrics['loss'])) < 1e-4
    assert _max_param_diff(ref_state.params, sh_new.params) < 1e-4
