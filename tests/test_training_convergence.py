"""Optimization sanity: every model family's training step must reduce the
loss on a small memorization batch (catches wiring/gradient regressions)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from ppasr_tpu.models.factory import build_model
from ppasr_tpu.train_state import TrainState, make_train_step

RNG = jax.random.PRNGKey(0)

FAMILIES = {
    'deepspeech2': dict(encoder_conf={'num_rnn_layers': 1, 'rnn_size': 64},
                        decoder_conf={}, model_conf={}),
    'conformer': dict(
        encoder_conf={'output_size': 32, 'attention_heads': 2,
                      'linear_units': 64, 'num_blocks': 1,
                      'cnn_module_kernel': 7},
        decoder_conf={'attention_heads': 2, 'linear_units': 64,
                      'num_blocks': 1, 'r_num_blocks': 0},
        model_conf={'ctc_weight': 1.0}),
    'squeezeformer': dict(
        encoder_conf={'encoder_dim': 32, 'output_size': 32,
                      'attention_heads': 2, 'num_blocks': 2,
                      'reduce_idx': 0, 'recover_idx': 1,
                      'feed_forward_expansion_factor': 2,
                      'cnn_module_kernel': 7},
        decoder_conf={'attention_heads': 2, 'linear_units': 64,
                      'num_blocks': 1, 'r_num_blocks': 0},
        model_conf={'ctc_weight': 1.0}),
    'efficient_conformer': dict(
        encoder_conf={'output_size': 32, 'attention_heads': 2,
                      'linear_units': 64, 'num_blocks': 2,
                      'cnn_module_kernel': 7,
                      'efficient_conf': {'stride_layer_idx': [0],
                                         'stride': [2],
                                         'group_layer_idx': [0],
                                         'group_size': 3,
                                         'stride_kernel': True}},
        decoder_conf={'attention_heads': 2, 'linear_units': 64,
                      'num_blocks': 1, 'r_num_blocks': 0},
        model_conf={'ctc_weight': 1.0}),
}


@pytest.mark.parametrize('family', sorted(FAMILIES))
def test_loss_decreases(family):
    conf = FAMILIES[family]
    model = build_model(family, 80, 12, streaming=True, **conf)
    rng = np.random.default_rng(1)
    speech = jnp.asarray(rng.standard_normal((1, 2, 64, 80)) * 0.3,
                         jnp.float32)
    lens = jnp.full((1, 2), 64, jnp.int32)
    text = jnp.asarray([[[1, 2, 3, -1], [4, 5, -1, -1]]], jnp.int32)
    tlens = jnp.asarray([[3, 2]], jnp.int32)
    params = model.init({'params': RNG, 'dropout': RNG, 'chunk': RNG},
                        speech[0], lens[0], text[0], tlens[0],
                        deterministic=False)
    tx = optax.adam(3e-3)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))
    step_fn = jax.jit(make_train_step(model, tx, accum_grad=1))
    batch = {'speech': speech, 'speech_lens': lens, 'text': text,
             'text_lens': tlens}
    losses = []
    for i in range(25):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics['loss']))
    assert np.isfinite(losses).all(), losses
    assert min(losses[-5:]) < losses[0] * 0.7, \
        f"{family}: {losses[0]:.3f} → {losses[-1]:.3f}"
