"""int8 weight quantization roundtrip."""
import numpy as np
import jax
import jax.numpy as jnp

from ppasr_tpu.utils.quant import dequantize_params, quantize_params


def test_quant_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    params = {'params': {
        'dense': {'kernel': jnp.asarray(
            rng.standard_normal((64, 128)).astype(np.float32) * 0.1),
            'bias': jnp.asarray(rng.standard_normal(128).astype(np.float32))},
        'norm': {'scale': jnp.ones((128,), jnp.float32)},
    }}
    blob = quantize_params(params)
    assert blob['q']  # kernel quantized
    assert any('bias' in k for k in blob['raw'])  # bias kept raw
    restored = dequantize_params(blob, params)
    k0 = np.asarray(params['params']['dense']['kernel'])
    k1 = np.asarray(restored['params']['dense']['kernel'])
    # per-channel int8: relative error within 1/127 of the channel max
    ch_max = np.abs(k0).max(axis=0)
    assert (np.abs(k1 - k0) <= ch_max / 127.0 + 1e-7).all()
    # raw leaves exact
    np.testing.assert_array_equal(
        np.asarray(restored['params']['dense']['bias']),
        np.asarray(params['params']['dense']['bias']))


def test_quant_size_reduction():
    rng = np.random.default_rng(1)
    params = {'k': jnp.asarray(rng.standard_normal((256, 256)),
                               jnp.float32)}
    # wrap under a 'kernel' name so it quantizes
    params = {'layer': {'kernel': params['k']}}
    blob = quantize_params(params)
    q_bytes = sum(v.nbytes for v in blob['q'].values()) \
        + sum(v.nbytes for v in blob['s'].values())
    f_bytes = 256 * 256 * 4
    assert q_bytes < f_bytes / 3.5
