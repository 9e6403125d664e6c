"""Mask semantics vs the reference's documented examples
(ppasr/model_utils/utils/mask.py docstrings + loop oracle)."""
import numpy as np
import jax
import jax.numpy as jnp

from ppasr_tpu.ops import masks as M


def _chunk_mask_oracle(size, chunk_size, num_left_chunks):
    ret = np.zeros((size, size), bool)
    for i in range(size):
        if num_left_chunks < 0:
            start = 0
        else:
            start = max(0, (i // chunk_size - num_left_chunks) * chunk_size)
        ending = min(size, (i // chunk_size + 1) * chunk_size)
        ret[i, start:ending] = True
    return ret


def test_pad_masks():
    lens = jnp.array([5, 3, 2])
    out = np.asarray(M.make_pad_mask(lens, 5))
    exp = np.array([[0, 0, 0, 0, 0], [0, 0, 0, 1, 1], [0, 0, 1, 1, 1]], bool)
    np.testing.assert_array_equal(out, exp)
    np.testing.assert_array_equal(np.asarray(M.make_non_pad_mask(lens, 5)), ~exp)


def test_subsequent_mask():
    out = np.asarray(M.subsequent_mask(3))
    np.testing.assert_array_equal(out, np.tril(np.ones((3, 3), bool)))


def test_subsequent_chunk_mask_matches_oracle():
    for size, chunk, left in [(4, 2, -1), (10, 3, -1), (10, 3, 1), (16, 4, 2), (7, 25, 0)]:
        out = np.asarray(M.subsequent_chunk_mask(size, chunk, left))
        np.testing.assert_array_equal(out, _chunk_mask_oracle(size, chunk, left),
                                      err_msg=f"size={size} chunk={chunk} left={left}")


def test_subsequent_chunk_mask_traced_args():
    f = jax.jit(lambda c, l: M.subsequent_chunk_mask(12, c, l))
    out = np.asarray(f(jnp.int32(3), jnp.int32(1)))
    np.testing.assert_array_equal(out, _chunk_mask_oracle(12, 3, 1))


def test_add_optional_chunk_mask_static_modes():
    lens = jnp.array([8, 5])
    pad = M.make_non_pad_mask(lens, 8)[:, None, :]
    # full-context decode
    out = M.add_optional_chunk_mask(8, pad, True, False, -1, 0, -1)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(pad & jnp.ones((8, 8), bool)))
    # fixed chunk decode
    out = M.add_optional_chunk_mask(8, pad, True, False, 2, 0, 1)
    exp = np.asarray(pad) & _chunk_mask_oracle(8, 2, 1)[None]
    np.testing.assert_array_equal(np.asarray(out), exp)
    # static chunk
    out = M.add_optional_chunk_mask(8, pad, False, False, 0, 4, -1)
    exp = np.asarray(pad) & _chunk_mask_oracle(8, 4, -1)[None]
    np.testing.assert_array_equal(np.asarray(out), exp)
    # no chunking
    out = M.add_optional_chunk_mask(8, pad, False, False, 0, 0, -1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(pad))


def test_dynamic_chunk_training_in_jit():
    lens = jnp.array([16, 16])
    pad = M.make_non_pad_mask(lens, 16)[:, None, :]

    @jax.jit
    def f(key):
        return M.add_optional_chunk_mask(16, pad, True, True, 0, 0, -1, rng=key)

    seen = set()
    for i in range(20):
        out = np.asarray(f(jax.random.PRNGKey(i)))
        assert out.shape == (2, 16, 16)
        assert out.any()
        # mask must be block-causal: row i never attends past its chunk end
        seen.add(out.tobytes())
    assert len(seen) > 1  # different keys → different sampled chunk sizes
