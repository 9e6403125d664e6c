"""CTC loss vs the torch CPU oracle (stands in for warp-ctc parity,
SURVEY.md §7.3: numerical parity with sum-reduction / batch-average)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ppasr_tpu.ops.ctc import ctc_loss


def _torch_ctc(log_probs, in_lens, labels, lab_lens, average_batch=True):
    import torch
    lp = torch.tensor(np.asarray(log_probs)).permute(1, 0, 2)  # [T, B, V]
    loss = torch.nn.functional.ctc_loss(
        lp, torch.tensor(np.asarray(labels)),
        torch.tensor(np.asarray(in_lens)), torch.tensor(np.asarray(lab_lens)),
        blank=0, reduction="sum", zero_infinity=False)
    if average_batch:
        return float(loss) / log_probs.shape[0]
    return float(loss)


def _rand_case(rng, bsz, max_t, max_u, vocab):
    logits = rng.standard_normal((bsz, max_t, vocab)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    in_lens = rng.integers(max_u * 2 + 1, max_t + 1, size=bsz).astype(np.int32)
    lab_lens = rng.integers(1, max_u + 1, size=bsz).astype(np.int32)
    labels = rng.integers(1, vocab, size=(bsz, max_u)).astype(np.int32)
    for b in range(bsz):
        labels[b, lab_lens[b]:] = -1
    return log_probs, in_lens, labels, lab_lens


def test_ctc_matches_torch():
    rng = np.random.default_rng(0)
    log_probs, in_lens, labels, lab_lens = _rand_case(rng, 4, 50, 10, 30)
    ours = float(ctc_loss(log_probs, jnp.asarray(in_lens),
                          jnp.asarray(labels), jnp.asarray(lab_lens)))
    torch_labels = np.where(labels < 0, 0, labels)
    ref = _torch_ctc(log_probs, in_lens, torch_labels, lab_lens)
    assert ours == pytest.approx(ref, rel=1e-4)


def test_ctc_per_utt_and_repeats():
    rng = np.random.default_rng(1)
    bsz, max_t, vocab = 3, 40, 8
    labels = np.full((bsz, 6), -1, np.int32)
    labels[0, :4] = [2, 2, 3, 3]          # repeats force skip-rule coverage
    labels[1, :2] = [5, 5]
    labels[2, :6] = [1, 2, 3, 1, 2, 3]
    lab_lens = np.array([4, 2, 6], np.int32)
    in_lens = np.array([40, 30, 25], np.int32)
    logits = rng.standard_normal((bsz, max_t, vocab)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)

    ours = np.asarray(ctc_loss(log_probs, jnp.asarray(in_lens),
                               jnp.asarray(labels), jnp.asarray(lab_lens),
                               average_batch=False))
    import torch
    lp = torch.tensor(np.asarray(log_probs)).permute(1, 0, 2)
    ref = torch.nn.functional.ctc_loss(
        lp, torch.tensor(np.where(labels < 0, 0, labels)),
        torch.tensor(in_lens), torch.tensor(lab_lens),
        blank=0, reduction="none")
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4)


def test_ctc_gradient_finite_and_jit():
    rng = np.random.default_rng(2)
    log_probs, in_lens, labels, lab_lens = _rand_case(rng, 2, 30, 5, 12)

    def loss_fn(lp):
        return ctc_loss(jax.nn.log_softmax(lp, axis=-1), jnp.asarray(in_lens),
                        jnp.asarray(labels), jnp.asarray(lab_lens))

    g = jax.jit(jax.grad(loss_fn))(log_probs)
    assert np.isfinite(np.asarray(g)).all()

    # Gradient parity against torch.
    import torch
    lp_t = torch.tensor(np.asarray(log_probs), requires_grad=True)
    loss_t = torch.nn.functional.ctc_loss(
        torch.log_softmax(lp_t, dim=-1).permute(1, 0, 2),
        torch.tensor(np.where(labels < 0, 0, labels)),
        torch.tensor(in_lens), torch.tensor(lab_lens),
        blank=0, reduction="sum")
    (loss_t / log_probs.shape[0]).backward()
    np.testing.assert_allclose(np.asarray(g), lp_t.grad.numpy(),
                               rtol=1e-3, atol=1e-5)


def test_ctc_loss_from_logits_matches_log_softmax_path():
    """The training head's logits-direct loss (no dense [B,T,V] log-softmax,
    custom VJP) must match log_softmax→ctc_loss in value and gradient."""
    import jax
    import jax.numpy as jnp
    from ppasr_tpu.ops.ctc import ctc_loss, ctc_loss_from_logits
    rng = np.random.default_rng(11)
    B, T, V, U = 4, 37, 50, 6
    lens = jnp.asarray([37, 30, 12, 37], jnp.int32)
    labels = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)
    labels = labels.at[2, 3:].set(-1)
    ulens = jnp.asarray([6, 6, 3, 6], jnp.int32)
    for dtype in (jnp.float32, jnp.bfloat16):
        logits = jnp.asarray(rng.standard_normal((B, T, V)) * 2, dtype)

        def old(lg):
            lp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
            return ctc_loss(lp, lens, labels, ulens)

        v0, g0 = jax.value_and_grad(old)(logits)
        v1, g1 = jax.value_and_grad(
            lambda lg: ctc_loss_from_logits(lg, lens, labels, ulens))(logits)
        assert abs(float(v0) - float(v1)) < 1e-4 * abs(float(v0))
        diff = jnp.abs(g0.astype(jnp.float32) - g1.astype(jnp.float32))
        assert float(diff.max()) < 2e-3
