"""add_sos_eos / reverse_pad_list / label smoothing / th_accuracy checks."""
import numpy as np
import jax.numpy as jnp

from ppasr_tpu.ops.common import add_sos_eos, reverse_pad_list, th_accuracy
from ppasr_tpu.ops.label_smoothing import label_smoothing_loss


def test_add_sos_eos():
    ys = jnp.array([[1, 2, 3, -1, -1], [4, 5, -1, -1, -1]])
    lens = jnp.array([3, 2])
    ys_in, ys_out = add_sos_eos(ys, lens, sos=10, eos=11)
    np.testing.assert_array_equal(np.asarray(ys_in),
                                  [[10, 1, 2, 3, 11, 11], [10, 4, 5, 11, 11, 11]])
    np.testing.assert_array_equal(np.asarray(ys_out),
                                  [[1, 2, 3, 11, -1, -1], [4, 5, 11, -1, -1, -1]])


def test_reverse_pad_list():
    ys = jnp.array([[1, 2, 3, 0, 0], [4, 5, 0, 0, 0]])
    lens = jnp.array([3, 2])
    out = reverse_pad_list(ys, lens, pad_value=-1)
    np.testing.assert_array_equal(np.asarray(out),
                                  [[3, 2, 1, -1, -1], [5, 4, -1, -1, -1]])


def test_th_accuracy():
    logits = jnp.asarray(np.eye(4)[[0, 1, 2, 3]].reshape(1, 4, 4) * 10.0)
    targets = jnp.array([[0, 1, 2, -1]])
    acc = float(th_accuracy(logits, targets))
    assert acc == 1.0
    targets = jnp.array([[0, 1, 3, -1]])
    assert abs(float(th_accuracy(logits, targets)) - 2 / 3) < 1e-6


def test_label_smoothing_matches_torch():
    import torch
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 5, 7)).astype(np.float32)
    targets = np.array([[1, 2, 3, -1, -1], [4, 5, 6, 1, -1]], np.int64)
    ours = float(label_smoothing_loss(jnp.asarray(logits), jnp.asarray(targets),
                                      smoothing=0.1, normalize_length=False))

    # torch oracle mirroring the reference KLDiv formulation
    # (label_smoothing_loss.py:31-91)
    lp = torch.log_softmax(torch.tensor(logits), dim=-1).view(-1, 7)
    tgt = torch.tensor(targets).view(-1)
    true_dist = torch.full_like(lp, 0.1 / (7 - 1))
    mask = tgt != -1
    safe = torch.where(mask, tgt, torch.zeros_like(tgt))
    true_dist.scatter_(1, safe.unsqueeze(1), 0.9)
    kl = torch.nn.functional.kl_div(lp, true_dist, reduction="none").sum(-1)
    ref = float(kl[mask].sum() / 2)  # batch size 2
    assert abs(ours - ref) < 1e-4
