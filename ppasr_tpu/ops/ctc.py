"""CTC loss as a vectorized log-semiring dynamic program.

Replaces the reference's warp-ctc kernel (ppasr/model_utils/loss/ctc.py:27-50,
which calls paddle.nn.CTCLoss with reduction='sum' then divides by batch size)
with an in-house JAX implementation:

- the alpha recursion runs as one ``lax.scan`` over time with the whole batch
  and the extended-label axis vectorized (shapes [B, 2U+1]) — MXU/VPU friendly,
  no per-utterance Python;
- variable input/label lengths are handled by masking inside the scan, so the
  function is fully jit/vmap/pjit compatible with static padded shapes;
- gradients come from JAX autodiff through the scan (exact CTC gradient).

Blank id is 0 (reference vocab layout: <blank>=0, trainer.py:479-487).
Label padding uses IGNORE_ID=-1 (reference collate_fn.py:7-41).
"""
import jax
import jax.numpy as jnp

LOG_EPSILON = -1e30


def _interleave_blanks(labels: jnp.ndarray, blank: int) -> jnp.ndarray:
    """[B, U] → [B, 2U+1] extended sequence (blank, l1, blank, ..., lU, blank)."""
    bsz, max_u = labels.shape
    ext = jnp.full((bsz, 2 * max_u + 1), blank, dtype=labels.dtype)
    return ext.at[:, 1::2].set(labels)


def _extended_labels(labels, label_lengths, blank):
    """Shared lattice plumbing: extended labels + validity/skip masks."""
    s_len = 2 * labels.shape[1] + 1
    labels = jnp.where(labels < 0, 0, labels)  # sanitize pad for gathers
    ext = _interleave_blanks(labels, blank)  # [B, S]

    # Valid extended positions: s < 2*label_len+1.
    s_idx = jnp.arange(s_len, dtype=jnp.int32)[None, :]
    valid_s = s_idx < (2 * label_lengths.astype(jnp.int32) + 1)[:, None]

    # Skip-transition allowed: s>=2, ext[s] != blank, ext[s] != ext[s-2].
    ext_m2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=blank)[:, :s_len]
    can_skip = (s_idx >= 2) & (ext != blank) & (ext != ext_m2)
    return ext, valid_s, can_skip


def ctc_loss(log_probs: jnp.ndarray,
             input_lengths: jnp.ndarray,
             labels: jnp.ndarray,
             label_lengths: jnp.ndarray,
             blank: int = 0,
             average_batch: bool = True) -> jnp.ndarray:
    """Negative log likelihood of the CTC alignment lattice.

    Args:
      log_probs: [B, T, V] log-softmax outputs.
      input_lengths: [B] int frames per utterance.
      labels: [B, U] int targets, padded with -1 (or any value; padding is
        masked by label_lengths).
      label_lengths: [B] int target lengths.
      blank: blank token id.
      average_batch: True → sum over batch / B (reference ctc.py:47-49);
        False → per-utterance vector [B].

    Returns: scalar loss (or [B] when average_batch=False).
    """
    ext, valid_s, can_skip = _extended_labels(labels, label_lengths, blank)

    # Emissions for every (t, s) gathered ONCE before the scan — the loop
    # body then touches only [B, S]-sized arrays (the [B, T, V] tensor never
    # enters the loop, and its gradient is a single scatter outside it).
    emit_all = jnp.take_along_axis(log_probs, ext[:, None, :], axis=2)
    return _loss_from_emissions(emit_all, input_lengths, label_lengths,
                                valid_s, can_skip, average_batch)


def ctc_loss_from_logits(logits: jnp.ndarray,
                         input_lengths: jnp.ndarray,
                         labels: jnp.ndarray,
                         label_lengths: jnp.ndarray,
                         blank: int = 0,
                         average_batch: bool = True) -> jnp.ndarray:
    """CTC loss straight from (possibly bf16) logits.

    The dense f32 [B, T, V] log-softmax is never materialized: emissions
    are gathered from the logits and normalized by a fused logsumexp, and a
    custom VJP recomputes the softmax in the backward pass instead of
    storing the [B, T, V] log-probs as an autodiff residual. Numerics match
    ``ctc_loss(log_softmax(logits.astype(f32)))`` exactly (all f32 math);
    the training head calls this to halve the CTC head's HBM traffic.
    """
    ext, valid_s, can_skip = _extended_labels(labels, label_lengths, blank)
    emit_all = _emissions_from_logits(logits, ext)
    return _loss_from_emissions(emit_all, input_lengths, label_lengths,
                                valid_s, can_skip, average_batch)


@jax.custom_vjp
def _emissions_from_logits(logits, ext):
    """emit[b,t,s] = log_softmax(logits)[b, t, ext[b, s]], f32 — without
    ever forming the dense [B, T, V] log-softmax."""
    x = logits.astype(jnp.float32)
    m = jnp.max(x, axis=-1)
    lse = m + jnp.log(jnp.sum(jnp.exp(x - m[..., None]), axis=-1))
    return jnp.take_along_axis(x, ext[:, None, :], axis=2) - lse[..., None]


def _emissions_from_logits_fwd(logits, ext):
    return _emissions_from_logits(logits, ext), (logits, ext)


def _emissions_from_logits_bwd(res, g):
    logits, ext = res
    # d emit[b,t,s] / d logits[b,t,v] = 1[v == ext[b,s]] − softmax[b,t,v]
    x = logits.astype(jnp.float32)
    p = jax.nn.softmax(x, axis=-1)
    g_tot = jnp.sum(g, axis=-1)                                 # [B, T]
    bsz, t_max, _ = logits.shape
    scat = jnp.zeros(logits.shape, jnp.float32).at[
        jnp.arange(bsz)[:, None, None],
        jnp.arange(t_max)[None, :, None],
        jnp.broadcast_to(ext[:, None, :], g.shape)].add(g)
    g_logits = (scat - p * g_tot[..., None]).astype(logits.dtype)
    return g_logits, None


_emissions_from_logits.defvjp(_emissions_from_logits_fwd,
                              _emissions_from_logits_bwd)


def _loss_from_emissions(emit_all, input_lengths, label_lengths,
                         valid_s, can_skip, average_batch):
    """Alpha recursion over pre-gathered emissions [B, T, S] (f32)."""
    bsz, max_t, s_len = emit_all.shape

    # alpha_0
    alpha0 = jnp.full((bsz, s_len), LOG_EPSILON, dtype=emit_all.dtype)
    emit0 = emit_all[:, 0, :]
    alpha0 = alpha0.at[:, 0].set(emit0[:, 0])
    has_label = (label_lengths > 0)
    alpha0 = alpha0.at[:, 1].set(jnp.where(has_label, emit0[:, 1], LOG_EPSILON))
    alpha0 = jnp.where(valid_s, alpha0, LOG_EPSILON)

    def step(alpha, inp):
        emit, t = inp
        prev1 = jnp.pad(alpha, ((0, 0), (1, 0)),
                        constant_values=LOG_EPSILON)[:, :s_len]
        prev2 = jnp.pad(alpha, ((0, 0), (2, 0)),
                        constant_values=LOG_EPSILON)[:, :s_len]
        prev2 = jnp.where(can_skip, prev2, LOG_EPSILON)
        merged = jnp.logaddexp(jnp.logaddexp(alpha, prev1), prev2)
        new_alpha = jnp.where(valid_s, merged + emit, LOG_EPSILON)
        # Freeze once past this utterance's final frame so the end-read below
        # sees alpha at t = input_length-1.
        active = (t < input_lengths.astype(jnp.int32))[:, None]
        new_alpha = jnp.where(active, new_alpha, alpha)
        return new_alpha, None

    alpha, _ = jax.lax.scan(
        step, alpha0,
        (jnp.transpose(emit_all[:, 1:], (1, 0, 2)),
         jnp.arange(1, max_t, dtype=jnp.int32)),
        unroll=8)

    # loglik = logsumexp(alpha[2U], alpha[2U-1]); for U==0 only alpha[0].
    u = label_lengths.astype(jnp.int32)
    last = jnp.take_along_axis(alpha, (2 * u)[:, None], axis=1)[:, 0]
    second = jnp.take_along_axis(alpha, jnp.maximum(2 * u - 1, 0)[:, None],
                                 axis=1)[:, 0]
    second = jnp.where(u > 0, second, LOG_EPSILON)
    loglik = jnp.logaddexp(last, second)
    nll = -loglik
    if average_batch:
        return jnp.sum(nll) / bsz
    return nll
