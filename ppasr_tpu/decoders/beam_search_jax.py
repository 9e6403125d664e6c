"""Vectorized on-device CTC prefix beam search (XLA, no host loops).

Replaces the reference's C++ host decoder (swig_wrapper.py) on the hot path
(SURVEY.md §2.3 item 1): the whole search runs as one ``lax.scan`` over time
with the batch and beam axes vectorized — batch decode needs zero host↔device
round-trips, and the streaming state (prefixes, beam scores) is a pytree that
stays in device memory between chunks.

Two-phase design (the vocab-sized work is hoisted out of the scan):
  Phase 1 — candidate precompute, one batched pass over [B, T, V]:
    per-frame blank log-prob + top-N token candidates with the cumulative
    cutoff mask; optional rank-preserving blank-frame compaction then
    left-packs the [B, T, 1+2N] candidate arrays (never the [B, T, V]
    posteriors). The V axis is touched exactly once.
  Phase 2 — the beam scan, per step (beam K, candidates N):
    1. K "stay" candidates (same prefix: blank path + repeat-last path) and
       K·N "extend" candidates (prefix + c, with CTC's repeat/blank rules);
    2. prefixes are identified by a 32-bit rolling hash; duplicates are
       merged (order-independent dedup — SURVEY.md §7.3) by the default
       'match' mode — a [K·N, K] stay↔extend hash-equality compare +
       masked logsumexp, exploiting that stay-stay and extend-extend
       duplicates are structurally impossible — or by 'sort' mode
       (sort-by-hash + neighbor pair-merge; same math, ~40% slower);
    3. top-K by total probability re-forms the beam; prefix token storage
       is gathered alongside.

Optional LM shallow fusion with KenLM-style alpha/beta weights, two backends:
  - dense char-level log10 unigram/bigram tables (order <= 2, one gather);
  - probing hash tables for orders 3+ (HashLM): per-order open-addressing
    tables probed with XLA gathers inside the scan, full Katz backoff chain
    computed on device — score-identical to the host NgramScorer
    (ppasr_tpu/decoders/lm.py) up to fingerprint collisions (~2^-50).

Scores match the host oracle (ppasr_tpu/decoders/beam_search.py) exactly up
to float32 on the same pruning config; hash collisions are the one
theoretical deviation (32-bit, ~K·N candidates per step — negligible).
"""
import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30
HASH_PRIME = jnp.uint32(1000003)


class BeamState(NamedTuple):
    """Device-resident beam state for one utterance (leading axis = beam)."""
    prefixes: jnp.ndarray   # [K, U_max] int32
    lengths: jnp.ndarray    # [K] int32
    last: jnp.ndarray       # [K] int32, -1 = empty prefix
    hashes: jnp.ndarray     # [K] uint32
    p_b: jnp.ndarray        # [K] f32 log prob ending in blank
    p_nb: jnp.ndarray       # [K] f32 log prob ending in non-blank


def init_beam_state(beam_size: int, max_len: int) -> BeamState:
    k = beam_size
    return BeamState(
        prefixes=jnp.zeros((k, max_len), jnp.int32),
        lengths=jnp.zeros((k,), jnp.int32),
        last=jnp.full((k,), -1, jnp.int32),
        hashes=jnp.zeros((k,), jnp.uint32),
        p_b=jnp.concatenate([jnp.zeros((1,), jnp.float32),
                             jnp.full((k - 1,), NEG_INF, jnp.float32)]),
        p_nb=jnp.full((k,), NEG_INF, jnp.float32))


def _next_pow2(x: int) -> int:
    return 1 << (int(x) - 1).bit_length()


# ------------------------------------------------------- hash-table LM

@jax.tree_util.register_pytree_node_class
class HashLM:
    """Device-resident n-gram LM for orders >= 3 (see lm.build_hash_tables).

    ds/fps/logps/backoffs are per-order tuples (n = 2..order); tuple length
    is static under jit, so the backoff chain unrolls at trace time. Tables
    are CHD perfect-hash: ``ds`` holds the per-bucket displacements, so a
    lookup inspects EXACTLY one slot (2 element gathers: displacement +
    fingerprint/value) — the previous open-addressing scheme linearly probed
    up to 8 slots and those gathers dominated LM-fused decode time."""

    def __init__(self, uni_logp, uni_found, uni_backoff, ds, fps, logps,
                 backoffs):
        self.uni_logp = uni_logp      # [V] f32 log10 (-6.0 when absent)
        self.uni_found = uni_found    # [V] bool
        self.uni_backoff = uni_backoff  # [V] f32 log10
        self.ds = tuple(ds)           # n=2..order: uint32 [B_n]
        self.fps = tuple(fps)         # n=2..order: uint32 [M_n], 0 = empty
        self.logps = tuple(logps)     # f32 [M_n]
        self.backoffs = tuple(backoffs)  # f32 [M_n]

    def tree_flatten(self):
        return ((self.uni_logp, self.uni_found, self.uni_backoff,
                 self.ds, self.fps, self.logps, self.backoffs), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def hash_lm_from_tables(t) -> HashLM:
    """lm.build_hash_tables output dict → device HashLM."""
    return HashLM(
        uni_logp=jnp.asarray(t['uni_logp']),
        uni_found=jnp.asarray(t['uni_found']),
        uni_backoff=jnp.asarray(t['uni_backoff']),
        ds=tuple(jnp.asarray(d) for (d, _, _, _) in t['tables']),
        fps=tuple(jnp.asarray(fp) for (_, fp, _, _) in t['tables']),
        logps=tuple(jnp.asarray(lp) for (_, _, lp, _) in t['tables']),
        backoffs=tuple(jnp.asarray(bk) for (_, _, _, bk) in t['tables']))


def _fmix32_dev(h):
    """Murmur3 avalanche, matching lm._fmix32 bit-for-bit (the raw fold is
    linear in the last token — see lm._fmix32)."""
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    return h


def _hash_fold(tokens):
    """Rolling 32-bit hashes over token arrays (oldest → newest), matching
    lm._fold_hash bit-for-bit. tokens: list of broadcast-compatible int
    arrays; returns (slot hash, fingerprint hash) uint32."""
    h1 = None
    h2 = None
    for t in tokens:
        tt = (t + 1).astype(jnp.uint32)
        if h1 is None:
            h1 = jnp.uint32(2166136261) * jnp.uint32(0x9E3779B1) + tt
            h2 = jnp.uint32(0x27220A95) * jnp.uint32(0x85EBCA6B) + tt
        else:
            h1 = h1 * jnp.uint32(0x9E3779B1) + tt
            h2 = h2 * jnp.uint32(0x85EBCA6B) + tt
    return _fmix32_dev(h1), _fmix32_dev(h2)


def _hash_lookup(d_table, fp_table, val_table, h1, h2):
    """CHD perfect-hash lookup: bucket displacement (1 gather) → exactly
    one slot (2 gathers: fingerprint + value). Returns (found bool, value);
    the value is meaningful only where found. All gathers are ELEMENT
    gathers — a contiguous slice-gather was measured 20× slower on v5e
    (XLA serializes multi-element slices per index)."""
    b = (h1 & jnp.uint32(d_table.shape[0] - 1)).astype(jnp.int32)
    d = d_table[b]                                        # [...] u32
    slot = (_fmix32_dev(h2 ^ d)
            & jnp.uint32(fp_table.shape[0] - 1)).astype(jnp.int32)
    found = fp_table[slot] == (h2 | jnp.uint32(1))
    return found, val_table[slot]


def _hash_lm_score(lm: HashLM, ctx, cand):
    """log10 P(cand | ctx) with the full backoff chain, on device.

    ctx: [K, order-1] int32 context token ids, NEWEST FIRST (ctx[:, 0] is
    the last emitted char), -1 = no token. cand: [N] int32.

    Mirrors NgramScorer._score_tokens exactly: longest matched n-gram's
    log-prob plus the backoff weights of every longer context that exists
    in the LM, computed bottom-up as
        f_n = found_n ? logp_n : bo(ctx_{n-1}) + f_{n-1}
    (bo = 0 when the context itself is absent — ARPA guarantees the n-gram
    is then absent too). Tokens absent from the LM score a flat -6.0 with
    no backoff sum, the scorer's OOV short-circuit."""
    order = len(lm.fps) + 1
    k = ctx.shape[0]
    f = jnp.broadcast_to(lm.uni_logp[cand][None, :],
                         (k, cand.shape[0]))              # [K, N]
    for n in range(2, order + 1):
        toks = [ctx[:, j] for j in range(n - 2, -1, -1)]  # oldest → newest
        valid = ctx[:, n - 2] >= 0  # newest-first ⇒ oldest present = all
        h1, h2 = _hash_fold([t[:, None] for t in toks] + [cand[None, :]])
        found, logp = _hash_lookup(lm.ds[n - 2], lm.fps[n - 2],
                                   lm.logps[n - 2], h1, h2)  # [K, N]
        if n == 2:
            last = jnp.where(valid, ctx[:, 0], 0)
            bo = jnp.where(valid & lm.uni_found[last],
                           lm.uni_backoff[last], 0.0)     # [K]
        else:
            bh1, bh2 = _hash_fold(toks)                   # [K]
            bfound, bval = _hash_lookup(lm.ds[n - 3], lm.fps[n - 3],
                                        lm.backoffs[n - 3], bh1, bh2)
            bo = jnp.where(valid & bfound, bval, 0.0)
        found = found & valid[:, None]
        f = jnp.where(found, logp, bo[:, None] + f)
    return jnp.where(lm.uni_found[cand][None, :], f, -6.0)


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    safe = jnp.where(m > NEG_INF / 2, m, 0.0)
    out = safe + jnp.log(jnp.exp(a - safe) + jnp.exp(b - safe))
    return jnp.where(m > NEG_INF / 2, out, NEG_INF)


# --------------------------------------------------------------- phase 1

def precompute_candidates(probs, blank, top_n, cutoff_prob,
                          prune_method: str = 'exact'):
    """[..., V] probs → (lp_blank [...], cand [..., N] int32,
    cand_lp [..., N]). The only pass that ever reads the vocab axis.

    prune_method 'exact' uses lax.top_k (a full sort — the reference's C++
    pruning semantics, bit-matched); 'approx' uses the TPU-native
    lax.approx_max_k (~8× faster, ≥95% recall on the tail candidates —
    the head candidates that actually steer the beam are always found)."""
    v = probs.shape[-1]
    lp_blank = jnp.log(jnp.maximum(probs[..., blank], 1e-30))
    no_blank = jnp.where(jnp.arange(v) == blank, 0.0, probs)
    if prune_method == 'approx':
        cand_p, cand = jax.lax.approx_max_k(no_blank, top_n)
    else:
        cand_p, cand = jax.lax.top_k(no_blank, top_n)
    keep = jnp.cumsum(cand_p, axis=-1) - cand_p < cutoff_prob
    cand_lp = jnp.where(keep, jnp.log(jnp.maximum(cand_p, 1e-30)), NEG_INF)
    return lp_blank, cand.astype(jnp.int32), cand_lp


def candidates_from_logits(logits, lse, blank, top_n, cutoff_prob,
                           prune_method: str = 'exact'):
    """[..., V] LOGITS (any float dtype) + precomputed f32 logsumexp [...]
    → (cand [..., N] int32, cand_lp [..., N] f32).

    Numerically ≡ precompute_candidates on softmax(logits): top-k commutes
    with the monotone softmax, cand_lp = logit − logsumexp = log softmax,
    and the probs path's log(max(p, 1e-30)) floor is mirrored by clamping
    at log(1e-30) — WITHOUT ever materializing the f32 [..., V] posterior
    (at B=64×10 s that tensor costs ~1.4 ms/step in softmax + result-layout
    copy alone)."""
    v = logits.shape[-1]
    no_blank = jnp.where(jnp.arange(v) == blank,
                         jnp.asarray(NEG_INF, logits.dtype), logits)
    if prune_method == 'approx':
        cand_v, cand = jax.lax.approx_max_k(no_blank, top_n)
    else:
        cand_v, cand = jax.lax.top_k(no_blank, top_n)
    raw_lp = cand_v.astype(jnp.float32) - lse[..., None]
    cand_p = jnp.exp(raw_lp)  # exp(-inf) = 0 for the blank slot
    keep = jnp.cumsum(cand_p, axis=-1) - cand_p < cutoff_prob
    cand_lp = jnp.maximum(raw_lp, math.log(1e-30))
    cand_lp = jnp.where(keep, cand_lp, NEG_INF)
    return cand.astype(jnp.int32), cand_lp


def compact_candidate_frames(lp_blank, cand, cand_lp, lens,
                             blank_skip_threshold: float):
    """Drop frames dominated by blank, in candidate space.

    A frame with P(blank) ≥ threshold multiplies every beam's total mass by
    ≈P(blank) — a shared additive log constant that cannot change the
    ranking — so decoding only the remaining "spike" frames is
    rank-preserving (the same pruning every production CTC decoder applies;
    speech is typically 60-85% blank frames, giving a 3-6× decode speedup).

    Kept frames are left-packed; returns (lp_blank, cand, cand_lp, new_lens).
    """
    bsz, t_max = lp_blank.shape
    keep = (jnp.exp(lp_blank) < blank_skip_threshold) \
        & (jnp.arange(t_max)[None, :] < lens[:, None])
    pos = jnp.cumsum(keep, axis=1) - 1
    pos = jnp.where(keep, pos, t_max - 1)  # dropped frames pile on the end
    scat = jax.vmap(lambda dst, p, src: dst.at[p].set(src))
    out_blank = scat(jnp.zeros_like(lp_blank), pos, lp_blank)
    out_cand = scat(jnp.zeros_like(cand), pos, cand)
    out_lp = scat(jnp.full_like(cand_lp, NEG_INF), pos, cand_lp)
    new_lens = jnp.maximum(keep.sum(axis=1).astype(jnp.int32), 1)
    return out_blank, out_cand, out_lp, new_lens


def compact_blank_frames(probs: jnp.ndarray, lens: jnp.ndarray,
                         blank: int = 0,
                         blank_skip_threshold: float = 0.98):
    """Legacy full-posterior compaction (kept for API compatibility;
    the decode path now compacts in candidate space instead)."""
    bsz, t_max, v = probs.shape
    keep = (probs[:, :, blank] < blank_skip_threshold) \
        & (jnp.arange(t_max)[None, :] < lens[:, None])
    pos = jnp.cumsum(keep, axis=1) - 1
    pos = jnp.where(keep, pos, t_max - 1)
    out = jax.vmap(lambda o, p, x: o.at[p].set(x))(
        jnp.zeros_like(probs), pos, probs)
    new_lens = jnp.maximum(keep.sum(axis=1).astype(jnp.int32), 1)
    return out, new_lens


# --------------------------------------------------------------- phase 2

def _beam_step(state: BeamState, lp_blank, cand, cand_lp, top_n, beam_size,
               lm_bigram, lm_unigram, alpha, beta, merge_mode='match',
               lm_hash: Optional[HashLM] = None):
    """One time step for one utterance, over precomputed candidates.
    lp_blank: scalar; cand/cand_lp: [N]."""
    k = beam_size
    u_max = state.prefixes.shape[1]

    p_tot = _logaddexp(state.p_b, state.p_nb)             # [K]

    # --- LM bonus for extending with candidate c given the prefix
    if lm_hash is not None:
        # context = last (order-1) prefix tokens, newest first
        order = len(lm_hash.fps) + 1
        j = jnp.arange(order - 1)
        pos = state.lengths[:, None] - 1 - j[None, :]      # [K, order-1]
        ctx = jnp.where(pos >= 0,
                        jnp.take_along_axis(
                            state.prefixes,
                            jnp.clip(pos, 0, u_max - 1), axis=1),
                        -1)
        lm = _hash_lm_score(lm_hash, ctx, cand)            # [K, N]
        ln10 = math.log(10.0)
        bonus = alpha * lm * ln10 + beta * ln10
    elif lm_bigram is not None or lm_unigram is not None:
        ln10 = math.log(10.0)
        if lm_bigram is not None:
            ctx = jnp.where(state.last < 0, 0, state.last)
            big = lm_bigram[ctx][:, cand]                  # [K, N]
            uni = lm_unigram[cand][None, :]
            lm = jnp.where((state.last < 0)[:, None], uni, big)
        else:
            lm = lm_unigram[cand][None, :]
        bonus = alpha * lm * ln10 + beta * ln10            # [K, N]
    else:
        bonus = jnp.zeros((k, top_n), jnp.float32)

    # --- stay candidates: same prefix
    # blank path always; repeat path only when last is a valid candidate
    lp_last = jnp.where(
        state.last >= 0,
        jnp.max(jnp.where(cand[None, :] == state.last[:, None],
                          cand_lp[None, :], NEG_INF), axis=1),
        NEG_INF)                                           # [K]
    stay_p_b = p_tot + lp_blank
    stay_p_nb = state.p_nb + lp_last

    # --- extend candidates: prefix + c for each candidate
    is_repeat = cand[None, :] == state.last[:, None]       # [K, N]
    src = jnp.where(is_repeat, state.p_b[:, None], p_tot[:, None])
    ext_p_nb = src + cand_lp[None, :] + bonus              # [K, N]
    ext_hash = state.hashes[:, None] * HASH_PRIME \
        + (cand[None, :] + 1).astype(jnp.uint32)           # [K, N]

    # --- pool: K stay + K*N extend
    pool_hash = jnp.concatenate([state.hashes, ext_hash.reshape(-1)])
    pool_p_b = jnp.concatenate([stay_p_b,
                                jnp.full((k * top_n,), NEG_INF)])
    pool_p_nb = jnp.concatenate([stay_p_nb, ext_p_nb.reshape(-1)])
    # provenance for gathering prefix storage after top-K
    pool_src_beam = jnp.concatenate([
        jnp.arange(k, dtype=jnp.int32),
        jnp.repeat(jnp.arange(k, dtype=jnp.int32), top_n)])
    pool_ext_char = jnp.concatenate([
        jnp.full((k,), -1, jnp.int32),
        jnp.tile(cand.astype(jnp.int32), (k,))])
    # dead-beam / pruned-candidate guard
    alive = jnp.concatenate([
        p_tot > NEG_INF / 2,
        ((p_tot[:, None] > NEG_INF / 2)
         & (cand_lp[None, :] > NEG_INF / 2)).reshape(-1)])
    pool_p_b = jnp.where(alive, pool_p_b, NEG_INF)
    pool_p_nb = jnp.where(alive, pool_p_nb, NEG_INF)
    # kill hash so dead entries can't merge with real ones
    pool_hash = jnp.where(alive, pool_hash, jnp.uint32(0xFFFFFFFF))

    m = pool_hash.shape[0]
    if merge_mode == 'match':
        # --- exact merge without sorting: a duplicate can only pair a STAY
        # entry with an EXTEND entry. Stay prefixes are pairwise distinct
        # (the beam invariant) and extend prefixes are pairwise distinct
        # (P_i + c == P_j + c' forces c == c' and then P_i == P_j). So the
        # merge is: for each extend, find the stay with equal hash, fold its
        # mass into that stay, kill the extend. [K·N, K] hash compares +
        # one masked logsumexp replace the O(M log² M) bitonic sort; the
        # only deviation is 32-bit hash collisions, same caveat as 'sort'
        # (and strictly fewer collision pairings, since ext-ext runs are
        # impossible here).
        ext_alive = alive[k:]
        stay_hash = jnp.where(alive[:k], state.hashes,
                              jnp.uint32(0xFFFFFFFF))
        ext_hash_flat = jnp.where(ext_alive, ext_hash.reshape(-1),
                                  jnp.uint32(0xFFFFFFFE))
        hit = ext_hash_flat[:, None] == stay_hash[None, :]     # [K·N, K]
        ext_vals = pool_p_nb[k:]                               # [K·N]
        fold_max = jnp.max(jnp.where(hit, ext_vals[:, None], NEG_INF),
                           axis=0)                             # [K]
        safe = jnp.where(fold_max > NEG_INF / 2, fold_max, 0.0)
        fold_sum = jnp.sum(
            jnp.where(hit, jnp.exp(ext_vals[:, None] - safe[None, :]), 0.0),
            axis=0)
        folded = jnp.where(fold_max > NEG_INF / 2,
                           safe + jnp.log(jnp.maximum(fold_sum, 1e-38)),
                           NEG_INF)
        merged_p_b = pool_p_b  # extends carry NEG_INF p_b already
        merged_p_nb = jnp.concatenate([
            _logaddexp(pool_p_nb[:k], folded),
            jnp.where(jnp.any(hit, axis=1), NEG_INF, ext_vals)])
        order = None
    elif merge_mode == 'sort':
        # --- exact merge: sort by hash, then a NEIGHBOR pair-merge.
        # Beams always hold distinct prefixes, so any prefix appears in the
        # pool at most twice: once as a stay (beam already = P) and once as
        # an extend (the unique beam = P[:-1] extended by P[-1]). Equal-hash
        # runs therefore have length ≤ 2 (longer runs only from 32-bit hash
        # collisions or dead-entry sentinels, both harmless), and the merge
        # needs no segment scatters — just a logaddexp with the next entry.
        order = jnp.argsort(pool_hash)
        s_hash = pool_hash[order]
        s_p_b = pool_p_b[order]
        s_p_nb = pool_p_nb[order]
        first = jnp.concatenate([jnp.ones((1,), bool),
                                 s_hash[1:] != s_hash[:-1]])
        next_same = jnp.concatenate([s_hash[1:] == s_hash[:-1],
                                     jnp.zeros((1,), bool)])

        def pair_merge(vals):
            nxt = jnp.concatenate([vals[1:],
                                   jnp.full((1,), NEG_INF, vals.dtype)])
            merged = jnp.where(next_same, _logaddexp(vals, nxt), vals)
            return jnp.where(first, merged, NEG_INF)

        merged_p_b = pair_merge(s_p_b)
        merged_p_nb = pair_merge(s_p_nb)
    else:
        # --- EXPERIMENTAL scatter merge: bucket by hash mod H — O(M)
        # scatters instead of the O(M log M) bitonic sort. The birthday
        # bound (≈M²/2H spurious merges per step) makes this lossy at
        # practical H; kept for experimentation, NOT the default.
        num_segments = _next_pow2(8 * m)
        seg_id = (pool_hash % jnp.uint32(num_segments)).astype(jnp.int32)
        order = None
        s_p_b, s_p_nb, s_hash = pool_p_b, pool_p_nb, pool_hash
        # representative = entry with max total in its bucket
        tot = _logaddexp(pool_p_b, pool_p_nb)
        bucket_max = jax.ops.segment_max(tot, seg_id,
                                         num_segments=num_segments)
        first = tot >= bucket_max[seg_id] - 1e-6
        # break ties (identical totals) by keeping the lowest index
        idxs = jnp.arange(m, dtype=jnp.int32)
        bucket_argmin = jax.ops.segment_min(
            jnp.where(first, idxs, m), seg_id, num_segments=num_segments)
        first = idxs == bucket_argmin[seg_id]

        def seg_logsumexp(vals):
            seg_max = jax.ops.segment_max(vals, seg_id,
                                          num_segments=num_segments)
            seg_max_safe = jnp.where(seg_max > NEG_INF / 2, seg_max, 0.0)
            sums = jax.ops.segment_sum(
                jnp.exp(vals - seg_max_safe[seg_id]),
                seg_id, num_segments=num_segments)
            out = seg_max_safe + jnp.log(jnp.maximum(sums, 1e-38))
            return jnp.where(sums > 0, out, NEG_INF)

        merged_p_b = seg_logsumexp(s_p_b)[seg_id]
        merged_p_nb = seg_logsumexp(s_p_nb)[seg_id]
        merged_p_b = jnp.where(first, merged_p_b, NEG_INF)
        merged_p_nb = jnp.where(first, merged_p_nb, NEG_INF)

    merged_tot = _logaddexp(merged_p_b, merged_p_nb)
    top_vals, top_idx = jax.lax.top_k(merged_tot, k)
    sel = order[top_idx] if order is not None else top_idx  # pool indices

    sel_src = pool_src_beam[sel]
    sel_char = pool_ext_char[sel]
    sel_is_ext = sel_char >= 0

    new_prefixes = state.prefixes[sel_src]
    ins_pos = jnp.clip(state.lengths[sel_src], 0, u_max - 1)
    # masked one-hot write instead of a vmapped .at[pos].set scatter: the
    # nested-vmap scatter (beams inside a vmapped lane inside lax.scan)
    # miscompiles above ~24 lanes at beam 300 on BOTH the TPU and CPU
    # backends — prefix writes for lanes ≥ 1 are silently dropped while
    # scores/lengths stay correct (reproduced 2026-08: B=24 ok, B=32
    # corrupt, bit-identical inputs). The where-form is also the faster
    # lowering on TPU (vectorized select, no scatter).
    write = (jnp.arange(u_max, dtype=jnp.int32)[None, :]
             == ins_pos[:, None]) & sel_is_ext[:, None]
    new_prefixes = jnp.where(write, sel_char[:, None], new_prefixes)
    new_lengths = state.lengths[sel_src] + sel_is_ext.astype(jnp.int32)
    new_last = jnp.where(sel_is_ext, sel_char, state.last[sel_src])
    new_hashes = pool_hash[sel]
    dead = top_vals <= NEG_INF / 2
    new_state = BeamState(
        prefixes=new_prefixes,
        lengths=jnp.where(dead, 0, new_lengths),
        last=jnp.where(dead, -1, new_last),
        hashes=new_hashes,
        p_b=merged_p_b[top_idx],
        p_nb=merged_p_nb[top_idx])
    return new_state


def _masked_step(states, lp_blank, cand, cand_lp, active, top_n, beam_size,
                 lm_bigram, lm_unigram, alpha, beta, merge_mode,
                 lm_hash=None):
    """Vmapped step over the batch; inactive lanes keep their state."""
    def one(state, lpb, cd, clp, act):
        new = _beam_step(state, lpb, cd, clp, top_n, beam_size,
                         lm_bigram, lm_unigram, alpha, beta, merge_mode,
                         lm_hash=lm_hash)
        return jax.tree.map(lambda n, o: jnp.where(
            jnp.reshape(act, (1,) * n.ndim), n, o), new, state)
    return jax.vmap(one)(states, lp_blank, cand, cand_lp, active)


@partial(jax.jit, static_argnames=('blank', 'beam_size', 'cutoff_top_n',
                                   'max_prefix_len', 'merge_mode'))
def beam_search_step_batch(states: BeamState, probs_t: jnp.ndarray,
                           active: jnp.ndarray, blank: int = 0,
                           beam_size: int = 10, cutoff_top_n: int = 40,
                           cutoff_prob: float = 0.99,
                           lm_bigram=None, lm_unigram=None,
                           alpha: float = 2.2, beta: float = 4.3,
                           max_prefix_len: int = 0,
                           merge_mode: str = 'match',
                           lm_hash: Optional[HashLM] = None):
    """One decode step over the whole batch.
    probs_t: [B, V]; active: [B] bool (frame < utterance length)."""
    lp_blank, cand, cand_lp = precompute_candidates(
        probs_t, blank, cutoff_top_n, cutoff_prob)
    return _masked_step(states, lp_blank, cand, cand_lp, active,
                        cutoff_top_n, beam_size, lm_bigram, lm_unigram,
                        alpha, beta, merge_mode, lm_hash=lm_hash)


def _scan_candidates(states, lp_blank, cand, cand_lp, lens, top_n,
                     beam_size, lm_bigram, lm_unigram, alpha, beta,
                     merge_mode, lm_hash=None):
    """Run the beam over precomputed candidates.
    lp_blank [B, T]; cand/cand_lp [B, T, N]."""
    t_max = lp_blank.shape[1]

    def step(st, inp):
        lpb_t, cand_t, clp_t, t = inp
        active = t < lens
        return _masked_step(st, lpb_t, cand_t, clp_t, active, top_n,
                            beam_size, lm_bigram, lm_unigram, alpha, beta,
                            merge_mode, lm_hash=lm_hash), None

    xs = (jnp.transpose(lp_blank, (1, 0)),
          jnp.transpose(cand, (1, 0, 2)),
          jnp.transpose(cand_lp, (1, 0, 2)),
          jnp.arange(t_max, dtype=jnp.int32))
    final, _ = jax.lax.scan(step, states, xs)
    return final


def ctc_beam_search_jax(probs: jnp.ndarray, lens: jnp.ndarray,
                        blank: int = 0, beam_size: int = 10,
                        cutoff_top_n: int = 40, cutoff_prob: float = 0.99,
                        lm_bigram=None, lm_unigram=None,
                        alpha: float = 2.2, beta: float = 4.3,
                        max_prefix_len: Optional[int] = None,
                        blank_skip_threshold: float = 1.0,
                        merge_mode: str = 'match',
                        lm_hash: Optional[HashLM] = None):
    """Batch offline decode: [B, T, V] probs + [B] lens → BeamState batch.

    The scan runs fully on device; convert with ``beam_state_to_results``.
    ``blank_skip_threshold < 1`` enables rank-preserving blank-frame
    compaction (see compact_candidate_frames)."""
    bsz, t_max, _ = probs.shape
    if max_prefix_len is None:
        max_prefix_len = t_max
    lp_blank, cand, cand_lp = precompute_candidates(
        probs, blank, cutoff_top_n, cutoff_prob)
    if blank_skip_threshold < 1.0:
        lp_blank, cand, cand_lp, lens = compact_candidate_frames(
            lp_blank, cand, cand_lp, lens, blank_skip_threshold)
    init = jax.vmap(lambda _: init_beam_state(beam_size, max_prefix_len))(
        jnp.arange(bsz))
    return _scan_candidates(init, lp_blank, cand, cand_lp, lens,
                            cutoff_top_n, beam_size, lm_bigram, lm_unigram,
                            alpha, beta, merge_mode, lm_hash=lm_hash)


def ctc_beam_search_jax_continue(states: BeamState, probs, lens,
                                 blank: int = 0, beam_size: int = 10,
                                 cutoff_top_n: int = 40,
                                 cutoff_prob: float = 0.99,
                                 lm_bigram=None, lm_unigram=None,
                                 alpha: float = 2.2, beta: float = 4.3,
                                 max_prefix_len: int = 0,
                                 merge_mode: str = 'match',
                                 lm_hash: Optional[HashLM] = None):
    """Continue decoding from an existing BeamState (streaming)."""
    lp_blank, cand, cand_lp = precompute_candidates(
        probs, blank, cutoff_top_n, cutoff_prob)
    return _scan_candidates(states, lp_blank, cand, cand_lp, lens,
                            cutoff_top_n, beam_size, lm_bigram, lm_unigram,
                            alpha, beta, merge_mode, lm_hash=lm_hash)


def pack_best_hypothesis(states: BeamState) -> jnp.ndarray:
    """Device-side selection of each lane's best beam, packed into ONE
    int32 buffer [B, 2 + U_max]: (score bitcast, length, prefix tokens).
    A single host transfer then yields every result — the per-transfer
    latency of separate p_b/p_nb/prefixes/lengths reads dominated decode
    wall-clock before this."""
    p_tot = _logaddexp(states.p_b, states.p_nb)            # [B, K]
    best = jnp.argmax(p_tot, axis=1)                       # [B]
    bi = jnp.arange(p_tot.shape[0])
    score = p_tot[bi, best]
    return jnp.concatenate([
        jax.lax.bitcast_convert_type(score, jnp.int32)[:, None],
        states.lengths[bi, best][:, None],
        states.prefixes[bi, best]], axis=1)


def all_hypotheses(states: BeamState, max_hyp_len: int):
    """Every beam's hypothesis, device-side, for attention rescoring.

    Returns (prefixes [B, K, max_hyp_len] int32, lengths [B, K] int32,
    ctc_scores [B, K] f32). Dead beams carry NEG_INF scores."""
    scores = _logaddexp(states.p_b, states.p_nb)
    lengths = jnp.minimum(states.lengths, max_hyp_len)
    prefixes = states.prefixes[:, :, :max_hyp_len]
    return prefixes, lengths, scores


def pack_hypothesis_at(states: BeamState, best: jnp.ndarray,
                       scores: jnp.ndarray) -> jnp.ndarray:
    """Pack the beam `best[b]` of each lane (with externally supplied
    scores, e.g. rescored totals) into one int32 buffer [B, 2 + U_max] —
    same layout as pack_best_hypothesis, one D2H transfer."""
    bi = jnp.arange(best.shape[0])
    return jnp.concatenate([
        jax.lax.bitcast_convert_type(
            scores[bi, best].astype(jnp.float32), jnp.int32)[:, None],
        states.lengths[bi, best][:, None],
        states.prefixes[bi, best]], axis=1)


def unpack_results(packed: np.ndarray, vocab_list):
    """Host side of pack_best_hypothesis → list of (score, text)."""
    packed = np.asarray(packed)
    scores = packed[:, 0].view(np.float32)
    out = []
    for b in range(packed.shape[0]):
        ids = packed[b, 2:2 + packed[b, 1]]
        out.append((float(scores[b]),
                    ''.join(vocab_list[i] for i in ids)))
    return out


def beam_state_to_results(states: BeamState, vocab_list):
    """BeamState batch → list of (score, text) best-first (host side)."""
    return unpack_results(pack_best_hypothesis(states), vocab_list)


class JaxBeamSearchDecoder:
    """Drop-in decoder with the BeamSearchDecoder surface, running the search
    on device. Streaming keeps BeamState in device memory across chunks.

    ``decode_batch`` accepts device arrays and keeps them on device — feed
    it the jitted model's output directly (no host round-trip of the
    [B, T, V] posteriors)."""

    def __init__(self, vocab_list, alpha: float = 2.2, beta: float = 4.3,
                 beam_size: int = 10, cutoff_prob: float = 0.99,
                 cutoff_top_n: int = 40, blank_index: int = 0,
                 language_model_path: str = None,
                 max_prefix_len: int = 512,
                 blank_skip_threshold: float = 0.98,
                 merge_mode: str = 'match',
                 prune_method: str = 'exact',
                 lm_fusion: str = 'auto', **_):
        self.vocab_list = list(vocab_list)
        self.alpha = alpha
        self.beta = beta
        self.beam_size = beam_size
        self.cutoff_prob = cutoff_prob
        self.cutoff_top_n = min(cutoff_top_n, len(vocab_list))
        self.blank_index = blank_index
        self.max_prefix_len = max_prefix_len
        self.blank_skip_threshold = blank_skip_threshold
        self.merge_mode = merge_mode
        self.prune_method = prune_method
        self.lm_fusion = lm_fusion  # 'auto' | 'dense' | 'hash'
        self.lm_unigram = None
        self.lm_bigram = None
        self.lm_hash = None
        if language_model_path:
            import os
            if os.path.exists(language_model_path):
                self._load_lm(language_model_path)
        self.reset()

    def _lm_cache_meta(self, path):
        """Cache key for the flattened LM arrays: the tables depend on the
        ARPA file AND the vocab-id mapping."""
        import hashlib
        import os
        st = os.stat(path)
        vh = hashlib.sha1(
            '\n'.join(self.vocab_list).encode('utf-8')).hexdigest()
        return np.asarray([st.st_mtime_ns, st.st_size], np.int64), vh

    def _load_lm_hash_cached(self, path):
        """build_hash_tables output, cached to <arpa>.tpu_lm.npz —
        production ARPAs (tens of millions of n-grams) cost minutes of
        Python parse+build per process otherwise."""
        import os
        from ppasr_tpu.decoders.lm import NgramScorer, build_hash_tables
        cache = path + '.tpu_lm.npz'
        meta, vh = self._lm_cache_meta(path)
        if os.path.exists(cache):
            try:
                z = np.load(cache, allow_pickle=False)
                if (np.array_equal(z['meta'], meta)
                        and str(z['vocab_sha1']) == vh
                        and 'fmt' in z.files and str(z['fmt']) == 'chd1'):
                    n_orders = int(z['n_orders'])
                    return dict(
                        order=int(z['order']),
                        uni_logp=z['uni_logp'], uni_found=z['uni_found'],
                        uni_backoff=z['uni_backoff'],
                        tables=[(z[f'd{i}'], z[f'fp{i}'], z[f'lp{i}'],
                                 z[f'bk{i}']) for i in range(n_orders)])
            except Exception:
                pass  # unreadable/stale cache: rebuild below
        scorer = NgramScorer(path, self.vocab_list)
        t = build_hash_tables(scorer, self.vocab_list)
        try:
            arrs = dict(meta=meta, vocab_sha1=np.str_(vh),
                        fmt=np.str_('chd1'),
                        order=np.int64(t['order']),
                        n_orders=np.int64(len(t['tables'])),
                        uni_logp=t['uni_logp'], uni_found=t['uni_found'],
                        uni_backoff=t['uni_backoff'])
            for i, (d, fp, lp, bk) in enumerate(t['tables']):
                arrs[f'd{i}'] = d
                arrs[f'fp{i}'], arrs[f'lp{i}'], arrs[f'bk{i}'] = fp, lp, bk
            tmp = cache + '.tmp.npz'
            np.savez(tmp, **arrs)
            os.replace(tmp, cache)
        except Exception:
            pass  # read-only LM dir: serve uncached
        return t

    def _load_lm(self, path):
        from ppasr_tpu.decoders.lm import NgramScorer

        if path.endswith('.klm'):
            # A .klm stores n-grams only as 64-bit hashes, so the vocab-id
            # tables on-device fusion needs cannot be enumerated from it.
            # The host decoders (backend='host', csrc) load .klm natively.
            raise ValueError(
                "on-device LM fusion needs an ARPA model; .klm binaries "
                "are supported by the host beam-search backend "
                "(ctc_beam_search_decoder_conf.backend: 'host')")

        def peek_order(p):
            import gzip
            opener = gzip.open if p.endswith('.gz') else open
            order = 0
            with opener(p, 'rt', encoding='utf-8') as f:
                for line in f:
                    line = line.strip()
                    if line.startswith('ngram '):
                        order = max(order,
                                    int(line[6:line.index('=')]))
                    elif line.startswith('\\1-grams'):
                        break
            return order
        order = peek_order(path)
        if self.lm_fusion == 'hash' or (self.lm_fusion == 'auto'
                                        and order >= 3):
            # orders 3+: the dense [V, V] table can't carry trigram+
            # context — probing hash tables keep the full backoff chain
            # on device (one probe set per order inside the scan)
            self.lm_hash = hash_lm_from_tables(
                self._load_lm_hash_cached(path))
            return
        scorer = NgramScorer(path, self.vocab_list)
        v = len(self.vocab_list)
        uni = np.full((v,), -6.0, np.float32)
        for i, tok in enumerate(self.vocab_list):
            e = scorer.tables.get(1, {}).get((tok,))
            if e is not None:
                uni[i] = e[0]
        self.lm_unigram = jnp.asarray(uni)
        if 2 in scorer.tables:
            big = np.tile(uni[None, :], (v, 1))  # backoff to unigram
            backoff = np.zeros((v,), np.float32)
            tok_to_id = {t: i for i, t in enumerate(self.vocab_list)}
            for i, tok in enumerate(self.vocab_list):
                e = scorer.tables.get(1, {}).get((tok,))
                if e is not None:
                    backoff[i] = e[1]
            big += backoff[:, None]
            for (a, b), (logp, _bo) in scorer.tables[2].items():
                ia, ib = tok_to_id.get(a), tok_to_id.get(b)
                if ia is not None and ib is not None:
                    big[ia, ib] = logp
            self.lm_bigram = jnp.asarray(big)

    # ------------------------------------------------------------- offline

    def _build_fns(self):
        """Jitted phase-1 (candidates + compaction) and phase-2 (beam scan),
        cached on the instance so repeated decode_batch calls reuse the
        compiled programs."""
        if hasattr(self, '_jit_scan'):
            return

        def prep(probs, lens):
            # compaction-free path only; _prepped routes threshold < 1.0
            # through keep_map + gather_topk below
            lp_blank, cand, cand_lp = precompute_candidates(
                probs, self.blank_index, self.cutoff_top_n,
                self.cutoff_prob, self.prune_method)
            return lp_blank, cand, cand_lp, lens
        self._jit_prep = jax.jit(prep)

        def keep_map(probs, lens):
            """Phase 1a: kept-frame map from the blank column alone.

            lax.top_k(N) over [B, T, V] is a full sort (~4× the cost of the
            whole beam scan), so the vocab-sized top-k must only ever see
            frames that survive blank compaction. This pass reads one
            column, left-packs the kept frame indices, and logs the kept
            blank probs; the host then buckets T before phase 1b runs the
            top-k on the compacted rows. Same kept set / same candidates as
            compacting after the top-k — the keep decision only depends on
            the blank prob.
            """
            bsz, t_max, _ = probs.shape
            pb = probs[:, :, self.blank_index]
            keep = (pb < self.blank_skip_threshold) \
                & (jnp.arange(t_max)[None, :] < lens[:, None])
            pos = jnp.cumsum(keep, axis=1) - 1
            dst = jnp.where(keep, pos, t_max - 1)
            scat = jax.vmap(lambda d, p, s: d.at[p].set(s))
            t_iota = jnp.tile(jnp.arange(t_max, dtype=jnp.int32)[None, :],
                              (bsz, 1))
            src = scat(jnp.zeros((bsz, t_max), jnp.int32), dst, t_iota)
            lp_blank = scat(jnp.zeros((bsz, t_max), jnp.float32), dst,
                            jnp.log(jnp.maximum(pb, 1e-30)))
            raw_lens = keep.sum(axis=1).astype(jnp.int32)
            # the scan needs >= 1 active step; an all-blank utterance gets a
            # synthetic frame whose candidates gather_topk prunes to NEG_INF
            # (matching compact_candidate_frames, which leaves the frame at
            # its NEG_INF init) so the beam takes a stay-only step
            new_lens = jnp.maximum(raw_lens, 1)
            return src, lp_blank, new_lens, raw_lens
        self._jit_keep = jax.jit(keep_map)

        def gather_topk(probs, src_b, raw_lens):
            """Phase 1b: gather kept rows, then candidates (bucketed T)."""
            rows = jnp.take_along_axis(probs, src_b[:, :, None], axis=1)
            _, cand, cand_lp = precompute_candidates(
                rows, self.blank_index, self.cutoff_top_n,
                self.cutoff_prob, self.prune_method)
            t_idx = jnp.arange(src_b.shape[1], dtype=jnp.int32)
            valid = t_idx[None, :] < raw_lens[:, None]
            return cand, jnp.where(valid[:, :, None], cand_lp, NEG_INF)
        self._jit_gather_topk = jax.jit(gather_topk)

        def prep_logits(logits, lens):
            # softmax-free phase 1 (no compaction): candidates straight
            # from logits — the f32 [B, T, V] posterior never exists
            lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
            lp_blank = jnp.maximum(
                logits[..., self.blank_index].astype(jnp.float32) - lse,
                math.log(1e-30))
            cand, cand_lp = candidates_from_logits(
                logits, lse, self.blank_index, self.cutoff_top_n,
                self.cutoff_prob, self.prune_method)
            return lp_blank, cand, cand_lp, lens
        self._jit_prep_logits = jax.jit(prep_logits)

        def keep_map_logits(logits, lens):
            """Phase 1a from logits: one logsumexp reduction + the blank
            column replace the full softmax (keep decision and packed
            lp_blank identical to keep_map on softmax(logits) up to float
            rounding); the per-frame logsumexp is left-packed alongside so
            phase 1b can normalize gathered candidate logits."""
            bsz, t_max, _ = logits.shape
            lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
            lp_b = jnp.maximum(
                logits[:, :, self.blank_index].astype(jnp.float32) - lse,
                math.log(1e-30))
            keep = (lp_b < math.log(self.blank_skip_threshold)) \
                & (jnp.arange(t_max)[None, :] < lens[:, None])
            pos = jnp.cumsum(keep, axis=1) - 1
            dst = jnp.where(keep, pos, t_max - 1)
            scat = jax.vmap(lambda d, p, s: d.at[p].set(s))
            t_iota = jnp.tile(jnp.arange(t_max, dtype=jnp.int32)[None, :],
                              (bsz, 1))
            src = scat(jnp.zeros((bsz, t_max), jnp.int32), dst, t_iota)
            lp_blank = scat(jnp.zeros((bsz, t_max), jnp.float32), dst, lp_b)
            lse_packed = scat(jnp.zeros((bsz, t_max), jnp.float32), dst, lse)
            raw_lens = keep.sum(axis=1).astype(jnp.int32)
            new_lens = jnp.maximum(raw_lens, 1)
            return src, lp_blank, lse_packed, new_lens, raw_lens
        self._jit_keep_logits = jax.jit(keep_map_logits)

        def gather_topk_logits(logits, lse_packed, src_b, raw_lens):
            """Phase 1b from logits: gather kept rows (half the HBM traffic
            of the f32-posterior gather when compute dtype is bf16)."""
            rows = jnp.take_along_axis(logits, src_b[:, :, None], axis=1)
            cand, cand_lp = candidates_from_logits(
                rows, lse_packed, self.blank_index, self.cutoff_top_n,
                self.cutoff_prob, self.prune_method)
            t_idx = jnp.arange(src_b.shape[1], dtype=jnp.int32)
            valid = t_idx[None, :] < raw_lens[:, None]
            return cand, jnp.where(valid[:, :, None], cand_lp, NEG_INF)
        self._jit_gather_topk_logits = jax.jit(gather_topk_logits)

        def scan_states(lp_blank, cand, cand_lp, lens):
            bsz = lp_blank.shape[0]
            init = jax.vmap(lambda _: init_beam_state(
                self.beam_size, self.max_prefix_len))(jnp.arange(bsz))
            return _scan_candidates(
                init, lp_blank, cand, cand_lp, lens, self.cutoff_top_n,
                self.beam_size, self.lm_bigram, self.lm_unigram,
                self.alpha, self.beta, self.merge_mode,
                lm_hash=self.lm_hash)
        self._jit_scan_states = jax.jit(scan_states)
        # one packed D2H transfer for the plain decode path
        self._jit_scan = jax.jit(
            lambda *a: pack_best_hypothesis(scan_states(*a)))

    def _prepped(self, probs_batch, lens):
        """Candidate precompute + compaction + scan-length bucketing.

        With compaction on, the frame-keep map runs first (one pass over
        the blank column), the host buckets the compacted length to a
        64-frame multiple, and only then does the vocab-sized top-k run —
        on the compacted rows (typically 3-6× fewer on real speech)."""
        probs = jnp.asarray(probs_batch, jnp.float32)
        lens = jnp.asarray(np.asarray(lens), jnp.int32)
        self._build_fns()
        if self.blank_skip_threshold >= 1.0:
            return self._jit_prep(probs, lens)
        src, lp_blank, new_lens, raw_lens = self._jit_keep(probs, lens)
        t_needed = int(jnp.max(new_lens))
        bucket = min(max(64, ((t_needed + 63) // 64) * 64),
                     probs.shape[1])
        cand, cand_lp = self._jit_gather_topk(probs, src[:, :bucket],
                                              raw_lens)
        return lp_blank[:, :bucket], cand, cand_lp, new_lens

    def decode_batch(self, probs_batch, lens):
        lp_blank, cand, cand_lp, lens = self._prepped(probs_batch, lens)
        packed = self._jit_scan(lp_blank, cand, cand_lp, lens)
        return unpack_results(packed, self.vocab_list)

    def decode_batch_states(self, probs_batch, lens) -> BeamState:
        """Batch decode returning the device-resident BeamState (all K
        hypotheses), for attention rescoring."""
        lp_blank, cand, cand_lp, lens = self._prepped(probs_batch, lens)
        return self._jit_scan_states(lp_blank, cand, cand_lp, lens)

    # ------------------------------------------------- softmax-free fast path

    def _begin_from_logits(self, logits, lens):
        """Dispatch phase 1a from CTC logits WITHOUT any host sync: the
        keep-map (and the max-compacted-length reduction) are enqueued on
        the device and an opaque handle is returned. The host read of the
        compacted length happens later, in _bucket_from_logits — so a
        caller holding several batches can overlap batch i's device work
        with batch i-1's host sync (decode_batches_pipelined)."""
        logits = jnp.asarray(logits)
        lens = jnp.asarray(lens, jnp.int32)
        self._build_fns()
        if self.blank_skip_threshold >= 1.0:
            return ('nocompact', self._jit_prep_logits(logits, lens))
        src, lp_blank, lse_p, new_lens, raw_lens = \
            self._jit_keep_logits(logits, lens)
        t_needed_dev = jnp.max(new_lens)  # tiny async reduction
        return ('compact', logits, src, lp_blank, lse_p, new_lens,
                raw_lens, t_needed_dev)

    def _bucket_from_logits(self, handle):
        """Finish phase 1 for a _begin_from_logits handle: host-read the
        compacted max length (the decode path's ONE unavoidable device→host
        sync), bucket T to a 64-frame multiple, and run the vocab-sized
        top-k on the compacted rows only. Returns the scan inputs."""
        if handle[0] == 'nocompact':
            return handle[1]
        (_, logits, src, lp_blank, lse_p, new_lens, raw_lens,
         t_needed_dev) = handle
        t_needed = int(t_needed_dev)
        bucket = min(max(64, ((t_needed + 63) // 64) * 64),
                     logits.shape[1])
        cand, cand_lp = self._jit_gather_topk_logits(
            logits, lse_p[:, :bucket], src[:, :bucket], raw_lens)
        return lp_blank[:, :bucket], cand, cand_lp, new_lens

    def _prepped_from_logits(self, logits, lens):
        """Phase 1 straight from CTC logits (model.get_encoder_logits):
        same candidates/compaction as _prepped on softmax(logits), but the
        f32 [B, T, V] posterior is never materialized and the kept-row
        gather moves compute-dtype (bf16) rows."""
        return self._bucket_from_logits(self._begin_from_logits(logits,
                                                                lens))

    def decode_batch_from_logits(self, logits, lens):
        lp_blank, cand, cand_lp, lens = self._prepped_from_logits(logits,
                                                                  lens)
        packed = self._jit_scan(lp_blank, cand, cand_lp, lens)
        return unpack_results(packed, self.vocab_list)

    def decode_batches_pipelined(self, batches, fwd=None):
        """Software-pipelined batch decode over an iterable of batches,
        yielding each batch's list of (score, text) in order.

        ``batches`` yields (logits, lens) device pairs — or arbitrary
        items that ``fwd`` maps to such a pair (e.g. the jitted encoder
        call). Three batches are kept in flight: batch i+1's encoder/
        keep-map dispatches BEFORE batch i's compacted-length host sync,
        and batch i-1's packed results transfer/unpack while both compute.
        On a high-latency device link (24-43 ms/round-trip through the
        axon tunnel) the per-batch syncs otherwise serialize with compute
        and dominate short-utterance eval (VERDICT r4:
        eval_pipeline_throughput_trained)."""
        from collections import deque
        pend_bucket = deque()   # handles awaiting the length sync + scan
        pend_unpack = deque()   # packed device buffers awaiting host read
        for item in batches:
            pair = fwd(item) if fwd is not None else item
            pend_bucket.append(self._begin_from_logits(*pair))
            if len(pend_bucket) >= 2:
                packed = self._jit_scan(
                    *self._bucket_from_logits(pend_bucket.popleft()))
                pend_unpack.append(packed)
            if len(pend_unpack) >= 2:
                yield unpack_results(pend_unpack.popleft(),
                                     self.vocab_list)
        while pend_bucket:
            pend_unpack.append(self._jit_scan(
                *self._bucket_from_logits(pend_bucket.popleft())))
        while pend_unpack:
            yield unpack_results(pend_unpack.popleft(), self.vocab_list)

    def decode_batch_states_from_logits(self, logits, lens) -> BeamState:
        lp_blank, cand, cand_lp, lens = self._prepped_from_logits(logits,
                                                                  lens)
        return self._jit_scan_states(lp_blank, cand, cand_lp, lens)

    def decode(self, probs):
        probs = np.asarray(probs)
        return self.decode_batch(probs[None], [probs.shape[0]])[0]

    # ------------------------------------------------------------ streaming

    def reset(self):
        self._state = None
        self._last_result = None

    def decode_chunk(self, chunk_probs):
        probs = np.asarray(chunk_probs, np.float32)
        if probs.size and self.blank_skip_threshold < 1.0:
            # per-chunk blank-frame skip (host-side; chunk is tiny)
            probs = probs[probs[:, self.blank_index]
                          < self.blank_skip_threshold]
        if probs.size:
            if self._state is None:
                self._state = jax.vmap(
                    lambda _: init_beam_state(self.beam_size,
                                              self.max_prefix_len))(
                    jnp.arange(1))
            if not hasattr(self, '_jit_continue'):
                def cont(state, probs, lens):
                    new = ctc_beam_search_jax_continue(
                        state, probs, lens,
                        blank=self.blank_index, beam_size=self.beam_size,
                        cutoff_top_n=self.cutoff_top_n,
                        cutoff_prob=self.cutoff_prob,
                        lm_bigram=self.lm_bigram,
                        lm_unigram=self.lm_unigram,
                        alpha=self.alpha, beta=self.beta,
                        max_prefix_len=self.max_prefix_len,
                        merge_mode=self.merge_mode,
                        lm_hash=self.lm_hash)
                    return new, pack_best_hypothesis(new)
                self._jit_continue = jax.jit(cont)
            # pad the chunk to a 16-frame bucket so one compiled program
            # serves every chunk; padded frames are masked via lens
            t = probs.shape[0]
            cap = ((t + 15) // 16) * 16
            padded = np.zeros((cap, probs.shape[1]), np.float32)
            padded[:t] = probs
            self._state, packed = self._jit_continue(
                self._state, jnp.asarray(padded[None]),
                jnp.asarray([t], jnp.int32))
            self._last_result = unpack_results(packed, self.vocab_list)[0]
        return self.current()

    def current(self):
        if self._state is None:
            return 0.0, ''
        if getattr(self, '_last_result', None) is not None:
            return self._last_result
        return beam_state_to_results(self._state, self.vocab_list)[0]
