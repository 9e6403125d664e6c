"""On-device training frontend: raw audio → fbank → SpecAugment, inside jit.

TPU-first replacement for the host featurize hot loop (reference
ppasr/data_utils/reader.py:52-77 runs kaldi fbank + SpecAugment per utterance
in DataLoader worker subprocesses). Host featurization tops out at a few
hundred audio-s/s/core while the train step consumes ~9k audio-s/s/chip, so
a raw-audio pipeline is reader-bound by an order of magnitude. Moving the
frontend into the jitted train step turns the host's job into "read wavs,
apply cheap sample-domain augmentation, pad" and runs framing/FFT/mel on the
MXU (batched fbank measures ~40-50k audio-s/s on v5e — ops/fbank.py,
bench.py frontend bench).

Semantics mirror the host pipeline exactly where it matters for parity:
- fbank: same kaldi math as ops/fbank.fbank_numpy (shared constants), with
  per-framed-sample Gaussian dither under training like
  _preprocess_frames (reference audio_featurizer.py:120-138 dithers only in
  train mode).
- SpecAugment (reference ppasr/data_utils/augmentor/spec_augment.py:49-145
  via data/augmentor/feature_augmentors.py): time warp ±w frames around a
  random center (linear interp), n_freq_masks/n_time_masks rectangular
  masks filled with the utterance mean (replace_with_zero=False) or zero.
  Randomness is PER UTTERANCE (the host path draws per utterance too).
- SpecSub (reference spec_sub.py:31-40): copy an earlier span over a later
  one, num_t_sub rounds, reading from the ORIGINAL features each round.

Everything is static-shaped: masks/warps are built from integer arithmetic
on arange(T) compared against traced scalars — no dynamic slicing, no
data-dependent control flow (SURVEY.md §7.3 "dynamic-chunk randomized mask
inside jit" discipline).
"""
import jax
import jax.numpy as jnp

from ppasr_tpu.ops.fbank import fbank_jax


def _time_warp_indices(rng, t_len, max_t: int, max_warp: int):
    """Per-utterance piecewise-linear source positions for SpecAugment time
    warp over a static [0, max_t) axis.

    Host reference (feature_augmentors.py:31-48): pick center ∈ [w, t-w),
    move it to warped = center + U[-w, w], stretch [0, center) over
    [0, warped) and [center, t-1] over [warped, t). Frames ≥ t_len map to
    themselves (identity on padding)."""
    r_center, r_shift = jax.random.split(rng)
    t_len = jnp.maximum(t_len, 1)
    # center ∈ [w, t_len - w) when possible; else disable (identity)
    enabled = t_len - max_warp > max_warp
    span = jnp.maximum(t_len - 2 * max_warp, 1)
    center = max_warp + jax.random.randint(r_center, (), 0, 1 << 30) % span
    warped = center + jax.random.randint(r_shift, (), -max_warp,
                                         max_warp + 1)
    warped = jnp.clip(warped, 1, t_len - 1)

    i = jnp.arange(max_t)
    left = i.astype(jnp.float32) * (center.astype(jnp.float32)
                                    / warped.astype(jnp.float32))
    right = (center + (i - warped).astype(jnp.float32)
             * ((t_len - 1 - center).astype(jnp.float32)
                / jnp.maximum(t_len - warped, 1).astype(jnp.float32)))
    src = jnp.where(i < warped, left, right)
    src = jnp.clip(src, 0.0, (t_len - 1).astype(jnp.float32))
    # identity outside the valid region (and when too short to warp)
    return jnp.where((i < t_len) & enabled, src, i.astype(jnp.float32))


def _apply_warp(x, src):
    """Linear-interp gather of [T, D] rows at float positions [T]."""
    idx0 = jnp.floor(src).astype(jnp.int32)
    idx1 = jnp.minimum(idx0 + 1, x.shape[0] - 1)
    frac = (src - idx0.astype(jnp.float32))[:, None].astype(x.dtype)
    return x[idx0] * (1 - frac) + x[idx1] * frac


def _rand_span(rng, limit, max_width):
    """(start, width) with width ∈ [0, max_width], start ∈ [0, limit-width)."""
    r_w, r_s = jax.random.split(rng)
    width = jax.random.randint(r_w, (), 0, 1 << 30) % (max_width + 1)
    start_span = jnp.maximum(limit - width, 1)
    start = jax.random.randint(r_s, (), 0, 1 << 30) % start_span
    return start, width


def spec_augment_device(feat, feat_lens, rng,
                        max_time_warp: int = 5, max_t_ratio: float = 0.05,
                        n_freq_masks: int = 2, max_f_ratio: float = 0.15,
                        n_time_masks: int = 2,
                        replace_with_zero: bool = False,
                        spec_sub_max_t: int = 0, spec_sub_num: int = 0):
    """Batched on-device SpecAugment (+ optional SpecSub): [B, T, D] → same.

    All randomness comes from ``rng``; per-utterance keys via fold_in."""
    bsz, max_t, d = feat.shape
    t_idx = jnp.arange(max_t)

    def one(x, t_len, key):
        t_len = jnp.maximum(t_len.astype(jnp.int32), 1)
        keys = jax.random.split(key, 2 + n_freq_masks + n_time_masks
                                + spec_sub_num)
        k = iter(range(len(keys)))

        if max_time_warp > 0:
            src = _time_warp_indices(keys[next(k)], t_len, max_t,
                                     max_time_warp)
            x = _apply_warp(x, src)
        else:
            next(k)

        valid = (t_idx < t_len)[:, None]
        if replace_with_zero:
            fill = jnp.zeros((), x.dtype)
        else:
            fill = (jnp.sum(jnp.where(valid, x, 0.0))
                    / (t_len.astype(x.dtype) * d))
        next(k)  # reserved

        max_f = int(d * max_f_ratio)
        for _ in range(n_freq_masks):
            start, width = _rand_span(keys[next(k)], d, max_f)
            f_idx = jnp.arange(d)
            mask = (f_idx >= start) & (f_idx < start + width)
            x = jnp.where(mask[None, :] & valid, fill, x)

        for _ in range(n_time_masks):
            max_w = (t_len.astype(jnp.float32)
                     * max_t_ratio).astype(jnp.int32)
            start, width = _rand_span(keys[next(k)], t_len,
                                      jnp.maximum(max_w, 0))
            mask = (t_idx >= start) & (t_idx < start + width) & (t_idx < t_len)
            x = jnp.where(mask[:, None], fill, x)

        if spec_sub_num > 0:
            orig = x
            for _ in range(spec_sub_num):
                kk = jax.random.split(keys[next(k)], 3)
                start = jax.random.randint(kk[0], (), 0, 1 << 30) % t_len
                length = 1 + jax.random.randint(kk[1], (), 0, 1 << 30) \
                    % spec_sub_max_t
                pos = jax.random.randint(kk[2], (), 0, 1 << 30) \
                    % jnp.maximum(start + 1, 1)
                end = jnp.minimum(t_len, start + length)
                mask = (t_idx >= start) & (t_idx < end)
                shifted = orig[jnp.maximum(t_idx - pos, 0)]
                x = jnp.where(mask[:, None], shifted, x)
        return x

    keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(jnp.arange(bsz))
    return jax.vmap(one)(feat, feat_lens, keys)


def make_device_frontend(preprocess_conf: dict, augment_configs=None,
                         train: bool = True):
    """Build ``frontend(wav, wav_lens, rng, deterministic) → (feat, lens)``.

    ``preprocess_conf`` is the YAML preprocess_conf dict (feature_method must
    be 'fbank' — the only method the device training frontend supports).
    ``augment_configs`` is the parsed augmentation.json list; the specaug /
    specsub entries configure the device feature augmentation (audio-domain
    entries are applied on host by the raw-mode dataset). Stage ``prob`` is
    honored per utterance via bernoulli draws."""
    conf = dict(preprocess_conf or {})
    method = conf.get('feature_method', 'fbank')
    if method != 'fbank':
        raise ValueError(
            f"device frontend supports feature_method='fbank' only, got "
            f"{method!r} — use the host pipeline for mfcc/linear")
    n_mels = int(conf.get('n_mels', 80))
    sample_rate = int(conf.get('sample_rate', 16000))

    spec_conf, sub_conf = None, None
    spec_prob, sub_prob = 0.0, 0.0
    for spec in (augment_configs or []):
        if spec.get('aug_type') != 'feature':
            continue
        if spec.get('type') == 'specaug':
            spec_conf = dict(spec.get('params', {}))
            spec_conf.pop('inplace', None)
            spec_prob = float(spec.get('prob', 0.0))
        elif spec.get('type') == 'specsub':
            sub_conf = dict(spec.get('params', {}))
            sub_prob = float(spec.get('prob', 0.0))

    def frontend(wav, wav_lens, rng=None, deterministic: bool = False):
        """[B, S] int16-scaled float waveforms + [B] sample counts →
        ([B, T, n_mels] f32 log-mel, [B] i32 frame counts)."""
        dither_rng = None
        dither = 0.0
        if train and not deterministic and rng is not None:
            rng, dither_rng = jax.random.split(rng)
            dither = 1.0
        feat, feat_lens = fbank_jax(
            wav, wav_lens, sample_rate=sample_rate, num_mel_bins=n_mels,
            dither=dither, dither_rng=dither_rng)
        if deterministic or rng is None:
            return feat, feat_lens

        if spec_conf is not None or sub_conf is not None:
            rng, aug_rng, p_rng = jax.random.split(rng, 3)
            kwargs = {}
            if spec_conf is not None:
                kwargs.update(spec_conf)
            if sub_conf is not None:
                kwargs['spec_sub_max_t'] = int(sub_conf.get('max_t', 30))
                kwargs['spec_sub_num'] = int(sub_conf.get('num_t_sub', 3))
            augmented = spec_augment_device(feat, feat_lens, aug_rng,
                                            **kwargs)
            # per-utterance stage probability (host pipeline draws one
            # bernoulli per stage per utterance — augmentation.py:58-62).
            # One draw gates specaug+specsub together: they're both
            # prob 1.0 in the stock config, and splitting would cost a
            # second full where-select pass over [B, T, D].
            prob = max(spec_prob, sub_prob)
            if prob >= 1.0:
                feat = augmented
            elif prob > 0.0:
                take = jax.random.bernoulli(p_rng, prob, (feat.shape[0],))
                feat = jnp.where(take[:, None, None], augmented, feat)
        return feat, feat_lens

    return frontend
