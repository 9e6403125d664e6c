"""Shared model plumbing: initializers, activations, CMVN.

Init parity with reference ppasr/model_utils/utils/base.py:7-138 (Linear/Conv
KaimingUniform, LayerNorm ones/zeros — flax LayerNorm defaults already match)
and cmvn.py:4-32 (GlobalCMVN (x-mean)*istd baked from mean_istd.json).
"""
import flax.linen as nn
import jax.numpy as jnp

# KaimingUniform (fan_in, relu gain) — the reference's Linear/Conv kernel init.
kaiming_uniform = nn.initializers.variance_scaling(
    2.0, "fan_in", "uniform")


def scaled_kaiming(scale: float):
    """KaimingUniform with the element std multiplied by ``scale``.

    Used for depth-scaled residual initialization: the OUTPUT projection of
    every residual branch is initialized with scale = (2·num_blocks)^-1/2
    so a fresh deep encoder behaves like a shallow one. Without it a 12-
    block conformer needs ~5-10x more updates than a 4-block one before
    CTC escapes the all-blank optimum (measured with tools/probe_overfit:
    128x4 escapes at ~300 updates, 128x12 and 256x12 are still blank at
    900); with it deep stacks escape like shallow ones. Training-dynamics
    fix in the spirit of DeepNet/GPT-2 residual scaling — final converged
    quality is unchanged, reference parity is behavioral (the reference's
    paddle KaimingUniform everywhere corresponds to scale=1.0)."""
    if scale == 1.0:
        return kaiming_uniform
    return nn.initializers.variance_scaling(
        2.0 * scale * scale, "fan_in", "uniform")


def symmetric_uniform(scale: float):
    """Uniform(−scale, scale) initializer — the Squeezeformer paper's
    scale-aware init (reference squeezeformer/*.py init_weights), required
    for stable POST-LayerNorm training."""
    def init(key, shape, dtype=jnp.float32):
        import jax
        return jax.random.uniform(key, shape, dtype, -scale, scale)
    return init


def get_activation(name: str):
    """Activation registry (reference common.py:189-205, incl. swish/gelu)."""
    acts = {
        "hardtanh": nn.hard_tanh,
        "tanh": nn.tanh,
        "relu": nn.relu,
        "gelu": nn.gelu,
        "swish": nn.swish,
    }
    if name not in acts:
        raise ValueError(f"unsupported activation: {name}")
    return acts[name]


class GlobalCMVN(nn.Module):
    """(x - mean) * istd with constants baked at model build
    (reference cmvn.py:4-32); not trainable parameters."""
    mean: tuple
    istd: tuple

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(self.mean, x.dtype)
        istd = jnp.asarray(self.istd, x.dtype)
        return (x - mean) * istd




class Dropout(nn.Module):
    """Drop-in replacement for ``flax.linen.Dropout`` that draws the keep
    mask from uint8 random bits instead of 32-bit bernoulli words.

    Dropout is the only consumer of device RNG in training and mask-bit
    generation is pure bandwidth: threefry masks once cost as much as the
    whole fwd+bwd at B=32, the hardware rbg generator brought that to
    ~2.5 ms/step, and 8-bit draws quarter the generated bits again. The
    keep probability is quantized to q/256 and kept values are divided by
    exactly q/256, so the estimator stays unbiased (the realized dropout
    rate moves by <0.2% absolute, irrelevant to regularization).
    """
    rate: float
    deterministic: bool = None

    @nn.compact
    def __call__(self, x, deterministic=None):
        deterministic = nn.merge_param(
            'deterministic', self.deterministic, deterministic)
        if deterministic or self.rate == 0.0:
            return x
        if self.rate >= 1.0:
            return jnp.zeros_like(x)
        q = min(255, max(1, round((1.0 - self.rate) * 256)))
        keep_prob = q / 256.0
        import jax
        bits = jax.random.bits(self.make_rng('dropout'), x.shape,
                               dtype=jnp.uint8)
        return jnp.where(bits < q, x / keep_prob,
                         jnp.zeros((), x.dtype)).astype(x.dtype)
