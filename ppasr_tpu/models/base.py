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


