"""ppasr_tpu — a TPU-native (JAX/XLA/Pallas) streaming + offline ASR framework.

Brand-new implementation with the capability surface of PPASR
(reference: /root/reference, surveyed in SURVEY.md), re-designed for TPU:
models are pure JAX functions compiled with jit/pjit, streaming state is
explicit and device-resident, decoding is vectorized XLA, and scale-out is
expressed with jax.sharding meshes.
"""

__version__ = "0.1.0"

# Parity with reference ppasr/__init__.py:3 (SUPPORT_MODEL list).
SUPPORT_MODEL = ['squeezeformer', 'efficient_conformer', 'conformer', 'deepspeech2']
