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


def _enable_persistent_compile_cache():
    """Persistent XLA compilation cache, on by default for every entry
    point that imports ppasr_tpu.

    Compiles through a remote-device tunnel cost 20-40 s EACH; a training
    run touches a dozen bucket shapes × (train/eval/loss) programs, so a
    watchdog restart used to repay ~10 min of compiles before the first
    step. With the cache, restarts and repeated CLI runs (eval/export/
    predict) reload compiled programs in <1 s (measured 38.5 s → 0.77 s
    across processes on the axon backend). Override the location with
    PPASR_JAX_CACHE=<dir>; disable with PPASR_JAX_CACHE=0."""
    import os
    loc = os.environ.get('PPASR_JAX_CACHE')
    if loc == '0':
        return
    import jax
    try:
        jax.config.update(
            'jax_compilation_cache_dir',
            loc or os.path.expanduser('~/.cache/ppasr_jax'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:  # very old jax without the option: run uncached
        pass


_enable_persistent_compile_cache()
