"""Train step machinery: train state, jitted step with grad accumulation,
data-parallel sharding.

Replaces the reference's fleet/DDP wrapper (ppasr/trainer.py:529-544,
369-394): gradients are averaged by pjit-inserted collectives over the
``data`` mesh axis instead of NCCL allreduce; grad accumulation runs as a
``lax.scan`` over micro-batches inside one compiled step (the reference's
``no_sync`` dance is unnecessary — the psum happens once per step by
construction).
"""
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_train_state(params, tx) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))


def make_train_step(model, tx, accum_grad: int = 1, frontend=None):
    """Build the jitted train step.

    The step takes micro-batched arrays shaped [accum, B, ...] and scans over
    the leading axis, averaging gradients — one optimizer update per call
    (reference grad-accum contract, trainer.py:369-394).

    ``frontend`` (ops/frontend.make_device_frontend): when set, batches carry
    raw waveforms ('wav' [accum, B, S], 'wav_lens' [accum, B]) and the
    fbank + dither + SpecAugment stage runs on device inside the step —
    its gradient is stopped (features are data, not parameters)."""

    def loss_fn(params, batch, rngs):
        if frontend is not None and 'wav' in batch:
            # waveforms arrive int16 (half the host→device bytes of the
            # every-step audio transfer); the frontend computes in f32
            wav = batch['wav']
            if not jnp.issubdtype(wav.dtype, jnp.floating):
                wav = wav.astype(jnp.float32)
            feat, feat_lens = frontend(wav, batch['wav_lens'],
                                       rngs.pop('frontend'),
                                       deterministic=False)
            speech = jax.lax.stop_gradient(feat)
            speech_lens = feat_lens
        else:
            speech, speech_lens = batch['speech'], batch['speech_lens']
        out = model.apply(params, speech, speech_lens,
                          batch['text'], batch['text_lens'],
                          deterministic=False, rngs=rngs)
        metrics = {k: (v if v is not None else jnp.zeros(()))
                   for k, v in out.items()}
        return out['loss'], metrics

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, batches, rng):
        """batches: pytree of [accum, B, ...] arrays."""
        def micro_rngs(i):
            step_rng = jax.random.fold_in(rng, i)
            rngs = {'dropout': step_rng,
                    'chunk': jax.random.fold_in(step_rng, 1)}
            if frontend is not None:
                rngs['frontend'] = jax.random.fold_in(step_rng, 2)
            return rngs

        if accum_grad == 1:
            # fast path: no accumulation scan — skips the zero-init /
            # add / divide passes over the gradient buffers (~3 full
            # HBM sweeps of the parameter size per step)
            batch = jax.tree.map(lambda x: x[0], batches)
            (_, metrics), grads = grad_fn(state.params, batch,
                                          micro_rngs(0))
        else:
            def micro(carry, inp):
                acc_grads, i = carry
                (loss, metrics), grads = grad_fn(state.params, inp,
                                                 micro_rngs(i))
                acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
                return (acc_grads, i + 1), metrics

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (grads, _), metrics = jax.lax.scan(
                micro, (zero_grads, jnp.zeros((), jnp.int32)), batches)
            grads = jax.tree.map(lambda g: g / accum_grad, grads)
        metrics = jax.tree.map(lambda m: m.mean(), metrics)

        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               opt_state=new_opt_state)
        return new_state, metrics

    return train_step


def data_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over all local devices (DP over ICI/DCN —
    SURVEY.md §2.2)."""
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ('data',))


def shard_batch(mesh: Mesh, batch, batch_axis: int = 0):
    """Place batch arrays with dim ``batch_axis`` sharded over 'data'
    (axis 1 for [accum, B, ...] micro-batched training arrays, axis 0 for
    plain eval batches). Multi-host: each process passes its LOCAL shard
    (from the distributed sampler) and the global array is assembled with
    make_array_from_process_local_data — data rides ICI/DCN, never a single
    host."""
    multihost = jax.process_count() > 1

    def put(x):
        spec = [None] * x.ndim
        spec[batch_axis] = 'data'
        sharding = NamedSharding(mesh, P(*spec))
        if multihost:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)
    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
