"""Benchmark: flagship streaming-conformer offline encode throughput on one
chip, in audio-seconds per second per chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference publishes no throughput numbers; the only speed
figure is the docs' eval log — 45 batches in ~10 s for conformer_online
eval (≈4.5 batch/s × 16 utts × ~10 s audio ≈ 720 audio-s/s, GPU CC 7.5,
/root/reference/docs/eval.md). vs_baseline is measured against that 720
audio-s/s estimate.
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_AUDIO_S_PER_S = 720.0


def main():
    from ppasr_tpu.models.factory import build_model

    model = build_model(
        'conformer', 80, 4096, streaming=True,
        encoder_conf=dict(output_size=256, attention_heads=4,
                          linear_units=2048, num_blocks=12,
                          cnn_module_kernel=15),
        decoder_conf=dict(attention_heads=4, linear_units=1024,
                          num_blocks=3, r_num_blocks=3),
        model_conf=dict(ctc_weight=0.3, lsm_weight=0.1, reverse_weight=0.3))

    rng = jax.random.PRNGKey(0)
    bsz, frames = 16, 1000  # 16 × 10 s utterances (100 frames/s)
    speech = jnp.asarray(
        np.random.default_rng(0).standard_normal((bsz, frames, 80)) * 0.3,
        jnp.float32)
    lens = jnp.full((bsz,), frames, jnp.int32)
    text = jnp.tile(jnp.asarray([[1, 2, 3, -1]], jnp.int32), (bsz, 1))
    tlens = jnp.full((bsz,), 3, jnp.int32)

    params = model.init({'params': rng, 'dropout': rng, 'chunk': rng},
                        speech[:1, :128], lens[:1], text[:1], tlens[:1],
                        deterministic=False)

    fwd = jax.jit(lambda p, s, l: model.apply(p, s, l,
                                              method='get_encoder_out'))
    # warm-up / compile; fetch to host — on the axon tunnel
    # block_until_ready returns before execution finishes, so a small
    # device→host transfer is the reliable fence.
    out = fwd(params, speech, lens)
    _ = np.asarray(out[0][0, 0, :4])

    iters = 10
    start = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, speech, lens)
    _ = np.asarray(out[0][0, 0, :4])  # fence: queue is serialized
    elapsed = time.perf_counter() - start

    audio_seconds = bsz * (frames / 100.0) * iters
    value = audio_seconds / elapsed
    print(json.dumps({
        "metric": "offline_encode_throughput_conformer256x12",
        "value": round(value, 2),
        "unit": "audio-seconds/s/chip",
        "vs_baseline": round(value / BASELINE_AUDIO_S_PER_S, 3),
    }))


if __name__ == '__main__':
    main()
