"""Memorization probe: can the production pipeline drive train-CER to ~0
on a tiny subset?

Diagnostic ladder for accuracy-collapse hunts (the reference's only
correctness harness is a CER table, /root/reference/README.md:118-150, so
when CER is stuck at 1.0 the first question is whether data → features →
model → CTC → greedy decode can memorize at all). This tool takes N
utterances from a manifest, builds ONE fixed batch through the real
ASRDataset/collate path, runs the real jitted train step, and reports the
greedy train-CER trajectory. A healthy pipeline memorizes 16 one-second
utterances to CER ~0 within a few hundred steps; a pipeline with a
data/label/feature bug never gets below the unigram floor (~0.65).

Usage:
    python tools/probe_overfit.py --manifest dataset/manifest.train \
        --vocab dataset/vocabulary.txt --mean_istd dataset/mean_istd.json \
        --n_utts 16 --steps 400 --use_model conformer --streaming false
"""
import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ppasr_tpu.utils.common import add_arguments, print_arguments


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    add_arg = functools.partial(add_arguments, argparser=parser)
    add_arg('manifest', str, 'dataset/manifest.train', 'manifest to probe')
    add_arg('vocab', str, 'dataset/vocabulary.txt', 'vocabulary file')
    add_arg('mean_istd', str, 'dataset/mean_istd.json', 'CMVN stats')
    add_arg('n_utts', int, 16, 'number of utterances to memorize')
    add_arg('batch_size', int, 0, 'batch size (0 = single batch of n_utts)')
    add_arg('heldout_manifest', str, '', 'manifest for a generalization '
            'probe (e.g. manifest.test); decoded alongside train CER')
    add_arg('heldout_n', int, 64, 'held-out utterances to decode')
    add_arg('skip', int, 0, 'skip the first N manifest entries')
    add_arg('steps', int, 400, 'training steps')
    add_arg('probe_every', int, 50, 'decode the batch every N steps')
    add_arg('use_model', str, 'conformer', 'model family')
    add_arg('streaming', bool, False, 'streaming (dynamic-chunk) mode')
    add_arg('ctc_weight', float, 1.0, 'CTC weight (1.0 = pure CTC)')
    add_arg('learning_rate', float, 1e-3, 'Adam learning rate')
    add_arg('warmup_steps', int, 100, 'LR warmup steps')
    add_arg('num_blocks', int, 4, 'encoder blocks')
    add_arg('output_size', int, 128, 'encoder width')
    add_arg('linear_units', int, 0, 'encoder FFN width (0 = 4x output)')
    add_arg('dec_blocks', int, 1, 'decoder blocks (and r_blocks)')
    add_arg('encoder_opts', str, '', 'extra encoder_conf JSON overrides')
    add_arg('augment_conf', str, '', 'augmentation JSON ("" = off)')
    add_arg('device_frontend', bool, False, 'raw-waveform device frontend')
    add_arg('dropout', float, 0.1, 'dropout rate')
    add_arg('amp', bool, False, 'bfloat16 activations (trainer enable_amp)')
    add_arg('accum_grad', int, 1, 'gradient accumulation (trainer parity)')
    add_arg('trainer_opt', bool, False, 'use the production optimizer '
            'stack (build_optimizer: WarmupLR decay, weight decay, clip)')
    add_arg('rbg', bool, False, 'rbg step keys (trainer parity)')
    args = parser.parse_args()
    print_arguments(args=args)

    import jax
    import jax.numpy as jnp
    import optax

    from ppasr_tpu.data.dataset import ASRDataset, collate_fn
    from ppasr_tpu.decoders.greedy import greedy_decoder_batch
    from ppasr_tpu.models.factory import build_model
    from ppasr_tpu.train_state import TrainState, make_train_step
    from ppasr_tpu.utils.metrics import cer

    aug = None
    if args.augment_conf:
        with open(args.augment_conf, encoding='utf-8') as f:
            aug = json.load(f)
    # production contract (trainer._build_dataset): the dataset yields RAW
    # features; CMVN is applied exactly once, inside the model (GlobalCMVN
    # baked from mean_istd). Passing mean_istd to BOTH would double-normalize
    # and crush the acoustic signal ~20x below the positional encoding.
    dataset = ASRDataset(manifest_path=args.manifest,
                         vocab_filepath=args.vocab,
                         mean_istd_filepath=None,
                         preprocess_conf={'feature_method': 'fbank',
                                          'n_mels': 80,
                                          'sample_rate': 16000,
                                          'use_dB_normalization': True,
                                          'target_dB': -20},
                         augmentation_config=aug,
                         train=True,
                         return_raw=args.device_frontend)
    if args.batch_size > 0:
        # spread over the duration-sorted manifest so all lengths appear
        stride = max(1, (len(dataset) - args.skip) // args.n_utts)
        idxs = list(range(args.skip, len(dataset), stride))[:args.n_utts]
    else:
        idxs = list(range(args.skip, args.skip + args.n_utts))
    items = [dataset[i] for i in idxs]
    texts = [dataset.entry(i)['text'] for i in idxs]
    vocab_list = dataset.vocab_list

    if args.device_frontend:
        from ppasr_tpu.data.dataset import collate_raw_fn
        from ppasr_tpu.ops.frontend import make_device_frontend
        wavs, labels, wav_lens, label_lens = collate_raw_fn(items,
                                                            shuffle=False)
        frontend = make_device_frontend(
            preprocess_conf={'feature_method': 'fbank', 'n_mels': 80,
                             'sample_rate': 16000,
                             'use_dB_normalization': True,
                             'target_dB': -20},
            augment_configs=aug or [])
        batch = {'wav': jnp.asarray(wavs)[None],
                 'wav_lens': jnp.asarray(wav_lens, jnp.int32)[None],
                 'text': jnp.asarray(labels)[None],
                 'text_lens': jnp.asarray(label_lens, jnp.int32)[None]}
        batches = [batch]
        import jax as _jax
        feats, feat_lens = frontend(jnp.asarray(wavs, jnp.float32),
                                    jnp.asarray(wav_lens, jnp.int32),
                                    _jax.random.PRNGKey(0),
                                    deterministic=True)
        probe_speech, probe_lens = feats, feat_lens
    else:
        frontend = None
        # single static shape: pad every batch to the pool max (the probe
        # optimizes for one compile through the slow device tunnel)
        max_t = max(f.shape[0] for f, _ in items)
        max_u = max(len(t) for _, t in items)
        bsz = args.batch_size or args.n_utts
        batches = []
        for off in range(0, len(items) - bsz + 1, bsz):
            inputs, labels, input_lens, label_lens = collate_fn(
                items[off:off + bsz], shuffle=False,
                pad_to=(max_t, max_u))
            batches.append({
                'speech': jnp.asarray(inputs)[None],
                'speech_lens': jnp.asarray(input_lens, jnp.int32)[None],
                'text': jnp.asarray(labels)[None],
                'text_lens': jnp.asarray(label_lens, jnp.int32)[None]})
        batch = batches[0]
        n_probe = min(len(items), 64)
        p_inputs, _, p_lens, _ = collate_fn(items[:n_probe], shuffle=False,
                                            pad_to=(max_t, max_u))
        probe_speech = jnp.asarray(p_inputs)
        probe_lens = jnp.asarray(p_lens, jnp.int32)
        texts = texts[:n_probe]

    heldout = None
    if args.heldout_manifest:
        hd = ASRDataset(manifest_path=args.heldout_manifest,
                        vocab_filepath=args.vocab,
                        mean_istd_filepath=None,
                        preprocess_conf={'feature_method': 'fbank',
                                         'n_mels': 80,
                                         'sample_rate': 16000,
                                         'use_dB_normalization': True,
                                         'target_dB': -20},
                        train=False)
        stride = max(1, len(hd) // args.heldout_n)
        h_idx = list(range(0, len(hd), stride))[:args.heldout_n]
        h_items = [hd[i] for i in h_idx]
        h_texts = [hd.entry(i)['text'] for i in h_idx]
        h_max_t = max(f.shape[0] for f, _ in h_items)
        h_in, _, h_lens, _ = collate_fn(h_items, shuffle=False,
                                        pad_to=(h_max_t, 1))
        heldout = (jnp.asarray(h_in), jnp.asarray(h_lens, jnp.int32),
                   h_texts)

    enc_conf = {'output_size': args.output_size,
                'attention_heads': 4,
                'linear_units': args.linear_units
                or args.output_size * 4,
                'num_blocks': args.num_blocks,
                'dropout_rate': args.dropout,
                'positional_dropout_rate': args.dropout,
                'attention_dropout_rate': args.dropout,
                'cnn_module_kernel': 15}
    if args.encoder_opts:
        enc_conf.update(json.loads(args.encoder_opts))
    model = build_model(
        args.use_model, 80, dataset.vocab_size, streaming=args.streaming,
        encoder_conf=enc_conf
        if args.use_model != 'deepspeech2' else
        {'num_rnn_layers': 3, 'rnn_size': args.output_size},
        decoder_conf={} if args.ctc_weight >= 1.0 or
        args.use_model == 'deepspeech2' else
        {'attention_heads': 4, 'linear_units': args.output_size * 4,
         'num_blocks': args.dec_blocks, 'r_num_blocks': args.dec_blocks},
        model_conf={} if args.use_model == 'deepspeech2' else
        {'ctc_weight': args.ctc_weight, 'lsm_weight': 0.1,
         'reverse_weight': 0.3 if args.dec_blocks > 1 else 0.0},
        mean_istd_path=args.mean_istd,
        dtype=__import__('jax.numpy', fromlist=['bfloat16']).bfloat16
        if args.amp else __import__('jax.numpy', fromlist=['float32']).float32)

    rng = jax.random.PRNGKey(0)
    b0 = jax.tree.map(lambda x: x[0], batches[0])
    params = model.init(
        {'params': rng, 'dropout': rng, 'chunk': rng},
        b0.get('speech', probe_speech),
        b0.get('speech_lens', probe_lens),
        b0['text'], b0['text_lens'],
        deterministic=False)
    if args.trainer_opt:
        from ppasr_tpu.optimizer.factory import build_optimizer
        tx, _ = build_optimizer(
            {'optimizer': 'Adam', 'weight_decay': 1e-6,
             'learning_rate': args.learning_rate,
             'scheduler': 'WarmupLR',
             'scheduler_conf': {'warmup_steps': args.warmup_steps,
                                'min_lr': 1e-5}}, grad_clip=5.0)
    else:
        schedule = optax.join_schedules(
            [optax.linear_schedule(0.0, args.learning_rate,
                                   args.warmup_steps),
             optax.constant_schedule(args.learning_rate)],
            [args.warmup_steps])
        tx = optax.chain(optax.clip_by_global_norm(5.0),
                         optax.adam(schedule))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    if args.accum_grad > 1:
        # regroup [1, B, ...] microbatches into [accum, B/accum, ...]
        def regroup(b):
            return jax.tree.map(
                lambda x: x.reshape(args.accum_grad,
                                    x.shape[1] // args.accum_grad,
                                    *x.shape[2:]), b)
        batches = [regroup(b) for b in batches]
    step_fn = jax.jit(make_train_step(model, tx,
                                      accum_grad=args.accum_grad,
                                      frontend=frontend))

    @jax.jit
    def encode(params, speech, lens):
        return model.apply(params, speech, lens,
                           method=model.get_encoder_out)

    def decode_cer(params, speech, lens, refs):
        probs, out_lens = encode(params, speech, lens)
        results = greedy_decoder_batch(probs,
                                       np.asarray(out_lens), vocab_list)
        cers = [cer(hyp, ref) for (score, hyp), ref in zip(results, refs)]
        return float(np.mean(cers)), results

    def probe(params):
        return decode_cer(params, probe_speech, probe_lens, texts)

    run_rng = jax.random.key(1000, impl='rbg') if args.rbg else None
    t0 = time.time()
    for step in range(1, args.steps + 1):
        batch = batches[(step - 1) % len(batches)]
        if run_rng is not None:
            run_rng, step_rng = jax.random.split(run_rng)
        else:
            step_rng = jax.random.PRNGKey(step)
        state, metrics = step_fn(state, batch, step_rng)
        if step % args.probe_every == 0 or step == args.steps:
            train_cer, results = probe(state.params)
            h_msg = ''
            if heldout is not None:
                h_cer, h_res = decode_cer(state.params, *heldout)
                h_msg = f" heldout_cer {h_cer:.4f}"
            print(f"step {step:5d} loss {float(metrics['loss']):9.3f} "
                  f"train_cer {train_cer:.4f}{h_msg} "
                  f"({time.time() - t0:.0f}s)", flush=True)
            print(f"    ref: {texts[0]}")
            print(f"    hyp: {results[0][1]!r}", flush=True)
            if heldout is not None:
                print(f"    heldout ref: {heldout[2][0]}")
                print(f"    heldout hyp: {h_res[0][1]!r}", flush=True)
    train_cer, results = probe(state.params)
    for i, ((score, hyp), ref) in enumerate(zip(results, texts)):
        print(f"  item {i:2d} cer={cer(hyp, ref):.3f} ref={ref!r} "
              f"hyp={hyp!r}")
    ok = train_cer < 0.1
    rec = {'probe': 'overfit', 'model': args.use_model,
           'streaming': args.streaming, 'n_utts': args.n_utts,
           'steps': args.steps, 'final_train_cer': train_cer, 'ok': ok}
    if heldout is not None:
        rec['final_heldout_cer'] = decode_cer(state.params, *heldout)[0]
    print(json.dumps(rec, ensure_ascii=False))
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
