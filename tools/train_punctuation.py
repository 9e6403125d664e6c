"""Train the punctuation-restoration model from any punctuated text corpus.

The reference downloads a pretrained Ernie token classifier
(ppasr/infer_utils/pun_predictor.py:15-116, pun_model_dir zoo artifact).
This tool produces the equivalent artifact for ppasr_tpu's JAX
`PunctuationModel`: feed it plain punctuated text (one passage per line, any
language) and it emits `pun_model.msgpack` + `pun_vocab.txt` +
`pun_labels.txt` — exactly what `PunctuationPredictor(model_dir=...)` loads.

Task framing (same as the reference model): strip the punctuation marks out
of each passage, and label every remaining character with the mark that
followed it (first label = none). Training minimizes per-char softmax
cross-entropy with class masking on padding.

Usage:
    python tools/train_punctuation.py --corpus text.txt --output_dir \
        models/pun_models [--epochs 10] [--batch_size 32] [--max_len 256] \
        [--marks "，。？！、"]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

PAD_ID = 0
UNK_ID = 1


def build_examples(lines, marks, max_len):
    """Punctuated text → (char sequences, per-char labels)."""
    mark_set = set(marks)
    examples = []
    vocab_count = {}
    for line in lines:
        line = line.strip()
        if not line:
            continue
        chars, labels = [], []
        for ch in line:
            if ch in mark_set:
                if chars:
                    labels[-1] = marks.index(ch) + 1
                continue
            if ch.isspace():
                continue
            chars.append(ch)
            labels.append(0)
            vocab_count[ch] = vocab_count.get(ch, 0) + 1
        for i in range(0, len(chars), max_len):
            seg_c = chars[i:i + max_len]
            seg_l = labels[i:i + max_len]
            if len(seg_c) >= 4:
                examples.append((seg_c, seg_l))
    return examples, vocab_count


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--corpus', required=True,
                        help='punctuated text, one passage per line')
    parser.add_argument('--output_dir', default='models/pun_models')
    parser.add_argument('--epochs', type=int, default=10)
    parser.add_argument('--batch_size', type=int, default=32)
    parser.add_argument('--max_len', type=int, default=256)
    parser.add_argument('--learning_rate', type=float, default=5e-4)
    parser.add_argument('--marks', default='，。？！、；：',
                        help='punctuation marks to model, label order')
    parser.add_argument('--dim', type=int, default=256)
    parser.add_argument('--layers', type=int, default=4)
    parser.add_argument('--min_count', type=int, default=1,
                        help='min char frequency for the vocab')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization
    from ppasr_tpu.infer_utils.pun_predictor import PunctuationModel
    from ppasr_tpu.utils.logger import setup_logger
    logger = setup_logger('train_punctuation')

    with open(args.corpus, 'r', encoding='utf-8') as f:
        lines = f.readlines()
    examples, vocab_count = build_examples(lines, args.marks, args.max_len)
    if not examples:
        raise SystemExit('corpus produced no training examples')
    vocab = ['<pad>', '<unk>'] + sorted(
        c for c, n in vocab_count.items() if n >= args.min_count)
    tok_to_id = {c: i for i, c in enumerate(vocab)}
    labels = [''] + list(args.marks)
    logger.info(f'{len(examples)} examples, vocab {len(vocab)}, '
                f'{len(labels)} labels')

    model = PunctuationModel(vocab_size=len(vocab), num_labels=len(labels),
                             dim=args.dim, layers=args.layers,
                             max_len=args.max_len)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 8), jnp.int32))
    tx = optax.adamw(args.learning_rate)
    opt_state = tx.init(params)

    def pad_batch(batch):
        blen = max(len(c) for c, _ in batch)
        ids = np.zeros((len(batch), blen), np.int32)
        lab = np.zeros((len(batch), blen), np.int32)
        msk = np.zeros((len(batch), blen), np.float32)
        for i, (chars, labs) in enumerate(batch):
            ids[i, :len(chars)] = [tok_to_id.get(c, UNK_ID) for c in chars]
            lab[i, :len(labs)] = labs
            msk[i, :len(labs)] = 1.0
        return jnp.asarray(ids), jnp.asarray(lab), jnp.asarray(msk)

    @jax.jit
    def step(params, opt_state, ids, lab, msk):
        def loss_fn(p):
            logits = model.apply(p, ids, deterministic=False)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(logp, lab[..., None],
                                       axis=-1)[..., 0]
            return jnp.sum(nll * msk) / jnp.maximum(jnp.sum(msk), 1.0)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    order = np.arange(len(examples))
    rng_np = np.random.default_rng(0)
    for epoch in range(args.epochs):
        rng_np.shuffle(order)
        losses = []
        for i in range(0, len(order), args.batch_size):
            batch = [examples[j] for j in order[i:i + args.batch_size]]
            ids, lab, msk = pad_batch(batch)
            params, opt_state, loss = step(params, opt_state, ids, lab, msk)
            losses.append(float(loss))
        logger.info(f'epoch {epoch}: loss {np.mean(losses):.4f}')

    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, 'pun_vocab.txt'), 'w',
              encoding='utf-8') as f:
        f.write('\n'.join(vocab) + '\n')
    with open(os.path.join(args.output_dir, 'pun_labels.txt'), 'w',
              encoding='utf-8') as f:
        f.write('\n'.join(labels) + '\n')
    with open(os.path.join(args.output_dir, 'pun_model.msgpack'), 'wb') as f:
        f.write(serialization.to_bytes(params))
    # record the architecture so the predictor can rebuild it
    with open(os.path.join(args.output_dir, 'pun_config.txt'), 'w') as f:
        f.write(f'dim={args.dim}\nlayers={args.layers}\n'
                f'max_len={args.max_len}\n')
    logger.info(f'saved punctuation model to {args.output_dir}')


if __name__ == '__main__':
    main()
