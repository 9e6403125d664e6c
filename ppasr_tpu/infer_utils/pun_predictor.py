"""Punctuation restoration.

API parity with reference ppasr/infer_utils/pun_predictor.py:15-116
(callable: plain text in → punctuated text out). The reference runs a
pretrained Ernie token classifier through paddle.inference; this
implementation is a small JAX transformer token classifier with the same
inference flow (clean → tokenize → classify per char → re-insert marks).

Weights: ``model_dir`` must contain ``pun_model.msgpack`` (params) +
``pun_vocab.txt`` (one char per line) + ``pun_labels.txt`` (one punctuation
label per line, first = none). Without a trained model the predictor raises
at construction — callers (PPASRPredictor._restore_punctuation) degrade
gracefully to the unpunctuated text, mirroring the reference's optional
download-on-demand behavior.
"""
import os
import re

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import serialization

from ppasr_tpu.utils.logger import setup_logger

logger = setup_logger(__name__)


class PunctuationModel(nn.Module):
    """Tiny transformer token classifier."""
    vocab_size: int
    num_labels: int
    dim: int = 256
    heads: int = 4
    layers: int = 4
    ffn: int = 1024
    max_len: int = 512

    @nn.compact
    def __call__(self, ids, deterministic=True):
        from ppasr_tpu.models.embedding import sinusoid_table
        x = nn.Embed(self.vocab_size, self.dim)(ids)
        pe = jnp.asarray(sinusoid_table(self.dim, self.max_len))
        x = x + pe[None, :x.shape[1]]
        mask = (ids > 0)[:, None, :]
        from ppasr_tpu.models.attention import MultiHeadedAttention
        for i in range(self.layers):
            y = nn.LayerNorm(name=f'ln1_{i}')(x)
            y, _ = MultiHeadedAttention(self.heads, self.dim,
                                        name=f'attn_{i}')(
                y, y, y, mask=mask, deterministic=deterministic)
            x = x + y
            y = nn.LayerNorm(name=f'ln2_{i}')(x)
            y = nn.Dense(self.ffn, name=f'ff1_{i}')(y)
            y = nn.gelu(y)
            y = nn.Dense(self.dim, name=f'ff2_{i}')(y)
            x = x + y
        x = nn.LayerNorm(name='ln_out')(x)
        return nn.Dense(self.num_labels, name='classifier')(x)


def packaged_pun_model_dir() -> str:
    """Directory of the pretrained punctuation artifact that ships with the
    package (the reference downloads its pretrained Ernie artifact on first
    use — pun_predictor.py:15-60; air-gapped here, so it's packaged)."""
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'assets', 'pun_models')


class PunctuationPredictor:
    def __init__(self, model_dir: str = 'models/pun_models'):
        def files(d):
            return [os.path.join(d, 'pun_vocab.txt'),
                    os.path.join(d, 'pun_labels.txt'),
                    os.path.join(d, 'pun_model.msgpack')]
        if not all(os.path.exists(p) for p in files(model_dir)):
            # out-of-box behavior: fall back to the packaged pretrained
            # artifact before failing
            packaged = packaged_pun_model_dir()
            if all(os.path.exists(p) for p in files(packaged)):
                model_dir = packaged
        vocab_path, labels_path, params_path = files(model_dir)
        if not all(os.path.exists(p)
                   for p in [vocab_path, labels_path, params_path]):
            raise FileNotFoundError(
                f"punctuation model files missing in {model_dir}")
        with open(vocab_path, 'r', encoding='utf-8') as f:
            self.vocab = [line.rstrip('\n') for line in f if line.strip()]
        with open(labels_path, 'r', encoding='utf-8') as f:
            self.labels = [line.rstrip('\n') for line in f]
        self.tok_to_id = {t: i for i, t in enumerate(self.vocab)}
        # architecture overrides written by tools/train_punctuation.py
        arch = {}
        cfg_path = os.path.join(model_dir, 'pun_config.txt')
        if os.path.exists(cfg_path):
            with open(cfg_path, 'r') as f:
                for line in f:
                    if '=' in line:
                        k, v = line.strip().split('=', 1)
                        arch[k] = int(v)
        self.model = PunctuationModel(vocab_size=len(self.vocab),
                                      num_labels=len(self.labels), **arch)
        shape_params = jax.eval_shape(
            lambda: self.model.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 8), jnp.int32)))
        with open(params_path, 'rb') as f:
            self.params = serialization.from_bytes(shape_params, f.read())
        self._infer = jax.jit(lambda p, ids: jnp.argmax(
            self.model.apply(p, ids), axis=-1))

    @staticmethod
    def _clean(text: str) -> str:
        """Strip existing punctuation (reference pun_predictor.py:62-70)."""
        return re.sub(r"[,，。？?！!；;:：、]", "", text)

    def __call__(self, text: str) -> str:
        text = self._clean(text)
        if not text:
            return text
        ids = np.asarray([[self.tok_to_id.get(ch, 1) for ch in text]],
                         np.int32)
        labels = np.asarray(self._infer(self.params, jnp.asarray(ids)))[0]
        out = []
        for ch, lab in zip(text, labels):
            out.append(ch)
            mark = self.labels[int(lab)] if int(lab) < len(self.labels) \
                else ''
            if mark and mark != 'O':
                out.append(mark)
        return ''.join(out)
