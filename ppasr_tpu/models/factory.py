"""Model factory: config → flax module.

Parity with the trainer's model dispatch (reference ppasr/trainer.py:172-255)
over SUPPORT_MODEL = [squeezeformer, efficient_conformer, conformer,
deepspeech2].
"""
import json
import os

import jax.numpy as jnp
import numpy as np


def _load_cmvn(mean_istd_path):
    if mean_istd_path and os.path.exists(mean_istd_path):
        with open(mean_istd_path, 'r', encoding='utf-8') as f:
            data = json.load(f)
        return tuple(np.float32(v) for v in data['mean']), \
            tuple(np.float32(v) for v in data['istd'])
    if mean_istd_path:
        # a model trained WITH GlobalCMVN produces garbage without it, and
        # the parameter trees are identical (CMVN holds constants, not
        # params) — so a silent fallback would load cleanly and mis-predict
        import logging
        logging.getLogger(__name__).warning(
            f"mean_istd file not found: {mean_istd_path} — building the "
            f"model WITHOUT CMVN; if the checkpoint was trained with CMVN "
            f"every prediction will be wrong")
    return None, None


def build_model(use_model: str, input_size: int, vocab_size: int,
                streaming: bool = True, encoder_conf=None, decoder_conf=None,
                model_conf=None, mean_istd_path: str = None,
                dtype=jnp.float32):
    """Build the model module named by ``use_model``."""
    mean, istd = _load_cmvn(mean_istd_path)
    model_conf = dict(model_conf or {})
    encoder_conf = dict(encoder_conf or {})
    decoder_conf = dict(decoder_conf or {})

    if use_model == 'deepspeech2':
        from ppasr_tpu.models.deepspeech2 import DeepSpeech2Model
        return DeepSpeech2Model(input_size=input_size, vocab_size=vocab_size,
                                streaming=streaming,
                                encoder_conf=encoder_conf,
                                decoder_conf=decoder_conf,
                                cmvn_mean=mean, cmvn_istd=istd, dtype=dtype)
    if use_model == 'conformer':
        from ppasr_tpu.models.conformer import ConformerModel
        return ConformerModel(input_size=input_size, vocab_size=vocab_size,
                              streaming=streaming,
                              encoder_conf=encoder_conf,
                              decoder_conf=decoder_conf,
                              cmvn_mean=mean, cmvn_istd=istd,
                              dtype=dtype, **model_conf)
    if use_model == 'squeezeformer':
        from ppasr_tpu.models.squeezeformer import SqueezeformerModel
        return SqueezeformerModel(input_size=input_size,
                                  vocab_size=vocab_size,
                                  streaming=streaming,
                                  encoder_conf=encoder_conf,
                                  decoder_conf=decoder_conf,
                                  cmvn_mean=mean, cmvn_istd=istd,
                                  dtype=dtype, **model_conf)
    if use_model == 'efficient_conformer':
        from ppasr_tpu.models.efficient_conformer import EfficientConformerModel
        return EfficientConformerModel(input_size=input_size,
                                       vocab_size=vocab_size,
                                       streaming=streaming,
                                       encoder_conf=encoder_conf,
                                       decoder_conf=decoder_conf,
                                       cmvn_mean=mean, cmvn_istd=istd,
                                       dtype=dtype, **model_conf)
    raise ValueError(f"unsupported model: {use_model}")
