"""Grid-search decoder weights on the eval set (parity with reference
tools/tune.py). ``--tune_target lm`` (default) searches beam-search LM
weights alpha/beta; ``--tune_target rescore`` searches the attention
rescoring CTC weight (beyond-reference decode mode, docs/beam_search.md).
Decodes once per candidate via trainer.evaluate."""
import argparse
import functools

import numpy as np
import yaml

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ppasr_tpu.trainer import PPASRTrainer
from ppasr_tpu.utils.common import add_arguments, print_arguments

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg('configs', str, 'configs/conformer.yml', 'config file path')
add_arg('use_gpu', bool, True, 'use accelerator if available')
add_arg('resume_model', str, 'models/', 'checkpoint dir to evaluate')
add_arg('num_alphas', int, 30, 'number of alpha candidates')
add_arg('num_betas', int, 20, 'number of beta candidates')
add_arg('alpha_from', float, 1.0, 'alpha range start')
add_arg('alpha_to', float, 3.2, 'alpha range end')
add_arg('beta_from', float, 0.1, 'beta range start')
add_arg('beta_to', float, 4.5, 'beta range end')
add_arg('tune_target', str, 'lm', 'lm (alpha/beta) | rescore (ctc weight)')
add_arg('num_weights', int, 11, 'rescore: number of ctc-weight candidates')
add_arg('weight_from', float, 0.0, 'rescore: ctc-weight range start')
add_arg('weight_to', float, 1.0, 'rescore: ctc-weight range end')
args = parser.parse_args()


def tune_rescore(configs):
    """1-D search over attention-rescoring rescore_ctc_weight."""
    metrics_type = configs.get('metrics_type', 'cer')
    best_w, best_err = 0.0, float('inf')
    for w in np.linspace(args.weight_from, args.weight_to,
                         args.num_weights):
        w = round(float(w), 3)
        configs['decoder'] = 'attention_rescoring'
        configs.setdefault('ctc_beam_search_decoder_conf', {})
        configs['ctc_beam_search_decoder_conf']['rescore_ctc_weight'] = w
        trainer = PPASRTrainer(configs=configs, use_gpu=args.use_gpu)
        err, _ = trainer.evaluate(resume_model=args.resume_model)
        if err < best_err:
            best_w, best_err = w, err
        print(f"rescore_ctc_weight={w} {metrics_type}={err:.5f} "
              f"| best: {best_w} {metrics_type}={best_err:.5f}")
    print(f"[FINAL] rescore_ctc_weight={best_w} "
          f"{metrics_type}={best_err:.5f}")


def tune():
    if args.num_alphas < 0 or args.num_betas < 0:
        raise ValueError("num_alphas/num_betas must be non-negative")
    with open(args.configs, 'r', encoding='utf-8') as f:
        configs = yaml.safe_load(f)
    print_arguments(args, configs)

    if args.tune_target == 'rescore':
        return tune_rescore(configs)

    cand_alphas = np.linspace(args.alpha_from, args.alpha_to,
                              args.num_alphas)
    cand_betas = np.linspace(args.beta_from, args.beta_to, args.num_betas)
    grid = [(round(a, 2), round(b, 2))
            for a in cand_alphas for b in cand_betas]

    best_alpha, best_beta, best_err = 0.0, 0.0, float('inf')
    metrics_type = configs.get('metrics_type', 'cer')
    for alpha, beta in grid:
        configs['decoder'] = 'ctc_beam_search'
        configs.setdefault('ctc_beam_search_decoder_conf', {})
        configs['ctc_beam_search_decoder_conf']['alpha'] = alpha
        configs['ctc_beam_search_decoder_conf']['beta'] = beta
        trainer = PPASRTrainer(configs=configs, use_gpu=args.use_gpu)
        err, _ = trainer.evaluate(resume_model=args.resume_model)
        if err < best_err:
            best_alpha, best_beta, best_err = alpha, beta, err
        print(f"alpha={alpha} beta={beta} {metrics_type}={err:.5f} "
              f"| best: alpha={best_alpha} beta={best_beta} "
              f"{metrics_type}={best_err:.5f}")
    print(f"[FINAL] alpha={best_alpha} beta={best_beta} "
          f"{metrics_type}={best_err:.5f}")


if __name__ == '__main__':
    tune()
