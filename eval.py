"""Evaluate a model on the test manifest (parity with reference eval.py)."""
import argparse
import functools
import time

from ppasr_tpu.trainer import PPASRTrainer
from ppasr_tpu.utils.common import add_arguments, print_arguments
from ppasr_tpu.utils.logger import setup_logger

logger = setup_logger(__name__)

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg('configs', str, 'configs/conformer.yml', 'config file path')
add_arg('use_gpu', bool, True, 'use accelerator (TPU) if available')
add_arg('resume_model', str, 'models/', 'checkpoint dir to evaluate')
add_arg('display_result', bool, False, 'print per-utterance results')
add_arg('streaming_eval', bool, False,
        'encode through the chunked-streaming path (live-session CER)')
add_arg('overwrites', str, None, 'config overrides')
args = parser.parse_args()
print_arguments(args=args)

trainer = PPASRTrainer(configs=args.configs, use_gpu=args.use_gpu,
                       overwrites=args.overwrites)
start = time.time()
error_rate, loss = trainer.evaluate(resume_model=args.resume_model,
                                    display_result=args.display_result,
                                    streaming_eval=args.streaming_eval)
metrics_type = trainer.configs.get('metrics_type', 'cer')
logger.info(f"eval done in {int(time.time() - start)}s: loss={loss:.5f} "
            f"{metrics_type}={error_rate:.5f}")
