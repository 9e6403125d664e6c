"""Pre-compute dataset features (parity with reference extract_features.py)."""
import argparse
import functools

from ppasr_tpu.trainer import PPASRTrainer
from ppasr_tpu.utils.common import add_arguments, print_arguments

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg('configs', str, 'configs/conformer.yml', 'config file path')
add_arg('save_dir', str, 'dataset/features', 'feature output dir')
add_arg('splits', str, 'train,test', "which manifests to process, e.g. 'test'")
args = parser.parse_args()
print_arguments(args=args)

trainer = PPASRTrainer(configs=args.configs)
trainer.extract_features(save_dir=args.save_dir,
                         splits=tuple(args.splits.split(',')))
