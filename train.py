"""Train a model (CLI façade over PPASRTrainer, parity with reference
train.py)."""
import argparse
import faulthandler
import functools
import signal

# kill -USR1 <pid> dumps all thread stacks to stderr — long runs through
# the device tunnel occasionally wedge and this is the only introspection
faulthandler.register(signal.SIGUSR1)

from ppasr_tpu.trainer import PPASRTrainer
from ppasr_tpu.utils.common import add_arguments, print_arguments

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg('configs', str, 'configs/conformer.yml', 'config file path')
add_arg('use_gpu', bool, True, 'use accelerator (TPU) if available')
add_arg('save_model_path', str, 'models/', 'where to save checkpoints')
add_arg('log_dir', str, 'log/', 'tensorboard log dir')
add_arg('resume_model', str, None, 'checkpoint dir to resume from')
add_arg('pretrained_model', str, None, 'pretrained weights to warm-start')
add_arg('augment_conf_path', str, 'configs/augmentation.json',
        'augmentation pipeline JSON')
add_arg('overwrites', str, None,
        'config overrides, e.g. "train_conf.max_epoch=100"')
args = parser.parse_args()
print_arguments(args=args)

trainer = PPASRTrainer(configs=args.configs, use_gpu=args.use_gpu,
                       overwrites=args.overwrites,
                       data_augment_configs=args.augment_conf_path)
trainer.train(save_model_path=args.save_model_path, log_dir=args.log_dir,
              resume_model=args.resume_model,
              pretrained_model=args.pretrained_model)
