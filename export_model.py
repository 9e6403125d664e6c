"""Export inference artifact (parity with reference export_model.py)."""
import argparse
import functools

from ppasr_tpu.trainer import PPASRTrainer
from ppasr_tpu.utils.common import add_arguments, print_arguments

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg('configs', str, 'configs/conformer.yml', 'config file path')
add_arg('save_model_path', str, 'models/', 'checkpoint root dir')
add_arg('resume_model', str, None, 'checkpoint dir (default: last_model)')
add_arg('save_quant', bool, False, 'also write an int8-quantized artifact')
add_arg('save_stablehlo', bool, False,
        'also serialize offline+chunk StableHLO computations (serving '
        'hosts then need no model code)')
args = parser.parse_args()
print_arguments(args=args)

trainer = PPASRTrainer(configs=args.configs)
trainer.export(save_model_path=args.save_model_path,
               resume_model=args.resume_model,
               save_quant=args.save_quant,
               save_stablehlo=args.save_stablehlo)
