"""Worker for the multi-process data-parallel correctness test.

Launched by tests/test_multiprocess_dp.py as N coordinated processes. Each
process initializes the JAX distributed runtime (the real multi-host path:
jax.distributed.initialize → SortagradDistributedBatchSampler →
make_array_from_process_local_data → GSPMD psum — trainer.py train()),
runs a short training, and reports what it observed as JSON on stdout.

Replicates the reference's fleet collective contract
(/root/reference/ppasr/trainer.py:529-544 + sampler.py:42-124) across real
OS processes, which the single-process 8-device tests cannot cover.
"""
import json
import os
import sys

workdir = sys.argv[1]
num_procs = int(sys.argv[2])
proc_id = int(sys.argv[3])
coordinator = sys.argv[4]
max_epoch = int(sys.argv[5])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
# the axon PJRT plugin overrides JAX_PLATFORMS env vars — force CPU through
# jax.config before any backend use (see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=num_procs,
                           process_id=proc_id)

os.chdir(workdir)

from ppasr_tpu.trainer import PPASRTrainer  # noqa: E402

report = {"proc": proc_id,
          "process_count": jax.process_count(),
          "local_devices": jax.local_device_count(),
          "global_devices": len(jax.devices())}

trainer = PPASRTrainer(configs=os.path.join(workdir, 'config.yml'))
state = trainer.train(save_model_path=os.path.join(workdir, 'models'),
                      log_dir=os.path.join(workdir, 'log'),
                      max_epoch=max_epoch)
report["final_step"] = int(state.step)

err, loss = trainer.evaluate(
    resume_model=os.path.join(workdir, 'models', trainer.model_dir_name,
                              'last_model'))
report["eval_loss"] = float(loss)
report["eval_cer"] = float(err)

print("MP_REPORT " + json.dumps(report), flush=True)
