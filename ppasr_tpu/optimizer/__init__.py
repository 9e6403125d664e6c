from ppasr_tpu.optimizer.scheduler import (warmup_lr_schedule,
                                           noam_hold_annealing_schedule,
                                           cosine_with_warmup_schedule,
                                           build_schedule)
from ppasr_tpu.optimizer.factory import build_optimizer
