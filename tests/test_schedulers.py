"""Scheduler formula parity with reference ppasr/optimizer/scheduler.py."""
import numpy as np

from ppasr_tpu.optimizer.scheduler import (warmup_lr_schedule,
                                           noam_hold_annealing_schedule,
                                           cosine_with_warmup_schedule,
                                           build_schedule)


def _ref_warmup_lr(base_lr, warmup_steps, min_lr, step):
    # reference scheduler.py:32-40 (step_num = last_epoch+1 = step+1)
    step_num = step + 1
    if warmup_steps == 0:
        lr = base_lr * step_num ** -0.5
        return lr if lr > min_lr else min_lr
    lr = base_lr * warmup_steps ** 0.5 * min(step_num ** -0.5,
                                             step_num * warmup_steps ** -1.5)
    return lr if lr > min_lr or step_num < warmup_steps else min_lr


def test_warmup_lr():
    sched = warmup_lr_schedule(0.001, warmup_steps=25000, min_lr=1e-5)
    for step in [0, 1, 100, 24999, 25000, 100000, 10_000_000]:
        ref = _ref_warmup_lr(0.001, 25000, 1e-5, step)
        # schedule computes in float32; allow float32 relative error
        assert abs(float(sched(step)) - ref) < 1e-5 * max(ref, 1e-5), step


def test_noam_hold_annealing():
    max_steps = 1000
    sched = noam_hold_annealing_schedule(0.002, max_steps=max_steps,
                                         warmup_steps=100, hold_steps=300,
                                         decay_rate=1.0, min_lr=1e-5)
    # warmup is linear
    assert abs(float(sched(0)) - 0.002 * 1 / 101) < 1e-7
    assert abs(float(sched(50)) - 0.002 * 51 / 101) < 1e-7
    # hold at peak
    assert abs(float(sched(200)) - 0.002) < 1e-7
    # decay: lr = base * warmup^1 / (step - hold)^1  (reference :152-159)
    step = 600
    ref = max(0.002 * 100.0 / (step - 300), 1e-5)
    assert abs(float(sched(step)) - ref) < 1e-7
    # past max: min_lr
    assert abs(float(sched(2000)) - 1e-5) < 1e-12


def test_cosine_with_warmup():
    sched = cosine_with_warmup_schedule(0.001, t_max=1000, eta_min=1e-6,
                                        warmup_steps=100)
    assert abs(float(sched(0)) - 0.001 / 101) < 1e-7
    # cosine endpoint
    assert abs(float(sched(1000)) - 1e-6) < 1e-7
    # midpoint ≈ (peak+eta)/2
    mid = float(sched(100 + 450))
    assert abs(mid - (0.001 + 1e-6) / 2) < 1e-4


def test_build_schedule_from_config():
    conf = {"optimizer": "Adam", "learning_rate": 0.001,
            "scheduler": "WarmupLR",
            "scheduler_conf": {"warmup_steps": 25000, "min_lr": 1e-5}}
    sched = build_schedule(conf)
    assert abs(float(sched(24999)) - _ref_warmup_lr(0.001, 25000, 1e-5, 24999)) < 1e-7
