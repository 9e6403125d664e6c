"""Learning-rate schedules as optax-style step→lr functions.

Formula parity with reference ppasr/optimizer/scheduler.py:
- WarmupLR (:8-52): inv-sqrt Noam variant with explicit peak lr and min_lr
  floor that only engages after warmup.
- NoamHoldAnnealing (:55-176): linear warmup → hold at peak → polynomial
  decay (Squeezeformer recipe).
- CosineWithWarmup (:191-241): linear warmup → cosine annealing.

Implemented as pure jnp functions of the step counter so they can live inside
the jitted train step (the lr is just another traced scalar).
"""
import jax.numpy as jnp


def warmup_lr_schedule(learning_rate: float, warmup_steps: int = 25000,
                       min_lr: float = 1e-5):
    """lr = peak * warmup^0.5 * min(step^-0.5, step * warmup^-1.5)."""
    def schedule(step):
        # Reference counts steps from 1 (last_epoch+1, scheduler.py:33).
        s = jnp.maximum(step + 1, 1).astype(jnp.float32)
        if warmup_steps == 0:
            lr = learning_rate * s ** -0.5
            return jnp.maximum(lr, min_lr)
        lr = learning_rate * warmup_steps ** 0.5 * jnp.minimum(
            s ** -0.5, s * warmup_steps ** -1.5)
        # min_lr floor applies only after warmup (scheduler.py:40).
        return jnp.where((lr > min_lr) | (s < warmup_steps), lr, min_lr)
    return schedule


def noam_hold_annealing_schedule(learning_rate: float, max_steps: int,
                                 warmup_steps: int = None,
                                 warmup_ratio: float = 0.2,
                                 hold_steps: int = None,
                                 hold_ratio: float = 0.3,
                                 decay_rate: float = 1.0,
                                 min_lr: float = 1e-5):
    """Linear warmup → hold → polynomial decay (scheduler.py:55-176)."""
    if warmup_steps is None:
        warmup_steps = int(warmup_ratio * max_steps) if warmup_ratio else 0
    if hold_steps is None:
        hold_steps = int(hold_ratio * max_steps) if hold_ratio else 0

    def schedule(step):
        s = step.astype(jnp.float32) if hasattr(step, "astype") else float(step)
        s = jnp.asarray(s, jnp.float32)
        warm = learning_rate * (s + 1) / (warmup_steps + 1)
        t_warm = max(1.0, float(warmup_steps) ** decay_rate)
        t_hold = jnp.maximum(1.0, jnp.maximum(s - hold_steps, 0.0) ** decay_rate)
        decay = jnp.maximum(learning_rate * t_warm / t_hold, min_lr)
        lr = jnp.where(s <= warmup_steps, warm,
                       jnp.where(s < warmup_steps + hold_steps, learning_rate,
                                 jnp.where(s > max_steps, min_lr, decay)))
        return lr
    return schedule


def cosine_with_warmup_schedule(learning_rate: float, t_max: int,
                                eta_min: float = 0.0,
                                warmup_steps: int = None,
                                warmup_ratio: float = 0.2):
    """Linear warmup → cosine annealing to eta_min (scheduler.py:191-241)."""
    if warmup_steps is None:
        warmup_steps = int(warmup_ratio * t_max) if warmup_ratio else 0
    decay_steps = max(t_max - warmup_steps, 1)

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        warm = learning_rate * (s + 1) / (warmup_steps + 1)
        ds = jnp.clip(s - warmup_steps, 0, decay_steps)
        cos = eta_min + (learning_rate - eta_min) * 0.5 * (
            1 + jnp.cos(jnp.pi * ds / decay_steps))
        return jnp.where((s <= warmup_steps) & (warmup_steps > 0), warm, cos)
    return schedule


def build_schedule(optimizer_conf):
    """Build a schedule from the ``optimizer_conf`` config section."""
    name = optimizer_conf.get("scheduler", "WarmupLR")
    conf = dict(optimizer_conf.get("scheduler_conf", {}) or {})
    lr = float(optimizer_conf.get("learning_rate", 1e-3))
    if name == "WarmupLR":
        return warmup_lr_schedule(lr,
                                  warmup_steps=int(conf.get("warmup_steps", 25000)),
                                  min_lr=float(conf.get("min_lr", 1e-5)))
    if name == "NoamHoldAnnealing":
        return noam_hold_annealing_schedule(
            lr,
            max_steps=int(conf.get("max_steps", 175680)),
            warmup_steps=conf.get("warmup_steps"),
            warmup_ratio=conf.get("warmup_ratio", 0.2),
            hold_steps=conf.get("hold_steps"),
            hold_ratio=conf.get("hold_ratio", 0.3),
            decay_rate=float(conf.get("decay_rate", 1.0)),
            min_lr=float(conf.get("min_lr", 1e-5)))
    if name == "CosineWithWarmup":
        return cosine_with_warmup_schedule(
            lr,
            t_max=int(conf.get("T_max", conf.get("max_steps", 100000))),
            eta_min=float(conf.get("eta_min", 0.0)),
            warmup_steps=conf.get("warmup_steps"),
            warmup_ratio=conf.get("warmup_ratio", 0.2))
    raise ValueError(f"unsupported scheduler: {name}")
