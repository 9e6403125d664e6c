"""Optimizer factory: config section → optax GradientTransformation.

Parity with reference trainer optimizer setup (ppasr/trainer.py:236-255):
Adam / AdamW / Momentum with weight decay and global-norm gradient clipping
(ClipGradByGlobalNorm(5.0)).
"""
import optax

from ppasr_tpu.optimizer.scheduler import build_schedule


def build_optimizer(optimizer_conf, grad_clip: float = 5.0):
    """Returns (optax transform, schedule fn). The schedule is injected via
    optax.inject_hyperparams-style scale_by_schedule so the lr is traceable."""
    schedule = build_schedule(optimizer_conf)
    name = optimizer_conf.get("optimizer", "Adam")
    weight_decay = float(optimizer_conf.get("weight_decay", 0.0))

    if name == "Adam":
        # Paddle Adam applies L2-style weight decay through the regularizer;
        # optax.adamw with small decay matches closely and is standard on TPU.
        base = optax.adamw(learning_rate=schedule, weight_decay=weight_decay)
    elif name == "AdamW":
        base = optax.adamw(learning_rate=schedule, weight_decay=weight_decay)
    elif name == "Momentum":
        base = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(learning_rate=schedule, momentum=0.9))
    else:
        raise ValueError(f"unsupported optimizer: {name}")

    tx = optax.chain(optax.clip_by_global_norm(grad_clip), base)
    return tx, schedule
