"""Learning-rate schedules.

Optax equivalents of the reference's HF ``get_scheduler`` usage
(ref: train/train.py:377-385) plus the symbol trainer's custom per-epoch
warmup-restart cosine LambdaLR (ref: models/symbolAdapter/training/
unified_trainer.py:227-248).
"""

from __future__ import annotations


import optax


def linear_schedule_with_warmup(
    base_lr: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    """HF "linear": ramp 0→lr over warmup, then linear decay to 0."""

    def fn(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = (total_steps - step) / jnp.maximum(1.0, total_steps - warmup_steps)
        return base_lr * jnp.clip(jnp.where(step < warmup_steps, warm, decay), 0.0, 1.0)

    return fn


def cosine_schedule_with_warmup(
    base_lr: float, warmup_steps: int, total_steps: int, num_cycles: float = 0.5
) -> optax.Schedule:
    """HF "cosine": ramp then cosine decay to 0."""

    def fn(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(1.0, total_steps - warmup_steps)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * 2.0 * num_cycles * progress))
        return base_lr * jnp.where(step < warmup_steps, jnp.clip(warm, 0, 1), jnp.maximum(cos, 0))

    return fn


def per_epoch_warmup_restart_cosine(
    base_lr: float,
    steps_per_epoch: int,
    warmup_ratio: float = 0.1,
    min_lr_ratio: float = 0.01,
) -> optax.Schedule:
    """The symbol trainer's schedule: every epoch restarts with a fresh warmup
    then cosine-decays within the epoch
    (ref: unified_trainer.py:227-248 `lr_lambda`)."""
    warmup_steps = max(1, int(steps_per_epoch * warmup_ratio))

    def fn(step):
        import jax.numpy as jnp

        step_in_epoch = jnp.mod(jnp.asarray(step, jnp.float32), steps_per_epoch)
        warm = step_in_epoch / warmup_steps
        progress = (step_in_epoch - warmup_steps) / jnp.maximum(
            1.0, steps_per_epoch - warmup_steps
        )
        cos = min_lr_ratio + (1 - min_lr_ratio) * 0.5 * (1 + jnp.cos(jnp.pi * progress))
        return base_lr * jnp.where(step_in_epoch < warmup_steps, jnp.clip(warm, 0, 1), cos)

    return fn


def cosine_hard_restarts_schedule_with_warmup(
    base_lr: float, warmup_steps: int, total_steps: int, num_cycles: int = 1
) -> optax.Schedule:
    """HF "cosine_with_restarts": ramp, then num_cycles hard cosine restarts
    (HF formula: 0.5*(1+cos(pi*((num_cycles*progress) % 1))), 0 past total)."""

    def fn(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(1.0, total_steps - warmup_steps)
        cyc = jnp.mod(num_cycles * progress, 1.0)
        cos = jnp.where(progress >= 1.0, 0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * cyc)))
        return base_lr * jnp.where(step < warmup_steps, jnp.clip(warm, 0, 1), jnp.maximum(cos, 0))

    return fn


def constant_schedule_with_warmup(base_lr: float, warmup_steps: int) -> optax.Schedule:
    """HF "constant_with_warmup": ramp 0→lr over warmup, then hold."""

    def fn(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        return base_lr * jnp.clip(step / jnp.maximum(1.0, warmup_steps), 0.0, 1.0)

    return fn


def polynomial_schedule_with_warmup(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    lr_end: float = 1e-7,
    power: float = 1.0,
) -> optax.Schedule:
    """HF "polynomial": ramp, then (lr-lr_end)*(1-progress)^power + lr_end,
    held at lr_end past total_steps."""

    def fn(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * jnp.clip(step / jnp.maximum(1.0, warmup_steps), 0.0, 1.0)
        remaining = jnp.clip(
            (total_steps - step) / jnp.maximum(1.0, total_steps - warmup_steps), 0.0, 1.0
        )
        decay = (base_lr - lr_end) * remaining**power + lr_end
        return jnp.where(step < warmup_steps, warm, decay)

    return fn


def inverse_sqrt_schedule_with_warmup(base_lr: float, warmup_steps: int) -> optax.Schedule:
    """HF "inverse_sqrt": ramp, then lr * sqrt(warmup/step)."""

    def fn(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = jnp.sqrt(jnp.maximum(1.0, warmup_steps) / jnp.maximum(step, 1.0))
        return base_lr * jnp.where(step < warmup_steps, jnp.clip(warm, 0, 1), decay)

    return fn


def get_schedule(
    name: str,
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    steps_per_epoch: int = 0,
    num_cycles: float = 0.5,
    power: float = 1.0,
) -> optax.Schedule:
    """Resolve by the reference's --scheduler flag values.

    The reference passes the flag straight into HF ``get_scheduler``
    (ref: train/train.py:377-385), so every HF SchedulerType name is legal
    there; we cover the full set (linear / cosine / cosine_with_restarts /
    polynomial / constant / constant_with_warmup / inverse_sqrt) plus the
    symbol trainer's custom per-epoch restart schedule.
    """
    if name == "linear":
        return linear_schedule_with_warmup(base_lr, warmup_steps, total_steps)
    if name == "cosine":
        return cosine_schedule_with_warmup(base_lr, warmup_steps, total_steps)
    if name == "cosine_with_restarts":
        return cosine_hard_restarts_schedule_with_warmup(
            base_lr, warmup_steps, total_steps, num_cycles=max(int(num_cycles), 1)
        )
    if name == "constant":
        return lambda step: base_lr
    if name == "constant_with_warmup":
        return constant_schedule_with_warmup(base_lr, warmup_steps)
    if name == "polynomial":
        return polynomial_schedule_with_warmup(base_lr, warmup_steps, total_steps, power=power)
    if name == "inverse_sqrt":
        return inverse_sqrt_schedule_with_warmup(base_lr, warmup_steps)
    if name == "per_epoch_warmup_restart":
        if steps_per_epoch <= 0:
            raise ValueError("per_epoch_warmup_restart needs steps_per_epoch")
        return per_epoch_warmup_restart_cosine(base_lr, steps_per_epoch)
    raise ValueError(f"Unknown scheduler: {name}")
