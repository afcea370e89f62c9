"""LR schedule registry (diffusers-style get_scheduler parity).

Reimplements /root/reference/fit/utils/lr_scheduler.py (~370 LoC of
torch LambdaLR wrappers) as optax-compatible pure schedules
(step -> multiplier * base_lr). Supported names match SchedulerType
(lr_scheduler.py:29): constant, constant_with_warmup, linear, cosine,
cosine_with_restarts, polynomial, piecewise_constant.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def constant_schedule(base_lr: float) -> Schedule:
    return lambda step: jnp.full_like(jnp.asarray(step, jnp.float32), base_lr)


def constant_with_warmup(base_lr: float, num_warmup_steps: int) -> Schedule:
    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        warm = jnp.clip(s / max(1.0, num_warmup_steps), 0.0, 1.0)
        return base_lr * warm
    return fn


def linear_schedule(base_lr: float, num_warmup_steps: int,
                    num_training_steps: int) -> Schedule:
    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        warm = s / max(1.0, num_warmup_steps)
        decay = (num_training_steps - s) / max(
            1.0, num_training_steps - num_warmup_steps)
        return base_lr * jnp.clip(jnp.where(s < num_warmup_steps, warm, decay),
                                  0.0, 1.0)
    return fn


def cosine_schedule(base_lr: float, num_warmup_steps: int,
                    num_training_steps: int, num_cycles: float = 0.5
                    ) -> Schedule:
    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        warm = s / max(1.0, num_warmup_steps)
        progress = (s - num_warmup_steps) / max(
            1.0, num_training_steps - num_warmup_steps)
        progress = jnp.clip(progress, 0.0, 1.0)
        cos = 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress))
        return base_lr * jnp.where(s < num_warmup_steps, warm,
                                   jnp.maximum(0.0, cos))
    return fn


def cosine_with_restarts(base_lr: float, num_warmup_steps: int,
                         num_training_steps: int, num_cycles: int = 1
                         ) -> Schedule:
    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        warm = s / max(1.0, num_warmup_steps)
        progress = (s - num_warmup_steps) / max(
            1.0, num_training_steps - num_warmup_steps)
        progress = jnp.clip(progress, 0.0, 1.0)
        cyc = (progress * num_cycles) % 1.0
        cos = 0.5 * (1.0 + jnp.cos(math.pi * cyc))
        val = jnp.where(progress >= 1.0, 0.0, cos)
        return base_lr * jnp.where(s < num_warmup_steps, warm,
                                   jnp.maximum(0.0, val))
    return fn


def polynomial_schedule(base_lr: float, num_warmup_steps: int,
                        num_training_steps: int, lr_end: float = 1e-7,
                        power: float = 1.0) -> Schedule:
    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        warm = base_lr * s / max(1.0, num_warmup_steps)
        rem = jnp.clip((num_training_steps - s)
                       / max(1.0, num_training_steps - num_warmup_steps),
                       0.0, 1.0)
        decay = (base_lr - lr_end) * rem ** power + lr_end
        return jnp.where(s < num_warmup_steps, warm,
                         jnp.where(s > num_training_steps, lr_end, decay))
    return fn


def piecewise_constant(base_lr: float, step_rules: str) -> Schedule:
    """'1:100,0.1:200,0.01' — multiplier until step, then next (ref parity)."""
    parts = step_rules.split(',')
    bounds, values = [], []
    for p in parts[:-1]:
        mult, until = p.split(':')
        values.append(float(mult))
        bounds.append(int(until))
    values.append(float(parts[-1]))

    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        out = jnp.full_like(s, values[-1])
        for b, v in zip(reversed(bounds), reversed(values[:-1])):
            out = jnp.where(s < b, v, out)
        return base_lr * out
    return fn


def get_scheduler(name: str, base_lr: float, num_warmup_steps: Optional[int] = None,
                  num_training_steps: Optional[int] = None,
                  num_cycles: float = 1, power: float = 1.0,
                  step_rules: Optional[str] = None) -> Schedule:
    """Reference-API-shaped factory (fit/utils/lr_scheduler.py get_scheduler)."""
    name = name.lower()
    if name == 'constant':
        return constant_schedule(base_lr)
    if name == 'piecewise_constant':
        return piecewise_constant(base_lr, step_rules)
    if num_warmup_steps is None:
        raise ValueError(f'{name} requires num_warmup_steps')
    if name == 'constant_with_warmup':
        return constant_with_warmup(base_lr, num_warmup_steps)
    if num_training_steps is None:
        raise ValueError(f'{name} requires num_training_steps')
    if name == 'linear':
        return linear_schedule(base_lr, num_warmup_steps, num_training_steps)
    if name == 'cosine':
        return cosine_schedule(base_lr, num_warmup_steps, num_training_steps,
                               num_cycles=0.5 if num_cycles == 1 else num_cycles)
    if name == 'cosine_with_restarts':
        return cosine_with_restarts(base_lr, num_warmup_steps,
                                    num_training_steps, int(num_cycles))
    if name == 'polynomial':
        return polynomial_schedule(base_lr, num_warmup_steps,
                                   num_training_steps, power=power)
    raise ValueError(f'unknown scheduler {name}')
