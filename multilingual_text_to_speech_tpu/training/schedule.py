"""Learning-rate and teacher-forcing schedules.

Rebuild of the reference's StepLR-per-epoch arrangement (train.py:271,
296-297) as a pure step-indexed schedule: the learning rate halves (by
``learning_rate_decay``) first at ``learning_rate_decay_start`` optimizer
steps and then every ``learning_rate_decay_each`` steps — the quantities the
reference's epoch arithmetic approximates.
"""

from __future__ import annotations

import math


def step_decay_schedule(hp):
    """optax-compatible schedule: step -> learning rate."""
    import jax.numpy as jnp

    lr0 = hp.learning_rate
    gamma = hp.learning_rate_decay
    start = hp.learning_rate_decay_start
    each = max(hp.learning_rate_decay_each, 1)

    def schedule(step):
        n = jnp.where(step < start, 0, 1 + (step - start) // each)
        return lr0 * jnp.power(gamma, n)

    return schedule


def cos_decay(global_step: int, decay_steps: int) -> float:
    """Cosine decay from 1 to 0 over decay_steps (reference: train.py:18-26)."""
    global_step = min(global_step, decay_steps)
    return 0.5 * (1 + math.cos(math.pi * global_step / decay_steps))


def teacher_forcing_ratio(hp, global_step: int) -> float:
    """Constant ratio or cosine decay after a warmup
    (reference: train.py:59-60)."""
    if hp.constant_teacher_forcing:
        return hp.teacher_forcing
    return cos_decay(
        max(global_step - hp.teacher_forcing_start_steps, 0),
        hp.teacher_forcing_steps,
    )
