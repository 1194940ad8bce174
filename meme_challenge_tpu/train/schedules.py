"""Learning-rate schedules.

Parity: reference train_template.py:72-82. The reference calls
``scheduler.step()`` once per *optimizer* step (inside calculate_loss,
train_template.py:107) while sizing warmup/decay horizons in *iterations*
(``len(train_loader) * max_epoch``); these schedules take the same horizon
argument so behavior matches exactly (including the quirk that with gradient
accumulation the cosine/linear decay never completes).

All schedules are pure functions of the optimizer-step count → multiplicative
LR factor, composed with the base lr by the optimizer factory.
"""
from __future__ import annotations

import jax.numpy as jnp


def step_schedule(lr_decay_step: int, lr_decay_factor: float):
    """torch StepLR: lr · γ^⌊step/step_size⌋ (train_template.py:73-74)."""
    def fn(step):
        return lr_decay_factor ** (step // lr_decay_step)
    return fn


def multi_step_schedule(milestones=(5, 10, 15, 25, 40), lr_decay_factor=0.8):
    """torch MultiStepLR at the reference's fixed milestones
    (train_template.py:75-76)."""
    ms = jnp.asarray(milestones)

    def fn(step):
        return lr_decay_factor ** jnp.sum(step >= ms)
    return fn


def warmup_linear_schedule(warmup_steps: int, total_steps: int):
    """transformers get_linear_schedule_with_warmup (train_template.py:77-79)."""
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = (total_steps - step) / jnp.maximum(1.0, total_steps - warmup_steps)
        return jnp.where(step < warmup_steps, warm, jnp.maximum(0.0, decay))
    return fn


def warmup_cosine_schedule(warmup_steps: int, total_steps: int,
                           num_cycles: float = 0.5):
    """transformers get_cosine_schedule_with_warmup (train_template.py:80-82)."""
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(
            1.0, total_steps - warmup_steps)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * num_cycles * 2.0 * progress))
        return jnp.where(step < warmup_steps, warm, jnp.maximum(0.0, cos))
    return fn


def make_schedule(name: str, *, warmup_steps: int, total_steps: int,
                  lr_decay_step: int, lr_decay_factor: float):
    """Dispatch matching reference init_scheduler (train_template.py:72-82)."""
    if name == "step":
        return step_schedule(lr_decay_step, lr_decay_factor)
    if name == "multi_step":
        return multi_step_schedule(lr_decay_factor=lr_decay_factor)
    if name == "warmup":
        return warmup_linear_schedule(warmup_steps, total_steps)
    if name == "warmup_cosine":
        return warmup_cosine_schedule(warmup_steps, total_steps)
    if name in ("none", "constant"):
        return lambda step: 1.0
    raise ValueError(f"unknown scheduler: {name}")
