"""Optimizer factory (optax).

Parity: reference utils/optim_utils.py — adam / adamax / adamw / sgd with the
decay vs no-decay parameter grouping (biases and LayerNorm parameters get no
weight decay, optim_utils.py:16-30). torch semantics preserved:

- torch ``Adam``/``Adamax``/``SGD`` weight_decay is **L2-into-grad** →
  ``add_decayed_weights`` *before* the moment transform;
- torch ``AdamW`` is decoupled → decay applied *after* the moment transform;
- gradient clipping (global L2 norm, train_template.py:105) runs first, on
  the already-averaged accumulated grads.

The learning-rate schedule composes multiplicatively with the base lr and is
driven by the optimizer-step count (see schedules.py).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import optax


def no_decay_mask(params) -> dict:
    """True = apply weight decay. Biases and all LayerNorm scales/biases are
    excluded (reference optim_utils.py:16: ['bias', 'LayerNorm.bias',
    'LayerNorm.weight'] name matching; our trees name them *_bias /
    *ln_scale*)."""
    def decide(path, _leaf):
        name = str(path[-1].key) if hasattr(path[-1], "key") else str(path[-1])
        is_no_decay = ("bias" in name) or ("ln_scale" in name)
        return not is_no_decay

    return jax.tree_util.tree_map_with_path(decide, params)


def make_optimizer(
    name: str,
    lr: float,
    schedule_fn: Callable,
    *,
    beta1: float = 0.9,
    beta2: float = 0.999,
    weight_decay: float = 0.0,
    max_grad_norm: Optional[float] = None,
    params_example=None,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    mask = (no_decay_mask(params_example)
            if params_example is not None else None)
    decay = optax.add_decayed_weights(weight_decay, mask=mask) \
        if weight_decay else optax.identity()

    if name == "adam":
        core = [decay, optax.scale_by_adam(b1=beta1, b2=beta2, eps=eps)]
    elif name == "adamax":
        # torch Adamax defaults (0.9, 0.999), L2 weight decay
        core = [decay, optax.scale_by_adamax(b1=0.9, b2=0.999, eps=eps)]
    elif name == "adamw":
        core = [optax.scale_by_adam(b1=beta1, b2=beta2, eps=eps), decay]
    elif name == "sgd":
        # torch SGD(momentum=beta1) (reference optim_utils.py:43-45)
        core = [decay, optax.trace(decay=beta1)] if beta1 else [decay]
    else:
        raise ValueError("invalid optimizer")

    steps = []
    if max_grad_norm is not None:
        steps.append(optax.clip_by_global_norm(max_grad_norm))
    steps.extend(core)
    steps.append(optax.scale_by_learning_rate(
        lambda step: lr * schedule_fn(step)))
    return optax.chain(*steps)
