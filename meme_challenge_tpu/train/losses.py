"""Loss functions for the trainer.

Parity: reference train_template.py:64-69 + 95-126 — ``bce`` /
``bce_logits`` (+``pos_wt`` positive-class reweighting, torch
``BCEWithLogitsLoss(pos_weight=...)`` semantics) / ``ce``. All losses are
masked means over the valid samples of a (possibly padded) static batch.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _masked_mean(per_sample: Array, sample_mask: Array) -> Array:
    m = sample_mask.astype(jnp.float32)
    return jnp.sum(per_sample * m) / jnp.maximum(jnp.sum(m), 1.0)


def bce_logits_loss(logits: Array, labels: Array, sample_mask: Array,
                    pos_weight: float = 1.0) -> Tuple[Array, Array]:
    """Weighted binary cross-entropy on logits.

    torch BCEWithLogitsLoss(pos_weight=w):
      l = -[w·y·log σ(x) + (1−y)·log(1−σ(x))], mean over batch.
    Computed with the numerically stable log-sigmoid form. Returns
    (mean loss, probabilities).
    """
    x = logits.reshape(-1).astype(jnp.float32)
    y = labels.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(x)
    log_not_p = jax.nn.log_sigmoid(-x)
    per = -(pos_weight * y * log_p + (1.0 - y) * log_not_p)
    return _masked_mean(per, sample_mask), jax.nn.sigmoid(x)


def bce_loss(logits: Array, labels: Array, sample_mask: Array
             ) -> Tuple[Array, Array]:
    """Reference 'bce' mode: sigmoid applied first, then BCE
    (train_template.py:96-97) — numerically identical to unweighted
    bce_logits, implemented in the stable form."""
    return bce_logits_loss(logits, labels, sample_mask, pos_weight=1.0)


def ce_loss(logits: Array, labels: Array, sample_mask: Array
            ) -> Tuple[Array, Array]:
    """Cross-entropy over n_classes logits. Returns (loss, softmax probs)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    per = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return _masked_mean(per, sample_mask), jax.nn.softmax(logits, axis=-1)


def make_loss_fn(loss_func: str, pos_wt: float = 1.0):
    """Dispatch matching reference train_template.py:64-69."""
    if loss_func == "bce_logits":
        return lambda logits, labels, mask: bce_logits_loss(
            logits, labels, mask, pos_weight=pos_wt)
    if loss_func == "bce":
        return bce_loss
    if loss_func == "ce":
        return ce_loss
    raise ValueError(f"unknown loss_func: {loss_func}")
