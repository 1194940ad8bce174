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
import jax.numpy as jnp
import optax


def no_decay_mask(params) -> dict:
    """True = apply weight decay. Biases and all LayerNorm scales/biases are
    excluded (reference optim_utils.py:16: ['bias', 'LayerNorm.bias',
    'LayerNorm.weight'] name matching; our trees name them *_bias /
    *ln_scale*)."""
    def decide(path, _leaf):
        name = str(path[-1].key) if hasattr(path[-1], "key") else str(path[-1])
        # "scale" covers flax-native nn.LayerNorm params (text-model heads)
        is_no_decay = ("bias" in name) or ("ln_scale" in name) \
            or (name == "scale")
        return not is_no_decay

    return jax.tree_util.tree_map_with_path(decide, params)


def scale_updates_by_tree(scale_tree) -> optax.GradientTransformation:
    """Multiply each update leaf by a (broadcastable) per-leaf scale.

    Implements torch-style per-group learning rates (relative to the base
    lr, reference text_based/train_pure_text.py:53-58) and layer freezing
    (scale 0; reference train_pure_text.py:27-32) in one transform. Scales
    may be scalars or arrays broadcasting against the leaf (e.g. ``[L,1,1]``
    masks over the stacked encoder's layer axis).
    """
    def init(_params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        new = jax.tree.map(lambda u, s: u * s, updates, scale_tree)
        return new, state

    return optax.GradientTransformation(init, update)


def layer_freeze_scales(params, num_layers_freeze: int,
                        encoder_keys=("encoder",)):
    """Per-leaf scale tree freezing the first k stacked encoder layers.

    The stacked ``[L, ...]`` layout means freezing is a per-layer mask over
    the leading axis rather than a parameter-group split (reference freezes
    ``encoder.layer.{i<k}`` by requires_grad, train_pure_text.py:27-32).
    """
    import numpy as np

    def scale_for(path, leaf):
        names = [str(p.key) if hasattr(p, "key") else str(p) for p in path]
        if any(k in names for k in encoder_keys) and leaf.ndim >= 1:
            L = leaf.shape[0]
            mask = (np.arange(L) >= num_layers_freeze).astype(np.float32)
            return mask.reshape((L,) + (1,) * (leaf.ndim - 1))
        return 1.0

    return jax.tree_util.tree_map_with_path(scale_for, params)


def head_lr_scales(params, base_lr: float, head_lr: float,
                   head_predicate: Callable) -> dict:
    """Two-LR grouping: leaves matching ``head_predicate(path)`` train at
    ``head_lr`` (reference group_param_func, train_pure_text.py:53-58)."""
    rel = head_lr / base_lr

    def scale_for(path, _leaf):
        return rel if head_predicate(path) else 1.0

    return jax.tree_util.tree_map_with_path(scale_for, params)


def scale_by_adam_storage(b1: float, b2: float, eps: float,
                          mu_dtype, nu_dtype) -> optax.GradientTransformation:
    """optax.scale_by_adam semantics with independent STORAGE dtypes for
    both moments. All moment math runs in fp32 (moments are upcast before
    the EMA update and bias correction, then stored back down), so the only
    difference from optax is the bf16 rounding of what is written to HBM.
    Reuses ``optax.ScaleByAdamState`` so checkpointing and
    ``optax.tree_map_params`` (TP sharding of moments) see the same
    structure as the stock transform."""
    mu_dtype = jnp.dtype(mu_dtype) if mu_dtype else None
    nu_dtype = jnp.dtype(nu_dtype) if nu_dtype else None

    def init(params):
        mu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params)
        nu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=nu_dtype or p.dtype), params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update(updates, state, params=None):
        del params
        count_inc = state.count + 1
        c1 = 1.0 - b1 ** count_inc.astype(jnp.float32)
        c2 = 1.0 - b2 ** count_inc.astype(jnp.float32)

        def one(g, mu, nu):
            g32 = g.astype(jnp.float32)
            mu32 = mu.astype(jnp.float32) * b1 + g32 * (1.0 - b1)
            nu32 = nu.astype(jnp.float32) * b2 + jnp.square(g32) * (1.0 - b2)
            u = (mu32 / c1) / (jnp.sqrt(nu32 / c2) + eps)
            return (u.astype(g.dtype),
                    mu32.astype(mu_dtype or mu.dtype),
                    nu32.astype(nu_dtype or nu.dtype))

        out = jax.tree.map(one, updates, state.mu, state.nu)
        u = jax.tree.map(lambda t: t[0], out, is_leaf=lambda t: isinstance(t, tuple))
        mu = jax.tree.map(lambda t: t[1], out, is_leaf=lambda t: isinstance(t, tuple))
        nu = jax.tree.map(lambda t: t[2], out, is_leaf=lambda t: isinstance(t, tuple))
        return u, optax.ScaleByAdamState(count=count_inc, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


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
    update_scales=None,
    mu_dtype=None,
    nu_dtype=None,
) -> optax.GradientTransformation:
    """``mu_dtype``/``nu_dtype``: storage dtypes for the Adam first/second
    moments — ``jnp.bfloat16`` halves optimizer HBM traffic per moment (a
    standard TPU trick; moment MATH stays fp32 — see
    ``scale_by_adam_storage``). Accepts a dtype or a string;
    "float32"/None keep the fp32 default."""
    if isinstance(mu_dtype, str):
        mu_dtype = None if mu_dtype == "float32" else jnp.dtype(mu_dtype)
    if isinstance(nu_dtype, str):
        nu_dtype = None if nu_dtype == "float32" else jnp.dtype(nu_dtype)
    mask = (no_decay_mask(params_example)
            if params_example is not None else None)
    decay = optax.add_decayed_weights(weight_decay, mask=mask) \
        if weight_decay else optax.identity()

    if nu_dtype is not None:
        adam = scale_by_adam_storage(beta1, beta2, eps, mu_dtype, nu_dtype)
    else:
        adam = optax.scale_by_adam(b1=beta1, b2=beta2, eps=eps,
                                   mu_dtype=mu_dtype)
    if name == "adam":
        core = [decay, adam]
    elif name == "adamax":
        # torch Adamax DEFAULTS (0.9, 0.999) regardless of beta1/beta2 —
        # REFERENCE PARITY: optim_utils.py:36-45 constructs Adamax without
        # passing betas, so the reference ignores configured betas too
        core = [decay, optax.scale_by_adamax(b1=0.9, b2=0.999, eps=eps)]
    elif name == "adamw":
        core = [adam, decay]
    elif name == "sgd":
        # torch SGD(momentum=beta1) (reference optim_utils.py:43-45)
        core = [decay, optax.trace(decay=beta1)] if beta1 else [decay]
    else:
        raise ValueError("invalid optimizer")

    steps = []
    if max_grad_norm is not None:
        steps.append(optax.clip_by_global_norm(max_grad_norm))
    steps.extend(core)
    if update_scales is not None:
        steps.append(scale_updates_by_tree(update_scales))
    steps.append(optax.scale_by_learning_rate(
        lambda step: lr * schedule_fn(step)))
    return optax.chain(*steps)
