"""Jitted train/eval steps.

The TPU-native core of the trainer (replaces the eager per-batch loop of
reference train_template.py:359-394): one compiled function per (model,
optimizer, accumulation) configuration.

- **Gradient accumulation via ``lax.scan``** (SURVEY.md §2.3): the device
  batch is ``[accum, micro_bs, ...]``; micro-batch grads are accumulated in
  one compiled step and averaged — matching the reference's grad-averaging
  (train_template.py:101-109) without ``accum`` separate dispatches.
- Global-norm clipping, weight decay and the LR schedule live inside the
  optax chain (optim.py), so ``train_step`` is a single fused update.
- Dropout PRNG is derived from (root seed, step) — reproducible regardless
  of host timing.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

Array = jax.Array


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: Array  # optimizer steps taken


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(
    model_apply: Callable,
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    accum_steps: int = 1,
    donate: bool = True,
):
    """Build the jitted train step.

    ``model_apply(params, batch, rng)`` → logits;
    ``loss_fn(logits, labels, sample_mask)`` → (loss, probs).

    The incoming batch dict has leading dims ``[accum, micro_bs, ...]``.
    Returns (new_state, {"loss": [accum], "probs": [accum, micro_bs(, C)]}).
    """

    def micro_loss(params, micro_batch, rng):
        logits = model_apply(params, micro_batch, rng)
        loss, probs = loss_fn(logits, micro_batch["labels"],
                              micro_batch["sample_mask"])
        return loss, probs

    grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

    def train_step(state: TrainState, batch: Dict[str, Array], rng: Array
                   ) -> Tuple[TrainState, Dict[str, Array]]:
        rngs = jax.random.split(rng, accum_steps)

        if accum_steps == 1:
            # no accumulator round-trip at all
            micro = jax.tree.map(lambda x: x[0], batch)
            (loss, probs), grads = grad_fn(state.params, micro, rngs[0])
            losses, probs = loss[None], probs[None]
        else:
            # seed the accumulator with micro 0's grads — skips the
            # zero-init + first add (a full fp32 param-sized HBM round-trip)
            first = jax.tree.map(lambda x: x[0], batch)
            (loss0, probs0), grad_acc = grad_fn(state.params, first, rngs[0])
            rest = jax.tree.map(lambda x: x[1:], batch)

            def scan_body(carry, xs):
                grad_acc = carry
                micro_batch, micro_rng = xs
                (loss, probs), grads = grad_fn(state.params, micro_batch,
                                               micro_rng)
                grad_acc = jax.tree.map(jnp.add, grad_acc, grads)
                return grad_acc, (loss, probs)

            grad_acc, (losses_r, probs_r) = jax.lax.scan(
                scan_body, grad_acc, (rest, rngs[1:]))
            losses = jnp.concatenate([loss0[None], losses_r])
            probs = jnp.concatenate([probs0[None], probs_r])
            # average over micro-batches (reference average_gradients,
            # train_template.py:89-92)
            grads = jax.tree.map(lambda g: g / accum_steps, grad_acc)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_opt_state, state.step + 1)
        return new_state, {"loss": losses, "probs": probs}

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model_apply_eval: Callable, probs_fn: Callable):
    """Jitted eval step: batch → probabilities (no grads, no dropout).

    ``model_apply_eval(params, batch)`` → logits;
    ``probs_fn(logits)`` → probabilities (sigmoid / softmax per loss mode).
    """

    def eval_step(params, batch):
        logits = model_apply_eval(params, batch)
        return probs_fn(logits)

    return jax.jit(eval_step)


def stack_for_accum(batches: list) -> Dict[str, Array]:
    """Stack ``accum`` host micro-batches into one [accum, ...] device batch."""
    out: Dict[str, Array] = {}
    for key in batches[0]:
        out[key] = jnp.stack([jnp.asarray(b[key]) for b in batches], axis=0)
    return out
