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
import numpy as np
import optax

Array = jax.Array


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: Array  # optimizer steps taken


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def gather_micro(data: Dict[str, Array], micro_batch: Dict[str, Array]
                 ) -> Dict[str, Array]:
    """Assemble a micro-batch ON DEVICE from full-dataset arrays + indices.

    The device-resident input pipeline (SURVEY.md §7 hard-part 8): the
    whole dataset lives in HBM (e.g. 10k×100×2048 fp16 features ≈ 4 GB) and
    each step uploads only ``[accum, B]`` int32 indices + the padding mask —
    a few hundred bytes instead of the ~13 MB of features a b16×a2 batch
    streams host→device otherwise.

    All non-``indices`` keys of the micro-batch OVERLAY the gathered arrays:
    per-step host-side augmentations (masked MLM text, ITM-replaced text,
    region masks — all tiny) ride along while the feature megabytes stay
    resident.
    """
    idx = micro_batch["indices"]
    out = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
    for k, v in micro_batch.items():
        if k != "indices":
            out[k] = v
    return out


def make_train_step(
    model_apply: Callable,
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    accum_steps: int = 1,
    donate: bool = True,
    gather_data: bool = False,
    fuse_accum: bool = False,
):
    """Build the jitted train step.

    ``model_apply(params, batch, rng)`` → logits;
    ``loss_fn(logits, labels, sample_mask)`` → (loss, probs).

    The incoming batch dict has leading dims ``[accum, micro_bs, ...]``.
    Returns (new_state, {"loss": [accum], "probs": [accum, micro_bs(, C)]}).

    ``gather_data=True`` builds the device-resident variant: the step takes
    a fourth argument ``data`` (full-dataset device arrays, incl.
    ``labels``), the batch carries only ``indices`` + ``sample_mask``, and
    micro-batches are gathered on device (:func:`gather_micro`).

    ``fuse_accum=True`` replaces the accumulation scan with ONE fused
    forward/backward over the flattened ``[accum·micro_bs]`` batch (see
    :func:`_train_step_body`) — the TPU-first shape when the effective
    batch fits HBM.
    """

    body = _train_step_body(model_apply, loss_fn, tx, accum_steps,
                            gather_data, fuse_accum)
    return jax.jit(body, donate_argnums=(0,) if donate else ())


def _train_step_body(model_apply, loss_fn, tx, accum_steps, gather_data,
                     fuse_accum=False):
    """The raw (un-jitted) one-optimizer-step function shared by
    :func:`make_train_step`, :func:`make_train_multi_step` and (vmapped
    over the fold axis) the fold-parallel trainer.

    ``gather_data`` is ``False`` (batch is the model input), ``True``
    (device-resident: assemble micro-batches via :func:`gather_micro`), or
    a CALLABLE ``(data, batch) → batch`` for custom device-resident
    layouts — FoldParallelTrainer passes its shared-corpus + per-fold
    row-table gather here so both trainers share ONE accumulation body
    (scan and fused).

    ``fuse_accum=True`` computes the accumulated gradient as ONE fused
    forward/backward over the flattened ``[accum·micro_bs, ...]`` batch
    instead of a ``lax.scan`` of per-micro backwards. Gradient
    accumulation exists in the reference to fit a GPU memory budget
    (train_template.py:101-109); on TPU the effective batch usually fits
    HBM outright, and one large fused step keeps the MXU fuller than
    ``accum`` small ones (measured +30% on UNITER-base b16×a2 → fused 32,
    BASELINE.md r4). The LOSS SEMANTICS are preserved exactly: logits are
    reshaped back to ``[accum, micro_bs]`` and the loss is the mean of
    per-micro masked means — bitwise the same reduction tree as the scan
    path up to float reassociation, including padded final micro-batches
    where a flat masked mean would weight samples differently. The only
    behavioral delta is the dropout stream (one fused draw instead of
    ``accum`` split draws — a different but equally valid sample;
    per-activation masks stay independent either way).
    """

    if callable(gather_data):
        gather_fn = gather_data
    elif gather_data:
        gather_fn = gather_micro
    else:
        gather_fn = None

    def micro_loss(params, micro_batch, rng, data):
        if gather_fn is not None:
            micro_batch = gather_fn(data, micro_batch)
        logits = model_apply(params, micro_batch, rng)
        loss, probs = loss_fn(logits, micro_batch["labels"],
                              micro_batch["sample_mask"])
        return loss, probs

    grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

    def fused_loss(params, batch, rng, data):
        # flatten [accum, B, ...] → [accum·B, ...]: one forward for the
        # whole effective batch (indices flatten the same way, so the
        # device-resident gather is one fused take too)
        flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), batch)
        if gather_fn is not None:
            flat = gather_fn(data, flat)
        logits = model_apply(params, flat, rng)

        def unflat(x):
            return x.reshape((accum_steps, -1) + x.shape[1:])

        losses, probs = jax.vmap(loss_fn)(unflat(logits),
                                          unflat(flat["labels"]),
                                          unflat(flat["sample_mask"]))
        return jnp.mean(losses), (losses, probs)

    fused_grad_fn = jax.value_and_grad(fused_loss, has_aux=True)

    def train_step(state: TrainState, batch: Dict[str, Array], rng: Array,
                   data: Optional[Dict[str, Array]] = None
                   ) -> Tuple[TrainState, Dict[str, Array]]:
        if fuse_accum and accum_steps > 1:
            (_, (losses, probs)), grads = fused_grad_fn(
                state.params, batch, rng, data)
            updates, new_opt_state = tx.update(grads, state.opt_state,
                                               state.params)
            new_params = optax.apply_updates(state.params, updates)
            return (TrainState(new_params, new_opt_state, state.step + 1),
                    {"loss": losses, "probs": probs})

        rngs = jax.random.split(rng, accum_steps)

        if accum_steps == 1:
            # no accumulator round-trip at all
            micro = jax.tree.map(lambda x: x[0], batch)
            (loss, probs), grads = grad_fn(state.params, micro, rngs[0], data)
            losses, probs = loss[None], probs[None]
        else:
            # seed the accumulator with micro 0's grads — skips the
            # zero-init + first add (a full fp32 param-sized HBM round-trip)
            first = jax.tree.map(lambda x: x[0], batch)
            (loss0, probs0), grad_acc = grad_fn(state.params, first, rngs[0],
                                                data)
            rest = jax.tree.map(lambda x: x[1:], batch)

            def scan_body(carry, xs):
                grad_acc = carry
                micro_batch, micro_rng = xs
                (loss, probs), grads = grad_fn(state.params, micro_batch,
                                               micro_rng, data)
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

    return train_step


def make_train_multi_step(
    model_apply: Callable,
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    accum_steps: int = 1,
    steps_per_dispatch: int = 8,
    donate: bool = True,
    gather_data: bool = False,
    unroll: int = 1,
    fuse_accum: bool = False,
):
    """``steps_per_dispatch`` optimizer steps in ONE jitted dispatch.

    A ``lax.scan`` over whole optimizer steps: the host uploads a chunk of
    ``[K, accum, ...]`` batches and pays ONE dispatch round trip for K
    steps. With the device-resident pipeline the chunk is just indices +
    masks (a few KB), so loop throughput converges to the step-only rate —
    the per-step relay RTT (~2 ms on the axon tunnel, ~6% of a 32 ms
    UNITER-base step) was the last gap between the trainer loop and the
    bench's step-only number.

    Per-step dropout RNG is derived IN-GRAPH as ``fold_in(root_rng,
    state.step)`` — bit-identical to the single-step trainer's host-side
    ``fold_in(root, host_step)`` stream, so chunked and unchunked training
    are pointwise equal (tests/test_train.py).

    ``unroll > 1`` unrolls the scan over optimizer steps: consecutive steps
    land in one straight-line XLA block, letting the scheduler overlap step
    k's serial optimizer tail (~4 ms of a 32 ms UNITER-base step, already
    at its HBM roofline) with step k+1's first micro-batch forward — the
    overlap is impossible across scan iterations or separate dispatches
    (TPU cores run one program region at a time). Numerically identical to
    ``unroll=1`` (same ops, same order per step).
    """
    body = _train_step_body(model_apply, loss_fn, tx, accum_steps,
                            gather_data, fuse_accum)

    def multi_step(state: TrainState, batches: Dict[str, Array],
                   root_rng: Array,
                   data: Optional[Dict[str, Array]] = None
                   ) -> Tuple[TrainState, Dict[str, Array]]:
        # trace-time guard: the scan length comes from the stacked leading
        # dim, and every DIFFERENT length is a fresh multi-minute remote
        # compile — a mis-stacked tail chunk must fail loudly, not compile
        K = next(iter(batches.values())).shape[0]
        assert K == steps_per_dispatch, (
            f"chunk has {K} steps, expected steps_per_dispatch="
            f"{steps_per_dispatch} (dispatch tails as single steps instead)")

        def scan_body(st, batch):
            rng = jax.random.fold_in(root_rng, st.step)
            return body(st, batch, rng, data)

        return jax.lax.scan(scan_body, state, batches, unroll=unroll)

    return jax.jit(multi_step, donate_argnums=(0,) if donate else ())


def stack_chunk(chunk: list) -> Dict[str, Array]:
    """Stack K per-step batches into the [K, ...] input of
    :func:`make_train_multi_step` — the same leading-axis numpy stack as
    :func:`stack_for_accum`, named for the dispatch-chunk level."""
    return stack_for_accum(chunk)


def chunk_batches(stream, steps_per_dispatch: int):
    """Group a batch stream for chunked dispatch: yields ``("chunk", [K
    batches])`` for each full run and ``("single", batch)`` for the tail.

    The tail dispatches as single steps on purpose — a variable-length
    chunk would compile one program per distinct length (multi-minute
    remote compiles). Shared by ``Trainer`` and ``FoldParallelTrainer``;
    ``PretrainTrainer`` keeps its own variant because the MetaLoader
    switches tasks mid-stream (same-task runs only) and drains losses at
    a log cadence mid-epoch."""
    pending: list = []
    for item in stream:
        pending.append(item)
        if len(pending) == steps_per_dispatch:
            yield "chunk", pending
            pending = []
    for item in pending:
        yield "single", item


def make_eval_step(model_apply_eval: Callable, probs_fn: Callable,
                   gather_data: bool = False):
    """Jitted eval step: batch → (probabilities, chain token).

    ``model_apply_eval(params, batch)`` → logits;
    ``probs_fn(logits)`` → probabilities (sigmoid / softmax per loss mode).
    ``gather_data=True``: the step takes ``data`` and the batch carries
    ``indices`` + ``sample_mask`` (device-resident pipeline).

    Successive dispatches are *dependency-chained* through a zero-valued
    scalar token (same device-pipelining trick as extract/detector.py): the
    token rides into the probabilities (``+ 0.0``, a value no-op that keeps
    the argument in the jaxpr so jit's unused-arg pruning can't drop the
    runtime dependency) and the out-token is derived from the computed
    probabilities. The eval loops keep a deep window of dispatches in
    flight (:class:`EvalPipeline`) and fetch the tail ONCE at the end —
    per-batch ``np.asarray`` syncs serialized host batch assembly against
    device compute and paid the relay RTT per batch (r3 review)."""

    def eval_step(params, batch, data=None, token=None):
        if gather_data:
            batch = gather_micro(data, batch)
        logits = model_apply_eval(params, batch)
        probs = probs_fn(logits)
        if token is None:
            return probs
        probs = probs + token  # token == 0.0 always: dependency edge only
        # nan_to_num: a diverged batch (NaN first probability) must stay
        # isolated to its own batch — a raw p0 * 0.0 would be NaN and
        # poison every later batch in the chained pass.
        return probs, jnp.nan_to_num(probs.reshape(-1)[0]) * 0.0

    return jax.jit(eval_step)


def eval_chain_token() -> Array:
    """Fresh zero token opening a chained eval pass (:func:`make_eval_step`)."""
    return jnp.zeros((), jnp.float32)


def fetch_all(pending: list) -> list:
    """Drain a loader pass's in-flight eval dispatches at ONE host sync
    point — called only after every dispatch of the pass is enqueued, so
    the device pipeline is never stalled by host-side batch assembly."""
    return [np.asarray(p) for p in pending]


# in-flight depth for pipelined eval passes over HOST-BATCH loaders: every
# pending dispatch pins its full input batch (features!) in HBM until it
# executes, so an unbounded pass over a large test set could pin gigabytes.
# 8 keeps the pipeline deep enough to hide per-dispatch RTT (~2 ms on the
# axon relay vs ~5 ms per eval step) at ≤ ~52 MB of pinned inputs for a
# [16, 100, 2048] fp16 UNITER batch. Index-mode (device-resident) loaders
# upload only a few hundred bytes per dispatch and stay unbounded.
EVAL_INFLIGHT_WINDOW = 8


class EvalPipeline:
    """Pipelined eval dispatches with a bounded in-flight window.

    ``add`` enqueues one dispatch's device output; once more than
    ``window`` are in flight, the OLDEST is fetched — dispatches are
    token-chained (:func:`make_eval_step`), so they complete in order and
    waiting on the oldest bounds both the dispatch backlog and the HBM
    pinned by their not-yet-consumed input batches, while the newest
    ``window`` dispatches still overlap host batch assembly.
    ``window=None`` disables the bound (device-resident index loaders).
    ``results`` drains the tail and returns every output in add-order.
    """

    def __init__(self, window: Optional[int] = EVAL_INFLIGHT_WINDOW):
        self._window = window
        self._pending: list = []
        self._done: list = []

    def add(self, out) -> None:
        self._pending.append(out)
        if (self._window is not None
                and len(self._pending) > self._window):
            self._done.append(np.asarray(self._pending.pop(0)))

    def results(self) -> list:
        return self._done + fetch_all(self._pending)


def stack_for_accum(batches: list) -> Dict[str, Array]:
    """Stack ``accum`` host micro-batches into one [accum, ...] batch.

    Stays in NUMPY: the arrays upload as arguments of the single jitted
    step call. Building them with per-leaf ``jnp.asarray`` + ``jnp.stack``
    issues ~3 relay round trips per leaf per step on the axon tunnel
    (measured: the pretrain driver loop ran at 19 memes/s vs 802 for the
    step alone before this was fixed, r3).
    """
    out: Dict[str, Array] = {}
    for key in batches[0]:
        out[key] = np.stack([np.asarray(b[key]) for b in batches], axis=0)
    return out
