"""Multi-task UNITER pretraining driver.

The reference ships ``UniterForPretraining``, the MLM/ITM/MRFR datasets and
``MetaLoader`` but **no driver script wires them together** (SURVEY.md §2
quirks: grep shows train_uniter.py uses UniterForPretraining only to load
weights). This module supplies that missing capability, TPU-native:

- one jitted train step *per task* (different batch signatures compile
  separately, then cache);
- MetaLoader keeps the sampled task fixed across a gradient-accumulation
  group (reference pretrain_meme_dataset.py:44-47), so each optimizer step
  mixes micro-batches of a single task — matching the reference semantics;
- ITM can add the IPOT optimal-transport alignment loss (models/ot.py) with
  a weight — the wiring the reference left vestigial (model/pretrain.py:
  197-203);
- Orbax-free full-state checkpoints via train/checkpoint.py.
"""
from __future__ import annotations

import json
import logging
import os
import random
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from meme_challenge_tpu.core.config import TrainConfig, UniterConfig
from meme_challenge_tpu.core.seeding import prng_key
from meme_challenge_tpu.models.ot import optimal_transport_dist
from meme_challenge_tpu.models.uniter import UniterForPretraining
from meme_challenge_tpu.train.checkpoint import ModelSaver
from meme_challenge_tpu.train.optim import make_optimizer
from meme_challenge_tpu.train.schedules import make_schedule
from meme_challenge_tpu.train.steps import (
    TrainState,
    create_train_state,
    stack_chunk,
)

logger = logging.getLogger("meme_challenge_tpu.pretrain")


def _encode_host_rng():
    """JSON-serializable (python, numpy) global-RNG state pair."""
    py_state = random.getstate()
    np_state = np.random.get_state()
    return (
        [py_state[0], list(py_state[1]), py_state[2]],
        [np_state[0], np.asarray(np_state[1]).tolist(),
         int(np_state[2]), int(np_state[3]), float(np_state[4])],
    )


def _decode_host_rng(py_enc, np_enc):
    v, st, gauss = py_enc
    name, keys, pos, has_g, cached = np_enc
    return ((v, tuple(st), gauss),
            (name, np.asarray(keys, np.uint32), pos, has_g, cached))


def _task_prepare(model: UniterForPretraining, batch, task: str, data=None):
    """Per-sample input assembly shared by the scan and fused steps.

    ``data``: HBM-resident dataset arrays for index-mode batches — features
    are gathered on device (steps.gather_micro); the host-side task
    augmentations (masked/replaced text, region masks) overlay them. MRFR's
    feature zeroing + regression targets, which the host batcher derives
    from materialized features, are computed in-graph here instead (same
    math: targets = original features, input features zeroed at masked
    regions — reference pretrain_mrfr.py:42-51).
    """
    if data is not None:
        from meme_challenge_tpu.train.steps import gather_micro

        batch = gather_micro(data, batch)
        if (task == "mrfr" or task.startswith("mrc")) \
                and "feat_targets" not in batch:
            feats = batch["img_feat"].astype(jnp.float32)
            zero_mask = batch["img_masks"].astype(jnp.float32)[..., None]
            if task == "mrfr":
                batch["feat_targets"] = feats
            batch["img_feat"] = feats * (1.0 - zero_mask)
        if task.startswith("mrc") and "label_targets" not in batch:
            # index-mode MRC ships [B, R] class ids (data/pretrain.py
            # MRCBatcher); the dense one-hot materializes here in-graph.
            # Padding rows are −1 → all-zero rows, same as the host path
            batch["label_targets"] = jax.nn.one_hot(
                batch.pop("label_cls"), model.img_label_dim,
                dtype=jnp.float32)
    return batch


def _task_apply(model: UniterForPretraining, params, batch, task: str, rng):
    """PER-SAMPLE model outputs for one task — no reductions, so the fused
    step can run it on a flattened [accum·B] batch and reduce per micro."""
    variables = {"params": params}
    rngs = {"dropout": rng}
    if task == "itm":
        # one encoder pass serves both the ITM CE and the OT alignment term
        return model.apply(variables, batch, deterministic=False, rngs=rngs,
                           method=UniterForPretraining.forward_itm_with_seq)
    return model.apply(variables, batch, task, deterministic=False,
                       rngs=rngs)


def _task_reduce(outs, batch, task: str, ot_weight: float = 0.0):
    """Masked-mean loss reduction over ONE micro-batch's per-sample outputs
    (the reference tasks' own weighting — pretrain_mlm/mrfr/mrc/itm)."""
    # every task weights by sample_mask: TaskLoader pads the final batch by
    # repeating sample 0, and unmasked padding would train extra copies of
    # that sample (the reference's DataLoader shrinks the last batch instead)
    sm = batch["sample_mask"].astype(jnp.float32)
    if task == "mlm":
        nll, mask = outs
        w = mask * sm[:, None]
        return jnp.sum(nll * sm[:, None]) / jnp.maximum(jnp.sum(w), 1.0)
    if task == "mrfr":
        err, mask = outs
        w = mask.astype(jnp.float32) * sm[:, None]
        denom = jnp.maximum(jnp.sum(w) * err.shape[-1], 1.0)
        return jnp.sum(err * sm[:, None, None]) / denom
    if task.startswith("mrc"):
        loss, mask = outs
        w = mask.astype(jnp.float32) * sm[:, None]
        if loss.ndim == 3:   # mrc-kl returns per-(region, class) losses
            loss = loss * sm[:, None, None]
        else:
            loss = loss * sm[:, None]
        return jnp.sum(loss) / jnp.maximum(jnp.sum(w), 1.0)
    if task == "itm":
        scores, seq = outs
        targets = batch["targets"]
        logp = jax.nn.log_softmax(scores.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
        loss = jnp.sum(nll * sm) / jnp.maximum(jnp.sum(sm), 1.0)
        if ot_weight > 0.0:
            # OT alignment: positive pairs should have small transport
            # distance, negatives large (margin-free UNITER formulation:
            # +dist for matched, −dist for mismatched)
            T = batch["input_ids"].shape[1]
            txt_pad = batch["txt_mask"] == 0
            img_pad = batch["img_mask"] == 0
            dist = optimal_transport_dist(seq[:, :T], seq[:, T:],
                                          txt_pad, img_pad)
            signed = jnp.where(targets == 1, dist, -dist)
            loss = loss + ot_weight * jnp.sum(signed * sm) / jnp.maximum(
                jnp.sum(sm), 1.0)
        return loss
    raise ValueError(f"unknown task {task}")


def _task_loss(model: UniterForPretraining, params, batch, task: str,
               rng, ot_weight: float = 0.0, data=None):
    """Scalar loss for one task micro-batch: prepare → apply → reduce."""
    batch = _task_prepare(model, batch, task, data)
    return _task_reduce(_task_apply(model, params, batch, task, rng),
                        batch, task, ot_weight)


class PretrainTrainer:
    """Multi-task pretraining over a MetaLoader stream."""

    def __init__(self, config: TrainConfig, model: UniterForPretraining,
                 params, meta_loader, steps_per_epoch: int,
                 ot_weight: float = 0.0, data_arrays=None):
        self.config = config
        self.model = model
        self.meta_loader = meta_loader
        self.steps_per_epoch = steps_per_epoch
        self.ot_weight = ot_weight
        # device-resident corpus (TaskLoader index_batches=True): uploaded
        # once, per step only text arrays + indices cross the host link
        self.data = (jax.device_put(data_arrays)
                     if data_arrays is not None else None)

        c = config
        schedule = make_schedule(
            c.scheduler, warmup_steps=c.warmup_steps,
            total_steps=steps_per_epoch * c.max_epoch,
            lr_decay_step=c.lr_decay_step,
            lr_decay_factor=c.lr_decay_factor)
        self.tx = make_optimizer(
            c.optimizer, c.lr, schedule, beta1=c.beta1, beta2=c.beta2,
            weight_decay=c.weight_decay, max_grad_norm=c.max_grad_norm,
            params_example=params, mu_dtype=c.adam_mu_dtype,
            nu_dtype=c.adam_nu_dtype)
        self.state = create_train_state(params, self.tx)
        self.root_rng = prng_key(c.seed)
        self._task_steps: Dict[str, Callable] = {}
        self._task_multi_steps: Dict[str, Callable] = {}
        # kill-and-resume bookkeeping (save_checkpoint/load_checkpoint).
        # v2 records snapshot the host-RNG states AT SAVE TIME plus every
        # TaskLoader's epoch position — resume is O(1). Legacy (r4) records
        # hold the states at stream ORIGIN + total micro-draws consumed;
        # loading one sets _legacy_replay and train() replays that many
        # draws. _stream_draws counts next() calls THIS instance has made
        # on the meta_loader — the legacy path uses it to tell a fresh
        # process from an in-process continuation.
        self._stream_rng0 = (random.getstate(), np.random.get_state())
        self._consumed_micros = 0
        self._stream_draws = 0
        self._legacy_replay: Optional[int] = None
        self.saver = ModelSaver(
            f"{c.model_path}/{c.model_save_name}")

    def _task_step_fn(self, task: str) -> Callable:
        """Raw (un-jitted) one-optimizer-step function for one task.

        Deliberately parallel to, not shared with, steps._train_step_body:
        that body is built around the classifier loss signature
        ``loss_fn(logits, labels, sample_mask) → (loss, probs)``, while
        pretrain tasks produce multi-output heads with task-specific
        reductions (_task_reduce) and no probability aux. The scan path's
        zero-init accumulator (vs the shared body's micro-0 seeding) was
        measured perf-NEUTRAL on this hardware — XLA overlaps the
        accumulator traffic (BASELINE.md r2 'grad-accumulation
        restructure')."""
        model = self.model
        tx = self.tx
        accum = self.config.gradient_accumulation
        ot_weight = self.ot_weight

        def loss_fn(params, micro_batch, rng, data):
            return _task_loss(model, params, micro_batch, task, rng,
                              ot_weight, data)

        grad_fn = jax.value_and_grad(loss_fn)

        def fused_loss(params, batch, rng, data):
            # fuse_accum (steps._train_step_body): one fwd/bwd over the
            # flattened [accum·B] batch; _task_apply is per-sample, so only
            # the REDUCTION needs the micro structure — per-micro masked
            # means (the reference's accumulation weighting) via vmap
            flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]),
                                batch)
            flat = _task_prepare(model, flat, task, data)
            outs = _task_apply(model, params, flat, task, rng)

            def unflat(x):
                return x.reshape((accum, -1) + x.shape[1:])

            losses = jax.vmap(
                lambda o, b: _task_reduce(o, b, task, ot_weight))(
                jax.tree.map(unflat, outs), jax.tree.map(unflat, flat))
            return jnp.mean(losses), losses

        fused_grad_fn = jax.value_and_grad(fused_loss, has_aux=True)
        fuse = self.config.fuse_accum and accum > 1

        def step(state: TrainState, batch, rng, data=None):
            if fuse:
                (_, losses), grads = fused_grad_fn(state.params, batch,
                                                   rng, data)
            else:
                rngs = jax.random.split(rng, accum)

                def scan_body(acc, xs):
                    mb, r = xs
                    loss, grads = grad_fn(state.params, mb, r, data)
                    return jax.tree.map(jnp.add, acc, grads), loss

                zeros = jax.tree.map(
                    lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
                grad_acc, losses = jax.lax.scan(scan_body, zeros,
                                                (batch, rngs))
                grads = jax.tree.map(lambda g: g / accum, grad_acc)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(new_params, new_opt, state.step + 1), losses

        return step

    def _get_task_step(self, task: str) -> Callable:
        if task not in self._task_steps:
            self._task_steps[task] = jax.jit(
                self._task_step_fn(task), donate_argnums=(0,))
        return self._task_steps[task]

    def _get_task_multi_step(self, task: str) -> Callable:
        """K consecutive same-task optimizer steps in one jitted dispatch
        (lax.scan over [K, accum, ...] batches). Per-step rng derives
        in-graph as fold_in(root, state.step) — identical to the
        single-step loop's host-side fold_in(root, opt_step) stream."""
        if task not in self._task_multi_steps:
            body = self._task_step_fn(task)

            def multi(state: TrainState, batches, root_rng, data=None):
                def scan_body(st, batch):
                    rng = jax.random.fold_in(root_rng, st.step)
                    return body(st, batch, rng, data)

                return jax.lax.scan(scan_body, state, batches)

            self._task_multi_steps[task] = jax.jit(
                multi, donate_argnums=(0,))
        return self._task_multi_steps[task]

    def save_checkpoint(self, path: str, next_step: int) -> None:
        """Atomic full-state checkpoint — params + optimizer + step + the
        host-RNG stream record, all in ONE msgpack file so a kill at any
        instant leaves either the previous checkpoint or the new one,
        never a torn pair (a separate sidecar file could pair a new state
        with an old stream record). Mid-run kill-and-resume for long
        pretraining runs, which the final ModelSaver dump cannot provide.

        Restoring the FINAL host-RNG state alone is not enough: the
        MetaLoader's TaskLoaders are mid-epoch iterators (a shuffled pass
        each), and their positions are not RNG state. The record therefore
        pairs the at-save RNG states with every loader's epoch position
        (MetaLoader.state()) — resume restores both in O(1). (The previous
        format recorded the stream ORIGIN and replayed every draw since,
        whose cost grew with run length; load_checkpoint still reads it.)"""
        from flax import serialization

        py_enc, np_enc = _encode_host_rng()
        stream_record = json.dumps({
            "rng_py": py_enc,
            "rng_np": np_enc,
            "meta": self.meta_loader.state(),
            "consumed_micros": int(self._consumed_micros),
        })
        payload = {
            "params": jax.device_get(self.state.params),
            "opt_state": jax.device_get(self.state.opt_state),
            "step": int(self.state.step),
            "next_step": int(next_step),
            "stream_record": stream_record,
        }
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(payload))
        os.replace(tmp, path)  # atomic: a kill mid-write keeps the old file

    def load_checkpoint(self, path: str) -> int:
        """Restore a :meth:`save_checkpoint` dump; returns the next
        optimizer step to run. A position record (the current format)
        restores the host RNGs and repositions every task iterator right
        here — O(1), no replay. A legacy origin record only sets
        ``_stream_rng0``/``_legacy_replay`` so :meth:`train` can replay
        the batch stream to its position. Dropout-RNG continuity is
        automatic either way: the per-step stream derives from
        ``fold_in(root, state.step)`` and ``state.step`` is restored."""
        from flax import serialization

        template = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": 0,
            "next_step": 0,
            "stream_record": "",
        }
        with open(path, "rb") as f:
            payload = serialization.from_bytes(template, f.read())
        self.state = TrainState(params=payload["params"],
                                opt_state=payload["opt_state"],
                                step=jnp.asarray(payload["step"],
                                                 jnp.int32))
        m = json.loads(payload["stream_record"])
        if "meta" in m:
            py_state, np_state = _decode_host_rng(m["rng_py"], m["rng_np"])
            random.setstate(py_state)
            np.random.set_state(np_state)
            self.meta_loader.set_state(m["meta"])
            self._legacy_replay = None
        else:
            self._stream_rng0 = _decode_host_rng(
                m["stream_py_rng"], m["stream_np_rng"])
            self._legacy_replay = int(m["consumed_micros"])
        self._consumed_micros = int(m["consumed_micros"])
        return int(payload["next_step"])

    def train(self, total_steps: Optional[int] = None,
              log_every: Optional[int] = None,
              save_checkpoint: bool = True,
              checkpoint_path: Optional[str] = None,
              checkpoint_every: Optional[int] = None):
        """Run ``total_steps`` optimizer steps (default: steps_per_epoch ×
        max_epoch). Returns {task: mean loss over the last epoch}.

        ``log_every`` sets the loss-fetch cadence (default total//10) — each
        fetch is the loop's only host sync. ``save_checkpoint=False`` skips
        the final ModelSaver dump (benchmark loops).

        ``checkpoint_path`` enables mid-run kill-and-resume: an existing
        file there is loaded (full state + host RNGs) and training resumes
        at its recorded step; a fresh full-state checkpoint is written
        every ``checkpoint_every`` steps (default: one nominal epoch)."""
        c = self.config
        accum = c.gradient_accumulation
        total = total_steps or (self.steps_per_epoch * c.max_epoch)
        cadence = log_every or max(1, total // 10)
        ckpt_cadence = checkpoint_every or self.steps_per_epoch
        start_step, replay = 0, 0
        if checkpoint_path and os.path.isfile(checkpoint_path):
            draws_before = self._stream_draws
            start_step = self.load_checkpoint(checkpoint_path)
            if self._legacy_replay is None:
                # position record: load_checkpoint already restored the
                # host RNGs and repositioned every task iterator — O(1)
                replay = 0
            elif draws_before == 0:
                # legacy origin record, fresh process: re-seed to the
                # ORIGINAL run's stream origin; the draws are replayed
                # below so loader positions + RNG state both line up
                random.setstate(self._stream_rng0[0])
                np.random.set_state(self._stream_rng0[1])
                replay = self._legacy_replay
            elif draws_before == self._consumed_micros:
                # legacy record, in-process continuation: the meta_loader's
                # iterators are ALREADY at the checkpoint's position —
                # replaying from origin would double-consume
                replay = 0
            else:
                raise RuntimeError(
                    f"cannot resume from {checkpoint_path}: this trainer's "
                    f"stream has consumed {draws_before} micro-draws but "
                    f"the legacy checkpoint records "
                    f"{self._consumed_micros} — the in-process stream no "
                    "longer matches. Construct a fresh trainer (fresh "
                    "MetaLoader) to resume.")
            self._stream_draws = self._consumed_micros
            logger.info("resuming pretraining from %s at step %i "
                        "(replaying %i micro-draws)",
                        checkpoint_path, start_step, replay)
        # (task, DEVICE loss buffer) per dispatch — kept in-flight so the
        # async dispatch overlaps host batch assembly (incl. the vectorized
        # MLM masking, data/pretrain.py) with device compute; a per-step
        # float(np.asarray(...)) would force a host sync every optimizer
        # step (the pattern removed from Trainer.train_main in r2b)
        step_log: list = []
        fetched: Dict[str, list] = {}
        stream = iter(self.meta_loader)
        for _ in range(replay):  # fast-forward to the checkpoint's position
            next(stream)
        # (replayed draws are already counted in the restored
        # _consumed_micros, to which _stream_draws was synced above)
        t0 = time.time()
        # opportunistic chunking: CONSECUTIVE same-task groups share one
        # dispatch (lax.scan over steps) — the MetaLoader switches tasks
        # between optimizer steps, so a multi-task mix chunks in short runs
        # (expected ~1.3 at 4 uniform tasks) while a single-task stream
        # (MLM-only warmup, the bench driver loop) chunks fully and pays
        # one dispatch RTT per K steps
        K = c.steps_per_dispatch or (8 if self.data is not None else 1)

        def drain():
            for task_i, dev_losses in step_log:
                arr = np.asarray(dev_losses)          # sync point
                if arr.ndim == 2:                     # chunk: [K, accum]
                    fetched.setdefault(task_i, []).extend(
                        arr.mean(-1).tolist())
                else:
                    fetched.setdefault(task_i, []).append(float(arr.mean()))
            step_log.clear()

        pending: list = []
        pending_task: Optional[str] = None
        # optimizer steps dispatched so far — seeded from the PERSISTENT
        # state.step, not 0: a second train() call on the same trainer
        # (warmup-then-timed loops) must continue the dropout-RNG stream
        # where the chunked path's in-graph fold_in(root, state.step) does
        next_idx = int(self.state.step)

        def flush():
            nonlocal pending, pending_task, next_idx
            if not pending:
                return
            task = pending_task
            # chunk only when chunking is on (K>1): at K=1 the scan-wrapped
            # multi-step program would shadow-compile the plain step for no
            # RTT win (Trainer/FoldParallelTrainer guard the same way)
            if K > 1 and len(pending) == K:
                chunk = stack_chunk(pending)
                self.state, losses = self._get_task_multi_step(task)(
                    self.state, chunk, self.root_rng, self.data)
                step_log.append((task, losses))
                next_idx += K
            else:
                # short run (task switched before K): single steps — a
                # variable-length chunk would compile one program per
                # distinct length (minutes each on the remote service)
                for db in pending:
                    rng = jax.random.fold_in(self.root_rng, next_idx)
                    self.state, losses = self._get_task_step(task)(
                        self.state, db, rng, self.data)
                    step_log.append((task, losses))
                    next_idx += 1
            pending, pending_task = [], None

        for opt_step in range(start_step, total):
            group, task = [], None
            for _ in range(accum):
                task_i, batch = next(stream)
                assert task is None or task_i == task, (
                    "MetaLoader must hold the task fixed across an "
                    "accumulation group")
                task = task_i
                group.append(batch)
            self._consumed_micros += accum
            self._stream_draws += accum
            # host-side stack; leaves upload inside the one step dispatch
            # (per-leaf jnp ops cost ~3 relay RTs each — see
            # steps.stack_for_accum)
            device_batch = {
                k: np.stack([np.asarray(b[k]) for b in group])
                for k in group[0]}
            if pending and task != pending_task:
                flush()
            pending_task = task
            pending.append(device_batch)
            if len(pending) >= K:
                flush()
            if (opt_step + 1) % cadence == 0:
                flush()
                drain()
                means = {t: float(np.mean(v[-50:]))
                         for t, v in fetched.items()}
                logger.info("pretrain step %i/%i losses=%s (%.1fs)",
                            opt_step + 1, total, means, time.time() - t0)
            if checkpoint_path and (opt_step + 1) % ckpt_cadence == 0 \
                    and opt_step + 1 < total:
                flush()  # state must reflect every dispatched step
                self.save_checkpoint(checkpoint_path, opt_step + 1)
        flush()
        drain()
        if checkpoint_path:
            self.save_checkpoint(checkpoint_path, total)
        if save_checkpoint:
            self.saver.save(self.state.params)
        return {t: float(np.mean(v[-self.steps_per_epoch:]))
                for t, v in fetched.items()}
