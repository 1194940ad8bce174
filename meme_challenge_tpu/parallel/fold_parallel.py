"""Fold-parallel cross-validation training.

The reference trains its 15 crossval folds strictly sequentially
(utils/crossval.py:172-189) — the single biggest wall-clock lever on TPU
(SURVEY.md §2.3: "the north-star speedup"). Here all F folds train
*simultaneously*:

- parameters, optimizer state and batches carry a leading fold axis
  ``[F, ...]`` sharded over the mesh's ``fold`` axis;
- the whole update is ``vmap`` over folds inside one ``jit`` — folds are
  independent, so GSPMD partitions the computation with **zero cross-fold
  collectives**; adding a ``data`` mesh axis shards each fold's batch for
  in-fold data parallelism (gradient psums ride ICI);
- per-fold early stopping (SURVEY.md §7 hard-part 5) is handled with a
  device-side best-parameter snapshot: each epoch, folds whose monitored
  metric improved overwrite their slice of ``best_params`` via
  ``jnp.where`` — no host transfer of parameters, no mesh bubbles; training
  runs until *every* fold has exhausted its patience (stopped folds keep
  computing but their results are frozen — compute is traded for a bubble-
  free mesh).

Crossval folds have identical train/val sizes by construction
(crossval_splits.py), so fold batch streams align exactly.
"""
from __future__ import annotations

import logging
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from meme_challenge_tpu.core.config import TrainConfig
from meme_challenge_tpu.core.metrics import standard_metrics
from meme_challenge_tpu.core.seeding import prng_key
from meme_challenge_tpu.train.losses import make_loss_fn
from meme_challenge_tpu.train.optim import make_optimizer
from meme_challenge_tpu.train.schedules import make_schedule
from meme_challenge_tpu.train.steps import TrainState, stack_for_accum

logger = logging.getLogger("meme_challenge_tpu.fold_parallel")


class FoldParallelTrainer:
    """Train F folds of the same model simultaneously on one mesh.

    Parameters
    ----------
    config : TrainConfig (mesh comes from config.mesh_shape/axes or `mesh`)
    model : flax module (shared architecture)
    params_stacked : pytree with leading fold axis [F, ...]
    train_loaders / val_loaders : one BatchLoader per fold (equal lengths)
    mesh : optional prebuilt Mesh with a "fold" axis (and optionally "data")
    """

    def __init__(
        self,
        config: TrainConfig,
        model,
        params_stacked,
        train_loaders: List,
        val_loaders: List,
        mesh: Optional[Mesh] = None,
    ):
        self.config = config
        self.model = model
        self.train_loaders = train_loaders
        self.val_loaders = val_loaders
        self.num_folds = len(train_loaders)
        assert len(val_loaders) == self.num_folds
        lengths = {len(l) for l in train_loaders}
        if len(lengths) > 1:
            # ConfounderSampler makes per-fold epoch lengths differ slightly
            # (fold splits contain different confounder counts); folds march
            # in lockstep, so each epoch runs min-length steps and longer
            # folds drop their tail batches (resampled next epoch).
            logger.warning(
                "fold train loaders have unequal lengths %s; each epoch "
                "runs min(%i) steps per fold", sorted(lengths), min(lengths))
        self.mesh = mesh

        c = config
        self.loss_fn = make_loss_fn(c.loss_func, c.pos_wt)
        total_steps = len(train_loaders[0]) * c.max_epoch
        schedule = make_schedule(
            c.scheduler, warmup_steps=c.warmup_steps, total_steps=total_steps,
            lr_decay_step=c.lr_decay_step, lr_decay_factor=c.lr_decay_factor)
        params_example = jax.tree.map(lambda x: x[0], params_stacked)
        self.tx = make_optimizer(
            c.optimizer, c.lr, schedule, beta1=c.beta1, beta2=c.beta2,
            weight_decay=c.weight_decay, max_grad_norm=c.max_grad_norm,
            params_example=params_example)

        opt_state = jax.vmap(self.tx.init)(params_stacked)
        self.state = TrainState(
            params=params_stacked, opt_state=opt_state,
            step=jnp.zeros((self.num_folds,), jnp.int32))
        self.best_params = jax.tree.map(jnp.copy, params_stacked)

        self._build_steps()
        if mesh is not None:
            self._shard_state()

        self.root_rng = prng_key(c.seed)
        self.best_metric = np.full(
            self.num_folds,
            np.inf if c.optimize_for == "loss" else -np.inf)
        self.not_improved = np.zeros(self.num_folds, dtype=np.int64)
        self.done = np.zeros(self.num_folds, dtype=bool)
        self.fold_val_metrics: List[Dict[str, float]] = [
            {} for _ in range(self.num_folds)]

    # ------------------------------------------------------------- jit steps

    def _build_steps(self):
        c = self.config
        accum = c.gradient_accumulation
        model = self.model
        loss_fn = self.loss_fn
        tx = self.tx

        def micro_loss(params, micro_batch, rng):
            logits = model.apply({"params": params}, micro_batch,
                                 deterministic=False, rngs={"dropout": rng})
            loss, probs = loss_fn(logits, micro_batch["labels"],
                                  micro_batch["sample_mask"])
            return loss, probs

        grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

        def fold_update(state: TrainState, batch, rng):
            rngs = jax.random.split(rng, accum)

            def scan_body(grad_acc, xs):
                micro_batch, micro_rng = xs
                (loss, probs), grads = grad_fn(state.params, micro_batch,
                                               micro_rng)
                return jax.tree.map(jnp.add, grad_acc, grads), (loss, probs)

            zeros = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            grad_acc, (losses, probs) = jax.lax.scan(
                scan_body, zeros, (batch, rngs))
            grads = jax.tree.map(lambda g: g / accum, grad_acc)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return (TrainState(new_params, new_opt, state.step + 1),
                    {"loss": losses, "probs": probs})

        vm = jax.vmap(fold_update)
        self._train_step = jax.jit(vm, donate_argnums=(0,))

        def fold_eval(params, batch):
            logits = model.apply({"params": params}, batch,
                                 deterministic=True)
            if c.loss_func == "ce":
                return jax.nn.softmax(logits.astype(jnp.float32), -1)
            return jax.nn.sigmoid(
                logits.reshape(logits.shape[0], -1)[:, 0].astype(jnp.float32))

        self._eval_step = jax.jit(jax.vmap(fold_eval))

        def snapshot(best, current, improved_mask):
            def upd(b, p):
                mask = improved_mask.reshape(
                    (-1,) + (1,) * (p.ndim - 1))
                return jnp.where(mask, p, b)
            return jax.tree.map(upd, best, current)

        self._snapshot = jax.jit(snapshot, donate_argnums=(0,))

    def _shard_state(self):
        fold_sharding = NamedSharding(self.mesh, P("fold"))

        def put(leaf):
            return jax.device_put(leaf, fold_sharding)

        self.state = TrainState(
            params=jax.tree.map(put, self.state.params),
            opt_state=jax.tree.map(put, self.state.opt_state),
            step=jax.device_put(self.state.step, fold_sharding),
        )
        self.best_params = jax.tree.map(put, self.best_params)

    # ----------------------------------------------------------------- train

    def _fold_device_batches(self):
        """Zip fold loaders → [F, accum, micro_bs, ...] device batches."""
        accum = self.config.gradient_accumulation
        iters = [iter(l) for l in self.train_loaders]
        while True:
            fold_groups = []
            try:
                for it in iters:
                    group = []
                    for _ in range(accum):
                        b = dict(next(it))
                        b.pop("ids", None)
                        group.append(b)
                    fold_groups.append(stack_for_accum(group))
            except StopIteration:
                # drop ragged tails uniformly (loaders are aligned, so this
                # only trims < accum trailing micro-batches per fold)
                return
            yield {k: jnp.stack([g[k] for g in fold_groups], axis=0)
                   for k in fold_groups[0]}

    def train_main(self) -> List[Dict[str, float]]:
        c = self.config
        start = time.time()
        for epoch in range(1, c.max_epoch + 1):
            losses = []
            for device_batch in self._fold_device_batches():
                step0 = int(np.asarray(self.state.step)[0])
                step_rng = jax.random.fold_in(self.root_rng, step0)
                fold_rngs = jax.random.split(step_rng, self.num_folds)
                self.state, out = self._train_step(
                    self.state, device_batch, fold_rngs)
                losses.append(np.asarray(out["loss"]))

            metrics_per_fold = self.eval_folds()
            self._early_stopping_update(metrics_per_fold)
            mean_auc = float(np.mean(
                [m.get("aucroc", -1) for m in metrics_per_fold]))
            logger.info(
                "[fold-parallel] epoch %i/%i mean_val_auc=%.4f done=%i/%i "
                "(%.1fs)", epoch, c.max_epoch, mean_auc,
                int(self.done.sum()), self.num_folds, time.time() - start)
            if bool(self.done.all()):
                break
        return self.fold_val_metrics

    # ------------------------------------------------------------------ eval

    def eval_folds(self) -> List[Dict[str, float]]:
        """Fold-parallel validation: batches stacked [F, B, ...]."""
        iters = [iter(l) for l in self.val_loaders]
        probs_per_fold = [[] for _ in range(self.num_folds)]
        labels_per_fold = [[] for _ in range(self.num_folds)]
        while True:
            batches = []
            try:
                for it in iters:
                    b = dict(next(it))
                    b.pop("ids", None)
                    batches.append(b)
            except StopIteration:
                break
            device_batch = {k: jnp.stack(
                [jnp.asarray(b[k]) for b in batches], axis=0)
                for k in batches[0]}
            probs = np.asarray(self._eval_step(self.state.params,
                                               device_batch))
            for f in range(self.num_folds):
                mask = batches[f]["sample_mask"].astype(bool)
                probs_per_fold[f].append(probs[f][mask])
                labels_per_fold[f].append(batches[f]["labels"][mask])
        out = []
        c = self.config
        for f in range(self.num_folds):
            probs = np.concatenate(probs_per_fold[f])
            labels = np.concatenate(labels_per_fold[f])
            m = standard_metrics(probs, labels, add_optimal_acc=True)
            # host-side criterion loss so optimize_for="loss" works
            eps = 1e-7
            p = np.clip(probs, eps, 1 - eps)
            if c.loss_func == "ce" and p.ndim == 2:
                m["loss"] = float(
                    -np.log(p[np.arange(len(labels)), labels]).mean())
            else:
                y = labels.astype(np.float64)
                w = c.pos_wt if c.loss_func == "bce_logits" else 1.0
                m["loss"] = float(-(w * y * np.log(p)
                                    + (1 - y) * np.log(1 - p)).mean())
            out.append(m)
        return out

    def _early_stopping_update(self, metrics_per_fold):
        """Per-fold early stopping (reference train_template.py:221-241
        semantics, vectorized over folds) + device-side best snapshot."""
        c = self.config
        values = np.array([
            m[c.optimize_for] if c.optimize_for != "loss" else m["loss"]
            for m in metrics_per_fold])
        sign = -1.0 if c.optimize_for == "loss" else 1.0
        diff = sign * (values - self.best_metric)
        # a stopped fold is frozen: no snapshot, no patience changes
        improved = (diff > 0) & ~self.done
        for f in np.where(improved)[0]:
            self.fold_val_metrics[f] = metrics_per_fold[f]
        self.best_metric = np.where(improved, values, self.best_metric)
        below = (diff < c.early_stop_thresh) & ~self.done
        self.not_improved = np.where(below, self.not_improved + 1,
                                     np.where(~self.done, 0,
                                              self.not_improved))
        self.done = self.done | (self.not_improved >= c.patience)
        if improved.any():
            self.best_params = self._snapshot(
                self.best_params, self.state.params,
                jnp.asarray(improved))

    # -------------------------------------------------------------- exports

    def best_fold_params(self, fold_idx: int):
        return jax.tree.map(lambda x: x[fold_idx], self.best_params)

    def predict_folds(self, loaders: List) -> List[np.ndarray]:
        """Per-fold probabilities over per-fold loaders using best params."""
        saved = self.state
        self.state = self.state._replace(params=self.best_params)
        try:
            iters = [iter(l) for l in loaders]
            probs_per_fold = [[] for _ in range(self.num_folds)]
            ids_per_fold = [[] for _ in range(self.num_folds)]
            while True:
                batches = []
                try:
                    for it in iters:
                        batches.append(dict(next(it)))
                except StopIteration:
                    break
                device_batch = {k: jnp.stack(
                    [jnp.asarray(b[k]) for b in batches], axis=0)
                    for k in batches[0] if k != "ids"}
                probs = np.asarray(self._eval_step(self.state.params,
                                                   device_batch))
                for f in range(self.num_folds):
                    mask = batches[f]["sample_mask"].astype(bool)
                    probs_per_fold[f].append(probs[f][mask])
                    ids_per_fold[f].append(batches[f]["ids"][mask])
            return ([np.concatenate(p) for p in probs_per_fold],
                    [np.concatenate(i) for i in ids_per_fold])
        finally:
            self.state = saved
