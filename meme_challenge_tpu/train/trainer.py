"""Trainer lifecycle.

Capability parity with reference train_template.py (TrainerTemplate) +
train_uniter.py (TrainerUniter), re-architected around one jitted train step:

- epoch loop over host micro-batches grouped into ``[accum, micro_bs, ...]``
  device batches (steps.py) instead of eager per-iter backward;
- per-epoch train metrics, validation, early stopping on the monitored
  metric with patience + improvement threshold (train_template.py:221-241);
- best-checkpoint reload → optimal threshold on validation →
  per-test-set exports: labeled sets get metrics + ``id,proba,label,gt``
  CSVs, unlabeled sets get leaderboard CSVs (train_template.py:287-338);
- metrics JSON export (train_template.py:343-354).

Deviation from the reference (documented): leftover micro-batches that don't
fill an accumulation group at epoch end are padded with zero-mask
micro-batches and stepped, instead of leaking their gradients into the next
epoch (reference quirk, SURVEY.md §2 notes).
"""
from __future__ import annotations

import logging
import os
import time
from collections import defaultdict
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from meme_challenge_tpu.core.config import TrainConfig
from meme_challenge_tpu.core.artifacts import export_metrics_json, export_predictions
from meme_challenge_tpu.core.metrics import (
    find_optimal_threshold,
    standard_metrics,
)
from meme_challenge_tpu.core.seeding import prng_key
from meme_challenge_tpu.data.meme_dataset import BatchLoader
from meme_challenge_tpu.train.checkpoint import ModelSaver
from meme_challenge_tpu.train.losses import make_loss_fn
from meme_challenge_tpu.train.optim import make_optimizer
from meme_challenge_tpu.train.schedules import make_schedule
from meme_challenge_tpu.train.steps import (
    EVAL_INFLIGHT_WINDOW,
    EvalPipeline,
    TrainState,
    chunk_batches,
    create_train_state,
    eval_chain_token,
    make_eval_step,
    make_train_multi_step,
    make_train_step,
    stack_chunk,
    stack_for_accum,
)

logger = logging.getLogger("meme_challenge_tpu.train")


def _np_batch_loss(probs: np.ndarray, labels: np.ndarray, loss_func: str,
                   pos_wt: float) -> float:
    """Host-side eval loss from probabilities (reference logs criterion loss
    per eval batch, train_template.py:131-152)."""
    eps = 1e-7
    p = np.clip(probs, eps, 1 - eps)
    if loss_func == "ce":
        return float(-np.log(p[np.arange(len(labels)), labels]).mean())
    y = labels.astype(np.float64)
    w = pos_wt if loss_func == "bce_logits" else 1.0
    return float(-(w * y * np.log(p) + (1 - y) * np.log(1 - p)).mean())


class Trainer:
    """Host orchestration around the jitted steps.

    Parameters
    ----------
    config : TrainConfig
    model : flax module with ``__call__(batch, deterministic)`` → logits
    params : initial parameter pytree
    train_loader / val_loader / test_loaders : BatchLoader instances
    """

    def __init__(
        self,
        config: TrainConfig,
        model,
        params,
        train_loader: Optional[BatchLoader],
        val_loader: Optional[BatchLoader],
        test_loaders: Optional[List[BatchLoader]] = None,
        update_scales=None,
    ):
        self.config = config
        self.model = model
        self.test_loaders = test_loaders or []
        self.train_loader = train_loader
        self.val_loader = val_loader

        c = config
        self.model_file = os.path.join(c.model_path, c.model_save_name)
        self.saver = ModelSaver(self.model_file)
        self.loss_fn = make_loss_fn(c.loss_func, c.pos_wt)

        total_steps = (len(train_loader) * c.max_epoch) if train_loader else 1
        schedule = make_schedule(
            c.scheduler, warmup_steps=c.warmup_steps, total_steps=total_steps,
            lr_decay_step=c.lr_decay_step, lr_decay_factor=c.lr_decay_factor)
        self.schedule = schedule
        self.tx = make_optimizer(
            c.optimizer, c.lr, schedule, beta1=c.beta1, beta2=c.beta2,
            weight_decay=c.weight_decay, max_grad_norm=c.max_grad_norm,
            params_example=params, update_scales=update_scales,
            mu_dtype=c.adam_mu_dtype, nu_dtype=c.adam_nu_dtype)
        self.state = create_train_state(params, self.tx)

        def model_apply_train(params_, batch, rng):
            return self.model.apply({"params": params_}, batch,
                                    deterministic=False,
                                    rngs={"dropout": rng})

        def model_apply_eval(params_, batch):
            return self.model.apply({"params": params_}, batch,
                                    deterministic=True)

        # device-resident data (train/steps.py:gather_micro): loaders built
        # with ``index_batches=True`` yield index batches; their dataset is
        # uploaded to HBM once and micro-batches gather on device. Detected
        # per loader so index-mode and host-batch loaders can mix.
        self._gather_train = bool(getattr(train_loader, "index_batches",
                                          False))
        self._dataset_device_cache: Dict[int, dict] = {}
        self.train_step = make_train_step(
            model_apply_train, self.loss_fn, self.tx,
            accum_steps=c.gradient_accumulation,
            gather_data=self._gather_train,
            fuse_accum=c.fuse_accum)
        # chunked dispatch: K optimizer steps per jitted call (lax.scan) —
        # amortizes the per-step dispatch RTT. Auto: only worthwhile when
        # the chunk upload is index bytes, not K× feature megabytes.
        self.steps_per_dispatch = c.steps_per_dispatch or (
            8 if self._gather_train else 1)
        self.train_multi_step = None
        if self.steps_per_dispatch > 1:
            self.train_multi_step = make_train_multi_step(
                model_apply_train, self.loss_fn, self.tx,
                accum_steps=c.gradient_accumulation,
                steps_per_dispatch=self.steps_per_dispatch,
                gather_data=self._gather_train,
                unroll=c.dispatch_unroll,
                fuse_accum=c.fuse_accum)
        if c.loss_func == "ce":
            probs_fn = lambda lg: jax.nn.softmax(lg.astype(jnp.float32), -1)
        else:
            probs_fn = lambda lg: jax.nn.sigmoid(
                lg.reshape(lg.shape[0], -1)[:, 0].astype(jnp.float32))
        # both variants exist; jit compiles lazily so the unused one is free
        self._eval_steps = {
            False: make_eval_step(model_apply_eval, probs_fn),
            True: make_eval_step(model_apply_eval, probs_fn,
                                 gather_data=True),
        }
        self.eval_step = self._eval_steps[False]

        self.root_rng = prng_key(c.seed)
        # early-stopping state (reference train_template.py:29-36)
        self.best_val_metrics: Dict[str, float] = defaultdict(int)
        self.best_val_loss = 1000.0
        self.not_improved = 0
        self.terminate_training = False
        self.train_metrics: Dict[str, float] = {}
        self.train_loss = 0.0
        self.test_metrics: Dict[str, dict] = {}
        self.total_iters = 0
        self.scalars: List[tuple] = []  # (name, step, value) observability log
        self.writer = None
        if c.vis_path:
            from meme_challenge_tpu.train.observability import ScalarWriter

            self.writer = ScalarWriter(
                os.path.join(c.vis_path,
                             c.model_save_name.rsplit(".", 1)[0]))

    # ------------------------------------------------------------------ train

    def _data_for(self, loader) -> Optional[dict]:
        """Device-resident dataset arrays for an index-mode loader (uploaded
        once per dataset, cached); None for host-batch loaders."""
        if not getattr(loader, "index_batches", False):
            return None
        key = id(loader.dataset)
        if key not in self._dataset_device_cache:
            # pin the dataset object in the entry: id() of a freed dataset
            # can be recycled by the allocator, and a stale hit would
            # silently gather ANOTHER dataset's features for these indices
            self._dataset_device_cache[key] = (
                loader.dataset, jax.device_put(
                    loader.dataset.device_arrays()))
        return self._dataset_device_cache[key][1]

    def _device_batches(self, loader: BatchLoader):
        """Group host micro-batches into [accum, ...] device batches."""
        accum = self.config.gradient_accumulation
        group: List[dict] = []
        for batch in loader:
            batch = dict(batch)
            batch.pop("ids", None)
            group.append(batch)
            if len(group) == accum:
                yield stack_for_accum(group)
                group = []
        if group:
            pad = dict(group[-1])
            pad["sample_mask"] = np.zeros_like(pad["sample_mask"])
            while len(group) < accum:
                group.append(pad)
            yield stack_for_accum(group)

    def train_main(self):
        c = self.config
        logger.info("Beginning training: %s", c.model_save_name)
        start = time.time()
        # host-side mirror of state.step: ``int(self.state.step)`` per step
        # is a blocking fetch on the IN-FLIGHT donated state — it would
        # serialize host batch prep against device compute (one relay RTT +
        # full step latency per iteration). The mirror yields the identical
        # fold_in values; synced once here in case params were restored.
        host_step = int(self.state.step)
        for epoch in range(1, c.max_epoch + 1):
            epoch_probs, epoch_labels, epoch_masks, losses = [], [], [], []
            epoch_start = time.time()
            n_steps = 0
            train_data = self._data_for(self.train_loader)

            def run_single(device_batch):
                nonlocal host_step, n_steps
                step_rng = jax.random.fold_in(self.root_rng, host_step)
                host_step += 1
                self.state, out = self.train_step(
                    self.state, device_batch, step_rng, train_data)
                # keep DEVICE arrays in-flight — a per-step np.asarray would
                # force a host sync every iteration and serialize host batch
                # prep with device compute (the outputs are tiny [accum, B]
                # buffers); everything is fetched once after the epoch
                losses.append(out["loss"])
                epoch_probs.append(out["probs"])
                epoch_labels.append(device_batch["labels"])
                epoch_masks.append(device_batch["sample_mask"])
                n_steps += 1
                self.total_iters += c.gradient_accumulation

            def run_chunk(chunk):
                # K steps in one dispatch (steps.make_train_multi_step);
                # per-step RNG derives in-graph from state.step — the same
                # fold_in stream run_single produces from host_step
                nonlocal host_step, n_steps
                stacked = stack_chunk(chunk)
                self.state, out = self.train_multi_step(
                    self.state, stacked, self.root_rng, train_data)
                losses.append(out["loss"])
                epoch_probs.append(out["probs"])
                epoch_labels.append(stacked["labels"])
                epoch_masks.append(stacked["sample_mask"])
                host_step += len(chunk)
                n_steps += len(chunk)
                self.total_iters += len(chunk) * c.gradient_accumulation

            if self.train_multi_step is None:
                for device_batch in self._device_batches(self.train_loader):
                    run_single(device_batch)
            else:
                for kind, x in chunk_batches(
                        self._device_batches(self.train_loader),
                        self.steps_per_dispatch):
                    (run_chunk if kind == "chunk" else run_single)(x)
            if losses:
                losses = [np.asarray(x) for x in losses]        # sync point
                epoch_probs = [np.asarray(x) for x in epoch_probs]
                epoch_labels = [np.asarray(x) for x in epoch_labels]
                epoch_masks = [np.asarray(x) for x in epoch_masks]
                self.scalars.append(("Stats/time_per_train_iter",
                                     self.total_iters,
                                     (time.time() - epoch_start)
                                     / (n_steps * c.gradient_accumulation)))
                lr_factor = float(self.schedule(host_step))
                self.scalars.append(("Stats/learning_rate", self.total_iters,
                                     c.lr * lr_factor))

            # leading dims vary by dispatch mode — [accum, B] from single
            # steps, [K, accum, B] from chunks — flatten them all; only the
            # CE class dim survives
            n_cls = (epoch_probs[0].shape[-1]
                     if c.loss_func == "ce" else None)
            probs = np.concatenate(
                [p.reshape(-1, n_cls) if n_cls else p.reshape(-1)
                 for p in epoch_probs])
            labels = np.concatenate([l.reshape(-1) for l in epoch_labels])
            masks = np.concatenate([m.reshape(-1) for m in epoch_masks])
            valid = masks.astype(bool)
            self.train_metrics = standard_metrics(
                probs[valid], labels[valid], add_optimal_acc=True)
            # weight per-micro losses by their valid-sample counts so the
            # zero-mask padding of the final accumulation group doesn't
            # deflate the epoch loss
            loss_flat = np.concatenate([x.reshape(-1) for x in losses])
            count_flat = np.concatenate(
                [m.reshape(-1, m.shape[-1]).sum(-1) for m in epoch_masks])
            self.train_loss = float(np.average(
                loss_flat, weights=np.maximum(count_flat, 0) + 1e-9))

            val_t0 = time.time()
            self.val_metrics, self.val_loss = self.eval_model(self.val_loader)
            self.scalars.append(("Stats/time_validation", self.total_iters,
                                 time.time() - val_t0))
            # reference scalar names (utils/utils.py:25-60)
            self.scalars.append(("Train/Epoch_Loss", self.total_iters,
                                 self.train_loss))
            self.scalars.append(("Validation/Loss", epoch, self.val_loss))
            for k, v in self.val_metrics.items():
                self.scalars.append((f"Validation/{k}", epoch, v))
            for k, v in self.train_metrics.items():
                self.scalars.append((f"Train/{k}", epoch, v))

            logger.info(
                "Epoch %i/%i  train_loss=%.4f train_auc=%.4f  "
                "val_loss=%.4f val_auc=%.4f  (%.1fs)",
                epoch, c.max_epoch, self.train_loss,
                self.train_metrics.get("aucroc", -1), self.val_loss,
                self.val_metrics.get("aucroc", -1), time.time() - start)

            if self.writer is not None:
                self.writer.add_scalars(
                    (n, s, v) for n, s, v in self.scalars)
                self.scalars.clear()
                self.writer.flush()

            self.check_early_stopping()
            if self.terminate_training:
                break
        return self.end_training()

    # ------------------------------------------------------------------- eval

    def eval_model(self, loader: BatchLoader):
        # pipelined pass: dispatches chained + in flight (bounded window
        # for host-batch loaders — pending feature batches pin HBM), ONE
        # tail fetch (steps.make_eval_step docstring; r3 review item 2)
        gather = bool(getattr(loader, "index_batches", False))
        step, data = self._eval_steps[gather], self._data_for(loader)
        token = eval_chain_token()
        pipe = EvalPipeline(window=None if gather else EVAL_INFLIGHT_WINDOW)
        masks, labels_list = [], []
        for batch in loader:
            mask = batch["sample_mask"].astype(bool)
            out, token = step(self.state.params, batch, data, token)
            pipe.add(out)
            masks.append(mask)
            labels_list.append(batch["labels"][mask])
        probs_list = [p[m] for p, m in zip(pipe.results(), masks)]
        probs = np.concatenate(probs_list)
        labels = np.concatenate(labels_list)
        metrics = standard_metrics(probs, labels, add_optimal_acc=True)
        # reference averages per-batch criterion means (train_template.py:146)
        batch_losses = [
            _np_batch_loss(p, l, self.config.loss_func, self.config.pos_wt)
            for p, l in zip(probs_list, labels_list)
        ]
        self._last_eval = (probs, labels)
        return metrics, float(np.mean(batch_losses))

    def predict(self, loader: BatchLoader):
        """Probabilities + ids over a loader (reference export path).

        Same pipelined dispatch pattern as :meth:`eval_model`."""
        gather = bool(getattr(loader, "index_batches", False))
        step, data = self._eval_steps[gather], self._data_for(loader)
        token = eval_chain_token()
        pipe = EvalPipeline(window=None if gather else EVAL_INFLIGHT_WINDOW)
        masks, ids_list, labels_list = [], [], []
        for batch in loader:
            mask = batch["sample_mask"].astype(bool)
            out, token = step(self.state.params, batch, data, token)
            pipe.add(out)
            masks.append(mask)
            ids_list.append(batch["ids"][mask])
            labels_list.append(batch["labels"][mask])
        probs_list = [p[m] for p, m in zip(pipe.results(), masks)]
        return (np.concatenate(probs_list), np.concatenate(ids_list),
                np.concatenate(labels_list))

    # --------------------------------------------------------- early stopping

    def check_early_stopping(self):
        """Reference train_template.py:221-241 semantics exactly."""
        c = self.config
        opt_for = c.optimize_for
        this_metric = (self.val_loss if opt_for == "loss"
                       else self.val_metrics[opt_for])
        current_best = (self.best_val_loss if opt_for == "loss"
                        else self.best_val_metrics[opt_for])
        new_best = (this_metric < current_best if opt_for == "loss"
                    else this_metric > current_best)
        if new_best:
            logger.info("New high score, saving model...")
            self.best_val_metrics = self.val_metrics
            self.best_val_loss = self.val_loss
            if not c.no_model_checkpoints:
                self.saver.save(self.state.params)
        diff = (current_best - this_metric if opt_for == "loss"
                else this_metric - current_best)
        if diff < c.early_stop_thresh:
            self.not_improved += 1
            if self.not_improved >= c.patience:
                self.terminate_training = True
        else:
            self.not_improved = 0
        logger.info("current patience: %i", self.not_improved)

    # ------------------------------------------------------------ end of run

    @staticmethod
    def _binary_probs(probs: np.ndarray) -> np.ndarray:
        """CSV/threshold export needs 1-D probabilities. Binary CE → p(class
        1); multiclass → max-class probability (the id,proba,label schema is
        inherently binary; the reference's CE path never reached export)."""
        if probs.ndim == 1:
            return probs
        if probs.shape[1] == 2:
            return probs[:, 1]
        return probs.max(axis=1)

    @staticmethod
    def _discrete_preds(probs_raw: np.ndarray, threshold: float) -> np.ndarray:
        """Discrete labels for export: threshold for binary probabilities,
        argmax for ≥3-class softmax outputs."""
        if probs_raw.ndim == 2 and probs_raw.shape[1] > 2:
            return probs_raw.argmax(axis=1).astype(np.int64)
        return (Trainer._binary_probs(probs_raw) > threshold).astype(np.int64)

    def _csv_path(self, dataset_name: str) -> str:
        base = self.config.model_save_name.rsplit(".", 1)[0]
        return os.path.join(self.config.model_path,
                            base + "_%s_preds.csv" % dataset_name)

    def end_training(self):
        c = self.config
        if self.terminate_training:
            logger.info("Training terminated early (no %s improvement for "
                        "%i epochs)", c.optimize_for, c.patience)
        self.test_metrics = {}
        if not c.no_model_checkpoints and os.path.isfile(self.model_file):
            # reload best params (reference train_template.py:298-303)
            params = self.saver.load(self.state.params)
            self.state = self.state._replace(params=params)

            # optimal threshold on validation (train_template.py:304-310);
            # one inference pass serves both metrics and export
            val_probs_raw, val_ids, val_labels = self.predict(self.val_loader)
            val_probs = self._binary_probs(val_probs_raw)
            if not self.val_loader.dataset.return_ids:
                val_ids = np.zeros_like(val_labels) - 1
            binary = bool(np.all((val_labels == 0) | (val_labels == 1)))
            if binary:
                # NOTE: the dev CSV below exports labels at threshold 0.5
                # while test exports use the optimal threshold — REFERENCE
                # PARITY (train_template.py:187 default + :305 calls
                # export_val_predictions() without passing the threshold).
                threshold = find_optimal_threshold(val_probs, val_labels,
                                                   metric="accuracy")
                logger.info("Optimal threshold on validation: %.4f",
                            threshold)
            else:
                # >2 classes: thresholds are meaningless — exports use argmax
                threshold = 0.5
            export_predictions(
                self._csv_path(self.val_loader.dataset.name),
                val_ids, val_probs,
                self._discrete_preds(val_probs_raw, 0.5), labels=val_labels)

            for loader in self.test_loaders:
                name = loader.dataset.name
                probs_raw, ids, labels = self.predict(loader)
                probs = self._binary_probs(probs_raw)
                preds = self._discrete_preds(probs_raw, threshold)
                if loader.dataset.labels[0] == -1:
                    # unlabeled leaderboard export (train_template.py:157-192)
                    export_predictions(self._csv_path(name), ids, probs,
                                       preds)
                    self.test_metrics[name] = {}
                else:
                    self.test_metrics[name] = standard_metrics(
                        probs_raw, labels, add_optimal_acc=True)
                    export_predictions(self._csv_path(name), ids, probs,
                                       preds, labels=labels)
        else:
            logger.info("No model checkpoints were saved; skipping testing.")

        self.export_metrics()
        if self.writer is not None:
            self.writer.close()
        if c.remove_checkpoints and os.path.isfile(self.model_file):
            os.remove(self.model_file)
        return self.best_val_metrics, self.test_metrics

    def export_metrics(self):
        """Reference train_template.py:343-354."""
        base = self.config.model_save_name.rsplit(".", 1)[0]
        path = os.path.join(self.config.model_path, base + "_metrics.json")
        metric_dict = {
            "dev": dict(self.best_val_metrics, loss=self.best_val_loss),
            "train": dict(self.train_metrics, loss=self.train_loss),
        }
        if self.test_metrics:
            metric_dict["test"] = self.test_metrics
        export_metrics_json(path, metric_dict)
