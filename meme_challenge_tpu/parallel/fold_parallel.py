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

import json
import logging
import os
import random
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from meme_challenge_tpu.core.config import TrainConfig
from meme_challenge_tpu.core.metrics import standard_metrics
from meme_challenge_tpu.core.seeding import fold_seed, prng_key
from meme_challenge_tpu.train.losses import make_loss_fn
from meme_challenge_tpu.train.optim import make_optimizer
from meme_challenge_tpu.train.schedules import make_schedule
from meme_challenge_tpu.train.steps import (
    EVAL_INFLIGHT_WINDOW,
    EvalPipeline,
    TrainState,
    _train_step_body,
    chunk_batches,
    eval_chain_token,
    stack_chunk,
    stack_for_accum,
)

logger = logging.getLogger("meme_challenge_tpu.fold_parallel")


def _check_equal_batch_counts(loaders, what: str) -> None:
    """The fold-parallel eval/export loops zip per-fold loaders and stop at
    the FIRST exhausted one — unequal batch counts would silently drop tail
    batches of the longer folds. The shipped drivers always pass
    equal-length loaders (fixed dev_size val splits, shared test sets);
    anything else must fail loudly here, not truncate."""
    counts = {len(l) for l in loaders}
    if len(counts) > 1:
        raise ValueError(
            f"{what} fold loaders have unequal batch counts {sorted(counts)}"
            " — the stacked [F, B, ...] eval would drop the longer folds'"
            " tail batches (training cycles unequal folds; eval cannot)")


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
            # in lockstep for max-length steps per epoch, and shorter folds
            # CYCLE (restart their stream) instead of the longest folds
            # dropping tail batches — no data is silently skipped.
            logger.warning(
                "fold train loaders have unequal lengths %s; each epoch "
                "runs max(%i) steps per fold, shorter folds cycle",
                sorted(lengths), max(lengths))
        # val loaders cannot cycle (eval must see every sample once) — fail
        # at construction, not after the first full training epoch
        _check_equal_batch_counts(val_loaders, "val")
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
            params_example=params_example, mu_dtype=c.adam_mu_dtype,
            nu_dtype=c.adam_nu_dtype)

        opt_state = jax.vmap(self.tx.init)(params_stacked)
        self.state = TrainState(
            params=params_stacked, opt_state=opt_state,
            step=jnp.zeros((self.num_folds,), jnp.int32))
        self.best_params = jax.tree.map(jnp.copy, params_stacked)

        # device-resident data (steps.gather_micro): index-mode loaders →
        # per-fold datasets stacked [F, N_max, ...] and uploaded ONCE
        # (fold-sharded on a mesh), per step only [F, accum, B] indices
        # cross the host link
        self._gather = bool(getattr(train_loaders[0], "index_batches",
                                    False))
        assert all(bool(getattr(l, "index_batches", False)) == self._gather
                   for l in train_loaders + val_loaders), (
            "mix of index-mode and host-batch fold loaders")
        # staged-upload cache: repeated predict_folds calls on the same
        # loaders (per-epoch eval, end-of-training exports) must not re-dedup
        # and re-push an already-resident corpus through the host link.
        # Entries hold the dataset objects too, so the id()-based keys can't
        # be recycled by the allocator while cached.
        self._data_cache: dict = {}
        self._train_data = (self._stack_fold_data(train_loaders)
                            if self._gather else None)
        self._val_data = (self._stack_fold_data(val_loaders)
                          if self._gather else None)

        self._build_steps()
        if mesh is not None:
            self._shard_state()

        # per-fold dropout streams seeded exactly like the sequential
        # driver: prng_key(fold_seed(seed, fold)) (crossval_driver.py:103),
        # folded with that fold's own step counter — fold-parallel F=1 is
        # bit-compatible with the sequential Trainer's RNG discipline
        self.fold_roots = jnp.stack(
            [prng_key(fold_seed(c.seed, f)) for f in range(self.num_folds)])
        self.start_epoch = 1
        self.best_metric = np.full(
            self.num_folds,
            np.inf if c.optimize_for == "loss" else -np.inf)
        self.not_improved = np.zeros(self.num_folds, dtype=np.int64)
        self.done = np.zeros(self.num_folds, dtype=bool)
        self.fold_val_metrics: List[Dict[str, float]] = [
            {} for _ in range(self.num_folds)]

    # ------------------------------------------------------------- jit steps

    def _stack_fold_data(self, loaders):
        """Shared union corpus + per-fold index translation:
        ``({key: [N_union, ...]}, [F, N_max] int32)``.

        Crossval fold TRAIN splits overlap (F−1)/F, so stacking per-fold
        copies ``[F, N, ...]`` multiplies HBM by ~F wherever the fold axis
        is not sharded over devices (single-chip many-fold runs OOM on the
        ~4 GB HM corpus at F≥4). Instead the union of the folds' rows —
        deduped by meme id; rows for one id are identical across folds by
        construction (same source jsonl, tokenizer settings, feature store)
        — uploads once, REPLICATED over the mesh, and each fold carries only
        an ``[N_max]`` int32 local→global row table (fold-sharded; padding
        slots point at row 0 and are never selected by real indices).
        Disjoint fold datasets (val dev-splits) degenerate to concatenation
        at zero overhead."""
        datasets = [l.dataset for l in loaders]
        key = ("stack",) + tuple(map(id, datasets))
        cached = self._data_cache.get(key)
        if cached is not None:
            return cached[1]
        n_max = max(len(d) for d in datasets)
        global_row: dict = {}
        new_rows_per_fold = []
        trans = np.zeros((len(datasets), n_max), np.int32)
        for f, d in enumerate(datasets):
            new_rows = []
            for local, id_ in enumerate(d.ids.tolist()):
                g = global_row.get(id_)
                if g is None:
                    g = len(global_row)
                    global_row[id_] = g
                    new_rows.append(local)
                trans[f, local] = g
            new_rows_per_fold.append(np.asarray(new_rows, np.int64))
        arrays = [d.device_arrays() for d in datasets]
        shared = {k: np.concatenate(
            [a[k][rows] for a, rows in zip(arrays, new_rows_per_fold)
             if rows.size])
            for k in arrays[0]}
        if self.mesh is not None:
            rep = NamedSharding(self.mesh, P())
            shared = {k: jax.device_put(v, rep) for k, v in shared.items()}
            trans = jax.device_put(trans, NamedSharding(self.mesh,
                                                        P("fold")))
        else:
            shared = {k: jax.device_put(v) for k, v in shared.items()}
            trans = jax.device_put(trans)
        self._data_cache[key] = (datasets, (shared, trans))
        return shared, trans

    def _build_steps(self):
        from meme_challenge_tpu.train.steps import gather_micro

        c = self.config
        accum = c.gradient_accumulation
        model = self.model
        loss_fn = self.loss_fn
        tx = self.tx
        gather = self._gather
        # data = (shared union corpus — unmapped, replicated) +
        # (this fold's local→global row table — mapped over the fold axis)
        data_axis = (None, 0) if gather else None

        def fold_gather(data, batch):
            shared, trans_f = data
            b = dict(batch)
            b["indices"] = jnp.take(trans_f, batch["indices"], axis=0)
            return gather_micro(shared, b)

        def apply_train(params, micro_batch, rng):
            return model.apply({"params": params}, micro_batch,
                               deterministic=False, rngs={"dropout": rng})

        # ONE accumulation body shared with the sequential Trainer
        # (steps._train_step_body: seeded-accumulator scan or fuse_accum's
        # single fused fwd/bwd with per-micro masked-mean loss weighting);
        # the fold-table gather rides in as the custom gather callable
        fold_update = _train_step_body(
            apply_train, loss_fn, tx, accum,
            gather_data=(fold_gather if gather else False),
            fuse_accum=c.fuse_accum)

        vm = jax.vmap(fold_update, in_axes=(0, 0, 0, data_axis))
        self._train_step = jax.jit(vm, donate_argnums=(0,))

        # chunked dispatch (train/steps.make_train_multi_step analogue):
        # K whole optimizer steps per jitted call via lax.scan over
        # [K, F, accum, ...] batches — one dispatch round trip per K steps.
        # Per-fold per-step dropout rngs derive IN-GRAPH from the fold
        # roots + each fold's carried step counter: the identical
        # vmap(fold_in)(fold_roots, state.step) stream the single-step
        # loop computes on the host, so chunked == unchunked pointwise
        # (tests/test_parallel.py).
        def multi(state, batches, fold_roots, data):
            def body(st, batch):
                rngs = jax.vmap(jax.random.fold_in)(fold_roots, st.step)
                return vm(st, batch, rngs, data)

            return jax.lax.scan(body, state, batches,
                                unroll=c.dispatch_unroll)

        self._train_multi_step = jax.jit(multi, donate_argnums=(0,))

        def fold_eval(params, batch, data):
            if gather:
                batch = fold_gather(data, batch)
            logits = model.apply({"params": params}, batch,
                                 deterministic=True)
            if c.loss_func == "ce":
                return jax.nn.softmax(logits.astype(jnp.float32), -1)
            return jax.nn.sigmoid(
                logits.reshape(logits.shape[0], -1)[:, 0].astype(jnp.float32))

        # Successive eval dispatches are dependency-chained through a
        # zero-valued scalar token (steps.make_eval_step / detector.py
        # pattern) so a deep window of the loader pass stays in flight on
        # the relay (EvalPipeline bounds the depth for host-batch loaders)
        # and the host fetches the tail ONCE after the last dispatch — a
        # per-batch np.asarray serialized host stacking against device
        # compute and paid the relay RTT per batch (r3 review item 2).
        def _chained(ev_vm):
            def step(params, batch, data, token):
                probs = ev_vm(params, batch, data) + token  # token == 0.0
                # nan_to_num keeps the out-token finite even when a fold
                # diverges (NaN p0 would poison the rest of the pass)
                return probs, jnp.nan_to_num(probs.reshape(-1)[0]) * 0.0
            return jax.jit(step)

        self._eval_step = _chained(
            jax.vmap(fold_eval, in_axes=(0, 0, data_axis)))
        # shared-batch variant: one [B, ...] batch broadcast over the fold
        # axis on device (in_axes=(0, None)) — H2D bytes independent of F.
        # With gather, the shared loader's dataset is one UNSTACKED array
        # set shared by every fold.
        self._eval_step_shared = _chained(
            jax.vmap(fold_eval, in_axes=(0, None, None)))

        def snapshot(best, current, improved_mask):
            def upd(b, p):
                mask = improved_mask.reshape(
                    (-1,) + (1,) * (p.ndim - 1))
                return jnp.where(mask, p, b)
            return jax.tree.map(upd, best, current)

        self._snapshot = jax.jit(snapshot, donate_argnums=(0,))

    def _shard_state(self):
        """Shard fold-stacked state over the mesh.

        Every leaf is fold-sharded; when the mesh also has a ``model`` axis,
        parameters (and their optimizer moments, via
        ``optax.tree_utils.tree_map_params``) additionally get Megatron-style
        tensor-parallel specs (mesh.uniter_param_specs) — fold × data × model
        3-axis training with all collectives derived by GSPMD.
        """
        mesh = self.mesh
        fold_sharding = NamedSharding(mesh, P("fold"))

        def put_fold(leaf):
            return jax.device_put(leaf, fold_sharding)

        if "model" in mesh.axis_names:
            from meme_challenge_tpu.parallel.mesh import (
                filter_divisible_specs,
                uniter_param_specs,
            )

            specs = uniter_param_specs(self.state.params,
                                       model_axis="model", fold_axis="fold")
            specs = filter_divisible_specs(mesh, self.state.params, specs)

            def put_spec(leaf, spec):
                return jax.device_put(leaf, NamedSharding(mesh, spec))

            import optax as _optax

            params = jax.tree.map(put_spec, self.state.params, specs)
            opt_state = _optax.tree_utils.tree_map_params(
                self.tx, put_spec, self.state.opt_state, specs,
                transform_non_params=put_fold)
            self.best_params = jax.tree.map(put_spec, self.best_params,
                                            specs)
        else:
            params = jax.tree.map(put_fold, self.state.params)
            opt_state = jax.tree.map(put_fold, self.state.opt_state)
            self.best_params = jax.tree.map(put_fold, self.best_params)
        self.state = TrainState(
            params=params, opt_state=opt_state,
            step=jax.device_put(self.state.step, fold_sharding),
        )

    # ----------------------------------------------------------------- train

    def _fold_device_batches(self):
        """Zip fold loaders → [F, accum, micro_bs, ...] device batches.

        Folds march in lockstep for ``max(len(loader)) // accum`` steps per
        epoch; a fold whose stream runs out mid-epoch restarts it (cycles)
        so longer folds never drop tail batches and shorter folds never
        starve the mesh.
        """
        accum = self.config.gradient_accumulation
        # ceil: a trailing partial accumulation group still runs (the
        # cycling iterators top it up) — flooring would silently drop
        # max_len %% accum micro-batches per epoch, diverging from the
        # sequential trainer which pads its final group
        steps = max(-(-max(len(l) for l in self.train_loaders) // accum), 1)
        iters = [iter(l) for l in self.train_loaders]

        def next_micro(f):
            try:
                return dict(next(iters[f]))
            except StopIteration:
                iters[f] = iter(self.train_loaders[f])
                return dict(next(iters[f]))

        for _ in range(steps):
            fold_groups = []
            for f in range(self.num_folds):
                group = []
                for _ in range(accum):
                    b = next_micro(f)
                    b.pop("ids", None)
                    group.append(b)
                fold_groups.append(stack_for_accum(group))
            # numpy stack: leaves upload inside the one train-step dispatch
            # (steps.stack_for_accum note — per-leaf jnp ops pay relay RTs)
            yield {k: np.stack([g[k] for g in fold_groups], axis=0)
                   for k in fold_groups[0]}

    def train_main(self, checkpoint_path: Optional[str] = None
                   ) -> List[Dict[str, float]]:
        """``checkpoint_path``: if set, the full driver state is saved
        there after every epoch (kill-and-resume via ``load_checkpoint``)."""
        c = self.config
        start = time.time()
        if bool(self.done.all()):
            # resumed a run whose folds all early-stopped — nothing to train
            logger.info("[fold-parallel] all %i folds already done; "
                        "skipping training", self.num_folds)
            return self.fold_val_metrics
        # chunk size: K steps per dispatch only when per-step uploads are
        # index bytes (device-resident folds); host-batch mode would stack
        # K × F × accum feature-megabytes per call
        K = c.steps_per_dispatch or (8 if self._gather else 1)
        for epoch in range(self.start_epoch, c.max_epoch + 1):
            # no per-step fetch: a per-step np.asarray would sync the host
            # against every dispatched step and serialize batch assembly
            # with device compute (the loss values were never consumed)
            def run_single(device_batch):
                fold_rngs = jax.vmap(jax.random.fold_in)(
                    self.fold_roots, self.state.step)
                self.state, _ = self._train_step(
                    self.state, device_batch, fold_rngs, self._train_data)

            def run_chunk(chunk_list):
                chunk = stack_chunk(chunk_list)
                self.state, _ = self._train_multi_step(
                    self.state, chunk, self.fold_roots, self._train_data)

            if K > 1:
                for kind, x in chunk_batches(self._fold_device_batches(), K):
                    (run_chunk if kind == "chunk" else run_single)(x)
            else:
                for device_batch in self._fold_device_batches():
                    run_single(device_batch)

            metrics_per_fold = self.eval_folds()
            self._early_stopping_update(metrics_per_fold)
            mean_auc = float(np.mean(
                [m.get("aucroc", -1) for m in metrics_per_fold]))
            logger.info(
                "[fold-parallel] epoch %i/%i mean_val_auc=%.4f done=%i/%i "
                "(%.1fs)", epoch, c.max_epoch, mean_auc,
                int(self.done.sum()), self.num_folds, time.time() - start)
            if checkpoint_path:
                self.save_checkpoint(checkpoint_path, epoch + 1)
            if bool(self.done.all()):
                break
        return self.fold_val_metrics

    # ------------------------------------------------------------------ eval

    def eval_folds(self) -> List[Dict[str, float]]:
        """Fold-parallel validation: batches stacked [F, B, ...]."""
        _check_equal_batch_counts(self.val_loaders, "val")
        iters = [iter(l) for l in self.val_loaders]
        probs_per_fold = [[] for _ in range(self.num_folds)]
        labels_per_fold = [[] for _ in range(self.num_folds)]
        # pipelined pass: dispatches chained + in flight (bounded window
        # for host-batch loaders — each pending [F, B] feature stack pins
        # F batches of HBM); one tail fetch (see _chained in _build_steps)
        token = eval_chain_token()
        pipe = EvalPipeline(window=None if self._gather
                            else EVAL_INFLIGHT_WINDOW)
        host_batches = []
        while True:
            batches = []
            try:
                for it in iters:
                    b = dict(next(it))
                    b.pop("ids", None)
                    batches.append(b)
            except StopIteration:
                break
            device_batch = {k: np.stack(
                [np.asarray(b[k]) for b in batches], axis=0)
                for k in batches[0]}
            out, token = self._eval_step(self.state.params, device_batch,
                                         self._val_data, token)
            pipe.add(out)
            # retain only what the post-loop reads — keeping the full batch
            # dicts would pin every fold's feature arrays in host RAM for
            # the whole pass (they're already uploaded; the window only
            # bounds the DEVICE side)
            host_batches.append([
                {"sample_mask": np.asarray(b["sample_mask"]),
                 "labels": np.asarray(b["labels"])} for b in batches])
        for probs, batches in zip(pipe.results(), host_batches):
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

    # --------------------------------------------------------- kill/resume

    def save_checkpoint(self, path: str, next_epoch: int) -> None:
        """Full driver state → one file: params, optimizer, per-fold early-
        stopping trackers, best snapshots. Written after every epoch when
        ``train_main(checkpoint_path=...)`` is set; a killed run resumes
        exactly (same RNG streams — per-fold step counters are part of the
        state) via :meth:`load_checkpoint`."""
        from flax import serialization

        # best-epoch metric dicts + HOST RNG states ride as a JSON string
        # leaf INSIDE the same msgpack (ragged/typed — not a fixed-shape
        # pytree) so the whole checkpoint stays ONE atomic file: a separate
        # sidecar could pair a new state with an old record if a kill
        # landed between the two replaces. The host RNGs drive BatchLoader
        # shuffling (random.shuffle) and numpy sampling; without them a
        # resumed run would consume a different batch order than the
        # uninterrupted one.
        py_state = random.getstate()
        np_state = np.random.get_state()
        meta_record = json.dumps({
            "fold_val_metrics": self.fold_val_metrics,
            "py_rng": [py_state[0], list(py_state[1]), py_state[2]],
            "np_rng": [np_state[0], np.asarray(np_state[1]).tolist(),
                       int(np_state[2]), int(np_state[3]),
                       float(np_state[4])],
        })
        payload = {
            "params": jax.device_get(self.state.params),
            "opt_state": jax.device_get(self.state.opt_state),
            "step": jax.device_get(self.state.step),
            "best_params": jax.device_get(self.best_params),
            "best_metric": np.asarray(self.best_metric),
            "not_improved": np.asarray(self.not_improved),
            "done": np.asarray(self.done),
            "next_epoch": int(next_epoch),
            "meta_record": meta_record,
        }
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(payload))
        os.replace(tmp, path)  # atomic: a kill mid-write keeps the old file
        # drop a stale sidecar from the pre-r4 two-file format so a later
        # legacy-path load can't pair this state with an outdated record
        legacy_meta = path + ".meta.json"
        if os.path.isfile(legacy_meta):
            os.remove(legacy_meta)

    def load_checkpoint(self, path: str) -> None:
        from flax import serialization

        template = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
            "best_params": self.best_params,
            "best_metric": self.best_metric,
            "not_improved": self.not_improved,
            "done": self.done,
            "next_epoch": 0,
            "meta_record": "",
        }
        with open(path, "rb") as f:
            raw = f.read()
        try:
            payload = serialization.from_bytes(template, raw)
            m = json.loads(payload["meta_record"])
        except (ValueError, KeyError):
            # pre-r4 two-file format: the msgpack has no 'meta_record' leaf
            # and the record lives in a '.meta.json' sidecar. Restore via
            # the legacy layout instead of crashing auto-resume.
            logger.warning(
                "[fold-parallel] resume file %s is the legacy two-file "
                "layout; restoring via its sidecar", path)
            legacy = {k: v for k, v in template.items()
                      if k != "meta_record"}
            payload = serialization.from_bytes(legacy, raw)
            m = {"fold_val_metrics": self.fold_val_metrics}
            sidecar = path + ".meta.json"
            if os.path.isfile(sidecar):
                with open(sidecar) as f:
                    m = json.load(f)
        self.state = TrainState(params=payload["params"],
                                opt_state=payload["opt_state"],
                                step=jnp.asarray(payload["step"]))
        self.best_params = payload["best_params"]
        self.best_metric = np.asarray(payload["best_metric"])
        self.not_improved = np.asarray(payload["not_improved"])
        self.done = np.asarray(payload["done"])
        self.start_epoch = int(payload["next_epoch"])
        self.fold_val_metrics = m["fold_val_metrics"]
        if "py_rng" in m:  # restore host RNG streams (batch shuffling)
            v, st, gauss = m["py_rng"]
            random.setstate((v, tuple(st), gauss))
        if "np_rng" in m:
            name, keys, pos, has_g, cached = m["np_rng"]
            np.random.set_state((name, np.asarray(keys, np.uint32),
                                 pos, has_g, cached))
        if self.mesh is not None:
            self._shard_state()

    # -------------------------------------------------------------- exports

    def best_fold_params(self, fold_idx: int):
        return jax.tree.map(lambda x: x[fold_idx], self.best_params)

    def predict_folds(self, loaders: List):
        """Per-fold (probabilities, ids) over per-fold loaders using best
        params. Returns ``(probs_per_fold, ids_per_fold)`` — two lists of
        per-fold arrays.

        When every entry is the SAME loader object (shared test sets,
        reference train_template.py:157-192 export path), each batch is
        uploaded once and broadcast over the fold axis on device instead of
        stacking F byte-identical copies through the host link."""
        pred_gather = bool(getattr(loaders[0], "index_batches", False))
        assert pred_gather == self._gather, (
            "predict loaders must match the trainer's batch mode "
            "(index_batches)")
        if len(loaders) > 1 and all(l is loaders[0] for l in loaders):
            return self._predict_shared(loaders[0])
        _check_equal_batch_counts(loaders, "predict")
        pred_data = self._stack_fold_data(loaders) if pred_gather else None
        saved = self.state
        self.state = self.state._replace(params=self.best_params)
        try:
            iters = [iter(l) for l in loaders]
            probs_per_fold = [[] for _ in range(self.num_folds)]
            ids_per_fold = [[] for _ in range(self.num_folds)]
            # pipelined pass (same shape as eval_folds): bounded window,
            # tail fetch
            token = eval_chain_token()
            pipe = EvalPipeline(window=None if pred_gather
                                else EVAL_INFLIGHT_WINDOW)
            host_batches = []
            while True:
                batches = []
                try:
                    for it in iters:
                        batches.append(dict(next(it)))
                except StopIteration:
                    break
                device_batch = {k: np.stack(
                    [np.asarray(b[k]) for b in batches], axis=0)
                    for k in batches[0] if k != "ids"}
                out, token = self._eval_step(self.state.params,
                                             device_batch, pred_data, token)
                pipe.add(out)
                # masks + ids only — see eval_folds (host-RSS bound)
                host_batches.append([
                    {"sample_mask": np.asarray(b["sample_mask"]),
                     "ids": np.asarray(b["ids"])} for b in batches])
            for probs, batches in zip(pipe.results(), host_batches):
                for f in range(self.num_folds):
                    mask = batches[f]["sample_mask"].astype(bool)
                    probs_per_fold[f].append(probs[f][mask])
                    ids_per_fold[f].append(batches[f]["ids"][mask])
            return ([np.concatenate(p) for p in probs_per_fold],
                    [np.concatenate(i) for i in ids_per_fold])
        finally:
            self.state = saved

    def _predict_shared(self, loader):
        """Shared-loader export: iterate the loader ONCE, upload each batch
        once, evaluate all folds on it via the (params-vmapped, batch-
        broadcast) eval step."""
        saved = self.state
        self.state = self.state._replace(params=self.best_params)
        # identity translation: fold_eval uniformly unpacks (arrays, table)
        shared_data = None
        if self._gather:
            key = ("shared", id(loader.dataset))
            cached = self._data_cache.get(key)
            if cached is None:
                arrays = jax.device_put(loader.dataset.device_arrays())
                ident = jnp.arange(len(loader.dataset), dtype=jnp.int32)
                cached = ([loader.dataset], (arrays, ident))
                self._data_cache[key] = cached
            shared_data = cached[1]
        try:
            # pipelined pass: bounded window, tail fetch (see _chained)
            token = eval_chain_token()
            pipe = EvalPipeline(window=None if self._gather
                                else EVAL_INFLIGHT_WINDOW)
            masks, ids_chunks = [], []
            for batch in loader:
                b = dict(batch)
                ids = b.pop("ids")
                device_batch = {k: np.asarray(v) for k, v in b.items()}
                out, token = self._eval_step_shared(
                    self.state.params, device_batch, shared_data,
                    token)  # [F, B]
                pipe.add(out)
                mask = batch["sample_mask"].astype(bool)
                masks.append(mask)
                ids_chunks.append(np.asarray(ids)[mask])
            probs_chunks = [p[:, m]
                            for p, m in zip(pipe.results(), masks)]
            probs_cat = np.concatenate(probs_chunks, axis=1)
            ids_cat = np.concatenate(ids_chunks)
            return ([probs_cat[f] for f in range(self.num_folds)],
                    [ids_cat.copy() for _ in range(self.num_folds)])
        finally:
            self.state = saved
