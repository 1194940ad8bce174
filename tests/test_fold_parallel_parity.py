"""Fold-parallel ↔ sequential trainer interchangeability.

VERDICT round-1 weak-point #4: prove the twin drivers are interchangeable —
F=1 fold-parallel must reproduce the sequential ``Trainer`` on the same data
(same per-fold RNG discipline: ``prng_key(fold_seed(seed, fold))`` folded
with the fold's own step counter), and the parallel driver must survive a
kill-and-resume without changing results.
"""
import os

import numpy as np
import pytest

import jax

from meme_challenge_tpu.core.config import TrainConfig, UniterConfig
from meme_challenge_tpu.core.seeding import fold_seed, set_seed
from meme_challenge_tpu.data.meme_dataset import BatchLoader, MemeDataset
from meme_challenge_tpu.data.tokenizer import BertTokenizer
from meme_challenge_tpu.models.uniter import MemeUniter
from meme_challenge_tpu.parallel.fold_parallel import FoldParallelTrainer
from meme_challenge_tpu.train.trainer import Trainer
from meme_challenge_tpu.utils.synthetic import make_synthetic_dataset


@pytest.fixture()
def setup(tmp_path):
    synth = make_synthetic_dataset(str(tmp_path / "d"), n_train=32, n_dev=16,
                                   n_test=8, img_dim=32, label_signal=3.0)
    tok = BertTokenizer(synth["vocab"])
    ucfg = UniterConfig(vocab_size=tok.vocab_size, hidden_size=32,
                        num_hidden_layers=2, num_attention_heads=2,
                        intermediate_size=64, img_dim=32,
                        max_position_embeddings=32)
    model = MemeUniter(ucfg, n_classes=1)
    cfg = TrainConfig(
        data_path=synth["root"], feature_path=synth["feature_dir"],
        model_path=str(tmp_path / "ck"), model_save_name="par.ckpt",
        lr=3e-3, batch_size=8, max_epoch=3, patience=5, warmup_steps=2,
        gradient_accumulation=1, max_txt_len=12, max_bb=16, seed=43)
    kwargs = dict(feature_dir=synth["feature_dir"], tokenizer=tok,
                  max_txt_len=12, max_bb=16, img_dim=32)

    def loaders():
        # shuffle OFF: both drivers must consume identical batch streams
        train = BatchLoader(MemeDataset(
            os.path.join(synth["root"], "train.jsonl"), **kwargs), 8)
        val = BatchLoader(MemeDataset(
            os.path.join(synth["root"], "dev_seen.jsonl"), **kwargs), 8)
        return train, val

    return model, cfg, loaders


def _init_params(model, cfg, loader):
    example = dict(next(iter(loader)))
    example.pop("ids", None)
    return model.init(jax.random.PRNGKey(fold_seed(cfg.seed, 0)), example,
                      deterministic=True)["params"]


def test_fold_parallel_f1_matches_sequential_trainer(setup):
    """Same data, same seed, F=1: the vmapped fold-parallel update and the
    sequential Trainer produce the same per-epoch validation metrics."""
    model, cfg, loaders = setup

    set_seed(cfg.seed)
    train_l, val_l = loaders()
    params = _init_params(model, cfg, val_l)

    seq = Trainer(cfg, model, jax.tree.map(np.copy, params),
                  train_l, val_l, test_loaders=[])
    seq_best, _ = seq.train_main()

    set_seed(cfg.seed)
    train_l2, val_l2 = loaders()
    stacked = jax.tree.map(lambda x: np.asarray(x)[None], params)
    par = FoldParallelTrainer(cfg, model, stacked, [train_l2], [val_l2])
    par_metrics = par.train_main()[0]

    assert par_metrics, "fold-parallel produced no best metrics"
    for key in ("aucroc", "accuracy"):
        assert abs(par_metrics[key] - seq_best[key]) < 5e-3, (
            key, par_metrics[key], seq_best[key])
    # the learned predictions agree pointwise, not just in aggregate
    seq_probs, _, _ = seq.predict(val_l)
    par_probs, _ = par.predict_folds([val_l2])
    np.testing.assert_allclose(np.asarray(seq_probs).ravel(),
                               par_probs[0].ravel(), atol=5e-3)


def test_fold_parallel_kill_and_resume(setup, tmp_path):
    """Checkpoint-per-epoch + load_checkpoint reproduces an uninterrupted
    run exactly (same final metrics and best params)."""
    model, cfg, loaders = setup
    cfg = cfg.replace(max_epoch=4)
    ck = str(tmp_path / "driver_state.msgpack")

    def build(max_epoch):
        set_seed(cfg.seed)
        train_l, val_l = loaders()
        params = _init_params(model, cfg, val_l)
        stacked = jax.tree.map(lambda x: np.asarray(x)[None], params)
        return FoldParallelTrainer(cfg.replace(max_epoch=max_epoch), model,
                                   stacked, [train_l], [val_l])

    # uninterrupted 4-epoch run
    full = build(4)
    full_metrics = full.train_main()[0]

    # "killed" after 2 epochs: same 4-epoch construction (schedule horizon
    # must match the uninterrupted run), epoch loop cut short post-hoc
    part = build(4)
    part.config = part.config.replace(max_epoch=2)
    part.train_main(checkpoint_path=ck)
    assert os.path.isfile(ck)

    # resume in a FRESH trainer with different init params — everything
    # must come from the checkpoint
    resumed = build(4)
    resumed.state = jax.tree.map(lambda x: x * 0, resumed.state)  # clobber
    resumed.load_checkpoint(ck)
    assert resumed.start_epoch == 3
    resumed_metrics = resumed.train_main()[0]

    for key in ("aucroc", "accuracy", "loss"):
        assert abs(resumed_metrics[key] - full_metrics[key]) < 1e-6, (
            key, resumed_metrics[key], full_metrics[key])
    # best params identical too
    for a, b in zip(jax.tree.leaves(full.best_params),
                    jax.tree.leaves(resumed.best_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fold_parallel_resume_accepts_legacy_two_file_format(setup, tmp_path):
    """A resume file written by the pre-r4 two-file layout (msgpack without
    the 'meta_record' leaf + '.meta.json' sidecar) must still restore
    instead of crashing auto-resume; the next save removes the stale
    sidecar (ADVICE r4 #1)."""
    import json as _json

    from flax import serialization

    model, cfg, loaders = setup
    ck = str(tmp_path / "driver_state.msgpack")

    def build(max_epoch):
        set_seed(cfg.seed)
        train_l, val_l = loaders()
        params = _init_params(model, cfg, val_l)
        stacked = jax.tree.map(lambda x: np.asarray(x)[None], params)
        return FoldParallelTrainer(cfg.replace(max_epoch=max_epoch), model,
                                   stacked, [train_l], [val_l])

    part = build(2)
    part.train_main(checkpoint_path=ck)

    # rewrite the checkpoint into the LEGACY layout: strip the meta_record
    # leaf out of the msgpack and park it in the old sidecar
    template = {
        "params": part.state.params, "opt_state": part.state.opt_state,
        "step": part.state.step, "best_params": part.best_params,
        "best_metric": part.best_metric, "not_improved": part.not_improved,
        "done": part.done, "next_epoch": 0, "meta_record": "",
    }
    with open(ck, "rb") as f:
        payload = serialization.from_bytes(template, f.read())
    record = _json.loads(payload.pop("meta_record"))
    with open(ck, "wb") as f:
        f.write(serialization.to_bytes(payload))
    with open(ck + ".meta.json", "w") as f:
        _json.dump(record, f)

    resumed = build(4)
    resumed.load_checkpoint(ck)  # must not raise
    assert resumed.start_epoch == int(payload["next_epoch"])
    assert resumed.fold_val_metrics == record["fold_val_metrics"]
    for a, b in zip(jax.tree.leaves(part.best_params),
                    jax.tree.leaves(resumed.best_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # a legacy file with NO sidecar also restores (fresh-metrics fallback)
    os.remove(ck + ".meta.json")
    resumed2 = build(4)
    resumed2.load_checkpoint(ck)
    assert resumed2.start_epoch == int(payload["next_epoch"])

    # the next save upgrades to the single-file format and cleans up any
    # stale sidecar left on disk
    with open(ck + ".meta.json", "w") as f:
        f.write("{}")
    resumed2.save_checkpoint(ck, next_epoch=3)
    assert not os.path.exists(ck + ".meta.json")
    fresh = build(4)
    fresh.load_checkpoint(ck)
    assert fresh.start_epoch == 3


def test_fold_parallel_cycles_unequal_folds(setup):
    """A shorter fold cycles its stream instead of truncating the longer
    fold's epoch (VERDICT weak #4: tail batches must not be dropped)."""
    model, cfg, loaders = setup
    train_a, val_a = loaders()
    train_b, val_b = loaders()
    # fold B sees a truncated loader (half the batches)
    half = list(iter(train_b))[: max(1, len(train_b) // 2)]

    class HalfLoader:
        dataset = train_b.dataset

        def __iter__(self):
            return iter([dict(b) for b in half])

        def __len__(self):
            return len(half)

    params = _init_params(model, cfg, val_a)
    stacked = jax.tree.map(
        lambda x: np.stack([np.asarray(x)] * 2), params)
    par = FoldParallelTrainer(cfg.replace(max_epoch=1), model, stacked,
                              [train_a, HalfLoader()], [val_a, val_b])
    par.train_main()
    steps = np.asarray(par.state.step)
    # both folds took max-length steps (fold B cycled)
    assert steps[0] == steps[1] == len(train_a)


def test_fold_parallel_kill_and_resume_with_shuffle(setup, tmp_path):
    """Kill-and-resume with shuffle_data=True loaders: the checkpoint
    sidecar carries the HOST RNG states (random/np.random drive
    BatchLoader shuffling), so the resumed run consumes the SAME shuffled
    batch order as the uninterrupted one."""
    model, cfg, _ = setup
    cfg = cfg.replace(max_epoch=4)
    ck = str(tmp_path / "driver_state_shuf.msgpack")

    # rebuild loaders with shuffling on (the fixture's are shuffle-off)
    import glob as _glob
    vocab = _glob.glob(os.path.join(os.path.dirname(cfg.feature_path),
                                    "**", "vocab.txt"), recursive=True)
    vocab += _glob.glob(os.path.join(cfg.data_path, "**", "vocab.txt"),
                        recursive=True)
    tok = BertTokenizer(vocab[0])
    kwargs = dict(feature_dir=cfg.feature_path, tokenizer=tok,
                  max_txt_len=12, max_bb=16, img_dim=32)

    def loaders():
        train = BatchLoader(MemeDataset(
            os.path.join(cfg.data_path, "train.jsonl"), **kwargs), 8,
            shuffle_data=True)
        val = BatchLoader(MemeDataset(
            os.path.join(cfg.data_path, "dev_seen.jsonl"), **kwargs), 8)
        return train, val

    def build(max_epoch):
        set_seed(cfg.seed)
        train_l, val_l = loaders()
        params = _init_params(model, cfg, val_l)
        stacked = jax.tree.map(lambda x: np.asarray(x)[None], params)
        return FoldParallelTrainer(cfg.replace(max_epoch=max_epoch), model,
                                   stacked, [train_l], [val_l])

    full = build(4)
    full_metrics = full.train_main()[0]

    part = build(4)
    part.config = part.config.replace(max_epoch=2)
    part.train_main(checkpoint_path=ck)

    resumed = build(4)  # fresh process stand-in: re-seeds host RNG
    resumed.load_checkpoint(ck)  # restores params AND host RNG streams
    resumed_metrics = resumed.train_main()[0]

    for key in ("aucroc", "accuracy", "loss"):
        assert abs(resumed_metrics[key] - full_metrics[key]) < 1e-6, (
            key, resumed_metrics[key], full_metrics[key])


def test_predict_folds_shared_loader_broadcast(setup):
    """A shared test loader stacked F times must take the broadcast path:
    iterate the loader ONCE (H2D bytes independent of F) and match the
    per-fold stacked path bit-for-bit."""
    model, cfg, loaders = setup
    F = 2

    set_seed(cfg.seed)
    train_l, val_l = loaders()
    params = _init_params(model, cfg, val_l)
    stacked = jax.tree.map(
        lambda x: np.stack([np.asarray(x)] * F), params)
    par = FoldParallelTrainer(cfg.replace(max_epoch=1), model, stacked,
                              [train_l] * F, [val_l] * F)
    par.train_main()

    class CountingLoader:
        def __init__(self, inner):
            self.inner = inner
            self.dataset = inner.dataset
            self.iterations = 0

        def __len__(self):
            return len(self.inner)

        def __iter__(self):
            self.iterations += 1
            return iter(self.inner)

    shared = CountingLoader(val_l)
    probs_shared, ids_shared = par.predict_folds([shared] * F)
    assert shared.iterations == 1, (
        "shared loader must be consumed once, not per fold")

    # distinct-but-equal loader objects force the stacked per-fold path
    probs_stacked, ids_stacked = par.predict_folds(
        [CountingLoader(val_l), CountingLoader(val_l)])
    for f in range(F):
        np.testing.assert_array_equal(ids_shared[f], ids_stacked[f])
        np.testing.assert_allclose(probs_shared[f], probs_stacked[f],
                                   atol=1e-6)


def test_fold_parallel_device_resident_matches_host_batches(setup):
    """Index-mode fold loaders (device-resident stacked datasets, on-device
    gather) reproduce host-batch fold-parallel training pointwise, incl.
    the shared-loader broadcast export path."""
    model, cfg, loaders = setup
    F = 2

    def run(index_batches):
        set_seed(cfg.seed)
        train_l, val_l = loaders()
        train_l.index_batches = index_batches
        val_l.index_batches = index_batches
        params = _init_params(model, cfg, BatchLoader(val_l.dataset, 8))
        stacked = jax.tree.map(
            lambda x: np.stack([np.asarray(x)] * F), params)
        par = FoldParallelTrainer(cfg.replace(max_epoch=2), model, stacked,
                                  [train_l] * F, [val_l] * F)
        metrics = par.train_main()
        shared_probs, shared_ids = par.predict_folds([val_l] * F)
        return metrics, shared_probs, shared_ids

    h_metrics, h_probs, h_ids = run(False)
    d_metrics, d_probs, d_ids = run(True)
    for f in range(F):
        assert d_metrics[f]["aucroc"] == pytest.approx(
            h_metrics[f]["aucroc"], abs=1e-6)
        np.testing.assert_array_equal(h_ids[f], d_ids[f])
        np.testing.assert_allclose(d_probs[f], h_probs[f], atol=2e-6)


def test_predict_folds_caches_device_uploads(setup):
    """Repeated predict_folds / eval on the same loaders must not re-dedup
    and re-upload an already-resident corpus: per-epoch eval and the
    end-of-training 4-test-set export would otherwise push the same HBM
    corpus through the host link every call (15-fold HM scale: ~4 GB each).
    Pins the staged-upload cache keyed by dataset identity."""
    model, cfg, loaders = setup
    F = 2

    set_seed(cfg.seed)
    train_l, val_l = loaders()
    train_l.index_batches = True
    val_l.index_batches = True
    params = _init_params(model, cfg, BatchLoader(val_l.dataset, 8))
    stacked = jax.tree.map(lambda x: np.stack([np.asarray(x)] * F), params)
    par = FoldParallelTrainer(cfg.replace(max_epoch=1), model, stacked,
                              [train_l] * F, [val_l] * F)
    par.train_main()

    calls = {"n": 0}
    ds = val_l.dataset
    orig = type(ds).device_arrays

    def counting(self):
        calls["n"] += 1
        return orig(self)

    type(ds).device_arrays = counting
    try:
        # shared-loader broadcast path: one upload, then cache hits
        p1, i1 = par.predict_folds([val_l] * F)
        assert calls["n"] == 1
        p2, i2 = par.predict_folds([val_l] * F)
        assert calls["n"] == 1, "second export must reuse the cached upload"
        # distinct loader objects over the SAME dataset → stacked path,
        # one more upload set, then cached
        l_a, l_b = BatchLoader(ds, 8), BatchLoader(ds, 8)
        l_a.index_batches = l_b.index_batches = True
        par.predict_folds([l_a, l_b])
        n_after_stacked = calls["n"]
        par.predict_folds([l_a, l_b])
        assert calls["n"] == n_after_stacked, (
            "repeated stacked export must reuse the cached upload")
    finally:
        type(ds).device_arrays = orig
    for f in range(F):
        np.testing.assert_array_equal(i1[f], i2[f])
        np.testing.assert_allclose(p1[f], p2[f], atol=0)
