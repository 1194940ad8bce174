"""Fold-parallel crossval driver: end-to-end on the virtual mesh, artifacts
compatible with the sequential path + ensemble."""
import json
import os
from glob import glob

import numpy as np
import pytest

import jax

from meme_challenge_tpu.core.config import TrainConfig, UniterConfig
from meme_challenge_tpu.core.seeding import set_seed
from meme_challenge_tpu.data.meme_dataset import BatchLoader, MemeDataset
from meme_challenge_tpu.data.tokenizer import BertTokenizer
from meme_challenge_tpu.models.uniter import MemeUniter
from meme_challenge_tpu.parallel.crossval_parallel import (
    train_crossval_fold_parallel,
)
from meme_challenge_tpu.parallel.mesh import make_mesh
from meme_challenge_tpu.utils.synthetic import make_synthetic_dataset


def test_fold_parallel_crossval_end_to_end(tmp_path):
    synth = make_synthetic_dataset(str(tmp_path / "d"), n_train=40, n_dev=16,
                                   n_test=8, img_dim=32, label_signal=3.0)
    tok = BertTokenizer(synth["vocab"])
    ucfg = UniterConfig(vocab_size=tok.vocab_size, hidden_size=32,
                        num_hidden_layers=2, num_attention_heads=2,
                        intermediate_size=64, img_dim=32,
                        max_position_embeddings=32)
    model = MemeUniter(ucfg, n_classes=1)
    cfg = TrainConfig(
        data_path=synth["root"], feature_path=synth["feature_dir"],
        model_path=str(tmp_path / "ck"), model_save_name="fp.ckpt",
        lr=3e-3, batch_size=8, max_epoch=3, patience=4, warmup_steps=2,
        gradient_accumulation=1, max_txt_len=12, max_bb=16, seed=43,
        crossval_dev_size=8)

    kwargs = dict(feature_dir=synth["feature_dir"], tokenizer=tok,
                  max_txt_len=12, max_bb=16, img_dim=32)

    loader_funcs = {
        "train": lambda p: BatchLoader(MemeDataset(p, **kwargs), 8,
                                       shuffle_data=True),
        "val": lambda p: BatchLoader(MemeDataset(p, **kwargs), 8),
        "test": lambda p: BatchLoader(
            MemeDataset(p, return_ids=True, **kwargs), 8),
    }
    test_loaders = [loader_funcs["test"](
        os.path.join(synth["root"], n + ".jsonl"))
        for n in ["test_seen", "dev_seen"]]

    def init_params_fn(seed, example):
        return model.init(jax.random.PRNGKey(seed), example,
                          deterministic=True)["params"]

    os.makedirs(cfg.model_path, exist_ok=True)
    set_seed(cfg.seed)
    mesh = make_mesh((2, 4), ("fold", "data"))
    results = train_crossval_fold_parallel(
        cfg, model, init_params_fn, loader_funcs, test_loaders,
        num_folds=2, dev_size=8, use_dev_set=False, mesh=mesh,
        ea_generations=3)

    assert len(results["val_metrics"]) == 2
    assert results["mean_scores"]["aucroc"] > 0.6
    ck = tmp_path / "ck"
    # sequential-compatible per-fold CSVs for every set
    for f in range(2):
        for name in ["dev_00" if f == 0 else "dev_01", "test_seen",
                     "dev_seen"]:
            expect = ck / f"fp_fold_{f}_{name}_preds.csv"
            assert expect.exists(), sorted(os.listdir(ck))
            header = expect.read_text().splitlines()[0]
            assert header.startswith("id,proba,label")
    # ensemble artifacts produced
    assert "ensemble" in results
    assert list(ck.glob("*_ensemble.csv"))
    # per-fold validation CSVs carry distinct fold predictions
    a = (ck / "fp_fold_0_test_seen_preds.csv").read_text()
    b = (ck / "fp_fold_1_test_seen_preds.csv").read_text()
    assert a != b


def test_fold_parallel_crossval_use_dev_set(tmp_path):
    """use_dev_set mode: per-fold dev_seen_XX test splits are exported with
    per-fold thresholds and feed the ensemble."""
    synth = make_synthetic_dataset(str(tmp_path / "d"), n_train=40, n_dev=16,
                                   n_test=8, img_dim=32, label_signal=3.0)
    tok = BertTokenizer(synth["vocab"])
    ucfg = UniterConfig(vocab_size=tok.vocab_size, hidden_size=32,
                        num_hidden_layers=1, num_attention_heads=2,
                        intermediate_size=64, img_dim=32,
                        max_position_embeddings=32)
    model = MemeUniter(ucfg, n_classes=1)
    cfg = TrainConfig(
        data_path=synth["root"], feature_path=synth["feature_dir"],
        model_path=str(tmp_path / "ck"), model_save_name="fpd.ckpt",
        lr=3e-3, batch_size=8, max_epoch=2, patience=4, warmup_steps=2,
        gradient_accumulation=1, max_txt_len=12, max_bb=16, seed=43,
        crossval_dev_size=8, crossval_use_dev=True)

    kwargs = dict(feature_dir=synth["feature_dir"], tokenizer=tok,
                  max_txt_len=12, max_bb=16, img_dim=32)
    loader_funcs = {
        "train": lambda p: BatchLoader(MemeDataset(p, **kwargs), 8,
                                       shuffle_data=True),
        "val": lambda p: BatchLoader(MemeDataset(p, **kwargs), 8),
        "test": lambda p: BatchLoader(
            MemeDataset(p, return_ids=True, **kwargs), 8),
    }
    test_loaders = [loader_funcs["test"](
        os.path.join(synth["root"], "dev_seen.jsonl"))]

    def init_params_fn(seed, example):
        return model.init(jax.random.PRNGKey(seed), example,
                          deterministic=True)["params"]

    os.makedirs(cfg.model_path, exist_ok=True)
    set_seed(cfg.seed)
    results = train_crossval_fold_parallel(
        cfg, model, init_params_fn, loader_funcs, test_loaders,
        num_folds=2, dev_size=8, use_dev_set=True, mesh=None,
        ea_generations=2)
    ck = tmp_path / "ck"
    # each fold exported ITS OWN dev_seen_XX split with gt column
    for f in range(2):
        path = ck / f"fpd_fold_{f}_dev_seen_0{f}_preds.csv"
        assert path.exists(), sorted(os.listdir(ck))
        assert path.read_text().splitlines()[0] == "id,proba,label,gt"
    assert "ensemble" in results


def test_eight_folds_one_per_device(tmp_path):
    """Production mesh shape: 8 folds × 8 devices (fold axis only), one fold
    per device — the 15-folds-on-a-pod usage pattern at test scale."""
    from meme_challenge_tpu.parallel.fold_parallel import FoldParallelTrainer

    synth = make_synthetic_dataset(str(tmp_path / "d"), n_train=32, n_dev=16,
                                   img_dim=16, label_signal=3.0)
    tok = BertTokenizer(synth["vocab"])
    ucfg = UniterConfig(vocab_size=tok.vocab_size, hidden_size=16,
                        num_hidden_layers=1, num_attention_heads=2,
                        intermediate_size=32, img_dim=16,
                        max_position_embeddings=32)
    model = MemeUniter(ucfg, n_classes=1)
    kwargs = dict(feature_dir=synth["feature_dir"], tokenizer=tok,
                  max_txt_len=8, max_bb=8, img_dim=16)
    n_folds = 8
    train_loaders = [BatchLoader(MemeDataset(synth["train"], **kwargs), 8,
                                 shuffle_data=True) for _ in range(n_folds)]
    val_loaders = [BatchLoader(MemeDataset(synth["dev_seen"], **kwargs), 8)
                   for _ in range(n_folds)]
    example = next(iter(val_loaders[0]))
    example.pop("ids")
    keys = jax.random.split(jax.random.PRNGKey(0), n_folds)
    params = jax.vmap(
        lambda k: model.init(k, example, deterministic=True)["params"])(keys)
    cfg = TrainConfig(model_path=str(tmp_path), lr=3e-3, batch_size=8,
                      max_epoch=2, patience=4, gradient_accumulation=1,
                      warmup_steps=2, seed=0)
    mesh = make_mesh((8,), ("fold",))
    trainer = FoldParallelTrainer(cfg, model, params, train_loaders,
                                  val_loaders, mesh=mesh)
    metrics = trainer.train_main()
    assert len(metrics) == n_folds
    assert all(m for m in metrics)
    # each device owns exactly one fold slice of the params
    leaf = jax.tree.leaves(trainer.state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_fold_parallel_crossval_device_resident(tmp_path):
    """Full fold-parallel crossval driver with index-mode loaders on a
    fold×data mesh: stacked HBM-resident datasets, per-fold artifacts and
    ensemble export all work."""
    synth = make_synthetic_dataset(str(tmp_path / "d"), n_train=40, n_dev=16,
                                   n_test=8, img_dim=32, label_signal=3.0)
    tok = BertTokenizer(synth["vocab"])
    ucfg = UniterConfig(vocab_size=tok.vocab_size, hidden_size=32,
                        num_hidden_layers=2, num_attention_heads=2,
                        intermediate_size=64, img_dim=32,
                        max_position_embeddings=32)
    model = MemeUniter(ucfg, n_classes=1)
    cfg = TrainConfig(
        data_path=synth["root"], feature_path=synth["feature_dir"],
        model_path=str(tmp_path / "ck"), model_save_name="fpdr.ckpt",
        lr=3e-3, batch_size=8, max_epoch=2, patience=4, warmup_steps=2,
        gradient_accumulation=1, max_txt_len=12, max_bb=16, seed=43,
        crossval_dev_size=8, device_resident_data=True)

    kwargs = dict(feature_dir=synth["feature_dir"], tokenizer=tok,
                  max_txt_len=12, max_bb=16, img_dim=32)
    loader_funcs = {
        "train": lambda p: BatchLoader(MemeDataset(p, **kwargs), 8,
                                       shuffle_data=True,
                                       index_batches=True),
        "val": lambda p: BatchLoader(MemeDataset(p, **kwargs), 8,
                                     index_batches=True),
        "test": lambda p: BatchLoader(
            MemeDataset(p, return_ids=True, **kwargs), 8,
            index_batches=True),
    }
    test_loaders = [loader_funcs["test"](
        os.path.join(synth["root"], "dev_seen.jsonl"))]

    def init_params_fn(seed, example):
        return model.init(jax.random.PRNGKey(seed), example,
                          deterministic=True)["params"]

    os.makedirs(cfg.model_path, exist_ok=True)
    set_seed(cfg.seed)
    mesh = make_mesh((2, 4), ("fold", "data"))
    results = train_crossval_fold_parallel(
        cfg, model, init_params_fn, loader_funcs, test_loaders,
        num_folds=2, dev_size=8, use_dev_set=False, mesh=mesh,
        ea_generations=2)
    assert len(results["val_metrics"]) == 2
    assert all(np.isfinite(m["aucroc"]) for m in results["val_metrics"])
    for f in range(2):
        assert (tmp_path / "ck" / f"fpdr_fold_{f}_dev_seen_preds.csv"
                ).exists()
