"""Parallel layer tests on the 8-device virtual CPU mesh: fold-parallel
training, DP/TP sharding rules, and sharded-vs-single-device equivalence."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from meme_challenge_tpu.core.config import TrainConfig, UniterConfig
from meme_challenge_tpu.data.meme_dataset import BatchLoader, MemeDataset
from meme_challenge_tpu.data.tokenizer import BertTokenizer
from meme_challenge_tpu.models.uniter import MemeUniter
from meme_challenge_tpu.parallel.mesh import (
    apply_shardings,
    make_mesh,
    uniter_param_specs,
)
from meme_challenge_tpu.parallel.fold_parallel import FoldParallelTrainer
from meme_challenge_tpu.utils.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("par_synth")
    return make_synthetic_dataset(str(root), n_train=32, n_dev=16,
                                  img_dim=32, label_signal=3.0)


UCFG = UniterConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=2, intermediate_size=64, img_dim=32,
                    max_position_embeddings=32)


def _loaders(synth, n_folds, batch_size=8):
    tok = BertTokenizer(synth["vocab"])
    kwargs = dict(feature_dir=synth["feature_dir"], tokenizer=tok,
                  max_txt_len=12, max_bb=16, img_dim=32)
    train = [BatchLoader(MemeDataset(synth["train"], **kwargs), batch_size,
                         shuffle_data=True) for _ in range(n_folds)]
    val = [BatchLoader(MemeDataset(synth["dev_seen"], **kwargs), batch_size)
           for _ in range(n_folds)]
    return train, val


def test_device_count():
    assert jax.device_count() == 8, (
        "tests expect the 8-device virtual CPU mesh (conftest XLA_FLAGS)")


def test_fold_parallel_trains_on_mesh(synth, tmp_path):
    n_folds = 4
    mesh = make_mesh((4, 2), ("fold", "data"))
    model = MemeUniter(UCFG, n_classes=1)
    train_loaders, val_loaders = _loaders(synth, n_folds)
    example = next(iter(val_loaders[0]))
    example.pop("ids")
    keys = jax.random.split(jax.random.PRNGKey(0), n_folds)
    params_stacked = jax.vmap(
        lambda k: model.init(k, example, deterministic=True)["params"])(keys)

    cfg = TrainConfig(model_path=str(tmp_path), lr=3e-3, batch_size=8,
                      max_epoch=3, patience=5, gradient_accumulation=1,
                      warmup_steps=2, seed=0)
    trainer = FoldParallelTrainer(cfg, model, params_stacked,
                                  train_loaders, val_loaders, mesh=mesh)
    fold_metrics = trainer.train_main()
    assert len(fold_metrics) == n_folds
    aucs = [m.get("aucroc", 0.0) for m in fold_metrics]
    assert all(a > 0.7 for a in aucs), aucs
    # best params differ per fold (different init keys)
    p0 = jax.tree.leaves(trainer.best_fold_params(0))[0]
    p1 = jax.tree.leaves(trainer.best_fold_params(1))[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_fold_parallel_early_stop_freezes_folds(synth, tmp_path):
    """A fold whose patience is exhausted must keep its best snapshot."""
    n_folds = 2
    mesh = make_mesh((2, 4), ("fold", "data"))
    model = MemeUniter(UCFG, n_classes=1)
    train_loaders, val_loaders = _loaders(synth, n_folds)
    example = next(iter(val_loaders[0]))
    example.pop("ids")
    keys = jax.random.split(jax.random.PRNGKey(1), n_folds)
    params_stacked = jax.vmap(
        lambda k: model.init(k, example, deterministic=True)["params"])(keys)
    cfg = TrainConfig(model_path=str(tmp_path), lr=3e-3, batch_size=8,
                      max_epoch=6, patience=1, early_stop_thresh=0.5,
                      gradient_accumulation=1, warmup_steps=2, seed=0)
    # early_stop_thresh=0.5 is nearly unreachable -> every epoch counts as
    # no-improvement -> both folds stop after patience=1 epochs
    trainer = FoldParallelTrainer(cfg, model, params_stacked,
                                  train_loaders, val_loaders, mesh=mesh)
    trainer.train_main()
    assert trainer.done.all()
    assert all(m for m in trainer.fold_val_metrics)


def test_tp_sharding_preserves_forward(synth):
    """Tensor-parallel sharded params give the same logits as replicated."""
    mesh = make_mesh((2, 2, 2), ("fold", "data", "model"))
    model = MemeUniter(UCFG, n_classes=1)
    tok = BertTokenizer(synth["vocab"])
    ds = MemeDataset(synth["dev_seen"], feature_dir=synth["feature_dir"],
                     tokenizer=tok, max_txt_len=12, max_bb=16, img_dim=32)
    batch = ds.batch(np.arange(8))
    batch.pop("ids")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(jax.random.PRNGKey(0), batch,
                        deterministic=True)["params"]
    ref = np.asarray(model.apply({"params": params}, batch,
                                 deterministic=True))

    specs = uniter_param_specs(params, model_axis="model")
    # intermediate=64 over 2 model shards = 32 each: fine
    sharded = apply_shardings(mesh, params, specs)
    fwd = jax.jit(lambda p, b: model.apply({"params": p}, b,
                                           deterministic=True))
    out = np.asarray(fwd(sharded, batch))
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # the encoder kernels really are sharded over the model axis
    q = sharded["uniter"]["encoder"]["qkv_kernel"]
    assert q.sharding.spec == P(None, None, "model")


def test_fold_sharded_matches_single_device(synth, tmp_path):
    """One training step fold-parallel on the mesh == the same step run
    fold-by-fold without a mesh (numerical equivalence of the scale axis)."""
    n_folds = 2
    model = MemeUniter(UCFG, n_classes=1)
    train_loaders, val_loaders = _loaders(synth, n_folds, batch_size=8)
    example = next(iter(val_loaders[0]))
    example.pop("ids")
    keys = jax.random.split(jax.random.PRNGKey(3), n_folds)
    params_stacked = jax.vmap(
        lambda k: model.init(k, example, deterministic=True)["params"])(keys)
    cfg = TrainConfig(model_path=str(tmp_path), lr=1e-3, batch_size=8,
                      max_epoch=1, gradient_accumulation=1, warmup_steps=2,
                      seed=0)

    mesh = make_mesh((2, 4), ("fold", "data"))
    t_mesh = FoldParallelTrainer(cfg, model, params_stacked,
                                 train_loaders, val_loaders, mesh=mesh)
    t_nomesh = FoldParallelTrainer(cfg, model, params_stacked,
                                   train_loaders, val_loaders, mesh=None)
    batch = next(t_mesh._fold_device_batches())
    rngs = jax.random.split(jax.random.PRNGKey(9), n_folds)
    s_mesh, out_mesh = t_mesh._train_step(t_mesh.state, batch, rngs,
                                          t_mesh._train_data)
    s_nomesh, out_nomesh = t_nomesh._train_step(
        t_nomesh.state, batch, rngs, t_nomesh._train_data)
    np.testing.assert_allclose(np.asarray(out_mesh["loss"]),
                               np.asarray(out_nomesh["loss"]), atol=1e-5)
    leaves_m = jax.tree.leaves(s_mesh.params)
    leaves_n = jax.tree.leaves(s_nomesh.params)
    for a, b in zip(leaves_m, leaves_n):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fold_data_model_3axis_training(synth, tmp_path):
    """Full fold × data × model mesh: FoldParallelTrainer applies Megatron
    TP specs (with divisibility fallback) to params AND optimizer moments,
    trains, and keeps per-fold results finite."""
    n_folds = 2
    mesh = make_mesh((2, 2, 2), ("fold", "data", "model"))
    model = MemeUniter(UCFG, n_classes=1)
    train_loaders, val_loaders = _loaders(synth, n_folds)
    example = next(iter(val_loaders[0]))
    example.pop("ids")
    keys = jax.random.split(jax.random.PRNGKey(0), n_folds)
    params_stacked = jax.vmap(
        lambda k: model.init(k, example, deterministic=True)["params"])(keys)

    cfg = TrainConfig(model_path=str(tmp_path), lr=3e-3, batch_size=8,
                      max_epoch=2, patience=5, gradient_accumulation=2,
                      warmup_steps=2, seed=0)
    trainer = FoldParallelTrainer(cfg, model, params_stacked,
                                  train_loaders, val_loaders, mesh=mesh)
    # encoder column kernel [F, L, H, out] must be sharded on fold AND model
    enc = trainer.state.params["uniter"]["encoder"]["qkv_kernel"]
    spec = enc.sharding.spec
    assert spec[0] == "fold" and "model" in tuple(spec), spec
    # adam moments follow the param specs (tree_map_params path)
    import optax

    mus = optax.tree_utils.tree_get(trainer.state.opt_state, "mu")
    mu_spec = mus["uniter"]["encoder"]["qkv_kernel"].sharding.spec
    assert "model" in tuple(mu_spec), mu_spec

    fold_metrics = trainer.train_main()
    assert len(fold_metrics) == n_folds
    assert all(np.isfinite(m["aucroc"]) for m in fold_metrics)


def test_fold_sharded_device_resident_data(synth, tmp_path):
    """Index-mode fold loaders on a fold×data mesh: stacked datasets are
    fold-sharded in HBM, the gathered train step matches the host-batch
    step numerically, and eval works end-to-end."""
    n_folds = 2
    model = MemeUniter(UCFG, n_classes=1)
    train_h, val_h = _loaders(synth, n_folds)
    train_i, val_i = _loaders(synth, n_folds)
    for l in train_i + val_i:
        l.index_batches = True
    example = next(iter(val_h[0]))
    example.pop("ids")
    keys = jax.random.split(jax.random.PRNGKey(3), n_folds)
    params_stacked = jax.vmap(
        lambda k: model.init(k, example, deterministic=True)["params"])(keys)
    cfg = TrainConfig(model_path=str(tmp_path), lr=1e-3, batch_size=8,
                      max_epoch=1, gradient_accumulation=1, warmup_steps=2,
                      seed=0)
    mesh = make_mesh((2, 4), ("fold", "data"))
    t_idx = FoldParallelTrainer(cfg, model, params_stacked,
                                train_i, val_i, mesh=mesh)
    t_host = FoldParallelTrainer(cfg, model, params_stacked,
                                 train_h, val_h, mesh=None)
    # shared union corpus: replicated arrays + fold-sharded index tables,
    # deduped by meme id (overlapping fold train splits share rows)
    shared, trans = t_idx._train_data
    feat = shared["img_feat"]
    assert feat.sharding.spec == P(), feat.sharding.spec
    assert trans.sharding.spec[0] == "fold", trans.sharding.spec
    uniq = {i for l in train_i for i in l.dataset.ids.tolist()}
    assert feat.shape[0] == len(uniq)
    assert feat.shape[0] < sum(len(l.dataset) for l in train_i)
    # shuffle_data loaders draw from the global python RNG: realign streams
    from meme_challenge_tpu.core.seeding import set_seed
    set_seed(0)
    batch_i = next(t_idx._fold_device_batches())
    set_seed(0)
    batch_h = next(t_host._fold_device_batches())
    rngs = jax.random.split(jax.random.PRNGKey(9), n_folds)
    s_i, out_i = t_idx._train_step(t_idx.state, batch_i, rngs,
                                   t_idx._train_data)
    s_h, out_h = t_host._train_step(t_host.state, batch_h, rngs, None)
    np.testing.assert_allclose(np.asarray(out_i["loss"]),
                               np.asarray(out_h["loss"]), atol=1e-5)
    t_idx.state = s_i
    metrics = t_idx.eval_folds()
    assert all(np.isfinite(m["aucroc"]) for m in metrics)


def test_fold_parallel_chunked_dispatch_parity(synth, tmp_path):
    """steps_per_dispatch>1 (K whole optimizer steps per jitted dispatch,
    rngs derived in-graph from fold roots + carried step counters) is
    pointwise-equal to the single-step fold-parallel loop, including the
    chunk+tail split (4 steps/epoch, K=3 → chunk of 3 + 1 tail)."""
    from meme_challenge_tpu.core.seeding import set_seed

    n_folds = 2
    model = MemeUniter(UCFG, n_classes=1)

    def run(K):
        set_seed(0)
        train, val = _loaders(synth, n_folds)
        for l in train + val:
            l.index_batches = True
        example = next(iter(BatchLoader(val[0].dataset, 8)))
        example.pop("ids")
        keys = jax.random.split(jax.random.PRNGKey(3), n_folds)
        params_stacked = jax.vmap(
            lambda k: model.init(k, example,
                                 deterministic=True)["params"])(keys)
        cfg = TrainConfig(model_path=str(tmp_path), lr=1e-3, batch_size=8,
                          max_epoch=2, gradient_accumulation=1,
                          warmup_steps=2, seed=0, steps_per_dispatch=K)
        t = FoldParallelTrainer(cfg, model, params_stacked, train, val)
        t.train_main()
        return t

    t1 = run(1)
    t3 = run(3)
    np.testing.assert_array_equal(np.asarray(t1.state.step),
                                  np.asarray(t3.state.step))
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t3.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    for m1, m3 in zip(t1.fold_val_metrics, t3.fold_val_metrics):
        assert m1["aucroc"] == pytest.approx(m3["aucroc"], abs=1e-6)


def test_unequal_fold_loader_batch_counts_rejected():
    """Per-fold eval/export zips fold loaders; unequal batch counts must
    raise (silent truncation would drop the longer folds' tail batches)."""
    from meme_challenge_tpu.parallel.fold_parallel import (
        _check_equal_batch_counts)

    class L:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

    _check_equal_batch_counts([L(3), L(3)], "val")  # equal: fine
    with pytest.raises(ValueError, match="unequal batch counts"):
        _check_equal_batch_counts([L(3), L(4)], "val")


def test_fold_mesh_fused_accum_matches_scan(synth, tmp_path):
    """fuse_accum on a fold×data mesh: the fused fold update (one fwd/bwd
    over the flattened [accum·B] batch per fold) composes with vmap over
    the fold axis and mesh sharding, and reproduces the scan-accum mesh
    run pointwise with dropout off."""
    import dataclasses

    n_folds = 2
    ucfg = dataclasses.replace(UCFG, hidden_dropout_prob=0.0,
                               attention_probs_dropout_prob=0.0)
    model = MemeUniter(ucfg, n_classes=1)
    mesh = make_mesh((2, 4), ("fold", "data"))

    def run(fuse):
        from meme_challenge_tpu.core.seeding import set_seed

        set_seed(11)  # identical shuffle streams for both runs
        train_loaders, val_loaders = _loaders(synth, n_folds)
        example = next(iter(val_loaders[0]))
        example.pop("ids")
        keys = jax.random.split(jax.random.PRNGKey(5), n_folds)
        params_stacked = jax.vmap(
            lambda k: model.init(k, example, deterministic=True)["params"])(
            keys)
        cfg = TrainConfig(model_path=str(tmp_path), lr=3e-3, batch_size=8,
                          max_epoch=2, patience=5, gradient_accumulation=2,
                          warmup_steps=2, seed=0, fuse_accum=fuse)
        trainer = FoldParallelTrainer(cfg, model, params_stacked,
                                      train_loaders, val_loaders, mesh=mesh)
        metrics = trainer.train_main()
        probs, _ = trainer.predict_folds(val_loaders)
        return metrics, probs

    scan_metrics, scan_probs = run(False)
    fused_metrics, fused_probs = run(True)
    for ms, mf in zip(scan_metrics, fused_metrics):
        assert mf["aucroc"] == pytest.approx(ms["aucroc"], abs=1e-4)
    np.testing.assert_allclose(fused_probs[0], scan_probs[0], atol=5e-5)
