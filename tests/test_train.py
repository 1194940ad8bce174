"""Training stack tests: loss/schedule parity vs torch, end-to-end single-fold
training on synthetic data, crossval + ensemble pipeline."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ----------------------------------------------------------- unit: losses


def test_bce_logits_matches_torch():
    import torch

    from meme_challenge_tpu.train.losses import bce_logits_loss

    rng = np.random.RandomState(0)
    logits = rng.randn(16, 1).astype(np.float32)
    labels = rng.randint(0, 2, 16)
    mask = np.ones(16, np.int32)
    loss, probs = bce_logits_loss(jnp.array(logits), jnp.array(labels),
                                  jnp.array(mask), pos_weight=1.8)
    crit = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor([1.8]))
    ref = crit(torch.from_numpy(logits).squeeze(1),
               torch.from_numpy(labels).float())
    # XLA CPU evaluates exp/log1p with ~3.5e-5 fast approximations; the
    # formula itself is exact (verified against float64)
    assert float(loss) == pytest.approx(float(ref), abs=1e-4)
    np.testing.assert_allclose(
        np.asarray(probs), 1 / (1 + np.exp(-logits[:, 0])), atol=1e-6)


def test_bce_logits_respects_sample_mask():
    from meme_challenge_tpu.train.losses import bce_logits_loss

    logits = jnp.array([0.3, -0.7, 99.0, -99.0])
    labels = jnp.array([1, 0, 0, 1])
    full = bce_logits_loss(logits[:2], labels[:2], jnp.ones(2))[0]
    masked = bce_logits_loss(logits, labels, jnp.array([1, 1, 0, 0]))[0]
    assert float(full) == pytest.approx(float(masked), rel=1e-6)


# -------------------------------------------------------- unit: schedules


def test_warmup_cosine_matches_transformers():
    import torch
    from transformers import get_cosine_schedule_with_warmup

    from meme_challenge_tpu.train.schedules import warmup_cosine_schedule

    warm, total = 10, 100
    sched = warmup_cosine_schedule(warm, total)
    model = torch.nn.Linear(2, 2)
    opt = torch.optim.Adam(model.parameters(), lr=1.0)
    ref = get_cosine_schedule_with_warmup(opt, warm, total)
    for step in range(total + 5):
        ref_lr = ref.get_last_lr()[0]
        ours = float(sched(step))
        assert ours == pytest.approx(ref_lr, abs=1e-6), f"step {step}"
        opt.step()
        ref.step()


def test_warmup_linear_matches_transformers():
    import torch
    from transformers import get_linear_schedule_with_warmup

    from meme_challenge_tpu.train.schedules import warmup_linear_schedule

    warm, total = 7, 55
    sched = warmup_linear_schedule(warm, total)
    model = torch.nn.Linear(2, 2)
    opt = torch.optim.Adam(model.parameters(), lr=1.0)
    ref = get_linear_schedule_with_warmup(opt, warm, total)
    for step in range(total + 3):
        assert float(sched(step)) == pytest.approx(
            ref.get_last_lr()[0], abs=1e-6), f"step {step}"
        opt.step()
        ref.step()


def test_optimizer_decay_mask():
    from meme_challenge_tpu.train.optim import no_decay_mask

    params = {
        "encoder": {"qkv_kernel": np.zeros(2), "qkv_bias": np.zeros(2),
                    "attn_ln_scale": np.zeros(2), "attn_ln_bias": np.zeros(2)},
        "pooler": {"dense": {"kernel": np.zeros(2), "bias": np.zeros(2)}},
    }
    mask = no_decay_mask(params)
    assert mask["encoder"]["qkv_kernel"] is True
    assert mask["encoder"]["qkv_bias"] is False
    assert mask["encoder"]["attn_ln_scale"] is False
    assert mask["encoder"]["attn_ln_bias"] is False
    assert mask["pooler"]["dense"]["kernel"] is True
    assert mask["pooler"]["dense"]["bias"] is False


# ------------------------------------------------- end-to-end: single fold


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from meme_challenge_tpu.utils.synthetic import make_synthetic_dataset

    root = tmp_path_factory.mktemp("train_synth")
    return make_synthetic_dataset(str(root), n_train=48, n_dev=16,
                                  n_test=8, img_dim=32, label_signal=3.0)


def _tiny_configs(synth, tmp_path, **overrides):
    from meme_challenge_tpu.core.config import TrainConfig, UniterConfig

    ucfg = UniterConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, img_dim=32,
        max_position_embeddings=32)
    defaults = dict(
        data_path=synth["root"], feature_path=synth["feature_dir"],
        model_path=str(tmp_path / "ckpt"), model_save_name="tiny.ckpt",
        lr=3e-3, batch_size=8, max_epoch=4, patience=3, warmup_steps=2,
        gradient_accumulation=2, pos_wt=1.2, confounder_repeat=2,
        max_txt_len=12, max_bb=16, seed=43)
    defaults.update(overrides)
    tcfg = TrainConfig(**defaults)
    return ucfg, tcfg


def test_single_fold_end_to_end(synth, tmp_path):
    """Tiny UNITER must fit the synthetic signal and export all artifacts."""
    from meme_challenge_tpu.core.seeding import set_seed
    from meme_challenge_tpu.train.crossval_driver import train_crossval
    from meme_challenge_tpu.train.train_uniter import build_entry

    ucfg, tcfg = _tiny_configs(synth, tmp_path)
    set_seed(tcfg.seed)
    loader_funcs, test_loaders, trainer_factory = build_entry(
        tcfg, ucfg, synth["vocab"])
    val_metrics, test_metrics = train_crossval(
        trainer_factory, tcfg, loader_funcs, test_loaders, num_folds=0)

    assert val_metrics["aucroc"] > 0.85, val_metrics
    # labeled test sets got metrics; unlabeled got leaderboard CSVs
    assert "dev_unseen" in test_metrics and test_metrics["dev_unseen"]
    assert test_metrics["test_seen"] == {}
    ckpt_dir = tmp_path / "ckpt"
    for name in ["test_seen", "test_unseen", "dev_seen", "dev_unseen"]:
        csv = ckpt_dir / f"tiny_{name}_preds.csv"
        assert csv.exists(), csv
        header = csv.read_text().splitlines()[0]
        expect = "id,proba,label" + (",gt" if name.startswith("dev") else "")
        assert header == expect
    metrics_json = json.loads((ckpt_dir / "tiny_metrics.json").read_text())
    assert set(metrics_json) == {"dev", "train", "test"}
    assert metrics_json["dev"]["aucroc"] == pytest.approx(
        val_metrics["aucroc"])


def test_crossval_with_ensemble(synth, tmp_path):
    """2-fold crossval -> per-fold CSVs -> brute-force+EA ensemble export."""
    from meme_challenge_tpu.core.seeding import set_seed
    from meme_challenge_tpu.train.crossval_driver import train_crossval
    from meme_challenge_tpu.train.train_uniter import build_entry

    ucfg, tcfg = _tiny_configs(
        synth, tmp_path, max_epoch=2, crossval_dev_size=8,
        model_save_name="cv.ckpt")
    set_seed(tcfg.seed)
    loader_funcs, test_loaders, trainer_factory = build_entry(
        tcfg, ucfg, synth["vocab"])
    results = train_crossval(
        trainer_factory, tcfg, loader_funcs, test_loaders,
        num_folds=2, dev_size=8, use_dev_set=False,
        ea_generations=3)

    assert len(results["val_metrics"]) == 2
    assert "mean_scores" in results
    assert "ensemble" in results
    ckpt = tmp_path / "ckpt"
    fold_csvs = sorted(ckpt.glob("cv_fold_*_dev_seen_preds.csv"))
    assert len(fold_csvs) == 2
    ens = sorted(ckpt.glob("*_ensemble.csv"))
    assert len(ens) >= 1, list(ckpt.iterdir())
    # ensemble csv columns parse
    first = ens[0].read_text().splitlines()
    assert first[0].startswith("id,")


def test_resume_roundtrip(synth, tmp_path):
    """Full-state checkpoint restore continues from the same step (the
    mid-training resume capability the reference lacks)."""
    from meme_challenge_tpu.train.checkpoint import (
        load_train_state,
        save_train_state,
    )
    from meme_challenge_tpu.train.train_uniter import build_entry

    ucfg, tcfg = _tiny_configs(synth, tmp_path, max_epoch=1,
                               model_save_name="res.ckpt")
    loader_funcs, _, trainer_factory = build_entry(tcfg, ucfg, synth["vocab"])
    train_loader = loader_funcs["train"](synth["train"])
    val_loader = loader_funcs["val"](synth["dev_seen"])
    trainer = trainer_factory(tcfg, train_loader, val_loader, [])
    trainer.train_main()
    path = str(tmp_path / "state.ckpt")
    save_train_state(path, trainer.state, epoch=1)
    restored, epoch = load_train_state(path, trainer.state)
    assert epoch == 1
    assert int(restored.step) == int(trainer.state.step)
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(trainer.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bce_loss_mode_trains(synth, tmp_path):
    """loss_func='bce' (reference's sigmoid-then-BCE mode) end to end."""
    from meme_challenge_tpu.core.seeding import set_seed
    from meme_challenge_tpu.train.train_uniter import build_entry

    ucfg, tcfg = _tiny_configs(synth, tmp_path, max_epoch=1,
                               model_save_name="bce.ckpt")
    tcfg = tcfg.replace(loss_func="bce")
    set_seed(tcfg.seed)
    loader_funcs, _, trainer_factory = build_entry(tcfg, ucfg, synth["vocab"])
    trainer = trainer_factory(tcfg, loader_funcs["train"](synth["train"]),
                              loader_funcs["val"](synth["dev_seen"]), [])
    best_val, _ = trainer.train_main()
    assert "aucroc" in best_val and np.isfinite(best_val["aucroc"])
    assert (tmp_path / "ckpt" / "bce_metrics.json").exists()


def test_device_resident_data_matches_host_batches(synth, tmp_path):
    """index_batches loaders + on-device gather (device-resident pipeline)
    reproduce the host-batch Trainer pointwise: same training trajectory,
    same val probabilities."""
    import os

    from meme_challenge_tpu.core.seeding import set_seed
    from meme_challenge_tpu.data.meme_dataset import BatchLoader, MemeDataset
    from meme_challenge_tpu.data.tokenizer import BertTokenizer
    from meme_challenge_tpu.models.uniter import MemeUniter
    from meme_challenge_tpu.train.trainer import Trainer

    ucfg, tcfg = _tiny_configs(synth, tmp_path, max_epoch=2,
                               model_save_name="devres.ckpt")
    tok = BertTokenizer(synth["vocab"])
    kwargs = dict(feature_dir=synth["feature_dir"], tokenizer=tok,
                  max_txt_len=12, max_bb=16, img_dim=32)
    model = MemeUniter(ucfg, n_classes=1)

    def run(index_batches):
        set_seed(tcfg.seed)
        train = BatchLoader(MemeDataset(
            os.path.join(synth["root"], "train.jsonl"), **kwargs), 8,
            index_batches=index_batches)
        val = BatchLoader(MemeDataset(
            os.path.join(synth["root"], "dev_seen.jsonl"), **kwargs), 8,
            index_batches=index_batches)
        example = dict(next(iter(BatchLoader(train.dataset, 8))))
        example.pop("ids", None)
        params = model.init(jax.random.PRNGKey(0), example,
                            deterministic=True)["params"]
        trainer = Trainer(tcfg, model, jax.tree.map(np.copy, params),
                          train, val, [])
        best, _ = trainer.train_main()
        probs, ids, _ = trainer.predict(val)
        return best, probs, ids

    host_best, host_probs, host_ids = run(False)
    dev_best, dev_probs, dev_ids = run(True)
    np.testing.assert_array_equal(host_ids, dev_ids)
    np.testing.assert_allclose(dev_probs, host_probs, atol=2e-6)
    assert dev_best["aucroc"] == pytest.approx(host_best["aucroc"], abs=1e-6)


def test_mixed_loader_modes_match(synth, tmp_path):
    """The Trainer detects batch mode PER LOADER — an index-mode train
    loader with a host-batch val loader (and vice versa) must reproduce the
    all-host run pointwise."""
    import os

    from meme_challenge_tpu.core.seeding import set_seed
    from meme_challenge_tpu.data.meme_dataset import BatchLoader, MemeDataset
    from meme_challenge_tpu.data.tokenizer import BertTokenizer
    from meme_challenge_tpu.models.uniter import MemeUniter
    from meme_challenge_tpu.train.trainer import Trainer

    ucfg, tcfg = _tiny_configs(synth, tmp_path, max_epoch=1,
                               model_save_name="mixed.ckpt")
    tok = BertTokenizer(synth["vocab"])
    kwargs = dict(feature_dir=synth["feature_dir"], tokenizer=tok,
                  max_txt_len=12, max_bb=16, img_dim=32)
    model = MemeUniter(ucfg, n_classes=1)

    def run(train_idx, val_idx):
        set_seed(tcfg.seed)
        train = BatchLoader(MemeDataset(
            os.path.join(synth["root"], "train.jsonl"), **kwargs), 8,
            index_batches=train_idx)
        val = BatchLoader(MemeDataset(
            os.path.join(synth["root"], "dev_seen.jsonl"), **kwargs), 8,
            index_batches=val_idx)
        example = train.example_batch()
        params = model.init(jax.random.PRNGKey(0), example,
                            deterministic=True)["params"]
        trainer = Trainer(tcfg, model, jax.tree.map(np.copy, params),
                          train, val, [])
        best, _ = trainer.train_main()
        probs, _, _ = trainer.predict(val)
        return best["aucroc"], probs

    base_auc, base_probs = run(False, False)
    for train_idx, val_idx in [(True, False), (False, True)]:
        auc, probs = run(train_idx, val_idx)
        np.testing.assert_allclose(probs, base_probs, atol=2e-6)
        assert auc == pytest.approx(base_auc, abs=1e-6), (train_idx, val_idx)


def test_chunked_dispatch_matches_single_step(synth, tmp_path):
    """steps_per_dispatch>1 (lax.scan over whole optimizer steps, one
    dispatch per chunk) reproduces the single-step trainer pointwise: the
    in-graph fold_in(root, state.step) RNG stream must equal the host-side
    fold_in(root, host_step) stream, and chunk+tail splitting must not
    change the math."""
    import os

    from meme_challenge_tpu.core.seeding import set_seed
    from meme_challenge_tpu.data.meme_dataset import BatchLoader, MemeDataset
    from meme_challenge_tpu.data.tokenizer import BertTokenizer
    from meme_challenge_tpu.models.uniter import MemeUniter
    from meme_challenge_tpu.train.trainer import Trainer

    ucfg, tcfg = _tiny_configs(synth, tmp_path, max_epoch=2,
                               model_save_name="chunked.ckpt")
    tok = BertTokenizer(synth["vocab"])
    kwargs = dict(feature_dir=synth["feature_dir"], tokenizer=tok,
                  max_txt_len=12, max_bb=16, img_dim=32)
    model = MemeUniter(ucfg, n_classes=1)

    def run(steps_per_dispatch, unroll=1):
        set_seed(tcfg.seed)
        cfg = tcfg.replace(steps_per_dispatch=steps_per_dispatch,
                           dispatch_unroll=unroll,
                           model_save_name=f"chunk{steps_per_dispatch}"
                                           f"u{unroll}.ckpt")
        train = BatchLoader(MemeDataset(
            os.path.join(synth["root"], "train.jsonl"), **kwargs), 8,
            index_batches=True)
        val = BatchLoader(MemeDataset(
            os.path.join(synth["root"], "dev_seen.jsonl"), **kwargs), 8,
            index_batches=True)
        example = dict(next(iter(BatchLoader(train.dataset, 8))))
        example.pop("ids", None)
        params = model.init(jax.random.PRNGKey(0), example,
                            deterministic=True)["params"]
        trainer = Trainer(cfg, model, jax.tree.map(np.copy, params),
                          train, val, [])
        if steps_per_dispatch > 1:
            assert trainer.train_multi_step is not None
        best, _ = trainer.train_main()
        probs, _, _ = trainer.predict(val)
        return best, probs, trainer

    # 3 optimizer steps/epoch → K=2 exercises chunk + tail each epoch
    single_best, single_probs, t1 = run(1)
    chunk_best, chunk_probs, t2 = run(2)
    np.testing.assert_allclose(chunk_probs, single_probs, atol=2e-6)
    assert chunk_best["aucroc"] == pytest.approx(single_best["aucroc"],
                                                 abs=1e-6)
    assert t2.val_loss == pytest.approx(t1.val_loss, abs=1e-5)
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    # dispatch_unroll > 1 (optimizer-tail/next-forward overlap window for
    # the XLA scheduler) is the same ops in the same per-step order —
    # pointwise-equal to the rolled scan
    _, unroll_probs, t3 = run(2, unroll=2)
    np.testing.assert_allclose(unroll_probs, chunk_probs, atol=2e-6)
    for a, b in zip(jax.tree.leaves(t2.state.params),
                    jax.tree.leaves(t3.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_fuse_accum_matches_scan_accum(synth, tmp_path):
    """fuse_accum=True (one fused fwd/bwd over the flattened [accum·B]
    batch, steps._train_step_body) reproduces the accumulation scan
    pointwise when dropout is off: the loss is the mean of per-micro
    masked means either way, so gradients agree up to float reassociation.
    The confounder-upsampled loader pads the final micro-batch, covering
    the case where a flat masked mean WOULD weight samples differently.
    Runs both host-batch and device-resident (fused flattened gather)
    modes, and the fused step under chunked dispatch."""
    import os

    from meme_challenge_tpu.core.seeding import set_seed
    from meme_challenge_tpu.data.meme_dataset import BatchLoader, MemeDataset
    from meme_challenge_tpu.data.tokenizer import BertTokenizer
    from meme_challenge_tpu.models.uniter import MemeUniter
    from meme_challenge_tpu.train.trainer import Trainer

    ucfg, tcfg = _tiny_configs(synth, tmp_path, max_epoch=2)
    import dataclasses
    ucfg = dataclasses.replace(ucfg, hidden_dropout_prob=0.0,
                               attention_probs_dropout_prob=0.0)
    tok = BertTokenizer(synth["vocab"])
    kwargs = dict(feature_dir=synth["feature_dir"], tokenizer=tok,
                  max_txt_len=12, max_bb=16, img_dim=32)
    model = MemeUniter(ucfg, n_classes=1)

    def run(fuse, index_batches=False, steps_per_dispatch=0):
        set_seed(tcfg.seed)
        cfg = tcfg.replace(fuse_accum=fuse,
                           steps_per_dispatch=steps_per_dispatch,
                           model_save_name=f"fuse{fuse}i{index_batches}"
                                           f"k{steps_per_dispatch}.ckpt")
        train = BatchLoader(MemeDataset(
            os.path.join(synth["root"], "train.jsonl"), **kwargs), 8,
            index_batches=index_batches)
        val = BatchLoader(MemeDataset(
            os.path.join(synth["root"], "dev_seen.jsonl"), **kwargs), 8,
            index_batches=index_batches)
        example = dict(next(iter(BatchLoader(train.dataset, 8))))
        example.pop("ids", None)
        params = model.init(jax.random.PRNGKey(0), example,
                            deterministic=True)["params"]
        trainer = Trainer(cfg, model, jax.tree.map(np.copy, params),
                          train, val, [])
        best, _ = trainer.train_main()
        probs, _, _ = trainer.predict(val)
        return best, probs, trainer

    scan_best, scan_probs, t_scan = run(False)
    fused_best, fused_probs, t_fused = run(True)
    np.testing.assert_allclose(fused_probs, scan_probs, atol=5e-5)
    assert fused_best["aucroc"] == pytest.approx(scan_best["aucroc"],
                                                 abs=1e-4)
    for a, b in zip(jax.tree.leaves(t_scan.state.params),
                    jax.tree.leaves(t_fused.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    # device-resident: the fused step gathers the flattened [accum·B]
    # index vector in one take; chunked dispatch scans the fused body
    _, devres_probs, t_dev = run(True, index_batches=True,
                                 steps_per_dispatch=2)
    np.testing.assert_allclose(devres_probs, fused_probs, atol=1e-6)
    for a, b in zip(jax.tree.leaves(t_fused.state.params),
                    jax.tree.leaves(t_dev.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_fuse_accum_fold_parallel_matches_sequential(synth, tmp_path):
    """FoldParallelTrainer honors fuse_accum: F=1 fused fold-parallel
    reproduces the sequential fused Trainer (dropout off)."""
    import os

    from meme_challenge_tpu.core.seeding import set_seed
    from meme_challenge_tpu.data.meme_dataset import BatchLoader, MemeDataset
    from meme_challenge_tpu.data.tokenizer import BertTokenizer
    from meme_challenge_tpu.models.uniter import MemeUniter
    from meme_challenge_tpu.parallel.fold_parallel import FoldParallelTrainer
    from meme_challenge_tpu.train.trainer import Trainer

    ucfg, tcfg = _tiny_configs(synth, tmp_path, max_epoch=2,
                               confounder_repeat=1, fuse_accum=True,
                               model_save_name="fusepar.ckpt")
    import dataclasses
    ucfg = dataclasses.replace(ucfg, hidden_dropout_prob=0.0,
                               attention_probs_dropout_prob=0.0)
    tok = BertTokenizer(synth["vocab"])
    kwargs = dict(feature_dir=synth["feature_dir"], tokenizer=tok,
                  max_txt_len=12, max_bb=16, img_dim=32)
    model = MemeUniter(ucfg, n_classes=1)

    def loaders():
        train = BatchLoader(MemeDataset(
            os.path.join(synth["root"], "train.jsonl"), **kwargs), 8)
        val = BatchLoader(MemeDataset(
            os.path.join(synth["root"], "dev_seen.jsonl"), **kwargs), 8)
        return train, val

    set_seed(tcfg.seed)
    train_l, val_l = loaders()
    example = dict(next(iter(BatchLoader(train_l.dataset, 8))))
    example.pop("ids", None)
    params = model.init(jax.random.PRNGKey(0), example,
                        deterministic=True)["params"]
    seq = Trainer(tcfg, model, jax.tree.map(np.copy, params),
                  train_l, val_l, [])
    seq.train_main()
    seq_probs, _, _ = seq.predict(val_l)

    set_seed(tcfg.seed)
    train_l2, val_l2 = loaders()
    stacked = jax.tree.map(lambda x: np.asarray(x)[None], params)
    par = FoldParallelTrainer(tcfg, model, stacked, [train_l2], [val_l2])
    par.train_main()
    par_probs, _ = par.predict_folds([val_l2])
    np.testing.assert_allclose(np.asarray(seq_probs).ravel(),
                               par_probs[0].ravel(), atol=5e-5)


def test_single_fold_device_resident_cli_path(synth, tmp_path):
    """build_entry --device_resident_data: index-mode loaders flow through
    the crossval driver, training works, artifacts export."""
    from meme_challenge_tpu.core.seeding import set_seed
    from meme_challenge_tpu.train.crossval_driver import train_crossval
    from meme_challenge_tpu.train.train_uniter import build_entry

    ucfg, tcfg = _tiny_configs(synth, tmp_path, max_epoch=2,
                               device_resident_data=True,
                               model_save_name="devres_cli.ckpt")
    set_seed(tcfg.seed)
    loader_funcs, test_loaders, trainer_factory = build_entry(
        tcfg, ucfg, synth["vocab"])
    assert all(getattr(l, "index_batches", False) for l in test_loaders)
    val_metrics, test_metrics = train_crossval(
        trainer_factory, tcfg, loader_funcs, test_loaders, num_folds=0)
    assert val_metrics["aucroc"] > 0.8, val_metrics
    assert (tmp_path / "ckpt" / "devres_cli_dev_unseen_preds.csv").exists()
