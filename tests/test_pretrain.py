"""Pretraining stack: task batchers, MetaLoader semantics, and a short
multi-task driver run (MLM+ITM+MRFR+MRC) that must decrease losses."""
import random

import numpy as np
import pytest

from meme_challenge_tpu.core.config import TrainConfig, UniterConfig
from meme_challenge_tpu.data.pretrain import (
    ITMBatcher,
    MLMBatcher,
    MRCBatcher,
    MRFRBatcher,
    MetaLoader,
    TaskLoader,
    mask_tokens_bert,
    pretrain_corpus,
)
from meme_challenge_tpu.data.tokenizer import BertTokenizer
from meme_challenge_tpu.utils.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("pretrain_synth")
    return make_synthetic_dataset(str(root), n_train=24, n_dev=8, img_dim=32)


@pytest.fixture(scope="module")
def corpus(synth):
    tok = BertTokenizer(synth["vocab"])
    ds = pretrain_corpus(synth["root"], synth["feature_dir"], tok,
                         max_txt_len=12, max_bb=10, img_dim=32)
    return ds, tok


def test_corpus_merges_train_and_dev(synth, corpus):
    ds, _ = corpus
    assert len(ds) == 24 + 8


def test_mlm_masking_properties(corpus):
    ds, tok = corpus
    random.seed(5)
    ids = ds.input_ids[0]
    masked, labels = mask_tokens_bert(
        ids, ds.txt_mask[0], random, mask_prob=0.5,
        mask_token=tok.mask_id, vocab_range=(5, tok.vocab_size),
        special_ids=(tok.cls_id, tok.sep_id, tok.pad_id))
    # at least one masked position; labels hold ORIGINAL ids there
    pos = np.where(labels != -1)[0]
    assert len(pos) >= 1
    for p in pos:
        assert labels[p] == ids[p]
    # special positions never masked
    assert labels[0] == -1            # [CLS]
    assert (labels[ds.txt_mask[0] == 0] == -1).all()  # padding
    # unmasked (label −1) positions keep their token
    keep = (labels == -1) & (ds.txt_mask[0] == 1)
    assert (masked[keep] == ids[keep]).all()


def test_itm_batcher_labels(corpus):
    ds, _ = corpus
    random.seed(1)
    batcher = ITMBatcher(ds, replace_prob=0.6)
    idx = np.arange(16)
    batch = ds.batch(idx)
    batch["sample_mask"] = np.ones(16, np.int32)
    out = batcher(batch, idx)
    # replaced rows (target 0) must carry a DIFFERENT text's tokens
    for row in range(16):
        same = (out["input_ids"][row] == ds.input_ids[idx[row]]).all()
        if out["targets"][row] == 1:
            assert same
    assert 0 < out["targets"].sum() < 16  # both labels present at p=0.6


def test_mrfr_batcher_masks_and_targets(corpus):
    ds, _ = corpus
    random.seed(2)
    batcher = MRFRBatcher(ds, mask_prob=0.3)
    idx = np.arange(8)
    batch = ds.batch(idx)
    out = batcher(batch)
    im = out["img_masks"]
    assert (im.sum(axis=1) >= 1).all()           # at-least-one guarantee
    assert (im[batch["img_mask"] == 0] == 0).all()  # never masks padding
    # masked features zeroed, targets preserve originals
    masked = im.astype(bool)
    assert np.all(out["img_feat"][masked] == 0.0)
    np.testing.assert_array_equal(out["feat_targets"], batch["img_feat"])


def test_mrc_batcher_soft_labels(corpus):
    ds, _ = corpus
    random.seed(3)
    batcher = MRCBatcher(ds, mask_prob=0.3, label_dim=1601)
    idx = np.arange(4)
    out = batcher(ds.batch(idx), idx)
    lab = out["label_targets"]
    assert lab.shape == (4, 10, 1601)
    # background column never the label; each valid region one-hot
    assert lab[..., 0].sum() == 0
    valid = ds.img_mask[idx].astype(bool)
    sums = lab.sum(-1)
    assert (sums[valid] == 1).all()


def test_vectorized_batchers_deterministic(corpus):
    """Default (vectorized) batchers draw their per-batch numpy seed from
    the global python RNG: same random.seed → identical batches; the
    reference_rng path yields the same properties from per-token draws."""
    ds, tok = corpus
    idx = np.arange(16)
    base = ds.batch(idx)
    base["sample_mask"] = np.ones(16, np.int32)

    random.seed(7)
    out1 = MLMBatcher(ds, tok, mask_prob=0.4)(dict(base))
    random.seed(7)
    out2 = MLMBatcher(ds, tok, mask_prob=0.4)(dict(base))
    np.testing.assert_array_equal(out1["input_ids"], out2["input_ids"])
    np.testing.assert_array_equal(out1["txt_labels"], out2["txt_labels"])

    for reference_rng in (False, True):
        random.seed(9)
        out = MLMBatcher(ds, tok, mask_prob=0.4,
                         reference_rng=reference_rng)(dict(base))
        lab, ids = out["txt_labels"], base["input_ids"]
        assert ((lab != -1).sum(axis=1) >= 1).all()
        assert (lab[:, 0] == -1).all()                      # [CLS]
        assert (lab[ds.txt_mask[idx] == 0] == -1).all()     # padding
        keep = (lab == -1) & (ds.txt_mask[idx] == 1)
        assert (out["input_ids"][keep] == ids[keep]).all()

        random.seed(9)
        mr = MRFRBatcher(ds, mask_prob=0.3,
                         reference_rng=reference_rng)(dict(base))
        im = mr["img_masks"]
        assert (im.sum(axis=1) >= 1).all()
        assert (im[base["img_mask"] == 0] == 0).all()


def test_mrc_labels_match_objects(corpus):
    """The vectorized one-hot scatter reproduces the per-row construction:
    region r of sample i is labeled class objects[i][r]+1."""
    ds, _ = corpus
    out = MRCBatcher(ds, mask_prob=0.3)(ds.batch(np.arange(6)), np.arange(6))
    lab = out["label_targets"]
    for row in range(6):
        objs = ds.objects[row]
        k = min(len(objs), ds.max_bb)
        for r in range(k):
            assert lab[row, r, int(objs[r]) + 1] == 1.0
        assert lab[row].sum() == k


def test_mrc_index_mode_class_ids_match_dense(corpus):
    """Index-mode MRC ships [B, R] class ids instead of the dense
    [B, R, 1601] one-hot (~10 MB/micro-batch); one-hotting them (−1 →
    all-zero row, as jax.nn.one_hot does in the driver) must reproduce the
    dense host labels exactly."""
    import jax

    ds, _ = corpus
    idx = np.arange(6)
    random.seed(5)
    dense = MRCBatcher(ds, mask_prob=0.3)(ds.batch(idx), idx)
    # index-mode batch: no img_feat key
    index_batch = {"input_ids": ds.input_ids[idx],
                   "txt_mask": ds.txt_mask[idx],
                   "img_mask": ds.img_mask[idx],
                   "indices": idx.astype(np.int32)}
    random.seed(5)
    compact = MRCBatcher(ds, mask_prob=0.3)(index_batch, idx)
    assert "label_targets" not in compact
    assert compact["label_cls"].shape == ds.img_mask[idx].shape
    onehot = np.asarray(jax.nn.one_hot(compact["label_cls"], 1601,
                                       dtype=np.float32))
    np.testing.assert_array_equal(onehot, dense["label_targets"])
    # same region masks in both modes (host RNG stream identical)
    np.testing.assert_array_equal(compact["img_masks"], dense["img_masks"])


def test_meta_loader_holds_task_across_accum(corpus):
    ds, tok = corpus
    random.seed(7)
    loaders = {
        "mlm": TaskLoader("mlm", ds, 4, MLMBatcher(ds, tok)),
        "mrfr": TaskLoader("mrfr", ds, 4, MRFRBatcher(ds)),
    }
    meta = MetaLoader({"mlm": (loaders["mlm"], 2), "mrfr": loaders["mrfr"]},
                      accum_steps=3)
    stream = iter(meta)
    tasks = [next(stream)[0] for _ in range(30)]
    for g in range(0, 30, 3):
        assert len(set(tasks[g:g + 3])) == 1  # fixed within a group
    assert {"mlm", "mrfr"} >= set(tasks)
    assert len(set(tasks)) == 2  # both appear over 10 groups (pool 2:1)


def test_pretrain_driver_losses_decrease(corpus, tmp_path):
    from meme_challenge_tpu.models.uniter import UniterForPretraining
    from meme_challenge_tpu.train.pretrain_driver import PretrainTrainer
    import jax

    ds, tok = corpus
    random.seed(11)
    ucfg = UniterConfig(vocab_size=tok.vocab_size, hidden_size=32,
                        num_hidden_layers=2, num_attention_heads=2,
                        intermediate_size=64, img_dim=32,
                        max_position_embeddings=32)
    model = UniterForPretraining(ucfg, img_label_dim=1601)
    loaders = {
        "mlm": TaskLoader("mlm", ds, 4, MLMBatcher(ds, tok)),
        "itm": TaskLoader("itm", ds, 4, ITMBatcher(ds), needs_indices=True),
        "mrfr": TaskLoader("mrfr", ds, 4, MRFRBatcher(ds)),
        "mrc": TaskLoader("mrc", ds, 4, MRCBatcher(ds), needs_indices=True),
    }
    meta = MetaLoader(loaders, accum_steps=2)
    from meme_challenge_tpu.train.pretrain_init import init_pretrain_params

    example = next(iter(loaders["mlm"]))
    params = init_pretrain_params(model, jax.random.PRNGKey(0), example)
    tcfg = TrainConfig(model_path=str(tmp_path), model_save_name="pre.ckpt",
                       lr=2e-3, gradient_accumulation=2, max_epoch=1,
                       warmup_steps=2, scheduler="warmup_cosine")
    trainer = PretrainTrainer(tcfg, model, params, meta, steps_per_epoch=30,
                              ot_weight=0.1)
    losses = trainer.train(total_steps=30)
    assert set(losses) <= {"mlm", "itm", "mrfr", "mrc"}
    assert len(losses) >= 2
    for task, v in losses.items():
        assert np.isfinite(v), (task, v)
    assert (tmp_path / "pre.ckpt").exists()


def test_pretrain_chunked_dispatch_parity(corpus, tmp_path):
    """steps_per_dispatch>1 (consecutive same-task groups share one
    lax.scan dispatch; short runs fall back to single steps) is
    pointwise-equal to the single-step driver: same per-step losses, same
    final parameters. Single-task MLM stream → 10 steps at K=4 exercises
    2 full chunks + 2 tail singles."""
    from meme_challenge_tpu.models.uniter import UniterForPretraining
    from meme_challenge_tpu.train.pretrain_driver import PretrainTrainer
    from meme_challenge_tpu.train.pretrain_init import init_pretrain_params
    import jax

    ds, tok = corpus
    ucfg = UniterConfig(vocab_size=tok.vocab_size, hidden_size=32,
                        num_hidden_layers=2, num_attention_heads=2,
                        intermediate_size=64, img_dim=32,
                        max_position_embeddings=32)
    model = UniterForPretraining(ucfg, img_label_dim=1601)
    example = next(iter(TaskLoader("mlm", ds, 4, MLMBatcher(ds, tok))))
    params = init_pretrain_params(model, jax.random.PRNGKey(0), example)
    tcfg = TrainConfig(model_path=str(tmp_path), model_save_name="ck.ckpt",
                       lr=2e-3, gradient_accumulation=2, max_epoch=1,
                       warmup_steps=2, scheduler="warmup_cosine")

    def run(K):
        random.seed(23)
        meta = MetaLoader({"mlm": TaskLoader(
            "mlm", ds, 4, MLMBatcher(ds, tok), index_batches=True)},
            accum_steps=2)
        trainer = PretrainTrainer(
            tcfg.replace(steps_per_dispatch=K), model,
            jax.tree.map(np.copy, params), meta, steps_per_epoch=10,
            data_arrays=ds.device_arrays())
        losses = trainer.train(total_steps=10, save_checkpoint=False)
        return trainer, losses

    t1, l1 = run(1)
    t4, l4 = run(4)
    assert l4["mlm"] == pytest.approx(l1["mlm"], abs=1e-6)
    assert int(t4.state.step) == int(t1.state.step) == 10
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t4.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_pretrain_device_resident_matches_host(corpus, tmp_path):
    """Index-mode TaskLoaders (HBM-resident features, host text
    augmentations overlay, in-graph MRFR/MRC feature zeroing) produce the
    SAME per-step losses as the host-batch path — the batchers' RNG draws
    are identical in both modes."""
    from meme_challenge_tpu.models.uniter import UniterForPretraining
    from meme_challenge_tpu.train.pretrain_driver import PretrainTrainer
    from meme_challenge_tpu.train.pretrain_init import init_pretrain_params
    import jax

    ds, tok = corpus
    ucfg = UniterConfig(vocab_size=tok.vocab_size, hidden_size=32,
                        num_hidden_layers=2, num_attention_heads=2,
                        intermediate_size=64, img_dim=32,
                        max_position_embeddings=32,
                        hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)
    model = UniterForPretraining(ucfg, img_label_dim=1601)
    tcfg = TrainConfig(model_path=str(tmp_path), model_save_name="dr.ckpt",
                       lr=2e-3, gradient_accumulation=2, max_epoch=1,
                       warmup_steps=2, scheduler="warmup_cosine",
                       adam_mu_dtype="float32", adam_nu_dtype="float32")

    def make_loaders(index_batches):
        return {
            "mlm": TaskLoader("mlm", ds, 4, MLMBatcher(ds, tok),
                              index_batches=index_batches),
            "itm": TaskLoader("itm", ds, 4, ITMBatcher(ds),
                              needs_indices=True,
                              index_batches=index_batches),
            "mrfr": TaskLoader("mrfr", ds, 4, MRFRBatcher(ds),
                               index_batches=index_batches),
            "mrc": TaskLoader("mrc", ds, 4, MRCBatcher(ds),
                              needs_indices=True,
                              index_batches=index_batches),
        }

    example = next(iter(TaskLoader("mlm", ds, 4, MLMBatcher(ds, tok))))
    params = init_pretrain_params(model, jax.random.PRNGKey(0), example)

    def run(index_batches):
        random.seed(17)
        meta = MetaLoader(make_loaders(index_batches), accum_steps=2)
        data = ds.device_arrays() if index_batches else None
        trainer = PretrainTrainer(
            tcfg, model, jax.tree.map(np.copy, params), meta,
            steps_per_epoch=12, data_arrays=data)
        return trainer.train(total_steps=12, save_checkpoint=False)

    host = run(False)
    dev = run(True)
    assert set(host) == set(dev)
    for task in host:
        assert dev[task] == pytest.approx(host[task], abs=2e-5), (
            task, host[task], dev[task])


def test_pretrain_fuse_accum_matches_scan(corpus, tmp_path):
    """fuse_accum in the pretrain driver (one fused fwd/bwd over the
    flattened [accum·B] task batch, per-micro masked-mean reductions via
    vmapped _task_reduce) reproduces the accumulation scan pointwise with
    dropout off — across ALL four task heads (different output/reduction
    shapes) and in both host-batch and device-resident modes."""
    from meme_challenge_tpu.models.uniter import UniterForPretraining
    from meme_challenge_tpu.train.pretrain_driver import PretrainTrainer
    from meme_challenge_tpu.train.pretrain_init import init_pretrain_params
    import jax

    ds, tok = corpus
    ucfg = UniterConfig(vocab_size=tok.vocab_size, hidden_size=32,
                        num_hidden_layers=2, num_attention_heads=2,
                        intermediate_size=64, img_dim=32,
                        max_position_embeddings=32,
                        hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)
    model = UniterForPretraining(ucfg, img_label_dim=1601)
    tcfg = TrainConfig(model_path=str(tmp_path), model_save_name="fu.ckpt",
                       lr=2e-3, gradient_accumulation=2, max_epoch=1,
                       warmup_steps=2, scheduler="warmup_cosine",
                       adam_mu_dtype="float32", adam_nu_dtype="float32")

    def make_loaders(index_batches):
        return {
            "mlm": TaskLoader("mlm", ds, 4, MLMBatcher(ds, tok),
                              index_batches=index_batches),
            "itm": TaskLoader("itm", ds, 4, ITMBatcher(ds),
                              needs_indices=True,
                              index_batches=index_batches),
            "mrfr": TaskLoader("mrfr", ds, 4, MRFRBatcher(ds),
                               index_batches=index_batches),
            "mrc": TaskLoader("mrc", ds, 4, MRCBatcher(ds),
                              needs_indices=True,
                              index_batches=index_batches),
        }

    example = next(iter(TaskLoader("mlm", ds, 4, MLMBatcher(ds, tok))))
    params = init_pretrain_params(model, jax.random.PRNGKey(0), example)

    def run(fuse, index_batches):
        random.seed(29)
        meta = MetaLoader(make_loaders(index_batches), accum_steps=2)
        data = ds.device_arrays() if index_batches else None
        trainer = PretrainTrainer(
            tcfg.replace(fuse_accum=fuse), model,
            jax.tree.map(np.copy, params), meta,
            steps_per_epoch=12, data_arrays=data, ot_weight=0.1)
        losses = trainer.train(total_steps=12, save_checkpoint=False)
        return trainer, losses

    t_scan, l_scan = run(False, False)
    t_fused, l_fused = run(True, False)
    assert set(l_scan) == set(l_fused) >= {"mlm", "itm"}
    for task in l_scan:
        assert l_fused[task] == pytest.approx(l_scan[task], abs=5e-5), (
            task, l_scan[task], l_fused[task])
    for a, b in zip(jax.tree.leaves(t_scan.state.params),
                    jax.tree.leaves(t_fused.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    # device-resident fused: the flattened gather + in-graph MRFR/MRC
    # assembly compose with the fused step
    _, l_dev = run(True, True)
    for task in l_fused:
        assert l_dev[task] == pytest.approx(l_fused[task], abs=5e-5), (
            task, l_fused[task], l_dev[task])


def test_parse_tasks():
    from meme_challenge_tpu.train.pretrain_uniter import parse_tasks

    assert parse_tasks("mlm:2,itm,mrfr,mrc-kl") == {
        "mlm": 2, "itm": 1, "mrfr": 1, "mrc-kl": 1}
    assert parse_tasks("mlm") == {"mlm": 1}
    with pytest.raises(ValueError):
        parse_tasks("mlm,bogus")


def test_pretrain_cli_and_finetune_handoff(synth, tmp_path):
    """The shipped pretraining CLI runs end-to-end (device-resident, all
    four tasks, IPOT on ITM) and its flax-msgpack trunk dump feeds straight
    into train_uniter --pretrained_model_file — the pretrain → fine-tune
    handoff the reference README describes (README.md:25-33) with torch
    checkpoints."""
    import json
    import os

    import jax

    from meme_challenge_tpu.train import pretrain_uniter, train_uniter

    cfg_json = str(tmp_path / "tiny.json")
    with open(cfg_json, "w") as f:
        json.dump({"vocab_size": 64, "hidden_size": 32,
                   "num_hidden_layers": 2, "num_attention_heads": 2,
                   "intermediate_size": 64, "img_dim": 32,
                   "max_position_embeddings": 32}, f)
    ck = str(tmp_path / "ck")
    common = ["--data_path", synth["root"],
              "--feature_path", synth["feature_dir"],
              "--model_path", ck, "--vocab_file", synth["vocab"],
              "--uniter_config", cfg_json, "--batch_size", "8",
              "--gradient_accumulation", "2", "--lr", "3e-3",
              "--warmup_steps", "2", "--max_txt_len", "12",
              "--max_bb", "10", "--seed", "43"]

    losses = pretrain_uniter.main(
        common + ["--model_save_name", "pre.ckpt", "--max_epoch", "1",
                  "--tasks", "mlm:2,itm,mrfr,mrc-kl", "--ot_weight", "0.1",
                  "--device_resident_data"])
    assert {"mlm"} <= set(losses) <= {"mlm", "itm", "mrfr", "mrc-kl"}
    assert all(np.isfinite(v) for v in losses.values())
    assert os.path.isfile(os.path.join(ck, "pre.ckpt"))
    assert os.path.isfile(os.path.join(ck, "log", "hps.json"))

    # the trunk transfers: init_meme_uniter_params must pick the flax path
    from meme_challenge_tpu.core.config import TrainConfig as TC
    from meme_challenge_tpu.core.config import UniterConfig as UC
    from meme_challenge_tpu.models.uniter import MemeUniter

    ucfg = UC.from_json_file(cfg_json)
    model = MemeUniter(ucfg, n_classes=1)
    tcfg = TC(model_path=ck, pretrained_model_file="pre.ckpt")
    example = {
        "input_ids": np.zeros((2, 12), np.int32),
        "position_ids": np.tile(np.arange(12, dtype=np.int32), (2, 1)),
        "img_feat": np.zeros((2, 10, 32), np.float32),
        "img_pos_feat": np.zeros((2, 10, 7), np.float32),
        "txt_mask": np.ones((2, 12), np.int32),
        "img_mask": np.ones((2, 10), np.int32),
    }
    fresh = model.init(jax.random.PRNGKey(0), example,
                       deterministic=True)["params"]
    loaded = train_uniter.init_meme_uniter_params(
        model, ucfg, tcfg, jax.random.PRNGKey(0), example)
    # trunk weights come from the pretraining dump (differ from fresh init)
    a = np.asarray(jax.tree.leaves(fresh["uniter"])[0])
    b = np.asarray(jax.tree.leaves(loaded["uniter"])[0])
    assert not np.allclose(a, b), "trunk was not transferred"

    # full fine-tune CLI run consuming the pretrained trunk
    val = train_uniter.main(
        common + ["--model_save_name", "ft.ckpt", "--max_epoch", "1",
                  "--patience", "2", "--pretrained_model_file", "pre.ckpt"])
    assert os.path.isfile(os.path.join(ck, "ft.ckpt"))

    # warm-start RESUME: pretrain_uniter accepts its own flax dump too
    # (full head tree restored, torch path never touched)
    flax_tree = train_uniter._try_load_flax_params(
        os.path.join(ck, "pre.ckpt"))
    assert flax_tree is not None and "uniter" in flax_tree
    resumed = pretrain_uniter.main(
        common + ["--model_save_name", "pre2.ckpt", "--max_epoch", "1",
                  "--steps_per_epoch", "2", "--tasks", "mlm",
                  "--pretrained_model_file", "pre.ckpt"])
    assert all(np.isfinite(v) for v in resumed.values())


def test_pretrain_kill_and_resume(corpus, tmp_path):
    """PretrainTrainer checkpoint/resume: a run killed mid-way and resumed
    from the full-state checkpoint (params + optimizer + step + host-RNG
    + loader positions, one atomic file) reproduces the uninterrupted run
    exactly — the MetaLoader's task draws and the batchers' masking draws
    continue where they left off via the position record (O(1), no draw
    replay), and the dropout stream continues via the restored
    state.step. Legacy r4 origin-replay records still load."""
    from meme_challenge_tpu.models.uniter import UniterForPretraining
    from meme_challenge_tpu.train.pretrain_driver import PretrainTrainer
    from meme_challenge_tpu.train.pretrain_init import init_pretrain_params
    import jax
    import os

    ds, tok = corpus
    ucfg = UniterConfig(vocab_size=tok.vocab_size, hidden_size=32,
                        num_hidden_layers=2, num_attention_heads=2,
                        intermediate_size=64, img_dim=32,
                        max_position_embeddings=32,
                        hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)
    model = UniterForPretraining(ucfg, img_label_dim=1601)
    tcfg = TrainConfig(model_path=str(tmp_path), model_save_name="kr.ckpt",
                       lr=2e-3, gradient_accumulation=2, max_epoch=1,
                       warmup_steps=2, scheduler="warmup_cosine",
                       adam_mu_dtype="float32", adam_nu_dtype="float32")
    example = next(iter(TaskLoader("mlm", ds, 4, MLMBatcher(ds, tok))))
    params = init_pretrain_params(model, jax.random.PRNGKey(0), example)

    def make_trainer():
        meta = MetaLoader({
            "mlm": TaskLoader("mlm", ds, 4, MLMBatcher(ds, tok)),
            "mrfr": TaskLoader("mrfr", ds, 4, MRFRBatcher(ds)),
        }, accum_steps=2)
        return PretrainTrainer(tcfg, model, jax.tree.map(np.copy, params),
                               meta, steps_per_epoch=12)

    # uninterrupted 12 steps
    random.seed(31)
    full = make_trainer()
    full_losses = full.train(total_steps=12, save_checkpoint=False)

    # killed after 6 steps (checkpoint every 3), resumed in a FRESH trainer
    ck = str(tmp_path / "pretrain_resume.msgpack")
    random.seed(31)
    part = make_trainer()
    part.train(total_steps=6, save_checkpoint=False,
               checkpoint_path=ck, checkpoint_every=3)
    # single atomic file: state + host-RNG stream record together (a torn
    # state/sidecar pair was possible with two files)
    assert os.path.isfile(ck) and not os.path.isfile(ck + ".meta.json")
    import shutil
    ck_mid = str(tmp_path / "mid.msgpack")  # the resumed run rewrites ck
    shutil.copy(ck, ck_mid)
    ck_legacy = str(tmp_path / "legacy.msgpack")
    shutil.copy(ck, ck_legacy)

    random.seed(99)  # must be irrelevant: the record restores the stream
    resumed = make_trainer()
    res_losses = resumed.train(total_steps=12, save_checkpoint=False,
                               checkpoint_path=ck, checkpoint_every=100)
    assert int(resumed.state.step) == int(full.state.step) == 12
    # loss AGGREGATES differ by construction (the resumed run only logs
    # steps 6..12); the invariant is the training trajectory itself:
    assert set(res_losses) <= set(full_losses)
    for a, b in zip(jax.tree.leaves(full.state.params),
                    jax.tree.leaves(resumed.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)

    # in-process continuation: the SAME trainer calls train() again with
    # its own checkpoint — the stream is already positioned, so resume
    # must NOT replay (replaying would double-consume draws); the
    # continued trajectory still matches the uninterrupted run
    ck2 = str(tmp_path / "inproc_resume.msgpack")
    random.seed(31)
    cont = make_trainer()
    cont.train(total_steps=6, save_checkpoint=False,
               checkpoint_path=ck2, checkpoint_every=100)
    cont.train(total_steps=12, save_checkpoint=False,
               checkpoint_path=ck2, checkpoint_every=100)
    assert int(cont.state.step) == 12
    for a, b in zip(jax.tree.leaves(full.state.params),
                    jax.tree.leaves(cont.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)

    # position records allow REWINDING an in-process trainer to an older
    # checkpoint (the r4 origin-replay format had to refuse a stream
    # mismatch): loading ck_mid restores the step-6 RNG states and
    # repositions every task iterator, so retraining 6..12 lands on the
    # uninterrupted trajectory again
    cont.train(total_steps=12, save_checkpoint=False,
               checkpoint_path=ck_mid, checkpoint_every=100)
    assert int(cont.state.step) == 12
    for a, b in zip(jax.tree.leaves(full.state.params),
                    jax.tree.leaves(cont.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)

    # ... and checkpointing may START mid-stream (the record snapshots the
    # CURRENT positions, not a replay origin — also refused before): h1
    # trains 6 steps uncheckpointed, starts checkpointing for 3 more, is
    # "killed"; a fresh process finishes the last 3 from the checkpoint
    # and still lands on the uninterrupted 12-step trajectory
    ck3 = str(tmp_path / "mid_stream_start.msgpack")
    random.seed(31)
    h1 = make_trainer()
    h1.train(total_steps=6, save_checkpoint=False)
    h1.train(total_steps=3, save_checkpoint=False,
             checkpoint_path=ck3, checkpoint_every=100)
    assert int(h1.state.step) == 9
    h2 = make_trainer()
    h2.train(total_steps=6, save_checkpoint=False,
             checkpoint_path=ck3, checkpoint_every=100)
    assert int(h2.state.step) == 12
    for a, b in zip(jax.tree.leaves(full.state.params),
                    jax.tree.leaves(h2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)

    # legacy r4 origin-replay records still resume: rewrite the step-6
    # checkpoint's stream record into the old format (origin RNG states +
    # total consumed draws) and resume a fresh process from it
    import json
    from flax import serialization

    probe = make_trainer()
    template = {"params": probe.state.params,
                "opt_state": probe.state.opt_state,
                "step": 0, "next_step": 0, "stream_record": ""}
    with open(ck_legacy, "rb") as f:
        payload = serialization.from_bytes(template, f.read())
    random.seed(31)  # the origin state both 12-step runs above started from
    py0, np0 = random.getstate(), np.random.get_state()
    payload["stream_record"] = json.dumps({
        "stream_py_rng": [py0[0], list(py0[1]), py0[2]],
        "stream_np_rng": [np0[0], np.asarray(np0[1]).tolist(),
                          int(np0[2]), int(np0[3]), float(np0[4])],
        "consumed_micros": 12,
    })
    with open(ck_legacy, "wb") as f:
        f.write(serialization.to_bytes(payload))
    legacy = make_trainer()
    legacy.train(total_steps=12, save_checkpoint=False,
                 checkpoint_path=ck_legacy, checkpoint_every=100)
    assert int(legacy.state.step) == 12
    for a, b in zip(jax.tree.leaves(full.state.params),
                    jax.tree.leaves(legacy.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
