"""Tools (misclassification, feature converter, memotion prep) + Oscar model."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_convert_feature_export_roundtrip(tmp_path):
    from meme_challenge_tpu.data.meme_dataset import load_img_feature
    from meme_challenge_tpu.tools.convert_feature_export import (
        parse_numpy_file,
    )

    rng = np.random.RandomState(0)
    nbb = 7
    np.savez(
        tmp_path / "00042.npz",
        x=rng.randn(nbb, 16).astype(np.float32),
        bbox=np.abs(rng.randn(nbb, 4)).astype(np.float32) * 50,
        info=np.array({
            "image_h": 300, "image_w": 400,
            "objects_id": rng.randint(0, 100, nbb),
            "objects_conf": rng.rand(nbb).astype(np.float32),
        }, dtype=object),
    )
    out = tmp_path / "out"
    out.mkdir()
    parse_numpy_file(str(tmp_path / "00042.npz"), str(out))
    assert (out / "00042.npy").exists()
    assert (out / "00042_info.npy").exists()
    # consumable by the dataset loader
    feat, pos, objs, conf = load_img_feature(str(out), 42, normalize=True)
    assert feat.shape == (nbb, 16)
    assert pos.shape == (nbb, 7)
    assert objs.shape == (nbb,)


def test_misclassification_tool(tmp_path):
    from meme_challenge_tpu.core.artifacts import export_predictions
    from meme_challenge_tpu.core.artifacts import load_predictions
    from meme_challenge_tpu.tools.misclassification import (
        copy_misclassified_imgs,
        misclassified_ids,
    )

    ids = np.array([1, 2, 3])
    export_predictions(str(tmp_path / "res.csv"), ids,
                       np.array([0.9, 0.2, 0.6]), np.array([1, 0, 1]),
                       labels=np.array([1, 1, 0]))
    res = load_predictions(str(tmp_path / "res.csv"))
    assert misclassified_ids(res).tolist() == [2, 3]

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in ids:
        (img_dir / (str(i).zfill(5) + ".png")).write_bytes(b"png")
    save = tmp_path / "save"
    (save / "hateful").mkdir(parents=True)
    (save / "not_hateful").mkdir()
    copied = copy_misclassified_imgs(res, str(img_dir), str(save))
    assert sorted(os.path.basename(c) for c in copied) == [
        "00002.png", "00003.png"]
    assert (save / "hateful" / "00002.png").exists()   # gt=1
    assert (save / "not_hateful" / "00003.png").exists()  # gt=0


def test_prep_memotion(tmp_path):
    from meme_challenge_tpu.tools.prep_memotion import (
        OFFSET_IDX,
        generate_jsonl_file,
        rename_img_feats,
        scrub_text,
    )

    # NOTE: the reference's URL regex is greedy — a path consumes the rest
    # of the line (prep_memotion.py:41); replicated faithfully
    assert scrub_text("go to https://evil.com/x now") == "go to "
    assert "example" not in scrub_text("see example.com please")

    feat_dir = tmp_path / "img_feats"
    feat_dir.mkdir()
    # extractor outputs named image_{i}.npy before renaming
    np.save(feat_dir / "image_1.npy", np.zeros((3, 4), np.float32))
    np.save(feat_dir / "image_1_info.npy",
            np.array({"bbox": np.zeros((3, 4))}, dtype=object))
    n = rename_img_feats(str(feat_dir))
    assert n == 2
    assert (feat_dir / f"{int(1 + OFFSET_IDX)}.npy").exists()

    with open(tmp_path / "labels.csv", "w") as f:
        f.write(",image_name,text_corrected\n")
        f.write("0,image_1.jpg,funny text www.spam.com here\n")
        f.write("1,image_2.jpg,no features for this one\n")
    out = generate_jsonl_file(str(tmp_path))
    recs = [json.loads(l) for l in open(out) if l.strip()]
    assert len(recs) == 1  # only the sample with features
    assert recs[0]["id"] == str(int(1 + OFFSET_IDX))
    assert "spam" not in recs[0]["text"]
    assert recs[0]["label"] == 0


def test_oscar_model_forward(rng):
    from meme_challenge_tpu.core.config import UniterConfig
    from meme_challenge_tpu.models.oscar import (
        ImageBertForSequenceClassification,
        oscar_batch_features,
    )

    cfg = UniterConfig(vocab_size=80, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=64,
                       img_dim=16, max_position_embeddings=32,
                       hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
    B, T, R = 2, 8, 5
    feats = jnp.asarray(rng.randn(B, R, 16), jnp.float32)
    pos7 = jnp.asarray(rng.rand(B, R, 7), jnp.float32)
    oscar_feat = oscar_batch_features(feats, pos7)
    assert oscar_feat.shape == (B, R, 22)  # 16 + 6 (area term dropped)

    for classifier in ["linear", "mlp"]:
        model = ImageBertForSequenceClassification(
            cfg, num_labels=2, classifier=classifier, img_feature_dim=22)
        batch = {
            "input_ids": jnp.asarray(rng.randint(0, 80, (B, T)), jnp.int32),
            "txt_mask": jnp.ones((B, T), jnp.int32),
            "img_feat": oscar_feat,
            "img_mask": jnp.ones((B, R), jnp.int32),
        }
        params = model.init(jax.random.PRNGKey(0), batch,
                            deterministic=True)["params"]
        out = model.apply({"params": params}, batch, deterministic=True)
        assert out.shape == (B, 2)
        assert np.isfinite(np.asarray(out)).all()
        if classifier == "mlp":
            assert "cls_hidden" in params
    # text-only path (img_feature_dim==0 equivalent: no img batch keys)
    model = ImageBertForSequenceClassification(cfg, num_labels=2,
                                               img_feature_dim=22)
    batch_txt = {
        "input_ids": jnp.asarray(rng.randint(0, 80, (B, T)), jnp.int32),
        "txt_mask": jnp.ones((B, T), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch_txt,
                        deterministic=True)
    out = model.apply(params, batch_txt, deterministic=True)
    assert out.shape == (B, 2)


def test_visualize_boxes_tool(tmp_path):
    """Headless box-overlay tool (reference subrepo utils/visualize.py):
    CLI over an image dir writes *_annotated.* files with drawn overlays."""
    import dataclasses

    import cv2

    from meme_challenge_tpu.extract.detector import (
        DetectorConfig, FeatureExtractor, init_detector_params)
    from meme_challenge_tpu.tools.visualize_boxes import (
        annotate_image, annotated_path, box_labels, main)

    rng = np.random.RandomState(0)
    img = (rng.rand(72, 96, 3) * 255).astype(np.uint8)

    # library surface: random-init tiny detector → overlay differs from input
    cfg = dataclasses.replace(DetectorConfig(), min_size=64, max_size=96,
                              conf_thresh=0.4, min_boxes=2, max_boxes=5)
    ex = FeatureExtractor(cfg, init_detector_params(cfg, jax.random.PRNGKey(0)))
    im, out = annotate_image(ex, img, classes={0: "thing"})
    assert out["num_bbox"] >= 1
    drawn = np.asarray(im)
    assert drawn.shape == img.shape
    assert (drawn != img[..., ::-1]).any(), "no overlay pixels drawn"

    # attribute labels kick in above the 0.1 confidence threshold
    info = {"objects_id": np.array([3]), "attrs_id": np.array([1]),
            "attrs_conf": np.array([0.5])}
    assert box_labels(info, {3: "dog"}, {1: "brown"}) == ["brown dog"]
    info["attrs_conf"] = np.array([0.05])
    assert box_labels(info, {3: "dog"}, {1: "brown"}) == ["dog"]

    assert annotated_path("/a/b/x.png") == "/a/b/x_annotated.png"
    assert annotated_path("/a/b/x.png", "/o") == "/o/x_annotated.png"

    # CLI surface end-to-end (random-init weights; tiny shapes via monkey
    # config is not reachable from the CLI, so feed a min_size-sized image)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "m.png"), img)
    out_dir = tmp_path / "out"
    import meme_challenge_tpu.tools.visualize_boxes as vb

    # CLI builds a full-size DetectorConfig; patch its dataclasses.replace
    # to return the tiny one so the test doesn't compile a 600x1000
    # backbone on CPU
    import meme_challenge_tpu.extract.detector as det

    monkey = dataclasses.replace(det.DetectorConfig(), min_size=64,
                                 max_size=96, min_boxes=2, max_boxes=5)
    real_replace = dataclasses.replace

    def fake_replace(obj, **kw):
        if isinstance(obj, det.DetectorConfig):
            base = dataclasses.asdict(monkey)
            base.update(kw)
            return det.DetectorConfig(**base)
        return real_replace(obj, **kw)

    vb.dataclasses.replace = fake_replace
    try:
        main(["--image-dir", str(img_dir), "--out-dir", str(out_dir),
              "--weights", ""])
    finally:
        vb.dataclasses.replace = real_replace
    assert (out_dir / "m_annotated.png").exists()


def test_oscar_entry_end_to_end_device_resident_matches_host(tmp_path):
    """build_oscar_entry trains on synthetic data through the crossval
    driver in BOTH batch modes; device-resident (index loaders + in-graph
    2054-d assembly, models/oscar.py) must match the host path (loader-side
    assembly) pointwise."""
    from meme_challenge_tpu.core.config import TrainConfig, UniterConfig
    from meme_challenge_tpu.core.seeding import set_seed
    from meme_challenge_tpu.train.crossval_driver import train_crossval
    from meme_challenge_tpu.train.train_oscar import build_oscar_entry
    from meme_challenge_tpu.utils.synthetic import make_synthetic_dataset

    synth = make_synthetic_dataset(str(tmp_path / "d"), n_train=24, n_dev=8,
                                   n_test=8, img_dim=16, label_signal=3.0)
    ocfg = UniterConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=64,
                        img_dim=22,  # stored 16-d + 6-d geometry
                        max_position_embeddings=32,
                        hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)

    def run(device_resident):
        cfg = TrainConfig(
            data_path=synth["root"], feature_path=synth["feature_dir"],
            model_path=str(tmp_path / f"ck{int(device_resident)}"),
            model_save_name="oscar.ckpt", lr=1e-3, batch_size=8,
            max_epoch=2, warmup_steps=2, max_txt_len=8, max_bb=8, seed=7,
            loss_func="ce",  # n_classes derives to 2
            # the CE/multiclass metrics path has no AUROC (reference
            # metrics.py:16-20) — the Oscar CLI sets optimize_for=accuracy
            optimize_for="accuracy",
            adam_mu_dtype="float32", adam_nu_dtype="float32",
            device_resident_data=device_resident)
        os.makedirs(cfg.model_path, exist_ok=True)
        set_seed(7)
        loader_funcs, test_loaders, factory = build_oscar_entry(
            cfg, ocfg, synth["vocab"])
        assert all(getattr(l, "index_batches", False) == device_resident
                   for l in test_loaders)
        val_metrics, _ = train_crossval(factory, cfg, loader_funcs,
                                        test_loaders, num_folds=0)
        csv = os.path.join(cfg.model_path, "oscar_dev_seen_preds.csv")
        assert os.path.isfile(csv)
        with open(csv) as f:
            rows = f.read()
        return val_metrics["accuracy"], rows

    host_acc, host_csv = run(False)
    dev_acc, dev_csv = run(True)
    assert np.isfinite(host_acc)
    assert dev_acc == pytest.approx(host_acc, abs=1e-6)
    assert dev_csv == host_csv, "device-resident CSV export must match host"
