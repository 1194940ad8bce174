"""Detector-training losses: matching/encoding oracles + a short training
loop that must drive losses down."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meme_challenge_tpu.extract.detector import decode_boxes
from meme_challenge_tpu.extract.detector_train import (
    encode_boxes,
    match_anchors,
    pairwise_iou,
    roi_losses,
    rpn_losses,
    smooth_l1,
    subsample_labels,
)


def test_encode_decode_roundtrip(rng):
    anchors = jnp.asarray(np.array(
        [[0, 0, 40, 60], [10, 20, 90, 70]], np.float32))
    targets = jnp.asarray(np.array(
        [[5, 8, 44, 66], [12, 24, 80, 77]], np.float32))
    deltas = encode_boxes(anchors, targets)
    back = decode_boxes(anchors, deltas)
    np.testing.assert_allclose(np.asarray(back), np.asarray(targets),
                               atol=1e-3)


def test_pairwise_iou_oracle():
    b1 = jnp.asarray(np.array([[0, 0, 10, 10]], np.float32))
    b2 = jnp.asarray(np.array([[0, 0, 10, 10], [5, 5, 15, 15],
                               [20, 20, 30, 30]], np.float32))
    iou = np.asarray(pairwise_iou(b1, b2))[0]
    assert iou[0] == pytest.approx(1.0)
    assert iou[1] == pytest.approx(25 / 175, abs=1e-6)
    assert iou[2] == 0.0


def test_match_anchors_rules():
    anchors = jnp.asarray(np.array(
        [[0, 0, 10, 10],        # IoU 1.0 with gt0 -> pos
         [0, 0, 9, 10],         # high IoU -> pos
         [100, 100, 110, 110],  # no overlap -> neg
         [0, 0, 16, 10],        # mid IoU -> ignore band
         [47, 47, 61, 61]],     # best anchor for gt1 (low IoU) -> pos
        np.float32))
    gt = jnp.asarray(np.array([[0, 0, 10, 10], [50, 50, 60, 60]],
                              np.float32))
    mask = jnp.array([True, True])
    labels, matched = match_anchors(anchors, gt, mask,
                                    pos_iou=0.7, neg_iou=0.3)
    labels = np.asarray(labels)
    assert labels[0] == 1 and labels[1] == 1
    assert labels[2] == 0
    assert labels[3] == -1
    assert labels[4] == 1          # low-quality best-per-gt promotion
    assert np.asarray(matched)[4] == 1


def test_subsample_respects_budget(rng):
    labels = jnp.asarray(np.concatenate(
        [np.ones(100), np.zeros(500), -np.ones(50)]).astype(np.int32))
    w = np.asarray(subsample_labels(labels, jax.random.PRNGKey(0),
                                    batch_size=64, positive_fraction=0.5))
    assert w.sum() <= 64 + 1e-6
    assert w[np.asarray(labels) == -1].sum() == 0
    pos_taken = w[np.asarray(labels) == 1].sum()
    assert pos_taken <= 32


def test_losses_trainable_end_to_end(rng):
    """A linear proxy 'detector' trained with rpn+roi losses must fit a
    fixed target configuration (losses decrease substantially)."""
    import optax

    N, G, C, A = 64, 4, 11, 6   # attr head: ids 0..4 -> cols 1..5
    anchors = jnp.asarray(
        np.concatenate([rng.rand(N, 2) * 80,
                        rng.rand(N, 2) * 40 + 90], 1).astype(np.float32))
    gt_boxes = jnp.asarray(
        np.array([[10, 10, 50, 60], [60, 20, 100, 80],
                  [5, 70, 45, 110], [70, 70, 120, 120]], np.float32))
    gt_mask = jnp.ones(G, bool)
    gt_classes = jnp.asarray(np.array([1, 3, 5, 7]))
    gt_attrs = jnp.asarray(np.array([2, -1, 4, -1]))

    params = {
        "obj": jnp.zeros(N), "deltas": jnp.zeros((N, 4)),
        "cls": jnp.zeros((N, C)), "box": jnp.zeros((N, C * 4)),
        "attr": jnp.zeros((N, A)),
    }

    def loss_fn(p, rng_):
        r1, r2 = jax.random.split(rng_)
        l1 = rpn_losses(anchors, p["obj"], p["deltas"], gt_boxes, gt_mask,
                        r1, batch_size=32)
        l2 = roi_losses(anchors, p["cls"], p["box"], p["attr"], gt_boxes,
                        gt_classes, gt_attrs, gt_mask, r2, batch_size=32)
        return sum(l1.values()) + sum(l2.values()), {**l1, **l2}

    tx = optax.adam(0.05)
    opt = tx.init(params)
    key = jax.random.PRNGKey(0)
    (first, parts0), _ = jax.value_and_grad(loss_fn, has_aux=True)(
        params, key)
    step = jax.jit(lambda p, o, r: _step(p, o, r))

    def _step(p, o, r):
        (l, parts), g = jax.value_and_grad(loss_fn, has_aux=True)(p, r)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), o, l, parts

    for i in range(150):
        params, opt, last, parts = step(params, opt,
                                        jax.random.fold_in(key, i))
    assert float(last) < float(first) * 0.5, (float(first), float(last))
    for name, v in parts.items():
        assert np.isfinite(float(v)), name


def test_full_detector_train_step(rng):
    """One jitted detector train step (backbone+RPN+ROI losses + update)
    runs and decreases the total loss over a few steps on a fixed batch."""
    import optax

    import jax.numpy as jnp

    from meme_challenge_tpu.extract.detector import (
        BUADetector,
        DetectorConfig,
        init_detector_params,
    )
    from meme_challenge_tpu.extract.detector_train import (
        make_detector_train_step,
    )
    from meme_challenge_tpu.train.steps import TrainState

    cfg = DetectorConfig(depth=101, num_classes=7, num_attributes=6,
                         pooler_resolution=7, min_size=64, max_size=96)
    model = BUADetector(cfg)
    params = init_detector_params(cfg, jax.random.PRNGKey(0),
                                  image_hw=(64, 64))
    tx = optax.adam(1e-3)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_detector_train_step(model, cfg, tx, num_proposals=16)

    batch = {
        "images": jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32),
        "gt_boxes": jnp.asarray([[4, 4, 30, 40], [20, 10, 60, 60],
                                 [5, 35, 45, 62]], jnp.float32),
        "gt_classes": jnp.asarray([1, 3, 5]),
        "gt_attrs": jnp.asarray([2, -1, 4]),
        "gt_mask": jnp.ones(3, bool),
    }
    k = jax.random.PRNGKey(0)
    state, first = step(state, batch, k)
    first_total = float(sum(np.asarray(v) for v in first.values()))
    for i in range(12):
        state, losses = step(state, batch, jax.random.fold_in(k, i))
    last_total = float(sum(np.asarray(v) for v in losses.values()))
    assert np.isfinite(last_total)
    assert last_total < first_total, (first_total, last_total)
    assert set(losses) == {"rpn_objectness", "rpn_box", "roi_cls",
                           "roi_box", "roi_attr"}


def test_vg_json_loader_and_batches(tmp_path):
    """COCO-format VG json → records → static-shape train batches that the
    detector train step consumes end-to-end."""
    import json

    import jax
    import optax

    from meme_challenge_tpu.extract.detector import (
        BUADetector, DetectorConfig, init_detector_params)
    from meme_challenge_tpu.extract.detector_train import (
        make_detector_train_step)
    from meme_challenge_tpu.extract.vg_data import (
        VGDetectionLoader, load_vg_json)

    rng = np.random.RandomState(0)
    coco = {
        "images": [
            {"id": 2, "file_name": "b.jpg", "height": 60, "width": 80},
            {"id": 1, "file_name": "a.jpg", "height": 50, "width": 70},
        ],
        # non-contiguous category ids -> contiguous remap (load_vg_json.py)
        "categories": [{"id": 3, "name": "cat"}, {"id": 7, "name": "hat"}],
        "annotations": [
            {"id": 10, "image_id": 1, "bbox": [5, 6, 20, 15],
             "category_id": 3, "attribute": [4, 9]},
            {"id": 11, "image_id": 1, "bbox": [30, 10, 25, 30],
             "category_id": 7},
            {"id": 12, "image_id": 2, "bbox": [2, 2, 40, 30],
             "category_id": 3, "iscrowd": 1},   # skipped
            {"id": 13, "image_id": 2, "bbox": [1, 1, 10, 0],
             "category_id": 7},                 # degenerate, skipped
        ],
    }
    jf = tmp_path / "train.json"
    jf.write_text(json.dumps(coco))
    records = load_vg_json(str(jf), str(tmp_path))
    assert [r["image_id"] for r in records] == [1, 2]
    assert records[0]["boxes"].shape == (2, 4)
    np.testing.assert_allclose(records[0]["boxes"][0], [5, 6, 25, 21])
    assert records[0]["classes"].tolist() == [0, 1]   # remapped
    assert records[0]["attrs"].tolist() == [3, -1]    # 1-based -> 0-based
    assert records[1]["boxes"].shape == (0, 4)        # both anns skipped

    cfg = DetectorConfig(num_classes=5, num_attributes=5, min_size=32,
                         max_size=64, size_divisibility=32)
    loader = VGDetectionLoader(
        records, cfg, max_gt=8, is_train=True, seed=1,
        image_reader=lambda rec: (rng.rand(rec["height"], rec["width"], 3)
                                  * 255).astype(np.uint8))
    batches = list(loader)
    # empty-gt image filtered at train time (dataset_mapper.py:158)
    assert len(batches) == 1
    b = batches[0]
    assert b["images"].ndim == 4 and b["gt_boxes"].shape == (8, 4)
    assert b["gt_mask"].sum() == 2
    # boxes scaled into blob coordinates and inside the blob
    h, w = b["images"].shape[1:3]
    assert (b["gt_boxes"][b["gt_mask"]] <= max(h, w)).all()

    model = BUADetector(cfg)
    params = init_detector_params(cfg, jax.random.PRNGKey(0))
    tx = optax.sgd(1e-3)
    from meme_challenge_tpu.train.steps import TrainState
    state = TrainState(params, tx.init(params), 0)
    step = make_detector_train_step(model, cfg, tx, num_proposals=8)
    batch = {k: v for k, v in b.items() if k != "image_id"}
    state, losses = step(state, batch, jax.random.PRNGKey(1))
    assert all(np.isfinite(float(v)) for v in losses.values()), losses


def test_train_detector_cli_end_to_end(tmp_path, monkeypatch):
    """train_net.py-equivalent CLI: one epoch of VG training + eval-only
    reload on tiny synthetic data."""
    import json
    import os

    from meme_challenge_tpu.extract import train_detector as td
    from meme_challenge_tpu.extract import vg_data

    rng = np.random.RandomState(3)
    images, annotations = [], []
    aid = 0
    for iid in range(1, 4):
        images.append({"id": iid, "file_name": f"{iid}.jpg",
                       "height": 48, "width": 64})
        for _ in range(2):
            x, y = rng.randint(0, 30, 2)
            annotations.append({"id": aid, "image_id": iid,
                                "bbox": [int(x), int(y), 20, 16],
                                "category_id": int(rng.randint(1, 4)),
                                "attribute": [int(rng.randint(1, 3))]})
            aid += 1
    coco = {"images": images, "annotations": annotations,
            "categories": [{"id": i, "name": str(i)} for i in (1, 2, 3)]}
    jf = tmp_path / "ann.json"
    jf.write_text(json.dumps(coco))

    fake = lambda rec: (np.random.RandomState(rec["image_id"])
                        .rand(rec["height"], rec["width"], 3)
                        * 255).astype(np.uint8)
    monkeypatch.setattr(vg_data, "_read_image_bgr",
                        lambda path: fake({"image_id": int(
                            os.path.basename(path).split(".")[0]),
                            "height": 48, "width": 64}))

    cfg = td.DetectorConfig(num_classes=4, num_attributes=3, min_size=32,
                            max_size=64, size_divisibility=32,
                            pre_nms_topk=50, post_nms_topk=10,
                            min_boxes=2, max_boxes=5)
    # drive via the library functions with a small cfg
    import argparse
    ns = argparse.Namespace(out_dir=str(tmp_path / "out"), weights="",
                            epochs=1, lr=1e-3, seed=0, max_gt=8,
                            num_proposals=8, log_every=100, eval_images=2)
    os.makedirs(ns.out_dir, exist_ok=True)
    records = td.load_vg_json(str(jf), str(tmp_path))
    state = td.train(ns, cfg, records, records[:2], image_reader=fake)
    ckpt = os.path.join(ns.out_dir, "detector.msgpack")
    assert os.path.isfile(ckpt)

    metrics = td.evaluate(cfg, state.params, records[:2], image_reader=fake,
                          max_images=2)
    assert set(metrics) >= {"mAP", "weighted_mAP"}
    assert np.isfinite(metrics["mAP"])
