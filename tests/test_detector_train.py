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

    N, G, C, A = 64, 4, 11, 5
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

    cfg = DetectorConfig(depth=101, num_classes=7, num_attributes=5,
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
