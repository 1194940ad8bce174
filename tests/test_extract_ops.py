"""Native (C++) vs JAX vs naive-numpy parity for the extraction ops."""
import numpy as np
import pytest

import jax.numpy as jnp

from meme_challenge_tpu.extract.native import (
    build_library,
    nms,
    roi_align,
    roi_pool,
)
from meme_challenge_tpu.extract.ops import nms_jax, roi_align_jax


def naive_nms(boxes, scores, thresh):
    """Independent O(n²) NMS oracle."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    areas = np.maximum(0, boxes[:, 2] - boxes[:, 0]) * \
        np.maximum(0, boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
        iou = inter / (areas[i] + areas - inter + 1e-12)
        suppressed |= iou > thresh
    return np.array(keep)


def _random_boxes(rng, n=60, size=200):
    x1 = rng.uniform(0, size * 0.8, n)
    y1 = rng.uniform(0, size * 0.8, n)
    w = rng.uniform(5, size * 0.4, n)
    h = rng.uniform(5, size * 0.4, n)
    boxes = np.stack([x1, y1, x1 + w, y1 + h], 1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    return boxes, scores


def test_build_library():
    path = build_library()
    import os

    assert os.path.isfile(path)


def test_native_nms_matches_naive(rng):
    for _ in range(5):
        boxes, scores = _random_boxes(rng)
        for thresh in [0.3, 0.5, 0.7]:
            got = nms(boxes, scores, thresh)
            expect = naive_nms(boxes, scores, thresh)
            np.testing.assert_array_equal(got, expect)


def test_jax_nms_matches_native(rng):
    boxes, scores = _random_boxes(rng, n=40)
    keep_idx, keep_mask = nms_jax(jnp.array(boxes), jnp.array(scores), 0.3,
                                  max_out=40)
    got = np.asarray(keep_idx)[np.asarray(keep_mask)]
    expect = nms(boxes, scores, 0.3)
    np.testing.assert_array_equal(got, expect)


def test_nms_empty_and_single():
    assert nms(np.zeros((0, 4), np.float32), np.zeros(0, np.float32),
               0.3).shape == (0,)
    single = nms(np.array([[0, 0, 10, 10]], np.float32),
                 np.array([0.9], np.float32), 0.3)
    assert single.tolist() == [0]


def naive_roi_align(feat, rois, scale, ph, pw, sr, aligned):
    """Independent numpy oracle (float64)."""
    C, H, W = feat.shape
    offset = 0.5 if aligned else 0.0
    out = np.zeros((len(rois), C, ph, pw))

    def bil(plane, y, x):
        if y < -1 or y > H or x < -1 or x > W:
            return 0.0
        y, x = max(y, 0.0), max(x, 0.0)
        y0, x0 = int(y), int(x)
        if y0 >= H - 1:
            y0 = y1 = H - 1
            y = float(y0)
        else:
            y1 = y0 + 1
        if x0 >= W - 1:
            x0 = x1 = W - 1
            x = float(x0)
        else:
            x1 = x0 + 1
        ly, lx = y - y0, x - x0
        return ((1 - ly) * (1 - lx) * plane[y0, x0]
                + (1 - ly) * lx * plane[y0, x1]
                + ly * (1 - lx) * plane[y1, x0]
                + ly * lx * plane[y1, x1])

    for ri, roi in enumerate(rois):
        x1 = roi[0] * scale - offset
        y1 = roi[1] * scale - offset
        x2 = roi[2] * scale - offset
        y2 = roi[3] * scale - offset
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bh, bw = rh / ph, rw / pw
        for c in range(C):
            for py in range(ph):
                for px in range(pw):
                    acc = 0.0
                    for iy in range(sr):
                        for ix in range(sr):
                            y = y1 + py * bh + (iy + 0.5) * bh / sr
                            x = x1 + px * bw + (ix + 0.5) * bw / sr
                            acc += bil(feat[c].astype(np.float64), y, x)
                    out[ri, c, py, px] = acc / (sr * sr)
    return out


@pytest.mark.parametrize("aligned", [True, False])
def test_roi_align_native_vs_naive(rng, aligned):
    feat = rng.randn(3, 14, 17).astype(np.float32)
    rois = np.array([[2.0, 3.0, 40.0, 50.0],
                     [0.0, 0.0, 120.0, 100.0],
                     [10.0, 10.0, 11.0, 11.0]], np.float32)
    got = roi_align(feat, rois, spatial_scale=1.0 / 8, output_size=(7, 7),
                    sampling_ratio=2, aligned=aligned)
    expect = naive_roi_align(feat, rois, 1.0 / 8, 7, 7, 2, aligned)
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_roi_align_jax_matches_native(rng):
    feat = rng.randn(4, 12, 15).astype(np.float32)
    rois = np.array([[4.0, 6.0, 60.0, 70.0],
                     [0.0, 0.0, 30.0, 40.0]], np.float32)
    native_out = roi_align(feat, rois, 1.0 / 8, (7, 7), sampling_ratio=2,
                           aligned=True)
    jax_out = roi_align_jax(jnp.array(feat), jnp.array(rois), 1.0 / 8,
                            (7, 7), sampling_ratio=2, aligned=True)
    np.testing.assert_allclose(np.asarray(jax_out), native_out, atol=2e-5)


def test_roi_pool_max_semantics(rng):
    feat = np.zeros((1, 16, 16), np.float32)
    feat[0, 4, 5] = 7.0
    feat[0, 10, 12] = 9.0
    rois = np.array([[0.0, 0.0, 127.0, 127.0]], np.float32)  # whole image
    out = roi_pool(feat, rois, spatial_scale=1.0 / 8, output_size=(2, 2))
    assert out.shape == (1, 1, 2, 2)
    assert out.max() == 9.0
    assert 7.0 in out  # the two maxima land in different bins


def test_device_batched_nms_matches_host_loop(rng):
    """ops/nms.py device greedy NMS AND the single-call native batched NMS
    == the per-class native.nms host loop (exact: same stable ordering,
    IoU>thresh, no-+1 areas)."""
    from meme_challenge_tpu.extract import native
    from meme_challenge_tpu.ops.nms import max_conf_device

    R, C = 57, 12
    boxes = np.abs(rng.randn(R, 4)).astype(np.float32) * 30
    boxes[:, 2:] = boxes[:, :2] + np.abs(rng.randn(R, 2)).astype(np.float32) * 40 + 1
    cls_prob = rng.rand(R, C).astype(np.float32)
    cls_prob /= cls_prob.sum(1, keepdims=True)
    thresh = 0.3

    host = np.zeros(R, np.float32)
    for c in range(1, C):
        keep = native.nms(boxes, cls_prob[:, c], thresh)
        host[keep] = np.maximum(host[keep], cls_prob[keep, c])

    dev = max_conf_device(boxes, cls_prob, thresh)
    np.testing.assert_array_equal(dev, host)
    fast = native.nms_max_conf(boxes, cls_prob, thresh)
    np.testing.assert_array_equal(fast, host)


def test_device_nms_extraction_matches_host_path(rng):
    """FeatureExtractor with device NMS selects identical boxes/features."""
    import jax

    from meme_challenge_tpu.extract.detector import (
        DetectorConfig, FeatureExtractor, init_detector_params)

    cfg = DetectorConfig(num_classes=13, num_attributes=7, min_size=64,
                         max_size=96, pre_nms_topk=200, post_nms_topk=40,
                         min_boxes=3, max_boxes=10)
    params = init_detector_params(cfg, jax.random.PRNGKey(0))
    img = (rng.rand(70, 90, 3) * 255).astype(np.uint8)
    outs = {}
    for impl in ("native_batched", "device", "host_loop"):
        ex = FeatureExtractor(cfg, params, nms_impl=impl)
        outs[impl] = ex.extract(img, mode=1)
    for impl in ("native_batched", "device"):
        np.testing.assert_array_equal(outs[impl]["bbox"],
                                      outs["host_loop"]["bbox"])
        np.testing.assert_array_equal(outs[impl]["x"],
                                      outs["host_loop"]["x"])
        np.testing.assert_array_equal(outs[impl]["info"]["objects_id"],
                                      outs["host_loop"]["info"]["objects_id"])
