"""VG evaluation parity against the reference vg_eval executed from
/root/reference (file-based), plus sanity properties."""
import importlib.util
import os

import numpy as np
import pytest

from meme_challenge_tpu.extract.vg_eval import (
    eval_class,
    evaluate_detections,
    voc_ap,
)


@pytest.fixture(scope="module")
def ref_vg():
    spec = importlib.util.spec_from_file_location(
        "ref_vg_eval",
        "/root/reference/bottom-up-attention.pytorch/evaluation/vg_eval.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_voc_ap_matches_reference(ref_vg, rng):
    for _ in range(5):
        n = 20
        rec = np.sort(rng.rand(n))
        prec = rng.rand(n)
        for use07 in (False, True):
            assert voc_ap(rec, prec, use07) == pytest.approx(
                ref_vg.voc_ap(rec, prec, use07), abs=1e-12)


def _random_case(rng, n_images=4, n_gt=3, n_det=10):
    gt_roidb, image_index = [], []
    for i in range(n_images):
        boxes = np.abs(rng.rand(n_gt, 2)) * 100
        boxes = np.concatenate(
            [boxes, boxes + 20 + rng.rand(n_gt, 2) * 60], axis=1)
        gt_roidb.append({
            "boxes": boxes,
            "gt_classes": rng.randint(1, 4, n_gt),
        })
        image_index.append(1000 + i)
    det_ids, det_scores, det_boxes = [], [], []
    for i in range(n_images):
        for _ in range(n_det):
            if rng.rand() < 0.5 and len(gt_roidb[i]["boxes"]) > 0:
                # near-gt detection (jittered)
                j = rng.randint(n_gt)
                b = gt_roidb[i]["boxes"][j] + rng.randn(4) * 3
            else:
                b = np.abs(rng.rand(2)) * 100
                b = np.concatenate([b, b + 10 + rng.rand(2) * 50])
            det_ids.append(1000 + i)
            det_scores.append(rng.rand())
            det_boxes.append(b)
    return gt_roidb, image_index, det_ids, det_scores, np.asarray(det_boxes)


def test_eval_class_matches_reference_file_based(ref_vg, rng, tmp_path):
    gt_roidb, image_index, det_ids, det_scores, det_boxes = _random_case(rng)
    classindex = 2
    # reference path: write a detections file
    detfile = tmp_path / "dets.txt"
    with open(detfile, "w") as f:
        for img, s, b in zip(det_ids, det_scores, det_boxes):
            f.write("%s %.6f %.3f %.3f %.3f %.3f\n"
                    % (img, s, b[0], b[1], b[2], b[3]))
    rec_r, prec_r, ap_r, scores_r, npos_r = ref_vg.vg_eval(
        str(detfile), gt_roidb, image_index, classindex, ovthresh=0.5)

    gt_by_image = {
        str(img): item["boxes"][item["gt_classes"] == classindex]
        for item, img in zip(gt_roidb, image_index)}
    rec_o, prec_o, ap_o, scores_o, npos_o = eval_class(
        [str(i) for i in det_ids], np.asarray(det_scores), det_boxes,
        gt_by_image, ovthresh=0.5)

    assert npos_o == npos_r
    assert ap_o == pytest.approx(ap_r, abs=1e-10)
    np.testing.assert_allclose(rec_o, rec_r, atol=1e-12)
    np.testing.assert_allclose(prec_o, prec_r, atol=1e-12)


def test_evaluate_detections_perfect_and_empty(rng):
    gt = [{"image_id": 1,
           "boxes": np.array([[0, 0, 50, 50], [60, 60, 120, 120]]),
           "classes": np.array([0, 1])}]
    perfect = [{"image_id": 1,
                "boxes": np.array([[0, 0, 50, 50], [60, 60, 120, 120]]),
                "scores": np.array([0.9, 0.8]),
                "labels": np.array([0, 1])}]
    res = evaluate_detections(perfect, gt, num_classes=3)
    assert res["mAP"] == pytest.approx(1.0)
    assert res["weighted_mAP"] == pytest.approx(1.0)
    assert set(res["per_class_ap"]) == {0, 1}  # class 2 has no gt -> skipped

    nothing = [{"image_id": 1, "boxes": np.zeros((0, 4)),
                "scores": np.zeros(0), "labels": np.zeros(0, int)}]
    res0 = evaluate_detections(nothing, gt, num_classes=3)
    assert res0["mAP"] == 0.0
