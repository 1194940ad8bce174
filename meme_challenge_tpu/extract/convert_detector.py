"""torch → flax converter for the BUA detector checkpoints.

The reference loads Caffe-converted torch checkpoints
(``bua-caffe-frcn-r101_with_attributes.pth``, configs yaml MODEL.WEIGHTS)
through detectron2's DetectionCheckpointer. This converter maps that
detectron2-style state_dict onto :class:`extract.detector.BUADetector`:

- ``backbone.stem.conv1`` → conv1/bn1
- ``backbone.res{2,3,4}.{i}.conv{1..3}`` (+``.norm``) → stage blocks;
  ``shortcut`` projections on stage entry
- ``roi_heads.res5.{i}.*`` → Res5Head
- ``proposal_generator.rpn_head.*`` → BUARPNHead
- ``roi_heads.box_predictor.*`` / attribute head → BUAROIHead

torch convs are OIHW; flax uses HWIO — transposed here. FrozenBN weight/bias
map to scale/bias directly (running stats are pre-folded in the Caffe
conversion).

Verification note: the actual Google-Drive checkpoint is not present in
this environment; the mapping follows detectron2's documented naming and is
exercised structurally (shape-checked against the flax tree) in tests.
"""
from __future__ import annotations

import logging
from typing import Dict, Mapping

import numpy as np

from meme_challenge_tpu.extract.detector import DetectorConfig
from meme_challenge_tpu.extract.resnet import RESNET_STAGES

logger = logging.getLogger("meme_challenge_tpu.extract.convert")


def _conv(w: np.ndarray) -> np.ndarray:
    """torch OIHW → flax HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _bn(sd, key):
    return {"scale": np.asarray(sd[key + ".weight"], np.float32),
            "bias": np.asarray(sd[key + ".bias"], np.float32)}


def _block(sd, prefix) -> Dict:
    out = {}
    for i in (1, 2, 3):
        out[f"conv{i}"] = {"kernel": _conv(sd[f"{prefix}.conv{i}.weight"])}
        out[f"bn{i}"] = _bn(sd, f"{prefix}.conv{i}.norm")
    if f"{prefix}.shortcut.weight" in sd:
        out["shortcut"] = {"kernel": _conv(sd[f"{prefix}.shortcut.weight"])}
        out["shortcut_bn"] = _bn(sd, f"{prefix}.shortcut.norm")
    return out


def detector_params_from_torch(path_or_sd, cfg: DetectorConfig) -> Dict:
    """Load + map a detectron2-style BUA checkpoint onto the flax tree."""
    if isinstance(path_or_sd, str):
        import torch

        ckpt = torch.load(path_or_sd, map_location="cpu", weights_only=False)
        if isinstance(ckpt, dict) and "model" in ckpt:
            ckpt = ckpt["model"]
        sd = {k: np.asarray(v.cpu().numpy()) if hasattr(v, "cpu")
              else np.asarray(v) for k, v in ckpt.items()}
    else:
        sd = dict(path_or_sd)

    n2, n3, n4, n5 = RESNET_STAGES[cfg.depth]
    backbone: Dict = {
        "conv1": {"kernel": _conv(sd["backbone.stem.conv1.weight"])},
        "bn1": _bn(sd, "backbone.stem.conv1.norm"),
    }
    for stage, n in (("res2", n2), ("res3", n3), ("res4", n4)):
        backbone[stage] = {
            f"block{i}": _block(sd, f"backbone.{stage}.{i}")
            for i in range(n)}

    roi_head: Dict = {
        "res5": {"res5": {
            f"block{i}": _block(sd, f"roi_heads.res5.{i}")
            for i in range(n5)}},
        "cls_score": {
            "kernel": np.asarray(sd["roi_heads.box_predictor.cls_score"
                                    ".weight"], np.float32).T,
            "bias": np.asarray(sd["roi_heads.box_predictor.cls_score.bias"],
                               np.float32)},
        "bbox_pred": {
            "kernel": np.asarray(sd["roi_heads.box_predictor.bbox_pred"
                                    ".weight"], np.float32).T,
            "bias": np.asarray(sd["roi_heads.box_predictor.bbox_pred.bias"],
                               np.float32)},
    }
    # attribute head (present in *_with_attributes checkpoints)
    attr_map = {
        "cls_embed": ("roi_heads.box_predictor.cls_embedding.weight",
                      "embedding"),
        "attr_fc": ("roi_heads.box_predictor.attr_linear1", None),
        "attr_score": ("roi_heads.box_predictor.attr_linear2", None),
    }
    for ours, (theirs, kind) in attr_map.items():
        if kind == "embedding" and theirs in sd:
            roi_head[ours] = {"embedding": np.asarray(sd[theirs], np.float32)}
        elif theirs + ".weight" in sd:
            roi_head[ours] = {
                "kernel": np.asarray(sd[theirs + ".weight"], np.float32).T,
                "bias": np.asarray(sd[theirs + ".bias"], np.float32)}

    rpn = {
        "conv": {"kernel": _conv(sd["proposal_generator.rpn_head.conv"
                                    ".weight"]),
                 "bias": np.asarray(sd["proposal_generator.rpn_head.conv"
                                       ".bias"], np.float32)},
        "objectness": {
            "kernel": _conv(sd["proposal_generator.rpn_head"
                               ".objectness_logits.weight"]),
            "bias": np.asarray(sd["proposal_generator.rpn_head"
                                  ".objectness_logits.bias"], np.float32)},
        "anchor_deltas": {
            "kernel": _conv(sd["proposal_generator.rpn_head.anchor_deltas"
                               ".weight"]),
            "bias": np.asarray(sd["proposal_generator.rpn_head"
                                  ".anchor_deltas.bias"], np.float32)},
    }
    missing = [k for k in ("cls_embed", "attr_fc", "attr_score")
               if k not in roi_head]
    if missing:
        logger.warning("Checkpoint lacks attribute head pieces %s — "
                       "attribute outputs stay random-init.", missing)
    return {"backbone": backbone, "rpn": rpn, "roi_head": roi_head}
