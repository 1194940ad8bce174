"""BUA Faster R-CNN detector: RPN, ROI heads, and the extraction pipeline.

Parity target: the reference's ``GeneralizedBUARCNN`` inference path
(bottom-up-attention.pytorch, configs/bua-caffe/extract-bua-caffe-r101.yaml):

- **BUA RPN** (StandardBUARPNHead): 3×3 conv (512 ch) → objectness +
  box deltas over 12 anchors (scales [4, 8, 16, 32] × stride 16, ratios
  [0.5, 1, 2]); proposal selection pre-NMS topk 6000 → NMS 0.7 → topk 300,
  min size 16 (PROPOSAL_GENERATOR.MIN_SIZE).
- **BUACaffeRes5ROIHeads**: ROIPool 14×14 on res4 → res5 (dilation 2) →
  global average pool (2048-d region features) → 1601-way classifier +
  class-agnostic-ish bbox regression + 401-way attribute head.
- **Extraction post-processing** (reference utils/extract_utils.py:59-110):
  per-class NMS (IoU 0.3) over the 1600 foreground classes, per-box max
  confidence, conf-threshold ∩ [MIN_BOXES=10, MAX_BOXES=100] box budget,
  npz export {x, bbox, num_bbox, image_h/w, info{objects_id, objects_conf,
  attrs_id, attrs_conf}}.
- **Modes** (reference extract_features.py:100-129): 1 = ROI features,
  2 = bboxes only, 3 = features from given (gt) bboxes.

Image preprocessing is Caffe-style: BGR, per-channel mean subtraction
(PIXEL_MEAN [102.9801, 115.9465, 122.7717]), shortest side 600 / longest
1000 (utils/extract_utils.py:28-57).

The heavy compute (backbone, res5, heads) is jitted JAX; proposal NMS and
the per-class extraction NMS run through the native C++ ops (host) —
matching the reference's native-op surface — with JAX fallbacks available
in extract/ops.py.
"""
from __future__ import annotations

import dataclasses
import logging
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from meme_challenge_tpu.extract import native
from meme_challenge_tpu.extract.resnet import CaffeResNetBackbone, Res5Head

logger = logging.getLogger("meme_challenge_tpu.extract")

Array = jax.Array

PIXEL_MEAN_BGR = np.array([102.9801, 115.9465, 122.7717], np.float32)


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    depth: int = 101
    anchor_scales: Tuple[int, ...] = (4, 8, 16, 32)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_base: int = 16                 # feature stride
    rpn_channels: int = 512
    pre_nms_topk: int = 6000
    post_nms_topk: int = 300
    rpn_nms_thresh: float = 0.7
    rpn_min_size: float = 16.0
    num_classes: int = 1601               # incl. background at index 0
    num_attributes: int = 401
    pooler_resolution: int = 14
    test_nms_thresh: float = 0.3
    min_boxes: int = 10
    max_boxes: int = 100
    conf_thresh: float = 0.2
    min_size: int = 600
    max_size: int = 1000
    size_divisibility: int = 64   # pad blobs to multiples -> few XLA shapes
    # host->device blob transfer dtype. "bfloat16" halves upload bytes over
    # the relay (compute stays fp32 on device; only the input is quantized,
    # ~1e-3 relative feature error). "uint8" quarters them: the RESIZED
    # image is uploaded pre-mean-subtraction as uint8 and the mean-sub runs
    # on device (bilinear resize and the constant mean-shift commute, so
    # only the <=0.5/255 rounding differs). "float32" = bit-parity default.
    blob_transfer_dtype: str = "float32"


def make_anchors(cfg: DetectorConfig, feat_h: int, feat_w: int) -> np.ndarray:
    """Dense anchors [H*W*A, 4] in image coordinates (x1,y1,x2,y2).

    py-faster-rcnn/Caffe convention (the BUA checkpoints' anchors): cell
    anchors derive from the base box [0, 0, base−1, base−1], i.e. centered
    at (base−1)/2 = 7.5 for stride 16, then shifted by stride·(x, y)."""
    base = cfg.anchor_base
    ctr = (base - 1) / 2.0
    anchors = []
    for ratio in cfg.anchor_ratios:
        # ratio enumerated first (caffe generate_anchors order), rounded
        # like the original implementation
        size = base * base
        ws = np.round(np.sqrt(size / ratio))
        hs = np.round(ws * ratio)
        for scale in cfg.anchor_scales:
            w, h = ws * scale, hs * scale
            anchors.append([ctr - 0.5 * (w - 1), ctr - 0.5 * (h - 1),
                            ctr + 0.5 * (w - 1), ctr + 0.5 * (h - 1)])
    cell = np.asarray(anchors, np.float32)                 # [A, 4]
    ys = (np.arange(feat_h, dtype=np.float32)) * base
    xs = (np.arange(feat_w, dtype=np.float32)) * base
    shift_x, shift_y = np.meshgrid(xs, ys)
    shifts = np.stack([shift_x, shift_y, shift_x, shift_y],
                      axis=-1).reshape(-1, 1, 4)
    return (shifts + cell[None]).reshape(-1, 4)


def decode_boxes(anchors: Array, deltas: Array,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> Array:
    """Faster R-CNN box decoding (BBOX_REG_WEIGHTS (1,1,1,1))."""
    wx, wy, ww, wh = weights
    widths = anchors[:, 2] - anchors[:, 0]
    heights = anchors[:, 3] - anchors[:, 1]
    cx = anchors[:, 0] + 0.5 * widths
    cy = anchors[:, 1] + 0.5 * heights
    dx, dy, dw, dh = (deltas[:, 0] / wx, deltas[:, 1] / wy,
                      deltas[:, 2] / ww, deltas[:, 3] / wh)
    dw = jnp.clip(dw, None, 4.135)  # log(1000/16): detectron2 clamp
    dh = jnp.clip(dh, None, 4.135)
    pcx = dx * widths + cx
    pcy = dy * heights + cy
    pw = jnp.exp(dw) * widths
    ph = jnp.exp(dh) * heights
    return jnp.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                      pcx + 0.5 * pw, pcy + 0.5 * ph], axis=1)


class BUARPNHead(nn.Module):
    """3×3 conv → objectness + deltas (StandardBUARPNHead, 512 channels).

    Caffe RPN convention: objectness is **2 channels per anchor**
    (background, foreground) scored by softmax over the pair — not a single
    sigmoid channel — matching the BUA checkpoints' ``2A``-channel conv."""

    cfg: DetectorConfig

    @nn.compact
    def __call__(self, feat: Array) -> Tuple[Array, Array]:
        A = len(self.cfg.anchor_scales) * len(self.cfg.anchor_ratios)
        t = jax.nn.relu(nn.Conv(self.cfg.rpn_channels, (3, 3), padding=1,
                                name="conv")(feat))
        logits = nn.Conv(2 * A, (1, 1), name="objectness")(t)
        deltas = nn.Conv(A * 4, (1, 1), name="anchor_deltas")(t)
        return logits, deltas


class BUAROIHead(nn.Module):
    """res5 + classification/regression/attribute outputs over pooled ROIs."""

    cfg: DetectorConfig

    def setup(self):
        c = self.cfg
        self.res5 = Res5Head(c.depth)
        self.cls_score = nn.Dense(c.num_classes, name="cls_score")
        self.bbox_pred = nn.Dense(c.num_classes * 4, name="bbox_pred")
        # BUA attribute head: class embedding ⊕ pooled feature → fc → attrs
        self.cls_embed = nn.Embed(c.num_classes, 256, name="cls_embed")
        self.attr_fc = nn.Dense(512, name="attr_fc")
        self.attr_score = nn.Dense(c.num_attributes, name="attr_score")

    def __call__(self, pooled: Array) -> Dict[str, Array]:
        """pooled: [R, ph, pw, 1024] (NHWC) → heads."""
        y = self.res5(pooled)
        feats = y.mean(axis=(1, 2))                     # [R, 2048]
        cls_logits = self.cls_score(feats)
        cls_prob = jax.nn.softmax(cls_logits, axis=-1)
        deltas = self.bbox_pred(feats)
        top_class = jnp.argmax(cls_prob[:, 1:], axis=-1) + 1
        attr_in = jnp.concatenate(
            [feats, self.cls_embed(top_class)], axis=-1)
        attr_logits = self.attr_score(jax.nn.relu(self.attr_fc(attr_in)))
        return {
            "features": feats,
            "cls_prob": cls_prob,
            "bbox_deltas": deltas,
            "attr_prob": jax.nn.softmax(attr_logits, axis=-1),
        }


class BUADetector(nn.Module):
    """Backbone + RPN head + ROI head parameter container."""

    cfg: DetectorConfig

    def setup(self):
        self.backbone = CaffeResNetBackbone(self.cfg.depth)
        self.rpn = BUARPNHead(self.cfg)
        self.roi_head = BUAROIHead(self.cfg)

    def backbone_rpn(self, images: Array):
        feat = self.backbone(images)
        logits, deltas = self.rpn(feat)
        return feat, logits, deltas

    def roi_forward(self, pooled: Array):
        return self.roi_head(pooled)


# --------------------------------------------------------------------- utils

def _resize_bilinear_np(im: np.ndarray, new_h: int, new_w: int) -> np.ndarray:
    """Host bilinear resize, cv2.INTER_LINEAR semantics: half-pixel sample
    centers, edge clamp, no antialiasing (reference utils/extract_utils.py:
    51-52 resizes the mean-subtracted float image the same way)."""
    h, w = im.shape[:2]
    if (new_h, new_w) == (h, w):
        return np.asarray(im, np.float32)
    ys = (np.arange(new_h, dtype=np.float64) + 0.5) * (h / new_h) - 0.5
    xs = (np.arange(new_w, dtype=np.float64) + 0.5) * (w / new_w) - 0.5
    y0f, x0f = np.floor(ys), np.floor(xs)
    wy = (ys - y0f).astype(np.float32)[:, None, None]
    wx = (xs - x0f).astype(np.float32)[None, :, None]
    y0 = np.clip(y0f, 0, h - 1).astype(np.int64)
    x0 = np.clip(x0f, 0, w - 1).astype(np.int64)
    y1 = np.clip(y0f + 1, 0, h - 1).astype(np.int64)
    x1 = np.clip(x0f + 1, 0, w - 1).astype(np.int64)
    im = np.asarray(im, np.float32)
    r0, r1 = im[y0], im[y1]
    top = r0[:, x0] * (1.0 - wx) + r0[:, x1] * wx
    bot = r1[:, x0] * (1.0 - wx) + r1[:, x1] * wx
    return top * (1.0 - wy) + bot * wy


def _blob_scale(img_shape, cfg: DetectorConfig) -> Tuple[float, int, int]:
    """Shortest side ``min_size`` capped at ``max_size`` (reference
    utils/extract_utils.py:28-57) — shared by every blob-transfer mode so
    the geometry can never desynchronize between them."""
    h, w = img_shape[:2]
    scale = cfg.min_size / min(h, w)
    if scale * max(h, w) > cfg.max_size:
        scale = cfg.max_size / max(h, w)
    return scale, int(round(h * scale)), int(round(w * scale))


def _pad_divisible(im: np.ndarray, cfg: DetectorConfig,
                   pad_values=(0, 0, 0)) -> np.ndarray:
    """Zero-/constant-pad up to ``size_divisibility`` multiples so a whole
    corpus compiles to a handful of XLA shapes (detectron2 pads the same
    way)."""
    div = max(cfg.size_divisibility, 1)
    pad_h = -im.shape[0] % div
    pad_w = -im.shape[1] % div
    if not (pad_h or pad_w):
        return im
    if pad_values == (0, 0, 0):
        return np.pad(im, ((0, pad_h), (0, pad_w), (0, 0)))
    return np.stack([np.pad(im[..., c], ((0, pad_h), (0, pad_w)),
                            constant_values=pad_values[c])
                     for c in range(3)], axis=-1)


def get_image_blob(img_bgr: np.ndarray, cfg: DetectorConfig
                   ) -> Tuple[np.ndarray, float, Tuple[int, int]]:
    """Caffe preprocessing: BGR float − pixel mean, shortest-side resize
    (:func:`_blob_scale`), divisibility padding (:func:`_pad_divisible`).
    Returns (blob [1, Hp, Wp, 3], scale, (true_h, true_w))."""
    im = img_bgr.astype(np.float32) - PIXEL_MEAN_BGR
    scale, new_h, new_w = _blob_scale(im.shape, cfg)
    # pure-host bilinear resize, cv2.INTER_LINEAR convention (half-pixel
    # centers, no antialias) — matches the reference's cv2.resize
    # (utils/extract_utils.py:51-52). NEVER route this through jax: the
    # default device is the remote TPU relay, and an unchained device
    # resize costs an ~11 MB round trip per image (measured seconds/img).
    im = _resize_bilinear_np(im, new_h, new_w)
    return _pad_divisible(im, cfg)[None], scale, (new_h, new_w)


def get_image_blob_u8(img_bgr: np.ndarray, cfg: DetectorConfig
                      ) -> Tuple[np.ndarray, float, Tuple[int, int]]:
    """uint8 transfer variant of :func:`get_image_blob`: resize the RAW
    image (no mean-sub), round to uint8; the device subtracts the pixel
    mean (see ``DetectorConfig.blob_transfer_dtype``). Same scale/padding
    helpers; differs from the fp32 blob only by the <=0.5 resize rounding.
    Padding uses the rounded pixel mean so it becomes ~0 after the
    on-device mean subtraction (fp32 blobs pad with exact zeros)."""
    scale, new_h, new_w = _blob_scale(img_bgr.shape, cfg)
    im = _resize_bilinear_np(img_bgr.astype(np.float32), new_h, new_w)
    im = np.clip(np.rint(im), 0, 255).astype(np.uint8)
    mean_u8 = tuple(int(round(m)) for m in PIXEL_MEAN_BGR)
    return _pad_divisible(im, cfg, mean_u8)[None], scale, (new_h, new_w)


def _decode_boxes_np(anchors: np.ndarray, deltas: np.ndarray,
                     weights=(1.0, 1.0, 1.0, 1.0)) -> np.ndarray:
    """Host copy of :func:`decode_boxes` — keeps the proposal stage free of
    device round trips (each unchained dispatch costs a relay RTT)."""
    wx, wy, ww, wh = weights
    widths = anchors[:, 2] - anchors[:, 0]
    heights = anchors[:, 3] - anchors[:, 1]
    cx = anchors[:, 0] + 0.5 * widths
    cy = anchors[:, 1] + 0.5 * heights
    dx, dy = deltas[:, 0] / wx, deltas[:, 1] / wy
    dw = np.minimum(deltas[:, 2] / ww, 4.135)
    dh = np.minimum(deltas[:, 3] / wh, 4.135)
    pcx = dx * widths + cx
    pcy = dy * heights + cy
    pw = np.exp(dw) * widths
    ph = np.exp(dh) * heights
    return np.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                     pcx + 0.5 * pw, pcy + 0.5 * ph], axis=1)


class FeatureExtractor:
    """End-to-end extraction driver (reference extract_features.py:41-130).

    Streaming design: ``extract_batch`` keeps several images in flight. All
    device dispatches are *dependency-chained* through a zero-valued token —
    the TPU relay only pipelines chained calls (an independent dispatch pays
    a full round trip, measured ~40-90 ms vs ~2 ms chained) — and the ROI
    stage is padded to fixed row buckets so every image shape reuses one
    compiled program.
    """

    def __init__(self, cfg: DetectorConfig, params,
                 nms_impl: str = "native_batched"):
        """``nms_impl``: strategy for the 1600-class selection NMS —
        "native_batched" (one C++ call, shared IoU matrix — fastest),
        "device" (ops/nms.py, one XLA program), or "host_loop" (per-class
        C++ calls, the reference's shape). All three are exact-equal."""
        self.cfg = cfg
        self.model = BUADetector(cfg)
        self.params = params
        self.nms_impl = nms_impl
        def _bb_chained(p, x, token):
            # blob may arrive bf16/uint8 (cfg.blob_transfer_dtype);
            # compute in fp32. uint8 blobs are pre-mean-subtraction.
            x = x.astype(jnp.float32)
            if jnp.dtype(self.cfg.blob_transfer_dtype) == jnp.uint8:
                x = x - jnp.asarray(PIXEL_MEAN_BGR, jnp.float32)
            feat, logits, deltas = self.model.apply(
                {"params": p}, x,
                method=BUADetector.backbone_rpn)
            feat = feat + token          # token is always 0.0: value no-op,
            out_token = feat[0, 0, 0, 0] * 0.0   # dependency edge for relay
            return feat, logits, deltas, out_token

        self._backbone_rpn_chained = jax.jit(_bb_chained)

        def _roi_stage(p, feat, x1, y1, bin_h, bin_w):
            # device ROIPool (exact Caffe bins, extract/ops.py) + ROI heads
            # in ONE dispatch; depends on `feat`, so it rides the same
            # dependency chain as the backbone calls
            from meme_challenge_tpu.extract.ops import _roi_pool_kernel

            pooled = _roi_pool_kernel(
                feat[0], x1, y1, bin_h, bin_w,
                (cfg.pooler_resolution, cfg.pooler_resolution))
            return self.model.apply({"params": p}, pooled,
                                    method=BUADetector.roi_forward)

        cfg = self.cfg
        self._roi_stage = jax.jit(_roi_stage)

    # -------------------------------------------------------------- proposals

    def _proposals(self, logits: np.ndarray, deltas: np.ndarray,
                   im_h: int, im_w: int) -> np.ndarray:
        cfg = self.cfg
        fh, fw = logits.shape[1], logits.shape[2]
        A = logits.shape[3] // 2
        anchors = make_anchors(cfg, fh, fw)
        # caffe channel layout: [A background | A foreground]; fg prob via
        # pairwise softmax — all host numpy: no extra device round trips
        bg = np.asarray(logits[0, :, :, :A], np.float64)
        fg = np.asarray(logits[0, :, :, A:], np.float64)
        z = (fg - bg).reshape(-1)
        scores = np.where(z >= 0, 1.0 / (1.0 + np.exp(-np.abs(z))),
                          np.exp(-np.abs(z)) / (1.0 + np.exp(-np.abs(z)))
                          ).astype(np.float32)
        deltas = np.asarray(deltas[0]).reshape(fh, fw, A, 4).reshape(-1, 4)
        boxes = _decode_boxes_np(anchors, deltas)
        boxes[:, 0::2] = boxes[:, 0::2].clip(0, im_w - 1)
        boxes[:, 1::2] = boxes[:, 1::2].clip(0, im_h - 1)
        scores = np.asarray(scores)
        # min-size filter (PROPOSAL_GENERATOR.MIN_SIZE 16)
        keep = ((boxes[:, 2] - boxes[:, 0] >= cfg.rpn_min_size)
                & (boxes[:, 3] - boxes[:, 1] >= cfg.rpn_min_size))
        boxes, scores = boxes[keep], scores[keep]
        order = np.argsort(-scores)[: cfg.pre_nms_topk]
        boxes, scores = boxes[order], scores[order]
        keep_idx = native.nms(boxes, scores, cfg.rpn_nms_thresh)
        keep_idx = keep_idx[: cfg.post_nms_topk]
        return boxes[keep_idx]

    # -------------------------------------------------------------- pipeline

    def extract(self, img_bgr: np.ndarray, mode: int = 1,
                gt_boxes: Optional[np.ndarray] = None) -> Dict[str, np.ndarray]:
        """mode 1 = features (+boxes), 2 = boxes only, 3 = features for
        ``gt_boxes`` (image coordinates)."""
        return self.extract_batch(
            [img_bgr], mode=mode,
            gt_boxes_list=None if gt_boxes is None else [gt_boxes])[0]

    def extract_batch(self, images, mode: int = 1, gt_boxes_list=None,
                      lookahead: int = 1):
        """Streaming multi-image extraction: up to ``lookahead`` backbone
        dispatches in flight while earlier images run their host stages
        (proposal NMS, ROIPool, box selection). Results match per-image
        ``extract`` exactly."""
        from collections import deque

        token = jnp.zeros((), jnp.float32)
        pending = deque()
        results = [None] * len(images)
        transfer_dt = jnp.dtype(self.cfg.blob_transfer_dtype)
        for i, img in enumerate(images):
            if transfer_dt == jnp.uint8:
                blob, scale, (im_h, im_w) = get_image_blob_u8(img, self.cfg)
            else:
                blob, scale, (im_h, im_w) = get_image_blob(img, self.cfg)
                if transfer_dt != jnp.float32:
                    blob = blob.astype(transfer_dt)  # host cast (ml_dtypes)
            feat, logits, deltas, token = self._backbone_rpn_chained(
                self.params, blob, token)
            gt = gt_boxes_list[i] if gt_boxes_list is not None else None
            pending.append((i, img, gt, feat, logits, deltas, scale,
                            (im_h, im_w)))
            while len(pending) > lookahead:
                j, out = self._finish(*pending.popleft(), mode=mode)
                results[j] = out
        while pending:
            j, out = self._finish(*pending.popleft(), mode=mode)
            results[j] = out
        return results

    # ROI row buckets: one compiled ROI program per bucket, not per count
    _ROI_BUCKET = 64

    def _finish(self, idx, img_bgr, gt_boxes, feat, logits, deltas, scale,
                im_hw, mode):
        cfg = self.cfg
        im_h, im_w = im_hw
        if mode == 3:
            assert gt_boxes is not None, "mode 3 needs gt bboxes"
            proposals = np.asarray(gt_boxes, np.float32) * scale
        else:
            proposals = self._proposals(np.asarray(logits),
                                        np.asarray(deltas), im_h, im_w)

        R = proposals.shape[0]
        r_pad = max(self._ROI_BUCKET,
                    int(np.ceil(R / self._ROI_BUCKET) * self._ROI_BUCKET))
        rois_pad = np.zeros((r_pad, 4), np.float32)
        rois_pad[:R] = proposals
        # bin quantization on the HOST in exact fp32 via the shared helper
        # (ops.roi_bin_quantize — XLA fastmath would flip ceil() at integer
        # boundaries); only multiplies run on device
        from meme_challenge_tpu.extract.ops import roi_bin_quantize

        x1, y1, bin_h, bin_w = roi_bin_quantize(
            rois_pad, 1.0 / cfg.anchor_base,
            (cfg.pooler_resolution, cfg.pooler_resolution))
        dev_out = self._roi_stage(self.params, feat, jnp.asarray(x1),
                                  jnp.asarray(y1), jnp.asarray(bin_h),
                                  jnp.asarray(bin_w))
        needed = (("cls_prob", "bbox_deltas") if mode == 2
                  else ("features", "cls_prob", "attr_prob"))
        out = {k: np.asarray(dev_out[k])[:R] for k in needed}
        return idx, self._postprocess(img_bgr, out, proposals, scale,
                                      im_h, im_w, mode)

    def _postprocess(self, img_bgr, out, proposals, scale, im_h, im_w,
                     mode):
        cfg = self.cfg

        boxes_img = proposals / scale                         # back to image
        if mode == 2:
            # save_bbox semantics (reference extract_utils.py:114-144):
            # second-stage per-class regressed boxes, each proposal reduced
            # to its argmax-foreground-class box, per-class NMS, then the
            # top MAX_BOXES by confidence (no threshold/min)
            cls_prob = out["cls_prob"]
            R, C = cls_prob.shape
            deltas_rc = out["bbox_deltas"].reshape(R, C, 4)
            all_boxes = _decode_boxes_np(
                np.repeat(proposals, C, axis=0),
                deltas_rc.reshape(R * C, 4)).reshape(R, C, 4)
            all_boxes[..., 0::2] = all_boxes[..., 0::2].clip(0, im_w - 1)
            all_boxes[..., 1::2] = all_boxes[..., 1::2].clip(0, im_h - 1)
            top_cls = cls_prob[:, 1:].argmax(axis=1) + 1
            cls_boxes = all_boxes[np.arange(R), top_cls] / scale
            max_conf = self._max_conf(cls_prob, cls_boxes)
            keep = np.argsort(-max_conf, kind="stable")[: cfg.max_boxes]
            return {"bbox": cls_boxes[keep], "cls_prob": cls_prob[keep]}
        sel = (np.arange(len(boxes_img)) if mode == 3
               else self._select_boxes(out["cls_prob"], boxes_img))
        cls_prob = out["cls_prob"][sel]
        attr_prob = out["attr_prob"][sel]
        objects = cls_prob[:, 1:].argmax(axis=1)
        return {
            "x": out["features"][sel],
            "bbox": boxes_img[sel],
            "num_bbox": len(sel) if np.ndim(sel) else len(boxes_img),
            "image_h": img_bgr.shape[0],
            "image_w": img_bgr.shape[1],
            "info": {
                "objects_id": objects,
                "objects_conf": cls_prob[np.arange(len(objects)),
                                         objects + 1],
                "attrs_id": attr_prob[:, 1:].argmax(axis=1),
                "attrs_conf": attr_prob[np.arange(len(attr_prob)),
                                        attr_prob[:, 1:].argmax(axis=1) + 1],
                "image_h": img_bgr.shape[0],
                "image_w": img_bgr.shape[1],
            },
        }

    def _max_conf(self, cls_prob: np.ndarray, boxes: np.ndarray) -> np.ndarray:
        """Per-box max confidence surviving per-class NMS (reference
        utils/extract_utils.py:68-74).

        The round-1 hot spot was 1600 per-class host NMS calls
        (~1.2 s/img of call overhead). Default: ONE native call that
        shares the IoU matrix across classes (~ms). All implementations
        are exact-greedy equal to native.nms (tested).
        """
        if self.nms_impl == "native_batched":
            return native.nms_max_conf(boxes, cls_prob,
                                       self.cfg.test_nms_thresh)
        if self.nms_impl == "device":
            from meme_challenge_tpu.ops.nms import max_conf_device

            return max_conf_device(boxes, cls_prob,
                                   self.cfg.test_nms_thresh)
        n = cls_prob.shape[0]
        max_conf = np.zeros(n, np.float32)
        for cls_idx in range(1, cls_prob.shape[1]):
            scores = cls_prob[:, cls_idx]
            keep = native.nms(boxes, scores, self.cfg.test_nms_thresh)
            max_conf[keep] = np.maximum(max_conf[keep], scores[keep])
        return max_conf

    def _select_boxes(self, cls_prob: np.ndarray,
                      boxes: np.ndarray) -> np.ndarray:
        """save_roi_features box selection (reference utils/extract_utils.py:
        76-80): boxes with max_conf >= CONF_THRESH in ORIGINAL proposal
        order; fall back to confidence-sorted top-MIN/-MAX only when the
        threshold set is out of the [min_boxes, max_boxes] budget."""
        cfg = self.cfg
        max_conf = self._max_conf(cls_prob, boxes)
        keep = np.nonzero(max_conf >= cfg.conf_thresh)[0]
        if len(keep) < cfg.min_boxes:
            keep = np.argsort(-max_conf, kind="stable")[: cfg.min_boxes]
        elif len(keep) > cfg.max_boxes:
            keep = np.argsort(-max_conf, kind="stable")[: cfg.max_boxes]
        return keep


def init_detector_params(cfg: DetectorConfig, rng,
                         image_hw: Tuple[int, int] = (64, 64)):
    """Random-init parameter tree (shape-complete, for tests and as the
    conversion target for the Caffe checkpoints)."""
    model = BUADetector(cfg)
    h, w = image_hw
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    params = model.init(rng, dummy, method=BUADetector.backbone_rpn)["params"]
    ph = cfg.pooler_resolution
    pooled = jnp.zeros((2, ph, ph, 1024), jnp.float32)
    roi_params = model.init(rng, pooled,
                            method=BUADetector.roi_forward)["params"]
    merged = dict(params)
    merged.update(roi_params)
    return merged
