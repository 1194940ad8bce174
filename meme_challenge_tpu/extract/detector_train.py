"""Detector training: anchor/proposal matching and the Faster R-CNN losses.

Capability parity with the reference's detector training path
(bottom-up-attention.pytorch/train_net.py via detectron2 DefaultTrainer):
RPN objectness + box-regression losses over matched anchors, ROI-head
classification + box-regression (+ attribute) losses over sampled
proposals, with the config's sampling hyperparameters
(RPN.BATCH_SIZE_PER_IMAGE 64, ROI_HEADS.BATCH_SIZE_PER_IMAGE 64,
POSITIVE_FRACTION 0.5, configs/bua-caffe/*.yaml).

TPU-native: matching/sampling are static-shape jnp ops (top-k over fixed
budgets instead of dynamic index sets), so the whole train step jits.
The multi-GPU NCCL ``launch`` path maps to `parallel.mesh` data-parallel
sharding — no separate code needed.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def pairwise_iou(boxes1: Array, boxes2: Array) -> Array:
    """IoU matrix [N, M] (detectron2 semantics: no +1, eps-guarded union) —
    delegates to the shared primitive (ops/iou.py)."""
    from meme_challenge_tpu.ops.iou import pairwise_iou as _iou

    return _iou(boxes1, boxes2, zero_union="eps")


def encode_boxes(anchors: Array, targets: Array,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> Array:
    """Inverse of decode_boxes: gt boxes → regression deltas."""
    wx, wy, ww, wh = weights
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = anchors[:, 0] + 0.5 * aw
    acy = anchors[:, 1] + 0.5 * ah
    tw = targets[:, 2] - targets[:, 0]
    th = targets[:, 3] - targets[:, 1]
    tcx = targets[:, 0] + 0.5 * tw
    tcy = targets[:, 1] + 0.5 * th
    return jnp.stack([
        wx * (tcx - acx) / jnp.maximum(aw, 1e-6),
        wy * (tcy - acy) / jnp.maximum(ah, 1e-6),
        ww * jnp.log(jnp.maximum(tw, 1e-6) / jnp.maximum(aw, 1e-6)),
        wh * jnp.log(jnp.maximum(th, 1e-6) / jnp.maximum(ah, 1e-6)),
    ], axis=1)


def match_anchors(anchors: Array, gt_boxes: Array, gt_mask: Array,
                  pos_iou: float = 0.7, neg_iou: float = 0.3
                  ) -> Tuple[Array, Array]:
    """RPN anchor matching (detectron2 Matcher + low-quality matches).

    Returns (labels [N] ∈ {1 pos, 0 neg, −1 ignore}, matched_gt_idx [N]).
    ``gt_mask`` flags valid rows of the (padded, static-size) gt array.
    """
    iou = pairwise_iou(anchors, gt_boxes)          # [N, G]
    iou = jnp.where(gt_mask[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    labels = jnp.where(best_iou >= pos_iou, 1,
                       jnp.where(best_iou < neg_iou, 0, -1))
    # low-quality matches: each gt's best anchor becomes positive
    best_anchor_per_gt = jnp.max(iou, axis=0)      # [G]
    is_best = (iou == best_anchor_per_gt[None, :]) & gt_mask[None, :] \
        & (best_anchor_per_gt[None, :] > 0)
    labels = jnp.where(is_best.any(axis=1), 1, labels)
    return labels, best_gt


def subsample_labels(labels: Array, rng: Array, batch_size: int = 64,
                     positive_fraction: float = 0.5) -> Array:
    """Static-size sampling of pos/neg anchors (detectron2
    subsample_labels): returns per-anchor weights {0,1} with at most
    ``batch_size`` ones, ~positive_fraction positive."""
    rnd = jax.random.uniform(rng, labels.shape)
    num_pos = int(batch_size * positive_fraction)
    pos_score = jnp.where(labels == 1, rnd, -1.0)
    neg_score = jnp.where(labels == 0, rnd, -1.0)
    pos_thresh = -jnp.sort(-pos_score)[num_pos - 1]
    chosen_pos = (labels == 1) & (pos_score >= jnp.maximum(pos_thresh, 0.0))
    n_pos = jnp.minimum(jnp.sum(labels == 1), num_pos)
    num_neg = batch_size - n_pos
    neg_sorted = -jnp.sort(-neg_score)
    neg_thresh = neg_sorted[jnp.clip(num_neg - 1, 0, labels.shape[0] - 1)]
    chosen_neg = (labels == 0) & (neg_score >= jnp.maximum(neg_thresh, 0.0))
    return (chosen_pos | chosen_neg).astype(jnp.float32)


def smooth_l1(x: Array, beta: float = 1.0 / 9) -> Array:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * x * x / beta, ax - 0.5 * beta)


def rpn_losses(
    anchors: Array, objectness: Array, deltas: Array,
    gt_boxes: Array, gt_mask: Array, rng: Array,
    batch_size: int = 64, positive_fraction: float = 0.5,
) -> Dict[str, Array]:
    """RPN objectness BCE + box smooth-L1 over sampled anchors."""
    labels, matched = match_anchors(anchors, gt_boxes, gt_mask)
    weights = subsample_labels(labels, rng, batch_size, positive_fraction)
    targets = encode_boxes(anchors, gt_boxes[matched])
    pos = (labels == 1).astype(jnp.float32) * weights
    y = (labels == 1).astype(jnp.float32)
    obj_loss = optree_bce(objectness, y, weights)
    box_loss = jnp.sum(
        smooth_l1(deltas - targets).sum(-1) * pos) / jnp.maximum(
            jnp.sum(weights), 1.0)
    return {"rpn_objectness": obj_loss, "rpn_box": box_loss}


def optree_bce(logits: Array, targets: Array, weights: Array) -> Array:
    log_p = jax.nn.log_sigmoid(logits)
    log_np = jax.nn.log_sigmoid(-logits)
    per = -(targets * log_p + (1 - targets) * log_np)
    return jnp.sum(per * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def roi_losses(
    proposals: Array, cls_logits: Array, bbox_deltas: Array,
    attr_logits: Array,
    gt_boxes: Array, gt_classes: Array, gt_attrs: Array, gt_mask: Array,
    rng: Array, batch_size: int = 64, positive_fraction: float = 0.5,
    fg_iou: float = 0.5,
) -> Dict[str, Array]:
    """ROI-head losses: softmax CE over 1601 classes (background = 0 for
    unmatched), per-class box smooth-L1 on foreground, attribute CE on
    foreground with attribute annotations."""
    iou = pairwise_iou(proposals, gt_boxes)
    iou = jnp.where(gt_mask[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    fg = best_iou >= fg_iou
    # vg_data emits 0-BASED foreground classes; the 1601-way head reserves
    # column 0 for background, so shift by +1 to match how extraction/eval
    # decode predictions (cls_prob[:, 1:].argmax -> class k-1)
    labels = jnp.where(fg, gt_classes[best_gt] + 1, 0)   # background 0
    match_labels = jnp.where(fg, 1, 0)
    weights = subsample_labels(match_labels, rng, batch_size,
                               positive_fraction)
    # classification
    logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), -1)
    cls_loss = -jnp.sum(
        jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0] * weights
    ) / jnp.maximum(jnp.sum(weights), 1.0)
    # per-class box regression on fg
    n, c4 = bbox_deltas.shape
    deltas_by_class = bbox_deltas.reshape(n, c4 // 4, 4)
    picked = jnp.take_along_axis(
        deltas_by_class, labels[:, None, None].repeat(4, -1), axis=1)[:, 0]
    targets = encode_boxes(proposals, gt_boxes[best_gt])
    fg_w = fg.astype(jnp.float32) * weights
    box_loss = jnp.sum(smooth_l1(picked - targets).sum(-1) * fg_w
                       ) / jnp.maximum(jnp.sum(weights), 1.0)
    # attributes on fg with annotations (gt_attrs −1 = none). Same +1
    # shift: the 401-way head reserves column 0 for "no attribute" and the
    # decoders read attr_prob[:, 1:].argmax -> attribute j-1
    attr_target = gt_attrs[best_gt]
    has_attr = (attr_target >= 0) & fg
    safe_attr = jnp.where(has_attr, attr_target + 1, 0)
    alogp = jax.nn.log_softmax(attr_logits.astype(jnp.float32), -1)
    attr_w = has_attr.astype(jnp.float32) * weights
    attr_loss = -jnp.sum(
        jnp.take_along_axis(alogp, safe_attr[:, None], axis=1)[:, 0]
        * attr_w) / jnp.maximum(jnp.sum(attr_w), 1.0)
    return {"roi_cls": cls_loss, "roi_box": box_loss,
            "roi_attr": attr_loss}


def make_detector_train_step(model, cfg, tx, num_proposals: int = 64,
                             jitter: float = 0.1):
    """Full jittable detector train step: backbone+RPN losses + ROI-head
    losses + optimizer update.

    TPU-native simplifications (documented):
    - ROI-head training proposals are the (padded, static-count) ground-truth
      boxes plus jittered copies, instead of NMS-filtered RPN proposals — the
      standard static-shape approximation (detectron2 also appends gt to the
      sampled proposals); the RPN still trains on its own losses.
    - ROI pooling inside the step uses the jittable roi_align
      (extract/ops.py) rather than the host ROIPool op.

    batch: {"images" [1,H,W,3], "gt_boxes" [G,4], "gt_classes" [G],
            "gt_attrs" [G] (−1 = none), "gt_mask" [G] bool}
    Returns train_step(state, batch, rng) → (state, loss_dict).
    """
    import optax

    from meme_challenge_tpu.extract.detector import (
        BUADetector,
        decode_boxes,
        make_anchors,
    )
    from meme_challenge_tpu.extract.ops import roi_align_jax
    from meme_challenge_tpu.train.steps import TrainState

    A = len(cfg.anchor_scales) * len(cfg.anchor_ratios)

    def loss_fn(params, batch, rng):
        images = batch["images"]
        feat, logits, deltas = model.apply(
            {"params": params}, images, method=BUADetector.backbone_rpn)
        fh, fw = feat.shape[1], feat.shape[2]
        anchors = jnp.asarray(make_anchors(cfg, fh, fw))
        fg_logit = (logits[0, :, :, A:] - logits[0, :, :, :A]).reshape(-1)
        flat_deltas = deltas[0].reshape(fh, fw, A, 4).reshape(-1, 4)
        r_rpn, r_roi, r_jit = jax.random.split(rng, 3)
        losses = rpn_losses(anchors, fg_logit, flat_deltas,
                            batch["gt_boxes"], batch["gt_mask"], r_rpn)

        # static proposal set: gt ⊕ jittered gt, cycled over the VALID gt
        # rows only — tiling the padded array would make every padding row
        # a degenerate [0,0,0,0] proposal that dominates background
        # sampling (valid-first stable order, index modulo n_valid)
        order = jnp.argsort(~batch["gt_mask"], stable=True)
        n_valid = jnp.maximum(jnp.sum(batch["gt_mask"]), 1)
        sel = order[jnp.arange(num_proposals) % n_valid]
        base = batch["gt_boxes"][sel]
        wh = jnp.stack([base[:, 2] - base[:, 0],
                        base[:, 3] - base[:, 1]], axis=1)
        noise = jax.random.uniform(r_jit, (num_proposals, 4),
                                   minval=-jitter, maxval=jitter)
        proposals = base + noise * jnp.concatenate([wh, wh], axis=1)
        pooled = roi_align_jax(
            jnp.transpose(feat[0], (2, 0, 1)), proposals,
            1.0 / cfg.anchor_base,
            (cfg.pooler_resolution, cfg.pooler_resolution))
        pooled = jnp.transpose(pooled, (0, 2, 3, 1))
        out = model.apply({"params": params}, pooled,
                          method=BUADetector.roi_forward)
        attr_logits_raw = jnp.log(jnp.clip(out["attr_prob"], 1e-9, 1.0))
        losses.update(roi_losses(
            proposals, jnp.log(jnp.clip(out["cls_prob"], 1e-9, 1.0)),
            out["bbox_deltas"], attr_logits_raw,
            batch["gt_boxes"], batch["gt_classes"], batch["gt_attrs"],
            batch["gt_mask"], r_roi))
        total = sum(losses.values())
        return total, losses

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, batch, rng):
        (_, losses), grads = grad_fn(state.params, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_opt, state.step + 1), losses

    return jax.jit(train_step, donate_argnums=(0,))
