"""Detector training/eval CLI — the reference ``train_net.py`` equivalent.

The reference drives detectron2's DefaultTrainer over NCCL ``launch``
(bottom-up-attention.pytorch/train_net.py:53-81) with a VG dataset and
VGEvaluator. TPU-native version: VG COCO-format annotations through
``extract/vg_data.py``, the jittable full train step
(``extract/detector_train.make_detector_train_step``: RPN + ROI + attribute
losses, one compiled program), checkpoint/resume via the shared flax
ModelSaver, and ``--eval-only`` running detection + ``vg_eval`` mAP@0.5 /
weighted mAP (the VGEvaluator numbers, subrepo README.md:182-186).

Multi-chip: data parallelism over images is a ``jax.sharding`` concern —
each process feeds its own image stream (``initialize_distributed`` +
per-host sharding), no NCCL-style plumbing here.

Usage:
  python -m meme_challenge_tpu.extract.train_detector \
      --train-json datasets/vg/annotations/train.json \
      --val-json datasets/vg/annotations/val.json \
      --image-root datasets/vg/images --out-dir ./detector_ckpt \
      [--eval-only --weights detector.msgpack]
"""
from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np

import jax
import optax

from meme_challenge_tpu.extract.detector import (
    BUADetector,
    DetectorConfig,
    FeatureExtractor,
    init_detector_params,
)
from meme_challenge_tpu.extract.detector_train import make_detector_train_step
from meme_challenge_tpu.extract.vg_data import VGDetectionLoader, load_vg_json
from meme_challenge_tpu.extract.vg_eval import evaluate_detections
from meme_challenge_tpu.train.checkpoint import ModelSaver
from meme_challenge_tpu.train.steps import TrainState

logger = logging.getLogger("meme_challenge_tpu.extract.train_detector")


def load_weights(weights_path: str, cfg: DetectorConfig, seed: int = 0):
    """Load detector params from a torch ``.pth``/``.pt`` (Caffe-converted,
    via the key-layout converter) or a flax ``.msgpack`` checkpoint — the
    single source of truth for both ``train`` and ``--eval-only``."""
    params = init_detector_params(cfg, jax.random.PRNGKey(seed))
    if not weights_path:
        return params
    if weights_path.endswith((".pth", ".pt")):
        from meme_challenge_tpu.extract.convert_detector import (
            detector_params_from_torch,
        )

        return detector_params_from_torch(weights_path, cfg)
    return ModelSaver(weights_path).load(params)


def evaluate(cfg: DetectorConfig, params, records, image_reader=None,
             max_images: int = 0, extractor: FeatureExtractor = None):
    """Run detection (mode 2: boxes + class scores) and score with the
    VGEvaluator-parity metrics.

    Pass ``extractor`` to reuse compiled programs across calls (per-epoch
    eval would otherwise pay a full backbone recompile each time). The
    extractor's params are swapped to ``params`` only for the duration of
    the call and restored on exit, so a caller-owned extractor is not left
    holding the last-evaluated params."""
    if extractor is None:
        extractor = FeatureExtractor(cfg, params)
    ex = extractor
    prev_params = ex.params
    ex.params = params
    try:
        loader = VGDetectionLoader(records, cfg, is_train=False,
                                   image_reader=image_reader)
        preds, gts = [], []
        for i, rec in enumerate(records):
            if max_images and i >= max_images:
                break
            img = loader.image_reader(rec)
            out = ex.extract(img, mode=2)
            cls_prob = out["cls_prob"]
            labels = cls_prob[:, 1:].argmax(axis=1)    # 0-based foreground
            scores = cls_prob[np.arange(len(labels)), labels + 1]
            preds.append({"image_id": rec["image_id"], "boxes": out["bbox"],
                          "scores": scores, "labels": labels})
            gts.append({"image_id": rec["image_id"], "boxes": rec["boxes"],
                        "classes": rec["classes"]})
        return evaluate_detections(preds, gts,
                                   num_classes=cfg.num_classes - 1)
    finally:
        ex.params = prev_params


def train(args, cfg: DetectorConfig, records, val_records,
          image_reader=None):
    model = BUADetector(cfg)
    saver = ModelSaver(os.path.join(args.out_dir, "detector.msgpack"))
    params = load_weights(args.weights, cfg, seed=args.seed)
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.sgd(args.lr, momentum=0.9))
    state = TrainState(params, tx.init(params), np.int32(0))
    step = make_detector_train_step(model, cfg, tx,
                                    num_proposals=args.num_proposals)
    loader = VGDetectionLoader(records, cfg, max_gt=args.max_gt,
                               is_train=True, seed=args.seed,
                               image_reader=image_reader)
    root = jax.random.PRNGKey(args.seed)
    eval_ex = FeatureExtractor(cfg, state.params) if val_records else None
    it = 0
    t0 = time.time()
    for epoch in range(1, args.epochs + 1):
        for batch in loader:
            batch = {k: v for k, v in batch.items() if k != "image_id"}
            state, losses = step(state, batch, jax.random.fold_in(root, it))
            it += 1
            if it % args.log_every == 0:
                logger.info("iter %d losses %s (%.1fs)", it,
                            {k: round(float(v), 4)
                             for k, v in losses.items()},
                            time.time() - t0)
        saver.save(state.params)
        if val_records:
            metrics = evaluate(cfg, state.params, val_records,
                               image_reader=image_reader,
                               max_images=args.eval_images,
                               extractor=eval_ex)
            logger.info("epoch %d: mAP@0.5 %.4f weighted %.4f", epoch,
                        metrics["mAP"], metrics["weighted_mAP"])
    return state


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-json", type=str, default="")
    ap.add_argument("--val-json", type=str, default="")
    ap.add_argument("--image-root", type=str, required=True)
    ap.add_argument("--out-dir", type=str, default="./detector_ckpt")
    ap.add_argument("--weights", type=str, default="",
                    help="torch .pth (Caffe-converted) or flax .msgpack")
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-gt", type=int, default=64)
    ap.add_argument("--num-proposals", type=int, default=64)
    ap.add_argument("--log-every", type=int, default=20)
    ap.add_argument("--eval-images", type=int, default=0,
                    help="cap eval to N images (0 = all)")
    ap.add_argument("--depth", type=int, default=101, choices=(101, 152))
    args = ap.parse_args(argv)

    cfg = DetectorConfig(depth=args.depth)
    os.makedirs(args.out_dir, exist_ok=True)
    val_records = (load_vg_json(args.val_json, args.image_root)
                   if args.val_json else [])
    if args.eval_only:
        assert args.weights, "--eval-only needs --weights"
        params = load_weights(args.weights, cfg, seed=args.seed)
        metrics = evaluate(cfg, params, val_records,
                           max_images=args.eval_images)
        logger.info("eval: %s", {k: v for k, v in metrics.items()
                                 if k != "per_class_ap"})
        return metrics
    records = load_vg_json(args.train_json, args.image_root)
    train(args, cfg, records, val_records)


if __name__ == "__main__":
    logging.basicConfig(
        format="%(asctime)s %(levelname)s %(name)s | %(message)s",
        datefmt="%d/%m/%Y %I:%M:%S %p", level=logging.INFO)
    main()
