"""Batched greedy NMS on device.

The extraction box-selection rule (reference utils/extract_utils.py:59-80)
runs per-class NMS over all 1600 foreground classes for every image. The
reference does this as 1600 sequential CUDA ``nms`` calls; round-1 of this
build mirrored that shape with 1600 host C++ calls (~1.5 s/img of pure call
overhead). Here the whole thing is ONE device program:

- the proposals are class-agnostic, so the [R, R] IoU matrix is computed
  once and shared by every class;
- per class, exact greedy NMS (stable descending-score order, suppress at
  IoU > thresh — bit-matching native/bua_ops.cpp:31-68) runs as a
  ``fori_loop`` over sorted positions on a class-chunked IoU tensor;
- classes are processed in chunks under ``lax.scan`` so the permuted IoU
  tensor stays ~[chunk, R, R] (≈46 MB at chunk=128, R=300) instead of the
  full [1600, R, R].

Shapes are padded to a fixed R so one compiled program serves every image.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def pairwise_iou(boxes: Array) -> Array:
    """Self-IoU, Caffe-NMS conventions (no +1 area, zero-union → 0) —
    delegates to the shared primitive (ops/iou.py)."""
    from meme_challenge_tpu.ops.iou import pairwise_iou as _iou

    return _iou(boxes, zero_union="zero")


def _chunk_keep(iou: Array, scores_chunk: Array, thresh: float) -> Array:
    """Greedy NMS for a chunk of classes. scores_chunk [K, R] → keep [K, R]
    (original box order)."""
    K, R = scores_chunk.shape
    order = jnp.argsort(-scores_chunk, axis=1, stable=True)      # [K, R]
    iou_sorted = iou[order[:, :, None], order[:, None, :]]       # [K, R, R]

    def body(i, state):
        suppressed, keep_sorted = state                          # [K, R]
        kept_i = ~suppressed[:, i]                               # [K]
        keep_sorted = keep_sorted.at[:, i].set(kept_i)
        later = jnp.arange(R)[None, :] > i
        suppressed = suppressed | (
            kept_i[:, None] & later & (iou_sorted[:, i, :] > thresh))
        return suppressed, keep_sorted

    _, keep_sorted = jax.lax.fori_loop(
        0, R, body,
        (jnp.zeros((K, R), bool), jnp.zeros((K, R), bool)))
    # scatter back: keep[k, order[k, i]] = keep_sorted[k, i]
    keep = jnp.zeros((K, R), bool)
    keep = keep.at[jnp.arange(K)[:, None], order].set(keep_sorted)
    return keep


@functools.partial(jax.jit, static_argnames=("thresh", "class_chunk"))
def batched_max_conf(boxes: Array, cls_prob: Array, *, thresh: float,
                     class_chunk: int = 128) -> Array:
    """Per-box max confidence surviving per-class NMS.

    boxes [R, 4]; cls_prob [R, C] with background at column 0 (skipped —
    reference extract_utils.py:68-74). Returns max_conf [R].
    """
    R, C = cls_prob.shape
    iou = pairwise_iou(boxes)
    scores = cls_prob[:, 1:].T                                   # [C-1, R]
    n_cls = scores.shape[0]
    pad = (-n_cls) % class_chunk
    scores = jnp.pad(scores, ((0, pad), (0, 0)))
    chunks = scores.reshape(-1, class_chunk, R)

    def scan_body(best, chunk_scores):
        keep = _chunk_keep(iou, chunk_scores, thresh)
        best = jnp.maximum(best,
                           jnp.max(jnp.where(keep, chunk_scores, 0.0),
                                   axis=0))
        return best, None

    best, _ = jax.lax.scan(scan_body, jnp.zeros((R,), cls_prob.dtype),
                           chunks)
    return best


# fixed padded sizes so each (R_pad, C) pair compiles once per process
_R_PAD = 304


def max_conf_device(boxes: np.ndarray, cls_prob: np.ndarray,
                    thresh: float) -> np.ndarray:
    """Host wrapper: pad R to a fixed bucket, run on device, slice back.

    Zero-padded rows have zero area (IoU 0 with everything) and zero score,
    so they never suppress a real box and contribute 0 confidence; stable
    ordering keeps them after every real box of equal (zero) score.
    """
    R = boxes.shape[0]
    r_pad = int(np.ceil(max(R, 1) / _R_PAD) * _R_PAD)
    b = np.zeros((r_pad, 4), np.float32)
    b[:R] = boxes
    p = np.zeros((r_pad, cls_prob.shape[1]), np.float32)
    p[:R] = cls_prob
    out = np.asarray(batched_max_conf(jnp.asarray(b), jnp.asarray(p),
                                      thresh=float(thresh)))
    return out[:R]
