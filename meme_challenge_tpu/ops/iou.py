"""The single home of the pairwise box-IoU primitive.

Three subsystems need IoU with subtly different zero-union conventions, and
bit-equality with the reference is the parity target of one of them
(per-class selection NMS, reference utils/extract_utils.py:68-80 /
native/bua_ops.cpp:31-68). One definition with an explicit convention
parameter keeps them from drifting:

- ``zero_union="zero"``: IoU forced to exactly 0.0 where the union is 0
  (degenerate boxes). Bit-matches the native NMS path, where a zero-area
  padded box must suppress nothing and be suppressed by nothing.
- ``zero_union="eps"``: ``inter / (union + 1e-12)`` — the detectron2
  matcher/NMS convention (zero-area boxes still get IoU 0 through zero
  intersection; the epsilon only guards the division).

Area convention is always the modern no-+1 one (Caffe extract NMS and
detectron2 agree here).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def box_area(boxes: Array) -> Array:
    """[N] areas of xyxy boxes, negative extents clamped to 0."""
    return (jnp.maximum(0.0, boxes[:, 2] - boxes[:, 0])
            * jnp.maximum(0.0, boxes[:, 3] - boxes[:, 1]))


def pairwise_iou(boxes1: Array, boxes2: Optional[Array] = None, *,
                 zero_union: str = "zero", eps: float = 1e-12) -> Array:
    """IoU matrix [N, M] for xyxy boxes (M = N when ``boxes2`` is None).

    ``zero_union`` picks the degenerate-union convention (module docstring).
    """
    if boxes2 is None:
        boxes2 = boxes1
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.maximum(0.0, rb - lt)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    if zero_union == "zero":
        return jnp.where(union > 0, inter / union, 0.0)
    if zero_union == "eps":
        return inter / (union + eps)
    raise ValueError(f"unknown zero_union convention: {zero_union!r}")
