"""Jittable JAX versions of the extraction ops.

The C++ ops in extract/native.py are the host/reference implementations
(matching the reference's native surface); these are the XLA-compilable
equivalents used inside the jitted detector: fixed-size NMS via
``lax.fori_loop`` masking, vectorized bilinear ROIAlign. Parity with the
native ops is enforced in tests/test_extract_ops.py.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@partial(jax.jit, static_argnames=("max_out",))
def nms_jax(boxes: Array, scores: Array, iou_threshold: float,
            max_out: int = 100) -> Tuple[Array, Array]:
    """Greedy NMS with static output size.

    Returns (keep_idx [max_out], keep_mask [max_out]): indices of kept boxes
    in descending-score order, padded with −1.
    """
    from meme_challenge_tpu.ops.iou import pairwise_iou

    n = boxes.shape[0]

    def iou_row(i):
        # one row at a time — the full [n, n] matrix would be prohibitive at
        # proposal counts; the shared primitive keeps the eps convention
        return pairwise_iou(jax.lax.dynamic_slice_in_dim(boxes, i, 1),
                            boxes, zero_union="eps")[0]

    def body(k, state):
        alive, keep_idx, keep_mask = state
        masked_scores = jnp.where(alive, scores, -jnp.inf)
        i = jnp.argmax(masked_scores)
        valid = masked_scores[i] > -jnp.inf
        keep_idx = keep_idx.at[k].set(jnp.where(valid, i, -1))
        keep_mask = keep_mask.at[k].set(valid)
        suppress = iou_row(i) > iou_threshold
        alive = alive & ~suppress & valid
        alive = alive.at[i].set(False)
        return alive, keep_idx, keep_mask

    state = (jnp.ones(n, bool), jnp.full(max_out, -1, jnp.int32),
             jnp.zeros(max_out, bool))
    _, keep_idx, keep_mask = jax.lax.fori_loop(
        0, min(max_out, n), body, state)
    return keep_idx, keep_mask


def _bilinear_sample(plane: Array, ys: Array, xs: Array) -> Array:
    """Bilinear sampling with the detectron2 border rules."""
    H, W = plane.shape
    out_of_range = (ys < -1.0) | (ys > H) | (xs < -1.0) | (xs > W)
    y = jnp.clip(ys, 0.0, None)
    x = jnp.clip(xs, 0.0, None)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 1)
    y = jnp.where(y0 >= H - 1, jnp.float32(H - 1), y)
    x = jnp.where(x0 >= W - 1, jnp.float32(W - 1), x)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    ly = y - y0
    lx = x - x0
    hy, hx = 1.0 - ly, 1.0 - lx
    v = (hy * hx * plane[y0, x0] + hy * lx * plane[y0, x1]
         + ly * hx * plane[y1, x0] + ly * lx * plane[y1, x1])
    return jnp.where(out_of_range, 0.0, v)


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio",
                                   "aligned"))
def roi_align_jax(feat: Array, rois: Array, spatial_scale: float,
                  output_size: Tuple[int, int], sampling_ratio: int = 2,
                  aligned: bool = True) -> Array:
    """ROIAlign forward, vectorized. feat [C,H,W], rois [R,4] → [R,C,ph,pw].

    ``sampling_ratio`` must be static/positive under jit (the adaptive mode
    of the native op is data-dependent; 2 matches detectron2 defaults
    closely for typical box sizes).
    """
    ph, pw = output_size
    offset = 0.5 if aligned else 0.0
    sr = max(int(sampling_ratio), 1)

    def one_roi(roi):
        x1 = roi[0] * spatial_scale - offset
        y1 = roi[1] * spatial_scale - offset
        x2 = roi[2] * spatial_scale - offset
        y2 = roi[3] * spatial_scale - offset
        roi_w = x2 - x1
        roi_h = y2 - y1
        if not aligned:
            roi_w = jnp.maximum(roi_w, 1.0)
            roi_h = jnp.maximum(roi_h, 1.0)
        bin_h = roi_h / ph
        bin_w = roi_w / pw
        # sample grid [ph*sr] x [pw*sr]: y = y1 + py·bin_h + (iy+0.5)·bin_h/sr
        iy = jnp.arange(sr, dtype=jnp.float32) + 0.5
        py = jnp.arange(ph, dtype=jnp.float32)
        ys = (y1 + py[:, None] * bin_h + (iy[None, :] * bin_h / sr)
              ).reshape(-1)
        ix = jnp.arange(sr, dtype=jnp.float32) + 0.5
        px = jnp.arange(pw, dtype=jnp.float32)
        xs = (x1 + px[:, None] * bin_w + (ix[None, :] * bin_w / sr)
              ).reshape(-1)
        grid_y = jnp.repeat(ys, xs.shape[0]).reshape(
            ys.shape[0], xs.shape[0])
        grid_x = jnp.tile(xs, (ys.shape[0], 1))

        def per_channel(plane):
            vals = _bilinear_sample(plane, grid_y, grid_x)
            vals = vals.reshape(ph, sr, pw, sr)
            return vals.mean(axis=(1, 3))

        return jax.vmap(per_channel)(feat)

    return jax.vmap(one_roi)(rois)


@partial(jax.jit, static_argnames=("output_size",))
def _roi_pool_kernel(feat: Array, x1: Array, y1: Array, bin_h: Array,
                     bin_w: Array, output_size: Tuple[int, int]) -> Array:
    """Masked two-stage max over precomputed integer bin anchors + fp32 bin
    sizes. Bin-edge products (py·bin_h) are single fp32 multiplies — safe
    under XLA fastmath; the division lives on the host (see roi_pool_device:
    XLA rewrites x/y into x·(1/y), which flips ceil() at exact-integer
    boundaries and would diverge from the C++ op)."""
    H, W, C = feat.shape
    ph, pw = output_size
    py = jnp.arange(ph, dtype=jnp.float32)
    px = jnp.arange(pw, dtype=jnp.float32)
    hs = jnp.clip(y1[:, None] + jnp.floor(
        py[None] * bin_h[:, None]).astype(jnp.int32), 0, H)   # [R, ph]
    he = jnp.clip(y1[:, None] + jnp.ceil(
        (py[None] + 1) * bin_h[:, None]).astype(jnp.int32), 0, H)
    ws = jnp.clip(x1[:, None] + jnp.floor(
        px[None] * bin_w[:, None]).astype(jnp.int32), 0, W)   # [R, pw]
    we = jnp.clip(x1[:, None] + jnp.ceil(
        (px[None] + 1) * bin_w[:, None]).astype(jnp.int32), 0, W)

    ys = jnp.arange(H)
    xs = jnp.arange(W)
    mask_y = (ys[None, None] >= hs[..., None]) & \
        (ys[None, None] < he[..., None])                      # [R, ph, H]
    mask_x = (xs[None, None] >= ws[..., None]) & \
        (xs[None, None] < we[..., None])                      # [R, pw, W]

    neg = jnp.float32(-jnp.inf)
    # rows: [R, ph, H, 1, 1] mask over feat [H, W, C] → [R, ph, W, C]
    colmax = jnp.max(
        jnp.where(mask_y[:, :, :, None, None], feat[None, None], neg),
        axis=2)
    # cols: [R, 1, pw, W, 1] mask over colmax [R, ph, W, C] → [R, ph, pw, C]
    out = jnp.max(
        jnp.where(mask_x[:, None, :, :, None], colmax[:, :, None], neg),
        axis=3)
    empty = (hs >= he)[:, :, None] | (ws >= we)[:, None, :]   # [R, ph, pw]
    return jnp.where(empty[..., None], 0.0, out)


def roi_bin_quantize(rois, spatial_scale: float,
                     output_size: Tuple[int, int]):
    """Caffe ROIPool bin quantization in exact HOST fp32.

    Round-half-away box quantization, +1 box size, and the fp32 bin-size
    division of native/bua_ops.cpp:139-174 — kept in numpy because XLA
    fastmath rewrites ``x / y`` to ``x * (1/y)``, which flips ``ceil()`` at
    integer bin boundaries. The single definition shared by
    :func:`roi_pool_device` and the detector's streamed ROI stage
    (detector.py ``_finish``).

    Returns ``(x1, y1, bin_h, bin_w)`` numpy arrays.
    """
    import numpy as np

    ph, pw = output_size
    rois = np.asarray(rois, np.float32)
    q = np.floor(rois * np.float32(spatial_scale) + np.float32(0.5)
                 ).astype(np.int32)
    x1, y1 = q[:, 0], q[:, 1]
    roi_w = np.maximum(q[:, 2] - x1 + 1, 1).astype(np.float32)
    roi_h = np.maximum(q[:, 3] - y1 + 1, 1).astype(np.float32)
    return x1, y1, roi_h / np.float32(ph), roi_w / np.float32(pw)


def roi_pool_device(feat: Array, rois, spatial_scale: float,
                    output_size: Tuple[int, int]) -> Array:
    """Caffe ROIPool, exact native/bua_ops.cpp:139-174 semantics; the max
    pooling runs on device (feat never round-trips to the host).

    feat [H, W, C] device array; rois [R, 4] HOST numpy (the proposal stage
    is host-side anyway); bin quantization via :func:`roi_bin_quantize`.
    """
    x1, y1, bin_h, bin_w = roi_bin_quantize(rois, spatial_scale, output_size)
    return _roi_pool_kernel(feat, jnp.asarray(x1), jnp.asarray(y1),
                            jnp.asarray(bin_h), jnp.asarray(bin_w),
                            output_size)
