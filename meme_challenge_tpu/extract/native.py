"""ctypes bindings for the native extraction ops (NMS, ROIAlign, ROIPool).

The reference's ``models.bua._C`` torch extension (setup.py:14-61) becomes a
plain C shared library (native/bua_ops.cpp) loaded via ctypes — this image
has no pybind11, and the ops are host-side anyway (the detector's TPU
compute path is JAX; see extract/ops.py for the jittable fallbacks).

The library is built on demand with g++ if the .so is missing.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger("meme_challenge_tpu.extract.native")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbua_ops.so")

_lib: Optional[ctypes.CDLL] = None


def build_library(force: bool = False) -> str:
    """Compile native/bua_ops.cpp → libbua_ops.so (idempotent)."""
    src = os.path.join(_NATIVE_DIR, "bua_ops.cpp")
    if force or not os.path.isfile(_LIB_PATH) or (
            os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)):
        logger.info("Building native ops library...")
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
             "-o", _LIB_PATH],
            check=True, capture_output=True)
    return _LIB_PATH


def _get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        build_library()
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.nms_f32.restype = ctypes.c_int
        lib.nms_f32.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float,
                                i32p]
        lib.nms_max_conf_f32.restype = None
        lib.nms_max_conf_f32.argtypes = [f32p, f32p, ctypes.c_int,
                                         ctypes.c_int, ctypes.c_float, f32p]
        lib.roi_align_f32.restype = None
        lib.roi_align_f32.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, ctypes.c_int, ctypes.c_float,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p]
        lib.roi_pool_f32.restype = None
        lib.roi_pool_f32.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, ctypes.c_int, ctypes.c_float,
            ctypes.c_int, ctypes.c_int, f32p]
        _lib = lib
    return _lib


def nms(boxes: np.ndarray, scores: np.ndarray,
        iou_threshold: float) -> np.ndarray:
    """Greedy NMS; returns kept indices in descending-score order
    (the ``models.bua.layers.nms.nms`` API, reference
    utils/extract_utils.py:6,71)."""
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    scores = np.ascontiguousarray(scores, dtype=np.float32)
    n = boxes.shape[0]
    if n == 0:
        return np.zeros((0,), dtype=np.int64)
    keep = np.zeros(n, dtype=np.int32)
    count = _get_lib().nms_f32(boxes, scores, n, float(iou_threshold), keep)
    return keep[:count].astype(np.int64)


def roi_align(feat: np.ndarray, rois: np.ndarray, spatial_scale: float,
              output_size: Tuple[int, int], sampling_ratio: int = 0,
              aligned: bool = True) -> np.ndarray:
    """ROIAlign forward. feat [C,H,W], rois [R,4] → [R,C,ph,pw]."""
    feat = np.ascontiguousarray(feat, dtype=np.float32)
    rois = np.ascontiguousarray(rois, dtype=np.float32)
    C, H, W = feat.shape
    R = rois.shape[0]
    ph, pw = output_size
    out = np.zeros((R, C, ph, pw), dtype=np.float32)
    if R:
        _get_lib().roi_align_f32(feat, C, H, W, rois, R,
                                 float(spatial_scale), ph, pw,
                                 int(sampling_ratio), int(aligned), out)
    return out


def roi_pool(feat: np.ndarray, rois: np.ndarray, spatial_scale: float,
             output_size: Tuple[int, int]) -> np.ndarray:
    """ROIPool (max) forward, Caffe semantics. feat [C,H,W] → [R,C,ph,pw]."""
    feat = np.ascontiguousarray(feat, dtype=np.float32)
    rois = np.ascontiguousarray(rois, dtype=np.float32)
    C, H, W = feat.shape
    R = rois.shape[0]
    ph, pw = output_size
    out = np.zeros((R, C, ph, pw), dtype=np.float32)
    if R:
        _get_lib().roi_pool_f32(feat, C, H, W, rois, R,
                                float(spatial_scale), ph, pw, out)
    return out


def nms_max_conf(boxes: np.ndarray, cls_prob: np.ndarray,
                 iou_threshold: float) -> np.ndarray:
    """Per-box max confidence surviving per-class NMS, all classes in one
    native call (reference utils/extract_utils.py:68-74 semantics; IoU
    matrix shared across classes)."""
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    cls_prob = np.ascontiguousarray(cls_prob, dtype=np.float32)
    n, num_classes = cls_prob.shape
    out = np.zeros(n, dtype=np.float32)
    if n:
        _get_lib().nms_max_conf_f32(boxes, cls_prob, n, num_classes,
                                    float(iou_threshold), out)
    return out
