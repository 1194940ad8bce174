"""Phase-level timing of FeatureExtractor.extract on the real TPU.

Finds where the 0.8 s/img goes: blob prep, backbone+RPN dispatch+fetch,
host proposal NMS, ROI stage dispatch+fetch, host postprocess NMS.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from meme_challenge_tpu.extract.detector import (
    DetectorConfig, FeatureExtractor, init_detector_params, get_image_blob)


def main():
    cfg = DetectorConfig()
    rng = np.random.RandomState(0)
    params = init_detector_params(cfg, jax.random.PRNGKey(0))
    ex = FeatureExtractor(cfg, params)
    imgs = [(rng.rand(600, 800, 3) * 255).astype(np.uint8) for _ in range(6)]
    ex.extract_batch(imgs[:2])  # warm/compile

    # per-phase timing, sequential (no lookahead) for attribution
    for it in range(3):
        img = imgs[2 + it]
        t0 = time.perf_counter()
        blob, scale, (im_h, im_w) = get_image_blob(img, cfg)
        t1 = time.perf_counter()
        token = jnp.zeros((), jnp.float32)
        feat, logits, deltas, token = ex._backbone_rpn_chained(
            ex.params, blob, token)
        logits_h = np.asarray(logits)
        deltas_h = np.asarray(deltas)
        t2 = time.perf_counter()
        proposals = ex._proposals(logits_h, deltas_h, im_h, im_w)
        t3 = time.perf_counter()
        R = proposals.shape[0]
        r_pad = max(ex._ROI_BUCKET,
                    int(np.ceil(R / ex._ROI_BUCKET) * ex._ROI_BUCKET))
        rois_pad = np.zeros((r_pad, 4), np.float32)
        rois_pad[:R] = proposals
        ss = np.float32(1.0 / cfg.anchor_base)
        q = np.floor(rois_pad * ss + np.float32(0.5)).astype(np.int32)
        x1, y1 = q[:, 0], q[:, 1]
        roi_w = np.maximum(q[:, 2] - x1 + 1, 1).astype(np.float32)
        roi_h = np.maximum(q[:, 3] - y1 + 1, 1).astype(np.float32)
        res = np.float32(cfg.pooler_resolution)
        dev_out = ex._roi_stage(ex.params, feat, jnp.asarray(x1),
                                jnp.asarray(y1), jnp.asarray(roi_h / res),
                                jnp.asarray(roi_w / res))
        t4 = time.perf_counter()
        out = {k: np.asarray(dev_out[k])[:R]
               for k in ("features", "cls_prob", "attr_prob")}
        t5 = time.perf_counter()
        final = ex._postprocess(img, out, proposals, scale, im_h, im_w, 1)
        t6 = time.perf_counter()
        print(f"iter{it}: blob {1e3*(t1-t0):6.1f}  bb+fetch_rpn "
              f"{1e3*(t2-t1):6.1f}  proposals(host) {1e3*(t3-t2):6.1f}  "
              f"roi_dispatch {1e3*(t4-t3):6.1f}  roi_fetch {1e3*(t5-t4):6.1f}"
              f"  postprocess {1e3*(t6-t5):6.1f}  TOTAL {1e3*(t6-t0):6.1f} ms"
              f"  (R={R}, r_pad={r_pad}, boxes={final['num_bbox']})")

    # end-to-end comparison with the shipped streaming path
    t0 = time.perf_counter()
    ex.extract_batch(imgs)
    print(f"extract_batch: {(time.perf_counter()-t0)/len(imgs)*1000:.0f} "
          "ms/img")


if __name__ == "__main__":
    main()
