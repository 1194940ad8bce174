"""Parameter initialization helper for UniterForPretraining."""
from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from meme_challenge_tpu.core.constants import IMG_LABEL_DIM
from meme_challenge_tpu.models.uniter import UniterForPretraining


def init_pretrain_params(model: UniterForPretraining, rng,
                         example_batch: Dict[str, np.ndarray],
                         img_label_dim: int = IMG_LABEL_DIM):
    """Initialize the FULL pretraining parameter tree.

    flax creates parameters lazily per executed code path, so init must
    traverse every head once; missing task-specific keys are synthesized
    from the example batch shapes.
    """
    batch = dict(example_batch)
    B, T = batch["input_ids"].shape
    R = batch["img_mask"].shape[1]
    D = batch["img_feat"].shape[-1]
    batch.setdefault("txt_labels", np.full((B, T), -1, dtype=np.int32))
    batch.setdefault("img_masks", np.zeros((B, R), dtype=np.int32))
    batch.setdefault("feat_targets", np.zeros((B, R, D), dtype=np.float32))
    batch.setdefault("targets", np.zeros((B,), dtype=np.int32))
    batch.setdefault("label_targets",
                     np.zeros((B, R, img_label_dim), dtype=np.float32))
    batch.setdefault("sample_mask", np.ones((B,), dtype=np.int32))
    return model.init(rng, batch, "init", deterministic=True)["params"]
