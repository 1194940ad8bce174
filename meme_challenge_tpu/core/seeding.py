"""Seed discipline.

The reference seeds torch/cuda/numpy/python and forces cuDNN determinism
(utils/utils.py:100-107). TPU-native split: *host* stochastic decisions
(crossval splits, confounder sampler order, ensemble search, MLM/ITM masking)
stay in python/numpy RNG with the reference's exact seed usage so artifacts
are reproducible; *device* stochasticity (dropout) uses explicit JAX PRNG keys
derived from the same seed.
"""
from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int) -> None:
    """Seed python + numpy global RNGs (reference utils/utils.py:100-107)."""
    np.random.seed(seed)
    random.seed(seed)


def fold_seed(seed: int, fold_idx: int) -> int:
    """Per-fold reseed, reference utils/crossval.py:174 (seed + fold_idx)."""
    return seed + fold_idx


def prng_key(seed: int) -> jax.Array:
    """Root device PRNG key for a run."""
    return jax.random.PRNGKey(seed)
