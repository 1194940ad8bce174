"""Ensemble-search wall-clock: device-batched vs reference-style host loop.

The reference scores every candidate sequentially with sklearn
(utils/ensemble.py:180-272: 10k brute-force + 512×100 EA AUROC evals); the
TPU build batches whole populations into vmapped device calls
(ops/device_metrics.py). This records both at the production scale
F=15 folds, N≈900 predictions (BASELINE.md row).
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from meme_challenge_tpu.ensemble.ensemble import (
    brute_force_finder,
    ea_ensemble_finder,
)

F, N = 15, 900


def make_preds(rng):
    logits = rng.randn(F, N) * 1.5
    labels = (rng.rand(N) < 0.5).astype(np.int64)
    # give folds varying signal so the search has something to find
    for f in range(F):
        strength = 0.5 + 2.0 * f / F
        logits[f] += strength * (labels * 2 - 1) * rng.rand(N)
    preds = 1 / (1 + np.exp(-logits))
    return preds, labels


def host_reference_search(preds, labels, n_brute=10000, pop=512, gens=100):
    """Equivalent-work host loop: sklearn AUROC per candidate, sequential
    (the reference's evaluation pattern; candidate generation trimmed to the
    same count — scoring dominates)."""
    from sklearn.metrics import roc_auc_score

    rng = np.random.RandomState(0)
    t0 = time.perf_counter()
    evals = 0
    # brute-force sample
    for _ in range(n_brute):
        w = rng.choice([0.0, 0.5, 1.0, 2.0], size=F)
        if w.sum() == 0:
            continue
        mix = (preds * w[:, None]).sum(0) / w.sum()
        roc_auc_score(labels, mix)
        evals += 1
    # EA generations: DEAP eaMuPlusLambda evaluates λ=pop offspring per
    # generation (reference utils/ensemble.py:235-272)
    for _ in range(gens):
        for _ in range(pop):
            w = rng.rand(F) * 2
            mix = (preds * w[:, None]).sum(0) / w.sum()
            roc_auc_score(labels, mix)
            evals += 1
    return time.perf_counter() - t0, evals


def device_search(preds, labels, ea_impl="host"):
    from meme_challenge_tpu.ensemble.ensemble import ea_ensemble_finder_device
    from meme_challenge_tpu.ops.device_metrics import auroc_batched

    indiv = np.asarray(auroc_batched(jnp.asarray(preds, jnp.float32),
                                     jnp.asarray(labels)))
    finder = (ea_ensemble_finder_device if ea_impl == "device"
              else ea_ensemble_finder)
    t0 = time.perf_counter()
    bf_score, bf_cfg = brute_force_finder(preds, labels, num_weights=F)
    ea_score, ea_cfg = finder(preds, labels, num_weights=F,
                              individual_scores=list(indiv),
                              num_generations=100)
    best = float(max(bf_score, ea_score))  # sync
    return time.perf_counter() - t0, best


def main():
    rng = np.random.RandomState(3)
    preds, labels = make_preds(rng)

    # warm the jit caches once so the comparison is steady-state
    device_search(preds[:, :128], labels[:128])
    dev_s, best = device_search(preds, labels)
    # full-EA-in-one-scan variant: time INCLUDING its compile (the cost a
    # first crossval run pays), then the steady-state rerun
    dev2_first, best2 = device_search(preds, labels, ea_impl="device")
    dev2_s, _ = device_search(preds, labels, ea_impl="device")
    host_s, host_evals = host_reference_search(preds, labels)

    print(json.dumps({
        "metric": "ensemble_search_walltime_F15_N900",
        "device_batched_sec": round(dev_s, 2),
        "device_scan_ea_sec": round(dev2_s, 2),
        "device_scan_ea_incl_compile_sec": round(dev2_first, 2),
        "host_sequential_sklearn_sec": round(host_s, 2),
        "speedup": round(host_s / dev_s, 1),
        "host_evals": host_evals,
        "device_best_auroc": round(best, 4),
        "device_scan_best_auroc": round(best2, 4),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
