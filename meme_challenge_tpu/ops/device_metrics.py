"""Batched on-device metrics (jit/vmap-friendly).

TPU-native speedup for the ensemble weight search (SURVEY.md §2.3
"embarrassingly-parallel ensemble eval"): the reference evaluates ~60k
sklearn AUROC calls one by one on host (utils/ensemble.py:180-272); here a
whole candidate population is one vmapped device call.

``auroc_batched`` uses the tie-aware rank statistic (average ranks), which
equals sklearn's trapezoidal ``roc_auc_score`` exactly — the same algorithm
as core/metrics.py:_rank_auc, vectorized.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _ranks_1d(probs: Array) -> Array:
    """Average ranks (1-based) with tie handling, O(N log N).

    Tie runs are resolved with cumulative max/min over run boundaries
    instead of two ``searchsorted`` passes — on TPU the vmapped binary
    searches dominated the whole ensemble-search fitness kernel (104 of
    105 ms at K=512 N=900, r3 profile); the scan form is ~free next to the
    argsort. For a sorted array, ``start[i]`` = first index of i's tie run
    (prefix cummax of run-start indices) and ``end[i]`` = last index
    (suffix cummin of run-end indices); the average 1-based rank of the
    run is ``(start + end) / 2 + 1`` — exactly the
    ``(searchsorted_left + searchsorted_right + 1) / 2`` statistic.
    """
    n = probs.shape[0]
    order = jnp.argsort(probs)
    sorted_p = probs[order]
    idx = jnp.arange(n)
    is_run_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_p[1:] != sorted_p[:-1]])
    is_run_end = jnp.concatenate(
        [sorted_p[1:] != sorted_p[:-1], jnp.ones((1,), bool)])
    start = jax.lax.cummax(jnp.where(is_run_start, idx, 0))
    end = jax.lax.cummin(jnp.where(is_run_end, idx, n - 1), reverse=True)
    avg_sorted = (start + end) * 0.5 + 1.0
    ranks = jnp.zeros_like(avg_sorted).at[order].set(avg_sorted)
    return ranks


def auroc(probs: Array, labels: Array) -> Array:
    """Exact AUROC of one prediction vector (fp32, device)."""
    ranks = _ranks_1d(probs.astype(jnp.float32))
    labels = labels.astype(jnp.float32)
    n_pos = jnp.sum(labels)
    n_neg = labels.shape[0] - n_pos
    pos_rank_sum = jnp.sum(ranks * labels)
    return (pos_rank_sum - n_pos * (n_pos + 1) * 0.5) / (n_pos * n_neg)


auroc_batched = jax.jit(jax.vmap(auroc, in_axes=(0, None)))


def ensemble_prediction(predictions: Array, weights: Array,
                        on_logits: bool) -> Array:
    """Masked weighted mixing of fold predictions, device version.

    Parity: reference create_ensemble_prediction (utils/ensemble.py:157-177):
    −1 marks a missing prediction (excluded via mask, placeholder 0.5);
    logit-space mixing clips probabilities to [1e-8, 1].

    predictions: [F, N] probabilities with −1 for missing; weights: [F].
    """
    inv = predictions == -1
    preds = jnp.where(inv, 0.5, predictions)
    mask = 1.0 - inv.astype(jnp.float32)
    if on_logits:
        preds = (jnp.log(jnp.clip(preds, 1e-8, 1.0))
                 - jnp.log(jnp.clip(1.0 - preds, 1e-8, 1.0)))
    w = weights[:, None]
    w_per = jnp.sum(w * mask, axis=0)
    out = jnp.sum(w * preds * mask, axis=0) / jnp.clip(w_per, 1e-4, 1e5)
    out = jnp.where(w_per == 0.0, 0.5, out)
    if on_logits:
        out = jax.nn.sigmoid(out)
    return out


@jax.jit
def ensemble_scores(predictions: Array, weight_pop: Array, labels: Array,
                    ) -> Array:
    """AUROC of each candidate weight vector, both mixing spaces.

    predictions: [F, N]; weight_pop: [K, F]; labels: [N].
    Returns [2, K]: row 0 = logit-space scores, row 1 = prob-space.
    """
    def score(on_logits):
        mix = jax.vmap(
            lambda w: ensemble_prediction(predictions, w, on_logits))(
                weight_pop)
        return auroc_batched(mix, labels)

    return jnp.stack([score(True), score(False)])


@jax.jit
def ensemble_scores_logit(predictions: Array, weight_pop: Array,
                          labels: Array) -> Array:
    """Logit-space-only scoring [K] — the EA's fitness (it never evaluates
    the prob-space mix), at half the brute-force kernel's cost."""
    mix = jax.vmap(
        lambda w: ensemble_prediction(predictions, w, True))(weight_pop)
    return auroc_batched(mix, labels)
