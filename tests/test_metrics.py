"""Metrics parity vs sklearn and the reference's documented semantics
(reference data/metrics.py; see SURVEY.md §4 test strategy)."""
import numpy as np
import pytest
from sklearn.metrics import (
    accuracy_score,
    f1_score,
    precision_score,
    recall_score,
    roc_auc_score,
)

from meme_challenge_tpu.core.metrics import (
    aucroc,
    find_optimal_threshold,
    standard_metrics,
    standard_metrics_binary,
)


def _random_case(rng, n=257):
    probs = rng.rand(n)
    labels = (probs + 0.35 * rng.randn(n) > 0.5).astype(np.int64)
    if labels.min() == labels.max():  # ensure both classes
        labels[0] = 1 - labels[0]
    return probs, labels


def test_binary_metrics_match_sklearn(rng):
    probs, labels = _random_case(rng)
    m = standard_metrics(probs, labels)
    preds = (probs > 0.5).astype(np.int64)
    assert m["accuracy"] == pytest.approx(accuracy_score(labels, preds))
    assert m["precision"] == pytest.approx(
        precision_score(labels, preds, zero_division=0), abs=1e-6)
    assert m["recall"] == pytest.approx(
        recall_score(labels, preds, zero_division=0), abs=1e-6)
    assert m["F1"] == pytest.approx(f1_score(labels, preds), abs=1e-6)
    assert m["aucroc"] == pytest.approx(
        roc_auc_score(labels, probs, average="macro"), abs=1e-12)


def test_aucroc_with_ties_matches_sklearn(rng):
    # heavy ties exercise the average-rank path
    probs = rng.randint(0, 5, size=400) / 5.0 + 0.1
    labels = rng.randint(0, 2, size=400)
    labels[0], labels[1] = 0, 1
    assert aucroc(probs, labels) == pytest.approx(
        roc_auc_score(labels, probs), abs=1e-12)


def test_aucroc_single_class_returns_zero():
    probs = np.array([0.2, 0.7, 0.9])
    labels = np.array([1, 1, 1])
    assert aucroc(probs, labels) == 0.0


def test_optimal_threshold_midpoint_rule():
    # argmax interior -> midpoint with the NEXT candidate threshold
    # (reference data/metrics.py:113-126)
    probs = np.array([0.1, 0.2, 0.6, 0.8])
    labels = np.array([0, 0, 1, 1])
    t = find_optimal_threshold(probs, labels, metric="accuracy")
    # perfect separation between 0.2 and 0.6: candidates [0,.1,.2,.6,.8,1],
    # first perfect accuracy at threshold 0.2, midpoint with 0.6 -> 0.4
    assert t == pytest.approx(0.4)
    m = standard_metrics_binary(probs, labels, threshold=t, add_aucroc=False)
    assert m["accuracy"] == 1.0


def test_optimal_threshold_beats_default(rng):
    probs, labels = _random_case(rng, n=101)
    t = find_optimal_threshold(probs, labels, metric="accuracy")
    acc_opt = standard_metrics_binary(probs, labels, t, add_aucroc=False)["accuracy"]
    acc_def = standard_metrics_binary(probs, labels, 0.5, add_aucroc=False)["accuracy"]
    assert acc_opt >= acc_def


def test_optimal_threshold_exhaustive_parity(rng):
    """Vectorized sweep == naive per-threshold loop (the reference algorithm)."""
    probs, labels = _random_case(rng, n=83)
    t_fast = find_optimal_threshold(probs, labels, metric="F1")
    # naive reimplementation of the reference loop
    cands = np.concatenate([[0.0], np.sort(probs), [1.0]])
    scores = [standard_metrics_binary(probs, labels, c, add_aucroc=False)["F1"]
              for c in cands]
    argmax = int(np.argmax(scores))
    if argmax not in (0, len(cands) - 1):
        t_ref = (cands[argmax] + cands[argmax + 1]) / 2
    else:
        t_ref = cands[argmax]
    assert t_fast == pytest.approx(t_ref, abs=1e-12)


def test_multiclass_dispatch(rng):
    probs = rng.rand(50, 4)
    probs /= probs.sum(axis=1, keepdims=True)
    labels = rng.randint(0, 4, size=50)
    m = standard_metrics(probs, labels)
    assert m["aucroc"] == -1.0
    assert 0.0 <= m["accuracy"] <= 1.0
    preds = probs.argmax(axis=1)
    assert m["accuracy"] == pytest.approx((preds == labels).mean())
    # NOTE: the reference's multiclass TFPN counts FN as
    # (pred != class) & (pred != label) — NOT sklearn's per-class FN — so we
    # check against that formula (reference data/metrics.py:59-80,:83-95),
    # not against sklearn macro recall.
    recalls = []
    for c in range(4):
        tp = float(np.sum((preds == c) & (preds == labels)))
        fn = float(np.sum((preds != c) & (preds != labels)))
        recalls.append(tp / max(tp + fn, 1e-4))
    assert m["recall"] == pytest.approx(sum(recalls) / len(recalls), abs=1e-9)


def test_device_auroc_matches_sklearn(rng):
    """ops/device_metrics.auroc (the vmapped ensemble objective) is exactly
    sklearn's trapezoidal AUROC, ties included."""
    import jax.numpy as jnp

    from meme_challenge_tpu.ops.device_metrics import auroc as dev_auroc
    from meme_challenge_tpu.ops.device_metrics import auroc_batched

    probs = rng.randint(0, 7, size=300) / 7.0  # heavy ties
    labels = rng.randint(0, 2, size=300)
    labels[0], labels[1] = 0, 1
    expect = roc_auc_score(labels, probs)
    got = float(dev_auroc(jnp.asarray(probs, jnp.float32),
                          jnp.asarray(labels)))
    assert got == pytest.approx(expect, abs=1e-6)
    # batched path agrees with itself and sklearn
    pop = np.stack([probs, probs[::-1].copy(), 1 - probs])
    batch = np.asarray(auroc_batched(jnp.asarray(pop, jnp.float32),
                                     jnp.asarray(labels)))
    for row, p in zip(batch, pop):
        assert row == pytest.approx(roc_auc_score(labels, p), abs=1e-6)
