"""Ensemble mixing parity vs the reference utils/ensemble.py executed
in-test (numpy-only functions; metrics deps stubbed)."""
import importlib.util
import sys
import types

import numpy as np
import pytest

from meme_challenge_tpu.ensemble.ensemble import create_ensemble_prediction


@pytest.fixture(scope="module")
def ref_ensemble():
    # reference imports data.metrics (for functions we don't exercise here)
    # and optionally DEAP; stub both so the module loads standalone
    fake_metrics = types.ModuleType("data.metrics")
    fake_metrics.aucroc = lambda *a, **k: 0.0
    fake_metrics.find_optimal_threshold = lambda *a, **k: 0.5
    fake_data = types.ModuleType("data")
    fake_data.metrics = fake_metrics
    sys.modules.setdefault("data", fake_data)
    sys.modules.setdefault("data.metrics", fake_metrics)
    spec = importlib.util.spec_from_file_location(
        "ref_ensemble", "/root/reference/utils/ensemble.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("on_logits", [False, True])
def test_create_ensemble_prediction_parity(ref_ensemble, rng, on_logits):
    for trial in range(5):
        F, N = 5, 40
        preds = rng.rand(F, N)
        # missing entries (-1) like align_ids produces
        preds[rng.rand(F, N) < 0.2] = -1.0
        weights = rng.choice([0.0, 0.5, 1.0, 2.0], size=F)
        if weights.sum() == 0:
            weights[0] = 1.0
        ours = create_ensemble_prediction(preds.copy(), list(weights),
                                          on_logits=on_logits)
        theirs = ref_ensemble.create_ensemble_prediction(
            preds.copy(), list(weights), on_logits=on_logits)
        np.testing.assert_allclose(ours, theirs, atol=2e-6)


def test_all_weights_zero_gives_half(ref_ensemble):
    preds = np.array([[0.9, 0.1], [0.2, 0.8]])
    ours = create_ensemble_prediction(preds.copy(), [0.0, 0.0])
    theirs = ref_ensemble.create_ensemble_prediction(preds.copy(),
                                                     [0.0, 0.0])
    np.testing.assert_allclose(ours, theirs)
    assert (ours == 0.5).all()
