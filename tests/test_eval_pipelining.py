"""Eval/export loops keep a deep window of dispatches in flight.

VERDICT round-3 weak-point #2: ``eval_folds`` / ``predict_folds`` /
``_predict_shared`` (and the sequential ``Trainer.eval_model`` /
``predict``) used to call ``np.asarray`` on every dispatch, serializing
host batch assembly against device compute — one relay RTT per batch.
These tests pin the pipelined structure: dispatches of a pass are
enqueued (dependency-chained through the zero token) ahead of the single
tail ``fetch_all`` host sync, results are unchanged, and — the round-4
review fix — the in-flight depth for host-batch loaders is BOUNDED by
``EVAL_INFLIGHT_WINDOW`` so pending feature batches cannot pin unbounded
HBM on large test sets.
"""
import os

import numpy as np
import pytest

import jax

import meme_challenge_tpu.parallel.fold_parallel as fp_mod
import meme_challenge_tpu.train.steps as steps_mod
import meme_challenge_tpu.train.trainer as trainer_mod
from meme_challenge_tpu.core.config import TrainConfig, UniterConfig
from meme_challenge_tpu.core.seeding import fold_seed, set_seed
from meme_challenge_tpu.data.meme_dataset import BatchLoader, MemeDataset
from meme_challenge_tpu.data.tokenizer import BertTokenizer
from meme_challenge_tpu.models.uniter import MemeUniter
from meme_challenge_tpu.parallel.fold_parallel import FoldParallelTrainer
from meme_challenge_tpu.train.trainer import Trainer
from meme_challenge_tpu.utils.synthetic import make_synthetic_dataset


@pytest.fixture()
def setup(tmp_path):
    synth = make_synthetic_dataset(str(tmp_path / "d"), n_train=32, n_dev=24,
                                   n_test=8, img_dim=32, label_signal=3.0)
    tok = BertTokenizer(synth["vocab"])
    ucfg = UniterConfig(vocab_size=tok.vocab_size, hidden_size=32,
                        num_hidden_layers=2, num_attention_heads=2,
                        intermediate_size=64, img_dim=32,
                        max_position_embeddings=32)
    model = MemeUniter(ucfg, n_classes=1)
    cfg = TrainConfig(
        data_path=synth["root"], feature_path=synth["feature_dir"],
        model_path=str(tmp_path / "ck"), model_save_name="pipe.ckpt",
        lr=3e-3, batch_size=8, max_epoch=1, patience=5, warmup_steps=2,
        gradient_accumulation=1, max_txt_len=12, max_bb=16, seed=43)
    kwargs = dict(feature_dir=synth["feature_dir"], tokenizer=tok,
                  max_txt_len=12, max_bb=16, img_dim=32)

    def loaders():
        train = BatchLoader(MemeDataset(
            os.path.join(synth["root"], "train.jsonl"), **kwargs), 8)
        val = BatchLoader(MemeDataset(
            os.path.join(synth["root"], "dev_seen.jsonl"), **kwargs), 8)
        return train, val

    return model, cfg, loaders


def _init_params(model, cfg, loader):
    example = dict(next(iter(loader)))
    example.pop("ids", None)
    return model.init(jax.random.PRNGKey(fold_seed(cfg.seed, 0)), example,
                      deterministic=True)["params"]


class _Spy:
    """Event log shared by the wrapped eval step and fetch_all."""

    def __init__(self):
        self.events = []

    def wrap_step(self, step):
        def wrapped(*args, **kwargs):
            self.events.append("dispatch")
            return step(*args, **kwargs)
        return wrapped

    def make_fetch(self, real_fetch):
        def fetch(pending):
            self.events.append(("fetch", len(pending)))
            return real_fetch(pending)
        return fetch

    def assert_single_late_fetch(self, expect_dispatches):
        dispatches = [e for e in self.events if e == "dispatch"]
        fetches = [e for e in self.events if e != "dispatch"]
        assert len(dispatches) == expect_dispatches, self.events
        assert len(fetches) == 1, self.events
        # the one fetch comes after EVERY dispatch and drains all of them
        assert self.events[-1] == ("fetch", expect_dispatches), self.events


def test_fold_parallel_eval_loops_fetch_once(setup, monkeypatch):
    """eval_folds, stacked predict_folds and the shared-loader broadcast
    export each enqueue every dispatch of the pass before the single
    fetch — and the results still match a fresh (unspied) pass."""
    model, cfg, loaders = setup
    F = 2
    set_seed(cfg.seed)
    train_l, val_l = loaders()
    params = _init_params(model, cfg, val_l)
    stacked = jax.tree.map(lambda x: np.stack([np.asarray(x)] * F), params)
    par = FoldParallelTrainer(cfg, model, stacked,
                              [train_l] * F, [val_l] * F)
    par.train_main()
    n_batches = len(val_l)
    assert n_batches >= 2, "fixture must produce a multi-batch pass"

    baseline_metrics = par.eval_folds()
    base_shared = par.predict_folds([val_l] * F)
    val_l2 = BatchLoader(val_l.dataset, 8)
    base_stacked = par.predict_folds([val_l2, BatchLoader(val_l.dataset, 8)])

    spy = _Spy()
    # EvalPipeline.results resolves fetch_all in the steps module namespace
    monkeypatch.setattr(steps_mod, "fetch_all",
                        spy.make_fetch(steps_mod.fetch_all))
    monkeypatch.setattr(par, "_eval_step", spy.wrap_step(par._eval_step))
    monkeypatch.setattr(par, "_eval_step_shared",
                        spy.wrap_step(par._eval_step_shared))

    metrics = par.eval_folds()
    spy.assert_single_late_fetch(n_batches)
    for f in range(F):
        assert metrics[f]["aucroc"] == pytest.approx(
            baseline_metrics[f]["aucroc"], abs=0)

    spy.events.clear()
    probs, ids = par.predict_folds([val_l] * F)  # shared broadcast path
    spy.assert_single_late_fetch(n_batches)
    for f in range(F):
        np.testing.assert_array_equal(ids[f], base_shared[1][f])
        np.testing.assert_allclose(probs[f], base_shared[0][f], atol=0)

    spy.events.clear()
    probs, ids = par.predict_folds(  # distinct loaders → stacked path
        [BatchLoader(val_l.dataset, 8), BatchLoader(val_l.dataset, 8)])
    spy.assert_single_late_fetch(n_batches)
    for f in range(F):
        np.testing.assert_array_equal(ids[f], base_stacked[1][f])
        np.testing.assert_allclose(probs[f], base_stacked[0][f], atol=0)


def test_sequential_trainer_eval_fetches_once(setup, monkeypatch):
    """Trainer.eval_model / predict take the same pipelined shape."""
    model, cfg, loaders = setup
    set_seed(cfg.seed)
    train_l, val_l = loaders()
    params = _init_params(model, cfg, val_l)
    seq = Trainer(cfg, model, params, train_l, val_l, test_loaders=[])
    base_metrics, base_loss = seq.eval_model(val_l)
    base_pred = seq.predict(val_l)
    n_batches = len(val_l)
    assert n_batches >= 2

    spy = _Spy()
    monkeypatch.setattr(steps_mod, "fetch_all",
                        spy.make_fetch(steps_mod.fetch_all))
    seq._eval_steps = {k: spy.wrap_step(v)
                       for k, v in seq._eval_steps.items()}

    metrics, loss = seq.eval_model(val_l)
    spy.assert_single_late_fetch(n_batches)
    assert metrics["aucroc"] == pytest.approx(base_metrics["aucroc"], abs=0)
    assert loss == pytest.approx(base_loss, abs=0)

    spy.events.clear()
    probs, ids, labels = seq.predict(val_l)
    spy.assert_single_late_fetch(n_batches)
    np.testing.assert_allclose(probs, base_pred[0], atol=0)
    np.testing.assert_array_equal(ids, base_pred[1])


def test_eval_pipeline_bounds_inflight_depth():
    """EvalPipeline fetches the OLDEST dispatch once more than `window`
    are pending (token-chained dispatches complete in order), and
    results() returns every output in add-order."""
    from meme_challenge_tpu.train.steps import EvalPipeline

    pipe = EvalPipeline(window=2)
    outs = [np.full((2,), i, np.float32) for i in range(5)]
    for i, o in enumerate(outs):
        pipe.add(o)
        assert len(pipe._pending) <= 2, f"window exceeded at add {i}"
    assert len(pipe._done) == 3 and len(pipe._pending) == 2
    got = pipe.results()
    for i, g in enumerate(got):
        np.testing.assert_array_equal(g, outs[i])

    unbounded = EvalPipeline(window=None)
    for o in outs:
        unbounded.add(o)
    assert len(unbounded._pending) == 5  # index-mode loaders stay unbounded
    assert [int(g[0]) for g in unbounded.results()] == list(range(5))


def test_bounded_window_results_unchanged(setup, monkeypatch):
    """A window smaller than the pass length (forcing early fetches) must
    not change eval metrics or predictions."""
    model, cfg, loaders = setup
    set_seed(cfg.seed)
    train_l, val_l = loaders()
    params = _init_params(model, cfg, val_l)
    seq = Trainer(cfg, model, params, train_l, val_l, test_loaders=[])
    assert len(val_l) >= 2
    base_metrics, base_loss = seq.eval_model(val_l)
    base_pred = seq.predict(val_l)

    monkeypatch.setattr(trainer_mod, "EVAL_INFLIGHT_WINDOW", 1)
    metrics, loss = seq.eval_model(val_l)
    assert metrics["aucroc"] == pytest.approx(base_metrics["aucroc"], abs=0)
    assert loss == pytest.approx(base_loss, abs=0)
    probs, ids, _ = seq.predict(val_l)
    np.testing.assert_allclose(probs, base_pred[0], atol=0)
    np.testing.assert_array_equal(ids, base_pred[1])


def test_chain_token_is_value_noop(setup):
    """The dependency token must not perturb probabilities: a chained pass
    equals a token-free single dispatch bitwise."""
    model, cfg, loaders = setup
    set_seed(cfg.seed)
    train_l, val_l = loaders()
    params = _init_params(model, cfg, val_l)
    seq = Trainer(cfg, model, params, train_l, val_l, test_loaders=[])
    batch = dict(next(iter(val_l)))
    batch.pop("ids", None)
    plain = np.asarray(seq._eval_steps[False](seq.state.params, batch, None))
    from meme_challenge_tpu.train.steps import eval_chain_token
    chained, token = seq._eval_steps[False](
        seq.state.params, batch, None, eval_chain_token())
    np.testing.assert_array_equal(plain, np.asarray(chained))
    assert float(np.asarray(token)) == 0.0
