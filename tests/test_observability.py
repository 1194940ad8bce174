"""Direct tests for train/observability.py — the ScalarWriter fan-out
(JSONL + TensorBoard) and the jax.profiler trace context.

The trainer-oracle twin compares the scalar SERIES through a stand-in
writer (test_trainer_oracle._Writer); these tests pin the real sinks:
the reference's observability contract is TensorBoard scalars with the
utils/utils.py:25-60 names, ours adds the always-on scalars.jsonl sink.
"""
import json
import os

import numpy as np
import pytest

from meme_challenge_tpu.train.observability import ScalarWriter, profile_trace

from test_train import _tiny_configs, synth  # noqa: F401 (module fixture)


def _read_jsonl(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_scalar_writer_jsonl_records(tmp_path):
    w = ScalarWriter(str(tmp_path / "logs"), use_tensorboard=False)
    w.add_scalar("Train/Loss", 0.5, 1)
    w.add_scalars([("Stats/learning_rate", 2, 3e-5),
                   ("Validation/aucroc", 2, 0.75)])
    w.close()

    recs = _read_jsonl(tmp_path / "logs" / "scalars.jsonl")
    assert [(r["name"], r["step"], r["value"]) for r in recs] == [
        ("Train/Loss", 1, 0.5),
        ("Stats/learning_rate", 2, 3e-5),
        ("Validation/aucroc", 2, 0.75),
    ]
    assert all("ts" in r for r in recs)
    # no TB writer requested → no event files
    assert not [f for f in os.listdir(tmp_path / "logs")
                if f.startswith("events.out")]


def test_scalar_writer_tensorboard_sink(tmp_path):
    pytest.importorskip("torch.utils.tensorboard")
    w = ScalarWriter(str(tmp_path / "tb"))
    w.add_scalar("Train/Loss", 1.25, 7)
    w.close()
    events = [f for f in os.listdir(tmp_path / "tb")
              if f.startswith("events.out")]
    assert events, "SummaryWriter should have written an event file"
    # JSONL sink stays on alongside TB
    recs = _read_jsonl(tmp_path / "tb" / "scalars.jsonl")
    assert recs[0]["name"] == "Train/Loss" and recs[0]["step"] == 7


def test_scalar_writer_appends_across_instances(tmp_path):
    """Reopening the same log dir (resume) appends, never truncates."""
    d = str(tmp_path / "logs")
    w1 = ScalarWriter(d, use_tensorboard=False)
    w1.add_scalar("Train/Loss", 1.0, 1)
    w1.close()
    w2 = ScalarWriter(d, use_tensorboard=False)
    w2.add_scalar("Train/Loss", 0.5, 2)
    w2.close()
    assert [r["step"] for r in _read_jsonl(tmp_path / "logs" /
                                           "scalars.jsonl")] == [1, 2]


def test_profile_trace_noop_and_real(tmp_path):
    import jax
    import jax.numpy as jnp

    with profile_trace(None):   # falsy → no-op, no directory created
        pass
    with profile_trace(""):
        pass

    trace_dir = str(tmp_path / "trace")
    with profile_trace(trace_dir):
        np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    found = []
    for root, _dirs, files in os.walk(trace_dir):
        found += [os.path.join(root, f) for f in files]
    assert found, "profiler trace should leave artifacts under the log dir"


def test_trainer_writes_reference_scalar_names(synth, tmp_path):
    """End-to-end: a Trainer with vis_path set streams the reference's
    TensorBoard scalar names (utils/utils.py:25-60; train_template.py:384,
    262) into scalars.jsonl via the real ScalarWriter."""
    import jax

    from meme_challenge_tpu.data.meme_dataset import BatchLoader, MemeDataset
    from meme_challenge_tpu.data.tokenizer import BertTokenizer
    from meme_challenge_tpu.models.uniter import MemeUniter
    from meme_challenge_tpu.train.trainer import Trainer

    ucfg, tcfg = _tiny_configs(synth, tmp_path, max_epoch=1,
                               vis_path=str(tmp_path / "vis"),
                               model_save_name="obs.ckpt")
    tok = BertTokenizer(synth["vocab"])
    kwargs = dict(feature_dir=synth["feature_dir"], tokenizer=tok,
                  max_txt_len=12, max_bb=16, img_dim=32)
    train = BatchLoader(MemeDataset(
        os.path.join(synth["root"], "train.jsonl"), **kwargs), 8)
    val = BatchLoader(MemeDataset(
        os.path.join(synth["root"], "dev_seen.jsonl"), **kwargs), 8)
    model = MemeUniter(ucfg, n_classes=1)
    example = dict(next(iter(train)))
    example.pop("ids", None)
    params = model.init(jax.random.PRNGKey(0), example,
                        deterministic=True)["params"]
    trainer = Trainer(tcfg, model, params, train, val, [])
    trainer.train_main()

    log_dir = os.path.join(str(tmp_path / "vis"), "obs")
    names = {r["name"] for r in _read_jsonl(
        os.path.join(log_dir, "scalars.jsonl"))}
    for expected in ("Stats/learning_rate", "Stats/time_per_train_iter",
                     "Stats/time_validation", "Train/Epoch_Loss",
                     "Validation/Loss", "Validation/aucroc", "Train/aucroc"):
        assert expected in names, f"missing scalar {expected}: {names}"
    # the writer drains the buffer each epoch — nothing left unflushed
    assert trainer.scalars == []
