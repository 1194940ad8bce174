"""Inference mode: --max_epoch 0 + existing checkpoint reproduces the
reference's inference path (README.md:64-71 — epoch loop never runs,
end_training reloads the checkpoint and exports)."""
import json

import numpy as np

from meme_challenge_tpu.core.config import TrainConfig, UniterConfig
from meme_challenge_tpu.core.seeding import set_seed
from meme_challenge_tpu.train.crossval_driver import train_crossval
from meme_challenge_tpu.train.train_uniter import build_entry
from meme_challenge_tpu.utils.synthetic import make_synthetic_dataset


def test_inference_mode_reexports_from_checkpoint(tmp_path):
    synth = make_synthetic_dataset(str(tmp_path / "d"), n_train=16, n_dev=8,
                                   n_test=8, img_dim=16)
    ucfg = UniterConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=64,
                        img_dim=16, max_position_embeddings=32)
    base = dict(data_path=synth["root"], feature_path=synth["feature_dir"],
                model_path=str(tmp_path / "ck"), model_save_name="inf.ckpt",
                lr=1e-3, batch_size=8, warmup_steps=2, max_txt_len=8,
                max_bb=8, seed=7)

    # train 1 epoch to create the checkpoint
    set_seed(7)
    cfg = TrainConfig(max_epoch=1, **base)
    lf, tl, tf = build_entry(cfg, ucfg, synth["vocab"])
    train_crossval(tf, cfg, lf, tl, num_folds=0)
    csv = tmp_path / "ck" / "inf_test_seen_preds.csv"
    first = csv.read_text()

    # inference: max_epoch 0 reloads and re-exports identically
    set_seed(7)
    cfg0 = TrainConfig(max_epoch=0, **base)
    lf, tl, tf = build_entry(cfg0, ucfg, synth["vocab"])
    val_metrics, test_metrics = train_crossval(tf, cfg0, lf, tl, num_folds=0)
    second = csv.read_text()
    assert first == second, "inference re-export must be bit-identical"
    assert "dev_unseen" in test_metrics
