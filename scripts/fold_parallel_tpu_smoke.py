"""Certify the fold-parallel crossval driver on real TPU silicon.

Every fold-parallel run before this ran on virtual CPU meshes (tests,
dryrun_multichip) — correct for a 1-chip environment, but it left the
GSPMD-partitioned fold step untested on actual TPU hardware. This smoke
runs the REAL driver (`train_crossval_fold_parallel`: data layer, sharded
training with per-epoch eval + early stopping, per-fold ckpt/CSV exports,
ensemble search) with F=2 folds vmap-stacked on the single chip
(mesh fold=1 — both folds resident, one GSPMD program) at REAL model
shapes: UNITER-base, S=160 static layout (60 text + 100 regions),
bfloat16 compute. Correctness is the point, not speed.

Run on the axon TPU (default platform):  python scripts/fold_parallel_tpu_smoke.py
Prints one summary line; paste the result into BASELINE.md.
"""
import os
import sys
import tempfile
import time
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax


def main():
    from meme_challenge_tpu.core.config import TrainConfig, UniterConfig
    from meme_challenge_tpu.core.seeding import set_seed
    from meme_challenge_tpu.data.meme_dataset import BatchLoader, MemeDataset
    from meme_challenge_tpu.data.tokenizer import BertTokenizer
    from meme_challenge_tpu.models.uniter import MemeUniter
    from meme_challenge_tpu.parallel.crossval_parallel import (
        train_crossval_fold_parallel,
    )
    from meme_challenge_tpu.parallel.mesh import make_mesh
    from meme_challenge_tpu.utils.synthetic import make_synthetic_dataset

    devices = jax.devices()
    print(f"devices: {devices}")
    mesh = make_mesh((1,), ("fold",), devices=devices[:1])

    tmp = tempfile.mkdtemp(prefix="fold_smoke_tpu_")
    synth = make_synthetic_dataset(os.path.join(tmp, "data"), n_train=64,
                                   n_dev=16, n_test=16, img_dim=2048,
                                   label_signal=3.0)
    tok = BertTokenizer(synth["vocab"])
    # real flagship shapes: uniter-base trunk, bf16 MXU compute, the
    # shipped static [60 | 100] layout (vocab from the tiny synth vocab —
    # embedding-table width doesn't change the GSPMD partitioning)
    ucfg = UniterConfig(vocab_size=tok.vocab_size, dtype="bfloat16")
    model = MemeUniter(ucfg, n_classes=1)
    tcfg = TrainConfig(
        data_path=synth["root"], feature_path=synth["feature_dir"],
        model_path=os.path.join(tmp, "ck"), model_save_name="smoke.ckpt",
        lr=3e-5, batch_size=8, max_epoch=2, patience=4, warmup_steps=2,
        gradient_accumulation=2, max_txt_len=60, max_bb=100, seed=43,
        pos_wt=1.8, scheduler="warmup_cosine", steps_per_dispatch=2)

    kwargs = dict(feature_dir=synth["feature_dir"], tokenizer=tok,
                  max_txt_len=60, max_bb=100, img_dim=2048)
    loader_funcs = {
        "train": lambda p: BatchLoader(MemeDataset(p, **kwargs), 8,
                                       shuffle_data=True, index_batches=True),
        "val": lambda p: BatchLoader(MemeDataset(p, **kwargs), 8,
                                     index_batches=True),
        "test": lambda p: BatchLoader(
            MemeDataset(p, return_ids=True, **kwargs), 8,
            index_batches=True),
    }
    test_loaders = [loader_funcs["test"](
        os.path.join(synth["root"], n + ".jsonl"))
        for n in ["test_seen", "dev_seen"]]

    def init_params_fn(seed, example):
        return model.init(jax.random.PRNGKey(seed), example,
                          deterministic=True)["params"]

    os.makedirs(tcfg.model_path, exist_ok=True)
    set_seed(tcfg.seed)
    t0 = time.monotonic()
    results = train_crossval_fold_parallel(
        tcfg, model, init_params_fn, loader_funcs, test_loaders,
        num_folds=2, dev_size=8, use_dev_set=False, mesh=mesh,
        ea_generations=10,
        resume_path=os.path.join(tmp, "ck", "driver_state.msgpack"))
    wall = time.monotonic() - t0

    assert len(results["val_metrics"]) == 2
    for m in results["val_metrics"]:
        assert np.isfinite(m["aucroc"]), m
    assert "ensemble" in results
    csvs = sorted(glob(os.path.join(tmp, "ck", "*_preds.csv")))
    assert len(csvs) == 2 * 3, csvs  # per-fold val + test_seen + dev_seen
    ckpts = sorted(os.path.basename(p)
                   for p in glob(os.path.join(tmp, "ck", "smoke_fold_*.*")))
    probs = []
    import csv as _csv
    for p in csvs:
        with open(p) as f:
            rows = list(_csv.DictReader(f))
        vals = np.array([float(r["proba"]) for r in rows])
        assert np.isfinite(vals).all() and (0 <= vals).all() \
            and (vals <= 1).all(), p
        probs.append(vals.sum())
    print(f"FOLD-PARALLEL TPU SMOKE OK: backend={devices[0].platform} "
          f"mesh=fold1 F=2 uniter-base bf16 S=[60|100] wall={wall:.1f}s "
          f"fold_auc={[round(m['aucroc'], 4) for m in results['val_metrics']]} "
          f"ckpts={ckpts} csv_exports={len(csvs)} "
          f"proba_checksum={sum(probs):.4f} "
          f"artifacts={sorted(os.listdir(tcfg.model_path))}")


if __name__ == "__main__":
    import logging

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    main()
