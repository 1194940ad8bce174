"""Quickstart: the full pipeline on synthetic data, no downloads needed.

Runs in ~2 minutes on CPU:
    JAX_PLATFORMS=cpu python examples/quickstart.py /tmp/quickstart

1. generates a synthetic meme dataset (jsonl + .npy feature pairs + vocab),
2. trains a tiny UNITER on 2 crossval folds (sequential driver),
3. searches ensemble weights over the per-fold CSVs,
4. re-runs the same folds FOLD-PARALLEL on a virtual device mesh.

Swap the tiny config for ``configs/uniter-base.json``, point at real
Hateful-Memes features (extract/extract_features.py + tools/
convert_feature_export.py) and a real vocab to reproduce the reference
recipe (see README.md).
"""
import json
import os
import sys

# allow `python examples/quickstart.py` without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

if jax.default_backend() != "tpu":
    jax.config.update("jax_default_matmul_precision", "highest")

from meme_challenge_tpu.core.config import TrainConfig, UniterConfig
from meme_challenge_tpu.core.seeding import set_seed
from meme_challenge_tpu.models.uniter import MemeUniter
from meme_challenge_tpu.parallel.crossval_parallel import (
    train_crossval_fold_parallel,
)
from meme_challenge_tpu.parallel.mesh import make_mesh
from meme_challenge_tpu.train.crossval_driver import train_crossval
from meme_challenge_tpu.train.train_uniter import build_entry
from meme_challenge_tpu.utils.synthetic import make_synthetic_dataset


def main(root: str):
    print("== 1. synthetic dataset")
    synth = make_synthetic_dataset(os.path.join(root, "data"), n_train=48,
                                   n_dev=16, n_test=8, img_dim=64,
                                   label_signal=3.0)

    ucfg = UniterConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=64,
                        img_dim=64, max_position_embeddings=32)
    tcfg = TrainConfig(
        data_path=synth["root"], feature_path=synth["feature_dir"],
        model_path=os.path.join(root, "ckpt"), model_save_name="quick.ckpt",
        lr=3e-3, batch_size=8, max_epoch=2, patience=3, warmup_steps=2,
        gradient_accumulation=1, pos_wt=1.2, confounder_repeat=2,
        max_txt_len=12, max_bb=16, seed=43, crossval_dev_size=8)

    print("== 2. sequential 2-fold crossval + ensemble")
    os.makedirs(tcfg.model_path, exist_ok=True)
    set_seed(tcfg.seed)
    loader_funcs, test_loaders, trainer_factory = build_entry(
        tcfg, ucfg, synth["vocab"])
    results = train_crossval(trainer_factory, tcfg, loader_funcs,
                             test_loaders, num_folds=2, dev_size=8,
                             ea_generations=3)
    print("   mean fold AUROC: %.3f" %
          results["mean_scores"]["aucroc"])
    print("   ensemble: %.3f with %s" % (
        results["ensemble"]["score"],
        ["%.2f" % w for w in results["ensemble"]["config"]["weights"]]))

    print("== 3. fold-parallel on a %i-device mesh" % jax.device_count())
    model = MemeUniter(ucfg, n_classes=1)
    mesh = make_mesh((2, jax.device_count() // 2), ("fold", "data")) \
        if jax.device_count() >= 4 else None
    tcfg_fp = tcfg.replace(model_path=os.path.join(root, "ckpt_fp"))
    os.makedirs(tcfg_fp.model_path, exist_ok=True)

    def init_params_fn(seed, example):
        return model.init(jax.random.PRNGKey(seed), example,
                          deterministic=True)["params"]

    fp = train_crossval_fold_parallel(
        tcfg_fp, model, init_params_fn, loader_funcs, test_loaders,
        num_folds=2, dev_size=8, mesh=mesh, ea_generations=3)
    print("   fold-parallel mean AUROC: %.3f" %
          fp["mean_scores"]["aucroc"])
    print("== done; artifacts in", root)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/mct_quickstart")
