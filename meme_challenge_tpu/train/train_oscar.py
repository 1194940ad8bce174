"""Oscar fine-tuning entry point (extension).

The reference *defines* the Oscar variant (model/oscar.py,
config/oscar-base.json) but never wires it to a trainer (grep: no entry
script imports it — same gap as the pretraining driver). This entry point
supplies the missing capability with the standard lifecycle: MemeDataset
features assembled into 2054-d Oscar features (2048 ⊕ 6-d geometry),
ConfounderSampler, crossval, CE loss over 2 labels per config/oscar-base.json.
"""
from __future__ import annotations

import argparse
import dataclasses
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from meme_challenge_tpu.core.config import TrainConfig, UniterConfig
from meme_challenge_tpu.core.seeding import set_seed
from meme_challenge_tpu.data.meme_dataset import (
    BatchLoader,
    ConfounderSampler,
    MemeDataset,
)
from meme_challenge_tpu.data.tokenizer import BertTokenizer
from meme_challenge_tpu.models.oscar import ImageBertForSequenceClassification
from meme_challenge_tpu.train.crossval_driver import train_crossval
from meme_challenge_tpu.train.train_uniter import add_train_config_args
from meme_challenge_tpu.train.trainer import Trainer

logger = logging.getLogger("meme_challenge_tpu.train_oscar")


class OscarBatchLoader(BatchLoader):
    """Wraps batches with the 2054-d Oscar feature assembly.

    Host mode: the per-batch 2048⊕6 feature concat happens here. Index mode
    (``device_resident_data``): batches carry no features, the Trainer
    gathers the dataset's raw (2048-d, 7-d geometry) arrays on device, and
    the MODEL assembles the 2054-d features in-graph
    (models/oscar.py:ImageBertForSequenceClassification)."""

    def __iter__(self):
        for batch in super().__iter__():
            if "img_feat" in batch:
                batch = dict(batch)
                batch["img_feat"] = np.concatenate(
                    [batch["img_feat"], batch["img_pos_feat"][..., :6]],
                    axis=-1)
                del batch["img_pos_feat"]
            yield batch


def build_oscar_entry(config: TrainConfig, oscar_config: UniterConfig,
                      vocab_file: str, classifier: str = "linear"):
    tokenizer = BertTokenizer(vocab_file)
    model = ImageBertForSequenceClassification(
        oscar_config, num_labels=max(config.n_classes, 2),
        classifier=classifier, img_feature_dim=oscar_config.img_dim)

    ds_kwargs = dict(feature_dir=config.feature_path, tokenizer=tokenizer,
                     max_txt_len=config.max_txt_len, max_bb=config.max_bb,
                     confidence_threshold=config.object_conf_thresh,
                     # stored features are Oscar's img_feature_dim minus the
                     # 6-d geometry the loader/model appends (2054 → 2048
                     # with config/oscar-base.json)
                     img_dim=oscar_config.img_dim - 6)

    def make_loader(path, sampler=False, return_ids=False):
        ds = MemeDataset(path, return_ids=return_ids, **ds_kwargs)
        kw = {"index_batches": config.device_resident_data}
        if sampler:
            kw["sampler"] = ConfounderSampler(
                ds, repeat_factor=config.confounder_repeat)
        return OscarBatchLoader(ds, config.batch_size, **kw)

    loader_funcs = {
        "train": lambda p: make_loader(p, sampler=True),
        "val": lambda p: make_loader(p),
        "test": lambda p: make_loader(p, return_ids=True),
    }
    test_loaders = [
        loader_funcs["test"](os.path.join(config.data_path, n))
        for n in ["test_seen.jsonl", "test_unseen.jsonl", "dev_seen.jsonl",
                  "dev_unseen.jsonl"]
        if os.path.isfile(os.path.join(config.data_path, n))
    ]

    def trainer_factory(cfg, train_loader, val_loader, fold_tests):
        # host mode: example_batch goes through OscarBatchLoader.__iter__,
        # so the 2054-d assembly is reflected in the init example. Index
        # mode: the example is the raw (2048-d, 7-d geometry) pair and the
        # MODEL's in-graph assembly branch fires — both init to identical
        # param shapes (the img projection is (img_feature_dim, H) either
        # way)
        example = val_loader.example_batch()
        params = model.init(jax.random.PRNGKey(cfg.seed), example,
                            deterministic=True)["params"]
        return Trainer(cfg, model, params, train_loader, val_loader,
                       fold_tests)

    return loader_funcs, test_loaders, trainer_factory


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_train_config_args(parser)
    parser.add_argument("--oscar_config", type=str,
                        default="configs/oscar-base.json")
    parser.add_argument("--vocab_file", type=str, required=True)
    parser.add_argument("--classifier", type=str, default="linear",
                        choices=["linear", "mlp"])
    # NOTE: multiclass metrics report aucroc=-1 (reference data/metrics.py:59-80),
    # so the reference's default optimize_for="aucroc" would never checkpoint
    # under CE loss (a quirk its hatespeech path shares) — default to accuracy
    parser.set_defaults(loss_func="ce", optimize_for="accuracy")
    args, _ = parser.parse_known_args(argv)
    cfg_dict = {f.name: getattr(args, f.name)
                for f in dataclasses.fields(TrainConfig)
                if hasattr(args, f.name)}
    config = TrainConfig(**cfg_dict)
    oscar_config = UniterConfig.from_json_file(args.oscar_config)
    os.makedirs(config.model_path, exist_ok=True)
    set_seed(config.seed)
    loader_funcs, test_loaders, trainer_factory = build_oscar_entry(
        config, oscar_config, args.vocab_file, classifier=args.classifier)
    return train_crossval(
        trainer_factory, config, loader_funcs, test_loaders,
        num_folds=config.num_folds, dev_size=config.crossval_dev_size,
        use_dev_set=config.crossval_use_dev)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
