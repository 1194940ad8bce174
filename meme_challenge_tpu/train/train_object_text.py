"""Object-text baseline trainer: meme text ⊕ detected object words.

Parity: reference text_based/train_object_text.py — the ObjectTextDataset
(threshold-range + swap augmentation flags, train_object_text.py:116-120)
with a text backbone + head, ConfounderSampler-free (the reference uses the
plain loader here), crossval-capable.
"""
from __future__ import annotations

import argparse
import dataclasses
import logging
import os

import jax

from meme_challenge_tpu.core.config import TrainConfig
from meme_challenge_tpu.core.seeding import set_seed
from meme_challenge_tpu.data.meme_dataset import BatchLoader
from meme_challenge_tpu.data.object_text import ObjectTextDataset
from meme_challenge_tpu.data.tokenizer import BertTokenizer
from meme_challenge_tpu.models.text_models import MODEL_DICT, build_text_model
from meme_challenge_tpu.train.crossval_driver import train_crossval
from meme_challenge_tpu.train.train_uniter import add_train_config_args
from meme_challenge_tpu.train.trainer import Trainer

logger = logging.getLogger("meme_challenge_tpu.train_object_text")

OBJECT_TEXT_DEFAULTS = dict(
    lr=5e-5, warmup_steps=100, scheduler="warmup_cosine", optimizer="adamw",
    log_every=50, max_epoch=10, batch_size=32)


def build_object_text_entry(config: TrainConfig, model_name: str,
                            vocab_file: str, object_filepath: str,
                            object_to_text_filepath: str,
                            thresh_min: float = 0.5, thresh_max: float = 0.5,
                            swap_prob: float = 0.0,
                            max_txt_len: int = 128):
    tokenizer = BertTokenizer(vocab_file)
    model = build_text_model(model_name, num_classes=config.n_classes)

    def make_loader(path, train=False, return_ids=False):
        # train-time: random threshold in (min, max) + swaps; eval: fixed
        # threshold, no swaps (reference train_object_text.py:116-120)
        thresh = (thresh_min, thresh_max) if train else thresh_max
        ds = ObjectTextDataset(
            path, object_filepath, object_to_text_filepath,
            tokenizer=tokenizer, max_txt_len=max_txt_len,
            confidence_threshold=thresh,
            swap_prob=swap_prob if train else 0.0,
            return_ids=return_ids)
        return BatchLoader(ds, config.batch_size, shuffle_data=train)

    loader_funcs = {
        "train": lambda p: make_loader(p, train=True),
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
        example = val_loader.example_batch()
        params = model.init(jax.random.PRNGKey(cfg.seed), example,
                            deterministic=True)["params"]
        return Trainer(cfg, model, params, train_loader, val_loader,
                       fold_tests)

    return loader_funcs, test_loaders, trainer_factory


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_train_config_args(parser)
    parser.add_argument("--model", type=str, default="bert")
    parser.add_argument("--vocab_file", type=str, required=True)
    parser.add_argument("--object_file", type=str, required=True)
    parser.add_argument("--object_to_text_file", type=str, required=True)
    parser.add_argument("--obj_threshold_min", type=float, default=0.5)
    parser.add_argument("--obj_threshold_max", type=float, default=0.5)
    parser.add_argument("--obj_swap_prob", type=float, default=0.0)
    parser.set_defaults(**OBJECT_TEXT_DEFAULTS)
    args, _ = parser.parse_known_args(argv)
    cfg_dict = {f.name: getattr(args, f.name)
                for f in dataclasses.fields(TrainConfig)
                if hasattr(args, f.name)}
    config = TrainConfig(**cfg_dict)
    assert args.model.lower() in MODEL_DICT
    os.makedirs(config.model_path, exist_ok=True)
    set_seed(config.seed)
    loader_funcs, test_loaders, trainer_factory = build_object_text_entry(
        config, args.model.lower(), args.vocab_file, args.object_file,
        args.object_to_text_file, thresh_min=args.obj_threshold_min,
        thresh_max=args.obj_threshold_max, swap_prob=args.obj_swap_prob,
        max_txt_len=config.max_txt_len)
    return train_crossval(
        trainer_factory, config, loader_funcs, test_loaders,
        num_folds=config.num_folds, dev_size=config.crossval_dev_size,
        use_dev_set=config.crossval_use_dev)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
