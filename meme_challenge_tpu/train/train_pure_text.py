"""Text-only baseline fine-tuning entry point.

Parity: reference text_based/train_pure_text.py — a MODEL_DICT backbone +
TransformerClassificationHead trained on meme text only, with layer
freezing (``--num_layers_freeze``), a separate head learning rate
(``--lr_head``), ConfounderSampler upsampling and the crossval driver.
Reference defaults preserved (lr 5e-5, adamw, warmup_cosine 100, batch 32,
max_epoch 10, head dropout 0.5, hidden 512, GELU).
"""
from __future__ import annotations

import argparse
import dataclasses
import logging
import os

import jax
import numpy as np

from meme_challenge_tpu.core.config import TrainConfig
from meme_challenge_tpu.core.seeding import set_seed
from meme_challenge_tpu.data.meme_dataset import (
    BatchLoader,
    ConfounderSampler,
    MemeDataset,
)
from meme_challenge_tpu.data.tokenizer import BertTokenizer
from meme_challenge_tpu.models.text_models import MODEL_DICT, build_text_model
from meme_challenge_tpu.train.crossval_driver import train_crossval
from meme_challenge_tpu.train.optim import (
    head_lr_scales,
    layer_freeze_scales,
)
from meme_challenge_tpu.train.train_uniter import add_train_config_args
from meme_challenge_tpu.train.trainer import Trainer

logger = logging.getLogger("meme_challenge_tpu.train_pure_text")

PURE_TEXT_DEFAULTS = dict(
    lr=5e-5, warmup_steps=100, scheduler="warmup_cosine", optimizer="adamw",
    log_every=50, max_epoch=10, batch_size=32)


def _is_head(path) -> bool:
    names = [str(p.key) if hasattr(p, "key") else str(p) for p in path]
    return any(n.startswith("head_") for n in names)


def build_text_entry(config: TrainConfig, model_name: str, vocab_file: str,
                     lr_head: float = 1e-4, num_layers_freeze: int = 0,
                     max_txt_len: int = 256, compute_bf16: bool = False):
    """Loader factories + trainer factory for a text-only run."""
    tokenizer = BertTokenizer(vocab_file)
    model = build_text_model(model_name, num_classes=config.n_classes,
                             compute_bf16=compute_bf16)

    def make_loader(path, sampler=False, return_ids=False):
        if sampler and config.debug:
            # --debug trains on dev_seen for fast iteration
            # (reference text_based/train_pure_text.py:132-133)
            path = os.path.join(config.data_path, "dev_seen.jsonl")
        ds = MemeDataset(path, tokenizer=tokenizer, text_only=True,
                         max_txt_len=max_txt_len, return_ids=return_ids)
        kw = {"index_batches": config.device_resident_data}
        if sampler:
            kw["sampler"] = ConfounderSampler(
                ds, repeat_factor=config.confounder_repeat)
        return BatchLoader(ds, config.batch_size, **kw)

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
        # example_batch, NOT next(iter(...)): with --device_resident_data
        # the loader yields index batches that carry no model inputs
        example = val_loader.example_batch()
        params = model.init(jax.random.PRNGKey(cfg.seed), example,
                            deterministic=True)["params"]
        # two-LR groups (head vs base) composed with layer freezing
        scales = head_lr_scales(params, cfg.lr, lr_head, _is_head)
        if num_layers_freeze > 0:
            freeze = layer_freeze_scales(params, num_layers_freeze)
            scales = jax.tree.map(lambda a, b: np.asarray(a) * np.asarray(b),
                                  scales, freeze)
        return Trainer(cfg, model, params, train_loader, val_loader,
                       fold_tests, update_scales=scales)

    return loader_funcs, test_loaders, trainer_factory


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_train_config_args(parser)
    parser.add_argument("--model", type=str, default="bert")
    parser.add_argument("--vocab_file", type=str, required=True)
    parser.add_argument("--lr_head", type=float, default=1e-4)
    parser.add_argument("--num_layers_freeze", type=int, default=0)
    parser.add_argument("--compute_bf16", action="store_true",
                        help="bfloat16 TPU fast path (incl. bf16 score "
                             "storage + uint8 dropout words)")
    parser.set_defaults(**PURE_TEXT_DEFAULTS)
    args, _ = parser.parse_known_args(argv)

    cfg_dict = {f.name: getattr(args, f.name)
                for f in dataclasses.fields(TrainConfig)
                if hasattr(args, f.name)}
    config = TrainConfig(**cfg_dict)
    model_name = args.model.lower()
    assert model_name in MODEL_DICT, (
        "Given model is not known. Please choose between: %s"
        % list(MODEL_DICT.keys()))

    os.makedirs(config.model_path, exist_ok=True)
    set_seed(config.seed)
    loader_funcs, test_loaders, trainer_factory = build_text_entry(
        config, model_name, args.vocab_file, lr_head=args.lr_head,
        num_layers_freeze=args.num_layers_freeze,
        max_txt_len=config.max_txt_len, compute_bf16=args.compute_bf16)
    return train_crossval(
        trainer_factory, config, loader_funcs, test_loaders,
        num_folds=config.num_folds, dev_size=config.crossval_dev_size,
        use_dev_set=config.crossval_use_dev)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
