"""Twitter hate-speech domain warm-up trainer.

Parity: reference text_based/train_hatespeech.py — a text backbone + head
trained with CE loss on the Twitter CSV; n_classes derived from the data's
label vocabulary; single run (no crossval). Used to domain-warm text models
before meme fine-tuning.
"""
from __future__ import annotations

import argparse
import dataclasses
import logging
import os

import jax

from meme_challenge_tpu.core.config import TrainConfig
from meme_challenge_tpu.core.seeding import set_seed
from meme_challenge_tpu.data.hatespeech import TwitterHatespeechDataset
from meme_challenge_tpu.data.meme_dataset import BatchLoader
from meme_challenge_tpu.data.tokenizer import BertTokenizer
from meme_challenge_tpu.models.text_models import MODEL_DICT, build_text_model
from meme_challenge_tpu.train.train_uniter import add_train_config_args
from meme_challenge_tpu.train.trainer import Trainer

logger = logging.getLogger("meme_challenge_tpu.train_hatespeech")

HATESPEECH_DEFAULTS = dict(
    lr=5e-5, warmup_steps=100, scheduler="warmup_cosine", optimizer="adamw",
    loss_func="ce", optimize_for="accuracy", log_every=50, max_epoch=10, batch_size=32)


def run_hatespeech(config: TrainConfig, model_name: str, vocab_file: str,
                   train_csv: str, val_csv: str, max_txt_len: int = 64):
    tokenizer = BertTokenizer(vocab_file)
    train_ds = TwitterHatespeechDataset(train_csv, tokenizer, max_txt_len)
    val_ds = TwitterHatespeechDataset(val_csv, tokenizer, max_txt_len)
    # n_classes from the data (reference train_hatespeech.py:134-143)
    n_classes = train_ds.num_classes
    model = build_text_model(model_name, num_classes=n_classes)
    train_loader = BatchLoader(train_ds, config.batch_size,
                               shuffle_data=True)
    val_loader = BatchLoader(val_ds, config.batch_size)
    example = val_loader.example_batch()
    params = model.init(jax.random.PRNGKey(config.seed), example,
                        deterministic=True)["params"]
    trainer = Trainer(config, model, params, train_loader, val_loader, [])
    return trainer.train_main()


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_train_config_args(parser)
    parser.add_argument("--model", type=str, default="bert")
    parser.add_argument("--vocab_file", type=str, required=True)
    parser.add_argument("--train_csv", type=str, required=True)
    parser.add_argument("--val_csv", type=str, required=True)
    parser.set_defaults(**HATESPEECH_DEFAULTS)
    args, _ = parser.parse_known_args(argv)
    cfg_dict = {f.name: getattr(args, f.name)
                for f in dataclasses.fields(TrainConfig)
                if hasattr(args, f.name)}
    config = TrainConfig(**cfg_dict)
    assert args.model.lower() in MODEL_DICT
    os.makedirs(config.model_path, exist_ok=True)
    set_seed(config.seed)
    return run_hatespeech(config, args.model.lower(), args.vocab_file,
                          args.train_csv, args.val_csv,
                          max_txt_len=config.max_txt_len)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
