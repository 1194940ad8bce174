"""UNITER fine-tuning entry point.

Parity: reference train_uniter.py — CLI flags, pretrained-checkpoint
ingestion, ConfounderSampler train loaders, the four test loaders
(test_seen/test_unseen/dev_seen/dev_unseen), and the crossval driver. The
README reproduction command maps directly:

    python -m meme_challenge_tpu.train.train_uniter \
        --data_path dataset --feature_path dataset/img_feats \
        --vocab_file vocab.txt --pretrained_model_file uniter-base.pt \
        --lr 3e-5 --scheduler warmup_cosine --warmup_steps 500 \
        --batch_size 16 --gradient_accumulation 2 --confounder_repeat 3 \
        --pos_wt 1.8 --num_folds -1 --crossval_dev_size 200 \
        --crossval_use_dev --seed 43 --max_epoch 30 --patience 5
"""
from __future__ import annotations

import argparse
import dataclasses
import logging
import os
from functools import partial
from typing import Optional

import jax
import numpy as np

from meme_challenge_tpu.core.config import TrainConfig, UniterConfig
from meme_challenge_tpu.core.seeding import set_seed
from meme_challenge_tpu.data.meme_dataset import (
    BatchLoader,
    ConfounderSampler,
    MemeDataset,
)
from meme_challenge_tpu.data.tokenizer import BertTokenizer
from meme_challenge_tpu.models.convert import (
    load_torch_state_dict,
    meme_uniter_params_from_torch,
    pretrain_params_from_torch,
)
from meme_challenge_tpu.models.uniter import MemeUniter
from meme_challenge_tpu.train.crossval_driver import train_crossval
from meme_challenge_tpu.train.trainer import Trainer

logger = logging.getLogger("meme_challenge_tpu.train_uniter")


def _parse_mesh_shape(s: str) -> tuple:
    return tuple(int(x) for x in str(s).split(",") if x.strip())


def _parse_mesh_axes(s: str) -> tuple:
    return tuple(x.strip() for x in str(s).split(",") if x.strip())


def add_train_config_args(parser: argparse.ArgumentParser) -> None:
    """All TrainConfig fields as flags (reference add_default_argparse +
    train_uniter.py extras). The mesh flags parse straight to the tuples
    TrainConfig declares, so EVERY CLI built on this helper gets typed
    values (a raw string here used to leak into the config of the text /
    hatespeech / object-text / oscar entry points)."""
    for f in dataclasses.fields(TrainConfig):
        name = "--" + f.name
        if f.type == "bool" or isinstance(f.default, bool):
            # BooleanOptionalAction adds --no-<flag>, so True-default fields
            # (e.g. preload_features) remain switchable off
            parser.add_argument(name, action=argparse.BooleanOptionalAction,
                                default=f.default)
        elif f.name == "mesh_shape":
            parser.add_argument(name, type=_parse_mesh_shape, default=(),
                                help='device mesh, e.g. "4,2" (with a fold '
                                     "axis this routes to the fold-parallel "
                                     "crossval driver)")
        elif f.name == "mesh_axes":
            parser.add_argument(name, type=_parse_mesh_axes,
                                default=("fold", "data"),
                                help='mesh axis names, e.g. "fold,data"')
        else:
            typ = (type(f.default) if f.default is not None else str)
            parser.add_argument(name, type=typ, default=f.default)


def _try_load_flax_params(path: str):
    """Load a flax-msgpack checkpoint (ModelSaver dump) if ``path`` is one.

    Returns the params tree or ``None`` when the file is not msgpack (e.g.
    a torch pickle/zip) — format is sniffed by attempting the restore, so
    both our own pretraining CLI's dumps and the reference's torch ``.pt``
    files flow through the same ``--pretrained_model_file`` flag."""
    from flax import serialization

    with open(path, "rb") as f:
        raw = f.read()
    try:
        payload = serialization.msgpack_restore(raw)
    except Exception:  # noqa: BLE001 — not msgpack: torch pickle/zip
        return None
    if not isinstance(payload, dict):
        return None
    return payload.get("params", payload)


def init_meme_uniter_params(
    model: MemeUniter,
    uniter_config: UniterConfig,
    train_config: TrainConfig,
    rng: jax.Array,
    example_batch: dict,
):
    """Initialize params, optionally from a checkpoint.

    Mirrors reference TrainerUniter.init_model/load_model
    (train_uniter.py:22-53): ``pretrained_model_file`` loads a raw UNITER
    pretraining dump (trunk only, classifier stays random); a fine-tuned
    MemeUniter dump restores everything. Accepts BOTH the reference's
    torch dumps and this build's flax-msgpack ModelSaver files — in
    particular the output of ``train.pretrain_uniter``, closing the
    pretrain → fine-tune handoff the reference README describes.
    """
    params = model.init(rng, example_batch, deterministic=True)["params"]
    path = train_config.pretrained_model_file
    if path:
        full_path = (path if os.path.isfile(path)
                     else os.path.join(train_config.model_path, path))
        logger.info("Loading pretrained UNITER weights from %s", full_path)
        flax_params = _try_load_flax_params(full_path)
        if flax_params is not None:
            params = dict(params)
            if "classifier" in flax_params:   # fine-tuned MemeUniter dump
                params.update(flax_params)
            else:                             # pretraining dump: trunk only
                params["uniter"] = flax_params["uniter"]
            return params
        sd = load_torch_state_dict(full_path)
        if any(k.startswith("uniter_model.") for k in sd):
            loaded = meme_uniter_params_from_torch(sd, uniter_config)
            params = {**params, **loaded}
        else:
            loaded = pretrain_params_from_torch(sd, uniter_config)
            params = dict(params)
            params["uniter"] = loaded["uniter"]
    return params


def build_entry(config: TrainConfig, uniter_config: UniterConfig,
                vocab_file: str):
    """Wire tokenizer, loader factories, trainer factory. Returns
    (loader_funcs, test_loaders, trainer_factory)."""
    tokenizer = BertTokenizer(vocab_file)
    model = MemeUniter(uniter_config, n_classes=config.n_classes)

    ds_kwargs = dict(
        feature_dir=config.feature_path,
        tokenizer=tokenizer,
        max_txt_len=config.max_txt_len,
        max_bb=config.max_bb,
        confidence_threshold=config.object_conf_thresh,
        img_dim=uniter_config.img_dim,
    )

    idx = config.device_resident_data  # HBM-resident datasets, on-device
    # micro-batch gather (train/steps.py:gather_micro)

    def train_data_loader(path):
        ds = MemeDataset(path, **ds_kwargs)
        sampler = ConfounderSampler(ds,
                                    repeat_factor=config.confounder_repeat)
        return BatchLoader(ds, config.batch_size, sampler=sampler,
                           index_batches=idx)

    def val_data_loader(path):
        ds = MemeDataset(path, **ds_kwargs)
        return BatchLoader(ds, config.batch_size, index_batches=idx)

    def test_data_loader(path):
        ds = MemeDataset(path, return_ids=True, **ds_kwargs)
        return BatchLoader(ds, config.batch_size, index_batches=idx)

    loader_funcs = {"train": train_data_loader, "val": val_data_loader,
                    "test": test_data_loader}

    test_loaders = []
    for name in ["test_seen.jsonl", "test_unseen.jsonl", "dev_seen.jsonl",
                 "dev_unseen.jsonl"]:
        path = os.path.join(config.data_path, name)
        if os.path.isfile(path):
            test_loaders.append(test_data_loader(path))

    def trainer_factory(cfg, train_loader, val_loader, fold_test_loaders):
        example = val_loader.example_batch()
        params = init_meme_uniter_params(
            model, uniter_config, cfg, jax.random.PRNGKey(cfg.seed), example)
        return Trainer(cfg, model, params, train_loader, val_loader,
                       fold_test_loaders)

    return loader_funcs, test_loaders, trainer_factory


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_train_config_args(parser)
    parser.add_argument("--uniter_config", type=str, default="",
                        help="JSON model config (uniter-base defaults)")
    parser.add_argument("--vocab_file", type=str, required=True,
                        help="BERT vocab.txt (cased)")
    parser.add_argument("--compute_bf16", action="store_true",
                        help="bfloat16 compute dtype (TPU MXU fast path); "
                             "also enables bf16 attention-score storage and "
                             "uint8 dropout words (+5%% step throughput)")
    parser.add_argument("--precise_attention", action="store_true",
                        help="with --compute_bf16: keep fp32 score storage "
                             "and uint32 dropout words")
    parser.add_argument("--slow_rng", action="store_true",
                        help="keep the threefry PRNG (default: rbg — "
                             "~8%% faster dropout on TPU)")
    args, _ = parser.parse_known_args(argv)
    if not args.slow_rng:
        jax.config.update("jax_default_prng_impl", "rbg")

    cfg_dict = {f.name: getattr(args, f.name)
                for f in dataclasses.fields(TrainConfig)
                if hasattr(args, f.name)}
    config = TrainConfig(**cfg_dict)
    uniter_config = (UniterConfig.from_json_file(args.uniter_config)
                     if args.uniter_config else UniterConfig())
    if args.compute_bf16:
        uniter_config = uniter_config.replace(dtype="bfloat16")
        if not args.precise_attention:
            uniter_config = uniter_config.replace(
                attention_score_dtype="bfloat16", dropout_bits_dtype="uint8")

    os.makedirs(config.model_path, exist_ok=True)
    set_seed(config.seed)
    loader_funcs, test_loaders, trainer_factory = build_entry(
        config, uniter_config, args.vocab_file)
    if config.mesh_shape and "fold" in config.mesh_axes \
            and config.num_folds != 0:
        # --mesh_shape 4,2 --mesh_axes fold,data → all folds train
        # SIMULTANEOUSLY on the mesh (parallel/crossval_parallel.py); the
        # sequential driver below remains the single-chip default.
        # num_folds == 0 ("default split", no crossval) has no fold axis to
        # shard — it falls through to the sequential single-split driver
        from meme_challenge_tpu.parallel.crossval_parallel import (
            train_crossval_fold_parallel,
        )
        from meme_challenge_tpu.parallel.mesh import make_mesh

        model = MemeUniter(uniter_config, n_classes=config.n_classes)

        def init_params_fn(seed, example):
            return init_meme_uniter_params(
                model, uniter_config, config, jax.random.PRNGKey(seed),
                example)

        mesh = make_mesh(config.mesh_shape, config.mesh_axes)
        return train_crossval_fold_parallel(
            config, model, init_params_fn, loader_funcs,
            test_loaders=test_loaders, num_folds=config.num_folds,
            dev_size=config.crossval_dev_size,
            use_dev_set=config.crossval_use_dev, mesh=mesh,
            resume_path=(os.path.join(config.model_path,
                                      "crossval_resume.msgpack")
                         if not config.no_model_checkpoints else None))
    if config.mesh_shape and "fold" in config.mesh_axes:
        logger.warning("--mesh_shape given but num_folds=0 (no crossval): "
                       "falling back to the sequential single-split driver")
    return train_crossval(
        trainer_factory, config, loader_funcs, test_loaders,
        num_folds=config.num_folds, dev_size=config.crossval_dev_size,
        use_dev_set=config.crossval_use_dev)


if __name__ == "__main__":
    logging.basicConfig(
        format="%(asctime)s %(levelname)s %(name)s | %(message)s",
        datefmt="%d/%m/%Y %I:%M:%S %p", level=logging.INFO)
    main()
