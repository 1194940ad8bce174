"""UNITER pretraining entry point (CLI).

The reference ships ``UniterForPretraining``, the MLM/ITM/MRFR datasets and
``MetaLoader`` but **no driver script wires them together** (SURVEY.md §2
quirks — its train_uniter.py touches UniterForPretraining only to load
weights). This is the shipped command for that capability, built on
train/pretrain_driver.py:

    python -m meme_challenge_tpu.train.pretrain_uniter \\
        --data_path dataset --feature_path dataset/img_feats \\
        --vocab_file vocab.txt --tasks mlm:2,itm,mrfr,mrc-kl \\
        --batch_size 16 --gradient_accumulation 2 --max_epoch 5 \\
        --ot_weight 0.1 --device_resident_data --compute_bf16

``--tasks`` takes ``name[:pool_weight]`` entries (MetaLoader sampling pool,
reference pretrain_meme_dataset.py:21-58); the corpus merges train.jsonl +
dev_seen.jsonl (+ Memotion with ``--use_memotion``, reference
pretrain_meme_dataset.py:12-19). The final checkpoint is a flax-msgpack
trunk dump that ``train.train_uniter --pretrained_model_file`` ingests
directly — the pretrain → fine-tune handoff the reference README describes
(README.md:25-33) with its published torch checkpoints.
"""
from __future__ import annotations

import argparse
import dataclasses
import logging
import math
import os

import jax
import numpy as np

from meme_challenge_tpu.core.config import TrainConfig, UniterConfig
from meme_challenge_tpu.core.seeding import set_seed
from meme_challenge_tpu.data.pretrain import (
    ITMBatcher,
    MLMBatcher,
    MRCBatcher,
    MRFRBatcher,
    MetaLoader,
    TaskLoader,
    pretrain_corpus,
)
from meme_challenge_tpu.data.tokenizer import BertTokenizer
from meme_challenge_tpu.models.convert import (
    load_torch_state_dict,
    pretrain_params_from_torch,
)
from meme_challenge_tpu.models.uniter import UniterForPretraining
from meme_challenge_tpu.train.checkpoint import save_training_meta
from meme_challenge_tpu.train.pretrain_driver import PretrainTrainer
from meme_challenge_tpu.train.pretrain_init import init_pretrain_params
from meme_challenge_tpu.train.train_uniter import add_train_config_args

logger = logging.getLogger("meme_challenge_tpu.pretrain_uniter")


def parse_tasks(spec: str):
    """``"mlm:2,itm,mrfr"`` → ordered {name: pool_weight} (weight ≥ 1)."""
    tasks = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        name, _, weight = part.partition(":")
        tasks[name] = int(weight) if weight else 1
    known = {"mlm", "itm", "mrfr", "mrc", "mrc-kl"}
    unknown = set(tasks) - known
    if unknown:
        raise ValueError(f"unknown pretraining tasks {sorted(unknown)}; "
                         f"choose from {sorted(known)}")
    return tasks


def build_task_loaders(config: TrainConfig, dataset, tokenizer,
                       tasks, mlm_prob: float, itm_replace_prob: float,
                       region_mask_prob: float):
    """TaskLoader per task; index-mode when the corpus is HBM-resident."""
    idx = config.device_resident_data
    B = config.batch_size

    def make(name):
        if name == "mlm":
            return TaskLoader("mlm", dataset, B,
                              MLMBatcher(dataset, tokenizer,
                                         mask_prob=mlm_prob),
                              index_batches=idx)
        if name == "itm":
            return TaskLoader("itm", dataset, B,
                              ITMBatcher(dataset,
                                         replace_prob=itm_replace_prob),
                              needs_indices=True, index_batches=idx)
        if name == "mrfr":
            return TaskLoader("mrfr", dataset, B,
                              MRFRBatcher(dataset,
                                          mask_prob=region_mask_prob),
                              index_batches=idx)
        # mrc / mrc-kl share the batcher; the task string picks the head
        return TaskLoader(name, dataset, B,
                          MRCBatcher(dataset, mask_prob=region_mask_prob),
                          needs_indices=True, index_batches=idx)

    return {name: (make(name), weight) if weight > 1 else make(name)
            for name, weight in tasks.items()}


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_train_config_args(parser)
    parser.add_argument("--uniter_config", type=str, default="",
                        help="JSON model config (uniter-base defaults)")
    parser.add_argument("--vocab_file", type=str, required=True,
                        help="BERT vocab.txt (cased)")
    parser.add_argument("--tasks", type=str, default="mlm:2,itm,mrfr,mrc-kl",
                        help="comma list of task[:pool_weight] entries")
    parser.add_argument("--ot_weight", type=float, default=0.0,
                        help="IPOT optimal-transport alignment weight on the "
                             "ITM loss (models/ot.py; reference "
                             "model/pretrain.py:197-203 left it vestigial)")
    parser.add_argument("--use_memotion", action="store_true",
                        help="merge memotion_dataset/all.jsonl into the "
                             "corpus (tools/prep_memotion.py output)")
    parser.add_argument("--mlm_prob", type=float, default=0.15)
    parser.add_argument("--itm_replace_prob", type=float, default=0.5)
    parser.add_argument("--region_mask_prob", type=float, default=0.15)
    parser.add_argument("--steps_per_epoch", type=int, default=0,
                        help="optimizer steps per nominal epoch (0 = one "
                             "pass of the merged corpus)")
    parser.add_argument("--checkpoint_every", type=int, default=0,
                        help="full-state resume checkpoint cadence in "
                             "optimizer steps (0 = once per nominal epoch; "
                             "resume is automatic when the file exists)")
    parser.add_argument("--compute_bf16", action="store_true",
                        help="bfloat16 compute dtype (TPU MXU fast path); "
                             "also enables bf16 attention-score storage and "
                             "uint8 dropout words")
    parser.add_argument("--precise_attention", action="store_true",
                        help="with --compute_bf16: keep fp32 score storage "
                             "and uint32 dropout words")
    parser.add_argument("--slow_rng", action="store_true",
                        help="keep the threefry PRNG (default: rbg)")
    args, _ = parser.parse_known_args(argv)
    if not args.slow_rng:
        jax.config.update("jax_default_prng_impl", "rbg")

    cfg_dict = {f.name: getattr(args, f.name)
                for f in dataclasses.fields(TrainConfig)
                if hasattr(args, f.name)}
    config = TrainConfig(**cfg_dict)
    if config.mesh_shape:
        logger.warning("--mesh_shape is not used by the pretraining driver "
                       "(single-chip loop); ignoring %s", config.mesh_shape)
    uniter_config = (UniterConfig.from_json_file(args.uniter_config)
                     if args.uniter_config else UniterConfig())
    if args.compute_bf16:
        uniter_config = uniter_config.replace(dtype="bfloat16")
        if not args.precise_attention:
            uniter_config = uniter_config.replace(
                attention_score_dtype="bfloat16", dropout_bits_dtype="uint8")

    os.makedirs(config.model_path, exist_ok=True)
    set_seed(config.seed)
    save_training_meta(config.model_path, config, uniter_config)

    tokenizer = BertTokenizer(args.vocab_file)
    dataset = pretrain_corpus(
        config.data_path, config.feature_path, tokenizer,
        use_memotion=args.use_memotion, max_txt_len=config.max_txt_len,
        max_bb=config.max_bb, img_dim=uniter_config.img_dim,
        confidence_threshold=config.object_conf_thresh)
    logger.info("pretraining corpus: %i memes (train+dev%s)", len(dataset),
                "+memotion" if args.use_memotion else "")

    tasks = parse_tasks(args.tasks)
    loaders = build_task_loaders(config, dataset, tokenizer, tasks,
                                 args.mlm_prob, args.itm_replace_prob,
                                 args.region_mask_prob)
    meta = MetaLoader(loaders, accum_steps=config.gradient_accumulation)

    model = UniterForPretraining(uniter_config)
    # init example straight from the dataset — consumes NO host RNG (an
    # index-mode TaskLoader batch lacks img_feat, and drawing a host-mode
    # batch here would shift every later task draw)
    example = dataset.batch(
        np.arange(min(config.batch_size, len(dataset)), dtype=np.int64))
    example.pop("ids", None)
    example.pop("labels", None)
    params = init_pretrain_params(model, jax.random.PRNGKey(config.seed),
                                  example)
    if config.pretrained_model_file:
        path = config.pretrained_model_file
        full = (path if os.path.isfile(path)
                else os.path.join(config.model_path, path))
        logger.info("warm-starting from %s", full)
        from meme_challenge_tpu.train.train_uniter import (
            _try_load_flax_params,
        )

        flax_params = _try_load_flax_params(full)
        params = dict(params)
        if flax_params is not None:
            if "classifier" in flax_params:  # fine-tuned MemeUniter dump
                params["uniter"] = flax_params["uniter"]
            else:  # a previous pretraining dump: resume the full head tree
                params.update(flax_params)
        else:  # reference torch checkpoint
            loaded = pretrain_params_from_torch(load_torch_state_dict(full),
                                                uniter_config)
            params["uniter"] = loaded["uniter"]

    # one nominal epoch = one pass of the merged corpus in OPTIMIZER steps:
    # each step consumes gradient_accumulation micro-batches of batch_size
    steps_per_epoch = args.steps_per_epoch or max(
        1, math.ceil(len(dataset)
                     / (config.batch_size * config.gradient_accumulation)))
    trainer = PretrainTrainer(
        config, model, params, meta, steps_per_epoch=steps_per_epoch,
        ot_weight=args.ot_weight,
        data_arrays=(dataset.device_arrays()
                     if config.device_resident_data else None))
    # resume file keyed by model_save_name: two runs sharing a model_path
    # (different task mixes, different dumps) must not pick up each other's
    # stream records — set_state would reject the foreign task set
    ckpt_path = (None if config.no_model_checkpoints else
                 os.path.join(config.model_path,
                              f"{config.model_save_name}.resume.msgpack"))
    losses = trainer.train(checkpoint_path=ckpt_path,
                           checkpoint_every=args.checkpoint_every or None)
    logger.info("final-epoch mean losses: %s",
                {t: round(v, 4) for t, v in sorted(losses.items())})
    logger.info("pretrained trunk saved to %s/%s — fine-tune with "
                "train.train_uniter --pretrained_model_file",
                config.model_path, config.model_save_name)
    return losses


if __name__ == "__main__":
    logging.basicConfig(
        format="%(asctime)s %(levelname)s %(name)s | %(message)s",
        datefmt="%d/%m/%Y %I:%M:%S %p", level=logging.INFO)
    main()
