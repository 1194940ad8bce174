"""Pretraining quickstart: MLM + ITM(+IPOT) + MRFR + MRC on synthetic data.

Runs in ~2 minutes on CPU:
    JAX_PLATFORMS=cpu python examples/pretrain_quickstart.py /tmp/pretrain_qs

1. generates a synthetic meme corpus (train + dev merged, reference
   pretrain_meme_dataset.py semantics),
2. builds the four task streams behind a MetaLoader (task held fixed per
   gradient-accumulation group),
3. pretrains a tiny UNITER with the multi-task driver (ITM adds the IPOT
   optimal-transport alignment term), printing per-task losses,
4. transfers the pretrained trunk into a MemeUniter classifier and runs one
   fine-tune epoch — the end-to-end handoff the reference README describes
   (pretrain, then `train_uniter.py --pretrained_model_file ...`).

Swap the tiny config for ``configs/uniter-base.json`` and the synthetic
corpus for real conceptual-caption-style features to reproduce a full run.
"""
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if jax.default_backend() != "tpu":
    jax.config.update("jax_default_matmul_precision", "highest")

from meme_challenge_tpu.core.config import TrainConfig, UniterConfig
from meme_challenge_tpu.core.seeding import set_seed
from meme_challenge_tpu.data.pretrain import (
    ITMBatcher, MLMBatcher, MRCBatcher, MRFRBatcher, MetaLoader, TaskLoader,
    pretrain_corpus)
from meme_challenge_tpu.data.tokenizer import BertTokenizer
from meme_challenge_tpu.models.uniter import MemeUniter, UniterForPretraining
from meme_challenge_tpu.train.pretrain_driver import PretrainTrainer
from meme_challenge_tpu.train.pretrain_init import init_pretrain_params
from meme_challenge_tpu.utils.synthetic import make_synthetic_dataset


def main(out_dir: str):
    set_seed(43)
    random.seed(43)

    print("== 1. synthetic corpus")
    synth = make_synthetic_dataset(os.path.join(out_dir, "data"),
                                   n_train=32, n_dev=8, img_dim=32,
                                   label_signal=3.0)
    tok = BertTokenizer(synth["vocab"])
    ds = pretrain_corpus(synth["root"], synth["feature_dir"], tok,
                         max_txt_len=12, max_bb=10, img_dim=32)
    print(f"   corpus size: {len(ds)} (train+dev merged)")

    print("== 2. task streams (MetaLoader, task fixed per accum group)")
    B = 8
    loaders = {
        "mlm": TaskLoader("mlm", ds, B, MLMBatcher(ds, tok)),
        "itm": TaskLoader("itm", ds, B, ITMBatcher(ds), needs_indices=True),
        "mrfr": TaskLoader("mrfr", ds, B, MRFRBatcher(ds)),
        "mrc": TaskLoader("mrc", ds, B, MRCBatcher(ds), needs_indices=True),
    }
    meta = MetaLoader(loaders, accum_steps=2)

    print("== 3. multi-task pretraining (ITM + IPOT alignment)")
    ucfg = UniterConfig(vocab_size=tok.vocab_size, hidden_size=32,
                        num_hidden_layers=2, num_attention_heads=2,
                        intermediate_size=64, img_dim=32,
                        max_position_embeddings=32)
    model = UniterForPretraining(ucfg, img_label_dim=1601)
    example = next(iter(loaders["mlm"]))
    params = init_pretrain_params(model, jax.random.PRNGKey(0), example)
    tcfg = TrainConfig(model_path=os.path.join(out_dir, "ck"),
                       model_save_name="pretrained.ckpt", lr=3e-3,
                       batch_size=B, gradient_accumulation=2, max_epoch=2,
                       warmup_steps=2, scheduler="warmup_cosine", seed=43)
    os.makedirs(tcfg.model_path, exist_ok=True)
    trainer = PretrainTrainer(tcfg, model, params, meta,
                              steps_per_epoch=8, ot_weight=0.1)
    losses = trainer.train()
    for task, loss in sorted(losses.items()):
        print(f"   {task:5s} final-epoch loss: {loss:.4f}")

    print("== 4. fine-tune handoff (pretrained trunk -> MemeUniter)")
    clf = MemeUniter(ucfg, n_classes=1)
    batch = {k: v for k, v in example.items()
             if k in ("input_ids", "position_ids", "img_feat",
                      "img_pos_feat", "txt_mask", "img_mask")}
    clf_params = clf.init(jax.random.PRNGKey(1), batch,
                          deterministic=True)["params"]
    # the pretraining trunk lives under `uniter` in both trees
    trunk = trainer.state.params["uniter"]
    clf_params = dict(clf_params)
    clf_params["uniter"] = trunk
    logits = clf.apply({"params": clf_params}, batch, deterministic=True)
    print(f"   classifier logits from pretrained trunk: "
          f"shape={tuple(logits.shape)}, finite={bool(jax.numpy.all(jax.numpy.isfinite(logits)))}")
    print(f"== done; checkpoints in {tcfg.model_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/pretrain_quickstart")
