"""Train-step perf probe on the real chip — one config per invocation.

Usage: python scripts/perf_probe.py [--batch 16] [--accum 2] [--pallas]
           [--no-dropout] [--remat none|full|dots] [--steps 30] [--fwd-only]

Prints one JSON line with ms/step and memes/s/chip. Companion to bench.py;
results recorded in BASELINE.md's sweep table.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp

from meme_challenge_tpu.core.config import TrainConfig, UniterConfig
from meme_challenge_tpu.models.uniter import MemeUniter
from meme_challenge_tpu.train.losses import make_loss_fn
from meme_challenge_tpu.train.optim import make_optimizer
from meme_challenge_tpu.train.schedules import make_schedule
from meme_challenge_tpu.train.steps import create_train_state, make_train_step

T, R = 60, 100


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--accum", type=int, default=2)
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--pallas-blocked", action="store_true",
                    help="pair-blocked Pallas kernel (implies --pallas)")
    ap.add_argument("--no-dropout", action="store_true")
    ap.add_argument("--remat", default="none", choices=["none", "full", "dots"])
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--large", action="store_true", help="UNITER-large config")
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--mu-bf16", action="store_true")
    ap.add_argument("--nu-bf16", action="store_true",
                    help="Adam second moment stored bf16 (fp32 math)")
    ap.add_argument("--score-bf16", action="store_true",
                    help="bf16 S^2 score/prob storage (softmax math fp32)")
    ap.add_argument("--drop-bits8", action="store_true",
                    help="uint8 dropout PRNG words (mask traffic /4)")
    ap.add_argument("--chunked", type=int, default=0,
                    help="K optimizer steps per dispatch via "
                         "make_train_multi_step (0 = per-step dispatch)")
    ap.add_argument("--chunk-unroll", type=int, default=1,
                    help="scan unroll over the chunk's optimizer steps "
                         "(>1: XLA may overlap step k's optimizer tail "
                         "with step k+1's first forward)")
    ap.add_argument("--fuse", action="store_true",
                    help="fuse_accum: one fwd/bwd over the flattened "
                         "[accum*B] batch instead of the accumulation scan "
                         "(exact mean-of-micro-means loss semantics)")
    args = ap.parse_args()

    kw = dict(dtype="bfloat16",
              use_pallas_attention=args.pallas or args.pallas_blocked,
              pallas_blocked=args.pallas_blocked,
              remat=(args.remat != "none"), remat_policy=args.remat,
              scan_unroll=args.unroll,
              attention_score_dtype=("bfloat16" if args.score_bf16
                                     else "float32"),
              dropout_bits_dtype="uint8" if args.drop_bits8 else "uint32")
    if args.no_dropout:
        kw.update(hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    if args.large:
        kw.update(hidden_size=1024, num_hidden_layers=24,
                  num_attention_heads=16, intermediate_size=4096)
    ucfg = UniterConfig(**kw)
    tcfg = TrainConfig(lr=3e-5, batch_size=args.batch,
                       gradient_accumulation=args.accum, pos_wt=1.8,
                       scheduler="warmup_cosine", warmup_steps=500)
    model = MemeUniter(ucfg, n_classes=1)
    rng = np.random.RandomState(0)
    B = args.batch
    txt_len = rng.randint(8, T + 1, size=B)
    img_len = rng.randint(10, R + 1, size=B)

    def micro():
        return {
            "input_ids": jnp.asarray(
                rng.randint(0, ucfg.vocab_size, (B, T)), jnp.int32),
            "position_ids": jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1)),
            "img_feat": jnp.asarray(rng.randn(B, R, ucfg.img_dim),
                                    jnp.float32),
            "img_pos_feat": jnp.asarray(rng.rand(B, R, 7), jnp.float32),
            "txt_mask": jnp.asarray(
                np.arange(T)[None] < txt_len[:, None], jnp.int32),
            "img_mask": jnp.asarray(
                np.arange(R)[None] < img_len[:, None], jnp.int32),
            "labels": jnp.asarray(rng.randint(0, 2, B), jnp.int32),
            "sample_mask": jnp.ones(B, jnp.int32),
        }

    device_batch = {k: jnp.stack([micro()[k] for _ in range(args.accum)])
                    for k in micro()}
    params = model.init(jax.random.PRNGKey(0),
                        jax.tree.map(lambda x: x[0], device_batch),
                        deterministic=True)["params"]

    if args.fwd_only:
        one = jax.tree.map(lambda x: x[0], device_batch)

        @jax.jit
        def fwd(params_, batch):
            return model.apply({"params": params_}, batch, deterministic=True)

        for _ in range(args.warmup):
            np.asarray(fwd(params, one))
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = fwd(params, one)
        np.asarray(out)
        elapsed = time.perf_counter() - t0
        ms = elapsed / args.steps * 1000
        print(json.dumps({"config": vars(args), "ms_per_step": round(ms, 2),
                          "memes_per_sec": round(B * args.steps / elapsed, 1)}))
        return

    loss_fn = make_loss_fn(tcfg.loss_func, tcfg.pos_wt)
    schedule = make_schedule(tcfg.scheduler, warmup_steps=tcfg.warmup_steps,
                             total_steps=10000,
                             lr_decay_step=tcfg.lr_decay_step,
                             lr_decay_factor=tcfg.lr_decay_factor)
    tx = make_optimizer(tcfg.optimizer, tcfg.lr, schedule,
                        beta1=tcfg.beta1, beta2=tcfg.beta2,
                        weight_decay=tcfg.weight_decay,
                        max_grad_norm=tcfg.max_grad_norm,
                        params_example=params,
                        mu_dtype=jnp.bfloat16 if args.mu_bf16 else None,
                        nu_dtype=jnp.bfloat16 if args.nu_bf16 else None)

    def model_apply_train(params_, batch, rng_):
        return model.apply({"params": params_}, batch, deterministic=False,
                           rngs={"dropout": rng_})

    state = create_train_state(params, tx)
    root = jax.random.PRNGKey(0)

    if args.chunked:
        from meme_challenge_tpu.train.steps import make_train_multi_step

        K = args.chunked
        multi = make_train_multi_step(model_apply_train, loss_fn, tx,
                                      accum_steps=args.accum,
                                      steps_per_dispatch=K,
                                      unroll=args.chunk_unroll,
                                      fuse_accum=args.fuse)
        chunk = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (K,) + x.shape),
            device_batch)
        for _ in range(args.warmup):
            state, out = multi(state, chunk, root)
            np.asarray(out["loss"])
        n_calls = max(1, args.steps // K)
        t0 = time.perf_counter()
        for _ in range(n_calls):
            state, out = multi(state, chunk, root)
        np.asarray(out["loss"])
        elapsed = time.perf_counter() - t0
        total_steps = n_calls * K
        print(json.dumps({
            "config": vars(args),
            "ms_per_step": round(elapsed / total_steps * 1000, 2),
            "memes_per_sec_per_chip": round(
                B * args.accum * total_steps / elapsed, 1)}))
        return

    train_step = make_train_step(model_apply_train, loss_fn, tx,
                                 accum_steps=args.accum,
                                 fuse_accum=args.fuse)
    for i in range(args.warmup):
        state, out = train_step(state, device_batch, jax.random.fold_in(root, i))
        np.asarray(out["loss"])
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, out = train_step(state, device_batch,
                                jax.random.fold_in(root, 100 + i))
    np.asarray(out["loss"])
    elapsed = time.perf_counter() - t0
    ms = elapsed / args.steps * 1000
    memes = B * args.accum * args.steps / elapsed
    print(json.dumps({"config": {k: v for k, v in vars(args).items()},
                      "ms_per_step": round(ms, 2),
                      "memes_per_sec_per_chip": round(memes, 1)}))


if __name__ == "__main__":
    main()
