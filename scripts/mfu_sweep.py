"""One-process MFU-ceiling sweep at the shipped fastest recipe shape.

Every variant is measured in the SAME process back-to-back (the axon
relay's regime drifts ±40% between processes/windows — separate
perf_probe invocations are not comparable), with the shipped lowp
storage config (bf16 compute + bf16 score storage + uint8 dropout words
+ bf16 Adam moments) as the common base, and the BASELINE config
re-measured at the END so within-window drift is visible. A window
fingerprint (chained dispatch RTT, H2D MB/s) stamps the run.

Usage: python scripts/mfu_sweep.py [--steps 30]
Prints one JSON line per variant; record the table in BASELINE.md.
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
BATCH, ACCUM = 16, 2
BASE_KW = dict(dtype="bfloat16", attention_score_dtype="bfloat16",
               dropout_bits_dtype="uint8")


def fingerprint():
    x = jnp.zeros((64, 64), jnp.float32)
    f = jax.jit(lambda a: a @ a)
    np.asarray(f(x))
    t0 = time.perf_counter()
    y = x
    for _ in range(20):
        y = f(y)
    np.asarray(y)
    chained_ms = (time.perf_counter() - t0) / 20 * 1000
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(f(x))
    synced_ms = (time.perf_counter() - t0) / 5 * 1000
    blob = np.zeros((13, 1024, 256), np.float32)  # ~13 MB
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.asarray(blob))
    h2d = blob.nbytes / (time.perf_counter() - t0) / 1e6
    return {"dispatch_chained_ms": round(chained_ms, 3),
            "dispatch_rtt_synced_ms": round(synced_ms, 3),
            "h2d_mb_per_s": round(h2d, 2)}


def build_batch(rng, ucfg):
    txt_len = rng.randint(8, T + 1, size=BATCH)
    img_len = rng.randint(10, R + 1, size=BATCH)

    def micro():
        return {
            "input_ids": jnp.asarray(
                rng.randint(0, ucfg.vocab_size, (BATCH, T)), jnp.int32),
            "position_ids": jnp.tile(jnp.arange(T, dtype=jnp.int32),
                                     (BATCH, 1)),
            "img_feat": jnp.asarray(rng.randn(BATCH, R, ucfg.img_dim),
                                    jnp.float32),
            "img_pos_feat": jnp.asarray(rng.rand(BATCH, R, 7), jnp.float32),
            "txt_mask": jnp.asarray(
                np.arange(T)[None] < txt_len[:, None], jnp.int32),
            "img_mask": jnp.asarray(
                np.arange(R)[None] < img_len[:, None], jnp.int32),
            "labels": jnp.asarray(rng.randint(0, 2, BATCH), jnp.int32),
            "sample_mask": jnp.ones(BATCH, jnp.int32),
        }

    return {k: jnp.stack([micro()[k] for _ in range(ACCUM)])
            for k in micro()}


def measure(name, ucfg_kw, steps, warmup, chunked=0, chunk_unroll=1,
            dropout=True):
    kw = dict(BASE_KW, **ucfg_kw)
    if not dropout:
        kw.update(hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    ucfg = UniterConfig(**kw)
    tcfg = TrainConfig(lr=3e-5, batch_size=BATCH,
                       gradient_accumulation=ACCUM, pos_wt=1.8,
                       scheduler="warmup_cosine", warmup_steps=500)
    model = MemeUniter(ucfg, n_classes=1)
    rng = np.random.RandomState(0)
    device_batch = build_batch(rng, ucfg)
    params = model.init(jax.random.PRNGKey(0),
                        jax.tree.map(lambda x: x[0], device_batch),
                        deterministic=True)["params"]
    loss_fn = make_loss_fn(tcfg.loss_func, tcfg.pos_wt)
    schedule = make_schedule(tcfg.scheduler, warmup_steps=tcfg.warmup_steps,
                             total_steps=10000,
                             lr_decay_step=tcfg.lr_decay_step,
                             lr_decay_factor=tcfg.lr_decay_factor)
    tx = make_optimizer(tcfg.optimizer, tcfg.lr, schedule, beta1=tcfg.beta1,
                        beta2=tcfg.beta2, weight_decay=tcfg.weight_decay,
                        max_grad_norm=tcfg.max_grad_norm,
                        params_example=params, mu_dtype=jnp.bfloat16,
                        nu_dtype=jnp.bfloat16)

    def model_apply_train(params_, b, rng_):
        return model.apply({"params": params_}, b, deterministic=False,
                           rngs={"dropout": rng_})

    state = create_train_state(params, tx)
    root = jax.random.PRNGKey(0)
    t_compile = time.perf_counter()
    if chunked:
        from meme_challenge_tpu.train.steps import make_train_multi_step

        step_fn = make_train_multi_step(model_apply_train, loss_fn, tx,
                                        accum_steps=ACCUM,
                                        steps_per_dispatch=chunked,
                                        unroll=chunk_unroll, fuse_accum=True)
        payload = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (chunked,) + x.shape),
            device_batch)
        n_calls = max(1, steps // chunked)
        for _ in range(warmup):
            state, out = step_fn(state, payload, root)
            np.asarray(out["loss"])
        compile_s = time.perf_counter() - t_compile
        t0 = time.perf_counter()
        for _ in range(n_calls):
            state, out = step_fn(state, payload, root)
        np.asarray(out["loss"])
        elapsed, total = time.perf_counter() - t0, n_calls * chunked
    else:
        step_fn = make_train_step(model_apply_train, loss_fn, tx,
                                  accum_steps=ACCUM, fuse_accum=True)
        for i in range(warmup):
            state, out = step_fn(state, device_batch,
                                 jax.random.fold_in(root, i))
            np.asarray(out["loss"])
        compile_s = time.perf_counter() - t_compile
        t0 = time.perf_counter()
        for i in range(steps):
            state, out = step_fn(state, device_batch,
                                 jax.random.fold_in(root, 100 + i))
        np.asarray(out["loss"])
        elapsed, total = time.perf_counter() - t0, steps
    memes = BATCH * ACCUM * total / elapsed
    rec = {"variant": name, "memes_per_sec_per_chip": round(memes, 1),
           "ms_per_step": round(elapsed / total * 1000, 2),
           "compile_s": round(compile_s, 1)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    print(json.dumps({"window": fingerprint()}), flush=True)
    variants = [
        ("fused_shipped (baseline)", {}, {}),
        ("fused+pallas", {"use_pallas_attention": True}, {}),
        ("fused+pallas_blocked", {"use_pallas_attention": True,
                                  "pallas_blocked": True}, {}),
        ("fused+remat_dots", {"remat": True, "remat_policy": "dots"}, {}),
        ("fused+chunked_k8", {}, {"chunked": 8}),
        ("fused+chunked_k8+unroll2", {}, {"chunked": 8, "chunk_unroll": 2}),
        ("fused no-dropout (ceiling ref)", {}, {"dropout": False}),
        ("fused_shipped (re-measure)", {}, {}),
    ]
    for name, ukw, mkw in variants:
        try:
            measure(name, ukw, args.steps, args.warmup, **mkw)
        except Exception as e:  # noqa: BLE001 — keep sweeping
            print(json.dumps({"variant": name,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
    print(json.dumps({"window_end": fingerprint()}), flush=True)


if __name__ == "__main__":
    main()
