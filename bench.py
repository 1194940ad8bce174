"""Benchmark: UNITER-base fine-tune throughput (memes/sec/chip).

The BASELINE.json headline config — UNITER-base fine-tune with the reference
recipe shapes (batch 16, grad-accum 2, max_txt_len 60, max_bb 100, pos_wt
1.8, warmup_cosine, Adam) — measured as full training steps
(fwd+bwd+optimizer, bf16 compute / fp32 params) on the available
accelerator. Prints ONE JSON line.

``vs_baseline`` compares against the reference-side anchor recorded in
BASELINE.md (torch fp32 on the reference's single-GPU stack — an estimate
until a CUDA box is available; see BASELINE.md "measured" table).
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax

# rbg PRNG: hardware-friendly dropout RNG (+~8% step throughput vs threefry
# on v5e, measured in BASELINE.md's round-1 sweep). Affects only dropout
# sampling streams.
jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp

from meme_challenge_tpu.core.config import TrainConfig, UniterConfig
from meme_challenge_tpu.models.uniter import MemeUniter
from meme_challenge_tpu.train.losses import make_loss_fn
from meme_challenge_tpu.train.optim import make_optimizer
from meme_challenge_tpu.train.schedules import make_schedule
from meme_challenge_tpu.train.steps import create_train_state, make_train_step

# Reference-side anchor (memes/sec) for vs_baseline; see BASELINE.md.
REFERENCE_BASELINE_MEMES_PER_SEC = 200.0

BATCH = 16
ACCUM = 2
T, R = 60, 100
WARMUP_STEPS = 3
TIMED_STEPS = 30


def build():
    ucfg = UniterConfig(dtype="bfloat16")
    tcfg = TrainConfig(lr=3e-5, batch_size=BATCH, gradient_accumulation=ACCUM,
                       pos_wt=1.8, scheduler="warmup_cosine", warmup_steps=500)
    model = MemeUniter(ucfg, n_classes=1)
    rng = np.random.RandomState(0)
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

    device_batch = {k: jnp.stack([micro()[k] for _ in range(ACCUM)])
                    for k in micro()}

    params = model.init(jax.random.PRNGKey(0),
                        jax.tree.map(lambda x: x[0], device_batch),
                        deterministic=True)["params"]
    loss_fn = make_loss_fn(tcfg.loss_func, tcfg.pos_wt)
    schedule = make_schedule(tcfg.scheduler, warmup_steps=tcfg.warmup_steps,
                             total_steps=10000,
                             lr_decay_step=tcfg.lr_decay_step,
                             lr_decay_factor=tcfg.lr_decay_factor)
    tx = make_optimizer(tcfg.optimizer, tcfg.lr, schedule,
                        beta1=tcfg.beta1, beta2=tcfg.beta2,
                        weight_decay=tcfg.weight_decay,
                        max_grad_norm=tcfg.max_grad_norm,
                        params_example=params)

    def model_apply_train(params_, batch, rng_):
        return model.apply({"params": params_}, batch, deterministic=False,
                           rngs={"dropout": rng_})

    train_step = make_train_step(model_apply_train, loss_fn, tx,
                                 accum_steps=ACCUM)
    state = create_train_state(params, tx)
    return train_step, state, device_batch


def main():
    train_step, state, device_batch = build()
    root = jax.random.PRNGKey(0)
    for i in range(WARMUP_STEPS):
        state, out = train_step(state, device_batch,
                                jax.random.fold_in(root, i))
        # NOTE: sync via a real fetch — on the axon relay platform
        # jax.block_until_ready returns without waiting; np.asarray is the
        # only reliable barrier. Warmup syncs per step so stray compiles
        # finish before timing.
        np.asarray(out["loss"])

    t0 = time.perf_counter()
    for i in range(TIMED_STEPS):
        state, out = train_step(state, device_batch,
                                jax.random.fold_in(root, 100 + i))
    np.asarray(out["loss"])  # drains the queued chain
    elapsed = time.perf_counter() - t0

    n_chips = jax.device_count()
    memes = BATCH * ACCUM * TIMED_STEPS
    memes_per_sec_per_chip = memes / elapsed / n_chips
    print(json.dumps({
        "metric": "memes_per_sec_per_chip_uniter_base_finetune",
        "value": round(memes_per_sec_per_chip, 2),
        "unit": "memes/s/chip",
        "vs_baseline": round(
            memes_per_sec_per_chip / REFERENCE_BASELINE_MEMES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
