"""Benchmarks for the BASELINE.json matrix. Prints ONE JSON line.

Headline: UNITER-base fine-tune throughput (memes/sec/chip) under the
reference recipe shapes (batch 16, grad-accum 2, max_txt_len 60, max_bb 100,
pos_wt 1.8, warmup_cosine, Adam) as full training steps (fwd+bwd+optimizer,
bf16 compute / fp32 params) on the available accelerator.

``extra_metrics`` fills the remaining measurable rows of BASELINE.md:
inference p50 latency, text-only BERT baseline step, MLM/ITM+IPOT/MRFR
pretraining steps, UNITER-large fine-tune, and detector extraction s/img —
each guarded by a timeout so one flaky remote compile can't sink the run.

``vs_baseline`` compares against the reference-side anchor recorded in
BASELINE.md (torch fp32 on the reference's single-GPU stack — an estimate
until a CUDA box is available; see BASELINE.md "measured" table).

BUDGET-SHAPED CAPTURE (r5): the whole run fits ``BENCH_BUDGET_S`` seconds
(env var, default 1200). Probe backoff, per-metric budgets and the salvage
pass are all derived from the REMAINING budget — never from fixed
constants — and the JSON result line is (re-)printed incrementally: a
provisional headline-only line the moment the first variant lands, then an
enriched line after every completed extra metric. The driver parses the
LAST line of stdout, so a kill at any point still leaves the best-known
numbers behind; a SIGTERM handler and an atexit hook emit one final line
even when the driver's outer timeout fires mid-metric.
"""
from __future__ import annotations

import atexit
import json
import os
import signal
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

# low-precision STORAGE of the step's largest intermediates (math stays
# fp32 inside the fusions; tests/test_lowp_paths.py pins numerics) — the
# same flags --compute_bf16 enables in the train CLIs (+5% measured)
PERF_STORAGE = dict(attention_score_dtype="bfloat16",
                    dropout_bits_dtype="uint8")

BATCH = 16
ACCUM = 2
T, R = 60, 100
WARMUP_STEPS = 3
TIMED_STEPS = 30
EXTRA_TIMEOUT_S = 420  # nominal per extra metric; remote compiles can stall
FINETUNE_LOOP_TIMEOUT_S = 600  # two fresh compiles (gather single-step +
                               # K=8 chunk); chunked measured first, K=1
                               # skipped when the budget runs short
UNITER_LARGE_TIMEOUT_S = 600  # 24-layer remote compiles; missed 4 rounds —
                              # runs FIRST in the extras table
PRETRAIN_TIMEOUT_S = 960  # 4 task compiles + 2 driver-loop compiles; the
                          # remote compile service has windows where a
                          # single fresh HLO takes 3+ minutes. Order:
                          # mlm → driver loop → itm/mrfr/mrc-kl, so a slow
                          # window costs the tail tasks, not the loop metric

# ----------------------------------------------------------------- budget
# Global wall-clock budget for the WHOLE capture. Every nominal budget
# above is a ceiling that gets clamped to what actually remains; when the
# budget runs dry, remaining metrics are skipped (marked) rather than
# risking the driver's outer timeout killing the process mid-metric with
# nothing on stdout (that is exactly how round 4's artifact came back
# empty: rc 124, no JSON line).
BENCH_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1200"))
_T0 = time.monotonic()
_DEADLINE = _T0 + BENCH_BUDGET_S
# wall-clock reserved at the tail for salvage-decision + final emission
_EMIT_MARGIN_S = 20.0


def _remaining() -> float:
    """Seconds left of the global capture budget."""
    return _DEADLINE - time.monotonic()


# The one result line, updated in place as metrics land and re-printed at
# every milestone (the driver reads the LAST parseable line of stdout).
_line = {
    "metric": "memes_per_sec_per_chip_uniter_base_finetune",
    "value": 0.0,
    "unit": "memes/s/chip",
    "vs_baseline": 0.0,
    "extra_metrics": {},
}


def _emit():
    """Print the current best-known result line (flushed: a later SIGKILL
    must not lose buffered provisional lines in a stdout pipe)."""
    print(json.dumps(_line), flush=True)


def _set_headline(value: float):
    _line["value"] = round(value, 2)
    _line["vs_baseline"] = round(value / REFERENCE_BASELINE_MEMES_PER_SEC, 3)


_final_emitted = False


def _emit_final():
    global _final_emitted
    _line["extra_metrics"]["elapsed_s"] = round(time.monotonic() - _T0, 1)
    _line["extra_metrics"]["budget_s"] = BENCH_BUDGET_S
    _emit()
    _final_emitted = True


def _on_sigterm(signum, _frame):
    """The driver's outer timeout sends SIGTERM: emit the best-known line
    before dying so the artifact is never empty."""
    _line["extra_metrics"]["terminated"] = (
        f"signal {signum} at {time.monotonic() - _T0:.0f}s")
    _emit_final()
    os._exit(0)


def _atexit_emit():
    if not _final_emitted:
        _emit_final()


class _Timeout(Exception):
    pass


def _device_backend_reachable(timeout_s: int = 180):
    """Probe the accelerator in a SUBPROCESS with a hard kill.

    When the axon relay tunnel is unhealthy, the PJRT client handshake
    blocks inside C and never returns to the interpreter — SIGALRM-based
    timeouts cannot interrupt it (verified live: an alarm(30) never fired
    through a 110 s hang). A subprocess is the only bound that holds. The
    per-metric alarms below stay effective for everything AFTER the
    handshake (slow remote compiles ARE python-interruptible).

    Returns ``(ok, detail)``: hangs and crashes are distinguished so the
    capture's one JSON line carries the true diagnosis (a 2 s import error
    is not a relay hang), with the probe's stderr tail attached."""
    import subprocess
    import sys

    code = ("import numpy as np, jax, jax.numpy as jnp; "
            "x = jnp.ones((4, 4), jnp.float32); "
            "print(float(np.asarray(x @ x).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=timeout_s, capture_output=True)
    except subprocess.TimeoutExpired:
        return False, f"probe hung past {timeout_s} s (relay handshake)"
    if r.returncode == 0:
        return True, ""
    tail = r.stderr.decode(errors="replace").strip()[-300:]
    return False, f"probe exited {r.returncode}: {tail}"


_PROBE_TIMEOUT_S = 180  # worst-case cost of one HUNG probe subprocess
# (first device contact after a relay outage has taken ~170 s live)


def _backoff_sleeps(budget_s: float,
                    probe_s: float = _PROBE_TIMEOUT_S) -> tuple:
    """Doubling backoff schedule (30 s … 600 s cap) sized so the whole
    probe loop — sleeps plus worst-case hung probes between them — fits
    ``budget_s``. Relay outages are window-shaped (7–20+ min observed), so
    the schedule should span as much of the AVAILABLE budget as possible
    and no more: round 3 lost its capture to a too-short fixed loop, round
    4 to fixed constants summing past the driver's timeout."""
    sleeps, total, s = [], probe_s, 30.0  # first probe precedes any sleep
    while total + s + probe_s <= budget_s:
        sleeps.append(int(s))
        total += s + probe_s
        s = min(s * 2, 600)
    return tuple(sleeps)


def _probe_until_reachable(sleeps=None, budget_s=None):
    """Probe the relay with backoff until it answers or the budget ends.

    ``sleeps`` may be given explicitly; otherwise it is derived from
    ``budget_s`` via :func:`_backoff_sleeps` (and clamped to the global
    remaining budget either way). Returns ``(ok, detail, waited_s)``;
    ``waited_s`` is recorded in the artifact so a capture that survived an
    outage says so.

    The backoff is reserved for HANGS (the observed outage shape — the
    PJRT handshake blocks in C). A probe that EXITS nonzero is usually
    deterministic breakage (bad env, import error) that no amount of
    sleeping heals, so three consecutive exit-failures end the schedule
    early instead of wasting the remaining budget."""
    if sleeps is None:
        sleeps = _backoff_sleeps(budget_s if budget_s is not None
                                 else _remaining())
    t0 = time.monotonic()
    probe_timeout = int(max(10, min(_PROBE_TIMEOUT_S,
                                    _remaining() - _EMIT_MARGIN_S)))
    ok, detail = _device_backend_reachable(probe_timeout)
    if ok:
        return True, "", 0.0
    exit_fails = 1 if detail.startswith("probe exited") else 0
    for s in sleeps:
        if exit_fails >= 3:
            break
        if _remaining() < s + _PROBE_TIMEOUT_S + _EMIT_MARGIN_S:
            break  # the global budget can no longer afford this wait
        time.sleep(s)
        ok, detail = _device_backend_reachable(
            int(max(10, min(_PROBE_TIMEOUT_S, _remaining() - _EMIT_MARGIN_S))))
        if ok:
            return True, "", time.monotonic() - t0
        exit_fails = (exit_fails + 1 if detail.startswith("probe exited")
                      else 0)
    return False, detail, time.monotonic() - t0


def _alarm(*_):
    raise _Timeout()


def _with_timeout(fn, seconds=EXTRA_TIMEOUT_S):
    """Bound ``fn`` by a SIGALRM timer. Nesting-safe: SIGALRM is a single
    process-wide timer, so a nested call clamps to whatever remains of the
    ENCLOSING budget (the outer bound stays authoritative) and re-arms the
    enclosing timer on exit instead of silently cancelling it."""
    signal.signal(signal.SIGALRM, _alarm)
    outer = signal.alarm(0)  # remaining seconds of an enclosing timer (0 = none)
    start = time.monotonic()
    try:
        signal.alarm(min(seconds, outer) if outer else seconds)
        return fn()
    finally:
        signal.alarm(0)
        if outer:
            remaining = outer - (time.monotonic() - start)
            signal.alarm(max(1, int(remaining)))


# Wall-clock end of the CURRENT extra metric's (clamped) alarm budget, set
# by _run_extra around each call. Metric functions that sub-budget their
# internal stages (bench_pretrain, bench_finetune_loop, bench_uniter_large)
# anchor on this instead of their nominal constants, so a globally-clamped
# budget shortens their internal schedule too instead of silently letting
# every stage plan for a window that no longer exists.
_metric_deadline = None


def _metric_end(nominal_s: float, margin: float = 30.0) -> float:
    """time.monotonic() value a metric's internal stages must finish by:
    its nominal window, clamped to the budget _run_extra actually armed
    and to the global capture deadline."""
    end = time.monotonic() + nominal_s
    if _metric_deadline is not None:
        end = min(end, _metric_deadline)
    return min(end, _DEADLINE) - margin


def _finetune_batch(rng, ucfg, batch, accum):
    txt_len = rng.randint(8, T + 1, size=batch)
    img_len = rng.randint(10, R + 1, size=batch)

    def micro():
        return {
            "input_ids": jnp.asarray(
                rng.randint(0, ucfg.vocab_size, (batch, T)), jnp.int32),
            "position_ids": jnp.tile(jnp.arange(T, dtype=jnp.int32),
                                     (batch, 1)),
            # fp16: matches MemeDataset.batch()'s emitted dtype (features
            # are stored fp16; the model upcasts in-graph)
            "img_feat": jnp.asarray(rng.randn(batch, R, ucfg.img_dim),
                                    jnp.float16),
            "img_pos_feat": jnp.asarray(rng.rand(batch, R, 7), jnp.float32),
            "txt_mask": jnp.asarray(
                np.arange(T)[None] < txt_len[:, None], jnp.int32),
            "img_mask": jnp.asarray(
                np.arange(R)[None] < img_len[:, None], jnp.int32),
            "labels": jnp.asarray(rng.randint(0, 2, batch), jnp.int32),
            "sample_mask": jnp.ones(batch, jnp.int32),
        }

    return {k: jnp.stack([micro()[k] for _ in range(accum)])
            for k in micro()}


def _make_tx(tcfg, params):
    schedule = make_schedule(tcfg.scheduler, warmup_steps=tcfg.warmup_steps,
                             total_steps=10000,
                             lr_decay_step=tcfg.lr_decay_step,
                             lr_decay_factor=tcfg.lr_decay_factor)
    return make_optimizer(tcfg.optimizer, tcfg.lr, schedule,
                          beta1=tcfg.beta1, beta2=tcfg.beta2,
                          weight_decay=tcfg.weight_decay,
                          max_grad_norm=tcfg.max_grad_norm,
                          params_example=params,
                          mu_dtype=tcfg.adam_mu_dtype,
                          nu_dtype=tcfg.adam_nu_dtype)


def _time_steps(step, state, batch, steps=TIMED_STEPS, warmup=WARMUP_STEPS):
    root = jax.random.PRNGKey(0)
    for i in range(warmup):
        state, out = step(state, batch, jax.random.fold_in(root, i))
        # NOTE: sync via a real fetch — on the axon relay platform
        # jax.block_until_ready returns without waiting; np.asarray is the
        # only reliable barrier.
        np.asarray(out["loss"] if isinstance(out, dict) else out)
    t0 = time.perf_counter()
    for i in range(steps):
        state, out = step(state, batch, jax.random.fold_in(root, 100 + i))
    np.asarray(out["loss"] if isinstance(out, dict) else out)
    return (time.perf_counter() - t0) / steps


def _build_finetune(ucfg, batch=BATCH, accum=ACCUM, fuse_accum=False):
    tcfg = TrainConfig(lr=3e-5, batch_size=batch, gradient_accumulation=accum,
                       pos_wt=1.8, scheduler="warmup_cosine", warmup_steps=500)
    model = MemeUniter(ucfg, n_classes=1)
    rng = np.random.RandomState(0)
    device_batch = _finetune_batch(rng, ucfg, batch, accum)
    params = model.init(jax.random.PRNGKey(0),
                        jax.tree.map(lambda x: x[0], device_batch),
                        deterministic=True)["params"]
    loss_fn = make_loss_fn(tcfg.loss_func, tcfg.pos_wt)
    tx = _make_tx(tcfg, params)

    def model_apply_train(params_, b, rng_):
        return model.apply({"params": params_}, b, deterministic=False,
                           rngs={"dropout": rng_})

    train_step = make_train_step(model_apply_train, loss_fn, tx,
                                 accum_steps=accum, fuse_accum=fuse_accum)
    return model, params, train_step, create_train_state(params, tx), \
        device_batch


def bench_headline(variant="fused"):
    """Recipe throughput. Three recipe-faithful step shapes exist:

    - ``"scan"``: the reference's literal b16 × accum-2 scan, one
      optimizer step per dispatch.
    - ``"fused"``: ONE fused fwd/bwd over the flattened batch-32
      (exact mean-of-micro-means loss semantics — steps._train_step_body;
      ``--fuse_accum`` in the CLI), one optimizer step per dispatch.
    - ``"fused_chunked_k8"``: the SHIPPED Trainer dispatch — 8 fused
      optimizer steps per jitted lax.scan call (train/steps.py
      make_train_multi_step, the trainer's steps_per_dispatch default),
      which amortizes the relay launch overhead across the chunk. The r5
      same-window sweep measured it +5.5% over per-step fused dispatch
      (scripts/mfu_sweep.py).

    Which is fastest is WINDOW-dependent on the axon relay (r4: fused
    +34% over scan in a high-launch-overhead window; r2 measured the scan
    ~17% faster in a fast window), so main() measures all three and
    headlines the best, recording each.
    """
    ucfg = UniterConfig(dtype="bfloat16", **PERF_STORAGE)
    if variant == "fused_chunked_k8":
        from meme_challenge_tpu.train.steps import make_train_multi_step

        K = 8
        model, params, _, state, device_batch = _build_finetune(
            ucfg, fuse_accum=True)
        tcfg = TrainConfig(lr=3e-5, batch_size=BATCH,
                           gradient_accumulation=ACCUM, pos_wt=1.8,
                           scheduler="warmup_cosine", warmup_steps=500)
        loss_fn = make_loss_fn(tcfg.loss_func, tcfg.pos_wt)
        tx = _make_tx(tcfg, params)

        def model_apply_train(params_, b, rng_):
            return model.apply({"params": params_}, b, deterministic=False,
                               rngs={"dropout": rng_})

        multi = make_train_multi_step(model_apply_train, loss_fn, tx,
                                      accum_steps=ACCUM,
                                      steps_per_dispatch=K, fuse_accum=True)
        chunk = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (K,) + x.shape),
            device_batch)
        sec = _time_steps(multi, state, chunk, steps=max(2, TIMED_STEPS // K),
                          warmup=1) / K
    else:
        _, _, step, state, batch = _build_finetune(
            ucfg, fuse_accum=(variant == "fused"))
        sec = _time_steps(step, state, batch)
    return BATCH * ACCUM / sec


def bench_finetune_loop():
    """Trainer-LOOP throughput with the device-resident input pipeline:
    a fresh batch of indices every step (host shuffling), model inputs
    gathered on device from a corpus preloaded to HBM once
    (steps.gather_micro). Unlike the headline (one pre-uploaded batch
    reused), this measures the real per-step host→device path. Two modes:
    ``chunked_k8`` is the Trainer's default dispatch (8 optimizer steps per
    jitted lax.scan call — one relay RTT per 8 steps), ``per_step_dispatch``
    the K=1 path. The chunked number is measured FIRST and the K=1 pass is
    skipped when the budget runs short (each mode is its own fresh remote
    compile — a slow compile-service window must not sink the whole
    metric, r3 rehearsal lost it to a double timeout)."""
    budget_end = _metric_end(FINETUNE_LOOP_TIMEOUT_S)
    from meme_challenge_tpu.train.steps import (
        make_train_multi_step, make_train_step)

    ucfg = UniterConfig(dtype="bfloat16", **PERF_STORAGE)
    tcfg = TrainConfig(lr=3e-5, batch_size=BATCH,
                       gradient_accumulation=ACCUM, pos_wt=1.8,
                       scheduler="warmup_cosine", warmup_steps=500)
    model = MemeUniter(ucfg, n_classes=1)
    rng = np.random.RandomState(0)
    # synthetic corpus resident in HBM. Kept SMALL: the gather cost is
    # corpus-size-independent (HBM fancy-indexing), but the one-time upload
    # crosses the axon relay at ~8-20 MB/s — 1024 rows (≈430 MB of fp16
    # features) burned minutes of the metric budget before timing started
    N = 256
    txt_len = rng.randint(8, T + 1, size=N)
    img_len = rng.randint(10, R + 1, size=N)
    data = {
        "input_ids": jnp.asarray(
            rng.randint(0, ucfg.vocab_size, (N, T)), jnp.int32),
        "position_ids": jnp.tile(jnp.arange(T, dtype=jnp.int32), (N, 1)),
        "img_feat": jnp.asarray(rng.randn(N, R, ucfg.img_dim), jnp.float16),
        "img_pos_feat": jnp.asarray(rng.rand(N, R, 7), jnp.float32),
        "txt_mask": jnp.asarray(np.arange(T)[None] < txt_len[:, None],
                                jnp.int32),
        "img_mask": jnp.asarray(np.arange(R)[None] < img_len[:, None],
                                jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 2, N), jnp.int32),
    }
    example = jax.tree.map(lambda x: np.asarray(x[:BATCH]), data)
    example["sample_mask"] = np.ones(BATCH, np.int32)
    params = model.init(jax.random.PRNGKey(0), example,
                        deterministic=True)["params"]
    tx = _make_tx(tcfg, params)

    def apply_train(params_, b, rng_):
        return model.apply({"params": params_}, b, deterministic=False,
                           rngs={"dropout": rng_})

    state = create_train_state(params, tx)
    root = jax.random.PRNGKey(0)

    # the Trainer's default for index loaders (8 steps per dispatch) is
    # measured first — it is the shipped loop path
    K = 8
    multi = make_train_multi_step(
        apply_train, make_loss_fn("bce_logits", 1.8), tx,
        accum_steps=ACCUM, steps_per_dispatch=K, gather_data=True)

    def idx_chunk():
        return {
            "indices": rng.randint(0, N, (K, ACCUM, BATCH)).astype(np.int32),
            "sample_mask": np.ones((K, ACCUM, BATCH), np.int32)}

    for _ in range(2):
        state, out = multi(state, idx_chunk(), root, data)
        np.asarray(out["loss"])
    n_chunks = 4
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, out = multi(state, idx_chunk(), root, data)
    np.asarray(out["loss"])
    chunked = BATCH * ACCUM * K * n_chunks / (time.perf_counter() - t0)

    if time.monotonic() > budget_end - 60:
        # the K=1 comparison pass is its own fresh compile; don't let a slow
        # compile window void the already-measured shipped-path number
        return {"chunked_k8": chunked,
                "per_step_dispatch": "skipped: bench time budget"}

    step = make_train_step(apply_train, make_loss_fn("bce_logits", 1.8), tx,
                           accum_steps=ACCUM, gather_data=True)

    def idx_batch():
        return {"indices": rng.randint(0, N, (ACCUM, BATCH)).astype(np.int32),
                "sample_mask": np.ones((ACCUM, BATCH), np.int32)}

    def per_step_pass():
        nonlocal state
        for i in range(WARMUP_STEPS):
            state, out = step(state, idx_batch(),
                              jax.random.fold_in(root, i), data)
            np.asarray(out["loss"])
        t0 = time.perf_counter()
        for i in range(TIMED_STEPS):
            state, out = step(state, idx_batch(),
                              jax.random.fold_in(root, 100 + i), data)
        np.asarray(out["loss"])
        return BATCH * ACCUM * TIMED_STEPS / (time.perf_counter() - t0)

    try:
        per_step = _with_timeout(per_step_pass,
                                 max(30, int(budget_end - time.monotonic())))
    except _Timeout:
        per_step = "timeout"
    return {"chunked_k8": chunked, "per_step_dispatch": per_step}


def bench_inference_p50():
    ucfg = UniterConfig(dtype="bfloat16", **PERF_STORAGE)
    model = MemeUniter(ucfg, n_classes=1)
    rng = np.random.RandomState(0)
    one = jax.tree.map(lambda x: x[0], _finetune_batch(rng, ucfg, BATCH, 1))
    params = model.init(jax.random.PRNGKey(0), one,
                        deterministic=True)["params"]

    @jax.jit
    def fwd(p, b):
        return model.apply({"params": p}, b, deterministic=True)

    np.asarray(fwd(params, one))
    # synced per-call latency includes the axon relay round trip (~25 ms
    # host↔TPU tunnel, not device time); the pipelined number is the
    # device-side batch latency (matches BASELINE.md round-1 methodology)
    times = []
    for _ in range(30):
        t0 = time.perf_counter()
        np.asarray(fwd(params, one))
        times.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    for _ in range(30):
        out = fwd(params, one)
    np.asarray(out)
    pipelined = (time.perf_counter() - t0) / 30
    return {"p50_synced_incl_relay_rtt": float(np.percentile(times, 50) * 1000),
            "per_batch_pipelined": pipelined * 1000}


def bench_text_only():
    import dataclasses

    from meme_challenge_tpu.models.text_models import (
        MODEL_DICT, TextBackbone, TransformerClassificationHead)

    # bert-base backbone, bf16 compute (reference text_based default model)
    cfg = dataclasses.replace(MODEL_DICT["bert"]["config"], dtype="bfloat16",
                              **PERF_STORAGE)
    model = TransformerClassificationHead(
        backbone=TextBackbone(cfg), num_classes=1, dropout=0.5,
        num_layers=1, hidden_dim=512, act="gelu", use_pool_output=True)
    B = 16
    rng = np.random.RandomState(0)
    vocab = cfg.vocab_size
    lens = rng.randint(8, T + 1, size=B)

    def micro():
        return {
            "input_ids": jnp.asarray(rng.randint(0, vocab, (B, T)),
                                     jnp.int32),
            "txt_mask": jnp.asarray(np.arange(T)[None] < lens[:, None],
                                    jnp.int32),
            "labels": jnp.asarray(rng.randint(0, 2, B), jnp.int32),
            "sample_mask": jnp.ones(B, jnp.int32),
        }

    device_batch = {k: jnp.stack([micro()[k] for _ in range(ACCUM)])
                    for k in micro()}
    params = model.init(jax.random.PRNGKey(0),
                        jax.tree.map(lambda x: x[0], device_batch),
                        deterministic=True)["params"]
    tcfg = TrainConfig(lr=3e-5, batch_size=B, gradient_accumulation=ACCUM,
                       scheduler="warmup_cosine", warmup_steps=500)
    loss_fn = make_loss_fn("bce_logits", 1.0)
    tx = _make_tx(tcfg, params)

    def apply_train(params_, b, rng_):
        return model.apply({"params": params_}, b, deterministic=False,
                           rngs={"dropout": rng_})

    step = make_train_step(apply_train, loss_fn, tx, accum_steps=ACCUM)
    sec = _time_steps(step, create_train_state(params, tx), device_batch)
    return B * ACCUM / sec


def bench_pretrain():
    """MLM / ITM(+IPOT) / MRFR / MRC task steps through the pretrain
    driver's step builder (MetaLoader fixes one task per accumulation
    group, data/pretrain.py). Each task is guarded by a share of the
    metric's wall-clock budget, anchored at FUNCTION ENTRY — the budget is
    set before any model/trainer construction, and the nested SIGALRMs
    replace the outer one from main(), so the per-metric cap holds even
    when the remote compile service is slow."""
    budget_end = _metric_end(PRETRAIN_TIMEOUT_S)  # anchor FIRST

    from meme_challenge_tpu.models.uniter import UniterForPretraining
    from meme_challenge_tpu.train.pretrain_driver import PretrainTrainer

    ucfg = UniterConfig(dtype="bfloat16", **PERF_STORAGE)
    model = UniterForPretraining(ucfg)
    B = 16
    rng = np.random.RandomState(0)
    lens = rng.randint(8, T + 1, size=B)
    img_lens = rng.randint(10, R + 1, size=B)

    def base_micro():
        txt_mask = (np.arange(T)[None] < lens[:, None]).astype(np.int32)
        img_mask = (np.arange(R)[None] < img_lens[:, None]).astype(np.int32)
        return {
            "input_ids": rng.randint(0, ucfg.vocab_size, (B, T)).astype(np.int32),
            "position_ids": np.tile(np.arange(T, dtype=np.int32), (B, 1)),
            "img_feat": rng.randn(B, R, ucfg.img_dim).astype(np.float16),
            "img_pos_feat": rng.rand(B, R, 7).astype(np.float32),
            "txt_mask": txt_mask, "img_mask": img_mask,
            "sample_mask": np.ones(B, np.int32),
        }

    def task_batch(task):
        m = base_micro()
        if task == "mlm":
            labels = np.full((B, T), -1, np.int32)
            labels[:, 1:4] = rng.randint(0, ucfg.vocab_size, (B, 3))
            m["txt_labels"] = labels
        elif task == "mrfr":
            img_masks = np.zeros((B, R), bool)
            img_masks[:, :5] = True
            m["img_masks"] = img_masks
            m["feat_targets"] = rng.randn(B, R, ucfg.img_dim).astype(np.float16)
        elif task == "itm":
            m["targets"] = rng.randint(0, 2, B).astype(np.int32)
        elif task.startswith("mrc"):
            img_masks = np.zeros((B, R), bool)
            img_masks[:, :5] = True
            m["img_masks"] = img_masks
            soft = rng.rand(B, R, 1601).astype(np.float32)
            m["label_targets"] = soft / soft.sum(-1, keepdims=True)
        return {k: jnp.stack([jnp.asarray(v)] * ACCUM) for k, v in m.items()}

    init_micro = dict(base_micro())
    init_micro.update(
        txt_labels=np.full((B, T), -1, np.int32),
        img_masks=np.zeros((B, R), bool),
        feat_targets=np.zeros((B, R, ucfg.img_dim), np.float16),
        label_targets=np.full((B, R, 1601), 1.0 / 1601, np.float32),
        targets=np.zeros(B, np.int32),
    )
    init_micro = {k: jnp.asarray(v) for k, v in init_micro.items()}
    params = model.init(jax.random.PRNGKey(0), init_micro, "init",
                        deterministic=True)["params"]
    tcfg = TrainConfig(lr=3e-5, batch_size=B, gradient_accumulation=ACCUM,
                       scheduler="warmup_cosine", warmup_steps=500)
    trainer = PretrainTrainer(tcfg, model, params, meta_loader=None,
                              steps_per_epoch=100, ot_weight=0.1)
    rates = {}

    def one_task(task):
        step = trainer._get_task_step(task)
        batch = task_batch(task)
        state = trainer.state
        root = jax.random.PRNGKey(0)
        for i in range(WARMUP_STEPS):
            state, losses = step(state, batch, jax.random.fold_in(root, i))
            np.asarray(losses)
        t0 = time.perf_counter()
        for i in range(10):
            state, losses = step(state, batch, jax.random.fold_in(root, 50 + i))
        np.asarray(losses)
        trainer.state = state
        return B * ACCUM / ((time.perf_counter() - t0) / 10)

    def measure_task(task):
        # each remote compile can take minutes; don't let a slow tail task
        # sink the metrics already measured
        if time.monotonic() > budget_end - 60:
            rates[task] = "skipped: bench time budget"
            return
        try:
            rates[task] = _with_timeout(
                lambda: one_task(task),
                max(30, int(budget_end - time.monotonic())))
        except _Timeout:
            rates[task] = "timeout"

    measure_task("mlm")

    def driver_loop():
        """The full PretrainTrainer.train loop (host MLM masking, fresh
        batch every step), not just the jitted step — DEVICE-RESIDENT mode:
        features stay in HBM and only the masked text + indices cross the
        host link per step. The host-STREAMING loop is not timed here: on
        the axon relay's ~8-20 MB/s tunnel it is channel-bound at ~10-20
        memes/s by upload bytes alone (measured r3, BASELINE.md) and its
        extra compile would eat the metric budget; upload_mb_per_step keeps
        that context legible."""
        import random as _random

        from meme_challenge_tpu.data.pretrain import (
            _batch_rng, mask_tokens_bert_batch)

        base = base_micro()
        special = (0, 101, 102)
        upload_mb = sum(np.asarray(v).nbytes for v in
                        dict(base, txt_labels=base["input_ids"]).values()
                        ) * ACCUM / 1e6

        # device-resident corpus: features stay in HBM, MLM text overlays.
        # 256 rows ≈ 105 MB of fp16 features — the one-time upload rides
        # the ~8-20 MB/s relay, so corpus size is budget, not realism
        N = 256
        data = {k: jnp.asarray(np.concatenate(
            [base[k]] * (N // B))) for k in
            ("input_ids", "position_ids", "img_feat", "img_pos_feat",
             "txt_mask", "img_mask")}

        def mlm_index_stream():
            # vectorized masking — the MLMBatcher default since r3b; the
            # per-token python path cost ~2 ms/batch of the loop budget
            step_i = 0
            while True:
                ids, labels = mask_tokens_bert_batch(
                    base["input_ids"], base["txt_mask"],
                    _batch_rng(_random), 0.15, 103,
                    (999, ucfg.vocab_size), special)
                yield ("mlm", {
                    "input_ids": ids, "txt_labels": labels,
                    "position_ids": base["position_ids"],
                    "txt_mask": base["txt_mask"],
                    "sample_mask": base["sample_mask"],
                    "indices": (np.arange(B, dtype=np.int32)
                                + (step_i * B) % N)})
                step_i += 1

        # ON-DEVICE param copy (one dispatch): trainer2's donated steps
        # must not consume the buffers trainer.state still references —
        # the itm/mrfr/mrc-kl tasks run AFTER this loop ("Array has been
        # deleted" otherwise); a host round-trip copy would be ~600 MB
        # through the relay
        params2 = jax.jit(lambda t: jax.tree.map(jnp.copy, t))(
            trainer.state.params)
        trainer2 = PretrainTrainer(tcfg, model, params2,
                                   meta_loader=mlm_index_stream(),
                                   steps_per_epoch=100, ot_weight=0.1)
        trainer2.data = data
        # warmup must cover BOTH compiles: the single-step fn and the K=8
        # same-task chunk fn (10 steps = one 8-chunk + 2 tail singles)
        trainer2.train(total_steps=10, log_every=100, save_checkpoint=False)
        n = 16  # multiple of K: the timed loop runs as two 8-step chunks
        t0 = time.perf_counter()
        trainer2.train(total_steps=n, log_every=100, save_checkpoint=False)
        resident = B * ACCUM * n / (time.perf_counter() - t0)
        return {"memes_per_sec_device_resident": resident,
                "streamed_upload_mb_per_step": upload_mb}

    # the r3 driver-loop metric runs BEFORE the remaining per-task steps:
    # itm/mrfr/mrc-kl are each one more fresh remote compile, and a slow
    # compile window should cost those tails, not the loop number
    if isinstance(rates.get("mlm"), float) and \
            time.monotonic() < budget_end - 45:
        try:
            rates["mlm_driver_loop"] = _with_timeout(
                driver_loop, max(30, int(budget_end - time.monotonic())))
        except _Timeout:
            rates["mlm_driver_loop"] = "timeout"
    else:
        rates["mlm_driver_loop"] = "skipped: bench time budget"

    for task in ("itm", "mrfr", "mrc-kl"):
        measure_task(task)

    def mlm_fused():
        # fuse_accum task step (one fused fwd/bwd over the flattened
        # [accum·B] batch, per-micro reductions) — lowest priority: a
        # fresh compile that must not cost the per-task rows above.
        # On-device param copy: trainer.state's buffers were donated
        params_f = jax.jit(lambda t: jax.tree.map(jnp.copy, t))(
            trainer.state.params)
        tr = PretrainTrainer(
            TrainConfig(lr=3e-5, batch_size=B, gradient_accumulation=ACCUM,
                        scheduler="warmup_cosine", warmup_steps=500,
                        fuse_accum=True),
            model, params_f, meta_loader=None, steps_per_epoch=100,
            ot_weight=0.1)
        step = tr._get_task_step("mlm")
        batch = task_batch("mlm")
        state = tr.state
        root = jax.random.PRNGKey(1)
        for i in range(WARMUP_STEPS):
            state, losses = step(state, batch, jax.random.fold_in(root, i))
            np.asarray(losses)
        t0 = time.perf_counter()
        for i in range(10):
            state, losses = step(state, batch,
                                 jax.random.fold_in(root, 50 + i))
        np.asarray(losses)
        return B * ACCUM / ((time.perf_counter() - t0) / 10)

    if isinstance(rates.get("mlm"), float) and \
            time.monotonic() < budget_end - 60:
        try:
            rates["mlm_fused"] = _with_timeout(
                mlm_fused, max(30, int(budget_end - time.monotonic())))
        except _Timeout:
            rates["mlm_fused"] = "timeout"
        except Exception as e:  # noqa: BLE001 — e.g. "Array has been
            # deleted" when an earlier task's alarm fired mid-donating-step;
            # the already-measured task rates above must survive
            rates["mlm_fused"] = f"error: {type(e).__name__}: {e}"[:200]
    else:
        rates["mlm_fused"] = "skipped: bench time budget"
    return rates


def bench_uniter_large():
    """UNITER-large recipe step, FUSED shape first: it is both faster at
    H=1024 (the b32-equivalent measured 329.7 vs 308.7 scan, r3) and the
    one that reliably FITS — the 24-layer scan-accum step OOMed HBM in the
    r4 toolchain window (13.3 G program, 49.8% fragmentation) while the
    fused step ran fine. Each variant is guarded so one failure (OOM,
    compile-window timeout — this row has been lost to both) cannot sink
    the other's number."""
    budget_end = _metric_end(UNITER_LARGE_TIMEOUT_S)

    def one(fuse):
        ucfg = UniterConfig(dtype="bfloat16", **PERF_STORAGE,
                            hidden_size=1024, num_hidden_layers=24,
                            num_attention_heads=16, intermediate_size=4096)
        _, _, step, state, batch = _build_finetune(ucfg, fuse_accum=fuse)
        sec = _time_steps(step, state, batch, steps=15, warmup=2)
        return BATCH * ACCUM / sec

    out = {}
    for fuse, key in ((True, "fused_accum_flat32"),
                      (False, "scan_accum_b16x2")):
        if time.monotonic() > budget_end - 120:
            out[key] = "skipped: bench time budget"
            continue
        try:
            out[key] = _with_timeout(
                lambda: one(fuse),
                max(30, int(budget_end - time.monotonic())))
        except _Timeout:
            out[key] = "timeout"
        except Exception as e:  # noqa: BLE001 — e.g. the scan-shape OOM
            out[key] = f"error: {type(e).__name__}: {e}"[:200]
    return out


def bench_extraction():
    """Detector feature extraction s/img (reference utils/extractor.py logs
    the same number), mode 1, synthetic 600×800 images, full R101 graph.
    Reports every blob-transfer mode: fp32 (bit-parity default), bf16
    (~2e-4 rel feature err) and uint8 (device mean-sub, <=0.5/255 rounding)."""
    import dataclasses

    from meme_challenge_tpu.extract.detector import (
        DetectorConfig, FeatureExtractor, init_detector_params)

    rng = np.random.RandomState(0)
    params = init_detector_params(DetectorConfig(), jax.random.PRNGKey(0))
    imgs = [(rng.rand(600, 800, 3) * 255).astype(np.uint8)
            for _ in range(8)]
    out = {}
    for dt in ("float32", "bfloat16", "uint8"):
        cfg = dataclasses.replace(DetectorConfig(), blob_transfer_dtype=dt)
        ex = FeatureExtractor(cfg, params)
        ex.extract_batch(imgs[:2])  # compile + warm
        t0 = time.perf_counter()
        ex.extract_batch(imgs)
        out[f"blob_{dt}"] = (time.perf_counter() - t0) / len(imgs)
    return out


def bench_window_fingerprint():
    """~10 s microprobe characterizing the relay window this capture ran in.

    The headline swings ±40% between the relay's fast and slow launch-
    overhead regimes (BASELINE.md two-regime narrative), so every artifact
    records the window it was captured in: per-dispatch RTT synced vs
    chained (launch-overhead regime) and H2D bandwidth via one timed ~13 MB
    upload (feature-upload regime). A future slow-window capture then reads
    as "slow window", not as a regression."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 8), jnp.float32)
    np.asarray(f(x))  # compile + first round trip
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(f(x))  # np.asarray: the only reliable relay barrier
        ts.append(time.perf_counter() - t0)
    synced_ms = float(np.median(ts)) * 1000
    y = x
    t0 = time.perf_counter()
    for _ in range(50):
        y = f(y)
    np.asarray(y)
    chained_ms = (time.perf_counter() - t0) / 50 * 1000
    payload = np.zeros((32, 100, 2048), np.float16)  # 13.1 MB, feature-like
    t0 = time.perf_counter()
    dev = jax.device_put(payload)
    np.asarray(dev[0, 0, :1])  # force the transfer to completion
    h2d = payload.nbytes / 1e6 / (time.perf_counter() - t0)
    return {"dispatch_rtt_synced_ms": synced_ms,
            "dispatch_chained_ms": chained_ms,
            "h2d_mb_per_s": h2d}


# (name, fn, nominal_budget_s, retries) — nominal budgets are CEILINGS:
# _run_extra clamps each to the remaining global budget, and entries are
# skipped outright once the budget can't fund a meaningful attempt, so the
# ORDER is a priority list. UNITER-large leads (it has missed four
# consecutive driver artifacts); pretrain — the longest and the best
# covered by prior BASELINE rows — goes last. Retries exist because the
# remote compile service caches by HLO hash server-side, so a retry after
# a timed-out compile usually lands on the warm entry. (JAX's persistent
# compilation cache is a no-op on this backend: the axon PJRT client
# doesn't serialize executables.)
EXTRA_TABLE = [
    ("uniter_large_memes_per_sec", bench_uniter_large,
     UNITER_LARGE_TIMEOUT_S, 1),
    ("inference_ms_batch16", bench_inference_p50, 300, 0),
    ("extraction_sec_per_img", bench_extraction, EXTRA_TIMEOUT_S, 0),
    ("text_only_bert_memes_per_sec", bench_text_only, 360, 0),
    ("finetune_loop_memes_per_sec", bench_finetune_loop,
     FINETUNE_LOOP_TIMEOUT_S, 1),  # gather-variant step = own compile
    ("pretrain_memes_per_sec_by_task", bench_pretrain,
     PRETRAIN_TIMEOUT_S, 0),
]


def _bad(v):
    """True when a recorded metric is an error/timeout marker (str leaves
    inside a dict-valued metric count too, except deliberate skips)."""
    if isinstance(v, dict):
        return any(_bad(x) for x in v.values())
    return isinstance(v, str) and not v.startswith("skipped")


def _merge_prefer_numeric(old, new):
    """Combine two attempts of the same metric tree: an already-measured
    NUMERIC leaf is never overwritten (a retry in a worse relay window, or
    a retry that itself errors, must not lose a valid number); error/
    timeout markers are filled from the newer attempt."""
    if isinstance(old, dict) and isinstance(new, dict):
        return {k: _merge_prefer_numeric(old.get(k), new.get(k))
                for k in {**old, **new}}
    if old is None or isinstance(old, str):
        return old if new is None else new
    return old


def _run_extra(fn, budget, retries):
    """Run one extra metric under its alarm budget; returns the rounded
    value tree or an ``"error: ..."``/``"timeout"`` string. A retry also
    fires when the RETURNED tree contains error/timeout markers (metrics
    like bench_uniter_large guard their variants internally and return
    marker strings instead of raising); numeric leaves from earlier
    attempts always survive the merge.

    ``budget`` is a nominal ceiling: every attempt is re-clamped to what
    remains of the GLOBAL capture budget, and retries stop when the global
    budget can no longer fund a meaningful attempt."""
    global _metric_deadline
    result = "error: not run"
    for attempt in range(retries + 1):
        armed = int(min(budget, _remaining() - _EMIT_MARGIN_S))
        # skip only when the GLOBAL budget forced the clamp below a useful
        # attempt (a deliberately small nominal budget still runs)
        if armed < max(1, min(budget, 30)):
            return _merge_prefer_numeric(result,
                                         "skipped: global bench budget")
        _metric_deadline = time.monotonic() + armed
        try:
            rounded = jax.tree.map(
                lambda v: v if isinstance(v, str) else round(float(v), 3),
                _with_timeout(fn, armed))
        except Exception as e:  # noqa: BLE001 — report, don't sink the run
            if not isinstance(e, _Timeout):
                return _merge_prefer_numeric(
                    result, f"error: {type(e).__name__}: {e}"[:200])
            rounded = "timeout"
        finally:
            _metric_deadline = None
        result = _merge_prefer_numeric(result, rounded)
        if not _bad(result):
            return result
    return result


def _run_headline(only=None, on_variant=None):
    """Measure the recipe-faithful step shapes (see :func:`bench_headline`)
    and headline the best; each variant's number is recorded in extras
    via the returned detail dict. The chunked variant runs first (the
    shipped Trainer dispatch and the r5 sweep's best — its number becomes
    the provisional line as fast as possible); the scan variant gets a
    retry (it is the round-over-round comparison row). Per-variant timeouts are clamped to the remaining global budget,
    and a variant whose attempt can't be funded is marked skipped.

    ``only``: optional set of variant keys to measure (the salvage pass
    re-runs just the errored variant instead of burning relay time
    re-measuring a number it already has). ``on_variant(detail, best)`` is
    called after each measured variant — main() uses it to emit a
    provisional result line the moment the first number lands."""
    detail = {}
    headline, err = 0.0, None
    for variant, key, attempts in (
            ("fused_chunked_k8", "fused_chunked_k8", 1),
            ("fused", "fused_accum_flat32", 1),
            ("scan", "scan_accum_b16x2", 2)):
        if only is not None and key not in only:
            continue
        val, e = 0.0, None
        for _ in range(attempts):
            armed = int(min(600, _remaining() - _EMIT_MARGIN_S))
            if armed < 60:
                e = "skipped: global bench budget"
                break
            try:
                val = _with_timeout(lambda: bench_headline(variant), armed)
                e = None
                break
            except Exception as ex:  # noqa: BLE001
                e = f"error: {type(ex).__name__}: {ex}"[:200]
                if not isinstance(ex, _Timeout):
                    break
        detail[key] = round(val, 1) if e is None else e
        if e is None and val > headline:
            headline = val
        if on_variant is not None:
            on_variant(dict(detail), headline)
    if headline <= 0.0:
        err = "; ".join(str(v) for v in detail.values())
    return headline, err, detail


def main():
    # Emission guards: the driver's outer timeout (SIGTERM) and any other
    # exit path must still leave the best-known line on stdout — round 4's
    # artifact was empty precisely because nothing printed until the very
    # end of main().
    signal.signal(signal.SIGTERM, _on_sigterm)
    atexit.register(_atexit_emit)
    extras = _line["extra_metrics"]
    # Placeholder line FIRST: a kill during startup/probe/first-compile may
    # arrive while the main thread is blocked in C++ (XLA compile, relay
    # recv), where the Python SIGTERM handler is deferred indefinitely and a
    # follow-up SIGKILL leaves nothing. With this line the tail always
    # parses, whatever instant the run dies at.
    extras["note"] = ("startup — placeholder line, overwritten by richer "
                      "lines as metrics land")
    _emit()
    del extras["note"]

    # Relay watchdog: the first in-process device contact would hang
    # UNINTERRUPTIBLY if the tunnel is down — probe in a subprocess with a
    # backoff schedule derived from the remaining budget, reserving ~7 min
    # to actually measure the headline once the relay answers.
    ok, probe_detail, waited = _probe_until_reachable(
        budget_s=_remaining() - 420)
    if not ok:
        extras["error"] = ("device backend unreachable over "
                           f"{waited / 60:.1f} min of probing within the "
                           f"{BENCH_BUDGET_S:.0f} s budget; no measurement "
                           f"possible. Last probe: {probe_detail}")
        _emit_final()
        return
    if waited:
        extras["probe_waited_out_outage_min"] = round(waited / 60, 1)

    # Window fingerprint FIRST: 10 s that make every later number
    # self-explaining (fast vs slow relay regime), captured before the
    # budget can run out.
    extras["window"] = _run_extra(bench_window_fingerprint, 90, 0)
    _emit()

    def provisional(detail, best):
        extras["headline_variants"] = detail
        if best > 0.0:
            _set_headline(best)
        _emit()

    headline, headline_err, headline_detail = _run_headline(
        on_variant=provisional)
    extras["headline_variants"] = headline_detail
    if headline > 0.0:
        _set_headline(headline)
    _emit()
    for name, fn, budget, retries in EXTRA_TABLE:
        extras[name] = _run_extra(fn, budget, retries)
        _emit()  # each completed metric updates the tail line

    # End-of-run salvage: a mid-capture relay brown-out zeroes whichever
    # metric it hits. If the budget still has room, re-probe (short
    # backoff) and give the headline plus every errored extra one more
    # attempt before the final line.
    needs_salvage = (headline <= 0.0 or headline_err is not None or
                     any(_bad(v) for v in extras.values()))
    if needs_salvage and _remaining() > 240:
        ok, _, rewait = _probe_until_reachable(
            budget_s=min(_remaining() - 120, 500))
        if ok:
            if rewait:
                extras["salvage_waited_min"] = round(rewait / 60, 1)
            bad_variants = {k for k, v in
                            extras.get("headline_variants", {}).items()
                            if _bad(v)}
            if headline <= 0.0 or headline_err is not None or bad_variants:
                # re-run ONLY the errored variants (e.g. fused timed out
                # while scan landed) and MERGE: an already-measured number
                # must survive even if the salvage window browns out too
                _, _, new_detail = _run_headline(only=bad_variants or None)
                headline_detail = _merge_prefer_numeric(headline_detail,
                                                        new_detail)
                extras["headline_variants"] = headline_detail
                numeric = [v for v in headline_detail.values()
                           if isinstance(v, (int, float))]
                if numeric:
                    headline, headline_err = max(numeric), None
                    _set_headline(headline)
                else:
                    headline_err = "; ".join(
                        str(v) for v in headline_detail.values())
                _emit()
            for name, fn, budget, retries in EXTRA_TABLE:
                if _bad(extras.get(name)) and _remaining() > 60:
                    extras[name] = _merge_prefer_numeric(
                        extras.get(name), _run_extra(fn, budget, retries))
                    _emit()
        else:
            extras["salvage_skipped"] = "relay unreachable at end of run"
    elif needs_salvage:
        extras["salvage_skipped"] = "global bench budget exhausted"
    if headline_err is not None:
        extras["headline_error"] = headline_err
    _emit_final()


if __name__ == "__main__":
    main()
