"""Fused multi-head attention Pallas kernel with in-kernel PRNG dropout.

The reference's hot loop is BertSelfAttention (model/layer.py:75-101):
``dropout(softmax(QKᵀ/√d + bias)) @ V`` at joint sequence ≤ 160 (60 text +
100 boxes) — *tiny* by flash-attention standards. The whole [H, S, S] score
block for one sample fits in VMEM (12×160×160 fp32 ≈ 1.2 MB), so instead of
a streaming online-softmax kernel this is a single-program-per-sample fused
kernel (grid = [B]) that batches all H heads through the MXU at once:

- one batched MXU matmul for Q·Kᵀ (fp32 accumulate), bias add, fp32 softmax,
  attention dropout, and the P·V matmul fused in one Pallas program — the
  [H, S, S] probability matrix and its dropout mask never touch HBM (XLA's
  unfused path writes both out between ops);
- **in-kernel dropout** via the TPU hardware PRNG (``pltpu.prng_seed`` +
  ``pltpu.prng_random_bits``): the per-sample seed is an SMEM scalar, so the
  backward kernel *regenerates* the identical mask instead of storing
  [B, H, S, S] keep bits (reference applies dropout to attention probs,
  model/layer.py:86-88);
- custom VJP with a fused backward kernel that recomputes softmax from the
  (cheap) score matmul instead of storing P — classic rematerialization:
  HBM traffic traded for MXU FLOPs.

Masking: additive bias [B, 1, 1, S] (the −10000 padding mask from
model/model.py:342-345), broadcast over heads/queries inside the kernel.

Used by StackedEncoder when ``UniterConfig.use_pallas_attention`` is set —
including training with attention_probs_dropout_prob > 0 (the reference
reproduction recipe), which round 1's kernel could not serve.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _interpret() -> bool:
    """Pallas interpreter mode off-TPU (CPU tests / virtual meshes)."""
    return jax.devices()[0].platform != "tpu"


def _dropout_scale(rate: float) -> jnp.ndarray:
    return jnp.float32(1.0 / (1.0 - rate))


def _hash_bits(shape, seed):
    """Counter-based uint32 bits (murmur3 finalizer over a linear index).

    Interpret-mode stand-in for the TPU hardware PRNG: pure uint32 VPU ops,
    lowerable on every backend, deterministic in (seed, position) — the
    property the backward pass relies on to regenerate the mask.
    """
    H, S1, S2 = shape
    idx = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * jnp.uint32(S1 * S2)
           + jax.lax.broadcasted_iota(jnp.uint32, shape, 1) * jnp.uint32(S2)
           + jax.lax.broadcasted_iota(jnp.uint32, shape, 2))
    x = idx ^ (seed.astype(jnp.uint32) * jnp.uint32(2654435761))
    x = (x ^ (x >> 16)) * jnp.uint32(0x85EBCA6B)
    x = (x ^ (x >> 13)) * jnp.uint32(0xC2B2AE35)
    return x ^ (x >> 16)


def _keep_mask(shape, rate: float, seed, interpret: bool):
    """Regenerable keep mask. Drop iff bits < rate·2³² (P(drop) = rate to
    within 2⁻³²). On TPU the bits come from the already-seeded hardware PRNG;
    in interpret mode from a counter hash (same determinism contract)."""
    if interpret:
        bits = _hash_bits(shape, seed)
    else:
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    return bits >= threshold


def _softmax_fwd(q, k, bias, scale, rate, seed, interpret):
    """Shared fwd math: q/k/v [H, S, D] fp32, bias [1, S] fp32."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale    # [H, S, S]
    s = s + bias[None]                                 # broadcast H, queries
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / denom                                      # [H, S, S]
    if rate > 0.0:
        keep = _keep_mask(p.shape, rate, seed, interpret)
        p = jnp.where(keep, p * _dropout_scale(rate), 0.0)
    return p


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                scale, rate, interpret):
    seed = seed_ref[pl.program_id(0)]
    if rate > 0.0 and not interpret:
        # unique stream per (sample, step, layer): host passes per-sample
        # seeds; identical reseed in the backward regenerates the mask
        pltpu.prng_seed(seed)
    q = q_ref[0]                                       # [H, S, D] bf16 ok:
    k = k_ref[0]                                       # MXU takes bf16 in,
    v = v_ref[0]                                       # accumulates fp32
    bias = bias_ref[0, 0]                              # [1, S] fp32
    p = _softmax_fwd(q, k, bias, scale, rate, seed, interpret)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [H, S, D]
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, rate, interpret):
    seed = seed_ref[pl.program_id(0)]
    if rate > 0.0 and not interpret:
        pltpu.prng_seed(seed)                          # same stream as fwd
    q = q_ref[0]                                       # bf16 operands,
    k = k_ref[0]                                       # fp32 accumulation
    v = v_ref[0]
    bias = bias_ref[0, 0]
    do = do_ref[0]
    # recompute softmax + dropout mask (rematerialization: neither P nor the
    # mask is stored between fwd and bwd)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale + bias[None]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / denom                                      # pre-dropout probs
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # do @ vᵀ  [H, S, S]
    if rate > 0.0:
        keep = _keep_mask(p.shape, rate, seed, interpret)
        pd = jnp.where(keep, p * _dropout_scale(rate), 0.0)  # dropped probs
        dp = jnp.where(keep, dp * _dropout_scale(rate), 0.0)  # chain rule
    else:
        pd = p
    dv = jax.lax.dot_general(
        pd.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # pdᵀ @ do  [H, S, D]
    # softmax VJP wrt pre-dropout p with incoming dp
    ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))).astype(q.dtype)
    dq = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale    # dsᵀ @ q
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _specs(B, H, S, D):
    # rank-1 SMEM blocks must span the array on TPU; index by program_id
    seed = pl.BlockSpec((B,), lambda b: (0,), memory_space=pltpu.SMEM)
    qkv = pl.BlockSpec((1, H, S, D), lambda b: (b, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((1, 1, 1, S), lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return seed, qkv, bias


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention(q: Array, k: Array, v: Array, bias: Array,
                    scale: float, dropout_rate: float = 0.0,
                    seeds: Array | None = None) -> Array:
    """dropout(softmax(q·kᵀ·scale + bias))·v, fused per sample.

    q/k/v: [B, H, S, D]; bias: [B, 1, 1, S] additive fp32 mask;
    seeds: [B] int32 per-sample PRNG seeds (required iff dropout_rate > 0 —
    derive from the step/layer dropout key so masks differ per call).
    Returns [B, H, S, D] in q.dtype.
    """
    return _forward(q, k, v, bias, scale, dropout_rate, seeds)


def _seed_arg(q, seeds):
    if seeds is None:
        return jnp.zeros((q.shape[0],), jnp.int32)
    return seeds.astype(jnp.int32)


def _forward(q, k, v, bias, scale, rate, seeds):
    B, H, S, D = q.shape
    seed_spec, qkv_spec, bias_spec = _specs(B, H, S, D)
    interpret = _interpret()
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, rate=rate,
                          interpret=interpret),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(B,),
        in_specs=[seed_spec, qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=qkv_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(_seed_arg(q, seeds), q, k, v, bias.astype(jnp.float32))


def _fwd_rule(q, k, v, bias, scale, rate, seeds):
    out = _forward(q, k, v, bias, scale, rate, seeds)
    return out, (q, k, v, bias, seeds)


def _bwd_rule(scale, rate, residuals, g):
    q, k, v, bias, seeds = residuals
    B, H, S, D = q.shape
    seed_spec, qkv_spec, bias_spec = _specs(B, H, S, D)
    interpret = _interpret()
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, rate=rate,
                          interpret=interpret),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        grid=(B,),
        in_specs=[seed_spec, qkv_spec, qkv_spec, qkv_spec, bias_spec,
                  qkv_spec],
        out_specs=(qkv_spec, qkv_spec, qkv_spec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(_seed_arg(q, seeds), q, k, v, bias.astype(jnp.float32), g)
    return dq, dk, dv, None, None


fused_attention.defvjp(_fwd_rule, _bwd_rule)


# --------------------------------------------------------------------------
# Pair-blocked variant: flatten (B, H) into one axis and process BLOCK pairs
# per grid step — fewer, fatter grid steps than the per-sample kernel (e.g.
# 6 steps of 32 pairs instead of 16 steps of 12 heads at B16/H12), so each
# step feeds the MXU a bigger batched matmul. Dropout draws one PRNG stream
# per grid step (seeds are per-block, not per-sample) — a different but
# equally valid mask distribution, regenerated identically in the backward.
# --------------------------------------------------------------------------

def _largest_block(g: int, cap: int = 24) -> int:
    # cap 24: the S=160 backward kernel at block 32 overflows the 16 MB
    # scoped-VMEM stack by 40 KB (measured on v5e); 24 leaves headroom
    for b in range(min(cap, g), 0, -1):
        if g % b == 0:
            return b
    return 1


def blocked_seed_count(batch: int, num_heads: int) -> int:
    """Number of per-grid-step dropout seeds :func:`fused_attention_blocked`
    consumes for a ``[batch, num_heads, ...]`` input.

    The single public home of the block-size policy: callers building seed
    arrays (e.g. the encoder) MUST use this rather than re-deriving from
    ``_largest_block``, so a future cap change or per-shape heuristic cannot
    desynchronize the seed array from the kernel's grid."""
    g = batch * num_heads
    return g // _largest_block(g)


def _blk_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                    scale, rate, interpret):
    seed = seed_ref[pl.program_id(0)]
    if rate > 0.0 and not interpret:
        pltpu.prng_seed(seed)
    q, k, v = q_ref[...], k_ref[...], v_ref[...]      # [blk, S, D]
    bias = bias_ref[...]                              # [blk, S]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    s = s + bias[:, None, :]                          # broadcast queries
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    if rate > 0.0:
        keep = _keep_mask(p.shape, rate, seed, interpret)
        p = jnp.where(keep, p * _dropout_scale(rate), 0.0)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _blk_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                    dq_ref, dk_ref, dv_ref, *, scale, rate, interpret):
    seed = seed_ref[pl.program_id(0)]
    if rate > 0.0 and not interpret:
        pltpu.prng_seed(seed)
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    bias = bias_ref[...]
    do = do_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale + bias[:, None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    if rate > 0.0:
        keep = _keep_mask(p.shape, rate, seed, interpret)
        pd = jnp.where(keep, p * _dropout_scale(rate), 0.0)
        dp = jnp.where(keep, dp * _dropout_scale(rate), 0.0)
    else:
        pd = p
    dv = jax.lax.dot_general(
        pd.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))).astype(q.dtype)
    dq = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _blk_specs(n_blocks, blk, S, D):
    seed = pl.BlockSpec((n_blocks,), lambda i: (0,),
                        memory_space=pltpu.SMEM)
    pairs = pl.BlockSpec((blk, S, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((blk, S), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return seed, pairs, bias


def _blk_flatten(q, k, v, bias):
    B, H, S, D = q.shape
    G = B * H
    qf, kf, vf = (t.reshape(G, S, D) for t in (q, k, v))
    bias_f = jnp.repeat(bias.astype(jnp.float32).reshape(B, -1)[:, -S:],
                        H, axis=0)                     # [G, S]
    return qf, kf, vf, bias_f


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention_blocked(q: Array, k: Array, v: Array, bias: Array,
                            scale: float, dropout_rate: float = 0.0,
                            seeds: Array | None = None) -> Array:
    """Pair-blocked fused attention; same signature as :func:`fused_attention`
    except ``seeds`` is per-GRID-STEP ([ceil(B*H/block)] int32)."""
    return _blk_forward(q, k, v, bias, scale, dropout_rate, seeds)


def _blk_seed_arg(n_blocks, seeds):
    if seeds is None:
        return jnp.zeros((n_blocks,), jnp.int32)
    s = seeds.astype(jnp.int32).reshape(-1)
    assert s.shape[0] >= n_blocks, (s.shape, n_blocks)
    return s[:n_blocks]


def _blk_forward(q, k, v, bias, scale, rate, seeds):
    B, H, S, D = q.shape
    G = B * H
    blk = _largest_block(G)
    n_blocks = G // blk
    qf, kf, vf, bias_f = _blk_flatten(q, k, v, bias)
    seed_spec, pair_spec, bias_spec = _blk_specs(n_blocks, blk, S, D)
    interpret = _interpret()
    out = pl.pallas_call(
        functools.partial(_blk_fwd_kernel, scale=scale, rate=rate,
                          interpret=interpret),
        out_shape=jax.ShapeDtypeStruct((G, S, D), q.dtype),
        grid=(n_blocks,),
        in_specs=[seed_spec, pair_spec, pair_spec, pair_spec, bias_spec],
        out_specs=pair_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(_blk_seed_arg(n_blocks, seeds), qf, kf, vf, bias_f)
    return out.reshape(B, H, S, D)


def _blk_fwd_rule(q, k, v, bias, scale, rate, seeds):
    return _blk_forward(q, k, v, bias, scale, rate, seeds), (q, k, v, bias,
                                                             seeds)


def _blk_bwd_rule(scale, rate, residuals, g):
    q, k, v, bias, seeds = residuals
    B, H, S, D = q.shape
    G = B * H
    blk = _largest_block(G)
    n_blocks = G // blk
    qf, kf, vf, bias_f = _blk_flatten(q, k, v, bias)
    gf = g.reshape(G, S, D)
    seed_spec, pair_spec, bias_spec = _blk_specs(n_blocks, blk, S, D)
    interpret = _interpret()
    dq, dk, dv = pl.pallas_call(
        functools.partial(_blk_bwd_kernel, scale=scale, rate=rate,
                          interpret=interpret),
        out_shape=(jax.ShapeDtypeStruct((G, S, D), q.dtype),
                   jax.ShapeDtypeStruct((G, S, D), k.dtype),
                   jax.ShapeDtypeStruct((G, S, D), v.dtype)),
        grid=(n_blocks,),
        in_specs=[seed_spec, pair_spec, pair_spec, pair_spec, bias_spec,
                  pair_spec],
        out_specs=(pair_spec, pair_spec, pair_spec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(_blk_seed_arg(n_blocks, seeds), qf, kf, vf, bias_f, gf)
    rs = lambda t: t.reshape(B, H, S, D)
    return rs(dq), rs(dk), rs(dv), None, None


fused_attention_blocked.defvjp(_blk_fwd_rule, _blk_bwd_rule)


def reference_attention(q, k, v, bias, scale):
    """Unfused XLA reference (same math, no dropout) for parity tests."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)
