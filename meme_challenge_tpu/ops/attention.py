"""Fused multi-head attention Pallas kernel.

The reference's hot loop is BertSelfAttention (model/layer.py:75-101):
``softmax(QKᵀ/√d + bias) @ V`` at joint sequence ≤ 160 (60 text + 100 boxes)
— *tiny* by flash-attention standards. The whole [S, S] score tile fits in
VMEM (160×160 fp32 = 100 KB), so instead of a streaming online-softmax
kernel this is a single-tile fused kernel per (batch, head) grid cell:

- one MXU matmul for Q·Kᵀ (fp32 accumulate), bias add, fp32 softmax and the
  P·V matmul fused in one Pallas program — the [S, S] probability matrix
  never touches HBM (XLA's unfused path writes it out between ops);
- custom VJP with a fused backward kernel that *recomputes* softmax from the
  (cheap) score matmul instead of storing P — classic rematerialization:
  HBM traffic traded for MXU FLOPs.

Masking: additive bias [B, 1, 1, S] (the −10000 padding mask from
model/model.py:342-345), broadcast over heads/queries inside the kernel.

Used by StackedEncoder when ``UniterConfig.use_pallas_attention`` is set
(dropout-free paths: eval, inference, and training with
attention_probs_dropout_prob == 0).
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


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    q = q_ref[0, 0].astype(jnp.float32)            # [S, D]
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    bias = bias_ref[0, 0]                          # [1, S] fp32
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = s + bias                                   # broadcast over queries
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32) / denom
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    bias = bias_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    # recompute softmax (rematerialization: no P stored between fwd and bwd)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale + bias
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / denom                                   # [S, S]
    dv = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # pᵀ @ do  [S, D]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)         # do @ vᵀ  [S, S]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # dsᵀ @ q
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _bh_specs(B, H, S, D):
    qkv = pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h, 0, 0),
                       memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((1, 1, 1, S), lambda b, h: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return qkv, bias


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_attention(q: Array, k: Array, v: Array, bias: Array,
                    scale: float) -> Array:
    """softmax(q·kᵀ·scale + bias)·v, fused. q/k/v: [B, H, S, D];
    bias: [B, 1, 1, S] additive fp32 mask. Returns [B, H, S, D] in q.dtype."""
    return _forward(q, k, v, bias, scale)


def _forward(q, k, v, bias, scale):
    B, H, S, D = q.shape
    qkv_spec, bias_spec = _bh_specs(B, H, S, D)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(B, H),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=qkv_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=_interpret(),
    )(q, k, v, bias.astype(jnp.float32))


def _fwd_rule(q, k, v, bias, scale):
    out = _forward(q, k, v, bias, scale)
    return out, (q, k, v, bias)


def _bwd_rule(scale, residuals, g):
    q, k, v, bias = residuals
    B, H, S, D = q.shape
    qkv_spec, bias_spec = _bh_specs(B, H, S, D)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        grid=(B, H),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, qkv_spec],
        out_specs=(qkv_spec, qkv_spec, qkv_spec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=_interpret(),
    )(q, k, v, bias.astype(jnp.float32), g)
    return dq, dk, dv, None


fused_attention.defvjp(_fwd_rule, _bwd_rule)


def reference_attention(q, k, v, bias, scale):
    """Unfused XLA reference (same math) for parity tests."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)
