"""Fused Pallas attention: forward + gradient parity vs the unfused XLA
reference (interpret mode on CPU), in-kernel dropout semantics, and encoder
integration."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meme_challenge_tpu.ops.attention import (
    fused_attention,
    reference_attention,
)


def _inputs(rng, B=2, H=3, S=24, D=8):
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    lens = rng.randint(4, S + 1, size=B)
    mask = (np.arange(S)[None] < lens[:, None]).astype(np.float32)
    bias = jnp.asarray((1.0 - mask) * -10000.0)[:, None, None, :]
    return q, k, v, bias


def test_forward_matches_reference(rng):
    q, k, v, bias = _inputs(rng)
    scale = 1.0 / np.sqrt(q.shape[-1])
    out = fused_attention(q, k, v, bias, scale)
    ref = reference_attention(q, k, v, bias, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gradients_match_reference(rng):
    q, k, v, bias = _inputs(rng, B=2, H=2, S=16, D=8)
    scale = 1.0 / np.sqrt(q.shape[-1])

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, bias, scale) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v, bias, scale) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fused, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=1e-3, err_msg=f"d{name}")


# ---------------------------------------------------------------------------
# In-kernel dropout
# ---------------------------------------------------------------------------

def _numpy_hash_bits(shape, seed):
    """Replica of ops.attention._hash_bits (interpret-mode PRNG) in numpy."""
    H, S1, S2 = shape
    idx = (np.arange(H, dtype=np.uint32)[:, None, None] * np.uint32(S1 * S2)
           + np.arange(S1, dtype=np.uint32)[None, :, None] * np.uint32(S2)
           + np.arange(S2, dtype=np.uint32)[None, None, :])
    with np.errstate(over="ignore"):
        x = idx ^ (np.uint32(seed) * np.uint32(2654435761))
        x = (x ^ (x >> np.uint32(16))) * np.uint32(0x85EBCA6B)
        x = (x ^ (x >> np.uint32(13))) * np.uint32(0xC2B2AE35)
    return x ^ (x >> np.uint32(16))


def _masked_reference(q, k, v, bias, scale, rate, seeds):
    """Pure-numpy attention applying the EXACT interpret-mode dropout mask."""
    B, H, S, D = q.shape
    s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k)) * scale
    s = s + np.asarray(bias)
    e = np.exp(s - s.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    threshold = np.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    out = np.empty_like(p)
    for b in range(B):
        keep = _numpy_hash_bits((H, S, S), int(seeds[b])) >= threshold
        out[b] = np.where(keep, p[b] / (1.0 - rate), 0.0)
    return np.einsum("bhqk,bhkd->bhqd", out, np.asarray(v))


def test_dropout_forward_matches_mask_oracle(rng):
    q, k, v, bias = _inputs(rng)
    scale = 1.0 / np.sqrt(q.shape[-1])
    seeds = jnp.asarray([3, 91], jnp.int32)
    out = np.asarray(fused_attention(q, k, v, bias, scale, 0.25, seeds))
    ref = _masked_reference(q, k, v, bias, scale, 0.25, np.asarray(seeds))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_dropout_deterministic_in_seed(rng):
    q, k, v, bias = _inputs(rng)
    scale = 1.0 / np.sqrt(q.shape[-1])
    seeds = jnp.asarray([11, 12], jnp.int32)
    a = fused_attention(q, k, v, bias, scale, 0.3, seeds)
    b = fused_attention(q, k, v, bias, scale, 0.3, seeds)
    c = fused_attention(q, k, v, bias, scale, 0.3, seeds + 5)
    assert bool(jnp.all(a == b))
    assert bool(jnp.any(a != c))


def test_dropout_gradients_match_mask_oracle(rng):
    """Fused backward (mask regenerated from the seed) vs jax.grad of an
    unfused implementation using the SAME explicit mask."""
    q, k, v, bias = _inputs(rng, B=2, H=2, S=16, D=8)
    B, H, S, D = q.shape
    scale = 1.0 / np.sqrt(D)
    rate = 0.3
    seeds = np.array([5, 23], np.int64)
    threshold = np.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    keep = np.stack([_numpy_hash_bits((H, S, S), int(s)) >= threshold
                     for s in seeds])
    keep = jnp.asarray(keep)

    def loss_fused(q, k, v):
        out = fused_attention(q, k, v, bias, scale, rate,
                              jnp.asarray(seeds, jnp.int32))
        return jnp.sum(out ** 2)

    def loss_oracle(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale + bias
        p = jax.nn.softmax(s, axis=-1)
        p = jnp.where(keep, p / (1.0 - rate), 0.0)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, v) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fused, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=1e-3, err_msg=f"d{name}")


def test_dropout_keep_fraction(rng):
    """Fraction of zeroed attention outputs ≈ rate on a diagonal-ish case."""
    S = 64
    rate = 0.4
    # identity-like v so each output element reflects one prob row
    q = jnp.zeros((1, 2, S, 8))
    k = jnp.zeros((1, 2, S, 8))
    v = jnp.asarray(rng.randn(1, 2, S, 8), jnp.float32)
    bias = jnp.zeros((1, 1, 1, S))
    out = np.asarray(fused_attention(q, k, v, bias, 1.0, rate,
                                     jnp.asarray([17], jnp.int32)))
    # uniform probs -> output mean should stay ~unbiased (inverted dropout)
    ref = np.asarray(reference_attention(q, k, v, bias, 1.0))
    np.testing.assert_allclose(out.mean(), ref.mean(), atol=0.02)


def test_encoder_with_pallas_attention_matches_xla(rng):
    from meme_challenge_tpu.core.config import UniterConfig
    from meme_challenge_tpu.models.uniter import StackedEncoder

    base = dict(vocab_size=50, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=64, img_dim=16,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    cfg_xla = UniterConfig(**base)
    cfg_pallas = UniterConfig(use_pallas_attention=True, **base)

    x = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)
    bias = jnp.zeros((2, 1, 1, 16), jnp.float32)
    enc = StackedEncoder(cfg_xla)
    params = enc.init(jax.random.PRNGKey(0), x, bias)["params"]
    out_xla = enc.apply({"params": params}, x, bias)
    enc_p = StackedEncoder(cfg_pallas)
    out_pallas = enc_p.apply({"params": params}, x, bias)
    np.testing.assert_allclose(np.asarray(out_pallas), np.asarray(out_xla),
                               atol=5e-5, rtol=1e-4)


def test_encoder_pallas_with_attention_dropout_trains(rng):
    """The fused kernel now serves the reference training config
    (attention_probs_dropout_prob 0.1): gradients flow and differ from the
    deterministic path only through dropout."""
    from meme_challenge_tpu.core.config import UniterConfig
    from meme_challenge_tpu.models.uniter import StackedEncoder

    base = dict(vocab_size=50, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=64, img_dim=16,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.5)
    cfg = UniterConfig(use_pallas_attention=True, **base)
    x = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)
    bias = jnp.zeros((2, 1, 1, 16), jnp.float32)
    enc = StackedEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0), x, bias)["params"]

    def loss(p, key):
        out = enc.apply({"params": p}, x, bias, deterministic=False,
                        rngs={"dropout": key})
        return jnp.sum(out ** 2)

    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    l1, g1 = jax.value_and_grad(loss)(params, k1)
    l1b, _ = jax.value_and_grad(loss)(params, k1)
    l2, _ = jax.value_and_grad(loss)(params, k2)
    assert np.isfinite(float(l1))
    assert float(l1) == float(l1b)        # same dropout key -> same loss
    assert float(l1) != float(l2)         # different key -> different mask
    flat = jax.tree_util.tree_leaves(g1)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in flat)
    assert any(float(jnp.abs(x).max()) > 0 for x in flat)


# ---------------------------------------------------------------------------
# Pair-blocked kernel variant
# ---------------------------------------------------------------------------

def test_blocked_forward_matches_reference(rng):
    from meme_challenge_tpu.ops.attention import fused_attention_blocked

    q, k, v, bias = _inputs(rng, B=3, H=4, S=24, D=8)
    scale = 1.0 / np.sqrt(q.shape[-1])
    out = fused_attention_blocked(q, k, v, bias, scale)
    ref = reference_attention(q, k, v, bias, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_blocked_gradients_match_reference(rng):
    from meme_challenge_tpu.ops.attention import fused_attention_blocked

    q, k, v, bias = _inputs(rng, B=2, H=2, S=16, D=8)
    scale = 1.0 / np.sqrt(q.shape[-1])

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention_blocked(q, k, v, bias, scale) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v, bias, scale) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fused, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=1e-3, err_msg=f"d{name}")


def test_blocked_dropout_deterministic_and_unbiased(rng):
    from meme_challenge_tpu.ops.attention import (
        _largest_block, fused_attention_blocked)

    q, k, v, bias = _inputs(rng, B=2, H=4, S=16, D=8)
    scale = 1.0 / np.sqrt(q.shape[-1])
    G = q.shape[0] * q.shape[1]
    n = G // _largest_block(G)
    seeds = jnp.arange(7, 7 + n, dtype=jnp.int32)
    a = fused_attention_blocked(q, k, v, bias, scale, 0.3, seeds)
    b = fused_attention_blocked(q, k, v, bias, scale, 0.3, seeds)
    c = fused_attention_blocked(q, k, v, bias, scale, 0.3, seeds + 5)
    assert bool(jnp.all(a == b))
    assert bool(jnp.any(a != c))
    # fwd/bwd regenerate the SAME mask: grads finite and nonzero
    g = jax.grad(lambda q_: jnp.sum(fused_attention_blocked(
        q_, k, v, bias, scale, 0.3, seeds) ** 2))(q)
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.abs(g).max()) > 0


def test_blocked_encoder_matches_xla(rng):
    """StackedEncoder with pallas_blocked reproduces the XLA path (no
    dropout)."""
    from meme_challenge_tpu.core.config import UniterConfig
    from meme_challenge_tpu.models.uniter import MemeUniter

    common = dict(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                  num_attention_heads=2, intermediate_size=64, img_dim=16,
                  max_position_embeddings=32, hidden_dropout_prob=0.0,
                  attention_probs_dropout_prob=0.0)
    m_x = MemeUniter(UniterConfig(**common), n_classes=1)
    m_p = MemeUniter(UniterConfig(use_pallas_attention=True,
                                  pallas_blocked=True, **common), n_classes=1)
    B, T, R = 3, 8, 6
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, 64, (B, T)), jnp.int32),
        "position_ids": jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1)),
        "img_feat": jnp.asarray(rng.randn(B, R, 16), jnp.float32),
        "img_pos_feat": jnp.asarray(rng.rand(B, R, 7), jnp.float32),
        "txt_mask": jnp.asarray(
            np.arange(T)[None] < rng.randint(3, T + 1, B)[:, None],
            jnp.int32),
        "img_mask": jnp.ones((B, R), jnp.int32),
    }
    params = m_x.init(jax.random.PRNGKey(0), batch, deterministic=True)
    o_x = np.asarray(m_x.apply(params, batch, deterministic=True))
    o_p = np.asarray(m_p.apply(params, batch, deterministic=True))
    np.testing.assert_allclose(o_p, o_x, atol=2e-4, rtol=1e-4)
