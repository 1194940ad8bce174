"""Fused Pallas attention: forward + gradient parity vs the unfused XLA
reference (interpret mode on CPU), and encoder integration."""
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
