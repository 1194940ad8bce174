"""Low-precision storage paths: bf16 S^2 attention scores (softmax_lowp) and
uint8 dropout PRNG words. Both are HBM-traffic optimizations for the TPU
train step (BASELINE.md round-2 sweep); these tests pin their numerics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meme_challenge_tpu.core.config import UniterConfig
from meme_challenge_tpu.models.uniter import MemeUniter, softmax_lowp


def test_softmax_lowp_forward_close_to_fp32(rng):
    x = jnp.asarray(rng.randn(4, 3, 16, 16) * 5, jnp.bfloat16)
    got = np.asarray(softmax_lowp(x), np.float32)
    want = np.asarray(jax.nn.softmax(np.asarray(x, np.float32), axis=-1))
    # storage is bf16 (rel step 2^-8); elementwise diff bounded by that
    assert np.abs(got - want).max() < 5e-3
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=2e-2)


def test_softmax_lowp_gradient_close_to_autodiff(rng):
    x32 = jnp.asarray(rng.randn(2, 3, 8, 8), jnp.float32)
    g32 = jnp.asarray(rng.randn(2, 3, 8, 8), jnp.float32)

    def f_ref(x):
        return jnp.sum(jax.nn.softmax(x, axis=-1) * g32)

    def f_lowp(x):
        return jnp.sum(softmax_lowp(x.astype(jnp.bfloat16)).astype(
            jnp.float32) * g32)

    want = jax.grad(f_ref)(x32)
    got = jax.grad(f_lowp)(x32)
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 2e-2


@pytest.mark.parametrize("rate", [0.1, 0.5])
def test_uint8_dropout_unbiased_and_scaled(rng, rate):
    """uint8 threshold dropout: keep fraction ~= 1-k/256 and kept values are
    scaled by exactly 1/(1-k/256), so E[dropout(x)] == x."""
    cfg = UniterConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64, img_dim=16,
        max_position_embeddings=32, hidden_dropout_prob=rate,
        attention_probs_dropout_prob=0.0, dropout_bits_dtype="uint8")
    # exercise through the encoder's dropout closure via a tiny forward
    model = MemeUniter(cfg, n_classes=1)
    B, T, R = 4, 8, 6
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, 64, (B, T)), jnp.int32),
        "position_ids": jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1)),
        "img_feat": jnp.asarray(rng.randn(B, R, 16), jnp.float32),
        "img_pos_feat": jnp.asarray(rng.rand(B, R, 7), jnp.float32),
        "txt_mask": jnp.ones((B, T), jnp.int32),
        "img_mask": jnp.ones((B, R), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    out1 = model.apply(params, batch, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    out2 = model.apply(params, batch, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    # deterministic in the seed
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = model.apply(params, batch, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 0


@pytest.mark.parametrize("rate,k", [(0.1, 26), (0.5, 128)])
def test_uint8_threshold_statistics(rate, k):
    """Direct statistics of the uint8 threshold rule used in the encoder."""
    key = jax.random.PRNGKey(0)
    bits = jax.random.bits(key, (200_000,), jnp.uint8)
    keep = np.asarray(bits) >= k
    eff = k / 256.0
    assert abs(keep.mean() - (1 - eff)) < 5e-3
    # mean-preserving: ones dropped at eff, survivors scaled by 1/(1-eff)
    x = np.where(keep, 1.0 / (1.0 - eff), 0.0)
    assert abs(x.mean() - 1.0) < 6e-3


def test_score_bf16_encoder_close_to_fp32_scores(rng):
    """bf16 score storage changes logits only within bf16 tolerance."""
    common = dict(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, img_dim=16,
        max_position_embeddings=32, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    m32 = MemeUniter(UniterConfig(**common), n_classes=1)
    m16 = MemeUniter(UniterConfig(attention_score_dtype="bfloat16",
                                  **common), n_classes=1)
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
    params = m32.init(jax.random.PRNGKey(0), batch, deterministic=True)
    o32 = np.asarray(m32.apply(params, batch, deterministic=True))
    o16 = np.asarray(m16.apply(params, batch, deterministic=True))
    assert np.abs(o32 - o16).max() < 3e-2

    # gradients flow through the custom VJP (finite + same argmax direction)
    def loss16(p):
        return jnp.sum(m16.apply(p, batch, deterministic=True) ** 2)

    g = jax.grad(loss16)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_softmax_lowp_supports_vmap_and_grad(rng):
    """fold-parallel vmaps the train step over folds; the custom VJP must
    compose with vmap+grad."""
    x = jnp.asarray(rng.randn(4, 2, 3, 8, 8), jnp.bfloat16)  # [F, ...]

    def loss(xi):
        return jnp.sum(softmax_lowp(xi).astype(jnp.float32) ** 2)

    g = jax.vmap(jax.grad(loss))(x)
    assert g.shape == x.shape
    ref = jax.grad(lambda xi: jnp.sum(
        jax.nn.softmax(xi.astype(jnp.float32), -1) ** 2))(
            x[0].astype(jnp.float32))
    assert np.abs(np.asarray(g[0], np.float32) - np.asarray(ref)).max() < 2e-2


def test_scale_by_adam_storage_matches_optax(rng):
    """fp32/fp32 storage reproduces optax.scale_by_adam; bf16 nu storage
    stays within bf16 rounding of it."""
    import optax
    from meme_challenge_tpu.train.optim import scale_by_adam_storage

    params = {"w": jnp.asarray(rng.randn(16, 8), jnp.float32),
              "b": jnp.asarray(rng.randn(8), jnp.float32)}
    ref = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    mine = scale_by_adam_storage(0.9, 0.999, 1e-8, None, None)
    lowp = scale_by_adam_storage(0.9, 0.999, 1e-8, jnp.bfloat16, jnp.bfloat16)
    s_ref, s_mine, s_lowp = ref.init(params), mine.init(params), lowp.init(params)
    for step in range(5):
        g = jax.tree.map(
            lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32) * 0.1,
            params)
        u_ref, s_ref = ref.update(g, s_ref, params)
        u_mine, s_mine = mine.update(g, s_mine, params)
        u_lowp, s_lowp = lowp.update(g, s_lowp, params)
        for k in params:
            np.testing.assert_allclose(np.asarray(u_mine[k]),
                                       np.asarray(u_ref[k]), atol=1e-6)
            # bf16 moment storage: ~0.4% relative step error bound
            np.testing.assert_allclose(np.asarray(u_lowp[k]),
                                       np.asarray(u_ref[k]), atol=3e-2)
    # state structure is the stock optax one (checkpoint/TP compatibility)
    assert isinstance(s_lowp, optax.ScaleByAdamState)
    assert s_lowp.nu["w"].dtype == jnp.bfloat16
