"""UNITER single-stream vision+language encoder, TPU-native.

Capability parity with reference model/model.py + model/layer.py +
model/meme_uniter.py + model/pretrain.py, re-architected for XLA:

- **Static shapes instead of gather compaction.** The reference packs
  variable-length text+regions per sample with ``torch.gather`` over a
  ``gather_index`` (model/model.py:321-334). Under XLA that defeats tiling, so
  the joint sequence here is a fixed ``[B, T + R]`` layout (text block then
  image block) with an additive attention mask. With −10000 masking this is
  mathematically identical to compaction up to padding positions (whose
  softmax weight underflows to exactly 0 in fp32), and padding never reaches
  the loss or the CLS pooler.
- **Stacked encoder layers + ``lax.scan``.** All L transformer layers live in
  one parameter pytree with a leading layer axis, scanned at trace time:
  compile once per layer *shape*, not per layer. ``remat=True`` wraps the
  scanned body in ``jax.checkpoint`` to trade FLOPs for HBM.
- **erf-GELU** exactly as reference model/layer.py:31-37, post-LN residual
  blocks, additive −10000 attention bias (model/model.py:342-345), LayerNorm
  eps 1e-12 in fp32 (apex FusedLayerNorm → XLA-fused layernorm).
- Attention runs in the configured compute dtype (bf16 recommended on MXU)
  with fp32 score/softmax accumulation; optionally via the fused Pallas
  kernel in ``ops/attention.py``.

Pretraining heads (MLM tied decoder, MRFR shared-weight regression, MRC, ITM)
mirror model/pretrain.py; masked-position selection uses dense masked losses
instead of the reference's dynamic ``masked_select`` (static shapes again).
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from meme_challenge_tpu.core.config import UniterConfig

Array = jax.Array

NEG_INF = -10000.0  # additive mask value, reference model/model.py:345


def erf_gelu(x: Array) -> Array:
    """Exact-erf GELU (reference model/layer.py:31-37), not tanh approx."""
    return x * 0.5 * (1.0 + jax.lax.erf(x / math.sqrt(2.0).__float__()))


def gelu_new(x: Array) -> Array:
    """tanh-approximate GELU (HF 'gelu_new'; ALBERT-v2 checkpoints)."""
    return 0.5 * x * (1.0 + jnp.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * jnp.power(x, 3.0))))


ACT2FN = {
    "gelu": erf_gelu,
    "gelu_new": gelu_new,
    "relu": jax.nn.relu,
    "swish": jax.nn.swish,
}


def _init(stddev: float):
    return nn.initializers.normal(stddev=stddev)


@jax.custom_vjp
def softmax_lowp(scores: Array) -> Array:
    """Softmax over the last axis with fp32 math but low-precision storage.

    The S^2 score/probability tensors dominate the train step's HBM traffic
    (cost analysis: ~5 GB/micro-step fp32 at B16 S160). Storing them in the
    input's (bf16) dtype halves that; the exp/sum run in fp32 inside the XLA
    fusion, and the custom VJP keeps the saved residual in bf16 as well
    (plain jax.nn.softmax would checkpoint the fp32 probabilities).
    """
    return jax.nn.softmax(scores.astype(jnp.float32),
                          axis=-1).astype(scores.dtype)


def _softmax_lowp_fwd(scores):
    p = softmax_lowp(scores)
    return p, p


def _softmax_lowp_bwd(p, g):
    p32 = p.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    ds = p32 * (g32 - jnp.sum(g32 * p32, axis=-1, keepdims=True))
    return (ds.astype(p.dtype),)


softmax_lowp.defvjp(_softmax_lowp_fwd, _softmax_lowp_bwd)


class LayerNorm(nn.LayerNorm):
    """flax LayerNorm pinned to eps 1e-12 (apex FusedLayerNorm parity)."""

    epsilon: float = 1e-12


def _layer_norm(x: Array, scale: Array, bias: Array, eps: float,
                out_dtype) -> Array:
    """fp32 LayerNorm, eps 1e-12 (apex FusedLayerNorm parity)."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = jnp.square(x32 - mean).mean(axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(out_dtype)


class TextEmbeddings(nn.Module):
    """word + position + token-type embeddings → LN → dropout.

    Parity: reference UniterTextEmbeddings (model/model.py:217-245).
    Parameters are explicit tables (setup-style) so the token-type table and
    word table can be shared with the image branch / MLM head.
    """

    config: UniterConfig

    def setup(self):
        cfg = self.config
        ini = _init(cfg.initializer_range)
        self.word_embeddings = self.param(
            "word_embeddings", ini, (cfg.vocab_size, cfg.hidden_size), jnp.float32)
        self.position_embeddings = self.param(
            "position_embeddings", ini,
            (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32)
        self.token_type_embeddings = self.param(
            "token_type_embeddings", ini,
            (cfg.type_vocab_size, cfg.hidden_size), jnp.float32)
        self.ln_scale = self.param(
            "ln_scale", nn.initializers.ones, (cfg.hidden_size,), jnp.float32)
        self.ln_bias = self.param(
            "ln_bias", nn.initializers.zeros, (cfg.hidden_size,), jnp.float32)
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def __call__(self, input_ids: Array, position_ids: Array,
                 token_type_ids: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        cfg = self.config
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = (jnp.take(self.word_embeddings, input_ids, axis=0)
             + jnp.take(self.position_embeddings, position_ids, axis=0)
             + jnp.take(self.token_type_embeddings, token_type_ids, axis=0))
        x = _layer_norm(x, self.ln_scale, self.ln_bias, cfg.layer_norm_eps,
                        jnp.dtype(cfg.dtype))
        return self.dropout(x, deterministic=deterministic)

    def type_embed(self, type_ids: Array) -> Array:
        return jnp.take(self.token_type_embeddings, type_ids, axis=0)

    def word_table(self) -> Array:
        return self.word_embeddings


class ImageEmbeddings(nn.Module):
    """img_linear(2048→H)+LN ⊕ pos_linear(7→H)+LN ⊕ type → LN → dropout.

    Parity: reference UniterImageEmbeddings (model/model.py:248-272), incl.
    the MRFR mask embedding added to raw features (row 0 pinned to zeros).
    """

    config: UniterConfig

    def setup(self):
        cfg = self.config
        ini = _init(cfg.initializer_range)
        zeros, ones = nn.initializers.zeros, nn.initializers.ones
        H = cfg.hidden_size
        self.img_linear_kernel = self.param(
            "img_linear_kernel", ini, (cfg.img_dim, H), jnp.float32)
        self.img_linear_bias = self.param(
            "img_linear_bias", zeros, (H,), jnp.float32)
        self.pos_linear_kernel = self.param(
            "pos_linear_kernel", ini, (cfg.pos_dim, H), jnp.float32)
        self.pos_linear_bias = self.param(
            "pos_linear_bias", zeros, (H,), jnp.float32)
        self.mask_embedding = self.param(
            "mask_embedding", ini, (2, cfg.img_dim), jnp.float32)
        self.img_ln_scale = self.param("img_ln_scale", ones, (H,), jnp.float32)
        self.img_ln_bias = self.param("img_ln_bias", zeros, (H,), jnp.float32)
        self.pos_ln_scale = self.param("pos_ln_scale", ones, (H,), jnp.float32)
        self.pos_ln_bias = self.param("pos_ln_bias", zeros, (H,), jnp.float32)
        self.ln_scale = self.param("ln_scale", ones, (H,), jnp.float32)
        self.ln_bias = self.param("ln_bias", zeros, (H,), jnp.float32)
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def __call__(self, img_feat: Array, img_pos_feat: Array,
                 type_embeddings: Array, img_masks: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        cfg = self.config
        eps = cfg.layer_norm_eps
        dt = jnp.dtype(cfg.dtype)
        if img_masks is not None:
            # Row 0 = "not masked" must contribute nothing; the reference
            # zeroes it in-place each forward (model/model.py:261).
            mask_emb = jnp.asarray(self.mask_embedding).at[0].set(0.0)
            img_feat = img_feat + jnp.take(
                mask_emb, img_masks.astype(jnp.int32), axis=0)
        im = img_feat.astype(jnp.float32) @ self.img_linear_kernel + self.img_linear_bias
        im = _layer_norm(im, self.img_ln_scale, self.img_ln_bias, eps, jnp.float32)
        pos = img_pos_feat.astype(jnp.float32) @ self.pos_linear_kernel + self.pos_linear_bias
        pos = _layer_norm(pos, self.pos_ln_scale, self.pos_ln_bias, eps, jnp.float32)
        x = im + pos + type_embeddings
        x = _layer_norm(x, self.ln_scale, self.ln_bias, eps, dt)
        return self.dropout(x, deterministic=deterministic)

    def img_kernel(self) -> Array:
        return self.img_linear_kernel


def _split_heads(x: Array, n_heads: int) -> Array:
    b, s, h = x.shape
    return x.reshape(b, s, n_heads, h // n_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: Array) -> Array:
    b, n, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, n * d)


class StackedEncoder(nn.Module):
    """L post-LN BERT layers with stacked params, scanned over the layer axis.

    Parity: reference UniterEncoder + BertLayer/BertSelfAttention/
    BertSelfOutput/BertIntermediate/BertOutput (model/layer.py:53-170).
    TPU-native: one ``lax.scan`` over a ``[L, ...]`` parameter stack.
    """

    config: UniterConfig

    @nn.compact
    def __call__(self, hidden: Array, attn_bias: Array,
                 deterministic: bool = True) -> Array:
        cfg = self.config
        L, H, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
        ini = _init(cfg.initializer_range)
        zeros, ones = nn.initializers.zeros, nn.initializers.ones

        def p(name, shape, f):
            return self.param(name, f, shape, jnp.float32)

        stacked = {
            # Q/K/V stored PRE-CONCATENATED as one [L, H, 3H] parameter
            # (layout [q|k|v] on the last axis): the hot loop issues a single
            # wide matmul without rebuilding [H,3H] from three [H,H] reads
            # every layer call. The converter keeps the reference's per-matrix
            # torch layout on both import and export (models/convert.py).
            "qkv_kernel": p("qkv_kernel", (L, H, 3 * H), ini),
            "qkv_bias": p("qkv_bias", (L, 3 * H), zeros),
            "attn_out_kernel": p("attn_out_kernel", (L, H, H), ini),
            "attn_out_bias": p("attn_out_bias", (L, H), zeros),
            "attn_ln_scale": p("attn_ln_scale", (L, H), ones),
            "attn_ln_bias": p("attn_ln_bias", (L, H), zeros),
            "ffn_in_kernel": p("ffn_in_kernel", (L, H, I), ini),
            "ffn_in_bias": p("ffn_in_bias", (L, I), zeros),
            "ffn_out_kernel": p("ffn_out_kernel", (L, I, H), ini),
            "ffn_out_bias": p("ffn_out_bias", (L, H), zeros),
            "ffn_ln_scale": p("ffn_ln_scale", (L, H), ones),
            "ffn_ln_bias": p("ffn_ln_bias", (L, H), zeros),
        }

        dtype = jnp.dtype(cfg.dtype)
        n_heads = cfg.num_attention_heads
        scale = 1.0 / math.sqrt(cfg.head_dim)
        act = ACT2FN[cfg.hidden_act]
        eps = cfg.layer_norm_eps
        p_attn = cfg.attention_probs_dropout_prob
        p_hid = cfg.hidden_dropout_prob
        use_dropout = (not deterministic) and (p_attn > 0 or p_hid > 0)
        dropout_rng = self.make_rng("dropout") if use_dropout else None
        # attention dropout runs INSIDE the fused kernel via the TPU hardware
        # PRNG (ops/attention.py), so the kernel serves the reference
        # training recipe (attention_probs_dropout_prob 0.1) too
        use_pallas = cfg.use_pallas_attention
        attn_rate = p_attn if (use_dropout and not deterministic) else 0.0

        bits8 = cfg.dropout_bits_dtype == "uint8"

        def dropout(x, rng, rate):
            if not use_dropout or rate == 0.0:
                return x
            # integer-threshold dropout: raw PRNG words compared against
            # rate·2^bits — skips bernoulli's uint→float conversion over the
            # largest tensors in the step. uint8 words quarter the mask
            # traffic; the threshold then quantizes the rate to k/256 and the
            # inverse scale uses that exact effective rate (unbiased).
            if bits8:
                k = min(int(round(rate * 256)), 255)
                bits = jax.random.bits(rng, x.shape, jnp.uint8)
                keep = bits >= jnp.uint8(k)
                eff = k / 256.0
            else:
                k = min(int(rate * (1 << 32)), (1 << 32) - 1)
                bits = jax.random.bits(rng, x.shape, jnp.uint32)
                keep = bits >= jnp.uint32(k)
                eff = rate
            return jnp.where(keep, x / (1.0 - eff), 0.0).astype(x.dtype)

        bias32 = attn_bias.astype(jnp.float32)

        def layer_forward(x, lp, rng):
            if use_dropout:
                r_attn, r_ao, r_ffn = jax.random.split(rng, 3)
            else:
                r_attn = r_ao = r_ffn = None
            # one wide [H, 3H] matmul for Q/K/V — bigger MXU tile than three
            # [H, H] launches; the weights live pre-concatenated in HBM
            qkv_kernel = lp["qkv_kernel"].astype(dtype)
            qkv_bias = lp["qkv_bias"].astype(dtype)
            q, k, v = jnp.split(x @ qkv_kernel + qkv_bias, 3, axis=-1)
            q, k, v = (_split_heads(t, n_heads) for t in (q, k, v))
            if use_pallas:
                from meme_challenge_tpu.ops.attention import (
                    blocked_seed_count, fused_attention,
                    fused_attention_blocked)
                if cfg.pallas_blocked:
                    n_seed = blocked_seed_count(q.shape[0], n_heads)
                    kernel = fused_attention_blocked
                else:
                    n_seed = q.shape[0]
                    kernel = fused_attention
                if attn_rate > 0.0:
                    seeds = jax.random.randint(
                        r_attn, (n_seed,), 0, jnp.iinfo(jnp.int32).max,
                        dtype=jnp.int32)
                else:
                    seeds = None
                ctx = kernel(q, k, v, bias32, scale, attn_rate,
                             seeds).astype(dtype)
            elif cfg.attention_score_dtype == "bfloat16":
                # bf16 S^2 storage: the cast fuses into the matmul epilogue,
                # softmax math stays fp32 (softmax_lowp), and the saved
                # residual + dscores are bf16 — halves the dominant HBM
                # traffic of the step
                scores = jnp.einsum(
                    "bnqd,bnkd->bnqk", q, k,
                    preferred_element_type=jnp.float32) * scale
                scores = (scores + bias32).astype(jnp.bfloat16)
                probs = softmax_lowp(scores).astype(dtype)
                probs = dropout(probs, r_attn, p_attn)
                ctx = jnp.einsum("bnqk,bnkd->bnqd", probs, v,
                                 preferred_element_type=jnp.float32).astype(dtype)
            else:
                scores = jnp.einsum(
                    "bnqd,bnkd->bnqk", q, k,
                    preferred_element_type=jnp.float32) * scale
                scores = scores + bias32
                probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
                probs = dropout(probs, r_attn, p_attn)
                ctx = jnp.einsum("bnqk,bnkd->bnqd", probs, v,
                                 preferred_element_type=jnp.float32).astype(dtype)
            ctx = _merge_heads(ctx)
            attn_out = (ctx @ lp["attn_out_kernel"].astype(dtype)
                        + lp["attn_out_bias"].astype(dtype))
            attn_out = dropout(attn_out, r_ao, p_hid)
            x = _layer_norm(attn_out + x, lp["attn_ln_scale"],
                            lp["attn_ln_bias"], eps, dtype)

            inter = act(x @ lp["ffn_in_kernel"].astype(dtype)
                        + lp["ffn_in_bias"].astype(dtype))
            ffn_out = (inter @ lp["ffn_out_kernel"].astype(dtype)
                       + lp["ffn_out_bias"].astype(dtype))
            ffn_out = dropout(ffn_out, r_ffn, p_hid)
            x = _layer_norm(ffn_out + x, lp["ffn_ln_scale"],
                            lp["ffn_ln_bias"], eps, dtype)
            return x

        if cfg.remat:
            # "dots": keep matmul outputs, recompute elementwise/softmax —
            # selective remat that unlocks larger batches without the 20%
            # full-recompute penalty measured in round 1 (BASELINE.md).
            policy = (jax.checkpoint_policies.checkpoint_dots
                      if cfg.remat_policy == "dots" else None)
            layer_forward = jax.checkpoint(layer_forward, policy=policy)

        def scan_body(carry, xs):
            lp, rng = xs
            return layer_forward(carry, lp, rng), None

        if use_dropout:
            layer_rngs = jax.random.split(dropout_rng, L)
        else:
            # dummy; never consumed (static branch)
            layer_rngs = jnp.zeros((L,), dtype=jnp.uint32)

        if cfg.scan_unroll > 0:
            unroll = cfg.scan_unroll
        else:  # auto: full unroll on TPU (BASELINE.md round-2 sweep)
            unroll = L if jax.devices()[0].platform == "tpu" else 1
        hidden, _ = jax.lax.scan(scan_body, hidden.astype(dtype),
                                 (stacked, layer_rngs),
                                 unroll=unroll)
        return hidden


class Pooler(nn.Module):
    """tanh(W·h[CLS] + b) — reference BertPooler (model/layer.py:173-185)."""

    config: UniterConfig

    @nn.compact
    def __call__(self, hidden: Array) -> Array:
        first = hidden[:, 0].astype(jnp.float32)
        out = nn.Dense(self.config.hidden_size,
                       kernel_init=_init(self.config.initializer_range),
                       name="dense")(first)
        return jnp.tanh(out)


class UniterModel(nn.Module):
    """Joint vision-language encoder.

    Parity: reference UniterModel.forward (model/model.py:336-367) with the
    three input branches (text-only / image-only / joint). The joint branch
    lays text then image at fixed offsets — no gather compaction; padding is
    handled by the additive attention bias built from ``txt_mask``/``img_mask``.

    Inputs (static shapes):
      input_ids     [B, T] int32 (or None for image-only)
      position_ids  [B, T] int32
      img_feat      [B, R, img_dim] (or None for text-only)
      img_pos_feat  [B, R, 7]
      txt_mask      [B, T] {0,1}  — 1 for real tokens
      img_mask      [B, R] {0,1}  — 1 for real boxes
      img_masks     [B, R] {0,1}  — MRFR masked-region indicator (optional)
    """

    config: UniterConfig

    def setup(self):
        cfg = self.config
        self.embeddings = TextEmbeddings(cfg)
        self.img_embeddings = ImageEmbeddings(cfg)
        self.encoder = StackedEncoder(cfg)
        self.pooler = Pooler(cfg)

    def _attn_bias(self, joint_mask: Array) -> Array:
        # [B, S] -> [B, 1, 1, S], additive −10000 on padding keys
        # (reference model/model.py:342-345).
        bias = (1.0 - joint_mask.astype(jnp.float32)) * NEG_INF
        return bias[:, None, None, :]

    def __call__(
        self,
        input_ids: Optional[Array],
        position_ids: Optional[Array],
        img_feat: Optional[Array],
        img_pos_feat: Optional[Array],
        txt_mask: Optional[Array] = None,
        img_mask: Optional[Array] = None,
        img_masks: Optional[Array] = None,
        txt_type_ids: Optional[Array] = None,
        img_type_ids: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Tuple[Array, Array]:
        """Returns (sequence_output [B, S, H], joint_mask [B, S])."""
        if input_ids is None:
            # image-only branch (model/model.py:348-351)
            if img_type_ids is None:
                img_type_ids = jnp.ones(img_feat.shape[:2], dtype=jnp.int32)
            type_emb = self.embeddings.type_embed(img_type_ids)
            emb = self.img_embeddings(img_feat, img_pos_feat, type_emb,
                                      img_masks, deterministic=deterministic)
            joint_mask = img_mask
        elif img_feat is None:
            # text-only branch (model/model.py:352-355)
            emb = self.embeddings(input_ids, position_ids, txt_type_ids,
                                  deterministic=deterministic)
            joint_mask = txt_mask
        else:
            txt_emb = self.embeddings(input_ids, position_ids, txt_type_ids,
                                      deterministic=deterministic)
            if img_type_ids is None:
                img_type_ids = jnp.ones(img_feat.shape[:2], dtype=jnp.int32)
            type_emb = self.embeddings.type_embed(img_type_ids)
            img_emb = self.img_embeddings(img_feat, img_pos_feat, type_emb,
                                          img_masks, deterministic=deterministic)
            # Static layout: [text block | image block]; equivalent to the
            # reference's gather compaction up to fully-masked padding keys.
            emb = jnp.concatenate([txt_emb.astype(img_emb.dtype), img_emb], axis=1)
            joint_mask = jnp.concatenate([txt_mask, img_mask], axis=1)

        attn_bias = self._attn_bias(joint_mask)
        seq = self.encoder(emb, attn_bias, deterministic=deterministic)
        return seq, joint_mask

    def pool(self, sequence_output: Array) -> Array:
        return self.pooler(sequence_output)


class MemeUniter(nn.Module):
    """UNITER → pooler(CLS) → Linear(H, n_classes).

    Parity: reference model/meme_uniter.py:17-21.
    """

    config: UniterConfig
    n_classes: int = 1

    def setup(self):
        self.uniter = UniterModel(self.config)
        self.classifier = nn.Dense(
            self.n_classes,
            kernel_init=_init(self.config.initializer_range),
            name="classifier")

    def __call__(self, batch: Dict[str, Array],
                 deterministic: bool = True) -> Array:
        seq, _ = self.uniter(
            input_ids=batch.get("input_ids"),
            position_ids=batch.get("position_ids"),
            img_feat=batch.get("img_feat"),
            img_pos_feat=batch.get("img_pos_feat"),
            txt_mask=batch.get("txt_mask"),
            img_mask=batch.get("img_mask"),
            deterministic=deterministic,
        )
        pooled = self.uniter.pool(seq)
        return self.classifier(pooled)


class RegionFeatureRegression(nn.Module):
    """MRFR head: Dense→GELU→LN, decoded with the *shared* img_linear kernel
    (reference model/pretrain.py:19-33)."""

    config: UniterConfig

    @nn.compact
    def __call__(self, hidden: Array, img_linear_kernel: Array) -> Array:
        cfg = self.config
        h = nn.Dense(cfg.hidden_size, kernel_init=_init(cfg.initializer_range),
                     name="net_dense")(hidden.astype(jnp.float32))
        h = erf_gelu(h)
        scale = self.param("net_ln_scale", nn.initializers.ones,
                           (cfg.hidden_size,), jnp.float32)
        bias_ln = self.param("net_ln_bias", nn.initializers.zeros,
                             (cfg.hidden_size,), jnp.float32)
        h = _layer_norm(h, scale, bias_ln, cfg.layer_norm_eps, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (cfg.img_dim,),
                          jnp.float32)
        # flax img_linear kernel is [img_dim, H]; decoding projects H→img_dim
        # with its transpose (reference F.linear(h, W.t(), bias)).
        return h @ img_linear_kernel.T + bias


class RegionClassification(nn.Module):
    """MRC head: Dense→GELU→LN→Dense(1601) (reference model/pretrain.py:36-47)."""

    config: UniterConfig
    label_dim: int = 1601

    @nn.compact
    def __call__(self, hidden: Array) -> Array:
        cfg = self.config
        ini = _init(cfg.initializer_range)
        h = nn.Dense(cfg.hidden_size, kernel_init=ini,
                     name="net_dense")(hidden.astype(jnp.float32))
        h = erf_gelu(h)
        scale = self.param("net_ln_scale", nn.initializers.ones,
                           (cfg.hidden_size,), jnp.float32)
        bias_ln = self.param("net_ln_bias", nn.initializers.zeros,
                             (cfg.hidden_size,), jnp.float32)
        h = _layer_norm(h, scale, bias_ln, cfg.layer_norm_eps, jnp.float32)
        return nn.Dense(self.label_dim, kernel_init=ini, name="net_out")(h)


class MLMHead(nn.Module):
    """Dense→GELU→LN → tied-embedding decode + bias
    (reference BertLMPredictionHead, model/layer.py:205-222)."""

    config: UniterConfig

    @nn.compact
    def __call__(self, hidden: Array, word_embedding: Array) -> Array:
        cfg = self.config
        h = nn.Dense(cfg.hidden_size, kernel_init=_init(cfg.initializer_range),
                     name="transform_dense")(hidden.astype(jnp.float32))
        h = ACT2FN[cfg.hidden_act](h)
        scale = self.param("transform_ln_scale", nn.initializers.ones,
                           (cfg.hidden_size,), jnp.float32)
        bias_ln = self.param("transform_ln_bias", nn.initializers.zeros,
                             (cfg.hidden_size,), jnp.float32)
        h = _layer_norm(h, scale, bias_ln, cfg.layer_norm_eps, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (cfg.vocab_size,),
                          jnp.float32)
        return h @ word_embedding.T + bias


class UniterForPretraining(nn.Module):
    """4 pretraining heads over a shared UNITER trunk.

    Parity: reference UniterForPretraining (model/pretrain.py:50-233) with the
    MLM/MRFR/ITM/MRC(-kl) tasks. TPU-native difference: losses are computed
    densely over the static sequence with target masks (no dynamic
    ``masked_select``) and returned as (per-position loss, mask) pairs so
    callers reduce with a stable denominator.
    """

    config: UniterConfig
    img_label_dim: int = 1601

    def setup(self):
        cfg = self.config
        self.uniter = UniterModel(cfg)
        self.mlm_head = MLMHead(cfg)
        self.feat_regress = RegionFeatureRegression(cfg)
        self.region_classifier = RegionClassification(cfg, self.img_label_dim)
        self.itm_output = nn.Dense(
            2, kernel_init=_init(cfg.initializer_range), name="itm_output")

    def _encode(self, batch: Dict[str, Array], img_masks=None,
                deterministic: bool = True) -> Array:
        seq, _ = self.uniter(
            input_ids=batch["input_ids"],
            position_ids=batch["position_ids"],
            img_feat=batch["img_feat"],
            img_pos_feat=batch["img_pos_feat"],
            txt_mask=batch["txt_mask"],
            img_mask=batch["img_mask"],
            img_masks=img_masks,
            deterministic=deterministic,
        )
        return seq

    def __call__(self, batch: Dict[str, Array], task: str,
                 deterministic: bool = True):
        """Dispatch on task exactly like reference pretrain.py:65-105.

        ``task="init"`` touches every head once so ``model.init`` creates the
        full parameter tree (flax creates params lazily per code path).
        """
        if task == "init":
            out = self.forward_mlm(batch, deterministic)
            self.forward_mrfr(batch, deterministic)
            self.forward_itm(batch, deterministic)
            self.forward_mrc(batch, "mrc", deterministic)
            return out
        if task == "mlm":
            return self.forward_mlm(batch, deterministic)
        if task == "mrfr":
            return self.forward_mrfr(batch, deterministic)
        if task == "itm":
            return self.forward_itm(batch, deterministic)
        if task.startswith("mrc"):
            return self.forward_mrc(batch, task, deterministic)
        raise ValueError("invalid task")

    def forward_mlm(self, batch, deterministic=True):
        """Per-token CE over masked text positions (+mask).

        Reference pretrain.py:107-127: txt_labels == −1 marks unmasked.
        """
        seq = self._encode(batch, deterministic=deterministic)
        T = batch["input_ids"].shape[1]
        logits = self.mlm_head(seq[:, :T], self.uniter.embeddings.word_table())
        labels = batch["txt_labels"]
        mask = labels != -1
        safe = jnp.where(mask, labels, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return nll * mask, mask

    def forward_mrfr(self, batch, deterministic=True):
        """Per-region masked MSE (reference pretrain.py:135-154)."""
        seq = self._encode(batch, img_masks=batch["img_masks"],
                           deterministic=deterministic)
        T = batch["input_ids"].shape[1]
        pred = self.feat_regress(seq[:, T:],
                                 self.uniter.img_embeddings.img_kernel())
        mask = batch["img_masks"].astype(jnp.float32)
        err = jnp.square(pred - batch["feat_targets"])
        return err * mask[..., None], batch["img_masks"]

    def forward_itm(self, batch, deterministic=True):
        """ITM binary scores [B, 2] (reference pretrain.py:156-203).

        The OT distance is exposed separately via models/ot.py — mirrors the
        reference where the ITM-OT wiring is vestigial (loss commented out,
        pretrain.py:197-203).
        """
        seq = self._encode(batch, deterministic=deterministic)
        pooled = self.uniter.pool(seq)
        return self.itm_output(pooled)

    def forward_itm_with_seq(self, batch, deterministic=True):
        """ITM scores + the sequence output from the SAME encoder pass —
        lets the driver add the IPOT alignment loss without re-encoding."""
        seq = self._encode(batch, deterministic=deterministic)
        pooled = self.uniter.pool(seq)
        return self.itm_output(pooled), seq

    def forward_mrc(self, batch, task, deterministic=True):
        """Per-region CE/KL to 1601 soft labels (reference pretrain.py:205-233)."""
        seq = self._encode(batch, img_masks=batch["img_masks"],
                           deterministic=deterministic)
        T = batch["input_ids"].shape[1]
        logits = self.region_classifier(seq[:, T:]).astype(jnp.float32)
        mask = batch["img_masks"].astype(jnp.float32)
        label_targets = batch["label_targets"]
        logp = jax.nn.log_softmax(logits, axis=-1)
        if "kl" in task:
            kl = jnp.where(
                label_targets > 0,
                label_targets * (jnp.log(jnp.clip(label_targets, 1e-12, None))
                                 - logp),
                0.0)
            return kl * mask[..., None], batch["img_masks"]
        # background class must not be the target (reference pretrain.py:228-230)
        hard = jnp.argmax(label_targets[..., 1:], axis=-1) + 1
        nll = -jnp.take_along_axis(logp, hard[..., None], axis=-1)[..., 0]
        return nll * mask, batch["img_masks"]
