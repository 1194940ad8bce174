"""Text-only transformer baselines.

Capability parity with reference text_based/model.py: the ``MODEL_DICT``
registry of BERT / BERT-large / RoBERTa(-large/-mnli) / ALBERT / ELECTRA
backbones (text_based/model.py:8-17) and ``TransformerClassificationHead``
(text_based/model.py:19-48).

TPU-native form: every family is a flax backbone built on the same
``StackedEncoder`` trunk as UNITER (they are all post-LN BERT stacks);
family differences live in the embedding block and layer sharing:

- **bert**: word+pos+type embeddings (UNITER's text branch exactly).
- **roberta**: position ids offset by ``pad_id + 1`` over *non-pad* tokens
  (HF ``create_position_ids_from_input_ids``), type vocab 1.
- **albert**: factorized embeddings (embedding_size ≪ hidden, projected up)
  and ONE shared transformer layer applied L times.
- **electra**: factorized embeddings, no pooler (CLS token used directly).

Zero-egress note: the registry describes architectures; pretrained weights
are ingested from local HF torch checkpoints via
``hf_bert_params_to_uniter_trunk``-style converters (models/convert.py) —
there is no network download path.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from meme_challenge_tpu.core.config import UniterConfig
from meme_challenge_tpu.models.uniter import (
    LayerNorm,
    Pooler,
    StackedEncoder,
    _init,
    _layer_norm,
    erf_gelu,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class TextModelConfig:
    """Architecture spec for one registry entry."""

    family: str = "bert"            # bert | roberta | albert | electra
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    embedding_size: Optional[int] = None   # albert/electra factorization
    pad_token_id: int = 0
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"               # albert-v2: "gelu_new" (tanh)
    hidden_dropout_prob: float = 0.1       # albert-v2 checkpoints: 0.0
    attention_probs_dropout_prob: float = 0.1
    shared_layers: bool = False            # albert
    has_pooler: bool = True                # electra: False
    dtype: str = "float32"
    attention_score_dtype: str = "float32"  # see UniterConfig: bf16 S^2
    dropout_bits_dtype: str = "uint32"      # storage + uint8 dropout words

    def encoder_config(self) -> UniterConfig:
        L = 1 if self.shared_layers else self.num_hidden_layers
        return UniterConfig(
            vocab_size=self.vocab_size, hidden_size=self.hidden_size,
            num_hidden_layers=L,
            num_attention_heads=self.num_attention_heads,
            intermediate_size=self.intermediate_size,
            max_position_embeddings=self.max_position_embeddings,
            type_vocab_size=max(self.type_vocab_size, 1),
            hidden_act=self.hidden_act,
            hidden_dropout_prob=self.hidden_dropout_prob,
            attention_probs_dropout_prob=self.attention_probs_dropout_prob,
            layer_norm_eps=self.layer_norm_eps, dtype=self.dtype,
            attention_score_dtype=self.attention_score_dtype,
            dropout_bits_dtype=self.dropout_bits_dtype)


# Registry parity: reference MODEL_DICT (text_based/model.py:8-17). The HF
# checkpoint names document which local torch dump each entry expects.
MODEL_DICT: Dict[str, Dict[str, Any]] = {
    "bert": {"config": TextModelConfig(), "pretrain": "bert-base-uncased"},
    "bert_large": {
        "config": TextModelConfig(hidden_size=1024, num_hidden_layers=24,
                                  num_attention_heads=16,
                                  intermediate_size=4096),
        "pretrain": "bert-large-uncased"},
    "roberta": {
        "config": TextModelConfig(family="roberta", vocab_size=50265,
                                  max_position_embeddings=514,
                                  type_vocab_size=1, pad_token_id=1,
                                  layer_norm_eps=1e-5),
        "pretrain": "roberta-base"},
    "roberta_large": {
        "config": TextModelConfig(family="roberta", vocab_size=50265,
                                  hidden_size=1024, num_hidden_layers=24,
                                  num_attention_heads=16,
                                  intermediate_size=4096,
                                  max_position_embeddings=514,
                                  type_vocab_size=1, pad_token_id=1,
                                  layer_norm_eps=1e-5),
        "pretrain": "roberta-large"},
    "roberta_mnli": {
        "config": TextModelConfig(family="roberta", vocab_size=50265,
                                  hidden_size=1024, num_hidden_layers=24,
                                  num_attention_heads=16,
                                  intermediate_size=4096,
                                  max_position_embeddings=514,
                                  type_vocab_size=1, pad_token_id=1,
                                  layer_norm_eps=1e-5),
        "pretrain": "roberta-large-mnli"},
    "albert": {
        "config": TextModelConfig(family="albert", hidden_size=2048,
                                  num_hidden_layers=24,
                                  num_attention_heads=16,
                                  intermediate_size=8192,
                                  embedding_size=128, shared_layers=True,
                                  hidden_act="gelu_new",
                                  hidden_dropout_prob=0.0,
                                  attention_probs_dropout_prob=0.0),
        "pretrain": "albert-xlarge-v2"},
    "albert_large": {
        "config": TextModelConfig(family="albert", hidden_size=4096,
                                  num_hidden_layers=12,
                                  num_attention_heads=64,
                                  intermediate_size=16384,
                                  embedding_size=128, shared_layers=True,
                                  hidden_act="gelu_new",
                                  hidden_dropout_prob=0.0,
                                  attention_probs_dropout_prob=0.0),
        "pretrain": "albert-xxlarge-v2"},
    "electra": {
        "config": TextModelConfig(family="electra", hidden_size=256,
                                  num_hidden_layers=12,
                                  num_attention_heads=4,
                                  intermediate_size=1024,
                                  embedding_size=128, has_pooler=False),
        "pretrain": "google/electra-small-discriminator"},
}


def roberta_position_ids(input_ids: Array, pad_id: int) -> Array:
    """HF create_position_ids_from_input_ids: cumulative count of non-pad
    tokens, offset by pad_id; pad positions get pad_id."""
    mask = (input_ids != pad_id).astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=1) * mask
    return incremental + pad_id


class TextBackbone(nn.Module):
    """Family-parametrized text encoder → (sequence_output, pooled)."""

    config: TextModelConfig

    def setup(self):
        cfg = self.config
        emb_dim = cfg.embedding_size or cfg.hidden_size
        ini = _init(0.02)
        self.word_embeddings = self.param(
            "word_embeddings", ini, (cfg.vocab_size, emb_dim), jnp.float32)
        self.position_embeddings = self.param(
            "position_embeddings", ini,
            (cfg.max_position_embeddings, emb_dim), jnp.float32)
        self.token_type_embeddings = self.param(
            "token_type_embeddings", ini,
            (max(cfg.type_vocab_size, 1), emb_dim), jnp.float32)
        self.emb_ln_scale = self.param(
            "emb_ln_scale", nn.initializers.ones, (emb_dim,), jnp.float32)
        self.emb_ln_bias = self.param(
            "emb_ln_bias", nn.initializers.zeros, (emb_dim,), jnp.float32)
        if emb_dim != cfg.hidden_size:
            self.emb_proj = nn.Dense(cfg.hidden_size, kernel_init=ini,
                                     name="emb_proj")
        else:
            self.emb_proj = None
        self.emb_dropout = nn.Dropout(cfg.hidden_dropout_prob)
        self.encoder = StackedEncoder(cfg.encoder_config())
        if cfg.has_pooler:
            self.pooler = Pooler(cfg.encoder_config())

    def __call__(self, input_ids: Array, txt_mask: Array,
                 token_type_ids: Optional[Array] = None,
                 deterministic: bool = True):
        cfg = self.config
        if cfg.family == "roberta":
            position_ids = roberta_position_ids(input_ids, cfg.pad_token_id)
        else:
            T = input_ids.shape[1]
            position_ids = jnp.tile(jnp.arange(T, dtype=jnp.int32),
                                    (input_ids.shape[0], 1))
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = (jnp.take(self.word_embeddings, input_ids, axis=0)
             + jnp.take(self.position_embeddings, position_ids, axis=0)
             + jnp.take(self.token_type_embeddings, token_type_ids, axis=0))
        x = _layer_norm(x, self.emb_ln_scale, self.emb_ln_bias,
                        cfg.layer_norm_eps, jnp.dtype(cfg.dtype))
        x = self.emb_dropout(x, deterministic=deterministic)
        if self.emb_proj is not None:
            x = self.emb_proj(x)
        bias = ((1.0 - txt_mask.astype(jnp.float32)) * -10000.0)[
            :, None, None, :]
        if cfg.shared_layers:
            # ALBERT: one parameter set, applied L times (flax reuses the
            # same submodule params on repeated calls)
            for _ in range(cfg.num_hidden_layers):
                x = self.encoder(x, bias, deterministic=deterministic)
        else:
            x = self.encoder(x, bias, deterministic=deterministic)
        pooled = self.pooler(x) if cfg.has_pooler else x[:, 0]
        return x, pooled


class TransformerClassificationHead(nn.Module):
    """MLP head over CLS/pooled output.

    Parity: reference TransformerClassificationHead
    (text_based/model.py:19-48): Dropout → [Dense(hidden_dim) → Dropout →
    act → LayerNorm] × num_layers → Dense(num_classes). ``use_pretrained_pool``
    selects the backbone pooler output instead of the raw CLS state — note
    the reference's flag is inverted vs its name (use_pretrained_pool=False
    → pool_out); replicated faithfully via ``use_pool_output``.
    """

    backbone: TextBackbone
    num_classes: int = 1
    num_layers: int = 1
    hidden_dim: int = 512
    dropout: float = 0.0
    act: str = "gelu"
    use_pool_output: bool = True

    @nn.compact
    def __call__(self, batch: Dict[str, Array],
                 deterministic: bool = True) -> Array:
        seq, pooled = self.backbone(
            batch["input_ids"], batch["txt_mask"],
            batch.get("token_type_ids"), deterministic=deterministic)
        x = (pooled if (self.use_pool_output
                        and self.backbone.config.has_pooler)
             else seq[:, 0]).astype(jnp.float32)
        act = erf_gelu if self.act == "gelu" else jax.nn.relu
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        for i in range(self.num_layers):
            x = nn.Dense(self.hidden_dim, name=f"head_dense_{i}")(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            x = act(x)
            x = LayerNorm(name=f"head_ln_{i}")(x)
        return nn.Dense(self.num_classes, name="head_out")(x)


def build_text_model(name: str, num_classes: int = 1, dropout: float = 0.5,
                     num_layers: int = 1, hidden_dim: int = 512,
                     compute_bf16: bool = False
                     ) -> TransformerClassificationHead:
    """Registry lookup + head assembly (reference train_pure_text.py:25-41).

    ``compute_bf16`` flips the TPU fast path: bf16 matmuls plus the
    low-precision storage levers (bf16 S^2 scores, uint8 dropout words)."""
    assert name in MODEL_DICT, (
        "Given model is not known. Please choose between: %s"
        % list(MODEL_DICT.keys()))
    cfg = MODEL_DICT[name]["config"]
    if compute_bf16:
        cfg = dataclasses.replace(cfg, dtype="bfloat16",
                                  attention_score_dtype="bfloat16",
                                  dropout_bits_dtype="uint8")
    return TransformerClassificationHead(
        backbone=TextBackbone(cfg), num_classes=num_classes,
        num_layers=num_layers, hidden_dim=hidden_dim, dropout=dropout,
        act="gelu", use_pool_output=True)
