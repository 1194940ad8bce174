"""Oscar model variant: BERT with image region features appended.

Capability parity with reference model/oscar.py (BertImgModel:145-273,
ImageBertForSequenceClassification:284-328) in its meme configuration
(config/oscar-base.json): text embeddings + a single linear projection of
2054-d region features (2048 visual + 6 bbox geometry) appended to the
token sequence, a standard BERT encoder over the joint sequence, pooler →
dropout → linear or MLP classifier.

Notes vs the reference:
- the ``dis_code*`` discrete-code branches (oscar.py:162-171) are VQ-code
  experiments unused by the meme configs and are not carried over;
- optional ``use_img_layernorm`` is supported (off by default, as in
  config/oscar-base.json).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from meme_challenge_tpu.core.config import UniterConfig
from meme_challenge_tpu.core.constants import IMG_DIM_OSCAR
from meme_challenge_tpu.models.uniter import (
    Pooler,
    StackedEncoder,
    TextEmbeddings,
    _init,
    _layer_norm,
)

Array = jax.Array


class OscarModel(nn.Module):
    """BertImgModel equivalent: text ⊕ projected image features → encoder."""

    config: UniterConfig
    img_feature_dim: int = IMG_DIM_OSCAR
    use_img_layernorm: bool = False
    # the reference gives the image LayerNorm its own eps
    # (config.img_layer_norm_eps, oscar.py:177); None → config.layer_norm_eps
    img_layer_norm_eps: Optional[float] = None

    def setup(self):
        cfg = self.config
        self.embeddings = TextEmbeddings(cfg)
        self.img_embedding_kernel = self.param(
            "img_embedding_kernel", _init(cfg.initializer_range),
            (self.img_feature_dim, cfg.hidden_size), jnp.float32)
        self.img_embedding_bias = self.param(
            "img_embedding_bias", nn.initializers.zeros,
            (cfg.hidden_size,), jnp.float32)
        if self.use_img_layernorm:
            self.img_ln_scale = self.param(
                "img_ln_scale", nn.initializers.ones,
                (cfg.hidden_size,), jnp.float32)
            self.img_ln_bias = self.param(
                "img_ln_bias", nn.initializers.zeros,
                (cfg.hidden_size,), jnp.float32)
        self.encoder = StackedEncoder(cfg)
        self.pooler = Pooler(cfg)
        self.img_dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def __call__(self, input_ids: Array, txt_mask: Array,
                 img_feat: Optional[Array] = None,
                 img_mask: Optional[Array] = None,
                 token_type_ids: Optional[Array] = None,
                 deterministic: bool = True):
        cfg = self.config
        B, T = input_ids.shape
        position_ids = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
        emb = self.embeddings(input_ids, position_ids, token_type_ids,
                              deterministic=deterministic)
        joint_mask = txt_mask
        if img_feat is not None:
            img_emb = (img_feat.astype(jnp.float32)
                       @ self.img_embedding_kernel + self.img_embedding_bias)
            if self.use_img_layernorm:
                eps = (self.img_layer_norm_eps
                       if self.img_layer_norm_eps is not None
                       else cfg.layer_norm_eps)
                img_emb = _layer_norm(img_emb, self.img_ln_scale,
                                      self.img_ln_bias, eps, jnp.float32)
            img_emb = self.img_dropout(img_emb, deterministic=deterministic)
            emb = jnp.concatenate([emb.astype(jnp.float32), img_emb], axis=1)
            joint_mask = jnp.concatenate([txt_mask, img_mask], axis=1)
        bias = ((1.0 - joint_mask.astype(jnp.float32)) * -10000.0)[
            :, None, None, :]
        seq = self.encoder(emb.astype(jnp.dtype(cfg.dtype)), bias,
                           deterministic=deterministic)
        pooled = self.pooler(seq)
        return seq, pooled


class ImageBertForSequenceClassification(nn.Module):
    """Oscar classifier head (reference oscar.py:284-328)."""

    config: UniterConfig
    num_labels: int = 2
    classifier: str = "linear"       # linear | mlp
    cls_hidden_scale: int = 2
    img_feature_dim: int = IMG_DIM_OSCAR
    use_img_layernorm: bool = False
    img_layer_norm_eps: Optional[float] = None

    def setup(self):
        cfg = self.config
        self.bert = OscarModel(cfg, self.img_feature_dim,
                               self.use_img_layernorm,
                               self.img_layer_norm_eps)
        self.head_dropout = nn.Dropout(cfg.hidden_dropout_prob)
        ini = _init(cfg.initializer_range)
        if self.classifier == "mlp":
            self.cls_hidden = nn.Dense(
                cfg.hidden_size * self.cls_hidden_scale, kernel_init=ini,
                name="cls_hidden")
            self.cls_out = nn.Dense(self.num_labels, kernel_init=ini,
                                    name="cls_out")
        else:
            self.cls_out = nn.Dense(self.num_labels, kernel_init=ini,
                                    name="cls_out")
            self.cls_hidden = None

    def __call__(self, batch: Dict[str, Array],
                 deterministic: bool = True) -> Array:
        img_feat = batch.get("img_feat")
        if (img_feat is not None and "img_pos_feat" in batch
                and img_feat.shape[-1] == self.img_feature_dim - 6):
            # raw (2048-d features, 7-d geometry) pair — the device-resident
            # gather path (steps.gather_micro) yields the dataset's stored
            # arrays; assemble the 2054-d Oscar features IN-GRAPH (the host
            # path ships them pre-assembled by OscarBatchLoader). Shape
            # check is trace-time static, so both forms share one module.
            img_feat = oscar_batch_features(img_feat,
                                            batch["img_pos_feat"])
        _, pooled = self.bert(
            batch["input_ids"], batch["txt_mask"],
            img_feat=img_feat, img_mask=batch.get("img_mask"),
            token_type_ids=batch.get("token_type_ids"),
            deterministic=deterministic)
        x = self.head_dropout(pooled, deterministic=deterministic)
        if self.cls_hidden is not None:
            x = jax.nn.relu(self.cls_hidden(x))
        return self.cls_out(x)


def oscar_batch_features(img_feat: Array, img_pos_feat: Array) -> Array:
    """2048-d visual features ⊕ 6-d geometry → 2054-d Oscar features.

    The reference's feature files carry the 7-d encoding (x1,y1,x2,y2,w,h,
    w·h, dataset_template.py:98-113); Oscar's 2054 = 2048 + 6 drops the area
    term (config/oscar-base.json img_feature_dim).
    """
    return jnp.concatenate([img_feat, img_pos_feat[..., :6]], axis=-1)
