"""Numerical parity vs the EXECUTED reference Oscar model.

The reference's Oscar variant (/root/reference/model/oscar.py) builds on
``transformers.modeling_bert`` from transformers 3.2.0 — a module path that
no longer exists. This file executes the reference file under a shim that
maps the old import surface onto the installed transformers
(``transformers.models.bert.modeling_bert``):

- ``BertLayerNorm`` → ``torch.nn.LayerNorm`` (what 3.2.0 aliased it to
  when apex was absent),
- ``BertSelfAttention`` → a subclass restoring ``transpose_for_scores``
  (dropped in the modern attention refactor; the reference's
  ``CaptionBertSelfAttention.forward`` calls it),

then compares against :class:`meme_challenge_tpu.models.oscar.
ImageBertForSequenceClassification` with params produced by
``oscar_params_from_torch`` from the reference module's REAL
``state_dict()``:

- joint text+image forward, linear and MLP classifier heads
  (reference oscar.py:284-328),
- the optional image LayerNorm with its own ``img_layer_norm_eps``
  (oscar.py:177),
- the text-only path (``img_feat=None``, oscar.py:196-265),
- variable-length text/region masks.
"""
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from meme_challenge_tpu.core.config import UniterConfig
from meme_challenge_tpu.models.convert import oscar_params_from_torch
from meme_challenge_tpu.models.oscar import ImageBertForSequenceClassification

ATOL = 1e-4

SMALL = UniterConfig(
    vocab_size=173,
    hidden_size=48,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=96,
    max_position_embeddings=64,
    hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0,
)
IMG_FEATURE_DIM = 22  # small stand-in for 2054


@pytest.fixture(scope="module")
def ref_oscar():
    """Import the reference model/oscar.py with transformers-3.2.0 shimmed."""
    import importlib.machinery

    import transformers.models.bert.modeling_bert as mb

    if "transformers.modeling_bert" not in sys.modules:
        shim = types.ModuleType("transformers.modeling_bert")

        class _SelfAttention(mb.BertSelfAttention):
            # transformers >= 4.48 dropped transpose_for_scores; restore the
            # 3.2.0 helper the reference's forward override relies on
            def transpose_for_scores(self, x):
                new_shape = x.size()[:-1] + (self.num_attention_heads,
                                             self.attention_head_size)
                return x.view(*new_shape).permute(0, 2, 1, 3)

        for name in ("BertEmbeddings", "BertAttention", "BertEncoder",
                     "BertLayer", "BertSelfOutput", "BertIntermediate",
                     "BertOutput", "BertPooler", "BertPreTrainedModel",
                     "BertModel"):
            setattr(shim, name, getattr(mb, name))
        shim.BertSelfAttention = _SelfAttention
        shim.BertLayerNorm = torch.nn.LayerNorm
        shim.__spec__ = importlib.machinery.ModuleSpec(
            "transformers.modeling_bert", None)
        sys.modules["transformers.modeling_bert"] = shim
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import model.oscar as ref_mod
    return ref_mod


def _ref_config(classifier="linear", use_img_layernorm=False,
                img_layer_norm_eps=1e-5):
    from transformers import BertConfig

    cfg = BertConfig(
        vocab_size=SMALL.vocab_size,
        hidden_size=SMALL.hidden_size,
        num_hidden_layers=SMALL.num_hidden_layers,
        num_attention_heads=SMALL.num_attention_heads,
        intermediate_size=SMALL.intermediate_size,
        max_position_embeddings=SMALL.max_position_embeddings,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        num_labels=2,
        attn_implementation="eager",
    )
    # reference config/oscar-base.json extras + meme-run flags
    cfg.img_feature_dim = IMG_FEATURE_DIM
    cfg.img_feature_type = "faster_r-cnn"
    cfg.classifier = classifier
    cfg.cls_hidden_scale = 2
    cfg.use_img_layernorm = use_img_layernorm
    if use_img_layernorm:
        cfg.img_layer_norm_eps = img_layer_norm_eps
    return cfg


def _build_ref(ref_oscar, seed, **cfg_kwargs):
    torch.manual_seed(seed)
    model = ref_oscar.ImageBertForSequenceClassification(
        _ref_config(**cfg_kwargs)).eval()
    return model


def _case(rng, B=3, T=9, R=6):
    input_ids = rng.randint(0, SMALL.vocab_size, size=(B, T)).astype(np.int32)
    img_feat = rng.randn(B, R, IMG_FEATURE_DIM).astype(np.float32)
    txt_lens = np.array([T, 6, 4])
    num_bbs = np.array([R, 3, 5])
    txt_mask = (np.arange(T)[None] < txt_lens[:, None]).astype(np.int32)
    img_mask = (np.arange(R)[None] < num_bbs[:, None]).astype(np.int32)
    return input_ids, img_feat, txt_mask, img_mask


def _ref_logits(model, input_ids, txt_mask, img_feat=None, img_mask=None):
    joint = (torch.from_numpy(np.concatenate([txt_mask, img_mask], axis=1))
             if img_feat is not None else torch.from_numpy(txt_mask))
    with torch.no_grad():
        out = model(
            torch.from_numpy(input_ids).long(),
            attention_mask=joint.long(),
            img_feat=(torch.from_numpy(img_feat)
                      if img_feat is not None else None))
    return out[0].numpy()


def _ours_logits(model_kwargs, torch_model, batch):
    flax_model = ImageBertForSequenceClassification(
        SMALL, num_labels=2, img_feature_dim=IMG_FEATURE_DIM, **model_kwargs)
    sd = {k: v.detach().cpu().numpy()
          for k, v in torch_model.state_dict().items()}
    params = oscar_params_from_torch(sd, SMALL)
    out = flax_model.apply({"params": params}, batch, deterministic=True)
    return np.asarray(out)


@pytest.mark.parametrize("classifier", ["linear", "mlp"])
def test_oscar_joint_oracle(ref_oscar, classifier):
    rng = np.random.RandomState(7)
    torch_model = _build_ref(ref_oscar, seed=3, classifier=classifier)
    input_ids, img_feat, txt_mask, img_mask = _case(rng)

    ref = _ref_logits(torch_model, input_ids, txt_mask, img_feat, img_mask)
    ours = _ours_logits({"classifier": classifier}, torch_model, {
        "input_ids": jnp.asarray(input_ids),
        "txt_mask": jnp.asarray(txt_mask),
        "img_feat": jnp.asarray(img_feat),
        "img_mask": jnp.asarray(img_mask),
    })
    assert ref.shape == ours.shape == (3, 2)
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_oscar_img_layernorm_oracle(ref_oscar):
    """use_img_layernorm with a DIFFERENT eps than the encoder LayerNorms."""
    rng = np.random.RandomState(11)
    torch_model = _build_ref(ref_oscar, seed=5, use_img_layernorm=True,
                             img_layer_norm_eps=1e-3)
    input_ids, img_feat, txt_mask, img_mask = _case(rng)
    # tiny feature variance (~1e-4) makes the 1e-3 eps term dominant in the
    # image LayerNorm, so the wrong-eps guard below has signal
    img_feat = img_feat * 1e-2

    ref = _ref_logits(torch_model, input_ids, txt_mask, img_feat, img_mask)
    ours = _ours_logits(
        {"use_img_layernorm": True, "img_layer_norm_eps": 1e-3},
        torch_model, {
            "input_ids": jnp.asarray(input_ids),
            "txt_mask": jnp.asarray(txt_mask),
            "img_feat": jnp.asarray(img_feat),
            "img_mask": jnp.asarray(img_mask),
        })
    np.testing.assert_allclose(ours, ref, atol=ATOL)
    # eps actually matters at 1e-3: re-converting under the default eps
    # must NOT match (guards against the eps being silently ignored)
    ours_wrong_eps = _ours_logits(
        {"use_img_layernorm": True}, torch_model, {
            "input_ids": jnp.asarray(input_ids),
            "txt_mask": jnp.asarray(txt_mask),
            "img_feat": jnp.asarray(img_feat),
            "img_mask": jnp.asarray(img_mask),
        })
    assert np.abs(ours_wrong_eps - ref).max() > ATOL


def test_oscar_text_only_oracle(ref_oscar):
    rng = np.random.RandomState(13)
    torch_model = _build_ref(ref_oscar, seed=9)
    input_ids, _, txt_mask, _ = _case(rng)

    ref = _ref_logits(torch_model, input_ids, txt_mask)
    ours = _ours_logits({}, torch_model, {
        "input_ids": jnp.asarray(input_ids),
        "txt_mask": jnp.asarray(txt_mask),
    })
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_oscar_converter_rejects_nothing_silently(ref_oscar):
    """The converter consumes every parameter the reference model carries
    (no reference weight silently ignored → no drifting-layout risk)."""
    torch_model = _build_ref(ref_oscar, seed=21, classifier="mlp",
                             use_img_layernorm=True)
    sd = {k: v.detach().cpu().numpy()
          for k, v in torch_model.state_dict().items()}
    params = oscar_params_from_torch(sd, SMALL)

    n_params_ref = sum(int(np.prod(v.shape)) for v in sd.values())
    flat, _ = jax.tree_util.tree_flatten(params)
    n_params_ours = sum(int(np.prod(p.shape)) for p in flat)
    assert n_params_ref == n_params_ours
