"""torch-checkpoint → flax-pytree converter for UNITER weights.

The reference ships/loads torch ``state_dict`` checkpoints with these quirks
(model/model.py:148-214, README.md:25-33):

- ``gamma``→``weight`` / ``beta``→``bias`` key renames (TF-era LayerNorm names),
- a ``bert.`` prefix on raw UNITER pretraining checkpoints that must be
  stripped when the target model has no ``bert`` attribute,
- checkpoints wrapped as ``{'model_state_dict': ...}`` (utils/save.py:53-64),
- fine-tuned MemeUniter checkpoints prefix the trunk with ``uniter_model.``
  and the head with ``linear.`` (model/meme_uniter.py).

This module reproduces those renames and maps per-layer torch weights into
the stacked ``[L, ...]`` encoder layout used by
:class:`meme_challenge_tpu.models.uniter.StackedEncoder`. torch Linear stores
``weight`` as ``[out, in]``; flax kernels are ``[in, out]`` — transposed here.

Weight tying is structural on the flax side (MLM decode reads the word table,
MRFR decode reads img_linear), so tied tensors are simply not duplicated.
"""
from __future__ import annotations

import re
from typing import Dict, Mapping, Optional

import numpy as np

from meme_challenge_tpu.core.config import UniterConfig

Params = Dict[str, dict]


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into numpy arrays (CPU, no CUDA needed).

    Accepts both raw state_dicts and ``{'model_state_dict': ...}`` wrappers
    (reference utils/save.py:53-64, README.md:25-33).
    """
    import torch  # local import: torch is host-side tooling only

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        ckpt = ckpt["model_state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach")
            else np.asarray(v) for k, v in ckpt.items()}


def rename_reference_keys(sd: Mapping[str, np.ndarray],
                          strip_prefixes: tuple = ("bert.",)) -> Dict[str, np.ndarray]:
    """gamma/beta renames + prefix stripping (reference model/model.py:164-200)."""
    out: Dict[str, np.ndarray] = {}
    for key, val in sd.items():
        new_key = key
        if "gamma" in new_key:
            new_key = new_key.replace("gamma", "weight")
        if "beta" in new_key:
            new_key = new_key.replace("beta", "bias")
        for p in strip_prefixes:
            if new_key.startswith(p):
                new_key = new_key[len(p):]
        out[new_key] = val
    return out


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear [out,in] → flax kernel [in,out]."""
    return np.ascontiguousarray(w.T)


def bert_stacked_encoder_from_torch(
    sd: Mapping[str, np.ndarray],
    num_layers: int,
    prefix: str = "",
) -> Params:
    """Per-layer torch BERT encoder weights → stacked ``[L, ...]`` tree.

    All BERT-layout checkpoints (UNITER trunk — reference model/layer.py,
    HF bert/roberta/electra, Oscar's BertImgModel — reference
    model/oscar.py:145-165) share the ``{prefix}encoder.layer.{i}.*`` key
    format; this maps them onto the StackedEncoder layout with the QKV
    kernels pre-concatenated into one ``[L, H, 3H]`` parameter.
    """
    def stack(fmt, transpose=False):
        mats = [np.asarray(sd[prefix + fmt.format(i)], dtype=np.float32)
                for i in range(num_layers)]
        if transpose:
            mats = [m.T for m in mats]
        return np.ascontiguousarray(np.stack(mats, axis=0))

    return {
        "qkv_kernel": np.ascontiguousarray(np.concatenate([
            stack("encoder.layer.{}.attention.self.query.weight", True),
            stack("encoder.layer.{}.attention.self.key.weight", True),
            stack("encoder.layer.{}.attention.self.value.weight", True),
        ], axis=-1)),
        "qkv_bias": np.ascontiguousarray(np.concatenate([
            stack("encoder.layer.{}.attention.self.query.bias"),
            stack("encoder.layer.{}.attention.self.key.bias"),
            stack("encoder.layer.{}.attention.self.value.bias"),
        ], axis=-1)),
        "attn_out_kernel": stack(
            "encoder.layer.{}.attention.output.dense.weight", True),
        "attn_out_bias": stack("encoder.layer.{}.attention.output.dense.bias"),
        "attn_ln_scale": stack(
            "encoder.layer.{}.attention.output.LayerNorm.weight"),
        "attn_ln_bias": stack(
            "encoder.layer.{}.attention.output.LayerNorm.bias"),
        "ffn_in_kernel": stack(
            "encoder.layer.{}.intermediate.dense.weight", True),
        "ffn_in_bias": stack("encoder.layer.{}.intermediate.dense.bias"),
        "ffn_out_kernel": stack("encoder.layer.{}.output.dense.weight", True),
        "ffn_out_bias": stack("encoder.layer.{}.output.dense.bias"),
        "ffn_ln_scale": stack("encoder.layer.{}.output.LayerNorm.weight"),
        "ffn_ln_bias": stack("encoder.layer.{}.output.LayerNorm.bias"),
    }


def uniter_trunk_params_from_torch(
    sd: Mapping[str, np.ndarray],
    config: UniterConfig,
    prefix: str = "",
) -> Params:
    """Map a (renamed) torch UNITER state_dict onto the flax UniterModel tree.

    ``prefix`` selects the trunk inside larger checkpoints (e.g. ``uniter.``
    for UniterForPretraining dumps, ``uniter_model.`` for MemeUniter dumps).
    """
    g = lambda k: np.asarray(sd[prefix + k], dtype=np.float32)  # noqa: E731
    L = config.num_hidden_layers

    embeddings = {
        "word_embeddings": g("embeddings.word_embeddings.weight"),
        "position_embeddings": g("embeddings.position_embeddings.weight"),
        "token_type_embeddings": g("embeddings.token_type_embeddings.weight"),
        "ln_scale": g("embeddings.LayerNorm.weight"),
        "ln_bias": g("embeddings.LayerNorm.bias"),
    }
    img_embeddings = {
        "img_linear_kernel": _t(g("img_embeddings.img_linear.weight")),
        "img_linear_bias": g("img_embeddings.img_linear.bias"),
        "pos_linear_kernel": _t(g("img_embeddings.pos_linear.weight")),
        "pos_linear_bias": g("img_embeddings.pos_linear.bias"),
        "img_ln_scale": g("img_embeddings.img_layer_norm.weight"),
        "img_ln_bias": g("img_embeddings.img_layer_norm.bias"),
        "pos_ln_scale": g("img_embeddings.pos_layer_norm.weight"),
        "pos_ln_bias": g("img_embeddings.pos_layer_norm.bias"),
        "ln_scale": g("img_embeddings.LayerNorm.weight"),
        "ln_bias": g("img_embeddings.LayerNorm.bias"),
    }
    if prefix + "img_embeddings.mask_embedding.weight" in sd:
        img_embeddings["mask_embedding"] = g("img_embeddings.mask_embedding.weight")
    else:
        img_embeddings["mask_embedding"] = np.zeros(
            (2, config.img_dim), dtype=np.float32)

    # [q|k|v] concatenated on the output axis (StackedEncoder stores QKV
    # as one [L, H, 3H] kernel; the torch layout stays per-matrix)
    encoder = bert_stacked_encoder_from_torch(sd, L, prefix=prefix)
    pooler = {
        "dense": {
            "kernel": _t(g("pooler.dense.weight")),
            "bias": g("pooler.dense.bias"),
        }
    }
    return {
        "embeddings": embeddings,
        "img_embeddings": img_embeddings,
        "encoder": encoder,
        "pooler": pooler,
    }


def meme_uniter_params_from_torch(
    sd: Mapping[str, np.ndarray],
    config: UniterConfig,
    classifier_prefix: str = "linear.",
    trunk_prefix: str = "uniter_model.",
) -> Params:
    """Fine-tuned MemeUniter checkpoint → flax params (model/meme_uniter.py)."""
    sd = rename_reference_keys(sd, strip_prefixes=())
    trunk = uniter_trunk_params_from_torch(sd, config, prefix=trunk_prefix)
    params: Params = {"uniter": trunk}
    if classifier_prefix + "weight" in sd:
        params["classifier"] = {
            "kernel": _t(np.asarray(sd[classifier_prefix + "weight"],
                                    dtype=np.float32)),
            "bias": np.asarray(sd[classifier_prefix + "bias"], dtype=np.float32),
        }
    return params


def pretrain_params_from_torch(
    sd: Mapping[str, np.ndarray],
    config: UniterConfig,
) -> Params:
    """Raw UNITER pretraining checkpoint → flax UniterForPretraining params.

    Mirrors reference TrainerUniter.init_model (train_uniter.py:22-34):
    the raw ckpt may carry a ``bert.`` prefix (stripped) and may or may not
    contain the pretraining heads (missing heads stay at init).
    """
    sd = rename_reference_keys(sd, strip_prefixes=("bert.",))
    has_trunk_prefix = any(k.startswith("uniter.") for k in sd)
    trunk_prefix = "uniter." if has_trunk_prefix else ""
    params: Params = {
        "uniter": uniter_trunk_params_from_torch(sd, config, prefix=trunk_prefix)
    }

    def has(k):
        return k in sd

    def g(k):
        return np.asarray(sd[k], dtype=np.float32)

    if has("cls.predictions.transform.dense.weight"):
        params["mlm_head"] = {
            "transform_dense": {
                "kernel": _t(g("cls.predictions.transform.dense.weight")),
                "bias": g("cls.predictions.transform.dense.bias"),
            },
            "transform_ln_scale": g("cls.predictions.transform.LayerNorm.weight"),
            "transform_ln_bias": g("cls.predictions.transform.LayerNorm.bias"),
            "bias": g("cls.predictions.bias"),
        }
    if has("feat_regress.net.0.weight"):
        params["feat_regress"] = {
            "net_dense": {
                "kernel": _t(g("feat_regress.net.0.weight")),
                "bias": g("feat_regress.net.0.bias"),
            },
            "net_ln_scale": g("feat_regress.net.2.weight"),
            "net_ln_bias": g("feat_regress.net.2.bias"),
            "bias": g("feat_regress.bias"),
        }
    if has("region_classifier.net.0.weight"):
        params["region_classifier"] = {
            "net_dense": {
                "kernel": _t(g("region_classifier.net.0.weight")),
                "bias": g("region_classifier.net.0.bias"),
            },
            "net_ln_scale": g("region_classifier.net.2.weight"),
            "net_ln_bias": g("region_classifier.net.2.bias"),
            "net_out": {
                "kernel": _t(g("region_classifier.net.3.weight")),
                "bias": g("region_classifier.net.3.bias"),
            },
        }
    if has("itm_output.weight"):
        params["itm_output"] = {
            "kernel": _t(g("itm_output.weight")),
            "bias": g("itm_output.bias"),
        }
    return params


def oscar_params_from_torch(
    sd: Mapping[str, np.ndarray],
    config: UniterConfig,
) -> Params:
    """Reference Oscar checkpoint → flax ImageBertForSequenceClassification.

    Maps the state_dict layout of the reference's
    ``ImageBertForSequenceClassification`` (model/oscar.py:284-328 wrapping
    ``BertImgModel`` :145-273): HF-BERT embeddings/encoder/pooler under
    ``bert.``, the 2054→H ``bert.img_embedding`` linear, the optional
    image LayerNorm (``bert.LayerNorm``, present only with
    ``use_img_layernorm``), and the classifier head — ``classifier.*`` for
    the linear head or ``classifier.{0,2}.*`` for the MLP ``nn.Sequential``.
    Head shape and the image-LayerNorm are inferred from the keys present.
    """
    sd = rename_reference_keys(sd, strip_prefixes=())

    def g(k):
        return np.asarray(sd[k], dtype=np.float32)

    bert: Params = {
        "embeddings": {
            "word_embeddings": g("bert.embeddings.word_embeddings.weight"),
            "position_embeddings": g(
                "bert.embeddings.position_embeddings.weight"),
            "token_type_embeddings": g(
                "bert.embeddings.token_type_embeddings.weight"),
            "ln_scale": g("bert.embeddings.LayerNorm.weight"),
            "ln_bias": g("bert.embeddings.LayerNorm.bias"),
        },
        "img_embedding_kernel": _t(g("bert.img_embedding.weight")),
        "img_embedding_bias": g("bert.img_embedding.bias"),
        "encoder": bert_stacked_encoder_from_torch(
            sd, config.num_hidden_layers, prefix="bert."),
        "pooler": {"dense": {"kernel": _t(g("bert.pooler.dense.weight")),
                             "bias": g("bert.pooler.dense.bias")}},
    }
    if "bert.LayerNorm.weight" in sd:  # use_img_layernorm checkpoints
        bert["img_ln_scale"] = g("bert.LayerNorm.weight")
        bert["img_ln_bias"] = g("bert.LayerNorm.bias")
    params: Params = {"bert": bert}
    if "classifier.weight" in sd:      # linear head
        params["cls_out"] = {"kernel": _t(g("classifier.weight")),
                             "bias": g("classifier.bias")}
    elif "classifier.0.weight" in sd:  # mlp head (Linear, ReLU, Linear)
        params["cls_hidden"] = {"kernel": _t(g("classifier.0.weight")),
                                "bias": g("classifier.0.bias")}
        params["cls_out"] = {"kernel": _t(g("classifier.2.weight")),
                             "bias": g("classifier.2.bias")}
    return params


def hf_bert_params_to_uniter_trunk(
    sd: Mapping[str, np.ndarray],
    config: UniterConfig,
) -> Params:
    """Map a HuggingFace ``BertModel`` state_dict onto the UNITER trunk.

    UNITER's text path *is* BERT (reference model/layer.py header), so an HF
    BERT checkpoint initializes everything except the image embeddings.
    Used by the text-only baselines and the parity tests.
    """
    sd = rename_reference_keys(sd, strip_prefixes=("bert.",))
    trunk = uniter_trunk_params_from_torch(
        _with_zero_image_embeddings(sd, config), config)
    return trunk


def _with_zero_image_embeddings(sd: Mapping[str, np.ndarray],
                                config: UniterConfig) -> Dict[str, np.ndarray]:
    out = dict(sd)
    H = config.hidden_size
    defaults = {
        "img_embeddings.img_linear.weight": np.zeros((H, config.img_dim), np.float32),
        "img_embeddings.img_linear.bias": np.zeros((H,), np.float32),
        "img_embeddings.pos_linear.weight": np.zeros((H, config.pos_dim), np.float32),
        "img_embeddings.pos_linear.bias": np.zeros((H,), np.float32),
        "img_embeddings.img_layer_norm.weight": np.ones((H,), np.float32),
        "img_embeddings.img_layer_norm.bias": np.zeros((H,), np.float32),
        "img_embeddings.pos_layer_norm.weight": np.ones((H,), np.float32),
        "img_embeddings.pos_layer_norm.bias": np.zeros((H,), np.float32),
        "img_embeddings.LayerNorm.weight": np.ones((H,), np.float32),
        "img_embeddings.LayerNorm.bias": np.zeros((H,), np.float32),
    }
    for k, v in defaults.items():
        out.setdefault(k, v)
    return out


def hf_text_backbone_params(
    sd: Mapping[str, np.ndarray],
    config,
) -> Params:
    """Map a HuggingFace BERT/RoBERTa/ALBERT/ELECTRA state_dict onto
    :class:`meme_challenge_tpu.models.text_models.TextBackbone`.

    Handles the per-family HF naming:
    - bert/roberta: ``embeddings.* / encoder.layer.{i}.* / pooler.*``
    - electra: ``embeddings.*`` (embedding_size) + ``embeddings_project`` +
      ``encoder.layer.{i}.*``, no pooler
    - albert: ``embeddings.*`` + ``encoder.embedding_hidden_mapping_in`` +
      ONE shared layer group ``encoder.albert_layer_groups.0.albert_layers.0``
    """
    sd = rename_reference_keys(
        sd, strip_prefixes=("bert.", "roberta.", "electra.", "albert."))
    family = config.family
    out: Params = {}

    def g(k):
        return np.asarray(sd[k], dtype=np.float32)

    out["word_embeddings"] = g("embeddings.word_embeddings.weight")
    out["position_embeddings"] = g("embeddings.position_embeddings.weight")
    if "embeddings.token_type_embeddings.weight" in sd:
        out["token_type_embeddings"] = g(
            "embeddings.token_type_embeddings.weight")
    else:
        out["token_type_embeddings"] = np.zeros(
            (1, out["word_embeddings"].shape[1]), np.float32)
    out["emb_ln_scale"] = g("embeddings.LayerNorm.weight")
    out["emb_ln_bias"] = g("embeddings.LayerNorm.bias")

    if family == "electra" and "embeddings_project.weight" in sd:
        out["emb_proj"] = {"kernel": _t(g("embeddings_project.weight")),
                           "bias": g("embeddings_project.bias")}
    if family == "albert":
        out["emb_proj"] = {
            "kernel": _t(g("encoder.embedding_hidden_mapping_in.weight")),
            "bias": g("encoder.embedding_hidden_mapping_in.bias")}

    if family == "albert":
        p = "encoder.albert_layer_groups.0.albert_layers.0."
        L = 1

        def stack1(key, transpose=False):
            m = g(p + key)
            if transpose:
                m = m.T
            return np.ascontiguousarray(m[None])

        out["encoder"] = {
            "qkv_kernel": np.ascontiguousarray(np.concatenate([
                stack1("attention.query.weight", True),
                stack1("attention.key.weight", True),
                stack1("attention.value.weight", True),
            ], axis=-1)),
            "qkv_bias": np.ascontiguousarray(np.concatenate([
                stack1("attention.query.bias"),
                stack1("attention.key.bias"),
                stack1("attention.value.bias"),
            ], axis=-1)),
            "attn_out_kernel": stack1("attention.dense.weight", True),
            "attn_out_bias": stack1("attention.dense.bias"),
            "attn_ln_scale": stack1("attention.LayerNorm.weight"),
            "attn_ln_bias": stack1("attention.LayerNorm.bias"),
            "ffn_in_kernel": stack1("ffn.weight", True),
            "ffn_in_bias": stack1("ffn.bias"),
            "ffn_out_kernel": stack1("ffn_output.weight", True),
            "ffn_out_bias": stack1("ffn_output.bias"),
            "ffn_ln_scale": stack1("full_layer_layer_norm.weight"),
            "ffn_ln_bias": stack1("full_layer_layer_norm.bias"),
        }
    else:
        out["encoder"] = bert_stacked_encoder_from_torch(
            sd, config.num_hidden_layers)

    if "pooler.dense.weight" in sd:
        out["pooler"] = {"dense": {"kernel": _t(g("pooler.dense.weight")),
                                   "bias": g("pooler.dense.bias")}}
    elif family == "albert" and "pooler.weight" in sd:
        out["pooler"] = {"dense": {"kernel": _t(g("pooler.weight")),
                                   "bias": g("pooler.bias")}}
    return out


def uniter_trunk_params_to_torch(params: Mapping, prefix: str = "") -> Dict[str, np.ndarray]:
    """Inverse of :func:`uniter_trunk_params_from_torch`: flax UniterModel
    tree → reference-layout torch state_dict arrays (for users exporting back
    to the reference stack; roundtrip-tested)."""
    out: Dict[str, np.ndarray] = {}
    emb = params["embeddings"]
    out[prefix + "embeddings.word_embeddings.weight"] = np.asarray(
        emb["word_embeddings"])
    out[prefix + "embeddings.position_embeddings.weight"] = np.asarray(
        emb["position_embeddings"])
    out[prefix + "embeddings.token_type_embeddings.weight"] = np.asarray(
        emb["token_type_embeddings"])
    out[prefix + "embeddings.LayerNorm.weight"] = np.asarray(emb["ln_scale"])
    out[prefix + "embeddings.LayerNorm.bias"] = np.asarray(emb["ln_bias"])
    img = params["img_embeddings"]
    out[prefix + "img_embeddings.img_linear.weight"] = _t(
        np.asarray(img["img_linear_kernel"]))
    out[prefix + "img_embeddings.img_linear.bias"] = np.asarray(
        img["img_linear_bias"])
    out[prefix + "img_embeddings.pos_linear.weight"] = _t(
        np.asarray(img["pos_linear_kernel"]))
    out[prefix + "img_embeddings.pos_linear.bias"] = np.asarray(
        img["pos_linear_bias"])
    out[prefix + "img_embeddings.img_layer_norm.weight"] = np.asarray(
        img["img_ln_scale"])
    out[prefix + "img_embeddings.img_layer_norm.bias"] = np.asarray(
        img["img_ln_bias"])
    out[prefix + "img_embeddings.pos_layer_norm.weight"] = np.asarray(
        img["pos_ln_scale"])
    out[prefix + "img_embeddings.pos_layer_norm.bias"] = np.asarray(
        img["pos_ln_bias"])
    out[prefix + "img_embeddings.LayerNorm.weight"] = np.asarray(
        img["ln_scale"])
    out[prefix + "img_embeddings.LayerNorm.bias"] = np.asarray(img["ln_bias"])
    out[prefix + "img_embeddings.mask_embedding.weight"] = np.asarray(
        img["mask_embedding"])

    enc = {k: np.asarray(v) for k, v in params["encoder"].items()}
    # un-concatenate [q|k|v] back into the reference's per-matrix layout
    qk, kk, vk = np.split(enc.pop("qkv_kernel"), 3, axis=-1)
    qb, kb, vb = np.split(enc.pop("qkv_bias"), 3, axis=-1)
    enc.update({"q_kernel": qk, "k_kernel": kk, "v_kernel": vk,
                "q_bias": qb, "k_bias": kb, "v_bias": vb})
    L = enc["q_kernel"].shape[0]
    per_layer = {
        "attention.self.query.weight": ("q_kernel", True),
        "attention.self.query.bias": ("q_bias", False),
        "attention.self.key.weight": ("k_kernel", True),
        "attention.self.key.bias": ("k_bias", False),
        "attention.self.value.weight": ("v_kernel", True),
        "attention.self.value.bias": ("v_bias", False),
        "attention.output.dense.weight": ("attn_out_kernel", True),
        "attention.output.dense.bias": ("attn_out_bias", False),
        "attention.output.LayerNorm.weight": ("attn_ln_scale", False),
        "attention.output.LayerNorm.bias": ("attn_ln_bias", False),
        "intermediate.dense.weight": ("ffn_in_kernel", True),
        "intermediate.dense.bias": ("ffn_in_bias", False),
        "output.dense.weight": ("ffn_out_kernel", True),
        "output.dense.bias": ("ffn_out_bias", False),
        "output.LayerNorm.weight": ("ffn_ln_scale", False),
        "output.LayerNorm.bias": ("ffn_ln_bias", False),
    }
    for i in range(L):
        for tname, (ours, transpose) in per_layer.items():
            mat = enc[ours][i]
            out[prefix + f"encoder.layer.{i}.{tname}"] = (
                _t(mat) if transpose else mat)
    out[prefix + "pooler.dense.weight"] = _t(
        np.asarray(params["pooler"]["dense"]["kernel"]))
    out[prefix + "pooler.dense.bias"] = np.asarray(
        params["pooler"]["dense"]["bias"])
    return out


def meme_uniter_params_to_torch(params: Mapping) -> Dict[str, np.ndarray]:
    """MemeUniter params → reference fine-tuned-checkpoint layout
    (``uniter_model.`` trunk + ``linear.`` head, model/meme_uniter.py)."""
    out = uniter_trunk_params_to_torch(params["uniter"],
                                       prefix="uniter_model.")
    if "classifier" in params:
        out["linear.weight"] = _t(np.asarray(params["classifier"]["kernel"]))
        out["linear.bias"] = np.asarray(params["classifier"]["bias"])
    return out


def save_reference_checkpoint(path: str, params: Mapping) -> None:
    """torch.save a MemeUniter param tree in the reference's on-disk format:
    torch tensors wrapped as {'model_state_dict': ...} (utils/save.py:53-64),
    directly loadable by the reference TrainerUniter.load_model."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in meme_uniter_params_to_torch(params).items()}
    torch.save({"model_state_dict": sd}, path)
