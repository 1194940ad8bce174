"""Text-only model family: parity vs HF torch oracles (random-init, offline)
and the auxiliary datasets/trainers."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from meme_challenge_tpu.models.convert import hf_text_backbone_params
from meme_challenge_tpu.models.text_models import (
    MODEL_DICT,
    TextBackbone,
    TextModelConfig,
    build_text_model,
    roberta_position_ids,
)


def test_registry_covers_reference_families():
    # reference text_based/model.py:8-17
    assert set(MODEL_DICT) == {
        "bert", "bert_large", "roberta", "roberta_large", "roberta_mnli",
        "albert", "albert_large", "electra"}


def _run_backbone(cfg, params, ids, mask):
    bb = TextBackbone(cfg)
    return bb.apply({"params": params}, jnp.array(ids), jnp.array(mask))


def test_bert_backbone_matches_hf():
    from transformers import BertConfig, BertModel

    cfg = TextModelConfig(vocab_size=120, hidden_size=32,
                          num_hidden_layers=2, num_attention_heads=2,
                          intermediate_size=64, max_position_embeddings=40)
    torch.manual_seed(0)
    hf = BertModel(BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=40, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12)).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = hf_text_backbone_params(sd, cfg)

    rng = np.random.RandomState(0)
    ids = rng.randint(0, 120, (2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    seq, pooled = _run_backbone(cfg, params, ids, mask)
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids).long(),
                 attention_mask=torch.from_numpy(mask).long())
    np.testing.assert_allclose(np.asarray(seq),
                               out.last_hidden_state.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(pooled),
                               out.pooler_output.numpy(), atol=3e-5)


def test_roberta_backbone_matches_hf():
    from transformers import RobertaConfig, RobertaModel

    cfg = TextModelConfig(family="roberta", vocab_size=130, hidden_size=32,
                          num_hidden_layers=2, num_attention_heads=2,
                          intermediate_size=64, max_position_embeddings=42,
                          type_vocab_size=1, pad_token_id=1)
    torch.manual_seed(1)
    hf = RobertaModel(RobertaConfig(
        vocab_size=130, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=42, type_vocab_size=1, pad_token_id=1,
        hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-12)).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = hf_text_backbone_params(sd, cfg)

    rng = np.random.RandomState(2)
    ids = rng.randint(2, 130, (2, 8)).astype(np.int32)
    ids[0, 6:] = 1  # pad
    ids[1, 4:] = 1
    mask = (ids != 1).astype(np.int32)
    seq, pooled = _run_backbone(cfg, params, ids, mask)
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids).long(),
                 attention_mask=torch.from_numpy(mask).long())
    valid = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(seq)[valid],
                               out.last_hidden_state.numpy()[valid],
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(pooled),
                               out.pooler_output.numpy(), atol=3e-5)


def test_roberta_position_ids_match_hf():
    from transformers.models.roberta.modeling_roberta import (
        create_position_ids_from_input_ids,
    )

    rng = np.random.RandomState(3)
    ids = rng.randint(2, 50, (3, 10))
    ids[:, 7:] = 1
    ours = np.asarray(roberta_position_ids(jnp.array(ids), pad_id=1))
    theirs = create_position_ids_from_input_ids(
        torch.from_numpy(ids), padding_idx=1).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_albert_shared_layers_param_count():
    """ALBERT must have ONE layer's worth of encoder params regardless of L."""
    cfg = TextModelConfig(family="albert", vocab_size=100, hidden_size=32,
                          num_hidden_layers=6, num_attention_heads=2,
                          intermediate_size=64, embedding_size=16,
                          shared_layers=True)
    bb = TextBackbone(cfg)
    params = bb.init(jax.random.PRNGKey(0),
                     jnp.ones((2, 8), jnp.int32),
                     jnp.ones((2, 8), jnp.int32))["params"]
    assert params["encoder"]["qkv_kernel"].shape == (1, 32, 96)
    assert params["word_embeddings"].shape == (100, 16)
    assert params["emb_proj"]["kernel"].shape == (16, 32)
    # depth actually applied: output differs from a 1-pass run
    ids = jnp.ones((1, 8), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    seq6, _ = bb.apply({"params": params}, ids, mask)
    cfg1 = TextModelConfig(**{**cfg.__dict__, "num_hidden_layers": 1})
    seq1, _ = TextBackbone(cfg1).apply({"params": params}, ids, mask)
    assert not np.allclose(np.asarray(seq6), np.asarray(seq1))


def test_electra_no_pooler():
    cfg = MODEL_DICT["electra"]["config"]
    small = TextModelConfig(**{**cfg.__dict__, "vocab_size": 80,
                               "num_hidden_layers": 2, "hidden_size": 32,
                               "num_attention_heads": 2,
                               "intermediate_size": 64,
                               "embedding_size": 16})
    model = build_text_model("electra", num_classes=1)
    assert not MODEL_DICT["electra"]["config"].has_pooler
    bb = TextBackbone(small)
    params = bb.init(jax.random.PRNGKey(0), jnp.ones((1, 6), jnp.int32),
                     jnp.ones((1, 6), jnp.int32))["params"]
    assert "pooler" not in params
    seq, pooled = bb.apply({"params": params}, jnp.ones((1, 6), jnp.int32),
                           jnp.ones((1, 6), jnp.int32))
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(seq[:, 0]))


def test_classification_head_shapes(rng):
    model = build_text_model("bert", num_classes=1)
    # shrink for test speed: swap in a tiny backbone
    from meme_challenge_tpu.models.text_models import (
        TransformerClassificationHead,
    )

    tiny = TextModelConfig(vocab_size=60, hidden_size=32,
                           num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=64)
    model = TransformerClassificationHead(
        backbone=TextBackbone(tiny), num_classes=1, dropout=0.5)
    batch = {"input_ids": jnp.ones((4, 8), jnp.int32),
             "txt_mask": jnp.ones((4, 8), jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), batch,
                        deterministic=True)["params"]
    out = model.apply({"params": params}, batch, deterministic=True)
    assert out.shape == (4, 1)
    out2 = model.apply({"params": params}, batch, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    assert out2.shape == (4, 1)


def test_gelu_new_matches_torch_tanh_approx():
    import torch.nn.functional as F

    from meme_challenge_tpu.models.uniter import gelu_new

    x = np.linspace(-4, 4, 101, dtype=np.float32)
    ours = np.asarray(gelu_new(jnp.array(x)))
    theirs = F.gelu(torch.from_numpy(x), approximate="tanh").numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-6)


def test_albert_registry_uses_gelu_new_and_no_dropout():
    cfg = MODEL_DICT["albert"]["config"]
    assert cfg.hidden_act == "gelu_new"
    assert cfg.hidden_dropout_prob == 0.0
    assert MODEL_DICT["roberta"]["config"].layer_norm_eps == 1e-5
