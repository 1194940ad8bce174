"""Numerical parity of the flax UNITER against torch references.

UNITER's transformer stack *is* BERT (reference model/layer.py is the HF BERT
implementation with apex LayerNorm), so a random-init HuggingFace torch
``BertModel``/``BertEncoder`` — built offline from a config — is an exact
oracle for the text path and the encoder. The image-embedding branch is
checked against an independent numpy derivation of model/model.py:248-272.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from meme_challenge_tpu.core.config import UniterConfig
from meme_challenge_tpu.models.convert import (
    hf_bert_params_to_uniter_trunk,
    uniter_trunk_params_from_torch,
    _with_zero_image_embeddings,
    rename_reference_keys,
)
from meme_challenge_tpu.models.uniter import UniterModel, erf_gelu

SMALL = UniterConfig(
    vocab_size=211,
    hidden_size=48,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=96,
    max_position_embeddings=64,
    img_dim=32,
    hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0,
)


def _hf_config(cfg: UniterConfig):
    from transformers import BertConfig

    return BertConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="gelu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12,
    )


def _torch_sd_to_numpy(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def test_erf_gelu_matches_torch():
    x = np.linspace(-4, 4, 101, dtype=np.float32)
    ours = np.asarray(erf_gelu(jnp.array(x)))
    theirs = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_text_only_matches_hf_bert():
    from transformers import BertModel

    torch.manual_seed(0)
    hf = BertModel(_hf_config(SMALL)).eval()
    sd = _torch_sd_to_numpy(hf)
    trunk = hf_bert_params_to_uniter_trunk(sd, SMALL)

    B, T = 3, 11
    rng = np.random.RandomState(1)
    input_ids = rng.randint(0, SMALL.vocab_size, size=(B, T)).astype(np.int32)
    # variable text lengths to exercise masking
    lengths = np.array([11, 7, 4])
    txt_mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.int32)
    position_ids = np.tile(np.arange(T, dtype=np.int32), (B, 1))

    with torch.no_grad():
        hf_out = hf(
            input_ids=torch.from_numpy(input_ids).long(),
            attention_mask=torch.from_numpy(txt_mask).long(),
        ).last_hidden_state.numpy()

    model = UniterModel(SMALL)
    seq, _ = model.apply(
        {"params": trunk},
        input_ids=jnp.array(input_ids),
        position_ids=jnp.array(position_ids),
        img_feat=None,
        img_pos_feat=None,
        txt_mask=jnp.array(txt_mask),
        deterministic=True,
    )
    seq = np.asarray(seq)
    # compare only at valid positions; HF computes garbage at padding too but
    # identical masking math makes even padding rows match
    valid = txt_mask.astype(bool)
    np.testing.assert_allclose(seq[valid], hf_out[valid], atol=2e-5, rtol=1e-4)


def test_joint_forward_matches_hf_encoder_on_reference_layout():
    """Full joint path vs: numpy embeddings (independent re-derivation of
    model/model.py:217-272) + HF torch BertEncoder + pooler math."""
    from transformers import BertModel

    torch.manual_seed(7)
    hf = BertModel(_hf_config(SMALL)).eval()
    sd = rename_reference_keys(_torch_sd_to_numpy(hf), strip_prefixes=())

    # random image-branch weights (zeros default is too degenerate here)
    rng = np.random.RandomState(3)
    H, D, P = SMALL.hidden_size, SMALL.img_dim, SMALL.pos_dim
    sd = dict(sd)
    sd["img_embeddings.img_linear.weight"] = rng.randn(H, D).astype(np.float32) * 0.05
    sd["img_embeddings.img_linear.bias"] = rng.randn(H).astype(np.float32) * 0.02
    sd["img_embeddings.pos_linear.weight"] = rng.randn(H, P).astype(np.float32) * 0.05
    sd["img_embeddings.pos_linear.bias"] = rng.randn(H).astype(np.float32) * 0.02
    sd = _with_zero_image_embeddings(sd, SMALL)
    trunk = uniter_trunk_params_from_torch(sd, SMALL)

    B, T, R = 2, 9, 6
    input_ids = rng.randint(0, SMALL.vocab_size, size=(B, T)).astype(np.int32)
    position_ids = np.tile(np.arange(T, dtype=np.int32), (B, 1))
    img_feat = rng.randn(B, R, D).astype(np.float32)
    img_pos_feat = rng.rand(B, R, P).astype(np.float32)
    txt_len = np.array([9, 5])
    img_len = np.array([6, 3])
    txt_mask = (np.arange(T)[None] < txt_len[:, None]).astype(np.int32)
    img_mask = (np.arange(R)[None] < img_len[:, None]).astype(np.int32)

    # ---- independent numpy re-derivation of the embedding math ----
    def ln(x, w, b, eps=1e-12):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * w + b

    we = sd["embeddings.word_embeddings.weight"]
    pe = sd["embeddings.position_embeddings.weight"]
    te = sd["embeddings.token_type_embeddings.weight"]
    txt_emb = we[input_ids] + pe[position_ids] + te[0]
    txt_emb = ln(txt_emb, sd["embeddings.LayerNorm.weight"],
                 sd["embeddings.LayerNorm.bias"])

    im = ln(img_feat @ sd["img_embeddings.img_linear.weight"].T
            + sd["img_embeddings.img_linear.bias"],
            sd["img_embeddings.img_layer_norm.weight"],
            sd["img_embeddings.img_layer_norm.bias"])
    pos = ln(img_pos_feat @ sd["img_embeddings.pos_linear.weight"].T
             + sd["img_embeddings.pos_linear.bias"],
             sd["img_embeddings.pos_layer_norm.weight"],
             sd["img_embeddings.pos_layer_norm.bias"])
    img_emb = ln(im + pos + te[1],
                 sd["img_embeddings.LayerNorm.weight"],
                 sd["img_embeddings.LayerNorm.bias"])

    joint_emb = np.concatenate([txt_emb, img_emb], axis=1).astype(np.float32)
    joint_mask = np.concatenate([txt_mask, img_mask], axis=1)
    ext_mask = (1.0 - joint_mask[:, None, None, :].astype(np.float32)) * -10000.0

    with torch.no_grad():
        enc_out = hf.encoder(
            torch.from_numpy(joint_emb),
            attention_mask=torch.from_numpy(ext_mask),
        ).last_hidden_state.numpy()
        pooled_ref = hf.pooler(torch.from_numpy(enc_out)).numpy()

    # ---- our model ----
    model = UniterModel(SMALL)
    seq, _ = model.apply(
        {"params": trunk},
        input_ids=jnp.array(input_ids),
        position_ids=jnp.array(position_ids),
        img_feat=jnp.array(img_feat),
        img_pos_feat=jnp.array(img_pos_feat),
        txt_mask=jnp.array(txt_mask),
        img_mask=jnp.array(img_mask),
        deterministic=True,
    )
    pooled = model.apply({"params": trunk}, np.asarray(seq), method=UniterModel.pool)

    valid = joint_mask.astype(bool)
    np.testing.assert_allclose(np.asarray(seq)[valid], enc_out[valid],
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled), pooled_ref,
                               atol=3e-5, rtol=1e-4)


def test_masking_equivalent_to_compaction():
    """Padding keys must not influence valid positions: growing the padded
    region (the static-layout substitute for gather compaction,
    SURVEY.md §7 hard-part 1) leaves valid outputs bit-identical."""
    cfg = SMALL
    model = UniterModel(cfg)
    rng = np.random.RandomState(5)
    B, T = 2, 8
    input_ids = rng.randint(0, cfg.vocab_size, (B, T)).astype(np.int32)
    position_ids = np.tile(np.arange(T, dtype=np.int32), (B, 1))
    txt_mask = np.ones((B, T), np.int32)

    def run(R):
        img_feat = np.zeros((B, R, cfg.img_dim), np.float32)
        img_pos_feat = np.zeros((B, R, cfg.pos_dim), np.float32)
        img_feat[:, :3] = rng_feats
        img_pos_feat[:, :3] = rng_pos
        img_mask = (np.arange(R)[None] < 3).astype(np.int32) * np.ones((B, 1), np.int32)
        seq, _ = model.apply(
            {"params": params},
            input_ids=jnp.array(input_ids),
            position_ids=jnp.array(position_ids),
            img_feat=jnp.array(img_feat),
            img_pos_feat=jnp.array(img_pos_feat),
            txt_mask=jnp.array(txt_mask),
            img_mask=jnp.array(img_mask),
            deterministic=True,
        )
        return np.asarray(seq)

    rng_feats = rng.randn(B, 3, cfg.img_dim).astype(np.float32)
    rng_pos = rng.rand(B, 3, cfg.pos_dim).astype(np.float32)
    init_batch_feat = np.zeros((B, 4, cfg.img_dim), np.float32)
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.array(input_ids),
        position_ids=jnp.array(position_ids),
        img_feat=jnp.array(init_batch_feat),
        img_pos_feat=jnp.zeros((B, 4, cfg.pos_dim)),
        txt_mask=jnp.array(txt_mask),
        img_mask=jnp.ones((B, 4), jnp.int32),
        deterministic=True,
    )["params"]

    seq_small = run(R=4)
    seq_large = run(R=9)
    # valid region: T text + 3 image tokens
    np.testing.assert_allclose(
        seq_small[:, : T + 3], seq_large[:, : T + 3], atol=1e-6)


def test_uniter_large_config_shapes():
    """UNITER-large (24L/1024H/16 heads) parameter tree via eval_shape —
    verifies the large config wires up without materializing 340M params."""
    import jax

    from meme_challenge_tpu.core.config import UNITER_LARGE
    from meme_challenge_tpu.models.uniter import MemeUniter

    model = MemeUniter(UNITER_LARGE, n_classes=1)
    batch = {
        "input_ids": jnp.zeros((2, 60), jnp.int32),
        "position_ids": jnp.zeros((2, 60), jnp.int32),
        "img_feat": jnp.zeros((2, 100, 2048), jnp.float32),
        "img_pos_feat": jnp.zeros((2, 100, 7), jnp.float32),
        "txt_mask": jnp.ones((2, 60), jnp.int32),
        "img_mask": jnp.ones((2, 100), jnp.int32),
    }
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch,
                           deterministic=True))
    p = shapes["params"]
    enc = p["uniter"]["encoder"]
    assert enc["qkv_kernel"].shape == (24, 1024, 3072)
    assert enc["ffn_in_kernel"].shape == (24, 1024, 4096)
    assert p["uniter"]["embeddings"]["word_embeddings"].shape == (28996, 1024)
    total = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(p))
    assert 330e6 < total < 380e6  # UNITER-large scale


def test_torch_export_roundtrip():
    """flax → torch layout → flax roundtrips bit-exactly."""
    from meme_challenge_tpu.models.convert import (
        meme_uniter_params_from_torch,
        meme_uniter_params_to_torch,
    )
    from meme_challenge_tpu.models.uniter import MemeUniter

    model = MemeUniter(SMALL, n_classes=1)
    batch = {
        "input_ids": jnp.zeros((1, 5), jnp.int32),
        "position_ids": jnp.zeros((1, 5), jnp.int32),
        "img_feat": jnp.zeros((1, 4, SMALL.img_dim), jnp.float32),
        "img_pos_feat": jnp.zeros((1, 4, 7), jnp.float32),
        "txt_mask": jnp.ones((1, 5), jnp.int32),
        "img_mask": jnp.ones((1, 4), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(3), batch,
                        deterministic=True)["params"]
    sd = meme_uniter_params_to_torch(params)
    back = meme_uniter_params_from_torch(sd, SMALL)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[path]), err_msg=str(path))


def test_torch_export_key_names_match_reference_layout(tmp_path):
    """Golden key check: the exported state_dict must use the reference's
    exact names (uniter_model./linear. prefixes, per-layer BERT names) and
    torch.load back through load_torch_state_dict."""
    from meme_challenge_tpu.models.convert import (
        load_torch_state_dict,
        meme_uniter_params_to_torch,
        save_reference_checkpoint,
    )
    from meme_challenge_tpu.models.uniter import MemeUniter

    model = MemeUniter(SMALL, n_classes=1)
    batch = {
        "input_ids": jnp.zeros((1, 5), jnp.int32),
        "position_ids": jnp.zeros((1, 5), jnp.int32),
        "img_feat": jnp.zeros((1, 4, SMALL.img_dim), jnp.float32),
        "img_pos_feat": jnp.zeros((1, 4, 7), jnp.float32),
        "txt_mask": jnp.ones((1, 5), jnp.int32),
        "img_mask": jnp.ones((1, 4), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(3), batch,
                        deterministic=True)["params"]
    sd = meme_uniter_params_to_torch(params)
    # golden sentinel keys straight from the reference module layout
    # (model/meme_uniter.py + model/model.py)
    for key in [
        "uniter_model.embeddings.word_embeddings.weight",
        "uniter_model.img_embeddings.img_linear.weight",
        "uniter_model.img_embeddings.mask_embedding.weight",
        "uniter_model.encoder.layer.0.attention.self.query.weight",
        f"uniter_model.encoder.layer.{SMALL.num_hidden_layers-1}"
        ".output.LayerNorm.bias",
        "uniter_model.pooler.dense.weight",
        "linear.weight", "linear.bias",
    ]:
        assert key in sd, key
    # torch Linear orientation: [out, in]
    assert sd["uniter_model.img_embeddings.img_linear.weight"].shape == (
        SMALL.hidden_size, SMALL.img_dim)
    # full save→load roundtrip through the reference's on-disk format
    ckpt = str(tmp_path / "export.pt")
    save_reference_checkpoint(ckpt, params)
    back = load_torch_state_dict(ckpt)
    assert set(back) == set(sd)
    np.testing.assert_array_equal(back["linear.bias"], sd["linear.bias"])


def test_image_only_branch():
    """UniterModel's image-only branch (reference model/model.py:348-351):
    input_ids=None encodes regions alone with type-1 embeddings."""
    model = UniterModel(SMALL)
    rng_np = np.random.RandomState(11)
    B, R = 2, 5
    img_feat = jnp.asarray(rng_np.randn(B, R, SMALL.img_dim), jnp.float32)
    img_pos = jnp.asarray(rng_np.rand(B, R, 7), jnp.float32)
    img_mask = jnp.ones((B, R), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), input_ids=None, position_ids=None,
        img_feat=img_feat, img_pos_feat=img_pos, img_mask=img_mask,
        deterministic=True)["params"]
    seq, joint_mask = model.apply(
        {"params": params}, input_ids=None, position_ids=None,
        img_feat=img_feat, img_pos_feat=img_pos, img_mask=img_mask,
        deterministic=True)
    assert seq.shape == (B, R, SMALL.hidden_size)
    np.testing.assert_array_equal(np.asarray(joint_mask),
                                  np.asarray(img_mask))
    assert np.isfinite(np.asarray(seq)).all()
