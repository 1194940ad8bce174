"""Full-model numerical parity vs the EXECUTED reference UNITER.

Round-1 parity used HF BERT as the oracle for the text path + encoder; this
file closes the remaining gap by executing the reference's own model code
(/root/reference/model/{model,meme_uniter,pretrain}.py) with apex stubbed
(``FusedLayerNorm`` -> ``torch.nn.LayerNorm``, mathematically identical) and
comparing:

- the joint / text-only / image-only branches of UniterModel
  (reference model/model.py:336-367) through the MemeUniter head
  (model/meme_uniter.py:17-21), with variable text lengths and box counts
  exercising the gather-compaction-vs-static-layout equivalence,
- all four pretraining heads (model/pretrain.py:107-233): MLM, MRFR, ITM,
  MRC and MRC-kl losses,
- the checkpoint converter against the REAL key layout produced by the
  reference modules' ``state_dict()`` (not a hand-built imitation),
  including the ``{'model_state_dict': ...}`` wrapper (utils/save.py:53-64)
  and TF-era ``gamma``/``beta`` + ``bert.`` prefixed keys
  (model/model.py:164-200).
"""
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from meme_challenge_tpu.core.config import UniterConfig
from meme_challenge_tpu.models.convert import (
    load_torch_state_dict,
    meme_uniter_params_from_torch,
    pretrain_params_from_torch,
)
from meme_challenge_tpu.models.uniter import MemeUniter, UniterForPretraining

ATOL = 1e-4


@pytest.fixture(scope="module")
def ref():
    """Import the reference model package with apex stubbed."""
    import importlib.machinery
    if "apex" not in sys.modules:
        apex = types.ModuleType("apex")
        norm = types.ModuleType("apex.normalization")
        fln = types.ModuleType("apex.normalization.fused_layer_norm")
        # apex FusedLayerNorm(hidden, eps) == torch LayerNorm(hidden, eps)
        fln.FusedLayerNorm = torch.nn.LayerNorm
        norm.fused_layer_norm = fln
        apex.normalization = norm
        sys.modules["apex"] = apex
        sys.modules["apex.normalization"] = norm
        sys.modules["apex.normalization.fused_layer_norm"] = fln
    # transformers probes importlib.util.find_spec("apex"), which RAISES
    # ValueError on a module whose __spec__ is None — give every stub a
    # real spec so suites importing transformers after us keep working
    for name in ("apex", "apex.normalization",
                 "apex.normalization.fused_layer_norm"):
        mod = sys.modules[name]
        if getattr(mod, "__spec__", None) is None:
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import model.model as ref_model
    import model.meme_uniter as ref_meme
    import model.pretrain as ref_pretrain

    ns = types.SimpleNamespace(
        model=ref_model, meme=ref_meme, pretrain=ref_pretrain)
    return ns


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
IMG_LABEL_DIM = 23  # small stand-in for 1601


def _ref_config(ref):
    return ref.model.UniterConfig(
        SMALL.vocab_size,
        hidden_size=SMALL.hidden_size,
        num_hidden_layers=SMALL.num_hidden_layers,
        num_attention_heads=SMALL.num_attention_heads,
        intermediate_size=SMALL.intermediate_size,
        max_position_embeddings=SMALL.max_position_embeddings,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )


def _sd_numpy(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def _gather_index(txt_lens, num_bbs, T, out_size):
    """Reference get_gather_index (utils/utils.py:111-117), in numpy."""
    B = len(txt_lens)
    gi = np.tile(np.arange(out_size, dtype=np.int64), (B, 1))
    for i, (tl, nbb) in enumerate(zip(txt_lens, num_bbs)):
        gi[i, tl:tl + nbb] = np.arange(T, T + nbb, dtype=np.int64)
    return gi


def _joint_case(rng, B=3, T=11, R=7):
    cfg = SMALL
    input_ids = rng.randint(0, cfg.vocab_size, size=(B, T)).astype(np.int32)
    position_ids = np.tile(np.arange(T, dtype=np.int32), (B, 1))
    img_feat = rng.randn(B, R, cfg.img_dim).astype(np.float32)
    img_pos_feat = rng.rand(B, R, 7).astype(np.float32)
    txt_lens = np.array([T, 7, 4])
    num_bbs = np.array([R, 3, 5])
    txt_mask = (np.arange(T)[None] < txt_lens[:, None]).astype(np.int32)
    img_mask = (np.arange(R)[None] < num_bbs[:, None]).astype(np.int32)
    # reference compact layout
    out_size = int((txt_lens + num_bbs).max())
    gather_index = _gather_index(txt_lens, num_bbs, T, out_size)
    attn_mask = (np.arange(out_size)[None] <
                 (txt_lens + num_bbs)[:, None]).astype(np.int64)
    return dict(input_ids=input_ids, position_ids=position_ids,
                img_feat=img_feat, img_pos_feat=img_pos_feat,
                txt_mask=txt_mask, img_mask=img_mask,
                txt_lens=txt_lens, num_bbs=num_bbs,
                gather_index=gather_index, attn_mask=attn_mask)


@pytest.fixture(scope="module")
def torch_meme(ref):
    torch.manual_seed(11)
    uniter = ref.model.UniterModel(_ref_config(ref), SMALL.img_dim)
    meme = ref.meme.MemeUniter(uniter, hidden_size=SMALL.hidden_size,
                               n_classes=1).eval()
    return meme


@pytest.fixture(scope="module")
def torch_pretrain(ref):
    torch.manual_seed(13)
    model = ref.pretrain.UniterForPretraining(
        _ref_config(ref), img_dim=SMALL.img_dim,
        img_label_dim=IMG_LABEL_DIM).eval()
    return model


def test_meme_uniter_joint_branch_oracle(ref, torch_meme, rng):
    """Joint branch + pooler + classifier vs the executed reference, with
    variable text lengths / box counts (gather compaction on their side)."""
    case = _joint_case(rng)
    with torch.no_grad():
        ref_logits = torch_meme(
            input_ids=torch.from_numpy(case["input_ids"]).long(),
            position_ids=torch.from_numpy(case["position_ids"]).long(),
            img_feat=torch.from_numpy(case["img_feat"]),
            img_pos_feat=torch.from_numpy(case["img_pos_feat"]),
            attention_mask=torch.from_numpy(case["attn_mask"]),
            gather_index=torch.from_numpy(case["gather_index"]),
            output_all_encoded_layers=False,
        ).numpy()

    params = meme_uniter_params_from_torch(_sd_numpy(torch_meme), SMALL)
    model = MemeUniter(SMALL, n_classes=1)
    ours = np.asarray(model.apply(
        {"params": params},
        {"input_ids": jnp.array(case["input_ids"]),
         "position_ids": jnp.array(case["position_ids"]),
         "img_feat": jnp.array(case["img_feat"]),
         "img_pos_feat": jnp.array(case["img_pos_feat"]),
         "txt_mask": jnp.array(case["txt_mask"]),
         "img_mask": jnp.array(case["img_mask"])},
        deterministic=True))
    np.testing.assert_allclose(ours, ref_logits, atol=ATOL, rtol=1e-4)


def test_uniter_joint_sequence_oracle(ref, torch_meme, rng):
    """Position-by-position sequence outputs: ours static [text|image] layout
    vs reference compacted layout, compared at every valid position."""
    case = _joint_case(rng)
    T = case["input_ids"].shape[1]
    with torch.no_grad():
        ref_seq = torch_meme.uniter_model(
            input_ids=torch.from_numpy(case["input_ids"]).long(),
            position_ids=torch.from_numpy(case["position_ids"]).long(),
            img_feat=torch.from_numpy(case["img_feat"]),
            img_pos_feat=torch.from_numpy(case["img_pos_feat"]),
            attention_mask=torch.from_numpy(case["attn_mask"]),
            gather_index=torch.from_numpy(case["gather_index"]),
            output_all_encoded_layers=False,
        ).numpy()

    params = meme_uniter_params_from_torch(_sd_numpy(torch_meme), SMALL)
    from meme_challenge_tpu.models.uniter import UniterModel
    model = UniterModel(SMALL)
    seq, _ = model.apply(
        {"params": params["uniter"]},
        input_ids=jnp.array(case["input_ids"]),
        position_ids=jnp.array(case["position_ids"]),
        img_feat=jnp.array(case["img_feat"]),
        img_pos_feat=jnp.array(case["img_pos_feat"]),
        txt_mask=jnp.array(case["txt_mask"]),
        img_mask=jnp.array(case["img_mask"]),
        deterministic=True)
    seq = np.asarray(seq)
    for b, (tl, nb) in enumerate(zip(case["txt_lens"], case["num_bbs"])):
        np.testing.assert_allclose(
            seq[b, :tl], ref_seq[b, :tl], atol=ATOL, rtol=1e-4)
        np.testing.assert_allclose(
            seq[b, T:T + nb], ref_seq[b, tl:tl + nb], atol=ATOL, rtol=1e-4)


def test_text_only_branch_oracle(ref, torch_meme, rng):
    case = _joint_case(rng)
    T = case["input_ids"].shape[1]
    with torch.no_grad():
        ref_logits = torch_meme(
            input_ids=torch.from_numpy(case["input_ids"]).long(),
            position_ids=torch.from_numpy(case["position_ids"]).long(),
            img_feat=None, img_pos_feat=None,
            attention_mask=torch.from_numpy(
                case["txt_mask"].astype(np.int64)),
            gather_index=None,
            output_all_encoded_layers=False,
        ).numpy()

    params = meme_uniter_params_from_torch(_sd_numpy(torch_meme), SMALL)
    model = MemeUniter(SMALL, n_classes=1)
    ours = np.asarray(model.apply(
        {"params": params},
        {"input_ids": jnp.array(case["input_ids"]),
         "position_ids": jnp.array(case["position_ids"]),
         "txt_mask": jnp.array(case["txt_mask"])},
        deterministic=True))
    np.testing.assert_allclose(ours, ref_logits, atol=ATOL, rtol=1e-4)


def test_image_only_branch_oracle(ref, torch_meme, rng):
    case = _joint_case(rng)
    with torch.no_grad():
        ref_logits = torch_meme(
            input_ids=None, position_ids=None,
            img_feat=torch.from_numpy(case["img_feat"]),
            img_pos_feat=torch.from_numpy(case["img_pos_feat"]),
            attention_mask=torch.from_numpy(
                case["img_mask"].astype(np.int64)),
            gather_index=None,
            output_all_encoded_layers=False,
        ).numpy()

    params = meme_uniter_params_from_torch(_sd_numpy(torch_meme), SMALL)
    model = MemeUniter(SMALL, n_classes=1)
    ours = np.asarray(model.apply(
        {"params": params},
        {"img_feat": jnp.array(case["img_feat"]),
         "img_pos_feat": jnp.array(case["img_pos_feat"]),
         "img_mask": jnp.array(case["img_mask"])},
        deterministic=True))
    np.testing.assert_allclose(ours, ref_logits, atol=ATOL, rtol=1e-4)


# ---------------------------------------------------------------------------
# Pretraining heads. Full text/box lengths (identity gather) so both layouts
# coincide; layout equivalence under padding is covered by the joint tests.
# ---------------------------------------------------------------------------

def _pretrain_case(rng, B=3, T=9, R=6):
    cfg = SMALL
    input_ids = rng.randint(0, cfg.vocab_size, size=(B, T)).astype(np.int32)
    position_ids = np.tile(np.arange(T, dtype=np.int32), (B, 1))
    img_feat = rng.randn(B, R, cfg.img_dim).astype(np.float32)
    img_pos_feat = rng.rand(B, R, 7).astype(np.float32)
    txt_mask = np.ones((B, T), np.int32)
    img_mask = np.ones((B, R), np.int32)
    attn_mask = np.ones((B, T + R), np.int64)
    gather_index = np.tile(np.arange(T + R, dtype=np.int64), (B, 1))
    base_ours = {"input_ids": jnp.array(input_ids),
                 "position_ids": jnp.array(position_ids),
                 "img_feat": jnp.array(img_feat),
                 "img_pos_feat": jnp.array(img_pos_feat),
                 "txt_mask": jnp.array(txt_mask),
                 "img_mask": jnp.array(img_mask)}
    base_ref = {"input_ids": torch.from_numpy(input_ids).long(),
                "position_ids": torch.from_numpy(position_ids).long(),
                "img_feat": torch.from_numpy(img_feat),
                "img_pos_feat": torch.from_numpy(img_pos_feat),
                "attn_masks": torch.from_numpy(attn_mask),
                "gather_index": torch.from_numpy(gather_index)}
    return base_ours, base_ref, (B, T, R)


@pytest.fixture(scope="module")
def flax_pretrain_params(torch_pretrain):
    return pretrain_params_from_torch(_sd_numpy(torch_pretrain), SMALL)


def _flax_pt():
    return UniterForPretraining(SMALL, img_label_dim=IMG_LABEL_DIM)


def test_mlm_head_oracle(ref, torch_pretrain, flax_pretrain_params, rng):
    ours_b, ref_b, (B, T, R) = _pretrain_case(rng)
    txt_labels = np.full((B, T), -1, np.int64)
    n_masked = 0
    for b in range(B):
        pos = rng.choice(T, size=rng.randint(1, 4), replace=False)
        txt_labels[b, pos] = rng.randint(0, SMALL.vocab_size, size=len(pos))
        n_masked += len(pos)
    ref_b = dict(ref_b, txt_labels=torch.from_numpy(txt_labels))
    with torch.no_grad():
        ref_loss = torch_pretrain(ref_b, "mlm", compute_loss=True).numpy()

    ours_b = dict(ours_b, txt_labels=jnp.array(txt_labels.astype(np.int32)))
    nll, mask = _flax_pt().apply({"params": flax_pretrain_params},
                                 ours_b, "mlm", deterministic=True)
    picked = np.asarray(nll)[np.asarray(mask)]
    assert picked.shape == ref_loss.shape == (n_masked,)
    np.testing.assert_allclose(picked, ref_loss, atol=ATOL, rtol=1e-4)


def test_mrfr_head_oracle(ref, torch_pretrain, flax_pretrain_params, rng):
    ours_b, ref_b, (B, T, R) = _pretrain_case(rng)
    img_masks = (rng.rand(B, R) < 0.4)
    img_masks[:, 0] |= ~img_masks.any(axis=1)  # at least one per sample
    feat_target_dense = rng.randn(B, R, SMALL.img_dim).astype(np.float32)
    img_mask_tgt = np.concatenate(
        [np.zeros((B, T), bool), img_masks], axis=1)
    ref_b = dict(ref_b,
                 img_masks=torch.from_numpy(img_masks),
                 img_mask_tgt=torch.from_numpy(img_mask_tgt),
                 feat_targets=torch.from_numpy(feat_target_dense[img_masks]))
    with torch.no_grad():
        ref_loss = torch_pretrain(ref_b, "mrfr", compute_loss=True).numpy()

    ours_b = dict(ours_b,
                  img_masks=jnp.array(img_masks),
                  feat_targets=jnp.array(feat_target_dense))
    err, mask = _flax_pt().apply({"params": flax_pretrain_params},
                                 ours_b, "mrfr", deterministic=True)
    picked = np.asarray(err)[np.asarray(mask)]
    np.testing.assert_allclose(picked, ref_loss, atol=ATOL, rtol=1e-4)


def test_itm_head_oracle(ref, torch_pretrain, flax_pretrain_params, rng):
    ours_b, ref_b, (B, T, R) = _pretrain_case(rng)
    targets = rng.randint(0, 2, size=B).astype(np.int64)
    ref_b = dict(ref_b, targets=torch.from_numpy(targets), ot_inputs=None)
    with torch.no_grad():
        ref_scores = torch_pretrain(ref_b, "itm", compute_loss=False).numpy()
        ref_loss = torch_pretrain(ref_b, "itm", compute_loss=True).numpy()

    scores = np.asarray(_flax_pt().apply(
        {"params": flax_pretrain_params}, ours_b, "itm", deterministic=True))
    np.testing.assert_allclose(scores, ref_scores, atol=ATOL, rtol=1e-4)

    logp = scores.astype(np.float64)
    logp = logp - logp.max(-1, keepdims=True)
    logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
    our_ce = -logp[np.arange(B), targets]
    np.testing.assert_allclose(our_ce, ref_loss, atol=ATOL, rtol=1e-4)


def _mrc_case(rng, B, T, R):
    img_masks = (rng.rand(B, R) < 0.4)
    img_masks[:, 0] |= ~img_masks.any(axis=1)
    soft = rng.rand(B, R, IMG_LABEL_DIM).astype(np.float32)
    soft /= soft.sum(-1, keepdims=True)
    img_mask_tgt = np.concatenate([np.zeros((B, T), bool), img_masks], axis=1)
    return img_masks, soft, img_mask_tgt


def test_mrc_head_oracle(ref, torch_pretrain, flax_pretrain_params, rng):
    ours_b, ref_b, (B, T, R) = _pretrain_case(rng)
    img_masks, soft, img_mask_tgt = _mrc_case(rng, B, T, R)
    ref_b = dict(ref_b,
                 img_masks=torch.from_numpy(img_masks),
                 img_mask_tgt=torch.from_numpy(img_mask_tgt),
                 label_targets=torch.from_numpy(soft[img_masks]))
    with torch.no_grad():
        ref_loss = torch_pretrain(ref_b, "mrc", compute_loss=True).numpy()

    ours_b = dict(ours_b, img_masks=jnp.array(img_masks),
                  label_targets=jnp.array(soft))
    nll, mask = _flax_pt().apply({"params": flax_pretrain_params},
                                 ours_b, "mrc", deterministic=True)
    picked = np.asarray(nll)[np.asarray(mask)]
    np.testing.assert_allclose(picked, ref_loss, atol=ATOL, rtol=1e-4)


def test_mrc_kl_head_oracle(ref, torch_pretrain, flax_pretrain_params, rng):
    ours_b, ref_b, (B, T, R) = _pretrain_case(rng)
    img_masks, soft, img_mask_tgt = _mrc_case(rng, B, T, R)
    ref_b = dict(ref_b,
                 img_masks=torch.from_numpy(img_masks),
                 img_mask_tgt=torch.from_numpy(img_mask_tgt),
                 label_targets=torch.from_numpy(soft[img_masks]))
    with torch.no_grad():
        ref_loss = torch_pretrain(ref_b, "mrc-kl", compute_loss=True).numpy()

    ours_b = dict(ours_b, img_masks=jnp.array(img_masks),
                  label_targets=jnp.array(soft))
    kl, mask = _flax_pt().apply({"params": flax_pretrain_params},
                                ours_b, "mrc-kl", deterministic=True)
    picked = np.asarray(kl)[np.asarray(mask)]
    np.testing.assert_allclose(picked, ref_loss, atol=ATOL, rtol=1e-4)


# ---------------------------------------------------------------------------
# Converter vs the real checkpoint file formats
# ---------------------------------------------------------------------------

def test_wrapped_checkpoint_file_roundtrip(ref, torch_meme, rng, tmp_path):
    """{'model_state_dict': ...} wrapper file (utils/save.py:53-64) loads and
    converts identically to the in-memory state_dict."""
    path = tmp_path / "ckpt.pt"
    torch.save({"model_state_dict": torch_meme.state_dict()}, str(path))
    sd = load_torch_state_dict(str(path))
    params = meme_uniter_params_from_torch(sd, SMALL)

    case = _joint_case(rng)
    with torch.no_grad():
        ref_logits = torch_meme(
            input_ids=torch.from_numpy(case["input_ids"]).long(),
            position_ids=torch.from_numpy(case["position_ids"]).long(),
            img_feat=torch.from_numpy(case["img_feat"]),
            img_pos_feat=torch.from_numpy(case["img_pos_feat"]),
            attention_mask=torch.from_numpy(case["attn_mask"]),
            gather_index=torch.from_numpy(case["gather_index"]),
            output_all_encoded_layers=False,
        ).numpy()
    ours = np.asarray(MemeUniter(SMALL, n_classes=1).apply(
        {"params": params},
        {"input_ids": jnp.array(case["input_ids"]),
         "position_ids": jnp.array(case["position_ids"]),
         "img_feat": jnp.array(case["img_feat"]),
         "img_pos_feat": jnp.array(case["img_pos_feat"]),
         "txt_mask": jnp.array(case["txt_mask"]),
         "img_mask": jnp.array(case["img_mask"])},
        deterministic=True))
    np.testing.assert_allclose(ours, ref_logits, atol=ATOL, rtol=1e-4)


def test_gamma_beta_bert_prefix_ingestion(ref, torch_pretrain):
    """Raw UNITER ckpts carry TF-era gamma/beta LayerNorm names and a
    ``bert.`` prefix (model/model.py:164-200); conversion must agree with the
    modern key layout bit-for-bit."""
    sd = _sd_numpy(torch_pretrain)
    legacy = {}
    for k, v in sd.items():
        lk = k.replace("LayerNorm.weight", "LayerNorm.gamma")
        lk = lk.replace("LayerNorm.bias", "LayerNorm.beta")
        legacy["bert." + lk] = v
    direct = pretrain_params_from_torch(sd, SMALL)
    via_legacy = pretrain_params_from_torch(legacy, SMALL)

    import jax
    flat_d = jax.tree_util.tree_leaves_with_path(direct)
    flat_l = dict(jax.tree_util.tree_leaves_with_path(via_legacy))
    assert len(flat_d) == len(flat_l)
    for path, leaf in flat_d:
        np.testing.assert_array_equal(leaf, flat_l[path])
