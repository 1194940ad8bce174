"""End-to-end tests for the text-baseline CLI entry points.

The hate-speech and object-text TRAINER modules (reference
text_based/train_hatespeech.py and train_object_text.py) had only their
data layers under test; these run the actual ``main(argv)`` CLIs on tiny
synthetic data with the registry's "bert" entry monkeypatched to a tiny
architecture — covering argparse → TrainConfig assembly, data-derived
n_classes (reference train_hatespeech.py:134-143), CE/BCE loss selection,
and the single-split crossval path (num_folds 0, utils/crossval.py:133-148).
"""
import dataclasses
import json

import numpy as np
import pytest

from meme_challenge_tpu.data.tokenizer import BertTokenizer
from meme_challenge_tpu.models import text_models
from meme_challenge_tpu.utils.synthetic import make_vocab


@pytest.fixture
def tiny_bert(tmp_path, monkeypatch):
    """Vocab file + MODEL_DICT['bert'] shrunk to a test-size architecture."""
    vocab = make_vocab(str(tmp_path / "vocab.txt"))
    tok = BertTokenizer(vocab)
    tiny = dataclasses.replace(
        text_models.MODEL_DICT["bert"]["config"],
        vocab_size=tok.vocab_size, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=32)
    monkeypatch.setitem(text_models.MODEL_DICT["bert"], "config", tiny)
    return vocab


def test_hatespeech_cli_end_to_end(tmp_path, tiny_bert):
    from meme_challenge_tpu.train import train_hatespeech

    labels = ["none", "racism", "sexism"]
    rows = ["id,text,label"] + [
        f"{i},the meme text number {i} @user #tag,{labels[i % 3]}"
        for i in range(24)]
    (tmp_path / "train.csv").write_text("\n".join(rows) + "\n")
    (tmp_path / "val.csv").write_text("\n".join(rows[:13]) + "\n")

    best_val, _ = train_hatespeech.main([
        "--vocab_file", tiny_bert,
        "--train_csv", str(tmp_path / "train.csv"),
        "--val_csv", str(tmp_path / "val.csv"),
        "--model_path", str(tmp_path / "ck"),
        "--model_save_name", "hs.ckpt",
        "--max_epoch", "1", "--batch_size", "8", "--max_txt_len", "16",
        "--warmup_steps", "2", "--log_every", "1", "--lr", "1e-3",
        "--seed", "7"])
    # CE over the data-derived 3-class vocabulary; selection on accuracy
    # (HATESPEECH_DEFAULTS mirrors reference train_hatespeech.py)
    assert "accuracy" in best_val and np.isfinite(best_val["accuracy"])
    assert 0.0 <= best_val["accuracy"] <= 1.0
    assert (tmp_path / "ck" / "hs.ckpt").exists()


def test_object_text_cli_end_to_end(tmp_path, tiny_bert):
    from meme_challenge_tpu.train import train_object_text

    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.RandomState(0)
    n = 20
    recs = [{"id": 100 + i, "img": "img/%i.png" % i, "label": i % 2,
             "text": "a meme about things %i" % i} for i in range(n)]
    (data / "train.jsonl").write_text(
        "\n".join(json.dumps(r) for r in recs[:14]) + "\n")
    (data / "dev_seen.jsonl").write_text(
        "\n".join(json.dumps(r) for r in recs[14:]) + "\n")
    np.savez(tmp_path / "objects.npz",
             ids=np.array([r["id"] for r in recs]),
             objects=rng.randint(0, 4, (n, 5)),
             probs=rng.rand(n, 5))
    (tmp_path / "obj2text.json").write_text(
        json.dumps({str(i): w for i, w in
                    enumerate(["cat", "dog", "hat", "person"])}))

    best_val, _ = train_object_text.main([
        "--vocab_file", tiny_bert,
        "--object_file", str(tmp_path / "objects.npz"),
        "--object_to_text_file", str(tmp_path / "obj2text.json"),
        "--data_path", str(data),
        "--model_path", str(tmp_path / "ck"),
        "--model_save_name", "ot.ckpt",
        "--num_folds", "0", "--max_epoch", "1", "--batch_size", "8",
        "--max_txt_len", "20", "--warmup_steps", "2", "--log_every", "1",
        "--lr", "1e-3", "--seed", "7",
        "--obj_threshold_min", "0.2", "--obj_threshold_max", "0.6",
        "--obj_swap_prob", "0.3"])
    assert "aucroc" in best_val and np.isfinite(best_val["aucroc"])
    assert (tmp_path / "ck" / "ot.ckpt").exists()


def test_extract_features_cli_modes_and_resume(tmp_path, monkeypatch):
    """The extraction CLI (reference extract_features.py:41-130): mode 2
    bbox export, mode 3 features-from-gt-bbox (the two-stage recipe,
    subrepo README.md:10-21), mode 1 full export, and the npz-exists
    resumable skip (reference :92-93)."""
    PIL = pytest.importorskip("PIL.Image")
    from meme_challenge_tpu.extract import extract_features
    from meme_challenge_tpu.extract.detector import DetectorConfig

    def small_cfg(**kw):
        kw.update(pre_nms_topk=200, post_nms_topk=20,
                  min_size=64, max_size=96)
        return DetectorConfig(**kw)

    monkeypatch.setattr(extract_features, "DetectorConfig", small_cfg)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    for name in ("01234.png", "01235.jpg"):
        PIL.fromarray(rng.randint(0, 255, (64, 80, 3), np.uint8)).save(
            img_dir / name)

    base = ["--image-dir", str(img_dir), "--min-boxes", "3",
            "--max-boxes", "6", "--conf-thresh", "0.0"]

    # mode 2: bbox-only npz
    bbox_dir = tmp_path / "bbox"
    extract_features.main(base + ["--out-dir", str(bbox_dir), "--mode", "2"])
    for stem in ("01234", "01235"):
        with np.load(bbox_dir / f"{stem}.npz") as z:
            assert set(z.files) >= {"bbox", "cls_prob"}
            assert z["bbox"].shape[1] == 4

    # mode 3: features from the mode-2 boxes
    feat3_dir = tmp_path / "feat3"
    extract_features.main(base + ["--out-dir", str(feat3_dir), "--mode", "3",
                                  "--bbox-dir", str(bbox_dir)])
    with np.load(feat3_dir / "01234.npz", allow_pickle=True) as z3, \
            np.load(bbox_dir / "01234.npz") as zb:
        assert z3["x"].shape[0] == int(z3["num_bbox"])
        assert int(z3["num_bbox"]) == len(zb["bbox"])

    # mode 1: full dynamic-box export + resumable skip on rerun
    feat_dir = tmp_path / "feat"
    extract_features.main(base + ["--out-dir", str(feat_dir), "--mode", "1"])
    out = feat_dir / "01234.npz"
    with np.load(out, allow_pickle=True) as z:
        assert set(z.files) >= {"x", "bbox", "num_bbox",
                                "image_h", "image_w", "info"}
        assert int(z["image_h"]) == 64 and int(z["image_w"]) == 80
        # random-init RPN may keep as few as 1 proposal; the clamp only
        # bounds ABOVE (min_boxes can't invent boxes beyond proposals)
        assert 1 <= int(z["num_bbox"]) <= 6
        assert z["x"].shape[0] == int(z["num_bbox"])
        assert len(z["info"].item()["objects_id"]) == int(z["num_bbox"])
    mtime = out.stat().st_mtime_ns
    extract_features.main(base + ["--out-dir", str(feat_dir), "--mode", "1"])
    assert out.stat().st_mtime_ns == mtime  # skipped, not recomputed
