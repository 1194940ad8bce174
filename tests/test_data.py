"""Data layer tests: tokenizer vs HF oracle, dataset/batcher semantics,
ConfounderSampler, and bit-identical crossval splits vs the reference
implementation executed from /root/reference."""
import importlib.util
import json
import os
import sys

import numpy as np
import pytest

from meme_challenge_tpu.data.crossval_splits import (
    crossval_dir,
    generate_crossval_splits,
)
from meme_challenge_tpu.data.meme_dataset import (
    BatchLoader,
    ConfounderSampler,
    MemeDataset,
)
from meme_challenge_tpu.data.tokenizer import BertTokenizer
from meme_challenge_tpu.utils.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return make_synthetic_dataset(str(root), img_dim=64)


@pytest.fixture(scope="module")
def tokenizer(synth):
    return BertTokenizer(synth["vocab"])


def test_tokenizer_matches_hf_on_same_vocab(synth):
    from transformers import BertTokenizer as HFTok

    ours = BertTokenizer(synth["vocab"])
    theirs = HFTok(vocab_file=synth["vocab"], do_lower_case=False)
    texts = [
        "the cat loves a hat!",
        "really?? trust me, look at this...",
        "wow wows wowing wowed",     # exercises ##s/##ing/##ed pieces
        "unknownword another_thing",  # [UNK] handling
        "",                           # empty text
        "pure CHAOS energy",          # case sensitivity -> [UNK]s
    ]
    for text in texts:
        assert ours.tokenize(text) == theirs.tokenize(text), text
        enc_o = ours.encode(text, max_length=12)
        enc_t = theirs(text, max_length=12, padding="max_length",
                       truncation=True)
        assert enc_o["input_ids"].tolist() == enc_t["input_ids"], text
        assert enc_o["attention_mask"].tolist() == enc_t["attention_mask"], text


def test_dataset_loads_and_batches(synth, tokenizer):
    ds = MemeDataset(synth["train"], feature_dir=synth["feature_dir"],
                     tokenizer=tokenizer, max_txt_len=16, max_bb=20,
                     img_dim=64)
    assert len(ds) == 40
    batch = ds.batch([0, 1, 2])
    assert batch["input_ids"].shape == (3, 16)
    assert batch["img_feat"].shape == (3, 20, 64)
    assert batch["img_pos_feat"].shape == (3, 20, 7)
    # 7-d encoding: w*h consistency at valid boxes
    pos = batch["img_pos_feat"]
    m = batch["img_mask"].astype(bool)
    w = pos[..., 4][m]
    h = pos[..., 5][m]
    np.testing.assert_allclose(pos[..., 6][m], w * h, rtol=1e-5)
    np.testing.assert_allclose(w, pos[..., 2][m] - pos[..., 0][m], rtol=1e-5)
    # normalized coords in [0, 1]
    assert pos[..., :4][m].min() >= 0.0 and pos[..., :4][m].max() <= 1.0 + 1e-6
    # mask matches stored num_bb and padding rows are zero
    assert (batch["img_mask"].sum(1) == ds.num_bb[:3]).all()
    assert np.all(batch["img_feat"][~m] == 0)


def test_confidence_threshold_filters_boxes(synth, tokenizer):
    ds_all = MemeDataset(synth["train"], feature_dir=synth["feature_dir"],
                         tokenizer=tokenizer, max_bb=20, img_dim=64)
    ds_f = MemeDataset(synth["train"], feature_dir=synth["feature_dir"],
                       tokenizer=tokenizer, max_bb=20, img_dim=64,
                       confidence_threshold=0.5)
    assert ds_f.num_bb.sum() < ds_all.num_bb.sum()
    assert ds_f.num_bb.min() >= 0


def test_batch_loader_pads_final_batch(synth, tokenizer):
    ds = MemeDataset(synth["dev_seen"], feature_dir=synth["feature_dir"],
                     tokenizer=tokenizer, max_bb=20, img_dim=64)
    loader = BatchLoader(ds, batch_size=6)
    batches = list(loader)
    assert len(batches) == len(loader) == 3  # 16 samples -> 6+6+4
    assert all(b["input_ids"].shape[0] == 6 for b in batches)
    assert batches[-1]["sample_mask"].tolist() == [1, 1, 1, 1, 0, 0]
    # every sample seen exactly once among valid entries
    seen = np.concatenate([b["ids"][b["sample_mask"].astype(bool)]
                           for b in batches])
    assert sorted(seen.tolist()) == sorted(ds.ids.tolist())


def test_confounder_sampler_repeats(synth, tokenizer):
    import random

    random.seed(13)
    ds = MemeDataset(synth["train"], feature_dir=synth["feature_dir"],
                     tokenizer=tokenizer, max_bb=20, img_dim=64)
    sampler = ConfounderSampler(ds, repeat_factor=3)
    # synthetic train has 4 confounder text pairs -> 8 confounder samples
    assert len(sampler.confounders) == 8
    assert len(sampler.non_confounders) == 32
    order = list(iter(sampler))
    assert len(order) == 32 + 3 * 8
    counts = np.bincount(order, minlength=len(ds))
    for idx in sampler.confounders:
        assert counts[idx] == 3
    for idx in sampler.non_confounders:
        assert counts[idx] == 1


def _run_reference_splits(data_path, dev_size, use_dev_set):
    """Execute the reference's generate_crossval_splits from /root/reference."""
    spec = importlib.util.spec_from_file_location(
        "ref_crossval", "/root/reference/utils/crossval.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # utils.* imports are try/except-guarded
    mod.generate_crossval_splits(data_path, dev_size=dev_size,
                                 use_dev_set=use_dev_set)


@pytest.mark.parametrize("use_dev", [False, True])
def test_crossval_splits_bit_identical_to_reference(tmp_path, use_dev):
    # build a jsonl-only dataset (no features needed for split generation)
    rng = np.random.RandomState(7)
    for name, n in [("train", 60), ("dev_seen", 20)]:
        recs = []
        for i in range(n):
            # unique texts: any dev_seen confounder triggers a probability
            # coin flip that CRASHES the reference on numpy>=1.25 (float32
            # p-sum tolerance); the confounder-ful path is covered for our
            # implementation in test_crossval_splits_with_dev_confounders
            text = "text %s %i" % (name, i)
            recs.append({"id": 20000 + i + (0 if name == "train" else 1000),
                         "img": "img/x.png", "label": int(rng.randint(0, 2)),
                         "text": text})
        with open(tmp_path / f"{name}.jsonl", "w") as f:
            f.write("\n".join(json.dumps(r) for r in recs))

    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    for d in (ref_dir, our_dir):
        d.mkdir()
        for name in ("train", "dev_seen"):
            (d / f"{name}.jsonl").write_text(
                (tmp_path / f"{name}.jsonl").read_text())

    _run_reference_splits(str(ref_dir), dev_size=8, use_dev_set=use_dev)
    generate_crossval_splits(str(our_dir), dev_size=8, use_dev_set=use_dev)

    ref_out = crossval_dir(str(ref_dir), 8, use_dev)
    our_out = crossval_dir(str(our_dir), 8, use_dev)
    ref_files = sorted(os.listdir(ref_out))
    our_files = sorted(os.listdir(our_out))
    assert ref_files == our_files and len(ref_files) > 0
    for fn in ref_files:
        ref_text = open(os.path.join(ref_out, fn)).read()
        our_text = open(os.path.join(our_out, fn)).read()
        assert ref_text == our_text, f"split file {fn} differs from reference"


def test_crossval_splits_with_dev_confounders(tmp_path):
    """The confounder coin-flip path: the reference crashes here on modern
    numpy (float32 p-sum tolerance); ours must survive and keep confounder
    groups together within each fold's test set."""
    rng = np.random.RandomState(3)
    for name, n in [("train", 60), ("dev_seen", 20)]:
        recs = []
        for i in range(n):
            # two duplicated texts in dev_seen -> confounder groups
            if name == "dev_seen" and i >= n - 2:
                text = "text dev_seen %i" % (i - (n - 2))
            else:
                text = "text %s %i" % (name, i)
            recs.append({"id": 30000 + i + (0 if name == "train" else 1000),
                         "img": "img/x.png", "label": int(rng.randint(0, 2)),
                         "text": text})
        with open(tmp_path / f"{name}.jsonl", "w") as f:
            f.write("\n".join(json.dumps(r) for r in recs))

    out = generate_crossval_splits(str(tmp_path), dev_size=8, use_dev_set=True)
    import glob as globmod
    test_sets = sorted(globmod.glob(os.path.join(out, "dev_seen_??.jsonl")))
    assert len(test_sets) >= 2
    for ts in test_sets:
        with open(ts) as f:
            recs = [json.loads(l) for l in f if l.strip()]
        texts = [r["text"] for r in recs]
        # confounder texts appear 0 or 2 times (kept together)
        for t in set(texts):
            if texts.count(t) > 1:
                assert texts.count(t) == 2
    # every fold's train+test partitions dev_seen exactly
    trains = sorted(globmod.glob(os.path.join(out, "train_??.jsonl")))
    for tr, ts in zip(trains, test_sets):
        with open(tr) as f:
            tr_ids = {json.loads(l)["id"] for l in f if l.strip()}
        with open(ts) as f:
            ts_ids = {json.loads(l)["id"] for l in f if l.strip()}
        dev_ids = set(range(31000, 31020))
        assert ts_ids <= dev_ids
        assert (tr_ids | ts_ids) >= dev_ids
        assert not (tr_ids & ts_ids)


def test_mlm_vocab_range_excludes_unused_and_specials(tmp_path):
    """Real bert-base-cased layout: [PAD]=0, [unused1..N], specials at the
    end of the reserved block — the MLM replacement range must start after
    all of them."""
    from meme_challenge_tpu.data.tokenizer import BertTokenizer, write_vocab

    tokens = (["[PAD]"] + [f"[unused{i}]" for i in range(1, 100)]
              + ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
              + ["the", "cat", "##s"])
    path = str(tmp_path / "vocab.txt")
    write_vocab(path, tokens)
    tok = BertTokenizer(path)
    lo, hi = tok.mlm_vocab_range()
    assert lo == 104 and hi == len(tokens)


def test_tokenizer_fuzz_vs_hf(tmp_path_factory):
    """Property fuzz: thousands of generated strings across the classic
    WordPiece divergence zones — unicode punctuation, CJK, accents,
    >100-char words, whitespace/control chars — must tokenize identically
    to HF's slow BertTokenizer on the same (larger, generated) vocab."""
    from transformers import BertTokenizer as HFTok

    from meme_challenge_tpu.data.tokenizer import write_vocab

    rng = np.random.RandomState(7)
    # build a vocab with whole words, ## pieces, unicode + CJK entries
    words = ["the", "cat", "hat", "love", "wow", "run", "jump", "meme",
             "chaos", "über", "café", "naïve", "résumé", "Ötzi"]
    pieces = ["##s", "##ing", "##ed", "##er", "##y", "##é", "##ü",
              "##aaa", "##bbb", "##cc", "a", "b", "c", "z", "Z"]
    cjk = ["中", "文", "字", "日", "本"]
    punct = list("!?.,;:()[]{}\"'`~@#$%^&*-_+=<>/\\|")
    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
             + words + pieces + cjk + punct)
    vocab_file = str(tmp_path_factory.mktemp("fuzzvocab") / "vocab.txt")
    write_vocab(vocab_file, vocab)

    ours = BertTokenizer(vocab_file)
    theirs = HFTok(vocab_file=vocab_file, do_lower_case=False)

    unicode_punct = ["…", "—", "–", "“", "”", "‘", "’", "¡", "¿", "«", "»",
                     "、", "。", "・"]
    whitespace = [" ", "  ", "\t", "\n", "\r", " ", " "]
    atoms = (words + pieces + cjk + punct + unicode_punct
             + ["über", "ÜBER", "Café", "ﬃ", "ß", "ǅ",
                "a" * 120,              # > max_input_chars_per_word
                "café" * 40,            # long accented word
                "中" * 30,               # CJK run
                "a中b", "wow中wow",      # mixed script
                "áé",       # combining accents
                "​", "﻿",     # zero-width / BOM
                "x\x00y", "m\x1fn",     # control chars
                "🙂", "🔥🔥", "👍🏽"])    # emoji (outside vocab)
    n_mismatch = 0
    for i in range(3000):
        k = rng.randint(0, 8)
        parts = [atoms[rng.randint(len(atoms))] for _ in range(k)]
        seps = [whitespace[rng.randint(len(whitespace))] for _ in parts]
        text = "".join(s + p for s, p in zip(seps, parts))
        got, want = ours.tokenize(text), theirs.tokenize(text)
        if got != want:
            n_mismatch += 1
            assert n_mismatch == 0, (repr(text), got, want)
        # ids path too, on a sample
        if i % 50 == 0:
            enc_o = ours.encode(text, max_length=24)
            enc_t = theirs(text, max_length=24, padding="max_length",
                           truncation=True)
            assert enc_o["input_ids"].tolist() == enc_t["input_ids"], \
                repr(text)
