"""Auxiliary datasets (Twitter hate-speech, object-text) + their trainers."""
import json
import os

import numpy as np
import pytest

from meme_challenge_tpu.data.hatespeech import (
    TwitterHatespeechDataset,
    preprocess_tweet,
)
from meme_challenge_tpu.data.object_text import ObjectTextDataset
from meme_challenge_tpu.data.tokenizer import BertTokenizer
from meme_challenge_tpu.utils.synthetic import make_synthetic_dataset


def test_tweet_scrubbing_matches_reference_rules():
    # rules from reference data/hatespeech_dataset.py:93-111
    cases = [
        ("check this https://t.co/abc #hateful", "check this"),
        ('"RT @user123: some text', "some text"),
        ("mid RT @user: tail", "mid RT: tail"),
        ("hello @someone world", "hello  world".replace("  ", " ")),
        ("no #MKR tag", "no  tag".replace("  ", " ")),
        ("emoji test \U0001F600\U0001F680 done", "emoji test  done".replace("  ", " ")),
    ]
    for raw, expect in cases:
        got = preprocess_tweet(raw)
        assert got.replace("  ", " ").strip() == expect.strip(), (raw, got)


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    from meme_challenge_tpu.utils.synthetic import make_vocab

    return make_vocab(str(tmp_path_factory.mktemp("voc") / "vocab.txt"))


def test_hatespeech_dataset(tmp_path, vocab_file):
    csv_path = tmp_path / "tweets.csv"
    csv_path.write_text(
        "id,text,label\n"
        "0,the cat is good,none\n"
        "1,really bad vibes #MKR,sexism\n"
        "2,http://x.co hate speech,racism\n"
        "3,pure chaos,none\n")
    tok = BertTokenizer(vocab_file)
    ds = TwitterHatespeechDataset(str(csv_path), tok, max_txt_len=12)
    assert len(ds) == 4
    # label vocabulary sorted from data (reference :60-62)
    assert ds.label_names == ["none", "racism", "sexism"]
    assert ds.num_classes == 3
    batch = ds.batch([0, 1, 2])
    assert batch["input_ids"].shape == (3, 12)
    assert batch["labels"].tolist() == [0, 2, 1]


def test_object_text_dataset(tmp_path, vocab_file):
    # meme jsonl + objects npz + id->word map
    recs = [{"id": 100 + i, "img": "x", "label": i % 2,
             "text": "the meme %i" % i} for i in range(6)]
    meme = tmp_path / "memes.jsonl"
    meme.write_text("\n".join(json.dumps(r) for r in recs))
    rng = np.random.RandomState(0)
    np.savez(tmp_path / "objects.npz",
             ids=np.array([100 + i for i in range(6)]),
             objects=rng.randint(0, 4, (6, 5)),
             probs=rng.rand(6, 5))
    (tmp_path / "obj2text.json").write_text(
        json.dumps({str(i): w for i, w in
                    enumerate(["cat", "dog", "hat", "person"])}))
    tok = BertTokenizer(vocab_file)
    ds = ObjectTextDataset(str(meme), str(tmp_path / "objects.npz"),
                           str(tmp_path / "obj2text.json"), tokenizer=tok,
                           max_txt_len=20, confidence_threshold=0.3,
                           swap_prob=0.0)
    assert len(ds) == 6
    text = ds.sample_text(0)
    assert "</s>" in text
    # object words above threshold present
    objs = ds.objects[0][ds.object_probs[0] > 0.3]
    for o in objs:
        assert ds.object2text[int(o)] in text.split("</s>")[1]
    batch = ds.batch([0, 1])
    assert batch["input_ids"].shape == (2, 20)

    # threshold-range + swap augmentation changes samples stochastically
    np.random.seed(0)
    ds_aug = ObjectTextDataset(str(meme), str(tmp_path / "objects.npz"),
                               str(tmp_path / "obj2text.json"), tokenizer=tok,
                               max_txt_len=20,
                               confidence_threshold=(0.1, 0.9),
                               swap_prob=0.5)
    variants = {ds_aug.sample_text(2) for _ in range(20)}
    assert len(variants) > 1


def test_pure_text_trainer_end_to_end(tmp_path, vocab_file):
    """TransformerClassificationHead trains on synthetic meme text with
    two-LR groups + layer freezing."""
    import jax

    from meme_challenge_tpu.core.config import TrainConfig
    from meme_challenge_tpu.core.seeding import set_seed
    from meme_challenge_tpu.data.meme_dataset import BatchLoader, MemeDataset
    from meme_challenge_tpu.models.text_models import (
        TextBackbone,
        TextModelConfig,
        TransformerClassificationHead,
    )
    from meme_challenge_tpu.train.optim import (
        head_lr_scales,
        layer_freeze_scales,
    )
    from meme_challenge_tpu.train.train_pure_text import _is_head
    from meme_challenge_tpu.train.trainer import Trainer

    synth = make_synthetic_dataset(str(tmp_path / "d"), n_train=24, n_dev=8,
                                   img_dim=16)
    tok = BertTokenizer(synth["vocab"])
    tiny = TextModelConfig(vocab_size=tok.vocab_size, hidden_size=32,
                           num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=64, max_position_embeddings=32)
    model = TransformerClassificationHead(
        backbone=TextBackbone(tiny), num_classes=1, dropout=0.1)
    cfg = TrainConfig(model_path=str(tmp_path / "ckpt"),
                      model_save_name="txt.ckpt", lr=1e-3, batch_size=8,
                      max_epoch=2, warmup_steps=2, optimizer="adamw")
    set_seed(cfg.seed)
    train = BatchLoader(
        MemeDataset(synth["train"], tokenizer=tok, text_only=True,
                    max_txt_len=16), 8, shuffle_data=True)
    val = BatchLoader(
        MemeDataset(synth["dev_seen"], tokenizer=tok, text_only=True,
                    max_txt_len=16), 8)
    example = next(iter(val))
    example.pop("ids", None)
    params = model.init(jax.random.PRNGKey(0), example,
                        deterministic=True)["params"]
    scales = head_lr_scales(params, cfg.lr, 2e-3, _is_head)
    freeze = layer_freeze_scales(params, 1)
    import jax as _jax
    scales = _jax.tree.map(lambda a, b: np.asarray(a) * np.asarray(b),
                           scales, freeze)
    trainer = Trainer(cfg, model, params, train, val, [],
                      update_scales=scales)
    p_before = np.asarray(
        trainer.state.params["backbone"]["encoder"]["qkv_kernel"]).copy()
    trainer.train_main()
    p_after = np.asarray(
        trainer.state.params["backbone"]["encoder"]["qkv_kernel"])
    # frozen layer 0 unchanged; layer 1 trained
    np.testing.assert_array_equal(p_before[0], p_after[0])
    assert not np.allclose(p_before[1], p_after[1])
    assert "aucroc" in trainer.best_val_metrics


def test_pure_text_device_resident_training(tmp_path, vocab_file):
    """The text-only trainer path with ``--device_resident_data``: index
    loaders carry no model inputs, so init must come from
    ``BatchLoader.example_batch()`` (regression: train_pure_text's
    trainer_factory crashed with a KeyError on index-mode batches)."""
    import jax

    from meme_challenge_tpu.core.config import TrainConfig
    from meme_challenge_tpu.core.seeding import set_seed
    from meme_challenge_tpu.data.meme_dataset import BatchLoader, MemeDataset
    from meme_challenge_tpu.models.text_models import (
        TextBackbone,
        TextModelConfig,
        TransformerClassificationHead,
    )
    from meme_challenge_tpu.train.trainer import Trainer

    synth = make_synthetic_dataset(str(tmp_path / "d"), n_train=24, n_dev=8,
                                   img_dim=16)
    tok = BertTokenizer(synth["vocab"])
    tiny = TextModelConfig(vocab_size=tok.vocab_size, hidden_size=32,
                           num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=64, max_position_embeddings=32)
    model = TransformerClassificationHead(
        backbone=TextBackbone(tiny), num_classes=1, dropout=0.1)
    cfg = TrainConfig(model_path=str(tmp_path / "ckpt"),
                      model_save_name="txt.ckpt", lr=1e-3, batch_size=8,
                      max_epoch=1, warmup_steps=2, optimizer="adamw",
                      device_resident_data=True)
    set_seed(cfg.seed)
    train = BatchLoader(
        MemeDataset(synth["train"], tokenizer=tok, text_only=True,
                    max_txt_len=16), 8, shuffle_data=True,
        index_batches=True)
    val = BatchLoader(
        MemeDataset(synth["dev_seen"], tokenizer=tok, text_only=True,
                    max_txt_len=16), 8, index_batches=True)
    # the regression: index-mode loaders must still yield an init example
    example = val.example_batch()
    assert "input_ids" in example and "indices" not in example
    params = model.init(jax.random.PRNGKey(0), example,
                        deterministic=True)["params"]
    trainer = Trainer(cfg, model, params, train, val, [])
    trainer.train_main()
    assert "aucroc" in trainer.best_val_metrics


def test_example_batch_matches_first_host_batch(tmp_path, vocab_file):
    """Host-mode ``example_batch`` goes through ``__iter__`` (subclass batch
    transforms preserved) and equals the first batch minus ``ids``."""
    from meme_challenge_tpu.data.meme_dataset import BatchLoader, MemeDataset

    synth = make_synthetic_dataset(str(tmp_path / "d"), n_train=12, n_dev=8,
                                   img_dim=16)
    tok = BertTokenizer(synth["vocab"])
    ds = MemeDataset(synth["dev_seen"], tokenizer=tok,
                     text_only=True, max_txt_len=16)
    loader = BatchLoader(ds, 8)
    ex = loader.example_batch()
    first = dict(next(iter(loader)))
    first.pop("ids", None)
    assert set(ex) == set(first)
    for k in ex:
        np.testing.assert_array_equal(ex[k], first[k])
