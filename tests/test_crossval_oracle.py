"""Twin-run oracle: the EXECUTED reference ``train_crossval`` driver vs ours.

``test_trainer_oracle`` twins one Trainer lifecycle; this file twins the full
README-command stack above it (reference utils/crossval.py:132-215): split
generation inside the driver, the per-fold loop with ``seed + fold_idx``
reseeding, per-fold checkpoint/CSV ``_fold_i`` renaming, mean-of-folds
reporting, and the ensemble search over the per-fold prediction CSVs
(brute-force only on both sides — DEAP is absent in this environment, which
disables the reference EA, and ``run_ea=False`` matches it on ours).

Both sides start every fold from the SAME initial weights and consume
identical deterministic batch streams built from each side's own generated
fold jsonls (split generation is bit-identical — test_data), so per-fold
best-val metrics, exported artifacts, and ensemble outputs must agree.
"""
import json
import os
from glob import glob

import numpy as np
import pytest
import torch

import test_trainer_oracle as tto
from meme_challenge_tpu.core.config import TrainConfig
from meme_challenge_tpu.core.metrics import aucroc
from meme_challenge_tpu.models.convert import meme_uniter_params_from_torch
from meme_challenge_tpu.models.uniter import MemeUniter
from meme_challenge_tpu.parallel.crossval_parallel import (
    train_crossval_fold_parallel,
)
from meme_challenge_tpu.train.crossval_driver import train_crossval
from meme_challenge_tpu.train.trainer import Trainer

SMALL = tto.SMALL
B, T, R = tto.B, tto.T, tto.R
DEV_SIZE = 8   # pooled per-class count 24 → 3 folds of val size 8


@pytest.fixture(scope="module")
def ref():
    """Reference training + crossval machinery (apex stubbed)."""
    base = tto._import_reference()
    import utils.crossval as ref_crossval

    base.crossval = ref_crossval
    return base


# ------------------------------------------------------------- synthetic data


def _sample(id_, label):
    """Deterministic per-id sample with a learnable label signal."""
    r = np.random.RandomState(10_000 + id_)
    input_ids = r.randint(1, SMALL.vocab_size, T).astype(np.int64)
    txt_len = int(r.randint(3, T + 1))
    img_feat = r.randn(R, SMALL.img_dim).astype(np.float32)
    img_feat[0, 0] += (2.0 * label - 1.0) * 1.5
    img_pos_feat = r.rand(R, 7).astype(np.float32)
    num_bb = int(r.randint(2, R + 1))
    return dict(input_ids=input_ids, txt_len=txt_len, img_feat=img_feat,
                img_pos_feat=img_pos_feat, num_bb=num_bb, label=label)


def _write_jsonl(path, ids):
    with open(path, "w") as f:
        f.write("\n".join(json.dumps(
            {"id": i, "img": "img/%05d.png" % i, "label": i % 2,
             "text": "meme text %d" % i}) for i in ids))


def _batches_from_jsonl(path):
    """Fold jsonl → deterministic batch dicts carrying BOTH layouts."""
    with open(path) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    assert len(rows) % B == 0, (path, len(rows))
    batches = []
    for s in range(0, len(rows), B):
        chunk = [(_sample(r["id"], r["label"]), r["id"])
                 for r in rows[s:s + B]]
        input_ids = np.stack([c["input_ids"] for c, _ in chunk])
        img_feat = np.stack([c["img_feat"] for c, _ in chunk])
        img_pos_feat = np.stack([c["img_pos_feat"] for c, _ in chunk])
        txt_lens = np.array([c["txt_len"] for c, _ in chunk])
        num_bbs = np.array([c["num_bb"] for c, _ in chunk])
        labels = np.array([c["label"] for c, _ in chunk], dtype=np.int64)
        ids = np.array([i for _, i in chunk], dtype=np.int64)
        txt_mask = (np.arange(T)[None] < txt_lens[:, None]).astype(np.int32)
        img_mask = (np.arange(R)[None] < num_bbs[:, None]).astype(np.int32)
        out_size = int((txt_lens + num_bbs).max())
        gi = np.tile(np.arange(out_size, dtype=np.int64), (B, 1))
        for i, (tl, nbb) in enumerate(zip(txt_lens, num_bbs)):
            gi[i, tl:tl + nbb] = np.arange(T, T + nbb, dtype=np.int64)
        attn_mask = (np.arange(out_size)[None] <
                     (txt_lens + num_bbs)[:, None]).astype(np.int64)
        batches.append(dict(
            input_ids=input_ids,
            position_ids=np.tile(np.arange(T, dtype=np.int64), (B, 1)),
            img_feat=img_feat, img_pos_feat=img_pos_feat,
            txt_mask=txt_mask, img_mask=img_mask,
            gather_index=gi, attn_mask=attn_mask,
            labels=labels, ids=ids))
    return batches


def _name_from_path(path):
    return os.path.basename(path).rsplit(".", 1)[0]


def _make_data_path(tmp_path, tag):
    """train.jsonl (32: 16/16) + dev_seen.jsonl (16: 8/8); ids are shared
    across both sides' directories so batches are identical."""
    d = tmp_path / tag
    os.makedirs(d, exist_ok=True)
    _write_jsonl(str(d / "train.jsonl"), list(range(32)))
    _write_jsonl(str(d / "dev_seen.jsonl"), list(range(100, 116)))
    return str(d)


TEST_SEEN_IDS = list(range(200, 216))


# ----------------------------------------------------------------- twin runs


def _init_state_dict(ref):
    torch.manual_seed(5)
    uniter = ref.model.UniterModel(tto._ref_uniter_config(ref), SMALL.img_dim)
    torch_model = ref.meme.MemeUniter(
        uniter, hidden_size=SMALL.hidden_size, n_classes=1)
    return {k: v.detach().cpu().numpy().copy()
            for k, v in torch_model.state_dict().items()}


TRAIN_KW = dict(optimizer="adam", loss_func="bce_logits",
                optimize_for="aucroc", scheduler="warmup_cosine",
                beta1=0.9, beta2=0.999, lr=2e-3, weight_decay=0.01,
                warmup_steps=2, max_epoch=3, gradient_accumulation=1,
                pos_wt=1.3, patience=2, early_stop_thresh=1e-3)


def _run_reference_crossval(ref, tmp_path, init_sd):
    data_path = _make_data_path(tmp_path, "ref_data")
    model_path = str(tmp_path / "ref_models")
    os.makedirs(model_path, exist_ok=True)

    class _TwinTrainer(ref.train_template.TrainerTemplate):
        def init_model(self):
            torch.manual_seed(5)
            uniter = ref.model.UniterModel(
                tto._ref_uniter_config(ref), SMALL.img_dim)
            model = ref.meme.MemeUniter(
                uniter, hidden_size=SMALL.hidden_size, n_classes=1)
            model.load_state_dict(
                {k: torch.from_numpy(v.copy()) for k, v in init_sd.items()})
            self.model = model

        def load_model(self):
            ckpt = torch.load(self.model_file, weights_only=False)
            self.model.load_state_dict(ckpt["model_state_dict"])

        def _fwd(self, batch):
            return self.model(
                img_feat=batch["img_feat"],
                img_pos_feat=batch["img_pos_feat"],
                input_ids=batch["input_ids"],
                position_ids=batch["position_ids"],
                attention_mask=batch["attn_mask"],
                gather_index=batch["gather_index"],
                output_all_encoded_layers=False)

        def train_iter_step(self):
            self.preds = self._fwd(self.batch)
            self.calculate_loss(self.preds, self.batch["labels"],
                                grad_step=True)

        def eval_iter_step(self, iters, batch, test):
            preds = self._fwd(batch)
            self.calculate_loss(preds, batch["labels"], grad_step=False)

        def test_iter_step(self, batch):
            return self._fwd(batch).squeeze()

        def export_metrics(self):
            pass  # json.dump chokes on np.float32; not part of the twin

    def loader_func(path):
        return tto._TorchLoader(_batches_from_jsonl(path),
                                _name_from_path(path))

    test_loaders = [
        tto._TorchLoader(_batches_from_jsonl(
            os.path.join(data_path, "dev_seen.jsonl")), "dev_seen"),
    ]
    # a held-out labeled test set, identical ids on both sides
    test_jsonl = os.path.join(data_path, "test_seen.jsonl")
    _write_jsonl(test_jsonl, TEST_SEEN_IDS)
    test_loaders.append(
        tto._TorchLoader(_batches_from_jsonl(test_jsonl), "test_seen"))

    config = dict(
        model_path=model_path, model_save_name="twin.pt", data_path=data_path,
        seed=43, pretrained_model_file=None, parallel_computing=False,
        test_loader=test_loaders, max_grad_norm=5,
        no_model_checkpoints=False, remove_checkpoints=False,
        log_every=10_000, debug=False, writer=tto._SpyWriter(), n_classes=1,
        **TRAIN_KW)
    ref.crossval.train_crossval(
        _TwinTrainer, config,
        {"train": loader_func, "val": loader_func, "test": loader_func},
        num_folds=-1, dev_size=DEV_SIZE, use_dev_set=False)
    return model_path, data_path


def _run_our_crossval(tmp_path, init_sd):
    data_path = _make_data_path(tmp_path, "our_data")
    model_path = str(tmp_path / "our_models")
    os.makedirs(model_path, exist_ok=True)

    def loader_func(path):
        return tto._OurLoader(_batches_from_jsonl(path),
                              _name_from_path(path))

    test_jsonl = os.path.join(data_path, "test_seen.jsonl")
    _write_jsonl(test_jsonl, TEST_SEEN_IDS)
    test_loaders = [
        tto._OurLoader(_batches_from_jsonl(
            os.path.join(data_path, "dev_seen.jsonl")), "dev_seen"),
        tto._OurLoader(_batches_from_jsonl(test_jsonl), "test_seen"),
    ]

    model = MemeUniter(SMALL, n_classes=1)

    def trainer_factory(cfg, train_loader, val_loader, fold_tests):
        params = meme_uniter_params_from_torch(init_sd, SMALL)
        return Trainer(cfg, model, params, train_loader, val_loader,
                       fold_tests)

    cfg = TrainConfig(
        model_path=model_path, model_save_name="twin.ckpt",
        data_path=data_path, seed=43, max_grad_norm=5.0,
        adam_mu_dtype="float32", adam_nu_dtype="float32", **TRAIN_KW)
    results = train_crossval(
        trainer_factory, cfg,
        {"train": loader_func, "val": loader_func, "test": loader_func},
        test_loaders=test_loaders, num_folds=-1, dev_size=DEV_SIZE,
        use_dev_set=False, run_ea=False)
    return model_path, data_path, results


class _ParLoader(tto._OurLoader):
    """Host-batch loader satisfying the fold-parallel driver's extra
    surface: ``example_batch()`` and ``dataset.ids``."""

    def __init__(self, batches, name):
        super().__init__(batches, name)
        self.dataset.ids = np.concatenate([b["ids"] for b in batches])

    def example_batch(self):
        b = dict(next(iter(self)))
        b.pop("ids", None)
        return b


def _run_our_fold_parallel(tmp_path, init_sd):
    """The flagship fold-parallel crossval driver, all folds at once, same
    initial weights as the reference's sequential per-fold loop."""
    data_path = _make_data_path(tmp_path, "par_data")
    model_path = str(tmp_path / "par_models")
    os.makedirs(model_path, exist_ok=True)

    def loader_func(path):
        return _ParLoader(_batches_from_jsonl(path), _name_from_path(path))

    test_jsonl = os.path.join(data_path, "test_seen.jsonl")
    _write_jsonl(test_jsonl, TEST_SEEN_IDS)
    test_loaders = [
        _ParLoader(_batches_from_jsonl(
            os.path.join(data_path, "dev_seen.jsonl")), "dev_seen"),
        _ParLoader(_batches_from_jsonl(test_jsonl), "test_seen"),
    ]
    model = MemeUniter(SMALL, n_classes=1)

    def init_params_fn(seed, example):
        # every fold starts from the shared twin weights (the per-fold
        # reseed only affects data order here — dropout is 0)
        return meme_uniter_params_from_torch(init_sd, SMALL)

    cfg = TrainConfig(
        model_path=model_path, model_save_name="twin.ckpt",
        data_path=data_path, seed=43, max_grad_norm=5.0,
        adam_mu_dtype="float32", adam_nu_dtype="float32", **TRAIN_KW)
    results = train_crossval_fold_parallel(
        cfg, model, init_params_fn,
        {"train": loader_func, "val": loader_func, "test": loader_func},
        test_loaders=test_loaders, num_folds=-1, dev_size=DEV_SIZE,
        use_dev_set=False, run_ea=False)
    return model_path, data_path, results


@pytest.fixture(scope="module")
def twin(ref, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("crossval_twin")
    init_sd = _init_state_dict(ref)
    ref_models, ref_data = _run_reference_crossval(ref, tmp_path, init_sd)
    our_models, our_data, results = _run_our_crossval(tmp_path, init_sd)
    return dict(ref_models=ref_models, ref_data=ref_data,
                our_models=our_models, our_data=our_data, results=results,
                init_sd=init_sd, tmp_path=tmp_path)


@pytest.fixture(scope="module")
def twin_par(twin):
    """Fold-parallel side, twinned against the SAME reference artifacts."""
    par_models, par_data, results = _run_our_fold_parallel(
        twin["tmp_path"], twin["init_sd"])
    return dict(par_models=par_models, par_data=par_data, results=results)


# ---------------------------------------------------------------- assertions


def test_fold_files_bit_identical(twin):
    """The driver-generated splits agree file-for-file across sides."""
    ref_cv = os.path.join(twin["ref_data"], "crossval_%d" % DEV_SIZE)
    our_cv = os.path.join(twin["our_data"], "crossval_%d" % DEV_SIZE)
    ref_files = sorted(os.path.basename(p)
                       for p in glob(os.path.join(ref_cv, "*.jsonl")))
    our_files = sorted(os.path.basename(p)
                       for p in glob(os.path.join(our_cv, "*.jsonl")))
    assert ref_files == our_files and len(ref_files) == 6  # 3 folds × 2
    for name in ref_files:
        with open(os.path.join(ref_cv, name)) as f:
            ref_txt = f.read()
        with open(os.path.join(our_cv, name)) as f:
            our_txt = f.read()
        assert ref_txt == our_txt, name


def test_artifact_names_match(twin):
    """Per-fold ckpt/CSV/ensemble artifact naming contract holds."""
    def names(d, strip_ext):
        out = set()
        for p in sorted(os.listdir(d)):
            if strip_ext and p.endswith(strip_ext):
                out.add(p[: -len(strip_ext)])
            elif p.endswith(".csv"):
                out.add(p)
        return out

    ref_names = names(twin["ref_models"], ".pt")
    our_names = names(twin["our_models"], ".ckpt")
    # ours additionally writes resume state alongside ckpts; the reference
    # contract is that every reference artifact exists under the same name
    missing = ref_names - our_names
    assert not missing, missing
    for fold in range(3):
        assert "twin_fold_%d" % fold in ref_names
        assert "twin_fold_%d_dev_seen_preds.csv" % fold in ref_names
        assert "twin_fold_%d_test_seen_preds.csv" % fold in ref_names
    assert "twin_dev_seen_ensemble.csv" in ref_names
    assert "twin_test_seen_ensemble.csv" in ref_names


def test_per_fold_metrics_match(twin):
    res = twin["results"]
    assert len(res["val_metrics"]) == 3
    # reference side per-fold best-val metrics are not returned by its
    # driver; compare through the per-fold dev_seen CSVs below + our mean
    for fold_metrics in res["val_metrics"]:
        assert 0.5 <= fold_metrics["aucroc"] <= 1.0
    assert "mean_scores" in res


def test_per_fold_csvs_match(twin):
    for fold in range(3):
        for setname, atol in (("dev_seen", 5e-3), ("test_seen", 5e-3)):
            ref_csv = os.path.join(
                twin["ref_models"],
                "twin_fold_%d_%s_preds.csv" % (fold, setname))
            our_csv = os.path.join(
                twin["our_models"],
                "twin_fold_%d_%s_preds.csv" % (fold, setname))
            with open(ref_csv) as f:
                ref_ids, ref_probs = tto._csv_probs(f.read())
            with open(our_csv) as f:
                our_ids, our_probs = tto._csv_probs(f.read())
            np.testing.assert_array_equal(ref_ids, our_ids)
            np.testing.assert_allclose(
                our_probs, ref_probs, atol=atol,
                err_msg="fold %d %s" % (fold, setname))


def test_ensemble_outputs_match(twin):
    """Brute-force-only ensemble on both sides: the optimized dev mixture
    scores agree (weights may differ between near-tied grid points)."""
    def ens_auc(models_dir, data_dir):
        path = os.path.join(models_dir, "twin_dev_seen_ensemble.csv")
        rows = [r.split(",") for r in
                open(path).read().strip().splitlines()[1:]]
        ids = np.array([int(r[0]) for r in rows])
        probs = np.array([float(r[1]) for r in rows])
        with open(os.path.join(data_dir, "dev_seen.jsonl")) as f:
            gt = {json.loads(l)["id"]: json.loads(l)["label"]
                  for l in f if l.strip()}
        return aucroc(probs, np.array([gt[i] for i in ids]))

    ref_auc = ens_auc(twin["ref_models"], twin["ref_data"])
    our_auc = ens_auc(twin["our_models"], twin["our_data"])
    assert our_auc == pytest.approx(ref_auc, abs=5e-2)
    ours = twin["results"]["ensemble"]
    assert ours["score"] == pytest.approx(our_auc, abs=1e-6)


# ------------------------------------------------- fold-parallel twin (r3)


def test_fold_parallel_csvs_match_reference(twin, twin_par):
    """The FLAGSHIP path: all folds trained simultaneously on the mesh must
    reproduce the reference's sequential per-fold loop — per-fold exported
    probabilities agree on every fold and test set."""
    for fold in range(3):
        for setname in ("dev_seen", "test_seen"):
            ref_csv = os.path.join(
                twin["ref_models"],
                "twin_fold_%d_%s_preds.csv" % (fold, setname))
            par_csv = os.path.join(
                twin_par["par_models"],
                "twin_fold_%d_%s_preds.csv" % (fold, setname))
            with open(ref_csv) as f:
                ref_ids, ref_probs = tto._csv_probs(f.read())
            with open(par_csv) as f:
                par_ids, par_probs = tto._csv_probs(f.read())
            np.testing.assert_array_equal(ref_ids, par_ids)
            np.testing.assert_allclose(
                par_probs, ref_probs, atol=5e-3,
                err_msg="fold-parallel fold %d %s" % (fold, setname))


def test_fold_parallel_artifacts_and_metrics(twin, twin_par):
    """Per-fold ckpts, metrics JSONs and ensemble CSVs come out under the
    sequential naming contract, and per-fold val metrics are sane."""
    names = set(os.listdir(twin_par["par_models"]))
    for fold in range(3):
        assert "twin_fold_%d.ckpt" % fold in names
        assert "twin_fold_%d_metrics.json" % fold in names
        assert "twin_fold_%d_dev_seen_preds.csv" % fold in names
        assert "twin_fold_%d_test_seen_preds.csv" % fold in names
    assert "twin_dev_seen_ensemble.csv" in names
    assert "twin_test_seen_ensemble.csv" in names
    res = twin_par["results"]
    assert len(res["val_metrics"]) == 3
    # fold-parallel mean-of-folds tracks the sequential driver's
    seq_mean = twin["results"]["mean_scores"]["aucroc"]
    assert res["mean_scores"]["aucroc"] == pytest.approx(seq_mean, abs=5e-2)


def test_fold_parallel_ensemble_matches(twin, twin_par):
    """Ensemble search over the fold-parallel CSVs lands on the same dev
    mixture quality as over the reference's CSVs."""
    def ens_probs(models_dir):
        path = os.path.join(models_dir, "twin_dev_seen_ensemble.csv")
        rows = [r.split(",") for r in
                open(path).read().strip().splitlines()[1:]]
        ids = np.array([int(r[0]) for r in rows])
        order = np.argsort(ids)
        return ids[order], np.array([float(r[1]) for r in rows])[order]

    ref_ids, ref_probs = ens_probs(twin["ref_models"])
    par_ids, par_probs = ens_probs(twin_par["par_models"])
    np.testing.assert_array_equal(ref_ids, par_ids)
    with open(os.path.join(twin["ref_data"], "dev_seen.jsonl")) as f:
        gt = {json.loads(l)["id"]: json.loads(l)["label"]
              for l in f if l.strip()}
    labels = np.array([gt[i] for i in ref_ids])
    assert aucroc(par_probs, labels) == pytest.approx(
        aucroc(ref_probs, labels), abs=5e-2)
