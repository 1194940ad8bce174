"""Multi-seed distribution twin at the REAL reference recipe.

VERDICT r3 next-step #4: the pointwise accum=2 trajectory twin is loose by
design (the reference's off-by-one accumulation quirk is documented, not
replicated — train_template.py:101-109), and the published recipe runs
accum=2 WITH dropout. The strongest evidence obtainable in this image is
distribution-level: N seeds of the executed reference TrainerTemplate
(dropout on, accum 2) vs N of ours on shared per-seed initial weights and
identical data — the best-val AUROC band, final-epoch train-loss band, and
epochs-to-early-stop band must overlap. Torch and jax dropout streams
cannot be draw-identical, so each seed pair diverges stochastically; the
DISTRIBUTIONS must not (reference train_template.py:359-394 at the
README recipe flags, README.md:58-62).
"""
import os

import numpy as np
import pytest
import torch

from meme_challenge_tpu.core.config import TrainConfig
from meme_challenge_tpu.models.convert import meme_uniter_params_from_torch
from meme_challenge_tpu.models.uniter import MemeUniter
from meme_challenge_tpu.train.trainer import Trainer

import test_trainer_oracle as tto

N_SEEDS = 5
DROPOUT = 0.1
MAX_EPOCH = 6

SMALL_DO = tto.SMALL.replace(hidden_dropout_prob=DROPOUT,
                             attention_probs_dropout_prob=DROPOUT)

RECIPE = dict(optimizer="adam", loss_func="bce_logits",
              optimize_for="aucroc", scheduler="warmup_cosine",
              beta1=0.9, beta2=0.999, lr=2e-3, weight_decay=0.01,
              warmup_steps=2, max_epoch=MAX_EPOCH,
              gradient_accumulation=2,  # the published recipe's accum
              pos_wt=1.3, patience=2, early_stop_thresh=1e-3)


@pytest.fixture(scope="module")
def ref():
    return tto._import_reference()


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(31)
    train_b = tto._make_batches(rng, 4, id_base=100)
    val_b = tto._make_batches(rng, 4, id_base=500)
    return train_b, val_b


def _ref_config_do(ref):
    return ref.model.UniterConfig(
        SMALL_DO.vocab_size,
        hidden_size=SMALL_DO.hidden_size,
        num_hidden_layers=SMALL_DO.num_hidden_layers,
        num_attention_heads=SMALL_DO.num_attention_heads,
        intermediate_size=SMALL_DO.intermediate_size,
        max_position_embeddings=SMALL_DO.max_position_embeddings,
        hidden_dropout_prob=DROPOUT,
        attention_probs_dropout_prob=DROPOUT,
    )


def _run_reference_seed(ref, tmp_path, data, seed):
    """One reference run at the recipe; returns per-run statistics + the
    initial weights so our side starts from the same point."""
    train_b, val_b = data
    torch.manual_seed(seed)
    uniter = ref.model.UniterModel(_ref_config_do(ref), SMALL_DO.img_dim)
    torch_model = ref.meme.MemeUniter(
        uniter, hidden_size=SMALL_DO.hidden_size, n_classes=1)
    init_sd = {k: v.detach().cpu().numpy().copy()
               for k, v in torch_model.state_dict().items()}

    class _TwinTrainer(ref.train_template.TrainerTemplate):
        def init_model(self):
            self.model = torch_model

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
            pass

    writer = tto._SpyWriter()
    model_path = str(tmp_path / ("ref_%d" % seed))
    os.makedirs(model_path, exist_ok=True)
    config = dict(
        model_path=model_path, model_save_name="twin.pt",
        pretrained_model_file=None, parallel_computing=False,
        train_loader=tto._TorchLoader(train_b, "train"),
        val_loader=tto._TorchLoader(val_b, "dev"),
        test_loader=[],
        max_grad_norm=5, no_model_checkpoints=False,
        remove_checkpoints=False, log_every=10_000, debug=False,
        writer=writer, n_classes=1, **RECIPE)
    trainer = _TwinTrainer(config)
    best_val, _ = trainer.train_main()
    val_auc = writer.series("Validation/AUC-ROC")
    train_loss = writer.series("Train/Epoch_Loss")
    return dict(best_auc=float(best_val["aucroc"]),
                epochs=len(val_auc),
                final_train_loss=float(train_loss[-1]),
                init_sd=init_sd)


def _run_our_seed(tmp_path, data, seed, init_sd):
    train_b, val_b = data
    model = MemeUniter(SMALL_DO, n_classes=1)
    params = meme_uniter_params_from_torch(init_sd, SMALL_DO)
    cfg = TrainConfig(
        model_path=str(tmp_path / ("ours_%d" % seed)),
        model_save_name="twin.ckpt", max_grad_norm=5.0, seed=seed,
        adam_mu_dtype="float32", adam_nu_dtype="float32", **RECIPE)
    os.makedirs(cfg.model_path, exist_ok=True)
    trainer = Trainer(cfg, model, params,
                      tto._OurLoader(train_b, "train"),
                      tto._OurLoader(val_b, "dev"), [])
    best_val, _ = trainer.train_main()
    series = lambda name: [v for n, _s, v in trainer.scalars if n == name]
    return dict(best_auc=float(best_val["aucroc"]),
                epochs=len(series("Validation/aucroc")),
                final_train_loss=float(series("Train/Epoch_Loss")[-1]))


@pytest.fixture(scope="module")
def runs(ref, data, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("recipe_dist")
    theirs, ours = [], []
    for seed in range(N_SEEDS):
        r = _run_reference_seed(ref, tmp_path, data, seed)
        o = _run_our_seed(tmp_path, data, seed, r["init_sd"])
        theirs.append(r)
        ours.append(o)
    return theirs, ours


def _band(vals):
    a = np.asarray(vals, np.float64)
    return a.mean(), a.std(ddof=1) if len(a) > 1 else 0.0


def test_best_val_auc_bands_overlap(runs):
    theirs, ours = runs
    m_ref, s_ref = _band([r["best_auc"] for r in theirs])
    m_our, s_our = _band([o["best_auc"] for o in ours])
    # overlapping bands: mean gap bounded by the pooled spread (2 SE of the
    # mean difference) with an absolute floor for the tiny-AUROC granularity
    # of the fixture's 16-sample val set (1/(n0*n1) ≈ 0.016 per rank swap)
    se = np.sqrt((s_ref ** 2 + s_our ** 2) / N_SEEDS)
    tol = max(2.0 * se, 0.06)
    assert abs(m_ref - m_our) < tol, (
        f"best-val AUROC bands diverge: ref {m_ref:.4f}±{s_ref:.4f} vs "
        f"ours {m_our:.4f}±{s_our:.4f} (tol {tol:.4f})")


def test_final_train_loss_bands_overlap(runs):
    theirs, ours = runs
    m_ref, s_ref = _band([r["final_train_loss"] for r in theirs])
    m_our, s_our = _band([o["final_train_loss"] for o in ours])
    se = np.sqrt((s_ref ** 2 + s_our ** 2) / N_SEEDS)
    tol = max(2.5 * se, 0.05 * max(m_ref, 1e-6))
    assert abs(m_ref - m_our) < tol, (
        f"final train-loss bands diverge: ref {m_ref:.4f}±{s_ref:.4f} vs "
        f"ours {m_our:.4f}±{s_our:.4f} (tol {tol:.4f})")


def test_epochs_to_stop_bands_overlap(runs):
    theirs, ours = runs
    m_ref, _ = _band([r["epochs"] for r in theirs])
    m_our, _ = _band([o["epochs"] for o in ours])
    # patience-2 early stopping on the same signal: mean stopping epoch
    # within 1.5 epochs across the seed band
    assert abs(m_ref - m_our) <= 1.5, (m_ref, m_our)
    # and every run actually trained (no degenerate 0-epoch early exits)
    assert min(r["epochs"] for r in theirs) >= 1
    assert min(o["epochs"] for o in ours) >= 1
