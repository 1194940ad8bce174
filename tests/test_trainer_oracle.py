"""Twin-run oracles vs the EXECUTED reference training stack.

Round 2 oracle-tested the model forwards, losses, schedules, and decay masks
piecewise; this file closes the last unverified layer by executing the
reference's own *training* code end-to-end:

- ``test_optimizer_step_oracle``: torch Adam/AdamW/Adamax/SGD built by the
  reference's ``get_optimizer`` (utils/optim_utils.py:16-30, decay vs
  no-decay groups) + ``clip_grad_norm_`` + a warmup-cosine LambdaLR, stepped
  20x on identical synthetic grads, vs our ``make_optimizer`` chain — params
  must match step-for-step to ~1e-6.
- ``test_trainer_trajectory_oracle``: the reference ``TrainerTemplate`` epoch
  loop (train_template.py:359-394) with a real reference ``MemeUniter``
  (gather compaction and all) vs our ``Trainer`` with converted weights on
  the same data/seeds/batch order, gradient_accumulation=1 → per-epoch
  train/val loss, AUROC, early-stopping decisions, final optimal threshold
  and exported CSVs must agree to tight tolerance.
- ``test_trainer_trajectory_accum2``: same twin run at accum=2. The
  reference's accumulation is deliberately NOT replicated (it steps at
  iters % accum == 0 *including iter 0* and leaks the last partial group
  across epoch boundaries — train_template.py:101-109, SURVEY.md §2 quirks);
  both sides still optimize the same objective with 2-batch average grads,
  so trajectories must agree loosely (catches lr/accum-scaling bugs).
"""
import importlib.machinery
import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from meme_challenge_tpu.core.config import TrainConfig, UniterConfig
from meme_challenge_tpu.models.convert import meme_uniter_params_from_torch
from meme_challenge_tpu.models.uniter import MemeUniter
from meme_challenge_tpu.train.trainer import Trainer


# --------------------------------------------------------------- ref imports


def _stub_module(name):
    m = types.ModuleType(name)
    # transformers probes importlib.util.find_spec("apex"); a bare ModuleType
    # has __spec__ None which makes find_spec raise
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return m


def _import_reference():
    """Import the reference TRAINING machinery with apex stubbed (plain
    function so sibling oracle suites — test_crossval_oracle — can reuse)."""
    if "apex" not in sys.modules:
        apex = _stub_module("apex")
        norm = _stub_module("apex.normalization")
        fln = _stub_module("apex.normalization.fused_layer_norm")
        fln.FusedLayerNorm = torch.nn.LayerNorm
        norm.fused_layer_norm = fln
        apex.normalization = norm
        sys.modules["apex"] = apex
        sys.modules["apex.normalization"] = norm
        sys.modules["apex.normalization.fused_layer_norm"] = fln
    # another suite may have installed a spec-less apex stub first (every
    # module HAS a __spec__ attribute — it defaults to None, on which
    # transformers' find_spec("apex") probe raises); repair it in place
    for name in ("apex", "apex.normalization",
                 "apex.normalization.fused_layer_norm"):
        mod = sys.modules.get(name)
        if mod is not None and getattr(mod, "__spec__", None) is None:
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import train_template as ref_train_template
    import model.model as ref_model
    import model.meme_uniter as ref_meme
    from utils.optim_utils import get_optimizer as ref_get_optimizer

    return types.SimpleNamespace(
        train_template=ref_train_template, model=ref_model, meme=ref_meme,
        get_optimizer=ref_get_optimizer)


@pytest.fixture(scope="module")
def ref():
    return _import_reference()


# ------------------------------------------------------- optimizer unit oracle


class _NamedParams(torch.nn.Module):
    """Parameter holder whose names hit both reference no-decay rules
    (``bias`` substring and ``LayerNorm.weight``)."""

    def __init__(self, arrays):
        super().__init__()
        self.dense = torch.nn.Module()
        self.dense.weight = torch.nn.Parameter(torch.from_numpy(arrays[0]))
        self.dense.bias = torch.nn.Parameter(torch.from_numpy(arrays[1]))
        self.LayerNorm = torch.nn.Module()
        self.LayerNorm.weight = torch.nn.Parameter(torch.from_numpy(arrays[2]))
        self.LayerNorm.bias = torch.nn.Parameter(torch.from_numpy(arrays[3]))


@pytest.mark.parametrize("opt_name", ["adam", "adamw", "adamax", "sgd"])
def test_optimizer_step_oracle(ref, opt_name):
    """Same grads in → same params out, 20 steps, decay + no-decay groups,
    global-norm clipping, warmup-cosine lr schedule on both sides."""
    from meme_challenge_tpu.train.optim import make_optimizer
    from meme_challenge_tpu.train.schedules import warmup_cosine_schedule

    rng = np.random.RandomState(7)
    shapes = [(5, 3), (3,), (3,), (3,)]
    init = [rng.randn(*s).astype(np.float32) for s in shapes]
    n_steps = 20
    grads_seq = [[rng.randn(*s).astype(np.float32) * 3.0 for s in shapes]
                 for _ in range(n_steps)]
    lr, wd, clip = 0.05, 0.02, 1.5
    schedule = warmup_cosine_schedule(4, n_steps)

    # ---- torch side: the reference's own optimizer factory
    model = _NamedParams([a.copy() for a in init])
    config = dict(optimizer=opt_name, beta1=0.9, beta2=0.98, lr=lr,
                  weight_decay=wd)
    opt = ref.get_optimizer(model, config)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda step: float(schedule(step)))
    torch_traj = []
    params_list = [model.dense.weight, model.dense.bias,
                   model.LayerNorm.weight, model.LayerNorm.bias]
    for step in range(n_steps):
        opt.zero_grad()
        for p, g in zip(params_list, grads_seq[step]):
            p.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_(model.parameters(), clip)
        opt.step()
        sched.step()
        torch_traj.append([p.detach().numpy().copy() for p in params_list])

    # ---- our side: the optax chain. Names chosen so no_decay_mask puts
    # dense/kernel in the decay group and biases + ln_scale out of it,
    # mirroring the reference name-matching (optim_utils.py:16).
    params = {"dense": {"kernel": jnp.asarray(init[0]),
                        "bias": jnp.asarray(init[1])},
              "attn_ln_scale": jnp.asarray(init[2]),
              "attn_ln_bias": jnp.asarray(init[3])}
    tx = make_optimizer(opt_name, lr, schedule, beta1=0.9, beta2=0.98,
                        weight_decay=wd, max_grad_norm=clip,
                        params_example=params)
    state = tx.init(params)
    for step in range(n_steps):
        g = grads_seq[step]
        grads = {"dense": {"kernel": jnp.asarray(g[0]),
                           "bias": jnp.asarray(g[1])},
                 "attn_ln_scale": jnp.asarray(g[2]),
                 "attn_ln_bias": jnp.asarray(g[3])}
        updates, state = tx.update(grads, state, params)
        import optax

        params = optax.apply_updates(params, updates)
        ours = [np.asarray(params["dense"]["kernel"]),
                np.asarray(params["dense"]["bias"]),
                np.asarray(params["attn_ln_scale"]),
                np.asarray(params["attn_ln_bias"])]
        for o, t, nm in zip(ours, torch_traj[step],
                            ["kernel", "bias", "ln_scale", "ln_bias"]):
            np.testing.assert_allclose(
                o, t, atol=2e-6,
                err_msg=f"{opt_name} step {step} param {nm}")


# ------------------------------------------------------------ trajectory twin


HID = 32

SMALL = UniterConfig(
    vocab_size=97,
    hidden_size=HID,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=64,
    max_position_embeddings=32,
    img_dim=16,
    hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0,
)

B, T, R = 4, 8, 5


def _make_batches(rng, n_batches, id_base):
    """Shared numpy batches carrying BOTH layouts: the reference's compact
    gather_index/attn_mask and our static txt_mask/img_mask."""
    batches = []
    for bi in range(n_batches):
        input_ids = rng.randint(1, SMALL.vocab_size, (B, T)).astype(np.int64)
        position_ids = np.tile(np.arange(T, dtype=np.int64), (B, 1))
        img_feat = rng.randn(B, R, SMALL.img_dim).astype(np.float32)
        img_pos_feat = rng.rand(B, R, 7).astype(np.float32)
        txt_lens = rng.randint(3, T + 1, B)
        num_bbs = rng.randint(2, R + 1, B)
        # make a weak learnable signal: label correlates with feature mean
        labels = (img_feat[:, 0, 0] + 0.5 * rng.randn(B) > 0).astype(np.int64)
        txt_mask = (np.arange(T)[None] < txt_lens[:, None]).astype(np.int32)
        img_mask = (np.arange(R)[None] < num_bbs[:, None]).astype(np.int32)
        out_size = int((txt_lens + num_bbs).max())
        gi = np.tile(np.arange(out_size, dtype=np.int64), (B, 1))
        for i, (tl, nbb) in enumerate(zip(txt_lens, num_bbs)):
            gi[i, tl:tl + nbb] = np.arange(T, T + nbb, dtype=np.int64)
        attn_mask = (np.arange(out_size)[None] <
                     (txt_lens + num_bbs)[:, None]).astype(np.int64)
        ids = id_base + bi * B + np.arange(B)
        batches.append(dict(
            input_ids=input_ids, position_ids=position_ids,
            img_feat=img_feat, img_pos_feat=img_pos_feat,
            txt_mask=txt_mask, img_mask=img_mask,
            gather_index=gi, attn_mask=attn_mask,
            labels=labels, ids=ids))
    return batches


class _TorchLoader:
    def __init__(self, batches, name):
        self.batches = batches
        self.dataset = types.SimpleNamespace(name=name, return_ids=True)

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        for b in self.batches:
            yield {
                "input_ids": torch.from_numpy(b["input_ids"]),
                "position_ids": torch.from_numpy(b["position_ids"]),
                "img_feat": torch.from_numpy(b["img_feat"]),
                "img_pos_feat": torch.from_numpy(b["img_pos_feat"]),
                "attn_mask": torch.from_numpy(b["attn_mask"]),
                "gather_index": torch.from_numpy(b["gather_index"]),
                "labels": torch.from_numpy(b["labels"]),
                "ids": torch.from_numpy(b["ids"]),
            }


class _OurLoader:
    def __init__(self, batches, name):
        self.batches = batches
        labels = np.concatenate([b["labels"] for b in batches])
        self.dataset = types.SimpleNamespace(
            name=name, return_ids=True, labels=labels)

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        for b in self.batches:
            yield {
                "input_ids": b["input_ids"].astype(np.int32),
                "position_ids": b["position_ids"].astype(np.int32),
                "img_feat": b["img_feat"],
                "img_pos_feat": b["img_pos_feat"],
                "txt_mask": b["txt_mask"],
                "img_mask": b["img_mask"],
                "labels": b["labels"],
                "ids": b["ids"],
                "sample_mask": np.ones(B, np.int32),
            }


class _SpyWriter:
    """SummaryWriter stand-in capturing every scalar the reference logs."""

    def __init__(self):
        self.scalars = []

    def add_scalar(self, name, value, step):
        self.scalars.append((name, float(value), step))

    def series(self, name):
        return [v for n, v, _ in self.scalars if n == name]

    def close(self):
        pass

    def flush(self):
        pass


def _ref_uniter_config(ref):
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


def _run_reference(ref, tmp_path, batches, accum):
    """Drive the EXECUTED reference TrainerTemplate on the torch MemeUniter."""
    train_b, val_b, test_b = batches
    torch.manual_seed(5)
    uniter = ref.model.UniterModel(_ref_uniter_config(ref), SMALL.img_dim)
    torch_model = ref.meme.MemeUniter(
        uniter, hidden_size=SMALL.hidden_size, n_classes=1)
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

        # the three hooks mirror reference train_uniter.py:58-81
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
            # reference json.dump chokes on the np.float32 scalars our
            # numpy-built loaders introduce; the metrics JSON is not part
            # of the twin comparison (covered by test_train.py)
            pass

    writer = _SpyWriter()
    model_path = str(tmp_path / "ref")
    os.makedirs(model_path, exist_ok=True)
    config = dict(
        model_path=model_path, model_save_name="twin.pt",
        pretrained_model_file=None, parallel_computing=False,
        train_loader=_TorchLoader(train_b, "train"),
        val_loader=_TorchLoader(val_b, "dev"),
        test_loader=[_TorchLoader(test_b, "test")],
        optimizer="adam", loss_func="bce_logits", optimize_for="aucroc",
        scheduler="warmup_cosine", beta1=0.9, beta2=0.999,
        lr=2e-3, weight_decay=0.01, warmup_steps=2, max_epoch=4,
        gradient_accumulation=accum, max_grad_norm=5, pos_wt=1.3,
        patience=2, early_stop_thresh=1e-3, no_model_checkpoints=False,
        remove_checkpoints=False, log_every=10_000, debug=False,
        writer=writer, n_classes=1)
    trainer = _TwinTrainer(config)
    best_val, test_metrics = trainer.train_main()
    csv = open(os.path.join(model_path, "twin_dev_preds.csv")).read()
    return dict(best_val=dict(best_val), test=test_metrics, writer=writer,
                init_sd=init_sd, dev_csv=csv)


def _run_ours(tmp_path, batches, accum, init_sd):
    train_b, val_b, test_b = batches
    model = MemeUniter(SMALL, n_classes=1)
    params = meme_uniter_params_from_torch(init_sd, SMALL)
    cfg = TrainConfig(
        model_path=str(tmp_path / "ours"), model_save_name="twin.ckpt",
        optimizer="adam", loss_func="bce_logits", optimize_for="aucroc",
        scheduler="warmup_cosine", beta1=0.9, beta2=0.999,
        lr=2e-3, weight_decay=0.01, warmup_steps=2, max_epoch=4,
        gradient_accumulation=accum, max_grad_norm=5.0, pos_wt=1.3,
        patience=2, early_stop_thresh=1e-3, seed=5,
        adam_mu_dtype="float32", adam_nu_dtype="float32")
    os.makedirs(cfg.model_path, exist_ok=True)
    trainer = Trainer(cfg, model, params,
                      _OurLoader(train_b, "train"),
                      _OurLoader(val_b, "dev"),
                      [_OurLoader(test_b, "test")])
    best_val, test_metrics = trainer.train_main()
    # per-epoch series from the scalars log (writer off → they accumulate)
    series = lambda name: [v for n, _s, v in trainer.scalars if n == name]
    csv = open(os.path.join(
        cfg.model_path, "twin_dev_preds.csv")).read()
    return dict(best_val=dict(best_val), test=test_metrics, series=series,
                dev_csv=csv, trainer=trainer)


@pytest.fixture(scope="module")
def twin_data():
    rng = np.random.RandomState(31)
    train_b = _make_batches(rng, 4, id_base=100)
    val_b = _make_batches(rng, 2, id_base=500)
    test_b = _make_batches(rng, 2, id_base=900)
    return train_b, val_b, test_b


def _csv_probs(csv_text):
    rows = [r.split(",") for r in csv_text.strip().splitlines()[1:]]
    ids = np.array([int(r[0]) for r in rows])
    order = np.argsort(ids)
    return ids[order], np.array([float(r[1]) for r in rows])[order]


def test_trainer_trajectory_oracle(ref, twin_data, tmp_path):
    """accum=1: identical optimizer-step semantics on both sides → tight
    per-epoch trajectory agreement."""
    theirs = _run_reference(ref, tmp_path, twin_data, accum=1)
    ours = _run_ours(tmp_path, twin_data, accum=1, init_sd=theirs["init_sd"])

    ref_val_loss = theirs["writer"].series("Validation/Loss")
    ref_val_auc = theirs["writer"].series("Validation/AUC-ROC")
    our_val_loss = ours["series"]("Validation/Loss")
    our_val_auc = ours["series"]("Validation/aucroc")
    assert len(ref_val_loss) == len(our_val_loss) > 1, \
        "same number of trained epochs (early stopping twin decisions)"
    np.testing.assert_allclose(our_val_loss, ref_val_loss, atol=2e-3)
    np.testing.assert_allclose(our_val_auc, ref_val_auc, atol=2e-2)

    ref_train_loss = theirs["writer"].series("Train/Epoch_Loss")
    our_train_loss = ours["series"]("Train/Epoch_Loss")
    np.testing.assert_allclose(our_train_loss, ref_train_loss, atol=2e-3)

    assert ours["best_val"]["aucroc"] == pytest.approx(
        theirs["best_val"]["aucroc"], abs=2e-2)
    # final exported dev CSV: same ids, probabilities within drift tolerance
    ref_ids, ref_probs = _csv_probs(theirs["dev_csv"])
    our_ids, our_probs = _csv_probs(ours["dev_csv"])
    np.testing.assert_array_equal(ref_ids, our_ids)
    np.testing.assert_allclose(our_probs, ref_probs, atol=5e-3)
    # labeled test set: metrics dict for the same set name
    assert set(theirs["test"].keys()) == set(ours["test"].keys()) == {"test"}
    assert ours["test"]["test"]["aucroc"] == pytest.approx(
        theirs["test"]["test"]["aucroc"], abs=5e-2)


def test_trainer_trajectory_accum2(ref, twin_data, tmp_path):
    """accum=2: the reference's off-by-one accumulation (steps at iter 0 with
    a half-filled group, leaks partial groups across epochs) is documented,
    not replicated — trajectories agree loosely, catching gross accumulation
    bugs (double lr scaling, unaveraged grads)."""
    theirs = _run_reference(ref, tmp_path, twin_data, accum=2)
    ours = _run_ours(tmp_path, twin_data, accum=2, init_sd=theirs["init_sd"])

    ref_val_loss = theirs["writer"].series("Validation/Loss")
    our_val_loss = ours["series"]("Validation/Loss")
    n = min(len(ref_val_loss), len(our_val_loss))
    assert n >= 2
    np.testing.assert_allclose(our_val_loss[:n], ref_val_loss[:n], rtol=0.08)
    ref_train_loss = theirs["writer"].series("Train/Epoch_Loss")
    our_train_loss = ours["series"]("Train/Epoch_Loss")
    np.testing.assert_allclose(our_train_loss[:n], ref_train_loss[:n],
                               rtol=0.08)
