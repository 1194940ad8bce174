"""Checkpointing.

Parity + extension of reference utils/save.py:

- ``ModelSaver`` writes the best params whenever the monitored metric
  improves (reference ModelSaver.save, utils/save.py:53-64) — flax msgpack
  instead of torch pickles.
- ``save_training_meta`` dumps hyperparams + git branch/SHA/dirty status
  (utils/save.py:11-48).
- **Extension (SURVEY.md §5):** full ``TrainState`` checkpoints (params +
  optimizer state + step) enabling mid-training resume, which the reference
  lacks (``start_epoch`` hard-coded, optimizer state never reloaded).
"""
from __future__ import annotations

import dataclasses
import json
import os
import subprocess
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

from meme_challenge_tpu.train.steps import TrainState


class ModelSaver:
    """Best-model params persistence (reference utils/save.py:53-64)."""

    def __init__(self, output_path: str):
        self.output_path = output_path

    def save(self, params: Any, opt_state: Any = None) -> None:
        params = jax.device_get(params)
        payload = {"params": params}
        if opt_state is not None:
            payload["opt_state"] = jax.device_get(opt_state)
        os.makedirs(os.path.dirname(os.path.abspath(self.output_path)),
                    exist_ok=True)
        with open(self.output_path, "wb") as f:
            f.write(serialization.to_bytes(payload))

    def load(self, params_template: Any) -> Any:
        with open(self.output_path, "rb") as f:
            raw = f.read()
        payload = serialization.from_bytes(
            {"params": params_template}, raw)
        return payload["params"]


def save_train_state(path: str, state: TrainState, epoch: int) -> None:
    """Full-state checkpoint for mid-training resume."""
    payload = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        "epoch": int(epoch),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))


def load_train_state(path: str, state_template: TrainState):
    """Returns (TrainState, epoch). Template supplies the pytree structure."""
    with open(path, "rb") as f:
        raw = f.read()
    template = {
        "params": state_template.params,
        "opt_state": state_template.opt_state,
        "step": 0,
        "epoch": 0,
    }
    payload = serialization.from_bytes(template, raw)
    state = TrainState(
        params=payload["params"],
        opt_state=payload["opt_state"],
        step=np.int32(payload["step"]),
    )
    return state, int(payload["epoch"])


def save_training_meta(output_dir: str, config, model_config=None) -> None:
    """hps.json + model.json + git info (reference utils/save.py:11-48)."""
    log_dir = os.path.join(output_dir, "log")
    os.makedirs(log_dir, exist_ok=True)
    cfg = (dataclasses.asdict(config)
           if dataclasses.is_dataclass(config) else dict(config))
    with open(os.path.join(log_dir, "hps.json"), "w") as f:
        json.dump(cfg, f, indent=4, default=str)
    if model_config is not None:
        mc = (dataclasses.asdict(model_config)
              if dataclasses.is_dataclass(model_config) else dict(model_config))
        with open(os.path.join(log_dir, "model.json"), "w") as f:
            json.dump(mc, f, indent=4)
    try:
        def git(*args):
            return subprocess.run(
                ["git", *args], timeout=10, stdout=subprocess.PIPE,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout.decode().strip()

        info = {
            "branch": git("rev-parse", "--abbrev-ref", "HEAD"),
            "sha": git("rev-parse", "HEAD"),
            "is_dirty": bool(git("status", "--short")),
        }
        with open(os.path.join(log_dir, "git_info.json"), "w") as f:
            json.dump(info, f, indent=4)
    except Exception:  # git info is best-effort (reference catches timeouts)
        pass
