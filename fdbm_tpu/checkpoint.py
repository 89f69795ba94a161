"""Checkpointing: orbax-backed save/restore with best-metric retention.

Mirrors the reference's five ModelCheckpoint policies (train.py:143-150):
``last``, periodic ``step_<n>``, ``best_valid_loss``, ``best_pesq``,
``best_si_sdr``.  Each slot is an orbax PyTree checkpoint of
{params, ema_params, opt_state, step, ema_num_updates} plus a JSON config
blob so checkpoints are self-describing (the reference serialises
hyper-parameters into its .ckpt the same way, model.py:69).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from fdbm_tpu.model import TrainState


def _slot_dir(ckpt_dir: str, slot: str) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), slot)


class CheckpointManager:
    """Five-slot checkpoint manager with best-metric tracking."""

    def __init__(self, ckpt_dir: str, save_interval: int = 20000,
                 config: Optional[Dict[str, Any]] = None):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.save_interval = save_interval
        self.config = config or {}
        self.best = {"valid_loss": np.inf, "pesq": -np.inf, "si_sdr": -np.inf}
        self._ckptr = ocp.StandardCheckpointer()
        self._load_meta()

    # -- metadata ------------------------------------------------------------

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.ckpt_dir, "meta.json")

    def _load_meta(self) -> None:
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                meta = json.load(f)
            self.best.update({k: float(v) for k, v in meta.get("best", {}).items()})

    def _save_meta(self) -> None:
        with open(self._meta_path, "w") as f:
            json.dump({"best": {k: float(v) for k, v in self.best.items()},
                       "config": self.config}, f, indent=2)

    # -- save/restore ---------------------------------------------------------

    def _write(self, slot: str, state: TrainState) -> None:
        path = _slot_dir(self.ckpt_dir, slot)
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        self._ckptr.save(tmp, jax.device_get(state))
        self._ckptr.wait_until_finished()
        if os.path.exists(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
        self._save_meta()

    def save(self, state: TrainState, metrics: Optional[Dict[str, float]] = None) -> None:
        """Save 'last', periodic step slot, and any best-metric slots."""
        step = int(state.step)
        self._write("last", state)
        if self.save_interval and step % self.save_interval == 0 and step > 0:
            self._write(f"step_{step}", state)
        metrics = metrics or {}
        if "valid_loss" in metrics and metrics["valid_loss"] < self.best["valid_loss"]:
            self.best["valid_loss"] = metrics["valid_loss"]
            self._write("best_valid_loss", state)
        if "pesq" in metrics and metrics["pesq"] > self.best["pesq"]:
            self.best["pesq"] = metrics["pesq"]
            self._write("best_pesq", state)
        if "si_sdr" in metrics and metrics["si_sdr"] > self.best["si_sdr"]:
            self.best["si_sdr"] = metrics["si_sdr"]
            self._write("best_si_sdr", state)

    def restore(self, slot: str, abstract_state: TrainState) -> TrainState:
        path = _slot_dir(self.ckpt_dir, slot)
        return self._ckptr.restore(path, abstract_state)

    def has(self, slot: str) -> bool:
        return os.path.isdir(_slot_dir(self.ckpt_dir, slot))


def save_params(path: str, params, config: Optional[Dict[str, Any]] = None) -> None:
    """Standalone params-only save (partial backbone load support,
    reference model.py:408-411)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr.save(path, jax.device_get(params))
    ckptr.wait_until_finished()
    if config is not None:
        with open(path + ".config.json", "w") as f:
            json.dump(config, f, indent=2)


def restore_params(path: str, abstract_params):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), abstract_params)


def load_checkpoint_config(ckpt_dir: str) -> Dict[str, Any]:
    meta = os.path.join(os.path.abspath(ckpt_dir), "meta.json")
    with open(meta) as f:
        return json.load(f).get("config", {})
