"""Training harness: epoch loop, checkpointing, meters, LR schedules.

Behavioral reference: ``latentfusion/trainutils.py:174-390`` (Trainer) and
checkpoint helpers (torchutils.py:44-68). Checkpoints are self-describing
(module ctor args + params) in both a native .npz format and the reference's
torch ``.pth`` schema (via recon.checkpoint.export_torch_state_dict), so
natively-trained models load in either framework.
"""
from __future__ import annotations

import json
import logging
import pickle
import time
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

import jax

from ..recon import checkpoint as ckpt
from ..utils import MyEncoder
from .logging import MetricLogger

logger = logging.getLogger(__name__)


def save_checkpoint(path, payload: Dict[str, Any]):
    """Native checkpoint: pickled pytree of numpy arrays."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "dtype") else x, payload)
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_checkpoint(path) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_checkpoint_orbax(path, payload: Dict[str, Any]):
    """Orbax variant (async-capable, multi-host-safe) for large runs."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    checkpointer = ocp.PyTreeCheckpointer()
    checkpointer.save(path, payload, force=True)


def load_checkpoint_orbax(path) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer().restore(Path(path).absolute())


class Trainer:
    """Epoch-loop harness (reference: trainutils.py:174-390).

    Subclasses provide ``run_iteration(batch, train, is_step)`` and module
    definitions. Responsibilities here: run epochs over an infinite loader,
    LR milestone scheduling (handled by optax inside the step), periodic +
    epoch-latest + best-metric checkpoints, params.json dump, meters.
    """

    def __init__(self, *, name: str, save_dir, loader, batches_per_epoch: int,
                 batch_groups: int = 1, num_epochs: int = 10000,
                 save_interval: int = 10, logger_intervals: Optional[dict] = None,
                 **kwargs):
        self.name = name
        self.save_dir = Path(save_dir) / name
        self.loader = loader
        self.batches_per_epoch = batches_per_epoch
        self.batch_groups = batch_groups
        self.num_epochs = num_epochs
        self.save_interval = save_interval
        self.kwargs = kwargs
        self.epoch = 0
        self.best_metrics: Dict[str, float] = {}
        self.plotter = MetricLogger(self.save_dir / "tb",
                                    **(logger_intervals or {}))
        self._time_mark = time.time()

    # Subclass hooks -------------------------------------------------------
    def run_iteration(self, batch, train: bool, is_step: bool):
        raise NotImplementedError

    def create_checkpoint(self) -> Dict[str, Any]:
        raise NotImplementedError

    # ----------------------------------------------------------------------
    def mark_time(self) -> float:
        now = time.time()
        delta = now - self._time_mark
        self._time_mark = now
        return delta

    def save_params_json(self):
        self.save_dir.mkdir(parents=True, exist_ok=True)
        with open(self.save_dir / "params.json", "w") as f:
            json.dump({"name": self.name, **{
                k: v for k, v in self.kwargs.items()
                if isinstance(v, (int, float, str, bool, list, tuple,
                                  type(None)))
            }}, f, indent=2, cls=MyEncoder)

    def save(self, tag: str):
        payload = self.create_checkpoint()
        payload.update({"name": self.name, "epoch": self.epoch})
        save_checkpoint(self.save_dir / f"ckpt-{tag}.npz.pkl", payload)
        logger.info("saved checkpoint %s", tag)

    def save_if_better(self, metric_name: str, value: float,
                       lower_is_better: bool = True):
        """(reference: trainutils.py:331-338)"""
        best = self.best_metrics.get(metric_name)
        better = best is None or (value < best if lower_is_better
                                  else value > best)
        if better:
            self.best_metrics[metric_name] = value
            self.save(f"best-{metric_name.replace('/', '_')}")

    def start(self, train: bool = True):
        """(reference: trainutils.py:298-340)"""
        self.save_params_json()
        self.save("initial")
        for epoch in range(self.epoch, self.num_epochs):
            self.epoch = epoch
            self.run_epoch(train=train)
            summary = self.plotter.epoch_summary()
            logger.info("epoch %d summary: %s", epoch, {
                k: round(v, 5) for k, v in list(summary.items())[:12]})
            self.on_epoch_end(summary)
            self.save("epoch-latest")
            if self.save_interval > 0 and (epoch + 1) % self.save_interval == 0:
                self.save(f"{epoch + 1:04d}")

    def on_epoch_end(self, summary: Dict[str, float]):
        for key in ("error/depth/l1", "loss/generator/total"):
            if key in summary:
                self.save_if_better(key, summary[key])
                break

    def run_epoch(self, train: bool = True):
        """(reference: trainutils.py:342-386)"""
        iters = self.batches_per_epoch * self.batch_groups
        it = iter(self.loader)
        for i in range(iters):
            batch = next(it)
            is_step = (i + 1) % self.batch_groups == 0
            self.run_iteration(batch, train, is_step)
            self.plotter.step()


class ReconTrainer(Trainer):
    """Reconstruction trainer wiring the jitted GAN step
    (reference: tools/train/train_reconstruct.py ReconTrainer)."""

    def __init__(self, *, sculptor, fuser, photographer, discriminator=None,
                 g_optimizer, d_optimizer=None, state, step_fn,
                 input_noise_sched=None, seed: int = 0, camera_dist=1.5,
                 **kwargs):
        super().__init__(**kwargs)
        self.sculptor = sculptor
        self.fuser = fuser
        self.photographer = photographer
        self.discriminator = discriminator
        self.g_optimizer = g_optimizer
        self.d_optimizer = d_optimizer
        self.state = state
        self.step_fn = step_fn
        self.input_noise_sched = input_noise_sched
        self.camera_dist = camera_dist
        self._key = jax.random.PRNGKey(seed)

    def run_iteration(self, batch, train: bool = True, is_step: bool = True):
        self._key, sub = jax.random.split(self._key)
        noise_w = (self.input_noise_sched.get(self.epoch)
                   if self.input_noise_sched else 0.0)
        data_time = self.mark_time()
        self.state, scalars = self.step_fn(self.state, batch, sub, noise_w)
        compute_time = self.mark_time()
        self.plotter.put_scalars(scalars)
        self.plotter.put_scalar("time/data_load", data_time)
        self.plotter.put_scalar("time/compute", compute_time)

    def create_checkpoint(self) -> Dict[str, Any]:
        """Reference-schema checkpoint: modules with {args, state_dict-like
        params} (reference: trainutils.py:274-285)."""
        params = self._module_params()
        modules = {
            "sculptor": {"args": self.sculptor.checkpoint_args(),
                         "params": params["sculptor"]},
            "photographer": {"args": self.photographer.checkpoint_args(),
                             "params": params["photographer"]},
            "fuser": {"type": type(self.fuser).__name__,
                      "args": {"in_channels": getattr(self.fuser,
                                                      "in_channels", None),
                               "cube_size": getattr(self.fuser, "cube_size",
                                                    1.0)},
                      "params": params.get("fuser", {})},
        }
        if self.discriminator is not None:
            modules["discriminator"] = {
                "args": self.discriminator.checkpoint_args(),
                "params": jax.device_get(self.state.d_params)}
        return {
            "args": {"camera_dist": self.camera_dist, **{
                k: v for k, v in self.kwargs.items()
                if isinstance(v, (int, float, str, bool, type(None)))}},
            "modules": modules,
        }

    def _module_params(self):
        return jax.device_get(self.state.params)

    def export_torch_checkpoint(self, path):
        """Emit a reference-format .pth consumable by the original
        PyTorch framework."""
        import torch

        payload = self.create_checkpoint()
        payload.update({"name": self.name, "epoch": self.epoch,
                        "meter_hists": {}})
        for mod in payload["modules"].values():
            params = mod.pop("params")
            mod["state_dict"] = {
                k: torch.from_numpy(np.asarray(v))
                for k, v in ckpt.export_torch_state_dict(params).items()
            }
        torch.save(payload, path)


class IBRTrainer(ReconTrainer):
    """IBR-generator trainer (reference: tools/train/train_ibr.py
    IBRTrainer): trains the UNet2d generator (+ optional discriminator) on
    top of a frozen/fine-tuned reconstruction stack."""

    def _module_params(self):
        p = jax.device_get(self.state.params)
        return {**p["recon"], "generator": p["generator"]}

    def create_checkpoint(self):
        payload = super().create_checkpoint()
        params = self._module_params()
        gen = getattr(self, "generator", None)
        payload["modules"]["generator"] = {
            "args": {
                "in_channels": gen.in_channels if gen else None,
                "out_channels": gen.out_channels if gen else None,
                "block_config": gen.block_config if gen else None,
            },
            "params": params["generator"],
        }
        return payload
