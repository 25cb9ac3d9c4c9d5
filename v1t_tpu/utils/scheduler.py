"""Plateau scheduler + checkpointing.

State machine identical to the reference (src/v1t/utils/scheduler.py:11-197):
monitor validation single-trial correlation (mode="max"); on improvement save
a checkpoint; after ``lr_patience`` stale epochs ROLL THE MODEL BACK to the
best checkpoint (parameters only — optimizer moments are kept, matching the
reference's restore() defaults at scheduler.py:192) and multiply every
learning rate by ``factor``; terminate after ``max_reduce`` reductions.

Checkpoints are flax msgpack files holding {epoch, value, model params,
optimizer state, scheduler state} at ``<output_dir>/ckpt/model_state.msgpack``
— the same single-file best-on-val contract as the reference's
``model_state.pt`` (scheduler.py:84-102), including:
- partial restore: a checkpoint may cover a subset of modules; restore merges
  into the current state (scheduler.py:125-130) — used for pretrained-core
  injection and ensemble output-head-only checkpoints,
- ``module_names`` filter to checkpoint only selected top-level modules
  (scheduler.py:73-82, ensemble.py:333).
"""

from __future__ import annotations

import os
import typing as t

import jax
import numpy as np
from flax import serialization

from v1t_tpu import optim

CKPT_NAME = "model_state.msgpack"


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _merge(dst: dict, src: dict) -> dict:
    """Recursive dict merge: values in src override dst (the functional
    equivalent of state_dict.update for nested param dicts)."""
    out = dict(dst)
    for k, v in src.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def save_checkpoint_file(filename: str, payload: dict):
    os.makedirs(os.path.dirname(filename), exist_ok=True)
    data = serialization.msgpack_serialize(_to_numpy_tree(payload))
    tmp = filename + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, filename)


def load_checkpoint_file(filename: str) -> dict:
    with open(filename, "rb") as f:
        return serialization.msgpack_restore(f.read())


class Scheduler:
    def __init__(
        self,
        config,
        mode: str = "max",
        max_reduce: int = 2,
        lr_patience: int = 10,
        factor: float = 0.3,
        min_epochs: int = 0,
        save_optimizer: bool = True,
        save_scheduler: bool = True,
        module_names: t.Optional[t.List[str]] = None,
    ):
        assert mode in ("min", "max")
        if factor >= 1.0:
            raise ValueError("Factor should be < 1.0.")
        self.mode = mode
        self.max_reduce = max_reduce
        self.num_reduce = 0
        self.lr_patience = lr_patience
        self.lr_wait = 0
        self.factor = factor
        self.min_epochs = min_epochs
        self.best_value = float("inf") if mode == "min" else -float("inf")
        self.best_epoch = 0
        self.save_optimizer = save_optimizer
        self.save_scheduler = save_scheduler
        self.module_names = module_names
        self.checkpoint_dir = os.path.join(config.output_dir, "ckpt")
        self.verbose = getattr(config, "verbose", 1)

    @property
    def checkpoint_path(self) -> str:
        return os.path.join(self.checkpoint_dir, CKPT_NAME)

    # --- persistence ----------------------------------------------------------

    def _parameters_to_save(self, params: dict) -> dict:
        if self.module_names is None:
            return params
        return {k: v for k, v in params.items() if k in self.module_names}

    def state_dict(self) -> dict:
        # numeric-only (msgpack-safe); mode/factor etc. are constructor
        # config, the counters are the actual state
        return {
            "num_reduce": self.num_reduce,
            "lr_wait": self.lr_wait,
            "best_value": self.best_value,
            "best_epoch": self.best_epoch,
        }

    def load_state_dict(self, state: dict):
        self.num_reduce = int(state["num_reduce"])
        self.lr_wait = int(state["lr_wait"])
        self.best_value = float(state["best_value"])
        self.best_epoch = int(state["best_epoch"])

    def save_checkpoint(
        self, value: float, epoch: int, params, opt_state=None, model_state=None
    ):
        payload = {
            "epoch": int(epoch),
            "value": float(value),
            "model": self._parameters_to_save(params),
        }
        if model_state:
            # non-parameter collections, e.g. BatchNorm running statistics
            # (part of the torch state_dict in the reference). The
            # module_names filter applies here too — the reference filters
            # the FULL state_dict, buffers included (scheduler.py:73-82)
            if self.module_names is not None:
                model_state = {
                    coll: {
                        k: v for k, v in tree.items() if k in self.module_names
                    }
                    for coll, tree in model_state.items()
                }
                model_state = {
                    coll: tree for coll, tree in model_state.items() if tree
                }
            if model_state:
                payload["model_state"] = model_state
        if self.save_optimizer and opt_state is not None:
            payload["optimizer"] = serialization.to_state_dict(opt_state)
        if self.save_scheduler:
            payload["scheduler"] = self.state_dict()
        save_checkpoint_file(self.checkpoint_path, payload)
        if self.verbose:
            print(f"\nCheckpoint saved to {self.checkpoint_path}.")

    def restore(
        self,
        params,
        opt_state=None,
        model_state=None,
        force: bool = False,
        load_optimizer: bool = False,
        load_scheduler: bool = False,
    ):
        """Merge the best checkpoint into (params, opt_state, model_state);
        returns (epoch, params, opt_state) — or a 4-tuple including
        model_state when one was passed. epoch 0 when no checkpoint exists."""
        epoch = 0
        had_state = model_state is not None
        if os.path.exists(self.checkpoint_path):
            ckpt = load_checkpoint_file(self.checkpoint_path)
            epoch = int(ckpt["epoch"])
            params = _merge(params, ckpt["model"])
            if had_state and "model_state" in ckpt:
                model_state = _merge(model_state, ckpt["model_state"])
            if load_optimizer and opt_state is not None and "optimizer" in ckpt:
                opt_state = serialization.from_state_dict(
                    opt_state, ckpt["optimizer"]
                )
            if load_scheduler and "scheduler" in ckpt:
                self.load_state_dict(ckpt["scheduler"])
            if self.verbose:
                print(
                    f"\nLoaded checkpoint from epoch {epoch} "
                    f"(value: {float(ckpt['value']):.04f}).\n"
                )
        elif force:
            raise FileNotFoundError(
                f"Cannot find checkpoint in {self.checkpoint_dir}."
            )
        if had_state:
            return epoch, params, opt_state, model_state
        return epoch, params, opt_state

    # --- state machine ---------------------------------------------------------

    def is_better(self, value: float) -> bool:
        return value < self.best_value if self.mode == "min" else value > self.best_value

    def step(self, value: float, epoch: int, params, opt_state, model_state=None):
        """Returns (terminate, params, opt_state) — params/opt_state may be
        rolled back to the best checkpoint with decayed LRs
        (reference scheduler.py:173-197). When a ``model_state`` dict is
        passed (BatchNorm statistics), it is checkpointed and rolled back
        with the parameters (mutated in place so the 3-tuple return stays
        stable for callers)."""
        terminate = False
        value = float(value)
        if self.is_better(value):
            self.best_value = value
            self.best_epoch = epoch
            self.lr_wait = 0
            self.num_reduce = 0
            self.save_checkpoint(value=value, epoch=epoch, params=params,
                                 opt_state=opt_state, model_state=model_state)
        elif epoch > self.min_epochs:
            if self.lr_wait >= self.lr_patience:
                if self.num_reduce >= self.max_reduce:
                    terminate = True
                    if self.verbose:
                        print(
                            f"\nModel has not improved after {self.num_reduce} "
                            f"LR reductions."
                        )
                else:
                    self.num_reduce += 1
                    # roll back model state (not optimizer moments), then decay
                    if model_state:
                        _, params, _, restored_state = self.restore(
                            params, model_state=model_state
                        )
                        model_state.clear()
                        model_state.update(restored_state)
                    else:
                        _, params, _ = self.restore(params)
                    opt_state = optim.scale_learning_rates(opt_state, self.factor)
                    if self.verbose:
                        lrs = optim.get_learning_rates(opt_state)
                        print(
                            f"Reduced learning rates to {lrs} "
                            f"(num. reduce: {self.num_reduce})."
                        )
                    self.lr_wait = 0
            else:
                self.lr_wait += 1
        return terminate, params, opt_state
