"""Checkpointing with Orbax (reference: torch.save dict
{model, optimizer, scheduler, total_steps} + latest.pth delete-then-rewrite,
train_mf.py:207-212, 264-283).

Improvements over the reference's scheme:
- atomic writes (no crash window while latest.pth is deleted, SURVEY §5.3);
- keeps the last N step checkpoints + 'latest' via CheckpointManager;
- restore() resumes model/optimizer/step exactly (train_mf.py:149-157).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from streamflow_tpu.training.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5,
                 save_interval_steps: int = 1):
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True,
            ),
        )

    def save(self, state: TrainState, wait: bool = False):
        step = int(state.step)
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: TrainState, step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.dir}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_params_npz(path: str, params) -> None:
    """Flat-file param export (portable, dependency-free restore)."""
    flat = {}

    def rec(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                rec(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(tree)

    rec("", params)
    np.savez(path, **flat)


def load_params_npz(path: str):
    """Inverse of save_params_npz: rebuild the nested dict."""
    flat = np.load(path)
    params = {}
    for key in flat.files:
        parts = key.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return params


def load_variables_npz(path: str):
    """Load an npz into a flax variables dict for ``model.apply``.

    Accepts both layouts: a bare params tree (wrapped as {'params': ...}) and
    a full variables export with top-level 'params' (+ 'batch_stats' for the
    batch-norm CNN encoders — tools/convert.py writes this layout)."""
    tree = load_params_npz(path)
    return tree if "params" in tree else {"params": tree}
