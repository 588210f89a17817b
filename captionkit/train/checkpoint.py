"""Orbax checkpointing (SURVEY.md §6 "Checkpoint / resume" row).

Replaces the reference's torch.save({epoch, model, optimizer, ...}) +
"*BEST.pth.tar" convention with Orbax: versioned step directories, a
tracked best checkpoint, and resume that restores (params, opt_state, step,
rng, best_metric) exactly.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from captionkit.train.state import TrainState


class CheckpointManager:
    """Thin wrapper around ocp.CheckpointManager with best-metric tracking."""

    def __init__(self, directory: str, *, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        # Recent checkpoints rotate under max_to_keep; the best checkpoint
        # is snapshotted separately under best/ so rotation can never
        # garbage-collect it (the reference's '*BEST.pth.tar' convention).
        self._mgr = ocp.CheckpointManager(
            os.path.join(self.directory, "recent"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True
            ),
        )
        self._best_dir = os.path.join(self.directory, "best")
        self._meta_path = os.path.join(self.directory, "best.json")

    # -- save / restore ------------------------------------------------------

    def save(
        self,
        state: TrainState,
        *,
        metric: Optional[float] = None,
        extra: Optional[dict[str, Any]] = None,
    ) -> bool:
        """Save at state.step; track best metric. Returns True if this save
        is the new best (reference's is_best flag, SURVEY.md §3.3)."""
        step = int(jax.device_get(state.step))
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        is_best = False
        if metric is not None:
            best = self.best_metric()
            if best is None or metric > best:
                is_best = True
                # Snapshot outside the rotating manager so it survives
                # max_to_keep garbage collection.
                with ocp.StandardCheckpointer() as ckptr:
                    tmp = self._best_dir + ".tmp"
                    if os.path.exists(tmp):
                        import shutil

                        shutil.rmtree(tmp)
                    ckptr.save(tmp, state)
                    ckptr.wait_until_finished()
                if os.path.exists(self._best_dir):
                    import shutil

                    shutil.rmtree(self._best_dir)
                os.rename(tmp, self._best_dir)
                payload = {"step": step, "metric": float(metric)}
                if extra:
                    payload.update(extra)
                with open(self._meta_path, "w") as f:
                    json.dump(payload, f)
        return is_best

    def restore(
        self, template: TrainState, *, step: Optional[int] = None
    ) -> TrainState:
        """Restore into the shapes/dtypes of `template` (an abstract or
        freshly-initialized TrainState)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )

    def restore_best(self, template: TrainState) -> TrainState:
        """Restore the best-metric snapshot (never rotated away)."""
        if not os.path.exists(self._best_dir):
            raise FileNotFoundError(f"no best checkpoint in {self.directory}")
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(self._best_dir, template)

    # -- metadata ------------------------------------------------------------

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_metric(self) -> Optional[float]:
        if not os.path.exists(self._meta_path):
            return None
        with open(self._meta_path) as f:
            return float(json.load(f)["metric"])

    def best_step(self) -> Optional[int]:
        if not os.path.exists(self._meta_path):
            return None
        with open(self._meta_path) as f:
            return int(json.load(f)["step"])

    def close(self) -> None:
        self._mgr.close()


def save_params_npz(params: Any, path: str) -> None:
    """Flat .npz export of a parameter pytree (interchange format; also what
    the torch converter emits)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {}
    for key_path, leaf in flat:
        if leaf is None:
            continue
        name = "/".join(_path_str(k) for k in key_path)
        arrays[name] = np.asarray(jax.device_get(leaf))
    np.savez(path, **arrays)


def load_params_npz(template: Any, path: str) -> Any:
    """Load a .npz produced by save_params_npz into template's structure."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(
        template, is_leaf=lambda x: x is None
    )
    leaves = []
    for key_path, leaf in flat:
        if leaf is None:
            leaves.append(None)
            continue
        name = "/".join(_path_str(k) for k in key_path)
        arr = data[name]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"shape mismatch for {name}: file {arr.shape} vs "
                f"template {np.shape(leaf)}"
            )
        # jnp (not np): numpy leaves cannot be indexed by tracers in scans.
        leaves.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _path_str(k) -> str:
    if hasattr(k, "name"):
        return str(k.name)
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return str(k.idx)
    return str(k)
