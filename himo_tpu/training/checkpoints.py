"""Checkpoint save/restore (orbax) — the reference's ``checkpoint=...ckpt``
surface (README.md:50) backed by TPU-native storage.

A checkpoint is a pytree dict, typically ``{"params": ..., "opt_state": ...,
"step": int, "config": {...}}``. Orbax handles sharded arrays transparently,
so the same call works single-chip and across a mesh.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


def save_checkpoint(path, tree: Dict[str, Any]) -> str:
    path = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    return str(path)


def load_checkpoint(path, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Restore a checkpoint.

    Accepts either a direct PyTree checkpoint path or a CheckpointManager
    directory (numbered step subdirectories, as written by training) — the
    latter resolves to its latest step, so CLIs can simply point at
    ``{run_dir}/ckpts``."""
    path = Path(path).absolute()
    if path.is_dir():
        steps = sorted(
            (int(p.name) for p in path.iterdir() if p.is_dir() and p.name.isdigit()),
            reverse=True,
        )
        if steps:
            path = path / str(steps[0])
            # Manager layouts nest the pytree under a 'default' item.
            if (path / "default").is_dir():
                path = path / "default"
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(path, args=ocp.args.PyTreeRestore(target))
        return ckptr.restore(path)


class CheckpointManager:
    """Top-k checkpoint retention, mirroring the reference training setup
    (``save_top_model=3``, assets/slurm/ssl-train-av2.sh:32).

    With ``best_metric`` set, retention is by that (lower-is-better) metric
    from the ``metrics`` dict passed to :meth:`save` — the kept k checkpoints
    are the best validation ones, not merely the latest."""

    def __init__(
        self,
        directory,
        keep: int = 3,
        best_metric: Optional[str] = None,
        async_save: bool = True,
    ):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.best_metric = best_metric
        self.async_save = async_save
        options = dict(max_to_keep=keep, create=True)
        if best_metric is not None:
            options.update(
                best_fn=lambda metrics: float(metrics[best_metric]),
                best_mode="min",
            )
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(**options),
        )

    def save(self, step: int, tree: Dict[str, Any], metrics: Optional[dict] = None):
        """Persist a checkpoint; with ``async_save`` the write runs in the
        background (orbax async machinery) and training continues — the
        previous in-flight write is drained first so at most one save is
        outstanding. Sync mode blocks until durable.

        Returns ``{"drain_s", "dispatch_s"}``: the time spent draining the
        PREVIOUS in-flight save and the time this save call held the
        caller. With async saves, ``drain_s > 0`` at save N+1 is the direct
        measurement that save N was still writing while the training steps
        between the two proceeded (the compute/checkpoint overlap evidence
        the metrics jsonl records per step)."""
        import time as _time

        t0 = _time.perf_counter()
        self.manager.wait_until_finished()  # drain any in-flight save
        t1 = _time.perf_counter()
        self.manager.save(step, args=ocp.args.PyTreeSave(tree), metrics=metrics)
        if not self.async_save:
            self.manager.wait_until_finished()
        return {"drain_s": t1 - t0, "dispatch_s": _time.perf_counter() - t1}

    def restore_latest(self, target=None):
        self.manager.wait_until_finished()
        step = self.manager.latest_step()
        if step is None:
            return None, None
        if target is not None:
            tree = self.manager.restore(step, args=ocp.args.PyTreeRestore(target))
        else:
            tree = self.manager.restore(step)
        return step, tree

    def close(self):
        """Blocks until every pending async save is durable, then closes."""
        self.manager.wait_until_finished()
        self.manager.close()
