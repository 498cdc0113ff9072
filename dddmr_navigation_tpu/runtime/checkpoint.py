"""Deterministic per-tick state checkpointing — SURVEY.md §5's spec for
the compute level the reference lacks (its checkpointing is map-artifact
only: pcdSaver pose graphs, `mapOptimization.h:91`; mid-run state is
unrecoverable).

Every dynamic state in this framework is a pytree (MarkingState,
MCLState, FSMState, FleetState, PoseGraphArrays, ...), so a checkpoint is
one ``save_pytree`` per tick boundary: arrays to an .npz plus a treedef
JSON sidecar. ``restore_pytree`` rebuilds against a structural template
(the typed NamedTuples/pytrees carry their own structure).
"""
from __future__ import annotations

import json
import os

import numpy as np
import jax


def save_pytree(path: str, tree) -> None:
    """Serialize a pytree of arrays/scalars to ``path``.npz (+ .json)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)
    meta = {"num_leaves": len(leaves), "treedef": str(treedef)}
    with open(_meta_path(path), "w") as f:
        json.dump(meta, f)


def restore_pytree(path: str, template):
    """Restore into the structure of ``template`` (shapes must match)."""
    npz = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves, treedef = jax.tree_util.tree_flatten(template)
    assert len(npz.files) == len(leaves), (
        f"checkpoint has {len(npz.files)} leaves, template {len(leaves)}")
    new_leaves = [npz[f"leaf_{i}"] for i in range(len(leaves))]
    import jax.numpy as jnp
    new_leaves = [
        jnp.asarray(x) if hasattr(t, "dtype") else type(t)(x)
        for x, t in zip(new_leaves, leaves)]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def _meta_path(path: str) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".meta.json"


class CheckpointManager:
    """Rotating checkpoint slots + resume-latest."""

    def __init__(self, directory: str, keep: int = 3):
        self.directory = directory
        self.keep = keep
        os.makedirs(directory, exist_ok=True)

    def _slot(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt_{step:08d}")

    def save(self, step: int, tree) -> str:
        p = self._slot(step)
        save_pytree(p, tree)
        self._gc()
        return p + ".npz"

    def latest_step(self) -> int | None:
        steps = sorted(
            int(f[5:13]) for f in os.listdir(self.directory)
            if f.startswith("ckpt_") and f.endswith(".npz"))
        return steps[-1] if steps else None

    def restore_latest(self, template):
        step = self.latest_step()
        if step is None:
            return None, None
        return step, restore_pytree(self._slot(step), template)

    def _gc(self):
        steps = sorted(
            int(f[5:13]) for f in os.listdir(self.directory)
            if f.startswith("ckpt_") and f.endswith(".npz"))
        for s in steps[:-self.keep]:
            for suffix in (".npz", ".meta.json"):
                try:
                    os.remove(self._slot(s) + suffix)
                except OSError:
                    pass
