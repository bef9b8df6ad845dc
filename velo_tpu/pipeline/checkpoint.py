"""Checkpoint / resume of the odometry state (SURVEY.md §5).

The reference has none (it reruns a sequence from scratch on any failure).
Here the whole odometry state is a single fixed-shape pytree (``OdomCarry``),
so crash recovery is one ``.npz`` dump: every array leaf is saved under its
pytree path, and resume rebuilds the carry for the same config and refills
the leaves.  Used by the CLI/driver every N frames on long batched runs.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _leaf_names(tree: Any):
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    names, arrays = [], []
    for path, leaf in leaves:
        names.append(jax.tree_util.keystr(path))
        arrays.append(np.asarray(leaf))
    return names, arrays


def save_carry(path: str, carry: Any, frame_idx: int | None = None,
               history: dict[str, np.ndarray] | None = None) -> None:
    """Dump the carry pytree (+ optional per-frame history arrays).

    ``history`` holds the trajectory/diagnostics accumulated so far (poses,
    per-frame counters) so a resumed run can return the FULL sequence rather
    than just the post-checkpoint tail.
    """
    names, arrays = _leaf_names(carry)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {f"leaf_{i}": a for i, a in enumerate(arrays)}
    payload["__names__"] = np.asarray(names)
    if frame_idx is not None:
        payload["__frame_idx__"] = np.asarray(frame_idx)
    for k, v in (history or {}).items():
        payload[f"__hist_{k}__"] = np.asarray(v)
    tmp = path + ".tmp"
    np.savez_compressed(tmp, **payload)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_carry(path: str, template: Any) -> Any:
    """Refill ``template`` (e.g. ``init_carry(cfg)``) from a checkpoint.

    Shapes and pytree structure must match — i.e. same config — which is
    verified leaf by leaf.
    """
    data = np.load(path, allow_pickle=False)
    names_t, _ = _leaf_names(template)
    saved_names = [str(s) for s in data["__names__"]]
    if names_t != saved_names:
        raise ValueError(
            "checkpoint structure mismatch: was it written with a different "
            f"config? ({len(saved_names)} leaves vs {len(names_t)})"
        )
    leaves, treedef = jax.tree_util.tree_flatten(template)
    out = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if arr.shape != np.shape(leaf):
            raise ValueError(
                f"leaf {saved_names[i]}: shape {arr.shape} != {np.shape(leaf)}"
            )
        out.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def load_history(path: str) -> dict[str, np.ndarray]:
    """Per-frame history arrays stored alongside the carry (may be empty)."""
    data = np.load(path, allow_pickle=False)
    return {
        k[len("__hist_"):-2]: data[k]
        for k in data.files
        if k.startswith("__hist_") and k.endswith("__")
    }


def checkpoint_frame(path: str) -> int | None:
    """Frame index stored in a checkpoint, or None."""
    data = np.load(path, allow_pickle=False)
    if "__frame_idx__" in data:
        return int(data["__frame_idx__"])
    return None
