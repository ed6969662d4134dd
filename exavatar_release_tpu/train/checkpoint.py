"""Checkpointing: pytree snapshots via orbax (with a numpy fallback).

Replaces the reference's torch.save snapshots (reference
avatar/common/base.py:147-158, avatar/main/train.py:77-81). Because the
scene lives in a fixed-capacity buffer, restored shapes are static — the
reference's rebuild-from-point_num dance (base.py:123-126,180-186) is
unnecessary.
"""
from __future__ import annotations

import glob
import os
import os.path as osp
import re
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_checkpoint(directory: str, state: Any, epoch: int) -> str:
    """Save a pytree snapshot as snapshot_{epoch}.npz (single file, atomic
    rename; orbax's async machinery is unnecessary at this state size)."""
    os.makedirs(directory, exist_ok=True)
    leaves, _ = _flatten_with_paths(state)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    payload["num_leaves"] = np.asarray(len(leaves))
    payload["epoch"] = np.asarray(epoch)
    path = osp.join(directory, f"snapshot_{epoch}.npz")
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    """Find the newest snapshot (reference base.py:152-158)."""
    files = glob.glob(osp.join(directory, "snapshot_*.npz"))
    if not files:
        return None
    def ep(f):
        m = re.search(r"snapshot_(-?\d+)\.npz$", f)
        return int(m.group(1)) if m else -1
    return max(files, key=ep)


def load_checkpoint(path: str, template: Any) -> Tuple[Any, int]:
    """Restore into the structure of ``template`` (shapes must match —
    guaranteed by fixed capacity)."""
    data = np.load(path)
    n = int(data["num_leaves"])
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    _, treedef = jax.tree_util.tree_flatten(template)
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, int(data["epoch"])
