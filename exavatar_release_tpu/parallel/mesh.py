"""Device mesh construction helpers."""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Sequence[int],
    axis_names: Sequence[str],
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh over the first prod(axis_sizes) devices.

    Typical layouts: ``make_mesh((D,), ("tile",))`` to shard image tiles
    across chips within a host, ``make_mesh((H, D), ("data", "tile"))`` for
    frames across hosts x tiles across chips.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = int(np.prod(axis_sizes))
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(tuple(axis_sizes))
    return Mesh(arr, tuple(axis_names))
