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


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bootstrap (SURVEY §5 "Distributed communication backend":
    the reference has none — single process, single GPU). On TPU pods the
    launcher environment usually provides everything and a bare
    ``jax.distributed.initialize()`` suffices; explicit args cover
    GPU/CPU clusters. Safe to call once per process, before first jax use;
    no-op for single-process runs with no coordinator configured."""
    import os

    if (coordinator_address is None and num_processes is None
            and "COORDINATOR_ADDRESS" not in os.environ):
        return  # single-process: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_host_mesh(
    d_tile: Optional[int] = None,
    data_axis: str = "data",
    tile_axis: str = "tile",
) -> Mesh:
    """(n_hosts*k, d_tile) -> ("data", "tile") mesh with the TILE axis laid
    out WITHIN each host's chips and the DATA axis across hosts.

    The tile axis carries the heavy per-step collectives (band all_gather
    fwd + pixel-cotangent reduce-scatter bwd, or the gaussian-shard
    all_to_all) so it must ride ICI; the data axis only psums parameter
    gradients once per step, which tolerates DCN. jax.devices() orders
    devices host-major, so reshaping (n_procs*local, ) -> (data, tile) with
    tile minor puts every tile group inside one host whenever d_tile
    divides the per-host chip count.
    """
    devices = jax.devices()
    local = len(jax.local_devices())
    if d_tile is None:
        d_tile = local
    assert local % d_tile == 0 or d_tile % local == 0, (
        f"tile axis {d_tile} must nest within/across whole hosts "
        f"({local} chips/host)"
    )
    d_data = len(devices) // d_tile
    arr = np.asarray(devices).reshape(d_data, d_tile)
    return Mesh(arr, (data_axis, tile_axis))
