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
    the reference has none — single process, single GPU). Call once per
    process before first jax use. Initializes ``jax.distributed`` when

    - explicit args are given (GPU/CPU clusters), or
    - ``COORDINATOR_ADDRESS`` is set (this package's launcher convention,
      see tests/test_distributed_smoke.py), or
    - a recognized cluster environment is detected (TPU pod via libtpu's
      multi-host env vars, SLURM, or JAX's own ``JAX_COORDINATOR_ADDRESS``)
      — there ``jax.distributed.initialize()`` self-configures.

    No-op for plain single-process runs."""
    import os

    def _multi(var, sep=","):
        return len(os.environ.get(var, "").split(sep)) > 1

    cluster_env = (
        "COORDINATOR_ADDRESS" in os.environ   # this package's convention
        or "JAX_COORDINATOR_ADDRESS" in os.environ  # jax's own override
        or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ  # multi-slice TPU
        # pod metadata counts only when it names MORE THAN ONE worker —
        # single-host TPU plugins set TPU_WORKER_HOSTNAMES=localhost and
        # must stay a no-op
        or _multi("TPU_WORKER_HOSTNAMES")
        or os.environ.get("SLURM_JOB_NUM_NODES", "1") not in ("", "1")
    )
    if coordinator_address is None and num_processes is None and not cluster_env:
        return  # single-process: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=(
            coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
        ),
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
    assert len(devices) % d_tile == 0, (
        f"tile axis {d_tile} must divide the global device count "
        f"{len(devices)} (heterogeneous/partial slices cannot form a "
        f"rectangular (data, tile) mesh)"
    )
    if d_tile > local:
        import warnings

        warnings.warn(
            f"tile axis {d_tile} spans {d_tile // local} hosts "
            f"({local} chips each): the per-step band all_gather / "
            f"all_to_all will cross DCN instead of riding ICI",
            stacklevel=2,
        )
    d_data = len(devices) // d_tile
    arr = np.asarray(devices).reshape(d_data, d_tile)
    return Mesh(arr, (data_axis, tile_axis))
