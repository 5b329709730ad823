"""Device mesh construction.

The reference distributes over flat MPI ranks with one GPU each
(gpu_backend/kernel_state_ansatz.py:151-152, device binding
``rank % getDeviceCount()``). The TPU-native equivalent is a 1-D
``jax.sharding.Mesh`` over the local (or multi-host, via
``jax.distributed``) device set; collectives ride ICI/DCN.
"""

from __future__ import annotations

import numpy as np

AXIS = "dp"


def make_mesh(n_devices: int | None = None, axis: str = AXIS):
    import jax

    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"Requested {n_devices} devices but only {len(devices)} available."
            )
        devices = devices[:n_devices]
    return jax.sharding.Mesh(np.array(devices), (axis,))


def to_host(arr) -> np.ndarray:
    """Materialize a (possibly multi-process global) jax.Array as the FULL
    numpy value on every process.

    Single-controller arrays are fully addressable and convert directly;
    under ``jax.distributed`` each process only holds its shard, so the
    value is assembled with a process allgather (DCN) first — the
    replacement for the reference's ``mpi_comm.reduce(..., root=0)``
    returning the matrix on rank 0 (gpu:427-428), except every process
    gets the result."""
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def process_index() -> int:
    import jax

    return jax.process_index()


def maybe_distributed_init() -> None:
    """Initialize jax.distributed when launched under a multi-host runtime
    (controlled by standard JAX env vars). No-op on a single host."""
    import os

    if "JAX_COORDINATOR_ADDRESS" in os.environ or "COORDINATOR_ADDRESS" in os.environ:
        import jax

        try:
            jax.distributed.initialize()
        except Exception:
            pass
