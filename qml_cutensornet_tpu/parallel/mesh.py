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
