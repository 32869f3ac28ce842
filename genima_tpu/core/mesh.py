"""Device mesh and sharding helpers.

The reference's only distribution mechanism is HF Accelerate DDP over NCCL for
the diffusion fine-tune (reference: ``diffusion/train_controlnet_genima.py:974``,
``:1216-1218``); the controller trains single-GPU. The TPU-native equivalent
is a sharded ``jit``: a 1-D (or 2-D data x fsdp) ``jax.sharding.Mesh``, the
batch sharded over the ``data`` axis with ``NamedSharding``, parameters
replicated (or FSDP-sharded), and XLA emitting the gradient all-reduce over
ICI — no explicit collectives, no wrapper framework.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"


def make_mesh(
    n_data: int | None = None, n_fsdp: int = 1, devices: list | None = None
) -> Mesh:
    """Build a (data[, fsdp]) mesh over available devices.

    With ``n_data=None`` the full device count goes to the data axis —
    the Genima workloads (SD-turbo ControlNet + ACT) fit on one chip, so
    pure data parallelism is the default, mirroring the reference's DDP.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_fsdp
    needed = n_data * n_fsdp
    if len(devices) < needed:
        raise ValueError(
            f"make_mesh needs {needed} devices for a {n_data}x{n_fsdp} "
            f"(data x fsdp) mesh but only {len(devices)} are available "
            f"({[d.platform for d in devices]}). Provision more devices or "
            "a virtual CPU platform "
            "(XLA_FLAGS=--xla_force_host_platform_device_count=N)."
        )
    if len(devices) > needed:
        devices = devices[:needed]
    dev_array = np.asarray(devices).reshape(n_data, n_fsdp)
    return Mesh(dev_array, (DATA_AXIS, FSDP_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a batch: leading axis split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host pytree onto the mesh with the batch axis sharded.

    This is the single host->device transfer per step (the reference's
    ``accelerator.prepare`` dataloader equivalent). On multi-host runs each
    process contributes its local slice of the global batch
    (``jax.make_array_from_process_local_data``); single-host is a plain
    ``device_put``.
    """
    from genima_tpu.core.distributed import make_global_batch

    return make_global_batch(batch, mesh, data_sharding(mesh))


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
