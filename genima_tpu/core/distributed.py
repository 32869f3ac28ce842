"""Multi-host distribution: process wiring + exactly-one-writer guards.

The reference's multi-process story is HF Accelerate: ``accelerate launch``
spawns N ranks, ``accelerator.is_main_process`` guards logging/checkpointing,
and the DataLoader shards samples per rank
(``diffusion/train_controlnet_genima.py:974-979`` and the
``is_main_process`` uses throughout). The TPU-native equivalent
(SURVEY.md §2.3/§5):

* ``initialize()`` — ``jax.distributed.initialize`` wiring for multi-host
  pods / multi-slice DCN. On TPU pods JAX auto-detects the topology, so a
  bare call suffices; explicit coordinator/process settings come from
  arguments or the standard env vars. Single-process runs are a no-op.
* ``is_main_process()`` / ``process_index()`` / ``process_count()`` —
  guards used by :class:`~genima_tpu.core.logging.MetricLogger` and the
  checkpoint writers so N hosts produce exactly one metrics stream and one
  checkpoint tree.
* ``shard_samples()`` — per-process sample striding for the host-side data
  loaders (each host decodes only its slice; the global batch is assembled
  on device by ``make_global_batch``).
* ``force_process()`` — test/dryrun hook: simulates a non-zero rank so the
  one-writer guards are assertable without real multi-host hardware.
"""

from __future__ import annotations

import contextlib
import os
from typing import Sequence

import jax

# (index, count) override installed by force_process(); None = ask jax
_FORCED: tuple[int, int] | None = None
_INITIALIZED = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: Sequence[int] | None = None,
) -> bool:
    """Idempotent ``jax.distributed.initialize``.

    Returns True if a multi-process runtime was initialized. Resolution:
    explicit args > env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID`` — the names
    ``jax.distributed`` itself honors) > TPU-pod auto-detection. When
    nothing indicates a multi-process topology this is a no-op, so every
    CLI can call it unconditionally.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # no explicit topology; on TPU pods jax.distributed.initialize()
        # with no args auto-detects via the metadata server — but calling
        # it on a single-host/CPU run raises, so only auto-init when the
        # platform reports MORE THAN ONE worker (single-host TPU setups can
        # still export TPU_WORKER_HOSTNAMES=localhost)
        hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        multi_worker = len([h for h in hostnames.split(",") if h]) > 1
        if multi_worker or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
            try:
                jax.distributed.initialize()
            except (ValueError, RuntimeError) as e:  # detection failed
                import warnings

                warnings.warn(
                    f"multi-host auto-detection failed ({e}); continuing "
                    "single-process", stacklevel=2,
                )
                return False
            _INITIALIZED = True
            return jax.process_count() > 1
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True
    return jax.process_count() > 1


def process_index() -> int:
    if _FORCED is not None:
        return _FORCED[0]
    return jax.process_index()


def process_count() -> int:
    if _FORCED is not None:
        return _FORCED[1]
    return jax.process_count()


def is_main_process() -> bool:
    """The Accelerate ``is_main_process`` equivalent: exactly one host
    writes metrics, checkpoints, and config snapshots."""
    return process_index() == 0


@contextlib.contextmanager
def force_process(index: int, count: int):
    """Simulate rank ``index`` of ``count`` (tests / the multichip dryrun's
    one-writer assertion). Only affects the guard helpers in this module —
    jax's real process topology is untouched."""
    global _FORCED
    prev = _FORCED
    _FORCED = (index, count)
    try:
        yield
    finally:
        _FORCED = prev


def shard_samples(samples, index: int | None = None, count: int | None = None):
    """Per-process slice of a host-side sample list (strided, so natural
    orderings stay balanced). Every process must hold the SAME full list
    (same indexing pass + shuffle seed) for the shards to be disjoint and
    exhaustive."""
    index = process_index() if index is None else index
    count = process_count() if count is None else count
    if count <= 1:
        return samples
    return samples[index::count]


def make_global_batch(batch, mesh, sharding):
    """Assemble a per-process local batch into a global sharded array.

    Single-process: a plain ``device_put`` (cheaper). Multi-process: each
    host contributes its local shard via
    ``jax.make_array_from_process_local_data`` — the device-side view is
    one global batch whose leading axis is the sum of the per-host batches.
    """
    if process_count() <= 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch
        )
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch
    )
