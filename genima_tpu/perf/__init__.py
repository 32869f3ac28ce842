"""Performance tracing and measurement utilities.

The reference's observability for the hot path is wall-clock timers around
``pipeline()`` / ``get_action`` (``controller/eval_genima.py:202-249``).
On TPU, naive wall-clock timing of jitted calls measures dispatch + transport
(on relay-attached hosts that is 3-35 ms of noise per call), so this module
provides the two measurement modes that produce real device numbers, plus a
``jax.profiler`` wrapper for hosts with direct device access:

* :func:`chain_time` — run a step function K times *inside one jitted
  program* via ``lax.scan`` with a carry dependency; per-iteration device
  time with dispatch amortized to ~0. This is how every round-2 kernel
  decision was measured (PERF.md).
* :func:`call_time` — per-call latency with a forced host readback per
  iteration (the only reliable completion barrier under the axon relay,
  where ``block_until_ready`` returns early).
* :func:`ablate_attention` / :func:`ablate_group_norm` — context managers
  that knock out one op class in the nn stack, bounding what a fused kernel
  for that class could win inside the REAL program.
* :func:`trace` — ``jax.profiler`` trace context (xplane dump for
  tensorboard); no-op with a warning where the profiler is unavailable.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "chain_time",
    "call_time",
    "ablate_attention",
    "ablate_group_norm",
    "trace",
]


def _force(x: Any) -> None:
    """Completion barrier that works through the axon relay: a host
    readback of one element of the first leaf."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf).ravel()[:1]


def chain_time(
    step: Callable[[Any], Any],
    carry_init: Any,
    length: int = 20,
    calls: int = 4,
) -> float:
    """Per-iteration device seconds of ``step`` (carry -> carry), measured
    as one jitted ``lax.scan`` chain of ``length`` iterations (min over
    ``calls`` runs). The carry dependency makes iterations non-hoistable
    and non-dedupable."""

    @jax.jit
    def run(c):
        def body(c, _):
            return step(c), ()

        y, _ = jax.lax.scan(body, c, None, length=length)
        return y

    out = run(carry_init)
    _force(out)  # compile
    best = float("inf")
    for _ in range(calls):
        t0 = time.perf_counter()
        out = run(carry_init)
        _force(out)
        best = min(best, time.perf_counter() - t0)
    return best / length


def call_time(
    fn: Callable[..., Any], *args, calls: int = 10, warmup: int = 2
) -> dict:
    """Per-call latency stats (seconds) with a forced readback per call."""
    for _ in range(warmup):
        _force(fn(*args))
    times = []
    for _ in range(calls):
        t0 = time.perf_counter()
        _force(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "p50": times[len(times) // 2],
        "min": times[0],
        "max": times[-1],
        "mean": sum(times) / len(times),
    }


@contextlib.contextmanager
def ablate_attention():
    """Replace every attention core (self/cross/VAE) with a q pass-through;
    the step-time delta vs baseline is the exact attention cost in-program."""
    import genima_tpu.nn.layers as L

    orig_backends = dict(L._ATTN_BACKENDS)
    orig_dpa = jax.nn.dot_product_attention
    L._ATTN_BACKENDS["xla"] = lambda q, k, v: q
    L._ATTN_BACKENDS["pallas"] = lambda q, k, v: q
    jax.nn.dot_product_attention = lambda q, k, v, **kw: q
    orig_min = L.FUSED_MIN_SEQ
    L.FUSED_MIN_SEQ = 1 << 30  # route 'fused' through the (patched) xla path
    try:
        yield
    finally:
        L._ATTN_BACKENDS.update(orig_backends)
        jax.nn.dot_product_attention = orig_dpa
        L.FUSED_MIN_SEQ = orig_min


@contextlib.contextmanager
def ablate_group_norm():
    """Replace every GroupNorm in the diffusion stack with identity."""
    import genima_tpu.nn.layers as L
    import genima_tpu.nn.unet as U
    import genima_tpu.nn.vae as V

    orig = L.group_norm
    ident = lambda c, eps, dtype, name: (lambda x: x)  # noqa: E731
    L.group_norm = ident
    U.group_norm = ident
    V.group_norm = ident
    try:
        yield
    finally:
        L.group_norm = orig
        U.group_norm = orig
        V.group_norm = orig


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler.trace`` context; degrades to a warning where the
    profiler cannot attach (e.g. relay-attached devices)."""
    try:
        with jax.profiler.trace(log_dir):
            yield
    except Exception as e:  # pragma: no cover - environment dependent
        import warnings

        warnings.warn(f"jax.profiler unavailable ({e}); falling back to "
                      "chain_time/call_time wall-clock measurement")
        yield


def hbm_bytes(tree: Any) -> int:
    """Total device bytes of a pytree (params / optimizer states)."""
    return sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(tree)
        if hasattr(leaf, "dtype")
    )
