"""Slope-based device timing through the axon relay.

Every host->device call through the relay pays a large, variable round-trip
(~35 ms). Dividing one chained call's wall time by its scan length therefore
overstates per-iteration cost by RT/length — the round-2 bug that inflated
ablate_r2/profile numbers. Fix: compile the SAME scan at two lengths and
report the slope (T(L2) - T(L1)) / (L2 - L1), which cancels any per-call
constant exactly. Outputs must be scalars — reading a full activation back
through the relay costs seconds.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197.0  # v5e bf16


def _measure(fn, args, calls):
    # NOTE: jax.block_until_ready does NOT synchronize through the axon
    # relay — only an actual value readback does. Outputs are scalars, so
    # the transfer itself is negligible.
    times = []
    _ = float(np.asarray(fn(*args)))  # compile
    for _ in range(calls):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(out))
        times.append(time.perf_counter() - t0)
    return min(times)


def scan_chain(stage_apply, length):
    """Jit a carry-chained scan of ``stage_apply(params, x) -> y`` with the
    output folded back into the carry (nothing hoistable), scalar output."""

    @jax.jit
    def run(params, x):
        def body(c, _):
            y = stage_apply(params, c)
            tap = jnp.mean(y).astype(c.dtype) * 1e-6
            return c + tap, ()

        y, _ = jax.lax.scan(body, x, None, length=length)
        return jnp.mean(y)

    return run


def device_ms(name, stage_apply, params, x0, l1=4, l2=20, flops=None, calls=6):
    """True device ms per application of ``stage_apply``, relay-independent."""
    t0 = time.time()
    f1 = scan_chain(stage_apply, l1)
    f2 = scan_chain(stage_apply, l2)
    tl1 = _measure(f1, (params, x0), calls)
    tl2 = _measure(f2, (params, x0), calls)
    compile_s = time.time() - t0 - (tl1 + tl2) * calls
    ms = (tl2 - tl1) / (l2 - l1) * 1000
    extra = ""
    if flops:
        ideal = flops / (PEAK_TFLOPS * 1e12) * 1000
        util = ideal / ms * 100 if ms > 0 else float("nan")
        extra = f"  ideal {ideal:6.2f} ms  util {util:5.1f}%"
    print(
        f"{name:44s} {ms:8.3f} ms/iter (compile {compile_s:.0f}s,"
        f" call floor {tl1 * 1000 - l1 * ms:5.1f} ms){extra}",
        flush=True,
    )
    return ms


def zeros_init(module, *args):
    shapes = jax.eval_shape(
        lambda *a: module.init(jax.random.key(0), *a), *args
    )["params"]
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes
    )
