"""Benchmark: 4-cam tiled 256^2 generations/sec/chip, 5-step SD-turbo.

The north-star metric (BASELINE.md): one "generation" is a full Genima
diffusion-agent call — 5 ControlNet+UNet denoise steps at 512x512 (the 2x2
tile of 4x 256^2 cameras) + VAE decode + uint8 postprocess, batch 1, as one
jitted XLA program. Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline"}.

vs_baseline is measured against the north-star target of 10 gens/sec (the
<100 ms p50 closed-loop step on v5e; the reference publishes no numbers —
BASELINE.json published: {}).

Measurement notes (axon relay):
* gens/sec is measured with a CHAINED pipeline: every iteration's latents
  depend on the previous iteration's output image (device-side, never read
  back until the end), plus a distinct base latent per iteration. Nothing
  can be deduped, reordered, or skipped — the chain is one long device
  dependency — while host dispatch overlaps device execution, so the number
  is true sequential device throughput rather than device time + per-call
  relay round-trip (~15-35 ms of noise on this host).
* per-call p50 latency (readback each iteration) is reported on stderr as a
  diagnostic.
* params are zeros-initialized directly on device: TPU timing is
  value-independent (no data-dependent control flow in the program) and
  host->device transfer of 5 GB of random weights through the relay costs
  ~260 s. Pass --real-init for fast_init host random weights.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

METRIC = "tiled_256x4_5step_sdturbo_gens_per_sec_chip"
TARGET_GENS_PER_SEC = 10.0  # <100 ms north-star
PEAK_BF16_TFLOPS = 197.0  # v5e per-chip MXU peak (bf16)


def _emit_error(msg: str) -> None:
    """One structured JSON line so a relay outage is a recorded result,
    not a crash (round 3 died on the first jax.devices() with no retry)."""
    print(
        json.dumps(
            {
                "metric": METRIC,
                "value": 0.0,
                "unit": "gens/sec",
                "vs_baseline": 0.0,
                "error": msg,
            }
        ),
        flush=True,
    )


def _tpu_ready(attempts: int = 3, probe_timeout: float = 90.0,
               backoff: float = 60.0) -> tuple[bool, str]:
    """Probe backend init in a CHILD process under a timeout, with bounded
    retries — axon-relay outages can be transient, and a hung relay blocks
    backend init indefinitely (a child is killable; the parent is not)."""
    import subprocess

    last = ""
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, capture_output=True, text=True,
            )
            if r.returncode == 0:
                return True, ""
            tail = (r.stderr or "").strip().splitlines()
            last = tail[-1] if tail else f"probe rc={r.returncode}"
        except subprocess.TimeoutExpired:
            last = f"backend init timed out after {probe_timeout:.0f}s"
        print(f"TPU probe {i + 1}/{attempts} failed: {last}", file=sys.stderr)
        if i + 1 < attempts:
            time.sleep(backoff)
    return False, last


def _arm_watchdog(seconds: float) -> None:
    """If the relay hangs mid-run, emit the error line and exit instead of
    letting the driver kill us at rc=124 with no JSON output."""

    def fire():
        time.sleep(seconds)
        if _RESULT_EMITTED.is_set():
            return
        _emit_error(f"bench watchdog fired after {seconds:.0f}s (relay hang?)")
        os._exit(0)

    threading.Thread(target=fire, daemon=True).start()


_RESULT_EMITTED = threading.Event()


def zeros_init(pipe, image_size: int = 512, bf16: bool = False) -> dict:
    """On-device zeros params with the exact real tree structure.

    ``bf16=True`` stores f32 leaves as bf16 — the serving storage layout
    (compute is bf16 either way; storing f32 makes XLA re-read f32 weights
    at every denoise step when the convert fuses into the consumer)."""
    shapes = jax.eval_shape(
        lambda: pipe.init_params(jax.random.key(0), image_size=image_size,
                                 fast=False)
    )
    def mk(s):
        dt = jnp.bfloat16 if (bf16 and s.dtype == jnp.float32) else s.dtype
        return jnp.zeros(s.shape, dt)
    return jax.tree_util.tree_map(mk, shapes)


def measure_per_gen_ms(pipe, params, cond, embeds, latents, num_steps: int,
                       bs: int) -> float:
    """Slope-timed ms/gen: K generations scan-chained inside ONE program.

    Sequential device dependence (iteration i+1's latents fold in a pixel
    of iteration i's image — ~1e-9 magnitude, workload unchanged, nothing
    hoistable/dedupable), fresh random latents per iteration, ONE dispatch.
    Measured at two lengths; the slope cancels the per-call relay
    round-trip exactly (a python-side chain still pays ~9 ms/gen of relay
    gaps on this host)."""

    def scan_gens(params, lat0, length):
        def body(carry, i):
            fb = carry
            lat = (
                jax.random.normal(jax.random.fold_in(jax.random.key(7), i),
                                  lat0.shape, lat0.dtype)
                + fb * 1e-9
            )
            img = pipe.generate(
                params, cond, embeds, lat, num_inference_steps=num_steps
            )
            return img[0, 0, 0, 0].astype(jnp.float32), ()

        fb, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), jnp.arange(length)
        )
        return fb

    runs = {}
    for length in (4, 20):
        f = jax.jit(scan_gens, static_argnames=("length",))
        _ = float(np.asarray(f(params, latents, length)))  # compile
        times = []
        for _i in range(4):
            t0 = time.perf_counter()
            _ = float(np.asarray(f(params, latents, length)))
            times.append(time.perf_counter() - t0)
        runs[length] = min(times)
    return (runs[20] - runs[4]) / 16 * 1000 / bs


# FLOP counting runs in a CPU-platform CHILD process: the axon relay's
# PJRT client returns None from Lowered.cost_analysis(), but FLOPs are a
# property of the HLO, not the backend — the CPU client counts the same
# program exactly. Abstract lowering only (ShapeDtypeStruct params from
# eval_shape): no weights materialize, no compile happens; ~30-60 s.
_FLOPS_CHILD = r"""
import jax, json
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from genima_tpu.diffusion.pipeline import SDControlNetPipeline

bs, steps = @BS@, @STEPS@
pipe = SDControlNetPipeline()
shapes = jax.eval_shape(
    lambda: pipe.init_params(jax.random.key(0), image_size=512, fast=False)
)
params = jax.tree_util.tree_map(
    lambda s: jax.ShapeDtypeStruct(
        s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
    ),
    shapes,
)
cond = jax.ShapeDtypeStruct((bs, 512, 512, 3), jnp.float32)
embeds = jax.ShapeDtypeStruct(
    (bs, 77, pipe.text_cfg.hidden_size), jnp.bfloat16
)


def lat_struct(n):
    s = jax.eval_shape(
        lambda: pipe.init_latents(jax.random.key(2), n, 512, 512)
    )
    return jax.ShapeDtypeStruct(s.shape, s.dtype)


def flops(lowered):
    ca = lowered.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float((ca or {}).get("flops", 0.0))


out = {
    "gen": flops(
        type(pipe).generate.lower(
            pipe, params, cond, embeds, lat_struct(bs),
            num_inference_steps=steps,
        )
    )
}
dec = jax.jit(lambda p, s: pipe._decode_latents(p, s, "batched"))
for n in (1, 8):
    out["dec" + str(n)] = flops(dec.lower(params, lat_struct(n)))
print(json.dumps(out))
"""


def _program_flops(bs: int, steps: int) -> dict:
    """{"gen": f, "dec1": f, "dec8": f} from the CPU-client cost analysis
    of the exact serving programs; {} when the child fails."""
    import subprocess

    src = _FLOPS_CHILD.replace("@BS@", str(bs)).replace("@STEPS@", str(steps))
    r = subprocess.run(
        [sys.executable, "-c", src], capture_output=True, text=True,
        timeout=600,
    )
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()
        print(
            f"flop-count child failed: {tail[-1] if tail else r.returncode}",
            file=sys.stderr,
        )
        return {}
    return json.loads(r.stdout.strip().splitlines()[-1])


def _decode_ms(pipe, params, n: int) -> float:
    """Slope-timed ms per native batched VAE decode at batch ``n`` (512^2),
    same chained-scan methodology as ``measure_per_gen_ms``."""
    lat0 = pipe.init_latents(jax.random.key(3), n, 512, 512)

    def scan_dec(params, length):
        def body(fb, i):
            img = pipe._decode_latents(params, lat0 + fb * 1e-9, "batched")
            return img[0, 0, 0, 0].astype(jnp.float32), ()

        fb, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), jnp.arange(length)
        )
        return fb

    f = jax.jit(scan_dec, static_argnames=("length",))
    runs = {}
    for length in (4, 20):
        _ = float(np.asarray(f(params, length)))  # compile
        times = []
        for _i in range(3):
            t0 = time.perf_counter()
            _ = float(np.asarray(f(params, length)))
            times.append(time.perf_counter() - t0)
        runs[length] = min(times)
    return (runs[20] - runs[4]) / 16 * 1000


def _report_mxu_util(pipe, params, cond, embeds, latents, num_steps: int,
                     per_gen_ms: float, bs: int) -> None:
    """One auditable utilization line in the driver artifact (round-4 judge
    ask #7): achieved MXU% = XLA cost-analysis FLOPs / measured wall time /
    197 TF bf16 peak, for the full 5-step generate and for the VAE decode
    at N=1 and N=8 (the serving batch sizes that bracket the decode_mode
    window)."""
    # NB: pipe.generate.lower would lose the method binding (MethodType
    # forwards attribute access to the raw jit function) — lower on the
    # class attribute with self passed explicitly (it's a static argname)
    fl = _program_flops(bs, num_steps)
    parts = []
    gen_fl = fl.get("gen", 0.0)
    if gen_fl and per_gen_ms > 0:
        util = gen_fl / (per_gen_ms * bs * 1e-3) / (PEAK_BF16_TFLOPS * 1e12)
        parts.append(
            f"generate[bs={bs}] {100 * util:.1f}% "
            f"({gen_fl / 1e12:.2f} TF / {per_gen_ms * bs:.1f} ms)"
        )
    for n in (1, 8):
        dec_fl = fl.get(f"dec{n}", 0.0)
        if not dec_fl:
            continue
        ms = _decode_ms(pipe, params, n)
        if ms > 0:
            util = dec_fl / (ms * 1e-3) / (PEAK_BF16_TFLOPS * 1e12)
            parts.append(
                f"decode[N={n}] {100 * util:.1f}% "
                f"({dec_fl / 1e12:.2f} TF / {ms:.1f} ms)"
            )
    if parts:
        print(
            "mxu utilization (XLA cost-analysis flops / measured time / "
            f"{PEAK_TFLOPS_STR}): " + " | ".join(parts),
            file=sys.stderr,
        )


PEAK_TFLOPS_STR = f"{PEAK_BF16_TFLOPS:.0f} TF bf16 peak"


def main() -> None:
    ok, err = _tpu_ready()
    if not ok:
        _RESULT_EMITTED.set()
        _emit_error(f"TPU backend unavailable after retries: {err}")
        return
    _arm_watchdog(30 * 60)
    try:
        _run_bench()
    except Exception as e:  # mid-run relay death must still produce a line
        _RESULT_EMITTED.set()
        import traceback

        traceback.print_exc()
        _emit_error(f"bench failed: {type(e).__name__}: {e}")


def _run_bench() -> None:
    from genima_tpu.diffusion.pipeline import SDControlNetPipeline

    print(f"devices: {jax.devices()}", file=sys.stderr)
    pipe = SDControlNetPipeline()  # full SD-turbo geometry, bf16, fused attn
    key = jax.random.key(0)

    t0 = time.time()
    if "--real-init" in sys.argv:
        params = pipe.init_params(key, image_size=512, fast=True)
    else:
        # bf16 storage is the serving layout (eval agents pre-cast the same
        # way): numerically identical to f32-storage + in-apply cast, and
        # measured 80.9 -> 78.7 ms/gen (XLA fuses some converts into
        # consumers instead of hoisting). --f32-params restores round-2
        # storage for comparison.
        params = zeros_init(pipe, bf16="--f32-params" not in sys.argv)
    jax.block_until_ready(params)
    print(f"param init: {time.time() - t0:.1f}s", file=sys.stderr)

    bs = 1  # --bs=N: batched serving throughput (the headline stays bs=1)
    for a in sys.argv[1:]:
        if a.startswith("--bs="):
            bs = int(a.split("=")[1])
    embeds = jnp.zeros((bs, 77, 1024), jnp.bfloat16)
    cond = jax.random.uniform(jax.random.key(1), (bs, 512, 512, 3), jnp.float32)
    latents = pipe.init_latents(jax.random.key(2), bs, 512, 512)

    num_steps = 5
    t0 = time.time()
    img = pipe.generate(params, cond, embeds, latents, num_inference_steps=num_steps)
    img.block_until_ready()
    print(f"compile + first gen: {time.time() - t0:.1f}s", file=sys.stderr)

    per_gen_ms = measure_per_gen_ms(
        pipe, params, cond, embeds, latents, num_steps, bs
    )
    gens_per_sec = 1000.0 / per_gen_ms

    # Paper-protocol diagnostic (README.md:262 in the reference): the eval
    # protocol is num_diffusion_steps=10; the headline stays the 5-step
    # quickstart protocol the north-star is defined on.
    if "--skip-10step" not in sys.argv:
        ten_ms = measure_per_gen_ms(
            pipe, params, cond, embeds, latents, 10, bs
        )
        print(
            f"paper protocol (10-step): {ten_ms:.1f} ms/gen "
            f"({1000.0 / ten_ms:.2f} gens/s)",
            file=sys.stderr,
        )

    if "--skip-mfu" not in sys.argv:
        try:
            _report_mxu_util(
                pipe, params, cond, embeds, latents, num_steps, per_gen_ms, bs
            )
        except Exception as e:  # diagnostics must never cost the headline
            print(f"mxu utilization unavailable: {e}", file=sys.stderr)

    # ---- diagnostic: per-call latency with per-iteration readback ---------
    times = []
    feedback = jnp.zeros((), jnp.float32)
    for i in range(12):
        t0 = time.perf_counter()
        img = pipe.generate(
            params, cond, embeds, latents + feedback * 1e-9,
            num_inference_steps=num_steps,
        )
        feedback = img[0, 0, 0, 0].astype(jnp.float32)
        _ = np.asarray(feedback)
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]
    print(
        f"device throughput (in-program scan, slope): {per_gen_ms:.1f} ms/gen"
        f" | per-call p50 {p50*1000:.1f} ms (min {times[0]*1000:.1f}, "
        f"max {times[-1]*1000:.1f}; includes the relay round-trip)",
        file=sys.stderr,
    )

    _RESULT_EMITTED.set()
    print(
        json.dumps(
            {
                "metric": METRIC,
                "value": round(gens_per_sec, 3),
                "unit": "gens/sec",
                "vs_baseline": round(gens_per_sec / TARGET_GENS_PER_SEC, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
