"""END-TO-END training throughput: SD-turbo ControlNet fine-tune at 512^2
with REAL PNG loading (BASELINE benchmark config 4 — the reference's
train_controlnet_genima on rendered spheres), bs=4.

Measures three configurations over the same dataset:
  synthetic  — device-resident batch, no loading (the PERF.md ceiling)
  sync       — loader decodes between steps (the round-2 behavior)
  prefetch   — DevicePrefetcher overlaps decode + transfer with the step

Run: PYTHONPATH=/root/repo python scripts/bench_train_e2e.py [--steps=12]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

DATA = Path("/tmp/bench_rendered_512")
TASK = "bench_task"


def ensure_dataset(n_frames: int = 80) -> None:
    """Synthetic rendered-dataset tree of real 512^2 PNGs (sphere-ish blobs
    on noise so PNG entropy is realistic)."""
    from PIL import Image

    ep = DATA / TASK / "variation0" / "episodes" / "episode0"
    if (ep / "tiled_rgb" / f"{n_frames - 1}.png").exists():
        return
    rng = np.random.RandomState(0)
    (ep / "tiled_rgb").mkdir(parents=True, exist_ok=True)
    (ep / "tiled_rgb_rendered").mkdir(parents=True, exist_ok=True)
    yy, xx = np.mgrid[0:512, 0:512]
    for i in range(n_frames):
        base = rng.randint(0, 255, (512, 512, 3), np.uint8)
        Image.fromarray(base).save(ep / "tiled_rgb" / f"{i}.png")
        rendered = base.copy()
        for _ in range(8):  # colored discs ~ rendered spheres
            cy, cx, r = rng.randint(40, 472, 2).tolist() + [rng.randint(8, 24)]
            mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
            rendered[mask] = rng.randint(0, 255, 3)
        Image.fromarray(rendered).save(ep / "tiled_rgb_rendered" / f"{i}.png")
    print(f"dataset ready: {n_frames} frames under {DATA}")


def main():
    from genima_tpu.data.dataset import (
        DevicePrefetcher,
        DiffusionDataLoader,
        index_rendered_dataset,
    )
    from genima_tpu.data.tokenizer import HashTokenizer
    from genima_tpu.diffusion.pipeline import SDControlNetPipeline
    from genima_tpu.diffusion.training import ControlNetTrainer, TrainConfig

    steps = 12
    bs = 4
    for a in sys.argv[1:]:
        if a.startswith("--steps="):
            steps = int(a.split("=")[1])
        if a.startswith("--bs="):
            bs = int(a.split("=")[1])
    ensure_dataset()
    print(f"devices: {jax.devices()}  bs={bs} steps={steps}", flush=True)

    pipe = SDControlNetPipeline()
    shapes = jax.eval_shape(
        lambda: pipe.init_params(jax.random.key(0), image_size=512, fast=False)
    )
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes
    )
    trainer = ControlNetTrainer(
        pipe, TrainConfig(learning_rate=1e-5, max_grad_norm=1.0,
                          gradient_checkpointing=True)
    )

    samples = index_rendered_dataset(DATA, [TASK], num_demos=100)
    print(f"{len(samples)} samples indexed", flush=True)

    def make_loader(u8: bool):
        return DiffusionDataLoader(
            samples, HashTokenizer(), batch_size=bs, resolution=512, seed=0,
            emit_uint8=u8,
        )

    # compile both batch dtypes once
    state = trainer.create_state(params)
    warm = {False: next(iter(make_loader(False))),
            True: next(iter(make_loader(True)))}
    for u8 in (False, True):
        t0 = time.time()
        state, m = trainer.train_step(
            state, jax.device_put(warm[u8]), jax.random.key(0)
        )
        _ = float(m["loss"])
        print(f"compile (u8={u8}): {time.time() - t0:.0f}s", flush=True)

    # host-side decode cost alone
    for u8 in (False, True):
        loader = make_loader(u8)
        t0 = time.perf_counter()
        n = 0
        for b in loader:
            n += 1
            if n >= steps:
                break
        decode_ms = (time.perf_counter() - t0) / n * 1000
        print(f"decode only (u8={u8}): {decode_ms:8.1f} ms/batch", flush=True)

    results = {}

    # synthetic ceiling: chained steps on one device-resident f32 batch
    dev_batch = jax.device_put(warm[False])
    state, m = trainer.train_step(state, dev_batch, jax.random.key(0))
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = trainer.train_step(state, dev_batch, jax.random.key(i))
    _ = float(m["loss"])
    results["synthetic"] = (time.perf_counter() - t0) / steps

    def run(name: str, u8: bool, prefetch: bool):
        nonlocal state
        src = make_loader(u8)
        it = (
            DevicePrefetcher(src, put_fn=jax.device_put, depth=2)
            if prefetch
            else src
        )
        n = 0
        t0 = time.perf_counter()
        for batch in it:
            state, m = trainer.train_step(state, batch, jax.random.key(n))
            n += 1
            if n >= steps:
                break
        _ = float(m["loss"])
        results[name] = (time.perf_counter() - t0) / n

    run("sync_f32", False, False)
    run("prefetch_f32", False, True)
    run("sync_u8", True, False)
    run("prefetch_u8", True, True)

    print()
    for mode, s in results.items():
        print(
            f"{mode:>12}: {s * 1000:8.1f} ms/step | {1 / s:6.2f} steps/s | "
            f"{bs / s:6.2f} samples/s",
            flush=True,
        )
    best = min(v for k, v in results.items() if k != "synthetic")
    overhead = (best / results["synthetic"] - 1) * 100
    print(f"best loading-included vs synthetic ceiling: {overhead:+.1f}%")


if __name__ == "__main__":
    main()
