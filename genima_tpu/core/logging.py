"""Metric logging: stdout + JSONL + optional TensorBoard, wandb-gated.

The reference logs through Accelerate trackers (wandb/tensorboard) for the
diffusion trainers and RoboBase ``Logger.log_metrics`` for the controller and
eval (SURVEY.md §5). Here a single ``MetricLogger`` covers all stages:
metrics go to stdout, an append-friendly ``metrics.jsonl``, TensorBoard when
available, and wandb only if the package exists and is enabled.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any

import numpy as np


def _to_scalar(v: Any) -> Any:
    if isinstance(v, (np.generic, np.ndarray)) and np.ndim(v) == 0:
        return v.item()
    if hasattr(v, "item") and np.ndim(v) == 0:
        try:
            return v.item()
        except Exception:
            return v
    return v


class MetricLogger:
    def __init__(
        self,
        log_dir: str | Path,
        use_tb: bool = False,
        use_wandb: bool = False,
        wandb_kwargs: dict | None = None,
        main_process_only: bool = True,
    ):
        # exactly-one-writer: on multi-host runs only process 0 opens files
        # and emits metrics (the Accelerate is_main_process contract); the
        # other ranks keep a no-op logger so call sites stay unconditional
        from genima_tpu.core.distributed import is_main_process

        self._active = not main_process_only or is_main_process()
        if not self._active:
            self._jsonl = None
            self._tb = None
            self._wandb = None
            self.log_dir = Path(log_dir)
            return
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a")
        self._tb = None
        self._wandb = None
        if use_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=str(self.log_dir / "tb"))
            except Exception:
                self._tb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(dir=str(self.log_dir), **(wandb_kwargs or {}))
            except Exception:
                self._wandb = None

    def log_metrics(
        self, metrics: dict, step: int, prefix: str | None = None, echo: bool = True
    ) -> None:
        if not self._active:
            return
        scalars = {}
        for k, v in metrics.items():
            v = _to_scalar(v)
            if isinstance(v, (int, float, bool, str)):
                scalars[f"{prefix}/{k}" if prefix else k] = v
        record = {"step": int(step), "time": time.time(), **scalars}
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)
        if echo:
            parts = " | ".join(
                f"{k}: {v:.5g}" if isinstance(v, float) else f"{k}: {v}"
                for k, v in scalars.items()
            )
            print(f"[step {step}] {parts}")

    def log_images(
        self, images: dict, step: int, prefix: str | None = None
    ) -> None:
        """Log HWC uint8 images to TB / wandb (JSONL backend ignores them;
        the caller keeps PNGs on disk for that case)."""
        if not self._active:
            return
        import numpy as np

        if self._tb is not None:
            for k, v in images.items():
                self._tb.add_image(
                    f"{prefix}/{k}" if prefix else k,
                    np.asarray(v),
                    step,
                    dataformats="HWC",
                )
        if self._wandb is not None:
            self._wandb.log(
                {
                    (f"{prefix}/{k}" if prefix else k): self._wandb.Image(
                        np.asarray(v)
                    )
                    for k, v in images.items()
                },
                step=step,
            )

    def close(self) -> None:
        if not self._active:
            return
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()


class Timer:
    """Wall-clock timing for gen_time/control_time-style metrics
    (reference ``eval_genima.py:202-211,242-249``). Use ``block_until_ready``
    on outputs before ``stop`` for accurate device timings."""

    def __init__(self):
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        assert self._t0 is not None
        dt = time.perf_counter() - self._t0
        self._t0 = None
        return dt
