"""Checkpointing with the reference's two on-disk contracts.

1. *Diffusion trainers* (reference ``diffusion/train_controlnet_genima.py``):
   ``checkpoint-<global_step>/`` directories under the output dir, with a
   retention limit enforced *before* each save (``:1416-1457``), resume from
   ``latest`` by scanning step numbers (``:1281-1304``), and the trained
   submodel stored in its own subdirectory (``controlnet/``; custom hooks at
   ``:1074-1105``). A final save lands at the output root (``:1483-1486``).
   Inference discovers ``checkpoint-*/controlnet`` by natural-sorting
   (``controller/agent/sd_controlnet_agent.py:19-29``).

2. *Controller trainer* (reference ``controller/train_act.py:233-279``):
   ``latest.ckpt`` rotated to ``<epoch>.ckpt`` every ``checkpoint_every``
   epochs keeping ``num_checkpoints``; payload = config + epoch + iteration
   count + agent parameters (CLIP weights excluded); ``config.yaml`` saved
   alongside and re-read at eval. Eval selects latest / last_three / last /
   a specific step (``controller/eval_genima.py:355-376``).

Parameters are serialized with flax msgpack (host-side, atomic via tempfile
rename) — the preemption-resume story on TPU is exactly this checkpoint
contract plus ``resume latest``.
"""

from __future__ import annotations

import json
import re
import shutil
import tempfile
from pathlib import Path
from typing import Any

import jax
import numpy as np
from flax import serialization


# ---------------------------------------------------------------------------
# low-level pytree (de)serialization
# ---------------------------------------------------------------------------


def save_pytree(tree: Any, path: str | Path) -> None:
    """Atomically write a pytree of arrays as msgpack."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    host_tree = jax.tree_util.tree_map(np.asarray, tree)
    data = serialization.to_bytes(host_tree)
    with tempfile.NamedTemporaryFile(dir=path.parent, delete=False) as tmp:
        tmp.write(data)
        tmp_path = tmp.name
    Path(tmp_path).replace(path)


def load_pytree(path: str | Path, target: Any | None = None) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


class AsyncCheckpointer:
    """Orbax-style async checkpointing: the device->host transfer,
    serialization, and atomic rename run on ONE background thread,
    overlapping the next training steps (the reference's Accelerate
    ``save_state`` blocks the step loop for the full write).

    At most one save is in flight: a new ``submit`` first waits for the
    previous write (bounding host memory to one extra params copy) and
    re-raises its errors loudly. Trees whose buffers are DONATED to the
    next jitted step (train states with ``donate_argnums``) must be
    passed through ``snapshot()`` first — the on-device copy is ordered
    before the donating execution and is never itself donated. All
    checkpoint-dir filesystem ops (including retention pruning inside the
    save functions) go through the same single worker, so on-disk ordering
    matches submission order. Call ``wait()`` before reading checkpoints
    and at train end.
    """

    def __init__(self) -> None:
        from concurrent.futures import ThreadPoolExecutor

        self._executor = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-writer"
        )
        self._pending = None

    def submit(self, fn, /, *args, **kwargs) -> None:
        self.wait()
        self._pending = self._executor.submit(fn, *args, **kwargs)

    def wait(self) -> None:
        if self._pending is not None:
            try:
                self._pending.result()
            finally:
                self._pending = None


def snapshot(tree: Any) -> Any:
    """On-device copy of a pytree, safe to hand to ``AsyncCheckpointer``
    when the original buffers will be donated to the next train step (the
    copy reads the buffer before the donating execution consumes it)."""
    return jax.tree_util.tree_map(
        lambda x: x.copy() if hasattr(x, "copy") else x, tree
    )


# ---------------------------------------------------------------------------
# contract 1: step checkpoints (diffusion trainers)
# ---------------------------------------------------------------------------

_STEP_DIR_RE = re.compile(r"^checkpoint-(\d+)$")


def list_step_checkpoints(output_dir: str | Path) -> list[tuple[int, Path]]:
    """All ``checkpoint-<step>`` dirs sorted by step (natsort equivalent)."""
    output_dir = Path(output_dir)
    found = []
    if output_dir.is_dir():
        for child in output_dir.iterdir():
            m = _STEP_DIR_RE.match(child.name)
            if m and child.is_dir():
                found.append((int(m.group(1)), child))
    return sorted(found)


def latest_step_checkpoint(output_dir: str | Path) -> Path | None:
    ckpts = list_step_checkpoints(output_dir)
    return ckpts[-1][1] if ckpts else None


def save_step_checkpoint(
    output_dir: str | Path,
    step: int,
    *,
    model_params: Any,
    model_subdir: str = "controlnet",
    train_state: Any | None = None,
    metadata: dict | None = None,
    total_limit: int | None = None,
    extra: dict | None = None,
) -> Path:
    """Save ``checkpoint-<step>/`` with pre-save retention pruning.

    ``extra`` maps names to additional pytrees saved as ``<name>.msgpack``
    in the checkpoint dir (e.g. EMA params for the pix2pix trainer).

    Multi-host: only process 0 writes (params/opt-state are replicated
    across hosts in the DP design, so one copy is the checkpoint — the
    Accelerate ``save_state``-on-main-process contract). Non-main ranks
    return the would-be path without touching disk.
    """
    output_dir = Path(output_dir)
    from genima_tpu.core.distributed import is_main_process

    if not is_main_process():
        return output_dir / f"checkpoint-{step}"
    if total_limit is not None:
        existing = list_step_checkpoints(output_dir)
        # keep at most total_limit-1 before writing the new one
        excess = len(existing) - (total_limit - 1)
        for _, old in existing[:max(excess, 0)]:
            shutil.rmtree(old)
    ckpt_dir = output_dir / f"checkpoint-{step}"
    save_pytree(model_params, ckpt_dir / model_subdir / "params.msgpack")
    if train_state is not None:
        save_pytree(train_state, ckpt_dir / "train_state.msgpack")
    for name, tree in (extra or {}).items():
        save_pytree(tree, ckpt_dir / f"{name}.msgpack")
    meta = dict(metadata or {})
    meta["step"] = step
    with open(ckpt_dir / "metadata.json", "w") as f:
        json.dump(meta, f, indent=2)
    return ckpt_dir


def save_final_model(
    output_dir: str | Path,
    model_params: Any,
    model_subdir: str | None = None,
    config: dict | None = None,
) -> Path:
    """Final ``save_pretrained``-style save at the output root (process 0
    only on multi-host runs)."""
    output_dir = Path(output_dir)
    target = output_dir / model_subdir if model_subdir else output_dir
    from genima_tpu.core.distributed import is_main_process

    if not is_main_process():
        return target
    save_pytree(model_params, target / "params.msgpack")
    if config is not None:
        with open(target / "config.json", "w") as f:
            json.dump(config, f, indent=2)
    return target


def find_model_checkpoint(
    ckpt_path: str | Path, model_subdir: str = "controlnet"
) -> Path:
    """Resolve a checkpoint path like the reference's inference agents.

    Accepts an output dir containing ``checkpoint-*`` subdirs (picks the
    latest), a specific ``checkpoint-<step>`` dir, or a final model dir.
    """
    ckpt_path = Path(ckpt_path)
    latest = latest_step_checkpoint(ckpt_path)
    if latest is not None:
        ckpt_path = latest
    for candidate in (
        ckpt_path / model_subdir / "params.msgpack",
        ckpt_path / "params.msgpack",
    ):
        if candidate.exists():
            return candidate.parent
    raise FileNotFoundError(f"No {model_subdir} checkpoint under {ckpt_path}")


# ---------------------------------------------------------------------------
# contract 2: epoch checkpoints (controller trainer)
# ---------------------------------------------------------------------------

LATEST_NAME = "latest.ckpt"
_EPOCH_CKPT_RE = re.compile(r"^(\d+)\.ckpt$")


def list_epoch_checkpoints(ckpt_dir: str | Path) -> list[tuple[int, Path]]:
    ckpt_dir = Path(ckpt_dir)
    found = []
    if ckpt_dir.is_dir():
        for child in ckpt_dir.iterdir():
            m = _EPOCH_CKPT_RE.match(child.name)
            if m:
                found.append((int(m.group(1)), child))
    return sorted(found)


def save_epoch_checkpoint(
    ckpt_dir: str | Path,
    *,
    epoch: int,
    num_iters: int,
    agent_params: Any,
    config: dict | None = None,
    num_checkpoints: int = 3,
) -> Path:
    """Rotate ``latest.ckpt`` -> ``<epoch>.ckpt``, save new latest, prune.
    Process 0 only on multi-host runs (one writer, replicated params)."""
    ckpt_dir = Path(ckpt_dir)
    from genima_tpu.core.distributed import is_main_process

    if not is_main_process():
        return ckpt_dir / LATEST_NAME
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    latest = ckpt_dir / LATEST_NAME
    if latest.exists():
        prev = load_pytree(latest)
        prev_epoch = int(prev.get("epoch", -1))
        if prev_epoch >= 0:
            shutil.move(str(latest), str(ckpt_dir / f"{prev_epoch}.ckpt"))
    payload = {
        "epoch": int(epoch),
        "num_iters": int(num_iters),
        "agent": jax.tree_util.tree_map(np.asarray, agent_params),
    }
    if config is not None:
        payload["config_json"] = np.frombuffer(
            json.dumps(config).encode("utf-8"), dtype=np.uint8
        )
    save_pytree(payload, latest)
    # retention: keep num_checkpoints rotated files
    rotated = list_epoch_checkpoints(ckpt_dir)
    for _, old in rotated[: max(len(rotated) - num_checkpoints, 0)]:
        old.unlink()
    return latest


def load_epoch_checkpoint(path: str | Path) -> dict:
    payload = load_pytree(path)
    if "config_json" in payload:
        payload["config"] = json.loads(
            np.asarray(payload["config_json"]).tobytes().decode("utf-8")
        )
    return payload


def select_eval_checkpoints(ckpt_dir: str | Path, eval_type: str) -> list[str]:
    """Checkpoint filenames to evaluate (reference ``eval_genima.py:355-376``).

    ``latest`` -> [latest.ckpt]; ``last`` -> newest rotated; ``last_three`` ->
    newest three rotated (paper protocol); an integer string -> that epoch.
    """
    ckpt_dir = Path(ckpt_dir)
    rotated = [p.name for _, p in list_epoch_checkpoints(ckpt_dir)]
    if eval_type == "latest":
        return [LATEST_NAME]
    if eval_type == "last":
        if not rotated:
            raise FileNotFoundError(f"No rotated checkpoints in {ckpt_dir}")
        return [rotated[-1]]
    if eval_type == "last_three":
        if not rotated:
            raise FileNotFoundError(f"No rotated checkpoints in {ckpt_dir}")
        return rotated[-3:]
    if eval_type.isdigit():
        name = f"{int(eval_type)}.ckpt"
        if not (ckpt_dir / name).exists():
            raise FileNotFoundError(f"{name} not found in {ckpt_dir}")
        return [name]
    raise ValueError(f"Unknown eval_type: {eval_type}")
