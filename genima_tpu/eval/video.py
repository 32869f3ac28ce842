"""MP4 episode recording (RoboBase VideoRecorder equivalent;
reference ``eval_genima.py:309-317``: files named
``<task>_ep<N>_{succ,fail}.mp4``)."""

from __future__ import annotations

from pathlib import Path

import numpy as np


def frame_from_env(env) -> np.ndarray | None:
    """Best-effort uint8 HWC frame from an env: ``render_frame()`` when
    available, else the first ``*_rgb`` camera of the base observation.
    The ONE definition shared by the host recorder and SubprocessEnv
    children (a ``None`` result means no frame — callers must guard)."""
    base = getattr(env, "unwrapped", env)
    if hasattr(base, "render_frame"):
        frame = base.render_frame()
        return None if frame is None else np.asarray(frame, np.uint8)
    if hasattr(base, "_obs"):
        obs = base._obs()
        cams = [k for k in obs if k.endswith("_rgb")]
        if cams:
            return np.transpose(obs[cams[0]], (1, 2, 0)).astype(np.uint8)
    return None


class VideoRecorder:
    def __init__(self, save_dir: str | Path, fps: int = 30):
        self.save_dir = Path(save_dir)
        self.fps = fps
        self.frames: list[np.ndarray] = []
        self.enabled = False

    def init(self, env=None, enabled: bool = True) -> None:
        self.frames = []
        self.enabled = enabled
        if enabled:
            self.record(env)

    def record(self, env) -> None:
        if not self.enabled or env is None:
            return
        frame = frame_from_env(env)
        if frame is not None:
            self.frames.append(np.asarray(frame, np.uint8))

    def save(self, file_name: str) -> Path | None:
        if not self.enabled or not self.frames:
            return None
        self.save_dir.mkdir(parents=True, exist_ok=True)
        path = self.save_dir / file_name
        try:
            import imageio

            imageio.mimsave(str(path), self.frames, fps=self.fps)
        except Exception:
            # fall back to an npz stack when no mp4 codec is available
            path = path.with_suffix(".npz")
            np.savez_compressed(path, frames=np.stack(self.frames))
        return path
