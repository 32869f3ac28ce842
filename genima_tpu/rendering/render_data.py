"""Dataset builder: draw future joint positions onto RLBench episodes.

Rebuilds the reference's ``render/render_data.py``: for each episode and
timestep, render the gripper + joints 1/3/5 at t+action_horizon as striped
spheres per camera, composite onto the original RGB (*rgb_rendered* set) and
onto random textures with alpha blending (*rnd_bg* set), and write the 2x2
``tiled_rgb`` / ``tiled_rgb_rendered`` images from the 4 non-overhead
cameras. Output tree mirrors the input dataset minus depth/mask dirs
(``render_data.py:369-395``); the config is snapshotted into the generated
dataset (``render_data.py:146-150``).

TPU-first: the sphere rasterization + compositing for a whole episode x
camera batch runs as one jitted, vmapped XLA program; hosts do IO only.
Parallelism over episodes is a thread pool (IO-bound) rather than the
reference's process pool.
"""

from __future__ import annotations

import os
import pickle
import shutil
from concurrent.futures import ThreadPoolExecutor
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from genima_tpu.rendering.compositor import (
    composite_rgb_rendered,
    composite_rnd_bg,
)
from genima_tpu.rendering.spheres import render_spheres, sphere_params_for_timestep

NON_OVERHEAD = ("wrist", "front", "right_shoulder", "left_shoulder")


def _get(obs, attr: str):
    """Attribute or dict access (RLBench Observation objects vs plain dicts)."""
    if isinstance(obs, dict):
        return obs[attr]
    return getattr(obs, attr)


@partial(jax.jit, static_argnames=("height", "width"))
def _render_batch(
    intrinsics, cam_poses, centers, rotations, radii, stripes, factors,
    rgbs, textures, blends, height: int, width: int,
):
    """vmapped over the timestep axis: returns (rendered, rnd_bg) uint8."""

    def one(intr, pose, c, r, rad, s, f, rgb, tex, blend):
        img, mask = render_spheres(
            intr, pose, c, r, rad, s, f, height, width
        )
        full = composite_rgb_rendered(img, mask, rgb)
        rnd = composite_rnd_bg(img, mask, tex, blend)
        return full, rnd

    full, rnd = jax.vmap(one)(
        intrinsics, cam_poses, centers, rotations, radii, stripes, factors,
        rgbs, textures, blends,
    )
    to_u8 = lambda x: jnp.round(jnp.clip(x, 0, 1) * 255).astype(jnp.uint8)  # noqa: E731
    return to_u8(full), to_u8(rnd)


class RenderData:
    def __init__(self, cfg):
        self.cfg = cfg
        textures_path = cfg.get("textures_path")
        self._texture_files = (
            sorted(
                os.path.join(textures_path, f) for f in os.listdir(textures_path)
            )
            if textures_path and os.path.isdir(textures_path)
            else []
        )
        self._iw, self._ih = cfg["image_width"], cfg["image_height"]

        dataset_root = os.path.abspath(cfg["dataset_root"]).rstrip("/")
        name = os.path.basename(dataset_root)
        parent = cfg.get("save_path") or os.path.dirname(dataset_root)
        self.full_ctx_path = Path(parent) / f"{name}_rgb_rendered"
        self.rnd_ctx_path = Path(parent) / f"{name}_rnd_bg"
        self.dataset_root = Path(dataset_root)

        draw = cfg.get("draw", {"rgb_rendered": True, "rnd_bg": True})
        self.draw_full = draw.get("rgb_rendered", True)
        self.draw_rnd = draw.get("rnd_bg", True)
        for enabled, dst in (
            (self.draw_full, self.full_ctx_path),
            (self.draw_rnd, self.rnd_ctx_path),
        ):
            if enabled:
                self._copy_source_tree(
                    self.dataset_root / cfg["task"], dst / cfg["task"]
                )
                self._save_config(dst)

    def _save_config(self, dst: Path) -> None:
        from genima_tpu.core.config import save_yaml

        save_yaml(dict(self.cfg), dst / "render_data_config.yaml")

    @staticmethod
    def _copy_source_tree(src: Path, dst: Path) -> None:
        """Copy the dataset minus depth/mask/point-cloud dirs
        (reference ``render_data.py:369-395``)."""
        if not src.exists():
            raise FileNotFoundError(src)

        def ignore(dirname, names):
            return [
                n
                for n in names
                if any(tag in n for tag in ("_depth", "_mask", "_point_cloud"))
            ]

        shutil.copytree(src, dst, ignore=ignore, dirs_exist_ok=True)

    def _episode_dir(self, root: Path, episode: int) -> Path:
        var = self.cfg.get("variation", 0)
        var_dir = f"variation{var}" if var != -1 else "all_variations"
        return root / self.cfg["task"] / var_dir / "episodes" / f"episode{episode}"

    def render_demo(self, episode: int) -> None:
        cfg = self.cfg
        cameras = list(cfg["cameras"])
        camera_scales = list(cfg["camera_scales"])
        horizon = cfg.get("action_horizon", 20)
        radius = cfg.get("render", {}).get("sphere", {}).get("radius", 0.01)
        joints_cfg = cfg.get("render", {}).get("joints", {})
        alpha = cfg.get("alpha_blend", 0.7)
        rng = np.random.RandomState(cfg.get("seed", 0) + episode)

        src_ep = self._episode_dir(self.dataset_root, episode)
        with open(src_ep / "low_dim_obs.pkl", "rb") as f:
            low_dim_obs = pickle.load(f)
        T = len(low_dim_obs)

        rgb_imgs = {
            cam: [
                np.asarray(
                    Image.open(src_ep / f"{cam}_rgb" / f"{i}.png").convert("RGB")
                )
                for i in range(T)
            ]
            for cam in cameras
        }

        if self.draw_full:
            full_ep = self._episode_dir(self.full_ctx_path, episode)
            (full_ep / "tiled_rgb").mkdir(parents=True, exist_ok=True)
            (full_ep / "tiled_rgb_rendered").mkdir(parents=True, exist_ok=True)
        if self.draw_rnd:
            rnd_ep = self._episode_dir(self.rnd_ctx_path, episode)

        for c_idx, camera in enumerate(cameras):
            joints = list(joints_cfg.get(camera, []))
            n_spheres = 1 + len(joints)
            batches = {
                k: []
                for k in (
                    "intr", "pose", "centers", "rots", "radii", "stripes",
                    "factors", "rgb", "tex", "blend",
                )
            }
            for ts in range(T - 1):
                obs_now = low_dim_obs[ts]
                # lookahead target: obs at min(ts+1+horizon, T-1) - 1
                # (reference render_data.py:235-243); at ts == T-2 the range
                # is empty and NO spheres are drawn
                target_idx = min(ts + 1 + horizon, T - 1) - 1
                no_spheres = target_idx <= ts
                obs_t = low_dim_obs[max(target_idx, ts)]
                misc = _get(obs_now, "misc")
                sp = sphere_params_for_timestep(
                    np.asarray(_get(obs_t, "gripper_matrix")),
                    float(_get(obs_t, "gripper_open")),
                    _get(obs_t, "misc")["joint_poses"],
                    joints,
                    radius,
                    camera_scales[c_idx],
                )
                if no_spheres:
                    sp["radii"] = np.zeros_like(sp["radii"])
                batches["intr"].append(
                    np.asarray(misc[f"{camera}_camera_intrinsics"], np.float32)
                )
                batches["pose"].append(
                    np.asarray(misc[f"{camera}_camera_extrinsics"], np.float32)
                )
                batches["centers"].append(sp["centers"])
                batches["rots"].append(sp["rotations"])
                batches["radii"].append(sp["radii"])
                batches["stripes"].append(sp["stripe_colors"])
                batches["factors"].append(sp["base_factors"])
                batches["rgb"].append(
                    rgb_imgs[camera][ts].astype(np.float32) / 255.0
                )
                if self._texture_files:
                    tex = Image.open(rng.choice(self._texture_files)).convert(
                        "RGB"
                    ).resize((self._iw, self._ih))
                    tex = np.asarray(tex, np.float32) / 255.0
                else:
                    tex = np.broadcast_to(
                        rng.uniform(0, 1, 3).astype(np.float32),
                        (self._ih, self._iw, 3),
                    ).copy()
                batches["tex"].append(tex)
                batches["blend"].append(np.float32(rng.uniform(alpha, 1.0)))

            del n_spheres
            stacked = {k: np.stack(v) for k, v in batches.items()}
            full_u8, rnd_u8 = _render_batch(
                stacked["intr"], stacked["pose"], stacked["centers"],
                stacked["rots"], stacked["radii"], stacked["stripes"],
                stacked["factors"], stacked["rgb"], stacked["tex"],
                stacked["blend"], self._ih, self._iw,
            )
            full_u8, rnd_u8 = np.asarray(full_u8), np.asarray(rnd_u8)

            for ts in range(T - 1):
                if self.draw_full:
                    out = full_ep / f"{camera}_rgb"
                    out.mkdir(parents=True, exist_ok=True)
                    Image.fromarray(full_u8[ts]).save(out / f"{ts}.png")
                if self.draw_rnd:
                    out = rnd_ep / f"{camera}_rgb"
                    out.mkdir(parents=True, exist_ok=True)
                    Image.fromarray(rnd_u8[ts]).save(out / f"{ts}.png")

        # tiled images from the 4 non-overhead cameras (render_data.py:313-323)
        if self.draw_full:
            tiled_cams = [c for c in cameras if "overhead" not in c][:4]
            for ts in range(T - 1):
                raw = np.stack([rgb_imgs[c][ts] for c in tiled_cams])
                rendered = np.stack(
                    [
                        np.asarray(
                            Image.open(
                                full_ep / f"{c}_rgb" / f"{ts}.png"
                            ).convert("RGB")
                        )
                        for c in tiled_cams
                    ]
                )
                from genima_tpu.data.tiling import tile_images

                Image.fromarray(np.asarray(tile_images(raw))).save(
                    full_ep / "tiled_rgb" / f"{ts}.png"
                )
                Image.fromarray(np.asarray(tile_images(rendered))).save(
                    full_ep / "tiled_rgb_rendered" / f"{ts}.png"
                )

    def generate(self) -> None:
        episodes = range(
            self.cfg.get("episode_offset", 0), self.cfg.get("episodes", 1)
        )
        num_workers = self.cfg.get("num_processes", 1)
        if num_workers <= 1:
            for ep in episodes:
                self.render_demo(ep)
        else:
            with ThreadPoolExecutor(max_workers=num_workers) as pool:
                list(pool.map(self.render_demo, episodes))
