import pickle

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.fast

from genima_tpu.rendering import (
    SPHERE_BASE_FACTORS,
    STRIPE_COLORS,
    composite_rgb_rendered,
    composite_rnd_bg,
    render_spheres,
    sphere_params_for_timestep,
)


def _identity_cam(size=64, f=100.0):
    intr = np.array([[f, 0, size / 2], [0, f, size / 2], [0, 0, 1]], np.float32)
    pose = np.eye(4, dtype=np.float32)  # camera at origin, +Z forward
    return intr, pose


def _single_sphere(center, radius, color="cyan", factor="open"):
    return (
        np.array([center], np.float32),
        np.eye(3, dtype=np.float32)[None],
        np.array([radius], np.float32),
        np.array([STRIPE_COLORS[color]]),
        np.array([SPHERE_BASE_FACTORS[factor]]),
    )


def test_sphere_projects_at_center():
    intr, pose = _identity_cam()
    c, r, rad, s, f = _single_sphere([0.0, 0.0, 1.0], 0.1)
    img, mask = render_spheres(intr, pose, c, r, rad, s, f, 64, 64)
    mask = np.asarray(mask)
    assert mask[32, 32]  # center pixel hit
    # projected radius ~ f * r / z = 10 px
    ys, xs = np.where(mask)
    assert 8 <= (xs.max() - xs.min()) / 2 <= 12
    # off-sphere pixels are white
    img = np.asarray(img)
    np.testing.assert_allclose(img[0, 0], 1.0)


def test_sphere_offset_projection():
    intr, pose = _identity_cam()
    # world point (0.1, 0, 1) -> u = f*0.1/1 + cx = 42
    c, r, rad, s, f = _single_sphere([0.1, 0.0, 1.0], 0.05)
    _, mask = render_spheres(intr, pose, c, r, rad, s, f, 64, 64)
    ys, xs = np.where(np.asarray(mask))
    assert abs(xs.mean() - 42) < 1.5
    assert abs(ys.mean() - 32) < 1.5


def test_occlusion_nearest_wins():
    intr, pose = _identity_cam()
    centers = np.array([[0, 0, 1.0], [0, 0, 2.0]], np.float32)
    rots = np.stack([np.eye(3)] * 2).astype(np.float32)
    radii = np.array([0.1, 0.3], np.float32)
    stripes = np.stack([STRIPE_COLORS["red"], STRIPE_COLORS["green"]])
    factors = np.stack([SPHERE_BASE_FACTORS["open"]] * 2)
    img, mask = render_spheres(
        intr, pose, centers, rots, radii, stripes, factors, 64, 64
    )
    img = np.asarray(img)
    # center pixel: near sphere (red-ish, factor-scaled) not green
    center_px = img[32, 32]
    assert center_px[0] > center_px[1] or np.allclose(center_px, 0)  # red or black stripe


def test_stripes_present():
    intr, pose = _identity_cam(size=128)
    c, r, rad, s, f = _single_sphere([0, 0, 0.5], 0.2, "cyan")
    img, mask = render_spheres(intr, pose, c, r, rad, s, f, 128, 128)
    img, mask = np.asarray(img), np.asarray(mask)
    on_sphere = img[mask]
    # both colored and black stripe pixels exist
    bright = on_sphere.max(-1) > 0.3
    dark = on_sphere.max(-1) < 0.1
    assert bright.any() and dark.any()


def test_camera_pose_transform():
    """Camera translated +X sees the sphere shifted the opposite way."""
    intr, pose = _identity_cam()
    pose2 = pose.copy()
    pose2[0, 3] = 0.1  # camera moves +x -> sphere appears at -x
    c, r, rad, s, f = _single_sphere([0.0, 0.0, 1.0], 0.05)
    _, m1 = render_spheres(intr, pose, c, r, rad, s, f, 64, 64)
    _, m2 = render_spheres(intr, pose2, c, r, rad, s, f, 64, 64)
    x1 = np.where(np.asarray(m1))[1].mean()
    x2 = np.where(np.asarray(m2))[1].mean()
    assert x2 < x1 - 5


def test_zero_radius_renders_nothing():
    intr, pose = _identity_cam()
    c, r, rad, s, f = _single_sphere([0, 0, 1.0], 0.0)
    _, mask = render_spheres(intr, pose, c, r, rad, s, f, 64, 64)
    assert not np.asarray(mask).any()


def test_compositing():
    import jax.numpy as jnp

    render = jnp.ones((4, 4, 3)) * 0.5
    mask = jnp.zeros((4, 4), bool).at[0, 0].set(True)
    rgb = jnp.zeros((4, 4, 3))
    out = np.asarray(composite_rgb_rendered(render, mask, rgb))
    assert out[0, 0, 0] == 0.5 and out[1, 1, 0] == 0.0

    tex = jnp.ones((4, 4, 3)) * 0.2
    out2 = np.asarray(composite_rnd_bg(render, mask, tex, jnp.float32(0.75)))
    np.testing.assert_allclose(out2[0, 0, 0], 0.75 * 0.5 + 0.25 * 0.2, rtol=1e-5)
    np.testing.assert_allclose(out2[1, 1, 0], 0.2, rtol=1e-5)


def test_sphere_params_colors():
    jp = {1: np.array([0.1, 0, 0, 0, 0, 0, 1.0]),
          3: np.array([0.2, 0, 0, 0, 0, 0, 1.0]),
          5: np.array([0.3, 0, 0, 0, 0, 0, 1.0])}
    sp = sphere_params_for_timestep(
        np.eye(4), gripper_open=1.0, joint_poses=jp, joints_to_render=[1, 3, 5],
        radius=0.01, camera_scale=3.0,
    )
    assert sp["centers"].shape == (4, 3)
    np.testing.assert_allclose(sp["radii"], 0.03)
    np.testing.assert_allclose(sp["stripe_colors"][0], STRIPE_COLORS["cyan"])
    np.testing.assert_allclose(sp["stripe_colors"][1], STRIPE_COLORS["red"])
    # closed gripper -> yellow stripes + yellow base factor
    sp2 = sphere_params_for_timestep(
        np.eye(4), gripper_open=0.0, joint_poses=jp, joints_to_render=[],
        radius=0.01, camera_scale=1.0,
    )
    np.testing.assert_allclose(sp2["stripe_colors"][0], STRIPE_COLORS["yellow"])
    np.testing.assert_allclose(sp2["base_factors"][0], SPHERE_BASE_FACTORS["closed"])


# ---------------------------------------------------------------------------
# dataset builder end-to-end on a synthetic episode tree
# ---------------------------------------------------------------------------


def _make_synthetic_dataset(root, task="toy_task", episodes=1, T=6, size=32):
    cams = ["wrist", "front", "right_shoulder", "left_shoulder"]
    intr = np.array(
        [[40.0, 0, size / 2], [0, 40.0, size / 2], [0, 0, 1]], np.float32
    )
    for ep in range(episodes):
        ep_dir = root / task / "variation0" / "episodes" / f"episode{ep}"
        low_dim = []
        for t in range(T):
            gm = np.eye(4)
            gm[:3, 3] = [0.02 * t, 0.0, 0.5]
            obs = {
                "gripper_matrix": gm,
                "gripper_open": 1.0,
                "misc": {
                    "joint_poses": {
                        j: np.array([0.01 * j, 0.02 * t, 0.4, 0, 0, 0, 1.0])
                        for j in (1, 3, 5)
                    },
                },
            }
            for cam in cams:
                pose = np.eye(4)
                pose[:3, 3] = [0, 0, 0]
                obs["misc"][f"{cam}_camera_intrinsics"] = intr
                obs["misc"][f"{cam}_camera_extrinsics"] = pose
            low_dim.append(obs)
            for cam in cams:
                d = ep_dir / f"{cam}_rgb"
                d.mkdir(parents=True, exist_ok=True)
                Image.fromarray(
                    np.full((size, size, 3), 100 + t, np.uint8)
                ).save(d / f"{t}.png")
        ep_dir.mkdir(parents=True, exist_ok=True)
        with open(ep_dir / "low_dim_obs.pkl", "wb") as f:
            pickle.dump(low_dim, f)
    return cams


def test_render_data_end_to_end(tmp_path):
    from genima_tpu.rendering.render_data import RenderData

    src = tmp_path / "rlbench_data"
    cams = _make_synthetic_dataset(src, T=6, size=32)
    cfg = {
        "dataset_root": str(src),
        "save_path": str(tmp_path),
        "task": "toy_task",
        "variation": 0,
        "episodes": 1,
        "episode_offset": 0,
        "num_processes": 1,
        "image_width": 32,
        "image_height": 32,
        "action_horizon": 3,
        "alpha_blend": 0.7,
        "cameras": cams,
        "camera_scales": [3.0, 8.0, 6.5, 6.5],
        "render": {"sphere": {"radius": 0.01},
                   "joints": {c: [1, 3, 5] for c in cams}},
        "draw": {"rgb_rendered": True, "rnd_bg": True},
        "seed": 0,
    }
    rd = RenderData(cfg)
    rd.generate()

    full = tmp_path / "rlbench_data_rgb_rendered" / "toy_task" / "variation0" / (
        "episodes"
    ) / "episode0"
    rnd = tmp_path / "rlbench_data_rnd_bg" / "toy_task" / "variation0" / (
        "episodes"
    ) / "episode0"
    # per-camera rendered frames for T-1 timesteps
    for cam in cams:
        assert len(list((full / f"{cam}_rgb").glob("*.png"))) >= 5
        assert len(list((rnd / f"{cam}_rgb").glob("*.png"))) >= 5
    # tiled outputs at 2x resolution
    tiled = Image.open(full / "tiled_rgb_rendered" / "0.png")
    assert tiled.size == (64, 64)
    # config snapshot exists
    assert (
        tmp_path / "rlbench_data_rgb_rendered" / "render_data_config.yaml"
    ).exists()
    # rendered image differs from the original (spheres drawn)
    orig = np.asarray(Image.open(src / "toy_task" / "variation0" / "episodes" /
                                 "episode0" / "wrist_rgb" / "0.png"))
    out = np.asarray(Image.open(full / "wrist_rgb" / "0.png"))
    assert (orig != out).any()
    # last timestep (T-2): no spheres -> identical to original
    orig4 = np.asarray(Image.open(src / "toy_task" / "variation0" / "episodes" /
                                  "episode0" / "wrist_rgb" / "4.png"))
    out4 = np.asarray(Image.open(full / "wrist_rgb" / "4.png"))
    np.testing.assert_array_equal(orig4, out4)
