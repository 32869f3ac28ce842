"""Analytic sphere rendering as vectorized XLA image ops.

Replaces the reference's pyrender/EGL offscreen renderer
(``render/joint_marker.py``) with exact ray-traced spheres — jit/vmap-able
over (timestep, camera) so dataset generation runs on accelerator batches
instead of one OpenGL draw per frame.

Faithful to the reference's look (the diffusion agent was *trained* on it):

* 4 spheres per frame: the gripper at t+action_horizon (cyan stripes if
  ``gripper_open > 0.1`` else yellow; ``joint_marker.py:129-133``) and
  joints 1/3/5 (red/green/purple stripes; ``render_data.py:15-19``,
  joints rendered with open=1.0 so they get the cyan baseColorFactor).
* FLAT shading: color = stripe texture x baseColorFactor, no lighting
  (``joint_marker.py:178-180``); stripes are vertical bands (24 px color /
  24 px black over a 256 px texture) mapped from the sphere's *local* x
  coordinate (the planar UV in ``joint_marker.py:151-160``).
* Camera model: RLBench extrinsics are camera-to-world in the CV convention
  (+Z forward); pyrender converts with a -180deg X flip
  (``joint_marker.py:101-117``) — ray tracing works directly in the CV
  convention, which is the same geometry.
* White background; per-camera sphere scale multiplies the base radius
  (``joint_marker.py:51-59``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# stripe colors measured from the reference textures (render/sphere_textures)
STRIPE_COLORS = {
    "cyan": np.array([8, 239, 235], np.float32) / 255.0,
    "red": np.array([255, 0, 0], np.float32) / 255.0,
    "green": np.array([71, 240, 62], np.float32) / 255.0,
    "purple": np.array([218, 120, 240], np.float32) / 255.0,
    "yellow": np.array([255, 255, 0], np.float32) / 255.0,
}

# baseColorFactor (joint_marker.py:168-173): cyan-ish when open, yellow when
# closed; multiplies the texture sample
SPHERE_BASE_FACTORS = {
    "open": np.array([0.60392156862, 0.86274509803, 1.0], np.float32),
    "closed": np.array([1.0, 1.0, 0.0], np.float32),
}

JOINT_COLOR_MAP = {1: "red", 3: "green", 5: "purple"}  # render_data.py:15-19

# texture geometry: 256-px wide, stripe period 48 px, color band 24 px
_TEX_W = 256.0
_STRIPE_PERIOD = 48.0
_STRIPE_ON = 24.0


def render_spheres(
    intrinsics: jax.Array,  # (3, 3)
    cam_pose: jax.Array,  # (4, 4) camera-to-world, RLBench CV convention
    centers: jax.Array,  # (S, 3) world positions
    rotations: jax.Array,  # (S, 3, 3) world-from-local sphere rotations
    radii: jax.Array,  # (S,)
    stripe_colors: jax.Array,  # (S, 3) in [0, 1]
    base_factors: jax.Array,  # (S, 3)
    height: int,
    width: int,
) -> tuple[jax.Array, jax.Array]:
    """Returns (image (H, W, 3) float [0,1] with white bg, hit_mask (H, W))."""
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]

    r_wc = cam_pose[:3, :3]
    origin = cam_pose[:3, 3]

    # per-pixel rays in the camera frame (+Z forward), then to world
    v, u = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32) + 0.5,
        jnp.arange(width, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    dirs_cam = jnp.stack(
        [(u - cx) / fx, (v - cy) / fy, jnp.ones_like(u)], axis=-1
    )  # (H, W, 3)
    dirs = dirs_cam @ r_wc.T  # (H, W, 3) world

    # ray-sphere intersection per sphere: |o + t d - c|^2 = r^2
    oc = origin[None, :] - centers  # (S, 3)
    a = jnp.sum(dirs * dirs, axis=-1)  # (H, W)
    b = 2.0 * jnp.einsum("hwd,sd->hws", dirs, oc)  # (H, W, S)
    c = jnp.sum(oc * oc, axis=-1) - radii**2  # (S,)
    disc = b**2 - 4.0 * a[..., None] * c[None, None, :]
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_hit = (-b - sqrt_disc) / (2.0 * a[..., None])  # nearest root
    valid = (disc > 0.0) & (t_hit > 1e-6)
    t_hit = jnp.where(valid, t_hit, jnp.inf)

    # z-order: nearest sphere per pixel
    nearest = jnp.argmin(t_hit, axis=-1)  # (H, W)
    any_hit = jnp.isfinite(jnp.min(t_hit, axis=-1))

    t_sel = jnp.take_along_axis(t_hit, nearest[..., None], axis=-1)[..., 0]
    hit_world = origin[None, None, :] + t_sel[..., None] * dirs  # (H, W, 3)

    centers_sel = centers[nearest]  # (H, W, 3)
    rot_sel = rotations[nearest]  # (H, W, 3, 3)
    radii_sel = radii[nearest]  # (H, W)
    stripe_sel = stripe_colors[nearest]  # (H, W, 3)
    factor_sel = base_factors[nearest]  # (H, W, 3)

    # hit point in sphere-local coords -> planar UV from local x
    local = jnp.einsum(
        "hwij,hwj->hwi", rot_sel.swapaxes(-1, -2), hit_world - centers_sel
    )
    u_tex = (local[..., 0] + radii_sel) / (2.0 * radii_sel)
    tex_x = jnp.clip(u_tex, 0.0, 1.0) * _TEX_W
    stripe_on = jnp.mod(tex_x, _STRIPE_PERIOD) < _STRIPE_ON

    color = jnp.where(stripe_on[..., None], stripe_sel, 0.0) * factor_sel
    image = jnp.where(any_hit[..., None], color, 1.0)  # white background
    return image, any_hit


def sphere_params_for_timestep(
    gripper_matrix: np.ndarray,  # (4, 4)
    gripper_open: float,
    joint_poses: dict[int, np.ndarray],  # joint idx -> (7,) [xyz, quat xyzw]
    joints_to_render: list[int],
    radius: float,
    camera_scale: float,
) -> dict[str, np.ndarray]:
    """Host-side assembly of one frame's sphere set (the reference's
    render_demo inner logic, ``render_data.py:235-267``)."""
    from scipy.spatial.transform import Rotation

    centers = [np.asarray(gripper_matrix)[:3, 3]]
    rotations = [np.asarray(gripper_matrix)[:3, :3]]
    gripper_stripe = "cyan" if gripper_open > 0.1 else "yellow"
    stripes = [STRIPE_COLORS[gripper_stripe]]
    factors = [
        SPHERE_BASE_FACTORS["open" if gripper_open > 0.1 else "closed"]
    ]
    for j in joints_to_render:
        pose = np.asarray(joint_poses[j])
        centers.append(pose[:3])
        rotations.append(Rotation.from_quat(pose[3:7]).as_matrix())
        stripes.append(STRIPE_COLORS[JOINT_COLOR_MAP[j]])
        # joints are rendered with gripper_open=1.0 -> "open" base factor
        factors.append(SPHERE_BASE_FACTORS["open"])
    s = len(centers)
    return {
        "centers": np.stack(centers).astype(np.float32),
        "rotations": np.stack(rotations).astype(np.float32),
        "radii": np.full(s, radius * camera_scale, np.float32),
        "stripe_colors": np.stack(stripes),
        "base_factors": np.stack(factors),
    }
