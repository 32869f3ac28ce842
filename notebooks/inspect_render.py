# %% [markdown]
# # Rendered-dataset inspection
#
# The reference ships `notebooks/render.ipynb` for eyeballing rendered
# datasets (sphere placement, tiling, trajectories). This is the same tool
# as a jupytext-style script: run cells in order (VS Code / Jupyter both
# understand `# %%` cells) or execute top-to-bottom as a script to dump
# inspection PNGs.
#
# Episode directory layout (identical to the reference):
# ```
# <root>/<task>/variation0/episodes/episodeN/
#   {wrist,front,right_shoulder,left_shoulder,overhead}_rgb/<t>.png
#   tiled_rgb/<t>.png  tiled_rgb_rendered/<t>.png   (rgb_rendered sets)
#   low_dim_obs.pkl  variation_descriptions.pkl
# ```

# %%
import pickle
import sys
from pathlib import Path

import numpy as np
from PIL import Image

DATASET = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/dataset_rgb_rendered")
TASK = sys.argv[2] if len(sys.argv) > 2 else None
OUT = Path("/tmp/render_inspection")
OUT.mkdir(parents=True, exist_ok=True)

task_dirs = [p for p in DATASET.iterdir() if p.is_dir()] if DATASET.exists() else []
task = Path(DATASET / TASK) if TASK else (task_dirs[0] if task_dirs else None)
print("inspecting task:", task)

# %% contact sheet: first episode, every camera, a few timesteps
if task is not None:
    ep = task / "variation0" / "episodes" / "episode0"
    cams = sorted(d.name for d in ep.iterdir() if d.name.endswith("_rgb"))
    ts = [0, 10, 20, 30]
    rows = []
    for cam in cams:
        row = []
        for t in ts:
            f = ep / cam / f"{t}.png"
            if f.exists():
                row.append(np.asarray(Image.open(f).convert("RGB")))
        if row:
            rows.append(np.concatenate(row, axis=1))
    if rows:
        sheet = np.concatenate(rows, axis=0)
        Image.fromarray(sheet).save(OUT / "contact_sheet.png")
        print("wrote", OUT / "contact_sheet.png", sheet.shape)

# %% tiled pair: conditioning vs rendered target
if task is not None:
    ep = task / "variation0" / "episodes" / "episode0"
    for t in [0, 10]:
        pair = []
        for sub in ("tiled_rgb", "tiled_rgb_rendered"):
            f = ep / sub / f"{t}.png"
            if f.exists():
                pair.append(np.asarray(Image.open(f).convert("RGB")))
        if len(pair) == 2:
            Image.fromarray(np.concatenate(pair, axis=1)).save(
                OUT / f"tiled_pair_t{t}.png"
            )
            print("wrote", OUT / f"tiled_pair_t{t}.png")

# %% 3D gripper trajectory from low_dim_obs.pkl
if task is not None:
    ep = task / "variation0" / "episodes" / "episode0"
    pkl = ep / "low_dim_obs.pkl"
    if pkl.exists():
        with open(pkl, "rb") as f:
            low_dim = pickle.load(f)

        def get(o, k):
            return o[k] if isinstance(o, dict) else getattr(o, k)

        xyz = np.stack(
            [np.asarray(get(o, "gripper_matrix"))[:3, 3] for o in low_dim]
        )
        print("trajectory extent:", xyz.min(0), "->", xyz.max(0))
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig = plt.figure()
            ax = fig.add_subplot(projection="3d")
            ax.plot(xyz[:, 0], xyz[:, 1], xyz[:, 2])
            ax.scatter(*xyz[0], c="g", label="start")
            ax.scatter(*xyz[-1], c="r", label="end")
            ax.legend()
            fig.savefig(OUT / "trajectory.png", dpi=120)
            print("wrote", OUT / "trajectory.png")
        except ImportError:
            np.save(OUT / "trajectory.npy", xyz)
            print("matplotlib unavailable; wrote trajectory.npy")
