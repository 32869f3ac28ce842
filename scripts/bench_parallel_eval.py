"""Episodes/minute: serial harness vs lockstep-parallel eval, full geometry.

Measures the whole closed loop at the paper protocol (episode_length=200,
execution_horizon=20 -> 10 control steps/episode, num_diffusion_steps
configurable) on fake envs at the real 4x256^2 camera geometry, with the
full-size SD-turbo ControlNet pipeline and ACT controller. Fake envs cost
microseconds per step, so what this times is the serving path: program
latency + relay round-trips + host-side slot bookkeeping — i.e. exactly the
part the lockstep design (eval/parallel.py) claims scales near-linearly.

Params are random/zeros (bf16 serving layout) — timing is value-independent.
The controller checkpoint load is bypassed by injecting params directly;
everything else is the real eval path (reset_to_demo, per-episode seeding,
JSON accounting).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_parallel_eval.py \
    [--episodes=8] [--batches=1,2,4,8] [--steps=5]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


TINY = "--tiny" in sys.argv  # CPU smoke mode: tiny configs, same code path
if TINY:
    # env vars alone are too late on this host (sitecustomize hooks jax at
    # interpreter start); the config update is what actually wins
    jax.config.update("jax_platforms", "cpu")


def _build(work_dir: Path):
    from genima_tpu.control.policy import GenimaACTAgent
    from genima_tpu.envs import FakeRLBenchFactory
    from genima_tpu.eval.agents import SDControlNetAgent

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    t0 = time.time()
    if TINY:
        from genima_tpu.diffusion.pipeline import SDControlNetPipeline
        from genima_tpu.nn.act import ACTConfig
        from genima_tpu.nn.clip_text import CLIPTextConfig
        from genima_tpu.nn.unet import UNetConfig
        from genima_tpu.nn.vae import VAEConfig

        pipe = SDControlNetPipeline(
            unet_cfg=UNetConfig.tiny(), vae_cfg=VAEConfig.tiny_test(),
            text_cfg=CLIPTextConfig.tiny(), dtype=jnp.float32,
        )
        dag = SDControlNetAgent(pipe=pipe, resolution=64)
        agent = GenimaACTAgent(
            act_cfg=ACTConfig.tiny(num_queries=20),
            clip_cfg=CLIPTextConfig.tiny(projection_dim=16),
            image_size=32, resnet_width=8, num_views=4,
            data_augmentation=False,
        )
        obs_size = 32
    else:
        dag = SDControlNetAgent()  # full SD-turbo geometry, bf16 storage
        agent = GenimaACTAgent()  # 4x256^2 views, resnet18-width backbone
        obs_size = 256
    params, clip_p = agent.init_params(jax.random.key(0))
    agent.create_state(params, clip_p)
    print(f"param init: {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    factory = FakeRLBenchFactory(image_size=obs_size)
    ctrl_params = {"encoder": params["encoder"], "actor": params["actor"]}
    return dag, agent, factory, ctrl_params


def _cfg(work_dir: Path, n_eps: int, n_par: int, steps: int):
    from genima_tpu.core.config import Config

    return Config.from_dict(
        {
            "task": "fake_reach",
            "controller_ckpt": str(work_dir),
            "eval_type": "latest",
            "num_eval_episodes": n_eps,
            "num_parallel_envs": n_par,
            "execution_horizon": 20,
            "episode_length": 200,
            "num_diffusion_steps": steps,
            "guidance_scale": 0.0,
            "save_video": False,
        }
    )


def _run(ws, ctrl_params, n_eps: int) -> float:
    """Time eval of n_eps episodes through the given workspace; returns
    wall seconds. Checkpoint IO is bypassed: params injected, discovery
    stubbed to one pseudo-checkpoint."""
    ws.load_controller_ckpt = lambda path: setattr(
        ws, "controller_params", ctrl_params
    )
    t0 = time.time()
    logs = ws.eval_checkpoints(["bench"])
    dt = time.time() - t0
    done = logs["results"]["total_episodes"]
    assert done == n_eps, (done, n_eps)
    return dt


def main():
    episodes, batches, steps = 8, [1, 2, 4, 8], 5
    for a in sys.argv[1:]:
        if a.startswith("--episodes="):
            episodes = int(a.split("=")[1])
        elif a.startswith("--batches="):
            batches = [int(x) for x in a.split("=")[1].split(",")]
        elif a.startswith("--steps="):
            steps = int(a.split("=")[1])

    import tempfile

    from genima_tpu.eval.harness import GenimaEvalWorkspace
    from genima_tpu.eval.parallel import ParallelGenimaEvalWorkspace

    work_dir = Path(tempfile.mkdtemp(prefix="bench_par_eval_"))
    dag, agent, factory, ctrl_params = _build(work_dir)

    stats = {"mean": np.zeros(8, np.float32), "std": np.ones(8, np.float32)}

    def make_envs(n):
        return [
            factory.make_eval_env(
                frame_stack=1, action_sequence=20,
                action_stats=stats, proprio_stats=stats,
            )
            for _ in range(n)
        ]

    rows = []
    for n in batches:
        cfg = _cfg(work_dir, episodes, n, steps)
        if n == 1:
            ws = GenimaEvalWorkspace(cfg, make_envs(1)[0], agent, dag)
        else:
            ws = ParallelGenimaEvalWorkspace(cfg, make_envs(n), agent, dag)
        # warmup: compile the fused/batched program on a throwaway episode
        warm = _cfg(work_dir, 1, n, steps)
        if n == 1:
            wws = GenimaEvalWorkspace(warm, make_envs(1)[0], agent, dag)
        else:
            wws = ParallelGenimaEvalWorkspace(warm, make_envs(n), agent, dag)
        _run(wws, ctrl_params, 1)
        dt = _run(ws, ctrl_params, episodes)
        epm = episodes / dt * 60.0
        label = "serial " if n == 1 else f"lockstep x{n}"
        rows.append((label, n, dt, epm))
        print(
            f"{label}: {episodes} eps in {dt:.1f}s -> {epm:.2f} eps/min",
            flush=True,
        )

    base = rows[0][3]
    print("\n| harness | episodes/min | speedup |", flush=True)
    print("|---|---|---|", flush=True)
    for label, n, dt, epm in rows:
        print(f"| {label} | {epm:.2f} | {epm / base:.2f}x |", flush=True)


if __name__ == "__main__":
    main()
