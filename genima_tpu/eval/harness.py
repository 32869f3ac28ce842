"""Closed-loop evaluation workspace — the product loop.

Rebuilds the reference's ``GenimaEvalWorkspace`` (``controller/eval_genima.py``):
checkpoint selection (latest / last / last_three / epoch-N), per-episode
fixed diffusion seed, ``reset_to_demo`` restored episodes, the
observe -> tile -> diffuse -> untile -> ACT -> execute-chunk loop with
gen_time / control_time wall-clock metrics, per-episode JSON logs, videos
named ``<task>_ep<N>_{succ,fail}.mp4``, and a running success-rate printout.

With ``diffusion_agent=None`` this is the ACT-only harness
(``controller/eval_act.py``): raw RGB observations go straight to the
controller.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from genima_tpu.core import checkpoint as ckpt
from genima_tpu.data.tiling import tile_images, untile_to_cameras
from genima_tpu.eval.video import VideoRecorder


class GenimaEvalWorkspace:
    def __init__(
        self,
        eval_cfg,
        eval_env,
        controller_agent,
        diffusion_agent=None,
        cameras=("wrist", "front", "right_shoulder", "left_shoulder"),
        logger=None,
        tokenizer=None,
    ):
        self.eval_cfg = eval_cfg
        self.eval_env = eval_env
        self.controller_agent = controller_agent
        self.diffusion_agent = diffusion_agent
        self.cameras = list(cameras)
        self.logger = logger
        self.tokenizer = tokenizer
        self.controller_params = None
        # one-off diffusion-only latency estimate so the fused single-program
        # path can still report the reference's separate gen/control phases
        # (eval_genima.py:202-211,242-249)
        self._fused_gen_est = None
        self.video = VideoRecorder(
            Path(eval_cfg.get("save_image_path", "/tmp")) / "videos",
            fps=eval_cfg.get("video_fps", 30),
        )

    # -- checkpoint handling ----------------------------------------------------

    def load_controller_ckpt(self, path: str | Path) -> None:
        payload = ckpt.load_epoch_checkpoint(path)
        agent_params = payload["agent"]
        required = {"encoder", "actor"}
        missing = required - set(agent_params)
        if missing:
            raise ValueError(f"Missing keys in controller checkpoint: {missing}")
        self.controller_params = agent_params
        print(f"Loaded controller checkpoint from {path}")

    def select_checkpoints(self) -> list[str]:
        return ckpt.select_eval_checkpoints(
            self.eval_cfg.controller_ckpt, self.eval_cfg.get("eval_type", "latest")
        )

    # -- the closed loop ----------------------------------------------------------

    def _act_views(self, obs, fs: int) -> np.ndarray:
        """Camera-major (V*fs, H, W, 3) HWC views from a frame-stacked CHW
        obs dict — the ONE definition of the controller's view order (the
        batched lockstep path stacks this per env)."""
        views = []
        for cam in self.cameras:
            for t in range(fs):
                views.append(np.transpose(obs[f"{cam}_rgb"][t], (1, 2, 0)))
        return np.stack(views)

    def _controller_act(self, obs, lang_tokens: np.ndarray) -> np.ndarray:
        """obs dict (frame-stacked, CHW cams) -> (T, A) normalized chunk."""
        fs = obs[f"{self.cameras[0]}_rgb"].shape[0]
        images = self._act_views(obs, fs)[None].astype(np.float32)
        qpos = obs["low_dim_state"].reshape(1, -1).astype(np.float32)
        actions = self.controller_agent.act(
            self.controller_params, images, qpos, lang_tokens
        )
        return np.asarray(actions[0])

    def _tile_obs(self, obs, fs: int) -> np.ndarray:
        frames = []
        for t in range(fs):
            views = np.stack(
                [
                    np.transpose(obs[f"{cam}_rgb"][t], (1, 2, 0))
                    for cam in self.cameras
                ]
            ).astype(np.uint8)
            frames.append(np.asarray(tile_images(views)))
        return np.stack(frames)  # (fs, 512, 512, 3) uint8

    def _prompts(self, goal: str, fs: int):
        prompts = [
            f"tiled perspectives of a robot arm executing '{goal}'"
        ] * fs
        negative = [
            "monochrome, lowres, bad anatomy, worst quality, low quality"
        ] * fs
        return prompts, negative

    def _fused(self, fs: int, obs_size: int):
        if not hasattr(self, "_fused_step"):
            try:
                from genima_tpu.eval.fused import FusedGenimaStep

                self._fused_step = FusedGenimaStep(
                    self.diffusion_agent, self.controller_agent, obs_size
                )
            except Exception:
                self._fused_step = None
        return self._fused_step

    def _fused_control_step(self, obs, goal: str, fs: int, lang_tokens):
        """One jitted program: tiled obs -> diffusion -> untile -> ACT."""
        tiled = self._tile_obs(obs, fs)
        prompts, negative = self._prompts(goal, fs)
        dag = self.diffusion_agent
        embeds = dag._embed_prompts(prompts)
        latents = dag._next_latents(fs)
        qpos = obs["low_dim_state"].reshape(1, -1).astype(np.float32)
        obs_size = obs[f"{self.cameras[0]}_rgb"].shape[-1]
        fused = self._fused(fs, obs_size)
        actions, target = fused(
            dag.params,
            self.controller_params,
            self.controller_agent._clip_params,
            jnp.asarray(tiled),
            embeds,
            latents,
            jnp.asarray(qpos),
            jnp.asarray(lang_tokens),
            key=dag._next_key(),
            num_inference_steps=self.eval_cfg.get("num_diffusion_steps", 5),
        )
        return np.asarray(actions[0]), target

    def _generate_targets_device(self, obs, goal: str, fs: int):
        """Device-resident fast path (SURVEY.md §7 "host<->device boundary"):
        the generated target never round-trips to host — untile and the ACT
        input assembly happen on device; one uint8 upload per step."""
        tiled = self._tile_obs(obs, fs)
        prompts, negative = self._prompts(goal, fs)
        target = self.diffusion_agent.infer_device(
            tiled,
            prompts,
            negative,
            num_inference_steps=self.eval_cfg.get("num_diffusion_steps", 5),
            guidance_scale=self.eval_cfg.get("guidance_scale", 0.0),
        )  # (fs, 512, 512, 3) uint8 on device
        obs_size = obs[f"{self.cameras[0]}_rgb"].shape[-1]
        cams = untile_to_cameras(
            target.astype(jnp.float32), target_size=obs_size
        )  # (fs, 4, h, w, 3)
        # camera-major view order matching the numpy path
        act_images = jnp.transpose(cams, (1, 0, 2, 3, 4)).reshape(
            1, -1, obs_size, obs_size, 3
        )
        return act_images, target

    def _measure_gen_time(self, obs, goal: str, fs: int) -> float:
        """One-off timing of the diffusion sub-program on the live obs
        (compile excluded: first call compiles, second is measured), used to
        attribute the fused program's time to gen/control phases."""
        self._generate_targets_device(obs, goal, fs)  # compile
        t0 = time.time()
        _, dev = self._generate_targets_device(obs, goal, fs)
        np.asarray(dev)[0, 0, 0]  # force completion (axon relay)
        return time.time() - t0

    def _controller_act_device(self, act_images, obs, lang_tokens):
        qpos = obs["low_dim_state"].reshape(1, -1).astype(np.float32)
        actions = self.controller_agent.act(
            self.controller_params, act_images, qpos, lang_tokens
        )
        return np.asarray(actions[0])

    def _generate_targets(self, obs, goal: str, fs: int):
        """Tile cameras, run the diffusion agent, untile into obs (the
        reference loop ``eval_genima.py:162-234``)."""
        frames = []
        for t in range(fs):
            views = np.stack(
                [
                    np.transpose(obs[f"{cam}_rgb"][t], (1, 2, 0))
                    for cam in self.cameras
                ]
            )
            frames.append(np.asarray(tile_images(views)))
        tiled = np.stack(frames)  # (fs, 512, 512, 3)

        prompts = [
            f"tiled perspectives of a robot arm executing '{goal}'"
        ] * fs
        negative_prompts = [
            "monochrome, lowres, bad anatomy, worst quality, low quality"
        ] * fs

        target = self.diffusion_agent.infer(
            tiled,
            prompts,
            negative_prompts,
            num_inference_steps=self.eval_cfg.get("num_diffusion_steps", 5),
            guidance_scale=self.eval_cfg.get("guidance_scale", 0.0),
        )  # (fs, 512, 512, 3) uint8

        obs_size = obs[f"{self.cameras[0]}_rgb"].shape[-1]
        cams = np.asarray(
            untile_to_cameras(target.astype(np.float32), target_size=obs_size)
        )
        # overwrite the 4 camera obs with generated targets (CHW)
        new_obs = dict(obs)
        for ci, cam in enumerate(self.cameras):
            new_obs[f"{cam}_rgb"] = np.transpose(
                cams[:, ci], (0, 3, 1, 2)
            ).astype(np.float32)
        return new_obs, target

    def eval_checkpoints(self, eval_ckpts: list[str]) -> dict:
        cfg = self.eval_cfg
        logs = {"eval_episodes": []}
        logs_name = f"eval_genima_{cfg.task}.json"
        logs_path = Path(cfg.controller_ckpt) / logs_name
        execution_horizon = cfg.get("execution_horizon", 20)
        episode_length = cfg.get("episode_length", 200)

        global_episode, global_total_reward = 0, 0.0
        for run_id, eval_ckpt in enumerate(eval_ckpts):
            print(f"\n-------- Run {run_id} ---------")
            self.load_controller_ckpt(Path(cfg.controller_ckpt) / eval_ckpt)
            run_episode, run_total_reward = 0, 0.0
            timings = {
                "gen_time": [], "control_time": [], "fused_step_time": [],
            }

            while run_episode < cfg.get("num_eval_episodes", 10):
                if self.diffusion_agent is not None:
                    self.diffusion_agent.new_episode()
                obs, info = self.eval_env.reset()
                goal = info.get("descriptions", "")
                if hasattr(self.eval_env.unwrapped, "reset_to_demo"):
                    _, raw_obs = self.eval_env.unwrapped.reset_to_demo(
                        idx=run_episode
                    )
                    obs = self._rewrap_obs(raw_obs, obs)
                lang_tokens = self._lang_tokens(goal, obs)
                pose_fn = getattr(
                    self.eval_env.unwrapped, "initial_object_pose", None
                )
                initial_object_pose = pose_fn() if callable(pose_fn) else None

                self.video.init(self.eval_env, enabled=cfg.get("save_video", False))
                termination, episode_step, reward = False, 0, 0.0
                fs = obs[f"{self.cameras[0]}_rgb"].shape[0]

                use_fused = (
                    self.diffusion_agent is not None
                    and cfg.get("guidance_scale", 0.0) <= 1.0
                    and hasattr(self.diffusion_agent, "infer_device")
                    and hasattr(self.controller_agent, "_act_impl")
                    and self._fused(
                        fs, obs[f"{self.cameras[0]}_rgb"].shape[-1]
                    )
                    is not None
                )

                while not termination:
                    act_images_dev = None
                    actions = None
                    if use_fused:
                        # ONE jitted program: tile upload -> diffusion ->
                        # untile -> ACT -> action download
                        t0 = time.time()
                        actions, gen_dev = self._fused_control_step(
                            obs, goal, fs, lang_tokens
                        )
                        dt = time.time() - t0
                        # the fused program cannot be split live; report its
                        # true time under fused_step_time and attribute the
                        # gen/control phases from a one-off measurement of
                        # the diffusion sub-program (reference logs the two
                        # phases separately, eval_genima.py:202-211)
                        timings["fused_step_time"].append(dt)
                        if self._fused_gen_est is None:
                            self._fused_gen_est = self._measure_gen_time(
                                obs, goal, fs
                            )
                        gen_est = min(self._fused_gen_est, dt)
                        timings["gen_time"].append(gen_est)
                        timings["control_time"].append(dt - gen_est)
                    elif self.diffusion_agent is not None:
                        t0 = time.time()
                        if hasattr(self.diffusion_agent, "infer_device"):
                            act_images_dev, gen_dev = (
                                self._generate_targets_device(obs, goal, fs)
                            )
                            ctrl_obs = obs
                        else:
                            ctrl_obs, gen_dev = self._generate_targets(
                                obs, goal, fs
                            )
                        timings["gen_time"].append(time.time() - t0)
                    else:
                        ctrl_obs = obs
                        gen_dev = None

                    if self.diffusion_agent is not None and (
                        cfg.get("save_gen_image") or cfg.get("save_input_image")
                    ):
                        # [Debug] save input/generated tiles
                        # (reference eval_genima.py:188-222)
                        self._save_debug_images(
                            obs, np.asarray(gen_dev), global_episode,
                            episode_step,
                        )

                    if actions is None:
                        t0 = time.time()
                        if act_images_dev is not None:
                            actions = self._controller_act_device(
                                act_images_dev, ctrl_obs, lang_tokens
                            )
                        else:
                            actions = self._controller_act(
                                ctrl_obs, lang_tokens
                            )
                        timings["control_time"].append(time.time() - t0)

                    actions = actions[:execution_horizon]
                    try:
                        obs, reward, termination, truncated, info = (
                            self.eval_env.step(actions)
                        )
                        termination = termination or truncated
                    except Exception as e:  # sim failure -> terminate episode
                        print(f"Error: {e}")
                        termination = True
                        break
                    episode_step += len(actions)
                    self.video.record(self.eval_env)
                    if episode_step > episode_length:
                        termination = True

                # success accounting: RLBench rewards are sparse 0/1 and the
                # env terminates on success, so the chunk-summed reward is at
                # most 1 there — but clamp so a shaped env emitting rewards at
                # several chunk steps can never push avg_success above 1
                episode_success = float(np.clip(reward, 0.0, 1.0))
                run_total_reward += episode_success
                run_episode += 1
                global_total_reward += episode_success
                global_episode += 1

                logs["eval_episodes"].append(
                    {
                        "episode": run_episode,
                        "reward": float(reward),
                        "global_episode": global_episode,
                        "global_reward": global_total_reward,
                        "steps": episode_step,
                        "run_id": run_id,
                        "controller_ckpt": eval_ckpt,
                        # reference eval_genima.py:282-297 logs the object's
                        # initial pose per episode
                        "initial_object_pose": initial_object_pose,
                    }
                )
                logs_path.parent.mkdir(parents=True, exist_ok=True)
                with open(logs_path, "w") as f:
                    json.dump(logs, f, indent=4)

                metrics = {
                    "reward": float(reward),
                    "success": global_total_reward / float(global_episode),
                    "episode": global_episode,
                    "gen_time": float(np.mean(timings["gen_time"] or [0])),
                    "control_time": float(np.mean(timings["control_time"] or [0])),
                }
                if timings["fused_step_time"]:
                    metrics["fused_step_time"] = float(
                        np.mean(timings["fused_step_time"])
                    )
                if cfg.get("save_video", False):
                    success = "succ" if reward > 0.9 else "fail"
                    self.video.save(
                        f"{cfg.task}_ep{global_episode}_{success}.mp4"
                    )
                if self.logger is not None:
                    self.logger.log_metrics(
                        metrics, global_episode, prefix="eval_genima", echo=False
                    )
                print(
                    f"Episode {run_episode:>02}\t| Reward - run{run_id}: "
                    f"{reward:.1f} ({int(run_total_reward)}/{run_episode}="
                    f"{run_total_reward / run_episode * 100:.1f}%)\t| Steps: "
                    f"{episode_step}\t| Gen Time: "
                    f"{np.mean(timings['gen_time'] or [0]):.4f}s\t| Control Time: "
                    f"{np.mean(timings['control_time'] or [0]):.4f}s"
                )

        logs["results"] = {
            "avg_success": f"{global_total_reward / float(global_episode)}",
            "total_success": global_total_reward,
            "total_episodes": global_episode,
            "eval_type": self.eval_cfg.get("eval_type", "latest"),
        }
        with open(logs_path, "w") as f:
            json.dump(logs, f, indent=4)
        print("----------------------")
        print(
            f"Average of {run_episode} episodes (across {len(eval_ckpts)} runs): "
            f"{global_total_reward / float(global_episode) * 100:.2f}%"
        )
        return logs

    def eval(self) -> dict:
        return self.eval_checkpoints(self.select_checkpoints())

    # -- helpers -------------------------------------------------------------

    def _rewrap_obs(self, raw_obs, wrapped_obs, env=None):
        """reset_to_demo returns an unwrapped obs; re-apply the full wrapper
        chain (``envs.wrappers.rewrap_obs``)."""
        from genima_tpu.envs.wrappers import rewrap_obs

        return rewrap_obs(
            self.eval_env if env is None else env, raw_obs, wrapped_obs
        )

    def _save_debug_images(self, obs, gen_tiles, episode, step) -> None:
        from PIL import Image

        from genima_tpu.data.tiling import tile_images

        out = Path(self.eval_cfg.get("save_image_path", "/tmp"))
        out.mkdir(parents=True, exist_ok=True)
        fs = gen_tiles.shape[0]
        for t in range(fs):
            if self.eval_cfg.get("save_input_image"):
                views = np.stack(
                    [
                        np.transpose(obs[f"{cam}_rgb"][t], (1, 2, 0))
                        for cam in self.cameras
                    ]
                ).astype(np.uint8)
                Image.fromarray(np.asarray(tile_images(views))).save(
                    out / f"input_ep{episode}_step{step}_frame{t}.png"
                )
            if self.eval_cfg.get("save_gen_image"):
                Image.fromarray(gen_tiles[t]).save(
                    out / f"gen_target_ep{episode}_step{step}_frame{t}.png"
                )

    def _lang_tokens(self, goal: str, obs) -> np.ndarray:
        if "lang_tokens" in obs and np.any(obs["lang_tokens"]):
            return np.asarray(obs["lang_tokens"]).reshape(1, -1)[:, -77:]
        if self.tokenizer is not None:
            return np.asarray(self.tokenizer([goal]), np.int32)
        return np.zeros((1, 77), np.int32)
