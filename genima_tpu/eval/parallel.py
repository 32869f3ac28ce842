"""Lockstep-batched closed-loop evaluation — N episodes per TPU program.

The reference evaluates episodes strictly serially and documents it as a
known bottleneck (``model-card.md:39`` "Data generation and evaluation
pipelines are completely sequential"; ``README.md:299``). On TPU the
5-step tiled generation is MXU-underutilized at batch 1 (UNet ~41%,
PERF.md), so evaluating N episodes in lockstep and batching their
diffusion + ACT into ONE XLA program buys near-linear eval throughput on
a single chip: every control step uploads all live observations, runs the
denoise loop at batch ``N*frame_stack`` (the streaming attention kernel,
``kernels/packed_attention.py``, keeps scoped VMEM bounded at batch > 1),
untiles, runs ACT at batch N, and downloads all action chunks at once.

Episode semantics are unchanged vs the serial harness: per-episode
``reset_to_demo`` restore, per-episode fixed diffusion seed, the same
success accounting, JSON schema, and running printout. Environments are
stepped host-side in a thread pool. Episodes that finish early stay in
the batch with their final observation (static shapes — the program
compiles once) but are masked out of stepping and accounting.

On real simulators each env lives in its own spawned child
(``envs/subprocess_env.py`` — CoppeliaSim allows ONE instance per
process; ``cli/eval_genima.py`` builds the children automatically), with
demo restore + observation re-wrap done child-side. One limit, enforced
loudly: classifier-free guidance (``guidance_scale > 1.0``) needs the
serial harness — the batched program runs positive prompts only.
"""

from __future__ import annotations

import json
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from genima_tpu.data.tiling import untile_to_cameras
from genima_tpu.eval.harness import GenimaEvalWorkspace


class BatchedGenimaStep:
    """The fused control step (``eval/fused.py``) generalized to N
    environments: tiled obs (N*fs, 2S, 2S, 3) -> diffusion -> untile ->
    ACT at batch N -> (N, T, A) action chunks, one jitted program.

    With ``mesh`` (a ``Mesh`` with a ``data`` axis), the program is
    GSPMD-sharded: params replicated, every batch axis split over the
    mesh — N lockstep environments spread across the chips of a pod
    slice, the serving-side mirror of the DP training step. Requires
    ``N % mesh data size == 0``.
    """

    def __init__(
        self, diffusion_agent, controller_agent, obs_size: int = 256,
        mesh=None,
    ):
        self.pipe = diffusion_agent.pipe
        # family-independent generate hook (SD / SDXL / Pix2Pix)
        self._gen = getattr(diffusion_agent, "fused_generate", None)
        self.controller = controller_agent
        self.obs_size = obs_size
        self.mesh = mesh
        # When the batch axis is GSPMD-split over ``data``, the pipeline's
        # "auto" per-image decode (a global lax.map) would serialize the
        # whole batch through one device at a time — force the native
        # batched decode, whose per-device batch is N/n_data. Passed as a
        # STATIC generate argument rather than mutating the shared
        # pipeline: mutation would not invalidate programs already traced
        # for other harnesses and would leak past this workspace's
        # lifetime (round-4 advisor finding).
        self._decode_mode = None
        if mesh is not None:
            from genima_tpu.core.mesh import (
                FSDP_AXIS, data_sharding, replicated,
            )

            if dict(mesh.shape).get("data", 1) > 1:
                self._decode_mode = "batched"

            self._rep = replicated(mesh)
            self._dat = data_sharding(mesh)
            self._param_key = None
            self._param_cache = None
            self._tp = dict(mesh.shape).get(FSDP_AXIS, 1) > 1
            if self._tp:
                # 2-D (data x fsdp) mesh: diffusion weights output-feature-
                # sharded over fsdp (core/tp.py), batch over data; jit
                # infers shardings from the committed inputs and GSPMD
                # places the collectives over ICI
                self._fn = jax.jit(self._step_impl, static_argnums=(9,))
            else:
                # pjit with in_shardings forbids kwargs -> static position
                self._fn = jax.jit(
                    self._step_impl,
                    static_argnums=(9,),
                    in_shardings=(self._rep,) * 3
                    + (self._dat,) * 5
                    + (self._rep,),  # the noise key is replicated
                    out_shardings=(self._dat, self._dat),
                )
        else:
            self._fn = jax.jit(
                self._step_impl, static_argnames=("num_inference_steps",)
            )

    def _placed(self, diffusion_params, controller_params, clip_params):
        """Place the three param trees over the mesh ONCE per tree identity
        (re-placing 1.4 GB every control step would dominate). Diffusion
        weights TP-shard over the fsdp axis when the mesh has one; the
        (small) controller/CLIP towers stay replicated. The cache key holds
        STRONG references to the source trees — ``is`` on live objects, not
        ``id()`` of possibly-freed ones, so a recycled address after a
        checkpoint reload can never serve stale weights."""
        key = (diffusion_params, controller_params, clip_params)
        if self._param_key is None or any(
            a is not b for a, b in zip(self._param_key, key)
        ):
            if self._tp:
                from genima_tpu.core.tp import shard_params_tp

                dp = shard_params_tp(diffusion_params, self.mesh)
            else:
                dp = jax.device_put(diffusion_params, self._rep)
            self._param_cache = (
                dp,
                jax.device_put(controller_params, self._rep),
                jax.device_put(clip_params, self._rep),
            )
            self._param_key = key
        return self._param_cache

    def _step_impl(
        self,
        diffusion_params,
        controller_params,
        clip_params,
        tiled_u8,       # (N*fs, 2S, 2S, 3) uint8
        prompt_embeds,  # pytree: (N*fs, 77, hidden) [+ pooled for SDXL]
        latents,        # (N*fs, h, w, 4)
        qpos,           # (N, state_dim*fs)
        lang_tokens,    # (N, 77)
        key=None,       # ancestral-noise key (SDXL); ignored by SD/Pix2Pix
        num_inference_steps: int = 5,
    ):
        n = qpos.shape[0]
        if self._gen is not None:
            target = self._gen(
                diffusion_params, tiled_u8, prompt_embeds, latents, key,
                num_inference_steps=num_inference_steps,
                decode_mode=self._decode_mode,
            )
        else:
            target = self.pipe.generate(
                diffusion_params, tiled_u8, prompt_embeds, latents,
                num_inference_steps=num_inference_steps,
                decode_mode=self._decode_mode,
            )  # (N*fs, 2S, 2S, 3) uint8
        cams = untile_to_cameras(
            target.astype(jnp.float32), target_size=self.obs_size
        )  # (N*fs, V, S, S, 3)
        nfs, v, s = cams.shape[0], cams.shape[1], self.obs_size
        fs = nfs // n
        # per env: camera-major then frame order, matching the serial path
        act_images = (
            cams.reshape(n, fs, v, s, s, 3)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(n, v * fs, s, s, 3)
        )
        actions = self.controller._act_impl(
            controller_params, clip_params, act_images, qpos, lang_tokens
        )
        return actions, target

    def __call__(self, *args, key=None, num_inference_steps: int = 5):
        if self.mesh is not None:
            params = self._placed(*args[:3])
            asarr = lambda t: jax.tree_util.tree_map(jnp.asarray, t)  # noqa: E731
            batch = tuple(
                jax.device_put(asarr(a), self._dat) for a in args[3:8]
            )
            if key is not None:
                key = jax.device_put(key, self._rep)
            return self._fn(*params, *batch, key, num_inference_steps)
        return self._fn(
            *args, key=key, num_inference_steps=num_inference_steps
        )


class ParallelGenimaEvalWorkspace(GenimaEvalWorkspace):
    """Evaluates ``num_eval_episodes`` across ``len(eval_envs)`` lockstep
    environments. Drop-in for ``GenimaEvalWorkspace`` (same constructor
    plus a list of envs; same ``eval()``/``eval_checkpoints`` surface and
    log schema)."""

    def __init__(
        self,
        eval_cfg,
        eval_envs,
        controller_agent,
        diffusion_agent=None,
        cameras=("wrist", "front", "right_shoulder", "left_shoulder"),
        logger=None,
        tokenizer=None,
        mesh=None,
    ):
        eval_envs = list(eval_envs)
        super().__init__(
            eval_cfg, eval_envs[0], controller_agent, diffusion_agent,
            cameras=cameras, logger=logger, tokenizer=tokenizer,
        )
        if (
            diffusion_agent is not None
            and float(eval_cfg.get("guidance_scale", 0.0)) > 1.0
        ):
            # the batched program runs positive prompts only (the genima
            # protocol is guidance 0.0, eval_genima.yaml:29-31); CFG would
            # silently differ from the serial staged path — refuse loudly
            raise ValueError(
                "num_parallel_envs > 1 does not support classifier-free "
                "guidance (guidance_scale > 1.0); use the serial harness "
                "(num_parallel_envs=1) or guidance_scale <= 1.0"
            )
        if mesh is not None:
            n_data = mesh.shape.get("data", mesh.devices.size)
            if len(eval_envs) % n_data:
                raise ValueError(
                    f"num_parallel_envs ({len(eval_envs)}) must be a "
                    f"multiple of the mesh data size ({n_data}) so the "
                    "lockstep batch shards evenly"
                )
        self.mesh = mesh
        self.eval_envs = eval_envs
        self._pool = ThreadPoolExecutor(max_workers=len(eval_envs))
        self._batched_step = None
        self._batched_gen_est = None
        # fault tolerance: a sim crash is episode-local, never run-fatal
        # (the serial harness tolerates per-episode sim failures,
        # harness.py sim-error handling / reference eval_genima.py:253-259)
        self._retired: set[int] = set()       # slots whose env is gone
        self._needs_revive: set[int] = set()  # errored mid-episode last round
        self._any_obs = None                  # (obs, goal, lang) placeholder filler

    # -- batched sub-programs -------------------------------------------------

    def _batched(self, obs_size: int):
        if self._batched_step is None and self.diffusion_agent is not None:
            self._batched_step = BatchedGenimaStep(
                self.diffusion_agent, self.controller_agent, obs_size,
                mesh=self.mesh,
            )
        return self._batched_step

    def _slot_latents(self, slot, fs: int):
        """Per-episode RNG chain per env (the serial agent's contract:
        fixed generator seed per episode, split per generation)."""
        slot["key"], sub = jax.random.split(slot["key"])
        dag = self.diffusion_agent
        return dag.pipe.init_latents(sub, fs, dag.resolution, dag.resolution)

    def _slot_noise_keys(self, slots) -> jax.Array:
        """One ancestral-noise subkey PER SLOT, each advancing its own
        per-episode chain (``DiffusionAgent._next_key``'s seed+1 contract)
        — so a batched SDXL episode's in-loop noise is identical to its
        serial run and independent of cohort composition (round-3 weak #5;
        the pipeline draws each slot's block from its own key,
        ``schedulers._normal_maybe_batched``)."""
        subs = []
        for s in slots:
            s["noise_key"], sub = jax.random.split(s["noise_key"])
            subs.append(sub)
        return jnp.stack(subs)

    def _assemble_batch(self, slots, fs: int):
        tiled = np.concatenate([self._tile_obs(s["obs"], fs) for s in slots])
        dag = self.diffusion_agent
        # tree-aware: SDXL's _embed_prompts returns (hidden, pooled)
        embeds = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs),
            *[
                dag._embed_prompts(self._prompts(s["goal"], fs)[0])
                for s in slots
            ],
        )
        latents = jnp.concatenate([self._slot_latents(s, fs) for s in slots])
        qpos = np.concatenate(
            [
                s["obs"]["low_dim_state"].reshape(1, -1).astype(np.float32)
                for s in slots
            ]
        )
        lang = np.concatenate([s["lang"] for s in slots])
        return tiled, embeds, latents, qpos, lang

    def _measure_batched_gen(self, tiled, embeds, latents) -> float:
        """One-off timing of the batched diffusion sub-program, used to
        attribute the fused program's time to gen/control phases (the
        reference logs the phases separately). Uses the mesh-placed params
        when sharded (an unsharded probe would OOM exactly the models TP
        exists for) and a fixed probe key so instrumenting the run never
        perturbs the agents' episode RNG chains."""
        dag = self.diffusion_agent
        steps = self.eval_cfg.get("num_diffusion_steps", 5)
        params = dag.params
        if self.mesh is not None and self._batched_step is not None:
            params = self._batched_step._placed(
                dag.params, self.controller_params,
                self.controller_agent._clip_params,
            )[0]
            tiled = jax.device_put(
                jnp.asarray(tiled), self._batched_step._dat
            )
        probe_key = jax.random.key(0)

        decode_mode = (
            self._batched_step._decode_mode
            if self._batched_step is not None
            else None
        )

        def gen():
            out = dag.fused_generate(
                params, jnp.asarray(tiled), embeds, latents,
                probe_key, num_inference_steps=steps,
                decode_mode=decode_mode,
            )
            np.asarray(out)[0, 0, 0]  # force completion through the relay
        gen()  # compile
        t0 = time.time()
        gen()
        return time.time() - t0

    def _batched_act_only(self, slots, fs: int):
        """ACT-only harness (no diffusion): raw RGB views batched over N
        (one view-order definition: ``GenimaEvalWorkspace._act_views``)."""
        images = np.stack(
            [self._act_views(s["obs"], fs) for s in slots]
        ).astype(np.float32)  # (N, V*fs, S, S, 3)
        qpos = np.concatenate(
            [
                s["obs"]["low_dim_state"].reshape(1, -1).astype(np.float32)
                for s in slots
            ]
        )
        lang = np.concatenate([s["lang"] for s in slots])
        actions = self.controller_agent.act(
            self.controller_params, images, qpos, lang
        )
        return np.asarray(actions)

    # -- cohort pipelining ------------------------------------------------------
    #
    # The strictly-alternating lockstep loop leaves the TPU idle while the
    # envs execute their action chunks and the envs idle during the
    # denoise (round-4 PERF.md: lockstep LOST to serial end-to-end on this
    # host, 3.59 vs 4.61 episodes/min). Splitting the slots into two
    # cohorts and software-pipelining them — cohort A's envs step host-side
    # while cohort B's batched program runs on device — makes each round
    # cost max(T_device, T_env) instead of T_device + T_env. On real
    # simulators (seconds per 20-action chunk) the device program hides
    # entirely. Per-slot RNG chains make the cohort split semantics-free:
    # every episode's generations are identical to the single-batch run
    # (pinned by tests/test_parallel_eval.py::test_overlap_matches_single).

    def _cohort_partition(self, slots) -> list[list[int]]:
        """Slot-index cohorts: two halves when pipelining is on and legal
        (diffusion path, even batch, GSPMD-divisible halves), else one."""
        n = len(slots)
        if (
            not bool(self.eval_cfg.get("eval_overlap", True))
            or self.diffusion_agent is None
            or n < 2
            or n % 2
        ):
            return [list(range(n))]
        half = n // 2
        parts = [list(range(half)), list(range(half, n))]
        if self.mesh is not None:
            n_data = dict(self.mesh.shape).get("data", 1)
            if half % n_data:
                return [list(range(n))]
        return parts

    def _cohort_live(self, slots, idxs) -> bool:
        return any(
            slots[i]["counted"] and not slots[i]["done"] for i in idxs
        )

    def _dispatch_cohort(self, slots, idxs, fs: int) -> dict:
        """Assemble + dispatch one cohort's batched program. The returned
        handle's ``actions`` is an in-flight device array (jax dispatch is
        async): blocking on it is deferred so the device computes while the
        other cohort's envs step."""
        cfg = self.eval_cfg
        csl = [slots[i] for i in idxs]
        if self.diffusion_agent is None:
            t0 = time.time()
            actions = self._batched_act_only(csl, fs)
            return {"actions": actions, "t0": t0, "act_only": True}
        tiled, embeds, latents, qpos, lang = self._assemble_batch(csl, fs)
        obs_size = csl[0]["obs"][f"{self.cameras[0]}_rgb"].shape[-1]
        step = self._batched(obs_size)
        t0 = time.time()
        actions, _gen = step(
            self.diffusion_agent.params,
            self.controller_params,
            self.controller_agent._clip_params,
            tiled,
            embeds,
            latents,
            qpos,
            lang,
            key=self._slot_noise_keys(csl),
            num_inference_steps=cfg.get("num_diffusion_steps", 5),
        )
        return {
            "actions": actions,
            "t0": t0,
            "act_only": False,
            "probe": (tiled, embeds, latents),
        }

    def _run_lockstep(
        self, slots, fs: int, timings, execution_horizon: int,
        episode_length: int, ref_slot,
    ) -> None:
        """Run one slot batch to completion, pipelined over cohorts.

        One cohort degenerates to the original alternating loop (identical
        semantics); two cohorts overlap device compute with env stepping.
        """
        parts = self._cohort_partition(slots)
        K = len(parts)
        handle: dict[int, dict | None] = {c: None for c in range(K)}
        env_futs: dict[int, list] = {c: [] for c in range(K)}
        stepped: dict[int, bool] = {c: False for c in range(K)}
        ref_idx = slots.index(ref_slot)
        # ref-slot liveness CAPTURED AT DISPATCH: record while the reference
        # episode is live, including its terminating step, but never freeze
        # on the final frame until the other slots finish (the serial
        # recorder's semantics, mirrored by the pre-refactor loop)
        ref_live_at = {c: False for c in range(K)}

        def launch(c: int) -> None:
            # wait this cohort's env stepping (the other cohort's device
            # program runs meanwhile), then re-dispatch it if still live
            for f in env_futs[c]:
                f.result()
            env_futs[c] = []
            if stepped[c] and ref_idx in parts[c]:
                stepped[c] = False
                # a sim-failed slot's env may be dead — leave it, and never
                # let a recording error kill the other slots
                if ref_live_at[c] and not ref_slot.get("error"):
                    try:
                        self.video.record(ref_slot["env"])
                    except Exception as e:
                        print(f"video recording disabled: {e}")
                        self.video.enabled = False
            if self._cohort_live(slots, parts[c]):
                if ref_idx in parts[c]:
                    ref_live_at[c] = not ref_slot["done"]
                handle[c] = self._dispatch_cohort(slots, parts[c], fs)

        for c in range(K):
            launch(c)
        ci = 0
        while any(h is not None for h in handle.values()):
            h = handle[ci]
            if h is not None:
                handle[ci] = None
                actions = np.asarray(h["actions"])
                dt = time.time() - h["t0"]
                live = sum(
                    1
                    for i in parts[ci]
                    if slots[i]["counted"] and not slots[i]["done"]
                )
                if h["act_only"]:
                    timings["control_time"].append(dt / max(live, 1))
                else:
                    timings["fused_step_time"].append(dt)
                    if self._batched_gen_est is None:
                        self._batched_gen_est = self._measure_batched_gen(
                            *h["probe"]
                        )
                    gen_est = min(self._batched_gen_est, dt)
                    timings["gen_time"].append(gen_est / max(live, 1))
                    timings["control_time"].append(
                        (dt - gen_est) / max(live, 1)
                    )
                env_futs[ci] = [
                    self._pool.submit(
                        self._step_slot, slots[i], actions[k],
                        execution_horizon, episode_length,
                    )
                    for k, i in enumerate(parts[ci])
                    if slots[i]["counted"] and not slots[i]["done"]
                ]
                stepped[ci] = True
            launch(ci)
            ci = (ci + 1) % K

    # -- the lockstep loop ----------------------------------------------------

    def _reset_slot(self, env, episode_idx: int) -> dict:
        if self.diffusion_agent is not None:
            seed = getattr(self.diffusion_agent, "seed", 2)
        else:
            seed = 2
        if hasattr(env, "reset_to_demo_wrapped"):
            # SubprocessEnv: restore + re-wrap happen in the child, where
            # the wrapper chain lives
            obs, info = env.reset_to_demo_wrapped(episode_idx)
            goal = info.get("descriptions", "")
        else:
            obs, info = env.reset()
            goal = info.get("descriptions", "")
            if hasattr(env.unwrapped, "reset_to_demo"):
                _, raw_obs = env.unwrapped.reset_to_demo(idx=episode_idx)
                obs = self._rewrap_obs(raw_obs, obs, env)
        pose_fn = getattr(env.unwrapped, "initial_object_pose", None)
        return {
            "env": env,
            "ep": episode_idx,
            "obs": obs,
            "goal": goal,
            "lang": self._lang_tokens(goal, obs),
            "key": jax.random.key(seed),
            "noise_key": jax.random.key(seed + 1),
            "done": False,
            "reward": 0.0,
            "steps": 0,
            "pose": pose_fn() if callable(pose_fn) else None,
        }

    def _revive(self, si: int) -> bool:
        """Bring slot ``si``'s env back after a mid-episode error. A
        ``SubprocessEnv`` is respawned from its ctor spec (a crashed
        CoppeliaSim kills its whole child process); an in-process env gets
        one more chance — its next reset retires it if it is truly dead."""
        env = self.eval_envs[si]
        respawn = getattr(env, "respawn", None)
        if not callable(respawn):
            return True
        try:
            respawn()
            print(f"slot {si}: respawned its environment after a sim error")
            return True
        except Exception as e:
            print(f"slot {si}: respawn failed, retiring the slot: {e}")
            return False

    def _try_reset(self, si: int, episode_idx: int):
        """Guarded ``_reset_slot``: on failure, respawn-and-retry once when
        the env supports it, else retire the slot. Returns the slot dict,
        or None when the slot retired (the caller re-queues the episode)."""
        env = self.eval_envs[si]
        attempts = 2 if callable(getattr(env, "respawn", None)) else 1
        for attempt in range(attempts):
            try:
                slot = self._reset_slot(env, episode_idx)
                self._any_obs = (slot["obs"], slot["goal"], slot["lang"])
                return slot
            except Exception as e:
                print(
                    f"Error (env slot {si} reset, episode {episode_idx}): {e}"
                )
                if attempt + 1 < attempts and not self._revive(si):
                    break
        self._retired.add(si)
        print(
            f"slot {si}: environment retired; continuing with "
            f"{len(self.eval_envs) - len(self._retired)} live slots"
        )
        return None

    def _placeholder_slot(self) -> dict:
        """A done, uncounted slot for a retired env: keeps the lockstep
        batch at its static size (one compile; even GSPMD split) without
        touching any environment."""
        obs, goal, lang = self._any_obs
        return {
            "env": None,
            "ep": -1,
            "obs": obs,
            "goal": goal,
            "lang": lang,
            "key": jax.random.key(0),
            "noise_key": jax.random.key(1),
            "done": True,
            "counted": False,
            "reward": 0.0,
            "steps": 0,
            "pose": None,
        }

    def _step_slot(self, slot, actions, execution_horizon, episode_length):
        actions = actions[:execution_horizon]
        try:
            obs, reward, term, trunc, _info = slot["env"].step(actions)
            slot["obs"] = obs
            slot["reward"] = reward
            slot["done"] = term or trunc
        except Exception as e:  # sim failure -> terminate this episode
            # serial accounting breaks BEFORE episode_step += len(actions)
            # (harness.py) — don't count the failed chunk here either
            print(f"Error (env slot, episode {slot['ep']}): {e}")
            slot["done"] = True
            slot["error"] = True  # its env may be dead: don't touch it again
            return
        slot["steps"] += len(actions)
        if slot["steps"] > episode_length:
            slot["done"] = True

    def eval_checkpoints(self, eval_ckpts: list[str]) -> dict:
        cfg = self.eval_cfg
        n_envs = len(self.eval_envs)
        logs = {"eval_episodes": []}
        logs_path = Path(cfg.controller_ckpt) / f"eval_genima_{cfg.task}.json"
        execution_horizon = cfg.get("execution_horizon", 20)
        episode_length = cfg.get("episode_length", 200)
        num_eps = cfg.get("num_eval_episodes", 10)

        global_episode, global_total_reward = 0, 0.0
        for run_id, eval_ckpt in enumerate(eval_ckpts):
            print(f"\n-------- Run {run_id} (parallel x{n_envs}) ---------")
            self.load_controller_ckpt(Path(cfg.controller_ckpt) / eval_ckpt)
            # the gen/control split is a per-checkpoint probe of the
            # diffusion sub-program (not a live per-step measurement like
            # the serial harness's): re-probe after every checkpoint swap
            # so a reload can't serve a stale estimate
            self._batched_gen_est = None
            run_episode, run_total_reward = 0, 0.0
            timings = {
                "gen_time": [], "control_time": [], "fused_step_time": [],
            }

            pending = list(range(num_eps))
            while pending:
                # revive envs that errored mid-episode last round; a failed
                # revival retires the slot (sim crashes are episode-local,
                # never run-fatal — reference eval_genima.py:253-259)
                for si in sorted(self._needs_revive):
                    if si not in self._retired and not self._revive(si):
                        self._retired.add(si)
                self._needs_revive.clear()
                live_sis = [
                    si for si in range(n_envs) if si not in self._retired
                ]
                if not live_sis:
                    raise RuntimeError(
                        f"all {n_envs} parallel environments have died; "
                        f"{len(pending)} episodes remain"
                    )
                eps = pending[: len(live_sis)]
                del pending[: len(eps)]
                # assign episodes to live slots; extra live slots re-run an
                # episode uncounted (static batch -> one compile); retired
                # slots get done placeholders (batch size never changes)
                slots = [None] * n_envs
                requeue = []
                for idx, si in enumerate(live_sis):
                    ep = eps[idx % len(eps)]
                    slot = self._try_reset(si, ep)
                    if slot is None:
                        if idx < len(eps):
                            requeue.append(ep)
                        continue
                    slot["counted"] = idx < len(eps)
                    slots[si] = slot
                pending[:0] = requeue
                if not any(s is not None and s["counted"] for s in slots):
                    continue  # every reset failed; episodes were re-queued
                for si in range(n_envs):
                    if slots[si] is None:
                        slots[si] = self._placeholder_slot()
                ref_slot = next(s for s in slots if s["counted"])
                fs = ref_slot["obs"][f"{self.cameras[0]}_rgb"].shape[0]
                self.video.init(
                    ref_slot["env"],
                    enabled=cfg.get("save_video", False),
                )

                # cohort-pipelined rounds until every counted episode ends
                # (one cohort == the classic alternating loop; two cohorts
                # overlap env stepping with device compute)
                self._run_lockstep(
                    slots, fs, timings, execution_horizon, episode_length,
                    ref_slot,
                )

                for si, s in enumerate(slots):
                    if s.get("error"):
                        self._needs_revive.add(si)
                for s in (s for s in slots if s["counted"]):
                    episode_success = float(np.clip(s["reward"], 0.0, 1.0))
                    run_total_reward += episode_success
                    run_episode += 1
                    global_total_reward += episode_success
                    global_episode += 1
                    logs["eval_episodes"].append(
                        {
                            "episode": run_episode,
                            "reward": float(s["reward"]),
                            "global_episode": global_episode,
                            "global_reward": global_total_reward,
                            "steps": s["steps"],
                            "run_id": run_id,
                            "controller_ckpt": eval_ckpt,
                            "initial_object_pose": s["pose"],
                        }
                    )
                    print(
                        f"Episode {run_episode:>02}\t| Reward - run{run_id}: "
                        f"{s['reward']:.1f} ({int(run_total_reward)}/"
                        f"{run_episode}="
                        f"{run_total_reward / run_episode * 100:.1f}%)\t| "
                        f"Steps: {s['steps']}\t| Gen Time: "
                        f"{np.mean(timings['gen_time'] or [0]):.4f}s\t| "
                        f"Control Time: "
                        f"{np.mean(timings['control_time'] or [0]):.4f}s"
                    )
                logs_path.parent.mkdir(parents=True, exist_ok=True)
                with open(logs_path, "w") as f:
                    json.dump(logs, f, indent=4)
                if cfg.get("save_video", False):
                    success = "succ" if ref_slot["reward"] > 0.9 else "fail"
                    self.video.save(
                        f"{cfg.task}_ep{ref_slot['ep'] + 1}_{success}.mp4"
                    )
                if self.logger is not None:
                    self.logger.log_metrics(
                        {
                            "success": global_total_reward
                            / float(max(global_episode, 1)),
                            "episode": global_episode,
                            "gen_time": float(
                                np.mean(timings["gen_time"] or [0])
                            ),
                            "control_time": float(
                                np.mean(timings["control_time"] or [0])
                            ),
                            "fused_step_time": float(
                                np.mean(timings["fused_step_time"] or [0])
                            ),
                            "num_parallel_envs": n_envs,
                        },
                        global_episode,
                        prefix="eval_genima",
                        echo=False,
                    )

        logs["results"] = {
            "avg_success": f"{global_total_reward / float(max(global_episode, 1))}",
            "total_success": global_total_reward,
            "total_episodes": global_episode,
            "eval_type": self.eval_cfg.get("eval_type", "latest"),
            "num_parallel_envs": n_envs,
            # the lockstep program cannot be split live: gen_time /
            # control_time come from a once-per-checkpoint probe of the
            # diffusion sub-program, amortized per live episode (the serial
            # harness measures them live per step) — see EVAL.md
            "timing_attribution": "estimated",
        }
        with open(logs_path, "w") as f:
            json.dump(logs, f, indent=4)
        print("----------------------")
        print(
            f"Average of {global_episode} episodes "
            f"(parallel x{n_envs}, {len(eval_ckpts)} runs): "
            f"{global_total_reward / float(max(global_episode, 1)) * 100:.2f}%"
        )
        return logs
