"""Real RLBench environment bindings (import-gated).

Rebuilds the reference's ``GenimaRLBenchEnv`` / ``GenimaRLBenchFactory``
(``controller/env/rlbench.py``) against rlbench/pyrep when they are
installed (``scripts/install_rlbench.sh`` in the reference). The simulator
is host-side C++ (CoppeliaSim); the framework talks to it only at the
host<->device boundary, so nothing here touches JAX.

Key behaviors preserved:

* lazy sim launch; Colosseum ``EnvironmentExt`` with a perturbation config
  when enabled (``rlbench.py:153-165``),
* absolute ``JointPosition(True)`` + ``Discrete`` gripper action mode with
  hard-coded Franka joint limits (``rlbench_utils.py:164-215``),
* ``get_demos`` -> DemoStep conversion asserting ``joint_position_action``
  in misc (``rlbench.py:179-221``),
* ``reset_to_demo(idx)`` restoring a recorded episode's initial scene state
  (``rlbench.py:234-252``),
* observation dict: CHW ``{cam}_rgb``, ``low_dim_state`` =
  [gripper_open, joint_positions], CLIP ``lang_tokens``.
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - requires CoppeliaSim install
    import gymnasium as gym
    from gymnasium import spaces
    from rlbench import Environment
    from rlbench.action_modes.action_mode import MoveArmThenGripper
    from rlbench.action_modes.arm_action_modes import (
        EndEffectorPoseViaPlanning,
        JointPosition,
    )
    from rlbench.action_modes.gripper_action_modes import Discrete
    from rlbench.observation_config import ObservationConfig
    from rlbench.utils import name_to_task_class

    RLBENCH_AVAILABLE = True
except ImportError:  # pragma: no cover
    RLBENCH_AVAILABLE = False

from genima_tpu.envs.demo import (
    ActionModeType,
    DemoStep,
    compute_action_stats,
    compute_proprio_stats,
)

# Franka Panda joint limits (reference rlbench_utils.py:164-183)
FRANKA_LOW = np.array(
    [-2.8973, -1.7628, -2.8973, -3.0718, -2.8973, -0.0175, -2.8973], np.float32
)
FRANKA_HIGH = np.array(
    [2.8973, 1.7628, 2.8973, -0.0698, 2.8973, 3.7525, 2.8973], np.float32
)

# end-effector workspace bounds: x, y, z, quat(4), gripper — limited by the
# RLBench scene workspace (reference rlbench_utils.py:186-201)
EE_LOW = np.array([-0.3, -0.5, 0.6] + 3 * [-1.0] + 2 * [0.0], np.float32)
EE_HIGH = np.array([0.7, 0.5, 1.6] + 4 * [1.0] + [1.0], np.float32)


def _require_rlbench():
    if not RLBENCH_AVAILABLE:
        raise ImportError(
            "rlbench/pyrep are not installed; install CoppeliaSim + PyRep + "
            "RLBench (see the reference scripts/install_rlbench.sh) or use "
            "envs.fake.FakeRLBenchFactory"
        )


if RLBENCH_AVAILABLE:  # pragma: no cover - exercised only with a simulator

    def _make_obs_config(cameras, image_size):
        obs_config = ObservationConfig()
        obs_config.set_all(False)
        for cam_name in cameras:
            cam = getattr(obs_config, f"{cam_name}_camera")
            cam.rgb = True
            cam.image_size = (image_size, image_size)
        obs_config.joint_positions = True
        obs_config.gripper_open = True
        return obs_config

    class GenimaRLBenchEnv(gym.Env):
        def __init__(
            self,
            task_name: str,
            cameras=("wrist", "front", "right_shoulder", "left_shoulder"),
            image_size: int = 256,
            dataset_root: str = "",
            headless: bool = True,
            colosseum_task_config: str | None = None,
            action_mode: str = "JOINT_POSITION",
        ):
            self.task_name = task_name
            self.cameras = list(cameras)
            self.image_size = image_size
            self.dataset_root = dataset_root
            self.headless = headless
            self.colosseum_task_config = colosseum_task_config
            self.action_mode_type = ActionModeType(action_mode)
            self._env = None
            self._task = None
            self._descriptions = [task_name.replace("_", " ")]
            self._lang_tokens = np.zeros((1, 77), np.int32)

            obs_spaces = {
                f"{cam}_rgb": spaces.Box(
                    0, 255, (3, image_size, image_size), np.uint8
                )
                for cam in self.cameras
            }
            obs_spaces["low_dim_state"] = spaces.Box(
                -np.inf, np.inf, (8,), np.float32
            )
            obs_spaces["lang_tokens"] = spaces.Box(0, 50000, (1, 77), np.int32)
            self.observation_space = spaces.Dict(obs_spaces)
            if self.action_mode_type is ActionModeType.END_EFFECTOR_POSE:
                # x, y, z, quat, gripper (reference rlbench_utils.py:186-201)
                self.action_space = spaces.Box(EE_LOW, EE_HIGH, dtype=np.float32)
            else:
                self.action_space = spaces.Box(
                    np.concatenate([FRANKA_LOW, [0.0]]),
                    np.concatenate([FRANKA_HIGH, [1.0]]),
                    dtype=np.float32,
                )

        # -- sim lifecycle (lazy launch, rlbench.py:150-177) ---------------

        def _launch(self):
            if self._env is not None:
                return
            if self.action_mode_type is ActionModeType.END_EFFECTOR_POSE:
                # EE pose via sampling-based planning, workspace-bounded
                # (reference rlbench_utils.py:186-201); demo INGESTION for
                # this mode is unimplemented here exactly as in the
                # reference (rlbench.py:327-330 raises NotImplementedError)
                low, high = EE_LOW, EE_HIGH

                class _BoundedMoveArmThenGripper(MoveArmThenGripper):
                    def action_bounds(self):
                        return low, high

                action_mode = _BoundedMoveArmThenGripper(
                    arm_action_mode=EndEffectorPoseViaPlanning(),
                    gripper_action_mode=Discrete(),
                )
            else:
                flow = np.concatenate([FRANKA_LOW, [0.0]])
                fhigh = np.concatenate([FRANKA_HIGH, [1.0]])

                class _BoundedMoveArmThenGripper(MoveArmThenGripper):
                    def action_bounds(self):
                        return flow, fhigh

                action_mode = _BoundedMoveArmThenGripper(
                    arm_action_mode=JointPosition(True),  # ABSOLUTE positions
                    gripper_action_mode=Discrete(),
                )
            self._env_action_mode = action_mode
            obs_config = _make_obs_config(self.cameras, self.image_size)
            if self.colosseum_task_config:
                from colosseum.rlbench.extensions.environment import (
                    EnvironmentExt,
                )
                from omegaconf import OmegaConf

                self._env = EnvironmentExt(
                    action_mode,
                    obs_config=obs_config,
                    dataset_root=self.dataset_root,
                    headless=self.headless,
                    env_config=OmegaConf.load(self.colosseum_task_config).env,
                )
            else:
                self._env = Environment(
                    action_mode,
                    obs_config=obs_config,
                    dataset_root=self.dataset_root,
                    headless=self.headless,
                )
            self._env.launch()
            self._task = self._env.get_task(name_to_task_class(self.task_name))

        def set_lang_tokens(self, tokens):
            self._lang_tokens = np.asarray(tokens, np.int32).reshape(1, 77)

        def _extract_obs(self, obs) -> dict:
            out = {}
            for cam in self.cameras:
                rgb = getattr(obs, f"{cam}_rgb")
                out[f"{cam}_rgb"] = np.transpose(rgb, (2, 0, 1)).astype(np.uint8)
            out["low_dim_state"] = np.concatenate(
                [[obs.gripper_open], obs.joint_positions]
            ).astype(np.float32)
            out["lang_tokens"] = self._lang_tokens.copy()
            return out

        def reset(self, seed=None, options=None):
            self._launch()
            descs, obs = self._task.reset()
            self._descriptions = descs
            return self._extract_obs(obs), {
                "descriptions": descs[0],
                "demo": 0,
            }

        def reset_to_demo(self, idx: int):
            """Restore a recorded episode's initial configuration
            (rlbench.py:234-252)."""
            self._launch()
            demo = self._task.get_demos(
                1,
                live_demos=False,
                random_selection=False,
                from_episode_number=idx,
            )[0]
            self._task.reset_to_demo(demo)
            obs = self._task.get_observation()
            return None, self._extract_obs(obs)

        def initial_object_pose(self):
            """waypoint0's pose from the RLBench scene workspace — logged
            per episode for visualization (reference
            ``controller/eval_genima.py:147-152``)."""
            try:
                return list(
                    self._env._scene._workspace.get_object(
                        "waypoint0"
                    ).get_pose()
                )
            except Exception:
                return None

        def step(self, action):
            obs, reward, terminate = self._task.step(np.asarray(action))
            return self._extract_obs(obs), float(reward), bool(terminate), (
                False
            ), {}

        def get_demos(self, n: int, desc: str | None = None) -> list[list[DemoStep]]:
            """``desc`` is stamped into every step's ``misc["descriptions"]``
            (the reference stamps the task's reset description at conversion,
            ``rlbench_utils.py:16-27``, so each episode carries its own text
            for per-episode language conditioning)."""
            if self.action_mode_type is ActionModeType.END_EFFECTOR_POSE:
                # demo-action rescaling for EE pose is unimplemented in the
                # reference too (rlbench.py:327-330)
                raise NotImplementedError(
                    "demo ingestion for END_EFFECTOR_POSE is not "
                    "implemented (reference rlbench.py:327-330 raises the "
                    "same); train with JOINT_POSITION"
                )
            self._launch()
            raw = self._task.get_demos(n, live_demos=False)
            demos = []
            for demo in raw:
                steps = []
                for ts in demo:
                    assert "joint_position_action" in ts.misc, (
                        "Demos are missing joint_position_action; regenerate "
                        "the dataset with a recent RLBench "
                        "(reference rlbench.py:196-206)"
                    )
                    misc = dict(ts.misc)
                    if desc is not None:
                        misc["descriptions"] = desc
                    steps.append(
                        DemoStep(
                            joint_positions=np.asarray(ts.joint_positions),
                            gripper_open=float(ts.gripper_open),
                            observation={
                                **{
                                    f"{cam}_rgb": np.transpose(
                                        getattr(ts, f"{cam}_rgb"), (2, 0, 1)
                                    )
                                    for cam in self.cameras
                                },
                                "low_dim_state": np.concatenate(
                                    [[ts.gripper_open], ts.joint_positions]
                                ).astype(np.float32),
                            },
                            gripper_matrix=np.asarray(ts.gripper_matrix),
                            misc=misc,
                        )
                    )
                demos.append(steps)
            return demos

        def close(self):
            if self._env is not None:
                self._env.shutdown()
                self._env = None


def _collect_demos_child(kwargs, task_names, n, out):
    """Child-process body: the sim launches once here, collects ``n`` demos
    per task (the reference ``_get_demo_fn`` loop, ``rlbench.py:78-85``),
    each task's reset description stamped into its episodes' misc."""
    for task in task_names:
        task_kwargs = dict(kwargs, task_name=task)
        env = GenimaRLBenchEnv(**task_kwargs)
        _, info = env.reset()
        desc = info.get("descriptions", task.replace("_", " "))
        out.extend(env.get_demos(n, desc=desc))
        print(f"Loaded demos for {task}, total num of demos: {len(out)}")
        env.close()


class GenimaRLBenchFactory:
    """Factory with the FakeRLBenchFactory interface over the real sim.

    Demo collection runs in a child process (the sim cannot be launched
    twice in-process; reference ``rlbench.py:301-316``). Multi-task: pass
    ``task_names=[...]`` and ``num_demos`` are collected per task, pooled,
    with each task's own description on its episodes.

    The "fetch" half (the reference's cache the method name promises):
    collected demos are pickled to ``<demo_cache_dir>/demos_<task>_<n>.pkl``
    and loaded from there on re-runs instead of re-running the simulator.
    """

    def __init__(self, task_names=None, demo_cache_dir=None, **env_kwargs):
        _require_rlbench()
        self.env_kwargs = env_kwargs
        self.task_names = list(
            task_names if task_names else [env_kwargs["task_name"]]
        )
        self.demo_cache_dir = demo_cache_dir
        self._raw_demos = None
        self.action_stats = None
        self.proprio_stats = None

    def make_env(self, task_name: str | None = None):
        kwargs = dict(self.env_kwargs)
        kwargs["task_name"] = task_name or self.task_names[0]
        return GenimaRLBenchEnv(**kwargs)

    # -- demo cache ("fetch") ---------------------------------------------

    def _cache_path(self, task: str, n: int):
        from pathlib import Path

        if not self.demo_cache_dir:
            return None
        return Path(self.demo_cache_dir) / f"demos_{task}_{n}.pkl"

    def _fetch_cached(self, num_demos: int):
        """All-or-nothing cache read: every task must be cached."""
        import pickle

        demos = []
        for task in self.task_names:
            path = self._cache_path(task, num_demos)
            if path is None or not path.exists():
                return None
            with open(path, "rb") as f:
                demos.extend(pickle.load(f))
            print(f"Fetched cached demos for {task} from {path}")
        return demos

    def _store_cache(self, demos, num_demos: int):
        import pickle

        if not self.demo_cache_dir:
            return
        per_task = len(demos) // len(self.task_names)
        for i, task in enumerate(self.task_names):
            path = self._cache_path(task, num_demos)
            path.parent.mkdir(parents=True, exist_ok=True)
            with open(path, "wb") as f:
                pickle.dump(demos[i * per_task : (i + 1) * per_task], f)

    def collect_or_fetch_demos(self, num_demos: int):
        demos = self._fetch_cached(num_demos)
        if demos is None:
            import multiprocessing as mp

            manager = mp.Manager()
            demo_list = manager.list()
            p = mp.Process(
                target=_collect_demos_child,
                args=(self.env_kwargs, self.task_names, num_demos, demo_list),
            )
            p.start()
            p.join()
            demos = list(demo_list)
            assert demos, (
                "demo collection produced no demos — the simulator child "
                "process failed (see its traceback above)"
            )
            self._store_cache(demos, num_demos)
        self._raw_demos = demos
        self.action_stats = compute_action_stats(self._raw_demos)
        self.proprio_stats = compute_proprio_stats(self._raw_demos)
        return self._raw_demos

    def make_eval_env(self, *, episode_length=200, frame_stack=1,
                      action_sequence=20, stats_path=None,
                      action_stats=None, proprio_stats=None,
                      use_onehot_time=False, task_name=None):
        from genima_tpu.envs.wrappers import wrap_env

        env = self.make_env(task_name)
        return wrap_env(
            env,
            episode_length=episode_length,
            frame_stack=frame_stack,
            action_sequence=action_sequence,
            action_stats=action_stats or self.action_stats,
            proprio_stats=proprio_stats or self.proprio_stats,
            stats_path=stats_path,
            use_onehot_time=use_onehot_time,
        )

    def make_train_env(self, num_train_envs: int = 1, **wrap_kwargs):
        """Subprocess-vectorized train envs over the real sim (the
        reference's ``gym.vector.AsyncVectorEnv``, ``rlbench.py:256-264``).
        BC training never steps them; the surface exists for parity."""
        import gymnasium as gym

        def _make():
            return self.make_eval_env(**wrap_kwargs)

        return gym.vector.AsyncVectorEnv(
            [_make for _ in range(num_train_envs)]
        )

    def load_demos_into_replay(
        self, buffer, cameras=None, lang_tokens=None, tokenizer=None,
        onehot_time_len=None,
    ):
        from genima_tpu.envs.demo import load_demos_into_replay

        cameras = cameras or self.env_kwargs.get(
            "cameras", ["wrist", "front", "right_shoulder", "left_shoulder"]
        )
        load_demos_into_replay(
            buffer,
            self._raw_demos,
            list(cameras),
            self.action_stats,
            self.proprio_stats,
            lang_tokens=lang_tokens,
            tokenizer=tokenizer,
            onehot_time_len=onehot_time_len,
        )


def _train_tasks(env_cfg: dict) -> list[str]:
    """``env.train_tasks`` (list or comma-separated string — the reference
    README: "For multi-task training just provide a comma-separated list"),
    falling back to the single ``env.task``."""
    tasks = env_cfg.get("train_tasks")
    if tasks:
        if isinstance(tasks, str):
            tasks = [t.strip() for t in tasks.split(",") if t.strip()]
        return list(tasks)
    return [env_cfg.get("task", "fake_reach")]


def make_factory(env_cfg: dict):
    """Factory dispatch: real RLBench when requested+available, fake for CI.

    Consumes ``env.train_tasks`` (reference ``controller.yaml:25``): one
    pooled demo collection across all listed tasks, the released flagship
    being a 25-task agent (reference README.md:52)."""
    kind = env_cfg.get("factory", "rlbench")
    tasks = _train_tasks(env_cfg)
    if kind == "fake":
        from genima_tpu.envs.fake import FakeRLBenchFactory

        return FakeRLBenchFactory(
            task_names=tasks,
            task_name=tasks[0],
            episode_length=env_cfg.get("episode_length", 60),
            image_size=env_cfg.get("image_size", 64),
            goal_observable=env_cfg.get("goal_observable", False),
            success_tol=env_cfg.get("success_tol", 0.1),
        )
    if kind == "rendered":
        # demos from an on-disk (rendered) dataset tree — the reference's
        # train-act flow (env.dataset_root points at rendered data,
        # controller/env/rlbench.py:301-383); closed-loop eval envs come
        # from the factory named by env.eval_env_factory (fake for CI,
        # rlbench on sim machines)
        from genima_tpu.envs.rendered import RenderedDemoFactory

        inner_kind = env_cfg.get("eval_env_factory")
        eval_factory = None
        if inner_kind:
            inner_cfg = dict(env_cfg)
            inner_cfg["factory"] = inner_kind
            eval_factory = make_factory(inner_cfg)
        return RenderedDemoFactory(
            dataset_root=env_cfg["dataset_root"],
            task_names=tasks,
            variation=env_cfg.get("variation", 0),
            cameras=tuple(
                env_cfg.get(
                    "cameras",
                    ("wrist", "front", "right_shoulder", "left_shoulder"),
                )
            ),
            eval_factory=eval_factory,
        )
    _require_rlbench()
    return GenimaRLBenchFactory(
        task_names=tasks,
        task_name=tasks[0],
        demo_cache_dir=env_cfg.get("demo_cache_dir"),
        cameras=tuple(env_cfg.get(
            "cameras", ("wrist", "front", "right_shoulder", "left_shoulder")
        )),
        image_size=env_cfg.get("image_size", 256),
        dataset_root=env_cfg.get("dataset_root", ""),
        headless=env_cfg.get("headless", True),
        colosseum_task_config=(
            env_cfg.get("colosseum_task_config")
            if env_cfg.get("colosseum_use")
            else None
        ),
        action_mode=env_cfg.get("action_mode", "JOINT_POSITION"),
    )
