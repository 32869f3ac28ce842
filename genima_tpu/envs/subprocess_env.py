"""Subprocess-isolated environments for lockstep-parallel eval on real sims.

CoppeliaSim binds ONE simulator per OS process (the repo's own demo
collection runs in a child process for this reason, and the reference
vectorizes train envs with ``gym.vector.AsyncVectorEnv``,
``controller/env/rlbench.py:256-264``). Lockstep-parallel evaluation of N
real episodes therefore needs each environment in its own child process.

``SubprocessEnv`` spawns a child that constructs a fully-wrapped env from
a picklable ``(ctor, kwargs)`` spec and exposes exactly the surface the
parallel workspace drives:

* ``reset() -> (obs, info)`` / ``step(actions)``,
* ``reset_to_demo_wrapped(idx) -> (obs, info)`` — demo restore + the
  innermost-first observation re-wrap done INSIDE the child, where the
  wrapper chain lives (``envs.wrappers.rewrap_obs``),
* ``initial_object_pose()``,
* ``render_frame()`` for video recording,
* ``observation_space`` / ``action_space`` (fetched once at startup).

The child is spawned (never forked: the parent holds a live XLA client
whose threads do not survive fork) and never touches JAX — simulator and
numpy only. Errors cross the pipe as tracebacks and re-raise host-side as
``RuntimeError``; the parallel workspace already maps step-time errors to
episode termination, matching the serial harness's sim-failure handling.
"""

from __future__ import annotations

import multiprocessing as mp
import traceback

import numpy as np


def _child_main(conn, ctor, kwargs) -> None:
    try:
        env = ctor(**kwargs)
    except Exception:
        conn.send(("err", traceback.format_exc()))
        conn.close()
        return
    conn.send(("ok", (env.observation_space, env.action_space)))
    while True:
        try:
            cmd, payload = conn.recv()
        except (EOFError, KeyboardInterrupt):
            break
        if cmd == "close":
            # leave the loop even when close() raises — the host is about
            # to join() and a wedged sim must not stall shutdown
            try:
                if hasattr(env, "close"):
                    env.close()
                conn.send(("ok", None))
            except Exception:
                conn.send(("err", traceback.format_exc()))
            break
        try:
            if cmd == "reset":
                res = env.reset()
            elif cmd == "step":
                res = env.step(payload)
            elif cmd == "reset_to_demo_wrapped":
                from genima_tpu.envs.wrappers import rewrap_obs

                obs, info = env.reset()
                if hasattr(env.unwrapped, "reset_to_demo"):
                    _, raw = env.unwrapped.reset_to_demo(idx=payload)
                    obs = rewrap_obs(env, raw, obs)
                res = (obs, info)
            elif cmd == "initial_object_pose":
                fn = getattr(env.unwrapped, "initial_object_pose", None)
                res = fn() if callable(fn) else None
            elif cmd == "render_frame":
                from genima_tpu.eval.video import frame_from_env

                res = frame_from_env(env)  # None when no frame (host guards)
            else:
                raise ValueError(f"unknown SubprocessEnv command {cmd!r}")
            conn.send(("ok", res))
        except Exception:
            conn.send(("err", traceback.format_exc()))
    conn.close()


class SubprocessEnv:
    """Host-side proxy for a wrapped env living in a spawned child.

    ``ctor`` must be a module-level callable (picklable by reference) that
    builds and returns the fully-wrapped env; ``kwargs`` must pickle.
    """

    def __init__(self, ctor, _defer_handshake: bool = False, **kwargs):
        self._ctor = ctor
        self._kwargs = kwargs
        self._ctor_name = getattr(ctor, "__qualname__", repr(ctor))
        self._spawn()
        if not _defer_handshake:
            self._handshake()

    def _spawn(self) -> None:
        ctx = mp.get_context("spawn")
        self._parent, child = ctx.Pipe()
        self._proc = ctx.Process(
            target=_child_main,
            args=(child, self._ctor, self._kwargs),
            daemon=True,
        )
        self._proc.start()
        child.close()

    def respawn(self) -> None:
        """Tear down the (possibly dead) child and build a fresh one from
        the stored ctor spec. A crashed CoppeliaSim takes its whole process
        with it (routine in long evals; the serial harness tolerates it per
        episode, reference ``eval_genima.py:253-259``) — respawning lets the
        lockstep workspace keep the slot instead of aborting every remaining
        episode of the run."""
        self.close()
        self._spawn()
        self._handshake()

    def _handshake(self) -> None:
        """Block until the child finished constructing its env (simulator
        startup); ``start_subprocess_envs`` defers this so N startups
        overlap instead of paying N serial launches."""
        status, payload = self._recv("startup")
        if status == "err":
            raise RuntimeError(
                f"SubprocessEnv child ({self._ctor_name}) failed:\n{payload}"
            )
        self.observation_space, self.action_space = payload

    def _recv(self, what: str):
        try:
            return self._parent.recv()
        except EOFError:
            # the child died without reaching Python error handling (e.g.
            # a simulator abort or an import crash during spawn unpickling)
            code = self._proc.exitcode
            raise RuntimeError(
                f"SubprocessEnv child ({self._ctor_name}) died during "
                f"{what} without a traceback (exitcode {code}); check the "
                "child's stderr above"
            ) from None

    def _call(self, cmd, payload=None):
        self._parent.send((cmd, payload))
        status, res = self._recv(cmd)
        if status == "err":
            raise RuntimeError(f"SubprocessEnv child error:\n{res}")
        return res

    def reset(self):
        return self._call("reset")

    def step(self, actions):
        return self._call("step", np.asarray(actions))

    def reset_to_demo_wrapped(self, idx: int):
        return self._call("reset_to_demo_wrapped", int(idx))

    def initial_object_pose(self):
        return self._call("initial_object_pose")

    def render_frame(self):
        return self._call("render_frame")

    @property
    def unwrapped(self):
        # the chain lives in the child; the proxy is its own base. The
        # parallel workspace detects the proxy via reset_to_demo_wrapped.
        return self

    def close(self):
        try:
            self._call("close")
        except Exception:
            pass
        self._proc.join(timeout=10)
        if self._proc.is_alive():
            self._proc.terminate()


def start_subprocess_envs(ctor, n: int, **kwargs) -> list[SubprocessEnv]:
    """Spawn N children first, THEN collect their startup handshakes, so N
    simulator launches overlap (a serial loop would pay N full startups)."""
    envs = [
        SubprocessEnv(ctor, _defer_handshake=True, **kwargs)
        for _ in range(n)
    ]
    for env in envs:
        env._handshake()
    return envs
