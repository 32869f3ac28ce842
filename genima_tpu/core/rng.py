"""Seeding and RNG-stream utilities.

The reference seeds torch/np/random globally (``train_controlnet_genima.py:996``,
``train_act.py:89``) and uses a fixed per-episode ``torch.Generator(seed)``
for diffusion sampling (``eval_genima.py:129-135``). JAX keys are explicit;
``RngStream`` provides a documented, deterministic key scheme: a root seed
folds in a monotone counter, so "the n-th draw for seed s" is reproducible
regardless of call sites (bitwise parity with torch RNG is not a goal).
"""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """Seed python/numpy and return a root JAX key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


class RngStream:
    """A stateful, reproducible stream of JAX PRNG keys."""

    def __init__(self, seed: int):
        self._seed = int(seed)
        self._root = jax.random.key(self._seed)
        self._counter = 0

    @property
    def seed(self) -> int:
        return self._seed

    def next(self) -> jax.Array:
        key = jax.random.fold_in(self._root, self._counter)
        self._counter += 1
        return key

    def reset(self) -> None:
        """Restart the stream (the per-episode fixed-seed generator pattern)."""
        self._counter = 0
