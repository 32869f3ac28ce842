"""Controller training workspace — BC over rendered-target datasets.

Rebuilds the reference's ``ControllerWorkspace`` (``controller/train_act.py``):
demo collection via the env factory, action/proprio stats computed from demos
and persisted as JSON next to the checkpoints (the wrapper contract), demos
ingested into the epoch replay buffer, epoch-based training (default 1000)
with per-epoch checkpoint rotation (``latest.ckpt`` -> ``<epoch>.ckpt``,
keep ``num_checkpoints``), ``config.yaml`` saved alongside, auto-resume from
``latest.ckpt``, and update-exception tolerance (errors are logged and
training continues, ``train_act.py:228-230``).

Upgrade over the reference: the update step is a sharded jit, so controller
training data-parallelizes over the mesh (the reference is single-GPU,
README.md:313-315).
"""

from __future__ import annotations

import traceback
from pathlib import Path

import jax
import numpy as np

from genima_tpu.core import checkpoint as ckpt
from genima_tpu.core.config import save_yaml
from genima_tpu.core.logging import MetricLogger
from genima_tpu.control.replay import EpochReplayBuffer


class ControllerWorkspace:
    def __init__(
        self,
        cfg,
        agent,
        factory,
        work_dir: str | Path,
        num_demos: int = 25,
        mesh=None,
        logger: MetricLogger | None = None,
    ):
        self.cfg = cfg
        self.agent = agent
        self.factory = factory
        self.work_dir = Path(work_dir)
        self.work_dir.mkdir(parents=True, exist_ok=True)
        self.mesh = mesh
        self.logger = logger or MetricLogger(self.work_dir)

        # demos + stats, pooled across env.train_tasks
        # (reference :111 + rlbench.py:301-383, _get_demo_fn :78-85)
        demos = factory.collect_or_fetch_demos(num_demos)
        assert len(demos) > 0, "no demonstrations collected"

        # language conditioning: EACH episode's own variation description is
        # tokenized into its lang_tokens at ingestion (reference
        # rlbench_utils.py:156-157) — with task variations or multi-task
        # training every episode may carry different text
        from genima_tpu.data.tokenizer import load_tokenizer

        # real CLIP weights + the hash stand-in tokenizer silently produce
        # MEANINGLESS language conditioning at train time — the exact
        # combination load_eval_clip fails loudly for on the eval side
        # (cli/eval_genima.py). Auto-discover merges alongside clip_weights
        # (a snapshot dir, or merges.txt next to the .pt) and make the hash
        # fallback a hard error whenever clip_weights is set.
        clip_w = cfg.get("clip_weights")
        try:
            tokenizer = load_tokenizer(
                cfg.get("tokenizer_merges"),
                allow_hash_fallback=not clip_w,
                model_dir=Path(clip_w).parent if clip_w else None,
            )
        except FileNotFoundError as e:
            raise FileNotFoundError(
                f"{e}\nclip_weights={clip_w} is set: training a controller "
                "with real CLIP embeddings but hash-tokenized language "
                "would silently break conditioning. Pass tokenizer_merges= "
                "or place merges.txt alongside the CLIP checkpoint."
            ) from e

        # eval env created once to persist stats JSON + validate spaces
        env = factory.make_eval_env(
            frame_stack=cfg.get("frame_stack", 1),
            action_sequence=cfg.get("action_sequence", 20),
            stats_path=str(self.work_dir),
            use_onehot_time=cfg.get("use_onehot_time", False),
        )
        env.close()

        self.replay = EpochReplayBuffer(
            batch_size=cfg.get("batch_size", 8),
            action_sequence=cfg.get("action_sequence", 20),
            frame_stack=cfg.get("frame_stack", 1),
            nstep=cfg.get("nstep", 1),
            # sharded batches must divide the mesh; drop ragged tails
            drop_last=mesh is not None,
        )
        onehot_len = (
            int(cfg.env.get("episode_length", 200))
            if cfg.get("use_onehot_time", False)
            else None
        )
        factory.load_demos_into_replay(
            self.replay, tokenizer=tokenizer, onehot_time_len=onehot_len
        )

        params, clip_params = agent.init_params(jax.random.key(cfg.get("seed", 0)))
        self.state = agent.create_state(params, clip_params)
        self._epoch = 0
        self._num_iters = 0
        self._maybe_resume()

    # -- checkpointing ---------------------------------------------------------

    def _maybe_resume(self) -> None:
        self.resumed = False
        latest = self.work_dir / ckpt.LATEST_NAME
        if latest.exists():
            payload = ckpt.load_epoch_checkpoint(latest)
            self._epoch = int(payload["epoch"])
            self._num_iters = int(payload["num_iters"])
            self.state = self.state._replace(params=payload["agent"])
            self.resumed = True
            print(f"Resumed from {latest} at epoch {self._epoch}")

    def save_snapshot(self) -> None:
        cfg_dict = self.cfg.to_dict() if hasattr(self.cfg, "to_dict") else dict(
            self.cfg
        )
        if not hasattr(self, "_ckpt_writer"):
            self._ckpt_writer = ckpt.AsyncCheckpointer()
        # async: rotation + write overlap the next epoch's updates; the
        # single writer thread keeps rotate->write->prune ordering
        self._ckpt_writer.submit(
            ckpt.save_epoch_checkpoint,
            self.work_dir,
            epoch=self._epoch,
            num_iters=self._num_iters,
            # snapshot: update() donates the state; the copies stay valid
            agent_params=ckpt.snapshot(self.state.params),
            config=cfg_dict,
            num_checkpoints=self.cfg.get("num_checkpoints", 3),
        )
        from genima_tpu.core.distributed import is_main_process

        if is_main_process():
            save_yaml(cfg_dict, self.work_dir / "config.yaml")

    # -- training -----------------------------------------------------------------

    def train(self) -> None:
        num_epochs = self.cfg.get("num_train_epochs", 1000)
        checkpoint_every = self.cfg.get("checkpoint_every", 10)
        key = jax.random.key(self.cfg.get("seed", 0) + 7)
        from genima_tpu.core.preemption import PreemptionGuard

        preemption = PreemptionGuard.install()
        try:
            self._train_loop(num_epochs, checkpoint_every, key, preemption)
        finally:
            # flush the async writer WHILE the guard is still installed —
            # a second SIGTERM during the multi-second flush (routine in a
            # scheduler's grace window) must be absorbed, not kill the
            # write mid-rename; then drop the handler unconditionally even
            # if wait() re-raises a failed write
            try:
                if hasattr(self, "_ckpt_writer"):
                    self._ckpt_writer.wait()
            finally:
                preemption.uninstall()

    def _train_loop(self, num_epochs, checkpoint_every, key, preemption):
        while self._epoch < num_epochs:
            epoch_metrics = []
            for batch in self.replay:
                try:
                    key, sub = jax.random.split(key)
                    jbatch = {
                        k: v
                        for k, v in batch.items()
                        if k in ("images", "qpos", "actions", "is_pad", "lang_tokens")
                    }
                    if self.mesh is not None:
                        from genima_tpu.core.mesh import shard_batch

                        jbatch = shard_batch(jbatch, self.mesh)
                    self.state, metrics = self.agent.update(
                        self.state, jbatch, sub, mesh=self.mesh
                    )
                    self._num_iters += 1
                    epoch_metrics.append(
                        {k: float(v) for k, v in metrics.items()}
                    )
                except Exception:
                    # reference swallows update exceptions and continues
                    # (train_act.py:228-230)
                    traceback.print_exc()
                    continue
            self._epoch += 1
            if epoch_metrics:
                means = {
                    k: float(np.mean([m[k] for m in epoch_metrics]))
                    for k in epoch_metrics[0]
                }
                self.logger.log_metrics(
                    means, self._epoch, prefix="train_act", echo=True
                )
            if self._epoch % checkpoint_every == 0 or self._epoch == num_epochs:
                self.save_snapshot()
            if preemption.requested:
                # preempted (SIGTERM): snapshot through the normal rotation
                # path and exit clean; restart auto-resumes from latest.ckpt
                if (
                    self._epoch % checkpoint_every != 0
                    and self._epoch != num_epochs
                ):
                    self.save_snapshot()
                print(
                    f"Preemption requested: saved latest.ckpt at epoch "
                    f"{self._epoch}, exiting (restart auto-resumes)"
                )
                break
