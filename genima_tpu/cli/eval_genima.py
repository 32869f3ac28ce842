"""Closed-loop Genima evaluation CLI — hydra-style usage preserved:

    python -m genima_tpu.cli.eval_genima controller_ckpt=/path/ckpt \
        diffusion_ckpt=/path/diffusion task=open_box num_diffusion_steps=5

Merges the SAVED TRAIN CONFIG with eval-time overrides (the reference
contract, ``controller/eval_genima.py:388-409``).
"""

from __future__ import annotations

import sys
from pathlib import Path

from genima_tpu.core.config import instantiate, load_config, parse_cli
from genima_tpu.core.logging import MetricLogger
from genima_tpu.core.rng import seed_everything
from genima_tpu.data.tokenizer import load_tokenizer

DEFAULT_CFG = Path(__file__).parent.parent / "cfgs" / "eval_genima.yaml"


def load_train_and_eval_cfg(argv):
    overrides, flags = parse_cli(argv)
    eval_cfg = load_config(flags.get("config_name", DEFAULT_CFG), overrides)
    train_cfg = None
    train_cfg_path = Path(eval_cfg.controller_ckpt) / "config.yaml"
    if train_cfg_path.exists():
        train_cfg = load_config(train_cfg_path, resolve_interp=False)
    return eval_cfg, train_cfg


def build_controller_agent(train_cfg, eval_cfg):
    from genima_tpu.cli.train_act import build_agent

    if train_cfg is not None and "method" in train_cfg:
        return build_agent(train_cfg)
    from genima_tpu.control.policy import GenimaACTAgent

    return GenimaACTAgent()


def load_eval_clip(eval_cfg, train_cfg, clip_params):
    """Load the frozen CLIP text tower for eval.

    The controller checkpoint strips CLIP params (reference contract,
    ``controller/train_act.py:262-279``), so eval must reload them from the
    pretrained file the way the reference lazily loads ViT-B/32
    (``controller/method/genima_act.py:314-346``). A controller trained with
    real CLIP embeddings evaluated against random-init CLIP would silently
    produce garbage language conditioning — fail loudly instead.
    """
    path = eval_cfg.get("clip_weights")
    source = "eval config"
    if not path:
        path = (train_cfg or {}).get("clip_weights")
        source = "saved train config"
    if not path:
        return clip_params
    if not Path(path).exists():
        raise FileNotFoundError(
            f"clip_weights={path} (from the {source}) does not "
            "exist at eval time. The controller was trained with pretrained "
            "CLIP language embeddings; evaluating with random-init CLIP "
            "would silently break language conditioning. Provide the file "
            "or override clip_weights explicitly."
        )
    from genima_tpu.weights.torch_port import (
        load_openai_clip_text,
        load_torch_file,
    )

    clip_params = load_openai_clip_text(load_torch_file(path), clip_params)
    print(f"loaded CLIP text tower from {path}")
    return clip_params


def build_eval_env(eval_cfg, train_cfg, stats_path):
    from genima_tpu.envs.rlbench import make_factory

    env_cfg = dict(eval_cfg.get("env", {}))
    env_cfg.setdefault("task", eval_cfg.task)
    env_cfg["episode_length"] = eval_cfg.get("episode_length", 200)
    if eval_cfg.get("colosseum_use"):
        env_cfg["colosseum_use"] = True
        env_cfg["colosseum_task_config"] = eval_cfg.colosseum_task_config
    factory = make_factory(env_cfg)
    fs = (train_cfg or {}).get("frame_stack", 1)
    seq = (train_cfg or {}).get("action_sequence", 20)
    # use_onehot_time follows the TRAIN config (the wrapper changed the
    # observation space the controller was trained on); eval re-applies it
    onehot = bool((train_cfg or {}).get("use_onehot_time", False))
    return factory.make_eval_env(
        episode_length=eval_cfg.get("episode_length", 200),
        frame_stack=fs,
        action_sequence=seq,
        stats_path=str(stats_path),
        action_stats=None,  # reload from the persisted JSON (eval contract)
        proprio_stats=None,
        use_onehot_time=onehot,
        # multi-task checkpoints: evaluate the task the eval config names,
        # not train_tasks[0]
        task_name=env_cfg.get("task"),
    )


def main(argv=None, with_diffusion: bool = True):
    eval_cfg, train_cfg = load_train_and_eval_cfg(
        argv if argv is not None else sys.argv[1:]
    )
    seed_everything(eval_cfg.get("seed", 2))

    n_par = int(eval_cfg.get("num_parallel_envs", 1))
    real_parallel = n_par > 1 and (
        eval_cfg.get("env", {}).get("factory", "rlbench") != "fake"
    )
    # the real-sim parallel path builds its envs in child processes —
    # don't construct (and then orphan) a parent-side env for it
    eval_env = (
        None
        if real_parallel
        else build_eval_env(eval_cfg, train_cfg, eval_cfg.controller_ckpt)
    )
    controller_agent = build_controller_agent(train_cfg, eval_cfg)
    params, clip_params = controller_agent.init_params(
        __import__("jax").random.key(eval_cfg.get("seed", 2))
    )
    clip_params = load_eval_clip(eval_cfg, train_cfg, clip_params)
    controller_agent.create_state(params, clip_params)

    diffusion_agent = None
    if with_diffusion:
        node = dict(eval_cfg.get("diffusion_agent", {}))
        node.setdefault("_target_", "genima_tpu.eval.agents.SDControlNetAgent")
        node.setdefault("diffusion_ckpt", eval_cfg.diffusion_ckpt)
        node.setdefault("sd_ckpt", eval_cfg.get("sd_ckpt"))
        node.setdefault("resolution", eval_cfg.get("image_resolution", 512))
        node.setdefault("num_inference_steps",
                        eval_cfg.get("num_diffusion_steps", 5))
        node.setdefault("guidance_scale", eval_cfg.get("guidance_scale", 0.0))
        node.setdefault("seed", eval_cfg.get("diffusion_seed", 2))
        node.setdefault("tokenizer_merges", eval_cfg.get("tokenizer_merges"))
        node.setdefault("autoencoder", eval_cfg.get("autoencoder", ""))
        node.setdefault(
            "backend",
            "fused"
            if eval_cfg.get("enable_xformers_memory_efficient_attention", True)
            else "xla",
        )
        diffusion_agent = instantiate(node)

    logger = MetricLogger(
        Path(eval_cfg.controller_ckpt) / "eval_logs",
        use_wandb=eval_cfg.get("wandb", {}).get("use", False),
    )
    if n_par > 1:
        # lockstep-batched eval: N envs, one batched TPU program per control
        # step (the reference's eval is fully serial — model-card.md:39)
        from genima_tpu.eval.parallel import ParallelGenimaEvalWorkspace

        if real_parallel:
            # CoppeliaSim allows ONE simulator per process (the repo's own
            # demo collection uses a child process for this reason), so
            # each real env lives in its own spawned child; startups overlap
            from genima_tpu.envs.subprocess_env import start_subprocess_envs

            envs = start_subprocess_envs(
                build_eval_env,
                n_par,
                eval_cfg=eval_cfg,
                train_cfg=train_cfg,
                stats_path=str(eval_cfg.controller_ckpt),
            )
        else:
            envs = [eval_env] + [
                build_eval_env(eval_cfg, train_cfg, eval_cfg.controller_ckpt)
                for _ in range(n_par - 1)
            ]
        mesh = None
        n_tp = int(eval_cfg.get("eval_tensor_parallel", 0) or 1)
        if eval_cfg.get("eval_data_parallel", False) or n_tp > 1:
            # shard the lockstep batch across the chips (DP serving),
            # optionally with the diffusion weights TP-sharded over an
            # fsdp axis of size eval_tensor_parallel
            import jax

            from genima_tpu.core.mesh import make_mesh

            n_chips = int(
                eval_cfg.get("eval_mesh_devices", 0) or jax.device_count()
            )
            if n_chips % n_tp:
                raise ValueError(
                    f"eval_tensor_parallel ({n_tp}) must divide the mesh "
                    f"device count ({n_chips})"
                )
            mesh = make_mesh(n_data=n_chips // n_tp, n_fsdp=n_tp)
        workspace = ParallelGenimaEvalWorkspace(
            eval_cfg,
            envs,
            controller_agent,
            diffusion_agent=diffusion_agent,
            cameras=eval_cfg.get("env", {}).get(
                "cameras",
                ["wrist", "front", "right_shoulder", "left_shoulder"],
            ),
            logger=logger,
            tokenizer=load_tokenizer(eval_cfg.get("tokenizer_merges")),
            mesh=mesh,
        )
        return workspace.eval()

    from genima_tpu.eval.harness import GenimaEvalWorkspace

    workspace = GenimaEvalWorkspace(
        eval_cfg,
        eval_env,
        controller_agent,
        diffusion_agent=diffusion_agent,
        cameras=eval_cfg.get("env", {}).get(
            "cameras", ["wrist", "front", "right_shoulder", "left_shoulder"]
        ),
        logger=logger,
        tokenizer=load_tokenizer(eval_cfg.get("tokenizer_merges")),
    )
    return workspace.eval()


if __name__ == "__main__":
    main()
