"""Controller (ACT) training CLI — hydra-style usage preserved:

    python -m genima_tpu.cli.train_act env.task=take_lid_off_saucepan \
        env.dataset_root=/data/take_lid_off_saucepan_rnd_bg work_dir=./ckpt

(reference ``controller/train_act.py`` entry point).
"""

from __future__ import annotations

import sys
from pathlib import Path

from genima_tpu.core.config import load_config, parse_cli
from genima_tpu.core.logging import MetricLogger
from genima_tpu.core.mesh import make_mesh
from genima_tpu.core.rng import seed_everything

DEFAULT_CFG = Path(__file__).parent.parent / "cfgs" / "controller.yaml"


def build_agent(cfg):
    from genima_tpu.nn.act import ACTConfig

    method = dict(cfg.method)
    method.pop("_target_", None)
    act_kwargs = {k: v for k, v in method.pop("act_cfg").items()}
    if cfg.get("use_onehot_time", False):
        # OnehotTime appends an episode_length-long one-hot to
        # low_dim_state; the proprio projection input grows to match
        # (robobase sizes the network from the wrapped obs space)
        act_kwargs["state_dim"] = int(act_kwargs.get("state_dim", 8)) + int(
            cfg.env.get("episode_length", 200)
        )
    act_cfg = ACTConfig(**act_kwargs)
    from genima_tpu.control.policy import GenimaACTAgent

    return GenimaACTAgent(act_cfg=act_cfg, **method)


def load_agent_pretrained(agent, cfg, params, clip_params, resumed=False):
    """Optional pretrained weights: torchvision resnet18 backbone and the
    OpenAI CLIP text tower (the reference downloads both lazily).

    On resume, only the frozen CLIP tower is (re)loaded: the trainable
    ResNet backbone lives in the checkpoint and must NOT be clobbered with
    fresh torchvision weights (the reference restores the backbone from the
    snapshot and only lazily reloads CLIP, ``genima_act.py:314-346`` — its
    snapshots strip ``clip_model`` keys, so CLIP is the one tower that is
    legitimately re-fetched every start)."""
    from genima_tpu.weights.torch_port import (
        load_openai_clip_text,
        load_torch_file,
        port_torch_state_dict,
    )

    if resumed and cfg.get("resnet_weights"):
        print(
            "resumed from a checkpoint: keeping the checkpointed ResNet "
            f"backbone (ignoring resnet_weights={cfg.resnet_weights})"
        )
    if (
        not resumed
        and cfg.get("resnet_weights")
        and Path(cfg.resnet_weights).exists()
    ):
        sd = load_torch_file(cfg.resnet_weights)
        sd = {k: v for k, v in sd.items() if not k.startswith("fc.")}
        params["encoder"]["backbone"] = port_torch_state_dict(
            sd, params["encoder"]["backbone"], "torchvision_resnet",
            strict=False,
        )
        print(f"loaded resnet18 backbone from {cfg.resnet_weights}")
    if cfg.get("clip_weights") and Path(cfg.clip_weights).exists():
        sd = load_torch_file(cfg.clip_weights)
        clip_params = load_openai_clip_text(sd, clip_params)
        print(f"loaded CLIP text tower from {cfg.clip_weights}")
    return params, clip_params


def main(argv=None):
    overrides, flags = parse_cli(argv if argv is not None else sys.argv[1:])
    cfg_path = flags.get("config_name", DEFAULT_CFG)
    cfg = load_config(cfg_path, overrides)

    from genima_tpu.core import distributed as dist

    dist.initialize()  # no-op single-process; multi-host pods wire up here
    seed_everything(cfg.get("seed", 0))
    from genima_tpu.envs.rlbench import make_factory

    env_cfg = dict(cfg.env)
    factory = make_factory(env_cfg)
    agent = build_agent(cfg)

    mesh = make_mesh()
    work_dir = Path(cfg.get("work_dir") or "./exp_local/genima_controller")
    logger = MetricLogger(
        work_dir,
        use_tb=cfg.get("tb", {}).get("use", False),
        use_wandb=cfg.get("wandb", {}).get("use", False),
        wandb_kwargs={"project": cfg.get("wandb", {}).get("project"),
                      "name": cfg.get("wandb", {}).get("name")},
    )

    from genima_tpu.control.trainer import ControllerWorkspace

    n_dev = mesh.devices.size
    use_mesh = n_dev > 1 and cfg.get("batch_size", 8) % n_dev == 0
    workspace = ControllerWorkspace(
        cfg,
        agent,
        factory,
        work_dir,
        num_demos=cfg.get("num_demos", 25),
        mesh=mesh if use_mesh else None,
        logger=logger,
    )
    params, clip_params = load_agent_pretrained(
        agent, cfg, workspace.state.params, agent._clip_params,
        resumed=workspace.resumed,
    )
    workspace.state = workspace.state._replace(params=params)
    agent._clip_params = clip_params
    workspace.train()
    return workspace


if __name__ == "__main__":
    main()
