"""End-to-end slice on the fake env: controller BC training -> checkpoint ->
closed-loop eval (ACT-only and with a tiny diffusion agent). This is the CI
version of SURVEY.md §7's "minimum end-to-end slice"."""

import jax.numpy as jnp
import numpy as np
import pytest

from genima_tpu.control.policy import GenimaACTAgent
from genima_tpu.control.trainer import ControllerWorkspace
from genima_tpu.core.config import Config
from genima_tpu.diffusion.pipeline import SDControlNetPipeline
from genima_tpu.envs import FakeRLBenchFactory
from genima_tpu.eval.agents import SDControlNetAgent
from genima_tpu.eval.harness import GenimaEvalWorkspace
from genima_tpu.nn.act import ACTConfig
from genima_tpu.nn.clip_text import CLIPTextConfig
from genima_tpu.nn.unet import UNetConfig
from genima_tpu.nn.vae import VAEConfig


@pytest.fixture(scope="module")
def trained_workspace(tmp_path_factory):
    work_dir = tmp_path_factory.mktemp("ctrl_ckpt")
    factory = FakeRLBenchFactory(image_size=32, demo_length=12, episode_length=40)
    agent = GenimaACTAgent(
        act_cfg=ACTConfig.tiny(num_queries=10, kl_weight=1.0),
        clip_cfg=CLIPTextConfig.tiny(projection_dim=16),
        image_size=32,
        resnet_width=8,
        num_views=4,
        lr=3e-4,
        lr_backbone=3e-4,
        data_augmentation=False,
    )
    cfg = Config.from_dict(
        {
            "num_train_epochs": 2,
            "checkpoint_every": 1,
            "num_checkpoints": 3,
            "batch_size": 8,
            "action_sequence": 10,
            "frame_stack": 1,
            "seed": 0,
        }
    )
    ws = ControllerWorkspace(
        cfg, agent, factory, work_dir, num_demos=3, logger=None
    )
    ws.train()
    return ws, factory, agent, work_dir, cfg


def test_training_produces_checkpoints(trained_workspace):
    ws, factory, agent, work_dir, cfg = trained_workspace
    assert (work_dir / "latest.ckpt").exists()
    assert (work_dir / "config.yaml").exists()
    assert (work_dir / "action_stats.json").exists()
    assert (work_dir / "proprio_stats.json").exists()


def test_training_resume(trained_workspace):
    ws, factory, agent, work_dir, cfg = trained_workspace
    ws2 = ControllerWorkspace(
        cfg, agent, factory, work_dir, num_demos=3, logger=None
    )
    assert ws2._epoch == 2  # resumed from latest.ckpt


def test_eval_act_closed_loop(trained_workspace):
    """ACT-only harness (reference eval_act.py): raw RGB -> controller."""
    ws, factory, agent, work_dir, cfg = trained_workspace
    eval_env = factory.make_eval_env(
        frame_stack=1, action_sequence=10, stats_path=str(work_dir)
    )
    eval_cfg = Config.from_dict(
        {
            "task": "fake_reach",
            "controller_ckpt": str(work_dir),
            "eval_type": "latest",
            "num_eval_episodes": 2,
            "execution_horizon": 10,
            "episode_length": 40,
            "save_video": False,
        }
    )
    harness = GenimaEvalWorkspace(
        eval_cfg, eval_env, agent, diffusion_agent=None
    )
    logs = harness.eval()
    assert logs["results"]["total_episodes"] == 2
    assert (work_dir / "eval_genima_fake_reach.json").exists()
    for ep in logs["eval_episodes"]:
        assert ep["steps"] > 0


def test_eval_genima_closed_loop_with_diffusion(trained_workspace):
    """Full Genima loop: tile -> tiny diffusion -> untile -> ACT -> execute."""
    ws, factory, agent, work_dir, cfg = trained_workspace
    pipe = SDControlNetPipeline(
        unet_cfg=UNetConfig.tiny(),
        vae_cfg=VAEConfig.tiny_test(),
        text_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    diffusion_agent = SDControlNetAgent(pipe=pipe, resolution=64)
    eval_env = factory.make_eval_env(
        frame_stack=1, action_sequence=10, stats_path=str(work_dir)
    )
    eval_cfg = Config.from_dict(
        {
            "task": "fake_reach",
            "controller_ckpt": str(work_dir),
            "eval_type": "last",
            "num_eval_episodes": 1,
            "execution_horizon": 10,
            "episode_length": 30,
            "num_diffusion_steps": 2,
            "guidance_scale": 0.0,
            "save_video": True,
            "save_image_path": str(work_dir),
        }
    )
    harness = GenimaEvalWorkspace(eval_cfg, eval_env, agent, diffusion_agent)
    logs = harness.eval()
    assert logs["results"]["total_episodes"] == 1
    # a video artifact was produced
    vids = list((work_dir / "videos").glob("fake_reach_ep1_*"))
    assert len(vids) == 1


def test_eval_genima_closed_loop_sdxl(trained_workspace):
    """The serial harness's fused gate admits SDXL (tuple embeds + noise
    key through the family-independent fused hook); the closed loop runs
    end-to-end with the tiny SDXL agent."""
    from genima_tpu.eval.agents import make_tiny_sdxl_agent

    ws, factory, agent, work_dir, cfg = trained_workspace
    diffusion_agent = make_tiny_sdxl_agent(resolution=64)
    eval_env = factory.make_eval_env(
        frame_stack=1, action_sequence=10, stats_path=str(work_dir)
    )
    eval_cfg = Config.from_dict(
        {
            "task": "fake_reach",
            "controller_ckpt": str(work_dir),
            "eval_type": "last",
            "num_eval_episodes": 1,
            "execution_horizon": 10,
            "episode_length": 30,
            "num_diffusion_steps": 2,
            "guidance_scale": 0.0,
            "save_video": False,
        }
    )
    harness = GenimaEvalWorkspace(eval_cfg, eval_env, agent, diffusion_agent)
    logs = harness.eval()
    assert logs["results"]["total_episodes"] == 1
    # the fused path (not the staged fallback) actually ran
    assert harness._fused_step is not None


def test_diffusion_agent_episode_seeding():
    """Same episode seed -> identical generations (reference fixed
    per-episode generator)."""
    pipe = SDControlNetPipeline(
        unet_cfg=UNetConfig.tiny(),
        vae_cfg=VAEConfig.tiny_test(),
        text_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    d = SDControlNetAgent(pipe=pipe, resolution=32, seed=2)
    img = np.random.randint(0, 255, (1, 32, 32, 3), np.uint8)
    d.new_episode()
    a = d.infer(img, ["x"], num_inference_steps=2)
    d.new_episode()
    b = d.infer(img, ["x"], num_inference_steps=2)
    np.testing.assert_array_equal(a, b)


@pytest.mark.fast
def test_fused_closed_loop_step():
    """The single-program control step matches the staged path."""
    import jax
    from genima_tpu.eval.fused import FusedGenimaStep

    pipe = SDControlNetPipeline(
        unet_cfg=UNetConfig.tiny(),
        vae_cfg=VAEConfig.tiny_test(),
        text_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    dag = SDControlNetAgent(pipe=pipe, resolution=64)
    agent = GenimaACTAgent(
        act_cfg=ACTConfig.tiny(num_queries=6),
        clip_cfg=CLIPTextConfig.tiny(projection_dim=16),
        image_size=32,
        resnet_width=8,
        num_views=4,
        data_augmentation=False,
    )
    params, clip_p = agent.init_params(jax.random.key(0))
    agent.create_state(params, clip_p)

    fused = FusedGenimaStep(dag, agent, obs_size=32)
    tiled = jnp.zeros((1, 64, 64, 3), jnp.uint8)
    embeds = dag._embed_prompts(["x"])
    lat = pipe.init_latents(jax.random.key(1), 1, 64, 64)
    qpos = jnp.zeros((1, 8))
    ids = jnp.zeros((1, 77), jnp.int32)
    actions, target = fused(
        dag.params, params, clip_p, tiled, embeds, lat, qpos, ids,
        num_inference_steps=2,
    )
    assert actions.shape == (1, 6, 8)
    assert target.shape == (1, 64, 64, 3) and target.dtype == jnp.uint8

    # parity with the staged path
    target2 = dag.pipe.generate(
        dag.params, tiled, embeds, lat, num_inference_steps=2
    )
    np.testing.assert_array_equal(np.asarray(target), np.asarray(target2))
    from genima_tpu.data.tiling import untile_to_cameras

    cams = untile_to_cameras(target2.astype(jnp.float32), target_size=32)
    act_in = jnp.transpose(cams, (1, 0, 2, 3, 4)).reshape(1, 4, 32, 32, 3)
    actions2 = agent.act(params, act_in, qpos, ids)
    np.testing.assert_allclose(
        np.asarray(actions), np.asarray(actions2), atol=1e-5
    )
