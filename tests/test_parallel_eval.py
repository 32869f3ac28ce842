"""Lockstep-batched closed-loop eval (eval/parallel.py): the batched fused
step matches the serial fused step per environment, and the parallel
workspace reproduces the serial harness's accounting/JSON contract while
running N episodes per program."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genima_tpu.control.policy import GenimaACTAgent
from genima_tpu.control.trainer import ControllerWorkspace
from genima_tpu.core.config import Config
from genima_tpu.diffusion.pipeline import SDControlNetPipeline
from genima_tpu.envs import FakeRLBenchFactory
from genima_tpu.eval.agents import SDControlNetAgent
from genima_tpu.eval.parallel import (
    BatchedGenimaStep,
    ParallelGenimaEvalWorkspace,
)
from genima_tpu.nn.act import ACTConfig
from genima_tpu.nn.clip_text import CLIPTextConfig
from genima_tpu.nn.unet import UNetConfig
from genima_tpu.nn.vae import VAEConfig

pytestmark = pytest.mark.fast


def _tiny_diffusion_agent(resolution=64):
    pipe = SDControlNetPipeline(
        unet_cfg=UNetConfig.tiny(),
        vae_cfg=VAEConfig.tiny_test(),
        text_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    return SDControlNetAgent(pipe=pipe, resolution=resolution)


def _tiny_controller(image_size=32):
    agent = GenimaACTAgent(
        act_cfg=ACTConfig.tiny(num_queries=10),
        clip_cfg=CLIPTextConfig.tiny(projection_dim=16),
        image_size=image_size,
        resnet_width=8,
        num_views=4,
        data_augmentation=False,
    )
    params, clip_p = agent.init_params(jax.random.key(0))
    agent.create_state(params, clip_p)
    return agent, params


def test_batched_step_matches_serial_fused():
    """BatchedGenimaStep at N=2 equals FusedGenimaStep run per env."""
    from genima_tpu.eval.fused import FusedGenimaStep

    dag = _tiny_diffusion_agent()
    agent, params = _tiny_controller()
    fused = FusedGenimaStep(dag, agent, obs_size=32)
    batched = BatchedGenimaStep(dag, agent, obs_size=32)

    fs = 1
    rng = np.random.default_rng(0)
    tiled = rng.integers(0, 255, (2 * fs, 64, 64, 3), np.uint8)
    embeds = jnp.concatenate(
        [dag._embed_prompts(["a"] * fs), dag._embed_prompts(["b"] * fs)]
    )
    lat = dag.pipe.init_latents(jax.random.key(1), 2 * fs, 64, 64)
    qpos = jnp.asarray(rng.normal(size=(2, 8)), jnp.float32)
    lang = jnp.zeros((2, 77), jnp.int32)

    acts_b, tgt_b = batched(
        dag.params, params, agent._clip_params,
        jnp.asarray(tiled), embeds, lat, qpos, lang,
        num_inference_steps=2,
    )
    for i in range(2):
        acts_s, tgt_s = fused(
            dag.params, params, agent._clip_params,
            jnp.asarray(tiled[i * fs:(i + 1) * fs]),
            embeds[i * fs:(i + 1) * fs],
            lat[i * fs:(i + 1) * fs],
            qpos[i:i + 1],
            lang[i:i + 1],
            num_inference_steps=2,
        )
        np.testing.assert_array_equal(
            np.asarray(tgt_b[i * fs:(i + 1) * fs]), np.asarray(tgt_s)
        )
        np.testing.assert_allclose(
            np.asarray(acts_b[i:i + 1]), np.asarray(acts_s), atol=1e-4
        )


@pytest.fixture(scope="module")
def trained_ctrl(tmp_path_factory):
    work_dir = tmp_path_factory.mktemp("par_ctrl_ckpt")
    factory = FakeRLBenchFactory(
        image_size=32, demo_length=12, episode_length=40
    )
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
            "num_train_epochs": 1,
            "checkpoint_every": 1,
            "num_checkpoints": 2,
            "batch_size": 8,
            "action_sequence": 10,
            "frame_stack": 1,
            "seed": 0,
        }
    )
    ws = ControllerWorkspace(
        cfg, agent, factory, work_dir, num_demos=2, logger=None
    )
    ws.train()
    return factory, agent, work_dir


def _eval_cfg(work_dir, n_eps, n_par):
    return Config.from_dict(
        {
            "task": "fake_reach",
            "controller_ckpt": str(work_dir),
            "eval_type": "latest",
            "num_eval_episodes": n_eps,
            "num_parallel_envs": n_par,
            "execution_horizon": 10,
            "episode_length": 30,
            "num_diffusion_steps": 2,
            "guidance_scale": 0.0,
            "save_video": False,
        }
    )


def test_parallel_eval_with_diffusion(trained_ctrl):
    """3 episodes over 2 lockstep envs (padded final round) — same JSON
    contract as the serial harness."""
    factory, agent, work_dir = trained_ctrl
    dag = _tiny_diffusion_agent()
    envs = [
        factory.make_eval_env(
            frame_stack=1, action_sequence=10, stats_path=str(work_dir)
        )
        for _ in range(2)
    ]
    ws = ParallelGenimaEvalWorkspace(
        _eval_cfg(work_dir, 3, 2), envs, agent, diffusion_agent=dag
    )
    logs = ws.eval()
    assert logs["results"]["total_episodes"] == 3
    assert logs["results"]["num_parallel_envs"] == 2
    assert len(logs["eval_episodes"]) == 3
    for ep in logs["eval_episodes"]:
        assert ep["steps"] > 0
        assert 0.0 <= ep["reward"] or True  # reward recorded
    assert (work_dir / "eval_genima_fake_reach.json").exists()


def test_batched_step_mesh_matches_unsharded():
    """GSPMD-sharded BatchedGenimaStep (2-device data mesh) == unsharded."""
    from genima_tpu.core.mesh import make_mesh

    dag = _tiny_diffusion_agent()
    agent, params = _tiny_controller()
    plain = BatchedGenimaStep(dag, agent, obs_size=32)
    mesh = make_mesh(n_data=2)
    sharded = BatchedGenimaStep(dag, agent, obs_size=32, mesh=mesh)

    fs = 1
    rng = np.random.default_rng(3)
    tiled = rng.integers(0, 255, (2 * fs, 64, 64, 3), np.uint8)
    embeds = jnp.concatenate(
        [dag._embed_prompts(["a"] * fs), dag._embed_prompts(["b"] * fs)]
    )
    lat = dag.pipe.init_latents(jax.random.key(7), 2 * fs, 64, 64)
    qpos = jnp.asarray(rng.normal(size=(2, 8)), jnp.float32)
    lang = jnp.zeros((2, 77), jnp.int32)
    args = (dag.params, params, agent._clip_params,
            jnp.asarray(tiled), embeds, lat, qpos, lang)

    acts_p, tgt_p = plain(*args, num_inference_steps=2)
    acts_s, tgt_s = sharded(*args, num_inference_steps=2)
    # GSPMD partitioning changes fusion/reduction order -> last-ulp float
    # drift; allow one uint8 quantization step on the decoded image
    np.testing.assert_allclose(
        np.asarray(tgt_s).astype(np.int32),
        np.asarray(tgt_p).astype(np.int32),
        atol=1,
    )
    np.testing.assert_allclose(
        np.asarray(acts_s), np.asarray(acts_p), atol=1e-4
    )
    # params are replicated once and cached, not re-placed per call
    assert sharded._param_key is not None
    cached = sharded._param_cache
    sharded(*args, num_inference_steps=2)
    assert sharded._param_cache is cached
    # a NEW tree (checkpoint reload) re-places — identity, not id() reuse
    new_dp = {k: v for k, v in dag.params.items()}
    sharded(new_dp, *args[1:], num_inference_steps=2)
    assert sharded._param_cache is not cached
    assert sharded._param_key[0] is new_dp


def test_parallel_eval_with_mesh(trained_ctrl):
    """End-to-end lockstep eval with the batch sharded over 2 devices."""
    from genima_tpu.core.mesh import make_mesh

    factory, agent, work_dir = trained_ctrl
    dag = _tiny_diffusion_agent()
    envs = [
        factory.make_eval_env(
            frame_stack=1, action_sequence=10, stats_path=str(work_dir)
        )
        for _ in range(2)
    ]
    ws = ParallelGenimaEvalWorkspace(
        _eval_cfg(work_dir, 2, 2), envs, agent, diffusion_agent=dag,
        mesh=make_mesh(n_data=2),
    )
    logs = ws.eval()
    assert logs["results"]["total_episodes"] == 2


def test_batched_step_tp_mesh_matches_unsharded():
    """2-D (data=2 x fsdp=2) serving mesh: diffusion weights TP-sharded,
    batch DP-sharded — output matches the unsharded program."""
    from genima_tpu.core.mesh import make_mesh

    dag = _tiny_diffusion_agent()
    agent, params = _tiny_controller()
    plain = BatchedGenimaStep(dag, agent, obs_size=32)
    mesh = make_mesh(n_data=2, n_fsdp=2)
    sharded = BatchedGenimaStep(dag, agent, obs_size=32, mesh=mesh)
    assert sharded._tp

    fs = 1
    rng = np.random.default_rng(9)
    tiled = rng.integers(0, 255, (2 * fs, 64, 64, 3), np.uint8)
    embeds = jnp.concatenate(
        [dag._embed_prompts(["a"] * fs), dag._embed_prompts(["b"] * fs)]
    )
    lat = dag.pipe.init_latents(jax.random.key(17), 2 * fs, 64, 64)
    qpos = jnp.asarray(rng.normal(size=(2, 8)), jnp.float32)
    lang = jnp.zeros((2, 77), jnp.int32)
    args = (dag.params, params, agent._clip_params,
            jnp.asarray(tiled), embeds, lat, qpos, lang)

    acts_p, tgt_p = plain(*args, num_inference_steps=2)
    acts_s, tgt_s = sharded(*args, num_inference_steps=2)
    # TP changes matmul reduction order -> small float drift; one uint8
    # quantization step on images, loose atol on actions
    np.testing.assert_allclose(
        np.asarray(tgt_s).astype(np.int32),
        np.asarray(tgt_p).astype(np.int32),
        atol=1,
    )
    np.testing.assert_allclose(
        np.asarray(acts_s), np.asarray(acts_p), atol=1e-3
    )


def test_parallel_eval_mesh_divisibility(trained_ctrl):
    """3 envs over a 2-device data mesh must be rejected loudly."""
    from genima_tpu.core.mesh import make_mesh

    factory, agent, work_dir = trained_ctrl
    dag = _tiny_diffusion_agent()
    envs = [
        factory.make_eval_env(
            frame_stack=1, action_sequence=10, stats_path=str(work_dir)
        )
        for _ in range(3)
    ]
    with pytest.raises(ValueError, match="multiple of the mesh"):
        ParallelGenimaEvalWorkspace(
            _eval_cfg(work_dir, 3, 3), envs, agent, diffusion_agent=dag,
            mesh=make_mesh(n_data=2),
        )


def test_fused_and_batched_sdxl():
    """The family-independent fused hook: SDXL (tuple embeds + noise key)
    through FusedGenimaStep equals the staged device path, and
    BatchedGenimaStep at N=2 runs the same program batched."""
    from genima_tpu.eval.agents import make_tiny_sdxl_agent
    from genima_tpu.eval.fused import FusedGenimaStep

    dag = make_tiny_sdxl_agent(resolution=64)
    agent, params = _tiny_controller()
    fused = FusedGenimaStep(dag, agent, obs_size=32)

    fs = 1
    rng = np.random.default_rng(5)
    tiled = rng.integers(0, 255, (fs, 64, 64, 3), np.uint8)
    embeds = dag._embed_prompts(["a prompt"] * fs)  # (hidden, pooled)
    lat = dag.pipe.init_latents(jax.random.key(11), fs, 64, 64)
    qpos = jnp.asarray(rng.normal(size=(1, 8)), jnp.float32)
    lang = jnp.zeros((1, 77), jnp.int32)
    key = jax.random.key(13)

    acts_f, tgt_f = fused(
        dag.params, params, agent._clip_params,
        jnp.asarray(tiled), embeds, lat, qpos, lang,
        key=key, num_inference_steps=2,
    )
    # staged: same generate then untile+act, different program boundaries
    tgt_s = dag.fused_generate(
        dag.params, jnp.asarray(tiled), embeds, lat, key,
        num_inference_steps=2,
    )
    np.testing.assert_allclose(
        np.asarray(tgt_f).astype(np.int32),
        np.asarray(tgt_s).astype(np.int32),
        atol=1,
    )
    assert np.asarray(acts_f).shape[0] == 1

    batched = BatchedGenimaStep(dag, agent, obs_size=32)
    embeds2 = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs), embeds, embeds
    )
    acts_b, tgt_b = batched(
        dag.params, params, agent._clip_params,
        jnp.asarray(np.concatenate([tiled, tiled])),
        embeds2,
        jnp.concatenate([lat, lat]),
        jnp.concatenate([qpos, qpos]),
        jnp.concatenate([lang, lang]),
        key=key, num_inference_steps=2,
    )
    assert np.asarray(acts_b).shape[0] == 2
    assert np.asarray(tgt_b).shape == (2 * fs, 64, 64, 3)


def test_parallel_eval_pix2pix(trained_ctrl):
    """Lockstep eval end-to-end with the Pix2Pix agent (same fused-hook
    signature, no ControlNet)."""
    from genima_tpu.eval.agents import make_tiny_pix2pix_agent

    factory, agent, work_dir = trained_ctrl
    dag = make_tiny_pix2pix_agent(resolution=64)
    envs = [
        factory.make_eval_env(
            frame_stack=1, action_sequence=10, stats_path=str(work_dir)
        )
        for _ in range(2)
    ]
    ws = ParallelGenimaEvalWorkspace(
        _eval_cfg(work_dir, 2, 2), envs, agent, diffusion_agent=dag
    )
    logs = ws.eval()
    assert logs["results"]["total_episodes"] == 2


def test_parallel_eval_subprocess_envs(trained_ctrl):
    """Lockstep eval with each env in its own spawned child (the real-sim
    topology: one CoppeliaSim per process) — demo restore + re-wrap happen
    child-side via reset_to_demo_wrapped; same accounting."""
    from genima_tpu.envs.fake import build_fake_eval_env
    from genima_tpu.envs.subprocess_env import start_subprocess_envs

    factory, agent, work_dir = trained_ctrl
    envs = start_subprocess_envs(
        build_fake_eval_env,
        2,
        image_size=32,
        demo_length=12,
        episode_length=40,
        stats_path=str(work_dir),
    )
    try:
        ws = ParallelGenimaEvalWorkspace(
            _eval_cfg(work_dir, 2, 2), envs, agent,
            diffusion_agent=_tiny_diffusion_agent(),
        )
        logs = ws.eval()
        assert logs["results"]["total_episodes"] == 2
        for ep in logs["eval_episodes"]:
            assert ep["steps"] > 0
    finally:
        for e in envs:
            e.close()


def test_parallel_eval_refuses_cfg(trained_ctrl):
    """guidance_scale > 1.0 (classifier-free guidance) must be rejected:
    the batched program runs positive prompts only."""
    factory, agent, work_dir = trained_ctrl
    dag = _tiny_diffusion_agent()
    envs = [
        factory.make_eval_env(
            frame_stack=1, action_sequence=10, stats_path=str(work_dir)
        )
        for _ in range(2)
    ]
    cfg = _eval_cfg(work_dir, 2, 2)
    cfg["guidance_scale"] = 7.5
    with pytest.raises(ValueError, match="guidance"):
        ParallelGenimaEvalWorkspace(cfg, envs, agent, diffusion_agent=dag)


def test_parallel_eval_act_only(trained_ctrl):
    """ACT-only (diffusion_agent=None) batches raw RGB over N envs."""
    factory, agent, work_dir = trained_ctrl
    envs = [
        factory.make_eval_env(
            frame_stack=1, action_sequence=10, stats_path=str(work_dir)
        )
        for _ in range(2)
    ]
    ws = ParallelGenimaEvalWorkspace(
        _eval_cfg(work_dir, 2, 2), envs, agent, diffusion_agent=None
    )
    logs = ws.eval()
    assert logs["results"]["total_episodes"] == 2
