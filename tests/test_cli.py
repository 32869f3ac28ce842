"""CLI integration tests: the reference-compatible entry points end-to-end
on tiny configs / fake envs / synthetic datasets."""

import json

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from genima_tpu.core import checkpoint as ckpt


# ---------------------------------------------------------------------------
# diffusion trainer CLI (tiny pipeline injected)
# ---------------------------------------------------------------------------


def _make_rendered_dataset(root, task="toy", episodes=2, frames=6, size=32):
    """Rendered-dataset tree with tiled_rgb / tiled_rgb_rendered pairs."""
    rng = np.random.RandomState(0)
    for ep in range(episodes):
        ep_dir = root / task / "variation0" / "episodes" / f"episode{ep}"
        for sub in ("tiled_rgb", "tiled_rgb_rendered"):
            d = ep_dir / sub
            d.mkdir(parents=True)
            for i in range(frames):
                Image.fromarray(
                    rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
                ).save(d / f"{i}.png")
    return root


@pytest.fixture(scope="module")
def tiny_pipe():
    from genima_tpu.diffusion.pipeline import SDControlNetPipeline
    from genima_tpu.nn.clip_text import CLIPTextConfig
    from genima_tpu.nn.unet import UNetConfig
    from genima_tpu.nn.vae import VAEConfig

    return SDControlNetPipeline(
        unet_cfg=UNetConfig.tiny(),
        vae_cfg=VAEConfig.tiny_test(),
        text_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )


def test_train_controlnet_cli(tmp_path, tiny_pipe):
    from genima_tpu.cli.train_controlnet_genima import parse_args
    from genima_tpu.diffusion.driver import run_training

    data = _make_rendered_dataset(tmp_path / "data")
    out = tmp_path / "out"
    args = parse_args(
        [
            "--data_path", str(data),
            "--tasks", "toy",
            "--output_dir", str(out),
            "--resolution", "16",
            "--train_batch_size", "2",
            "--max_train_steps", "6",
            "--checkpointing_steps", "2",
            "--checkpoints_total_limit", "2",
            "--validation_steps", "3",
            "--seed", "0",
            "--learning_rate", "1e-4",
            "--augmentations", "colorjitter,crop",
            "--mixed_precision", "no",
        ]
    )
    result = run_training(args, variant="sd", pipe=tiny_pipe)
    assert result["global_step"] == 6
    assert np.isfinite(result["final_loss"])
    assert result["val_mse"] is not None
    # retention: at most 2 step checkpoints, latest is checkpoint-6
    steps = [s for s, _ in ckpt.list_step_checkpoints(out)]
    assert steps == [4, 6]
    # final model at output root
    assert (out / "controlnet" / "params.msgpack").exists()
    # metrics logged
    assert (out / "logs" / "metrics.jsonl").exists()

    # resume from latest continues the step count
    args.max_train_steps = 8
    args.resume_from_checkpoint = "latest"
    result2 = run_training(args, variant="sd", pipe=tiny_pipe)
    assert result2["global_step"] == 8


def test_train_act_and_eval_act_cli(tmp_path):
    from genima_tpu.cli import eval_act, train_act

    work = tmp_path / "ctrl"
    ws = train_act.main(
        [
            f"work_dir={work}",
            "env.factory=fake",
            "env.task=fake_reach",
            "env.image_size=32",
            "env.episode_length=30",
            "num_train_epochs=1",
            "checkpoint_every=1",
            "num_demos=2",
            "batch_size=4",
            "action_sequence=8",
            "method.image_size=32",
            "+method.resnet_width=8",
            "method.act_cfg.hidden_dim=32",
            "method.act_cfg.enc_layers=1",
            "method.act_cfg.dec_layers=1",
            "method.act_cfg.dim_feedforward=64",
            "method.act_cfg.nheads=2",
            "method.act_cfg.latent_dim=8",
            "method.act_cfg.lang_dim=16",
            "method.data_augmentation=false",
        ]
    )
    assert (work / "latest.ckpt").exists()
    assert (work / "config.yaml").exists()

    logs = eval_act.main(
        [
            f"controller_ckpt={work}",
            "task=fake_reach",
            "env.factory=fake",
            "env.image_size=32",
            "episode_length=30",
            "num_eval_episodes=1",
            "execution_horizon=8",
            "eval_type=latest",
        ]
    )
    assert logs["results"]["total_episodes"] == 1


def test_eval_genima_cli_with_tiny_diffusion(tmp_path):
    from genima_tpu.cli import eval_genima, train_act

    work = tmp_path / "ctrl"
    train_act.main(
        [
            f"work_dir={work}",
            "env.factory=fake",
            "env.task=fake_reach",
            "env.image_size=32",
            "env.episode_length=20",
            "num_train_epochs=1",
            "checkpoint_every=1",
            "num_demos=2",
            "batch_size=4",
            "action_sequence=6",
            "method.image_size=32",
            "+method.resnet_width=8",
            "method.act_cfg.hidden_dim=32",
            "method.act_cfg.enc_layers=1",
            "method.act_cfg.dec_layers=1",
            "method.act_cfg.dim_feedforward=64",
            "method.act_cfg.nheads=2",
            "method.act_cfg.latent_dim=8",
            "method.act_cfg.lang_dim=16",
            "method.data_augmentation=false",
        ]
    )
    logs = eval_genima.main(
        [
            f"controller_ckpt={work}",
            "task=fake_reach",
            "env.factory=fake",
            "env.image_size=32",
            "episode_length=20",
            "num_eval_episodes=1",
            "execution_horizon=6",
            "eval_type=latest",
            "num_diffusion_steps=2",
            "diffusion_agent._target_=genima_tpu.eval.agents.make_tiny_sd_agent",
            "+diffusion_agent.resolution=64",
            "enable_xformers_memory_efficient_attention=false",
        ]
    )
    assert logs["results"]["total_episodes"] == 1
    assert (work / "eval_genima_fake_reach.json").exists()

    # lockstep-parallel + DP-sharded serving through the same CLI
    logs = eval_genima.main(
        [
            f"controller_ckpt={work}",
            "task=fake_reach",
            "env.factory=fake",
            "env.image_size=32",
            "episode_length=20",
            "num_eval_episodes=2",
            "num_parallel_envs=2",
            "eval_data_parallel=true",
            "eval_mesh_devices=2",
            "execution_horizon=6",
            "eval_type=latest",
            "num_diffusion_steps=2",
            "diffusion_agent._target_=genima_tpu.eval.agents.make_tiny_sd_agent",
            "+diffusion_agent.resolution=64",
            "enable_xformers_memory_efficient_attention=false",
        ]
    )
    assert logs["results"]["total_episodes"] == 2
    assert logs["results"]["num_parallel_envs"] == 2
    saved = json.loads((work / "eval_genima_fake_reach.json").read_text())
    assert "results" in saved


def test_render_data_cli(tmp_path):
    import pickle

    from genima_tpu.cli import render_data as render_cli

    # synthetic RLBench tree (same as test_rendering but via the CLI)
    src = tmp_path / "rb"
    cams = ["wrist", "front", "right_shoulder", "left_shoulder"]
    intr = np.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]], np.float32)
    ep_dir = src / "toy" / "variation0" / "episodes" / "episode0"
    low_dim = []
    for t in range(5):
        gm = np.eye(4)
        gm[:3, 3] = [0.02 * t, 0, 0.5]
        obs = {
            "gripper_matrix": gm,
            "gripper_open": 1.0,
            "misc": {
                "joint_poses": {
                    j: np.array([0.01 * j, 0, 0.4, 0, 0, 0, 1.0])
                    for j in (1, 3, 5)
                },
            },
        }
        for cam in cams:
            obs["misc"][f"{cam}_camera_intrinsics"] = intr
            obs["misc"][f"{cam}_camera_extrinsics"] = np.eye(4)
            d = ep_dir / f"{cam}_rgb"
            d.mkdir(parents=True, exist_ok=True)
            Image.fromarray(np.full((32, 32, 3), 90, np.uint8)).save(
                d / f"{t}.png"
            )
        low_dim.append(obs)
    with open(ep_dir / "low_dim_obs.pkl", "wb") as f:
        pickle.dump(low_dim, f)

    render_cli.main(
        [
            f"dataset_root={src}",
            f"save_path={tmp_path}",
            "task=toy",
            "episodes=1",
            "image_width=32",
            "image_height=32",
            "action_horizon=2",
            "cameras=[wrist, front, right_shoulder, left_shoulder]",
            "camera_scales=[3.0, 8.0, 6.5, 6.5]",
            "textures_path=null",
        ]
    )
    out = tmp_path / "rb_rgb_rendered" / "toy" / "variation0" / "episodes" / (
        "episode0"
    )
    assert (out / "tiled_rgb_rendered" / "0.png").exists()


def test_dataset_index_and_loader(tmp_path):
    from genima_tpu.data.dataset import (
        DiffusionDataLoader,
        index_rendered_dataset,
    )
    from genima_tpu.data.tokenizer import HashTokenizer

    data = _make_rendered_dataset(tmp_path, episodes=2, frames=6)
    samples = index_rendered_dataset(data, tasks=["toy"], num_demos=2)
    # drops the last frame: 5 per episode
    assert len(samples) == 10
    assert "tiled perspectives of a robot arm executing" in samples[0].text

    # num_demos cap
    assert len(index_rendered_dataset(data, tasks=["toy"], num_demos=1)) == 5

    # predict_future pairs frame i with i+h
    fut = index_rendered_dataset(
        data, tasks=["toy"], num_demos=1, predict_future=True,
        predict_future_horizon=2,
    )
    assert fut[0].image_path.endswith("2.png")
    assert fut[0].conditioning_image_path.endswith("0.png")

    loader = DiffusionDataLoader(
        samples, HashTokenizer(), batch_size=4, resolution=16
    )
    batch = next(iter(loader))
    assert batch["pixel_values"].shape == (4, 16, 16, 3)
    assert batch["pixel_values"].min() >= -1 and batch["pixel_values"].max() <= 1
    assert batch["conditioning_pixel_values"].min() >= 0
    assert batch["input_ids"].shape == (4, 77)
    assert len(loader) == 2  # 10 samples, batch 4, drop_last


# ---------------------------------------------------------------------------
# eval-time CLIP loading (frozen tower is stripped from controller ckpts)
# ---------------------------------------------------------------------------


def _tiny_openai_clip_sd(cfg, rng):
    d, inter = cfg.hidden_size, cfg.intermediate_size
    sd = {
        "token_embedding.weight": rng.randn(cfg.vocab_size, d).astype(np.float32),
        "positional_embedding": rng.randn(cfg.max_positions, d).astype(np.float32),
        "ln_final.weight": np.ones(d, np.float32),
        "ln_final.bias": np.zeros(d, np.float32),
        "text_projection": rng.randn(d, cfg.projection_dim).astype(np.float32),
        "logit_scale": np.zeros(()),
    }
    for i in range(cfg.num_layers):
        p = f"transformer.resblocks.{i}."
        sd[p + "attn.in_proj_weight"] = rng.randn(3 * d, d).astype(np.float32)
        sd[p + "attn.in_proj_bias"] = rng.randn(3 * d).astype(np.float32)
        sd[p + "attn.out_proj.weight"] = rng.randn(d, d).astype(np.float32)
        sd[p + "attn.out_proj.bias"] = rng.randn(d).astype(np.float32)
        sd[p + "ln_1.weight"] = np.ones(d, np.float32)
        sd[p + "ln_1.bias"] = np.zeros(d, np.float32)
        sd[p + "ln_2.weight"] = np.ones(d, np.float32)
        sd[p + "ln_2.bias"] = np.zeros(d, np.float32)
        sd[p + "mlp.c_fc.weight"] = rng.randn(inter, d).astype(np.float32)
        sd[p + "mlp.c_fc.bias"] = rng.randn(inter).astype(np.float32)
        sd[p + "mlp.c_proj.weight"] = rng.randn(d, inter).astype(np.float32)
        sd[p + "mlp.c_proj.bias"] = rng.randn(d).astype(np.float32)
    return sd


def test_eval_loads_pretrained_clip(tmp_path):
    """Reference lazily loads frozen CLIP at eval (genima_act.py:314-346);
    evaluating with random-init CLIP must be impossible to do silently."""
    import jax
    import torch

    from genima_tpu.cli.eval_genima import load_eval_clip
    from genima_tpu.control.policy import GenimaACTAgent
    from genima_tpu.nn.act import ACTConfig
    from genima_tpu.nn.clip_text import CLIPTextConfig

    agent = GenimaACTAgent(
        act_cfg=ACTConfig.tiny(),
        clip_cfg=CLIPTextConfig.tiny(
            projection_dim=ACTConfig.tiny().lang_dim
        ),
        image_size=32,
        resnet_width=8,
        num_views=2,
        data_augmentation=False,
    )
    _, clip_random = agent.init_params(jax.random.key(0))

    # missing file fails loudly, whether configured at eval or train time
    with pytest.raises(FileNotFoundError, match="clip_weights"):
        load_eval_clip(
            {"clip_weights": str(tmp_path / "nope.pt")}, None, clip_random
        )
    with pytest.raises(FileNotFoundError, match="clip_weights"):
        load_eval_clip(
            {}, {"clip_weights": str(tmp_path / "nope.pt")}, clip_random
        )

    sd = _tiny_openai_clip_sd(agent.clip_cfg, np.random.RandomState(3))
    path = tmp_path / "clip.pt"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)

    # train-config fallback: eval_cfg has no clip_weights
    ported = load_eval_clip({}, {"clip_weights": str(path)}, clip_random)
    tokens = jnp.zeros((1, agent.clip_cfg.max_positions), jnp.int32)
    emb_ported = agent.encode_lang(ported, tokens)
    emb_random = agent.encode_lang(clip_random, tokens)
    assert not np.allclose(np.asarray(emb_ported), np.asarray(emb_random))

    # no clip configured anywhere -> unchanged (scratch-trained controller)
    same = load_eval_clip({}, None, clip_random)
    assert same is clip_random


def test_train_act_resume_keeps_checkpointed_backbone(tmp_path):
    """Restarting with resnet_weights set must NOT clobber the trained
    backbone with fresh torchvision weights (the reference restores the
    backbone from the snapshot; only frozen CLIP is lazily reloaded,
    genima_act.py:314-346)."""
    from genima_tpu.cli import train_act

    work = tmp_path / "ctrl"
    tiny = [
        f"work_dir={work}",
        "env.factory=fake",
        "env.task=fake_reach",
        "env.image_size=32",
        "env.episode_length=30",
        "num_train_epochs=1",
        "checkpoint_every=1",
        "num_demos=2",
        "batch_size=4",
        "action_sequence=8",
        "method.image_size=32",
        "+method.resnet_width=8",
        "method.act_cfg.hidden_dim=32",
        "method.act_cfg.enc_layers=1",
        "method.act_cfg.dec_layers=1",
        "method.act_cfg.dim_feedforward=64",
        "method.act_cfg.nheads=2",
        "method.act_cfg.latent_dim=8",
        "method.act_cfg.lang_dim=16",
        "method.data_augmentation=false",
    ]
    train_act.main(tiny)
    payload = ckpt.load_epoch_checkpoint(work / "latest.ckpt")

    # second start resumes; the dummy weights file is garbage on purpose —
    # if the clobber path ran, load_torch_file would explode on it
    dummy = tmp_path / "resnet18.pth"
    dummy.write_bytes(b"not a torch file")
    ws = train_act.main(tiny + [f"resnet_weights={dummy}"])
    assert ws.resumed

    import jax

    got = jax.tree_util.tree_leaves(ws.state.params["encoder"])
    want = jax.tree_util.tree_leaves(payload["agent"]["encoder"])
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_quickstart_eval_dry_run():
    """scripts/quickstart_eval.sh --dry-run: the download->convert->eval
    chain shape, exercised against the fake factory with the reference
    quickstart flag set (round-3 next #10). The first sim-equipped machine
    runs the same script without --dry-run for the real success-rate
    comparison."""
    import subprocess
    from pathlib import Path

    repo = Path(__file__).parent.parent
    r = subprocess.run(
        ["bash", "scripts/quickstart_eval.sh", "--dry-run", "--episodes=2"],
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "chain verified end-to-end" in r.stdout
