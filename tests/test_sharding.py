"""Data-parallel sharding tests on the 8-device CPU mesh (SURVEY.md §4e):
the sharded-jit step must be numerically equivalent to single-device."""

import jax
import jax.numpy as jnp
import numpy as np

from genima_tpu.core.mesh import make_mesh, shard_batch
from genima_tpu.diffusion.pipeline import SDControlNetPipeline
from genima_tpu.diffusion.training import ControlNetTrainer, TrainConfig
from genima_tpu.nn.clip_text import CLIPTextConfig
from genima_tpu.nn.unet import UNetConfig
from genima_tpu.nn.vae import VAEConfig


def _make_pipe():
    return SDControlNetPipeline(
        unet_cfg=UNetConfig.tiny(),
        vae_cfg=VAEConfig.tiny_test(),
        text_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )


def _batch(bsz):
    rng = np.random.RandomState(0)
    return {
        "pixel_values": rng.uniform(-1, 1, (bsz, 16, 16, 3)).astype(np.float32),
        "conditioning_pixel_values": rng.uniform(0, 1, (bsz, 16, 16, 3)).astype(
            np.float32
        ),
        "input_ids": np.zeros((bsz, 77), np.int32),
    }


def test_dp_training_matches_single_device():
    """Same data, same key: 8-way DP must reproduce the single-device step
    (the psum-of-gradients is exact for a mean loss)."""
    pipe = _make_pipe()
    params = pipe.init_params(jax.random.key(0), image_size=16)
    batch = _batch(8)
    cfg = TrainConfig(learning_rate=1e-4)

    t_single = ControlNetTrainer(pipe, cfg, mesh=None)
    s_single = t_single.create_state(
        jax.tree_util.tree_map(lambda x: x, params)
    )
    s_single, m_single = t_single.train_step(
        s_single, {k: jnp.asarray(v) for k, v in batch.items()},
        jax.random.key(1),
    )

    mesh = make_mesh()
    assert mesh.devices.size == 8
    t_dp = ControlNetTrainer(pipe, cfg, mesh=mesh)
    s_dp = t_dp.create_state(jax.tree_util.tree_map(lambda x: x, params))
    s_dp, m_dp = t_dp.train_step(
        s_dp, shard_batch(batch, mesh), jax.random.key(1)
    )

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_dp["loss"]), rtol=1e-5
    )
    leaves_a = jax.tree_util.tree_leaves(s_single.params)
    leaves_b = jax.tree_util.tree_leaves(s_dp.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )


def test_dp_step_output_replicated():
    pipe = _make_pipe()
    params = pipe.init_params(jax.random.key(0), image_size=16)
    mesh = make_mesh()
    trainer = ControlNetTrainer(pipe, TrainConfig(), mesh=mesh)
    state = trainer.create_state(params)
    state, metrics = trainer.train_step(
        state, shard_batch(_batch(8), mesh), jax.random.key(0)
    )
    # params stay replicated after the update
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_generate_with_batch_sharding():
    """Inference scales by sharding the batch axis (multi-obs generation)."""
    pipe = _make_pipe()
    params = pipe.init_params(jax.random.key(0), image_size=16)
    mesh = make_mesh()
    embeds = jnp.zeros((8, 77, 32))
    cond = jax.device_put(
        jnp.zeros((8, 16, 16, 3)),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")),
    )
    lat = pipe.init_latents(jax.random.key(1), 8, 16, 16)
    img = pipe.generate(params, cond, embeds, lat, num_inference_steps=2)
    assert img.shape == (8, 16, 16, 3)
