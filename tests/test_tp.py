"""Tensor-parallel sharding: GSPMD-sharded params must reproduce the
replicated result (the optional latency-scaling path beyond parity DP)."""

import jax
import jax.numpy as jnp
import numpy as np

from genima_tpu.core.mesh import make_mesh
from genima_tpu.core.tp import shard_params_tp, tp_param_shardings
from genima_tpu.diffusion.pipeline import SDControlNetPipeline
from genima_tpu.nn.clip_text import CLIPTextConfig
from genima_tpu.nn.unet import UNetConfig
from genima_tpu.nn.vae import VAEConfig


def test_tp_sharding_rules():
    mesh = make_mesh(n_data=1, n_fsdp=8)
    params = {
        "conv": {"kernel": jnp.zeros((3, 3, 16, 64)), "bias": jnp.zeros((64,))},
        "dense": {"kernel": jnp.zeros((32, 64))},
        "odd": {"kernel": jnp.zeros((32, 13))},  # not divisible -> replicated
        "emb": {"embedding": jnp.zeros((100, 32))},
    }
    sh = tp_param_shardings(params, mesh)
    assert sh["conv"]["kernel"].spec == jax.sharding.PartitionSpec(
        None, None, None, "fsdp"
    )
    assert sh["conv"]["bias"].spec == jax.sharding.PartitionSpec("fsdp")
    assert sh["dense"]["kernel"].spec == jax.sharding.PartitionSpec(None, "fsdp")
    assert sh["odd"]["kernel"].spec == jax.sharding.PartitionSpec()
    assert sh["emb"]["embedding"].spec == jax.sharding.PartitionSpec()


def test_tp_generate_matches_replicated():
    pipe = SDControlNetPipeline(
        unet_cfg=UNetConfig.tiny(),
        vae_cfg=VAEConfig.tiny_test(),
        text_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    params = pipe.init_params(jax.random.key(0), image_size=16)
    embeds = jnp.zeros((1, 77, 32))
    cond = jnp.zeros((1, 16, 16, 3))
    lat = pipe.init_latents(jax.random.key(1), 1, 16, 16)
    ref = np.asarray(
        pipe.generate(params, cond, embeds, lat, num_inference_steps=2)
    )

    mesh = make_mesh(n_data=1, n_fsdp=8)
    tp_params = shard_params_tp(params, mesh)
    # at least some leaves actually sharded
    specs = [
        s.sharding.spec
        for s in jax.tree_util.tree_leaves(tp_params)
        if hasattr(s, "sharding")
    ]
    assert any(spec != jax.sharding.PartitionSpec() for spec in specs)
    out = np.asarray(
        pipe.generate(tp_params, cond, embeds, lat, num_inference_steps=2)
    )
    np.testing.assert_allclose(out.astype(np.int32), ref.astype(np.int32), atol=1)
