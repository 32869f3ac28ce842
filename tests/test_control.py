import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genima_tpu.control.policy import GenimaACTAgent, _param_label
from genima_tpu.control.replay import EpochReplayBuffer
from genima_tpu.nn.act import ACTConfig, ACTOutput, act_loss
from genima_tpu.nn.clip_text import CLIPTextConfig


# ---------------------------------------------------------------------------
# replay buffer
# ---------------------------------------------------------------------------


def _make_buffer(**kw):
    defaults = dict(batch_size=4, action_sequence=5, frame_stack=2, seed=0)
    defaults.update(kw)
    buf = EpochReplayBuffer(**defaults)
    t = 7
    images = np.arange(t)[:, None, None, None, None] * np.ones(
        (t, 1, 4, 4, 3), np.uint8
    )
    low_dim = np.arange(t)[:, None] * np.ones((t, 3), np.float32)
    actions = np.arange(t)[:, None] * np.ones((t, 2), np.float32)
    buf.add_episode(images, low_dim, actions)
    return buf


@pytest.mark.fast
def test_replay_frame_stack_clipping():
    buf = _make_buffer()
    s0 = buf._sample_one(0, 0)
    # at t=0 the stacked frames are both frame 0 (clipped window)
    assert s0["images"].shape == (2, 4, 4, 3)  # fs*V
    np.testing.assert_array_equal(s0["images"][0], s0["images"][1])
    s3 = buf._sample_one(0, 3)
    assert s3["images"][0][0, 0, 0] == 2 and s3["images"][1][0, 0, 0] == 3
    # qpos: stacked low_dim (fs * D)
    np.testing.assert_array_equal(s3["qpos"], [2, 2, 2, 3, 3, 3])


@pytest.mark.fast
def test_replay_action_chunk_padding():
    buf = _make_buffer()
    s = buf._sample_one(0, 5)  # episode length 7, chunk 5 -> 2 padded
    np.testing.assert_array_equal(s["is_pad"], [False, False, True, True, True])
    np.testing.assert_array_equal(s["actions"][:, 0], [5, 6, 6, 6, 6])


@pytest.mark.fast
def test_replay_epoch_covers_all_indices():
    buf = _make_buffer(batch_size=3)
    seen = 0
    for batch in buf:
        seen += len(batch["actions"])
    assert seen == len(buf) == 7


@pytest.mark.fast
def test_replay_epochs_reshuffle():
    buf = _make_buffer(batch_size=7)
    a = next(iter(buf))["qpos"][:, 0]
    b = next(iter(buf))["qpos"][:, 0]
    assert set(a.tolist()) == set(b.tolist())
    assert not np.array_equal(a, b)  # order differs (7! >> collisions)


@pytest.mark.fast
def test_replay_terminal_reward():
    buf = _make_buffer()
    assert buf._sample_one(0, 6)["reward"] == 1.0
    assert buf._sample_one(0, 0)["reward"] == 0.0


# ---------------------------------------------------------------------------
# loss math
# ---------------------------------------------------------------------------


@pytest.mark.fast
def test_act_loss_formula():
    b, t, a = 2, 4, 3
    out = ACTOutput(
        actions=jnp.zeros((b, t, a)),
        is_pad_logits=jnp.zeros((b, t)),
        mu=jnp.zeros((b, 8)),
        logvar=jnp.zeros((b, 8)),
    )
    actions = jnp.ones((b, t, a))
    is_pad = jnp.zeros((b, t), bool)
    loss, m = act_loss(out, actions, is_pad, kl_weight=10.0)
    # L1 = 1 on joints; BCE(0 logit, label 1) = log(2) * 0.05; KL = 0
    np.testing.assert_allclose(float(m["l1"]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(
        float(m["gripper_loss"]), 0.05 * np.log(2), rtol=1e-5
    )
    np.testing.assert_allclose(float(m["kl"]), 0.0, atol=1e-7)


@pytest.mark.fast
def test_act_loss_masks_padding():
    out = ACTOutput(
        actions=jnp.zeros((1, 2, 2)),
        is_pad_logits=jnp.zeros((1, 2)),
        mu=jnp.zeros((1, 4)),
        logvar=jnp.zeros((1, 4)),
    )
    actions = jnp.ones((1, 2, 2)) * 100.0
    all_pad = jnp.ones((1, 2), bool)
    loss, m = act_loss(out, actions, all_pad, kl_weight=0.0)
    assert float(m["l1"]) == 0.0  # fully masked


@pytest.mark.fast
def test_kl_divergence_value():
    mu = jnp.ones((1, 2))
    logvar = jnp.zeros((1, 2))
    out = ACTOutput(jnp.zeros((1, 1, 2)), jnp.zeros((1, 1)), mu, logvar)
    _, m = act_loss(out, jnp.zeros((1, 1, 2)), jnp.zeros((1, 1), bool), 1.0)
    # KL(N(1,1) || N(0,1)) per dim = 0.5 -> sum over 2 dims = 1.0
    np.testing.assert_allclose(float(m["kl"]), 1.0, rtol=1e-5)


# ---------------------------------------------------------------------------
# agent
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_agent():
    agent = GenimaACTAgent(
        act_cfg=ACTConfig.tiny(),
        clip_cfg=CLIPTextConfig.tiny(projection_dim=16),
        image_size=32,
        resnet_width=8,
        num_views=2,
        actor_grad_clip=1.0,
        data_augmentation=False,
    )
    params, clip_p = agent.init_params(jax.random.key(0))
    return agent, params, clip_p


def _batch(agent):
    rng = np.random.RandomState(0)
    return {
        "images": jnp.asarray(rng.randint(0, 255, (2, 2, 32, 32, 3)).astype(np.float32)),
        "qpos": jnp.asarray(rng.randn(2, 8).astype(np.float32)),
        "actions": jnp.asarray(rng.randn(2, 4, 8).astype(np.float32) * 0.1),
        "is_pad": jnp.zeros((2, 4), bool),
        "lang_tokens": jnp.zeros((2, 77), jnp.int32),
    }


def test_act_chunk_shape(tiny_agent):
    agent, params, clip_p = tiny_agent
    agent.create_state(params, clip_p)
    actions = agent.act(
        params,
        jnp.zeros((2, 2, 32, 32, 3)),
        jnp.zeros((2, 8)),
        jnp.zeros((2, 77), jnp.int32),
    )
    assert actions.shape == (2, 4, 8)
    assert np.isfinite(np.asarray(actions)).all()


def test_act_inference_deterministic(tiny_agent):
    """Inference uses zeros latent + no dropout -> deterministic
    (reference GenimaMVTransformer zeros latent at eval)."""
    agent, params, clip_p = tiny_agent
    agent.create_state(params, clip_p)
    imgs = jnp.ones((1, 2, 32, 32, 3)) * 50
    a = agent.act(params, imgs, jnp.zeros((1, 8)), jnp.zeros((1, 77), jnp.int32))
    b = agent.act(params, imgs, jnp.zeros((1, 8)), jnp.zeros((1, 77), jnp.int32))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_update_trains_and_freezes_bn(tiny_agent):
    agent, params, clip_p = tiny_agent
    state = agent.create_state(params, clip_p)
    batch = _batch(agent)
    before_bn = np.asarray(
        state.params["encoder"]["backbone"]["bn1"]["var"]
    ).copy()
    before_backbone = np.asarray(
        state.params["encoder"]["backbone"]["conv1"]["kernel"]
    ).copy()
    before_actor = np.asarray(
        state.params["actor"]["action_head"]["kernel"]
    ).copy()
    for i in range(3):
        state, metrics = agent.update(state, batch, jax.random.key(i))
    assert np.isfinite(float(metrics["loss"]))
    # frozen BN untouched
    np.testing.assert_array_equal(
        np.asarray(state.params["encoder"]["backbone"]["bn1"]["var"]), before_bn
    )
    # backbone and actor both moved
    assert np.abs(
        np.asarray(state.params["encoder"]["backbone"]["conv1"]["kernel"])
        - before_backbone
    ).max() > 0
    assert np.abs(
        np.asarray(state.params["actor"]["action_head"]["kernel"]) - before_actor
    ).max() > 0


@pytest.mark.fast
def test_param_labels():
    assert _param_label(["encoder", "backbone", "bn1", "var"]) == "frozen"
    assert _param_label(["encoder", "backbone", "layer1_0", "downsample_1", "mean"]) == "frozen"
    assert _param_label(["encoder", "backbone", "conv1", "kernel"]) == "backbone"
    assert _param_label(["actor", "action_head", "kernel"]) == "main"
    assert _param_label(["encoder", "backbone", "film1", "kernel"]) == "backbone"


def test_update_overfits_tiny_batch():
    """BC on a single repeated batch should reduce the L1 term."""
    agent = GenimaACTAgent(
        act_cfg=ACTConfig.tiny(kl_weight=0.0),
        clip_cfg=CLIPTextConfig.tiny(projection_dim=16),
        image_size=32,
        resnet_width=8,
        num_views=2,
        lr=1e-3,
        lr_backbone=1e-3,
        data_augmentation=False,
    )
    params, clip_p = agent.init_params(jax.random.key(1))
    state = agent.create_state(params, clip_p)
    batch = _batch(agent)
    first = None
    for i in range(30):
        state, m = agent.update(state, batch, jax.random.key(i))
        if first is None:
            first = float(m["l1"])
    assert float(m["l1"]) < first * 0.7, (first, float(m["l1"]))


def test_resnet_small_inputs_token_density():
    """The small-view stem preserves spatial tokens: 8x downsample instead
    of 32x, matching the reference's 256px token density on <=64px views
    (sub-cell target-sphere positions are unreadable from a 2x2 map)."""
    from genima_tpu.nn.resnet import ResNet18

    x = jnp.zeros((1, 48, 48, 3))
    std = ResNet18(width=8)
    p = std.init(jax.random.key(0), x)
    assert std.apply(p, x).shape[1:3] == (2, 2)

    small = ResNet18(width=8, small_inputs=True)
    p = small.init(jax.random.key(0), x)
    assert small.apply(p, x).shape[1:3] == (6, 6)


def test_agent_small_inputs_end_to_end():
    agent = GenimaACTAgent(
        act_cfg=ACTConfig.tiny(),
        clip_cfg=CLIPTextConfig.tiny(projection_dim=16),
        image_size=32,
        resnet_width=8,
        num_views=2,
        data_augmentation=False,
        resnet_small_inputs=True,
    )
    params, clip_p = agent.init_params(jax.random.key(0))
    agent.create_state(params, clip_p)
    actions = agent.act(
        params,
        jnp.zeros((1, 2, 32, 32, 3)),
        jnp.zeros((1, 8)),
        jnp.zeros((1, 77), jnp.int32),
    )
    assert actions.shape == (1, agent.act_cfg.num_queries, agent.act_cfg.action_dim)
