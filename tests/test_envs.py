import json

import numpy as np
import pytest

from genima_tpu.control.replay import EpochReplayBuffer
from genima_tpu.envs import (
    ActionSequence,
    FakeRLBenchEnv,
    FakeRLBenchFactory,
    FrameStack,
    JointNormalization,
    NormProprioFromStats,
    compute_action_stats,
    compute_proprio_stats,
    demo_to_episode,
    wrap_env,
)
from genima_tpu.envs.demo import extract_demo_actions

pytestmark = pytest.mark.fast


@pytest.fixture()
def factory():
    f = FakeRLBenchFactory(image_size=32, demo_length=12, episode_length=30)
    f.collect_or_fetch_demos(3)
    return f


def test_fake_env_obs_contract():
    env = FakeRLBenchEnv(image_size=32)
    obs, info = env.reset()
    assert obs["wrist_rgb"].shape == (3, 32, 32)
    assert obs["wrist_rgb"].dtype == np.uint8
    assert obs["low_dim_state"].shape == (8,)
    assert obs["lang_tokens"].shape == (1, 77)
    assert "descriptions" in info


def test_fake_env_demo_has_joint_position_action(factory):
    demo = factory._raw_demos[0]
    assert "joint_position_action" in demo[0].misc  # the reference's assert
    actions = extract_demo_actions(demo)
    assert len(actions) == len(demo) - 1
    assert actions[0].shape == (8,)


def test_fake_env_reset_to_demo_reproducible():
    env = FakeRLBenchEnv(image_size=32)
    _, obs1 = env.reset_to_demo(idx=2)
    _, obs2 = env.reset_to_demo(idx=2)
    np.testing.assert_array_equal(obs1["low_dim_state"], obs2["low_dim_state"])
    _, obs3 = env.reset_to_demo(idx=3)
    assert not np.array_equal(obs1["low_dim_state"], obs3["low_dim_state"])


def test_demo_replay_succeeds():
    """Executing a demo's actions open-loop must solve the task."""
    env = FakeRLBenchEnv(image_size=32, demo_length=20)
    demo = env.get_demo(0)
    actions = extract_demo_actions(demo)
    _, obs = env.reset_to_demo(0)
    reward = 0.0
    for a in actions:
        obs, reward, term, trunc, info = env.step(a)
        if term:
            break
    assert reward == 1.0


def test_action_stats_gripper_hardcoded(factory):
    stats = compute_action_stats(factory._raw_demos)
    assert stats["mean"][-1] == 0.5 and stats["std"][-1] == 1 / 6
    pstats = compute_proprio_stats(factory._raw_demos)
    assert pstats["mean"][0] == 0.5 and pstats["std"][0] == 1 / 6
    # proprio joint stats == action joint stats shifted by one slot
    np.testing.assert_allclose(pstats["mean"][1:], stats["mean"][:-1])


def test_stats_json_persist_and_reload(tmp_path, factory):
    env = factory.make_env()
    JointNormalization(env, factory.action_stats, str(tmp_path))
    NormProprioFromStats(env, factory.proprio_stats, str(tmp_path))
    saved = json.loads((tmp_path / "action_stats.json").read_text())
    np.testing.assert_allclose(saved["mean"], factory.action_stats["mean"])
    # reload-from-path mode (the eval-time contract)
    w = JointNormalization(factory.make_env(), None, str(tmp_path))
    np.testing.assert_allclose(w.mean, factory.action_stats["mean"])


def test_joint_normalization_roundtrip(factory):
    stats = factory.action_stats
    a = np.random.RandomState(0).randn(8).astype(np.float32)
    n = JointNormalization.transform_to_norm(a.copy(), stats["mean"], stats["std"])
    back = JointNormalization.transform_from_norm(n, stats["mean"], stats["std"])
    np.testing.assert_allclose(back, a, rtol=1e-4, atol=1e-5)
    # gripper dim untouched
    assert n[-1] == a[-1]


def test_proprio_norm_leaves_gripper_raw(factory):
    stats = factory.proprio_stats
    s = np.ones(8, np.float32)
    n = NormProprioFromStats.transform_to_norm(s.copy(), stats["mean"], stats["std"])
    assert n[0] == 1.0  # element 0 (gripper) raw


def test_frame_stack_shapes():
    env = FrameStack(FakeRLBenchEnv(image_size=32), 2)
    obs, _ = env.reset()
    assert obs["wrist_rgb"].shape == (2, 3, 32, 32)
    assert obs["low_dim_state"].shape == (2, 8)
    obs2, *_ = env.step(env.unwrapped.action_space.sample())
    assert obs2["low_dim_state"].shape == (2, 8)


def test_action_sequence_executes_chunk(factory):
    env = ActionSequence(FakeRLBenchEnv(image_size=32, demo_length=20), 20)
    demo = env.unwrapped.get_demo(0)
    actions = np.stack(extract_demo_actions(demo))
    env.unwrapped.reset_to_demo(0)
    obs, reward, term, trunc, info = env.step(actions[:19])
    assert reward == 1.0 or not term  # may terminate early on success


def test_full_wrapper_stack_closed_loop(factory, tmp_path):
    env = factory.make_eval_env(
        frame_stack=1, action_sequence=19, stats_path=str(tmp_path)
    )
    obs, info = env.reset()
    assert obs["wrist_rgb"].shape == (1, 3, 32, 32)
    # act with a normalized demo chunk: replay demo 0 through the wrappers
    _, obs = env.unwrapped.reset_to_demo(0)
    demo = factory._raw_demos[0]
    raw = np.stack(extract_demo_actions(demo))
    norm = np.stack(
        [
            JointNormalization.transform_to_norm(
                a, factory.action_stats["mean"], factory.action_stats["std"]
            )
            for a in raw
        ]
    )
    obs, reward, term, trunc, info = env.step(norm[:11])
    assert reward == 1.0  # the wrappers denormalize back to demo actions


def test_demo_to_episode_and_replay_ingest(factory):
    buf = EpochReplayBuffer(batch_size=2, action_sequence=5)
    factory.load_demos_into_replay(buf)
    assert buf.num_episodes == 3
    batch = next(iter(buf))
    assert batch["images"].shape[1:] == (4, 32, 32, 3)
    assert batch["actions"].shape[1:] == (5, 8)
    # actions normalized: joint dims roughly zero-mean
    ep = demo_to_episode(
        factory._raw_demos[0], list(("wrist", "front", "right_shoulder",
                                     "left_shoulder")),
        factory.action_stats, factory.proprio_stats,
    )
    assert abs(ep["actions"][:, :-1].mean()) < 1.0
    assert ep["rewards"][-1] == 1.0
