"""Contract tests for the demo-export / rendered-demo-factory pair.

These two modules close the loop the reference gets from RLBench's dataset
generator + RoboBase's disk loader: ``export_demos_rlbench_format`` writes
the RLBench episode layout (``/root/reference/render/render_data.py:170-244``
reads it), and ``RenderedDemoFactory`` trains the controller from such a
tree (the reference's train-act flow,
``controller/env/rlbench.py:301-383``). Together they must round-trip
demos exactly — the learning gate (``eval/learning_gate.py``) chains them
around the real sphere renderer.
"""

import numpy as np
import pytest

from genima_tpu.envs.demo import compute_action_stats, compute_proprio_stats
from genima_tpu.envs.export import export_demos_rlbench_format
from genima_tpu.envs.fake import FakeRLBenchFactory
from genima_tpu.envs.rendered import RenderedDemoFactory, load_episode_as_demo

pytestmark = pytest.mark.fast

TASK = "fake_reach_visual"


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    root = tmp_path_factory.mktemp("exported")
    factory = FakeRLBenchFactory(
        task_name=TASK, image_size=24, demo_length=6, episode_length=12,
        goal_observable=True, seed=3,
    )
    demos = factory.collect_or_fetch_demos(2)
    export_demos_rlbench_format(demos, root, TASK)
    return factory, demos, root


def test_export_layout(exported):
    _, demos, root = exported
    ep0 = root / TASK / "variation0" / "episodes" / "episode0"
    assert (ep0 / "low_dim_obs.pkl").exists()
    assert (root / TASK / "variation0" / "variation_descriptions.pkl").exists()
    for cam in ("wrist", "front", "right_shoulder", "left_shoulder"):
        frames = sorted((ep0 / f"{cam}_rgb").glob("*.png"))
        assert len(frames) == len(demos[0])


def test_roundtrip_exact(exported):
    """Export then reload: joints, gripper, misc camera model, and every
    camera frame byte-identical (PNG is lossless)."""
    _, demos, root = exported
    ep0 = root / TASK / "variation0" / "episodes" / "episode0"
    loaded = load_episode_as_demo(
        ep0, ("wrist", "front", "right_shoulder", "left_shoulder")
    )
    assert len(loaded) == len(demos[0])
    for orig, back in zip(demos[0], loaded):
        np.testing.assert_array_equal(
            back.joint_positions, orig.joint_positions
        )
        assert back.gripper_open == orig.gripper_open
        np.testing.assert_array_equal(back.gripper_matrix, orig.gripper_matrix)
        np.testing.assert_array_equal(
            back.observation["front_rgb"], orig.observation["front_rgb"]
        )
        np.testing.assert_array_equal(
            back.misc["front_camera_intrinsics"],
            orig.misc["front_camera_intrinsics"],
        )
        np.testing.assert_array_equal(
            back.misc["joint_position_action"],
            orig.misc["joint_position_action"],
        )


def test_rendered_factory_stats_match_source(exported):
    """Training stats computed from the on-disk tree == stats from the
    in-memory demos (the controller must normalize identically whichever
    path fed it)."""
    factory, demos, root = exported
    rf = RenderedDemoFactory(root, task_names=[TASK], eval_factory=factory)
    rf.collect_or_fetch_demos(2)
    for k in ("mean", "std"):
        np.testing.assert_allclose(
            rf.action_stats[k], compute_action_stats(demos)[k], atol=1e-6
        )
        np.testing.assert_allclose(
            rf.proprio_stats[k], compute_proprio_stats(demos)[k], atol=1e-6
        )


def test_make_eval_env_requires_live_factory(exported):
    _, _, root = exported
    rf = RenderedDemoFactory(root, task_names=[TASK])
    with pytest.raises(RuntimeError, match="eval_factory"):
        rf.make_eval_env(frame_stack=1, action_sequence=4)


def test_make_factory_rendered_kind(exported):
    """Config plumbing: factory='rendered' + eval_env_factory='fake' builds
    the disk-demo factory with a live fake env inside (the reference's
    env.dataset_root train-act flow)."""
    from genima_tpu.envs.rlbench import make_factory

    _, _, root = exported
    f = make_factory(
        {
            "factory": "rendered",
            "dataset_root": str(root),
            "task": TASK,
            "eval_env_factory": "fake",
            "image_size": 24,
            "goal_observable": True,
        }
    )
    assert isinstance(f, RenderedDemoFactory)
    demos = f.collect_or_fetch_demos(1)
    assert len(demos) == 1
    env = f.make_eval_env(frame_stack=1, action_sequence=4)
    obs, _ = env.reset()
    assert obs["front_rgb"].shape[-1] == 24
