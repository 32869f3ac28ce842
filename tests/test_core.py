import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genima_tpu.core import config as cfg_mod
from genima_tpu.core import checkpoint as ckpt_mod
from genima_tpu.core import mesh as mesh_mod
from genima_tpu.core.rng import RngStream

pytestmark = pytest.mark.fast


def test_config_load_override_interp(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "a: 1\n"
        "b:\n  c: hello\n  d: ${a}\n"
        "action_sequence: 20\n"
        "num_queries: ${action_sequence}\n"
    )
    cfg = cfg_mod.load_config(p, overrides=["a=5", "+b.e=2.5"])
    assert cfg.a == 5
    assert cfg.b.e == 2.5
    assert cfg.num_queries == 20
    # interpolation resolves against overridden value
    assert cfg.b.d == 5


def test_config_override_unknown_key_raises(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("a: 1\n")
    with pytest.raises(KeyError):
        cfg_mod.load_config(p, overrides=["zzz=1"])


def test_config_roundtrip(tmp_path):
    cfg = cfg_mod.Config.from_dict({"x": [1, 2], "y": {"z": None}})
    cfg_mod.save_yaml(cfg, tmp_path / "out.yaml")
    back = cfg_mod.load_yaml(tmp_path / "out.yaml")
    assert back.to_dict() == cfg.to_dict()


def test_instantiate():
    node = {"_target_": "collections.OrderedDict", "a": 1}
    obj = cfg_mod.instantiate(node)
    assert obj["a"] == 1
    partial_node = {"_target_": "collections.OrderedDict", "_partial_": True, "a": 2}
    fn = cfg_mod.instantiate(partial_node)
    assert fn()["a"] == 2


def test_rng_stream_deterministic():
    s1, s2 = RngStream(7), RngStream(7)
    k1, k2 = s1.next(), s2.next()
    assert jnp.array_equal(jax.random.normal(k1, (4,)), jax.random.normal(k2, (4,)))
    s1.next()
    s1.reset()
    assert jnp.array_equal(
        jax.random.normal(s1.next(), (3,)), jax.random.normal(k2, (3,))
    )


def test_mesh_and_shard_batch():
    mesh = mesh_mod.make_mesh()
    assert mesh.devices.size == 8
    batch = {"x": np.ones((16, 3), np.float32)}
    sharded = mesh_mod.shard_batch(batch, mesh)
    assert sharded["x"].sharding.spec == jax.sharding.PartitionSpec("data")


def test_mesh_rejects_insufficient_devices():
    import pytest

    with pytest.raises(ValueError, match="needs 16 devices"):
        mesh_mod.make_mesh(n_data=16)
    with pytest.raises(ValueError, match="needs 16 devices"):
        mesh_mod.make_mesh(n_data=8, n_fsdp=2, devices=jax.devices())


def test_step_checkpoint_retention(tmp_path):
    params = {"w": np.ones((2, 2), np.float32)}
    for step in [100, 200, 300]:
        ckpt_mod.save_step_checkpoint(
            tmp_path, step, model_params=params, total_limit=2
        )
    steps = [s for s, _ in ckpt_mod.list_step_checkpoints(tmp_path)]
    assert steps == [200, 300]
    latest = ckpt_mod.latest_step_checkpoint(tmp_path)
    assert latest.name == "checkpoint-300"
    resolved = ckpt_mod.find_model_checkpoint(tmp_path)
    loaded = ckpt_mod.load_pytree(resolved / "params.msgpack", target=params)
    np.testing.assert_array_equal(loaded["w"], params["w"])


def test_epoch_checkpoint_rotation_and_selection(tmp_path):
    params = {"w": np.zeros((1,), np.float32)}
    for epoch in [10, 20, 30, 40]:
        ckpt_mod.save_epoch_checkpoint(
            tmp_path,
            epoch=epoch,
            num_iters=epoch * 5,
            agent_params=params,
            config={"lr": 1e-4},
            num_checkpoints=3,
        )
    rotated = [p.name for _, p in ckpt_mod.list_epoch_checkpoints(tmp_path)]
    assert rotated == ["10.ckpt", "20.ckpt", "30.ckpt"]
    assert ckpt_mod.select_eval_checkpoints(tmp_path, "latest") == ["latest.ckpt"]
    assert ckpt_mod.select_eval_checkpoints(tmp_path, "last") == ["30.ckpt"]
    assert ckpt_mod.select_eval_checkpoints(tmp_path, "last_three") == [
        "10.ckpt",
        "20.ckpt",
        "30.ckpt",
    ]
    assert ckpt_mod.select_eval_checkpoints(tmp_path, "20") == ["20.ckpt"]
    payload = ckpt_mod.load_epoch_checkpoint(tmp_path / "latest.ckpt")
    assert payload["epoch"] == 40
    assert payload["config"]["lr"] == 1e-4


def test_async_checkpointer(tmp_path):
    """Background writer: same on-disk result as sync saves (incl. epoch
    rotation + retention ordering), one save in flight, errors re-raised."""
    writer = ckpt_mod.AsyncCheckpointer()
    params = {"w": np.zeros((1,), np.float32)}
    for epoch in [10, 20, 30, 40]:
        writer.submit(
            ckpt_mod.save_epoch_checkpoint,
            tmp_path,
            epoch=epoch,
            num_iters=epoch * 5,
            agent_params={"w": params["w"] + epoch},
            config={"lr": 1e-4},
            num_checkpoints=3,
        )
    writer.wait()
    rotated = [p.name for _, p in ckpt_mod.list_epoch_checkpoints(tmp_path)]
    assert rotated == ["10.ckpt", "20.ckpt", "30.ckpt"]
    payload = ckpt_mod.load_epoch_checkpoint(tmp_path / "latest.ckpt")
    assert payload["epoch"] == 40
    np.testing.assert_array_equal(payload["agent"]["w"], [40.0])
    # wait() is idempotent; errors surface on the next wait/submit
    writer.wait()

    def boom():
        raise RuntimeError("disk full")

    writer.submit(boom)
    with pytest.raises(RuntimeError, match="disk full"):
        writer.wait()
    # a failed write does not poison the writer
    writer.submit(
        ckpt_mod.save_step_checkpoint, tmp_path, 7, model_params=params
    )
    writer.wait()
    assert (tmp_path / "checkpoint-7" / "controlnet" / "params.msgpack").exists()


def test_metric_logger(tmp_path):
    from genima_tpu.core.logging import MetricLogger

    logger = MetricLogger(tmp_path)
    logger.log_metrics({"loss": 0.5, "lr": 1e-4}, step=1, prefix="train", echo=False)
    logger.close()
    lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    rec = json.loads(lines[0])
    assert rec["train/loss"] == 0.5


def test_device_prefetcher_order_and_errors():
    from genima_tpu.data.dataset import DevicePrefetcher

    batches = [{"x": np.full((2, 2), i)} for i in range(5)]
    out = list(DevicePrefetcher(batches, put_fn=lambda b: b["x"] + 1))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(b, np.full((2, 2), i + 1))

    class Boom:
        def __iter__(self):
            yield {"x": np.zeros(1)}
            raise RuntimeError("decode failed")

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="decode failed"):
        list(DevicePrefetcher(Boom()))
