"""The offline learning gate as a test: the framework must TRAIN POLICIES
THAT WIN.

Every other test in this suite is a contract test — it proves the plumbing
runs, not that anything learned. This one measures the reference's actual
correctness currency (the closed-loop success-rate printout,
``/root/reference/controller/eval_genima.py:322-330``) on the
goal-observable fake task by chaining the framework's own production
stages: demos -> RLBench-layout export -> sphere-target rendering ->
base-model pretrain -> ControlNet fine-tune (through the real CLI driver)
-> ACT/BC controller training -> closed-loop eval through the diffusion
agent, trained controller vs fresh-init controller on unseen seeds.

Failure of this test means "the framework no longer trains working
policies" — the one regression no contract test can catch.

Slow-marked: the full chain is minutes of CPU (it trains three models).
``scripts/run_learning_gate.py`` runs the same gate standalone and writes
the artifact recorded as ``GATE_r*.json``.
"""

import json

import pytest

from genima_tpu.eval.learning_gate import GateConfig, run_learning_gate

pytestmark = pytest.mark.slow


def test_learning_gate_trained_policy_wins(tmp_path):
    cfg = GateConfig()
    results = run_learning_gate(tmp_path / "gate", cfg)

    # generation fidelity improved over the from-unet ControlNet init
    # (the reference's val_mse artifact, train_controlnet_genima.py:641-650)
    assert results["val_mse_final"] < results["val_mse_init"], results

    # the product metric: the trained stack succeeds, the untrained one
    # can't — so success is attributable to learning, not to the task
    assert results["trained_success"] >= cfg.min_trained_success, results
    assert results["untrained_success"] <= cfg.max_untrained_success, results
    assert results["passed"], results

    # the artifact the driver/judge reads
    saved = json.loads((tmp_path / "gate" / "learning_gate.json").read_text())
    assert saved["passed"] is True
