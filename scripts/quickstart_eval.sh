#!/usr/bin/env bash
# One-command success-rate comparison against the reference protocol:
# download the released checkpoints, convert them to the TPU format, and
# run the 10-episode closed-loop quickstart eval with the exact reference
# flags (reference README.md "Quickstart"; --paper switches to the paper
# protocol: num_diffusion_steps=10, num_eval_episodes=50,
# eval_type=last_three, reference README.md:262).
#
# The offline environment can't run this for real (no egress, no
# CoppeliaSim) — so --dry-run exercises the IDENTICAL chain against the
# fake factory with a tiny just-trained controller, zero network and zero
# simulator, and is run in CI (tests/test_cli.py::test_quickstart_dry_run).
# The first networked/sim-equipped machine produces the real success-rate
# comparison with: bash scripts/quickstart_eval.sh --task=open_box
set -euo pipefail

DRY=0
PAPER=0
TASK=open_box
DST=./quickstart
VAL_DATA=/tmp/val_data
DRY_EPISODES=10
for a in "$@"; do
  case "$a" in
    --dry-run) DRY=1 ;;
    --paper) PAPER=1 ;;
    --task=*) TASK="${a#--task=}" ;;
    --dst=*) DST="${a#--dst=}" ;;
    --val-data=*) VAL_DATA="${a#--val-data=}" ;;
    --episodes=*) DRY_EPISODES="${a#--episodes=}" ;;  # dry-run only (CI)
    *) echo "unknown flag: $a" >&2; exit 2 ;;
  esac
done

if [ "$DRY" = 1 ]; then
  WORK=$(mktemp -d)
  trap 'rm -rf "$WORK"' EXIT
  # tiny fake-factory chain: force CPU (a TPU relay would only add
  # latency and flake risk to a correctness-only check; env vars are too
  # late once sitecustomize imported jax, so use jax.config in-process)
  PYDRV='
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from genima_tpu.cli import eval_genima, train_act
mode, args = sys.argv[1], sys.argv[2:]
(train_act if mode == "train" else eval_genima).main(args)
'
  echo "[dry-run] 1/2 training a tiny controller on the fake factory"
  python -c "$PYDRV" train \
      work_dir="$WORK/ctrl" env.factory=fake env.task=fake_reach \
      env.image_size=32 env.episode_length=20 num_train_epochs=1 \
      checkpoint_every=1 num_demos=2 batch_size=4 action_sequence=6 \
      method.image_size=32 +method.resnet_width=8 \
      method.act_cfg.hidden_dim=32 method.act_cfg.enc_layers=1 \
      method.act_cfg.dec_layers=1 method.act_cfg.dim_feedforward=64 \
      method.act_cfg.nheads=2 method.act_cfg.latent_dim=8 \
      method.act_cfg.lang_dim=16 method.data_augmentation=false
  echo "[dry-run] 2/2 10-episode eval through the quickstart flag set"
  python -c "$PYDRV" eval \
      controller_ckpt="$WORK/ctrl" task=fake_reach env.factory=fake \
      env.image_size=32 episode_length=20 \
      num_eval_episodes="$DRY_EPISODES" execution_horizon=6 eval_type=latest \
      num_diffusion_steps=2 save_video=false headless=true \
      diffusion_agent._target_=genima_tpu.eval.agents.make_tiny_sd_agent \
      +diffusion_agent.resolution=64 \
      enable_xformers_memory_efficient_attention=false
  echo "[dry-run] OK: download->convert->eval chain verified end-to-end"
  exit 0
fi

HERE="$(dirname "$0")"
echo "[1/3] fetching + converting released checkpoints -> $DST"
bash "$HERE/download_quickstart.sh" "$DST"
bash "$HERE/download_clip_vocab.sh"
if [ -d "$DST/controller_act" ] && [ ! -f "$DST/controller_tpu/latest.ckpt" ]; then
  python -m genima_tpu.cli.convert_checkpoint controller_act \
      --src "$DST/controller_act" --dst "$DST/controller_tpu"
fi

echo "[2/3] expecting a val set of demos under $VAL_DATA (generate with"
echo "      rlbench dataset_generator.py --tasks=$TASK --episodes_per_task=10)"

if [ "$PAPER" = 1 ]; then
  EPISODES=50; STEPS=10; ETYPE=last_three
else
  EPISODES=10; STEPS=5; ETYPE=latest
fi

echo "[3/3] closed-loop eval: task=$TASK episodes=$EPISODES steps=$STEPS"
python -m genima_tpu.cli.eval_genima \
    task="$TASK" \
    "env.dataset_root=$VAL_DATA" \
    diffusion_ckpt="$DST/diffusion_tpu" \
    sd_ckpt="$DST/sd-turbo-tpu" \
    controller_ckpt="$DST/controller_tpu" \
    num_eval_episodes="$EPISODES" \
    num_diffusion_steps="$STEPS" \
    execution_horizon=20 \
    save_video=false \
    eval_type="$ETYPE" \
    headless=true
