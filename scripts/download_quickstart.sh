#!/bin/bash
# Fetch the released Genima checkpoints (25-task diffusion agent +
# controller) and convert them to the native TPU format (same role as the
# reference's scripts/download_quickstart.sh).
set -e
DST=${1:-./quickstart}
mkdir -p "$DST"
cd "$DST"
for f in diffusion_sdturbo_R256x4_tiled.zip controller_act.zip; do
  [ -f "$f" ] || wget -q "https://github.com/MohitShridhar/genima/releases/download/v1.0.0/$f"
  unzip -oq "$f"
done
# base model (HF): stabilityai/sd-turbo -> local dir, then convert
python -m genima_tpu.cli.convert_checkpoint sd_base \
  --src ./sd-turbo --dst ./sd-turbo-tpu || true
python -m genima_tpu.cli.convert_checkpoint controlnet \
  --src ./diffusion_sdturbo_R256x4_tiled/checkpoint-*/controlnet \
  --dst ./diffusion_tpu/controlnet || true
echo "Quickstart assets ready under $DST"
