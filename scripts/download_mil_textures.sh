#!/bin/bash
# Random background textures for the rnd_bg dataset variant (same role as
# the reference's scripts/download_mil_textures.sh).
set -e
DST=${1:-./textures}
mkdir -p "$DST"
wget -q https://github.com/tianheyu927/mil/raw/master/data/textures.zip -O /tmp/mil_textures.zip
unzip -oq /tmp/mil_textures.zip -d "$DST"
echo "Textures in $DST"
