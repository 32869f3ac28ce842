#!/usr/bin/env bash
# Vendor OpenAI CLIP's BPE merge table next to the tokenizer so
# load_tokenizer(None) is the real BPE (reference: the pip `clip` package
# bundles this file; controller/env/rlbench_utils.py:156 uses clip.tokenize).
set -euo pipefail

DEST="$(dirname "$0")/../genima_tpu/data/bpe_simple_vocab_16e6.txt.gz"
URL="https://github.com/openai/CLIP/raw/main/clip/bpe_simple_vocab_16e6.txt.gz"

if [ -f "$DEST" ]; then
    echo "already vendored: $DEST"
    exit 0
fi

echo "fetching $URL"
curl -fsSL "$URL" -o "$DEST.tmp"
# integrity: the published file is ~1.4 MB and gzip-valid
python3 - "$DEST.tmp" <<'EOF'
import gzip, sys
with gzip.open(sys.argv[1], "rt", encoding="utf-8") as f:
    lines = f.read().split("\n")
assert len(lines) > 40000, f"suspiciously short merge table: {len(lines)} lines"
print(f"ok: {len(lines)} lines")
EOF
mv "$DEST.tmp" "$DEST"
echo "vendored: $DEST"
