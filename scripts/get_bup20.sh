#!/usr/bin/env bash
# Fetch the BUP20 sweet-pepper dataset (~70 GB), equivalent of the reference
# scripts/get_bup20.sh. Requires network access.
set -euo pipefail
DEST="${1:-$HOME/datasets}"
mkdir -p "$DEST"
echo "Downloading BUP_20 to $DEST ..."
wget -c -P "$DEST" http://agrobotics.uni-bonn.de/data/BUP_20.tar.gz
tar -xzf "$DEST/BUP_20.tar.gz" -C "$DEST"
