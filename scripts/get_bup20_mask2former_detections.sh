#!/usr/bin/env bash
# Fetch pre-computed Mask2Former detections for BUP20 (~58 GB), equivalent of the
# reference scripts/get_bup20_mask2former_detections.sh.
set -euo pipefail
DEST="${1:-$HOME/datasets}"
mkdir -p "$DEST"
echo "Downloading BUP_20 Mask2Former detections to $DEST ..."
wget -c -P "$DEST" http://agrobotics.uni-bonn.de/data/BUP_20_mask2former_detections.tar.gz
tar -xzf "$DEST/BUP_20_mask2former_detections.tar.gz" -C "$DEST"
