#!/usr/bin/env bash
# Populate ./datasets_group (counterpart of reference scripts/download_data.sh,
# which wgets a Dropbox zip). This environment has no egress; the group-labeled
# ETH/UCY datasets ship with the reference mount, so link or copy from there
# (or from $GROUPTRAJ_DATA_SOURCE).
set -euo pipefail
cd "$(dirname "$0")/.."
SRC=${GROUPTRAJ_DATA_SOURCE:-/root/reference/datasets_group}
if [ ! -d "$SRC" ]; then
  echo "source $SRC not found; set GROUPTRAJ_DATA_SOURCE" >&2
  exit 1
fi
ln -sfn "$SRC" datasets_group
echo "datasets_group -> $SRC"
