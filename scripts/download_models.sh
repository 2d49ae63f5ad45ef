#!/usr/bin/env bash
# Counterpart of reference scripts/download_models.sh (a Dropbox wget).
# The grouptraj zoo ships in-repo at models/grouptraj/; this links the
# reference's pretrained PyTorch checkpoints (for the importer/parity tools)
# from the read-only mount or $GROUPTRAJ_MODELS_SOURCE.
set -euo pipefail
cd "$(dirname "$0")/.."
SRC=${GROUPTRAJ_MODELS_SOURCE:-/root/reference/models}
if [ ! -d "$SRC" ]; then
  echo "source $SRC not found; set GROUPTRAJ_MODELS_SOURCE" >&2
  exit 1
fi
ln -sfn "$SRC" models/reference
echo "models/reference -> $SRC (grouptraj zoo already at models/grouptraj)"
