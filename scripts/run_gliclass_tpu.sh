#!/usr/bin/env bash
# Launcher parity with the reference's run_GLiClass.sh:
#   ./scripts/run_gliclass_tpu.sh <hf-model-name> <data.json> [extra flags...]
# Fetches + converts + caches the model on first use, then classifies the job.
# (reference run_GLiClass.sh:33-92 did the download/cache/jq dance by hand; the
# fetch logic now lives in gliclass.c_tpu.fetch with the same integrity check.)
set -euo pipefail

if [ $# -lt 2 ]; then
  echo "usage: $0 <hf-model-name> <data.json> [gliclass-tpu run flags...]" >&2
  exit 1
fi

MODEL="$1"; DATA="$2"; shift 2
exec python -m gliclass.c_tpu.cli run "$DATA" --model "$MODEL" --int8 "$@"
