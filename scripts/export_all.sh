#!/usr/bin/env bash
# Batch-export every standard config (reference bash_scripts/export_all_onnx.sh:
# S, S_A, N, N_A x V2/V3 to ONNX). Here: StableHLO, the TPU deployment
# artifact (export.py); pass FORMAT=savedmodel for a TF SavedModel instead.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT_DIR=${OUT_DIR:-exported}
mkdir -p "$OUT_DIR"
FORMAT=${FORMAT:-stablehlo}
N_CLASSES=${N_CLASSES:-28}
MODEL_PATH_ARG=${MODEL_PATH:+--model_path "$MODEL_PATH"}

for config in S S_A N N_A; do
  for model_type in KP2DtinyV2 KP2DtinyV3; do
    out="$OUT_DIR/${config}_${model_type}"
    echo "== exporting $config $model_type -> $out ($FORMAT)"
    # shellcheck disable=SC2086
    python export_model.py --config "$config" --model_type "$model_type" \
      --n_classes "$N_CLASSES" --to_export --format "$FORMAT" \
      --out "$out" $MODEL_PATH_ARG
  done
done
echo "all exports written under $OUT_DIR/"
