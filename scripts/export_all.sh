#!/usr/bin/env bash
# Batch-export every standard config (reference bash_scripts/export_all_onnx.sh:
# S, S_A, N, N_A x V2/V3 to ONNX). FORMAT selects the artifact:
#   stablehlo (default) / savedmodel — the TPU deployment artifacts
#     (export.py via export_model.py)
#   onnx — the MCU/edge interchange artifact (export_onnx.py, torch
#     mirror; same files the reference script produces)
set -euo pipefail
cd "$(dirname "$0")/.."

OUT_DIR=${OUT_DIR:-exported}
mkdir -p "$OUT_DIR"
FORMAT=${FORMAT:-stablehlo}
N_CLASSES=${N_CLASSES:-28}
MODEL_PATH_ARG=${MODEL_PATH:+--model_path "$MODEL_PATH"}
WEIGHT_PATH_ARG=${WEIGHT_PATH:+--weight_path "$WEIGHT_PATH"}

for config in S S_A N N_A; do
  for model_type in KP2Dtiny KP2DtinyV3; do
    if [ "$FORMAT" = onnx ]; then
      echo "== exporting $config $model_type -> $OUT_DIR (onnx)"
      # shellcheck disable=SC2086
      python export_onnx.py --config "$config" --model_type "$model_type" \
        --n_classes "$N_CLASSES" --model_path "$OUT_DIR" $WEIGHT_PATH_ARG
    else
      mt=$model_type
      [ "$mt" = KP2Dtiny ] && mt=KP2DtinyV2
      out="$OUT_DIR/${config}_${mt}"
      echo "== exporting $config $mt -> $out ($FORMAT)"
      # shellcheck disable=SC2086
      python export_model.py --config "$config" --model_type "$mt" \
        --n_classes "$N_CLASSES" --to_export --format "$FORMAT" \
        --out "$out" $MODEL_PATH_ARG
    fi
  done
done
echo "all exports written under $OUT_DIR/"
