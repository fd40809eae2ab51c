#!/usr/bin/env bash
# Full reference-protocol results table in ONE command (VERDICT r4 next
# #7 / BASELINE.md "run-for-run" contract). Point datasets.json at real
# data and run:
#
#   hpatches_data_path    -> HPatches root (i_*/v_* sequences)
#   kitti_data_path       -> KITTI odometry seq-06 dir (06.mp4 + 06.txt)
#   pittsburgh_data_path  -> Pittsburgh 30k/250k root (NetVLAD .mat)
#   coco_data_path        -> COCO-Stuff root         (seg eval, 28 cls)
#   nyuv2_data_path       -> NYUv2 extracted files   (depth eval, opt.)
#
# With no real data the synthetic stand-ins regenerate automatically
# (scripts/regen_stack.sh [1/4] writes them where datasets.json already
# points), so this script is smoke-testable end-to-end in this
# environment — the day real data lands, the SAME command produces the
# reference-protocol table: keypoints/seg/VPR at 240x320 with top-k
# {300,1000} (reference eval_multitask.py:125-126), VO at the three
# protocol resolutions (:310), plus the two-stack pipeline-parity run
# (tools/pipeline_parity.py) that executes the REFERENCE'S OWN eval code
# next to ours on identical inputs.
#
# Env knobs: MODEL_PATH (checkpoint; default pinned/extractor_S8.npz),
# CONFIG (default S), N_CLASSES (default 8 for the synthetic-trained
# pinned weights; 28 for a real COCO checkpoint), LG_CKPT (optional
# trained LightGlue for the VO matcher sweep), OUT_DIR.
set -uo pipefail
cd "$(dirname "$0")/.."

MODEL_PATH=${MODEL_PATH:-pinned/extractor_S8.npz}
CONFIG=${CONFIG:-S}
N_CLASSES=${N_CLASSES:-8}
LG_CKPT=${LG_CKPT:-pinned/lightglue_S.npz}
OUT_DIR=${OUT_DIR:-results_real}
MAX_ITEMS=${MAX_ITEMS:-}
mkdir -p "$OUT_DIR"

rc=0

echo "== [1/3] eval_multitask: keypoints(top-k 300,1000) + seg + VPR + depth @240x320, VO @3 protocol sizes"
python eval_multitask.py --model_path "$MODEL_PATH" --config "$CONFIG" \
  --n_classes "$N_CLASSES" --keypoints --segmentation --visloc --depth \
  --vo --top_k 300 1000 --im_h 240 --im_w 320 --bf16 \
  ${MAX_ITEMS:+--max_items "$MAX_ITEMS"} \
  --out "$OUT_DIR/eval_multitask.json" || rc=1

echo "== [2/3] vo_eval matcher sweep @128x512 (bf / dense / lightglue, offline device solver)"
for matcher in bf dense; do
  python vo_eval.py --kitti_path "$(python -c "
import json;print(json.load(open('datasets.json')).get('kitti_data_path',''))")" \
    --model_path "$MODEL_PATH" --config "$CONFIG" --n_classes "$N_CLASSES" \
    --im_h 128 --im_w 512 --matcher "$matcher" --offline --nn_thresh 0.3 \
    --out "$OUT_DIR/vo_${matcher}.json" || rc=1
done
if [ -e "$LG_CKPT" ] || [ -d "$LG_CKPT" ]; then
  python vo_eval.py --kitti_path "$(python -c "
import json;print(json.load(open('datasets.json')).get('kitti_data_path',''))")" \
    --model_path "$MODEL_PATH" --config "$CONFIG" --n_classes "$N_CLASSES" \
    --im_h 128 --im_w 512 --matcher lightglue --lg_ckpt "$LG_CKPT" \
    --offline --nn_thresh 0.3 --out "$OUT_DIR/vo_lightglue.json" || rc=1
else
  echo "   (no LightGlue checkpoint at $LG_CKPT; skipping the lightglue row)"
fi

echo "== [3/3] pipeline parity: reference eval stack vs ours on identical inputs"
python tools/pipeline_parity.py --task keypoints --ckpt "$MODEL_PATH" \
  --top-k 300 > "$OUT_DIR/parity_keypoints.log" 2>&1 || rc=1
tail -3 "$OUT_DIR/parity_keypoints.log" || true
python tools/pipeline_parity.py --task vo --ckpt "$MODEL_PATH" \
  > "$OUT_DIR/parity_vo.log" 2>&1 || rc=1
tail -3 "$OUT_DIR/parity_vo.log" || true

python - "$OUT_DIR" <<'EOF'
import json, os, sys
d = sys.argv[1]
print("\n==== results table (", d, ") ====")
for f in sorted(os.listdir(d)):
    if f.endswith(".json"):
        try:
            r = json.load(open(os.path.join(d, f)))
        except Exception as e:
            print(f, "unreadable:", e); continue
        print("--", f)
        print(json.dumps(r, indent=1, default=str)[:1200])
EOF
exit $rc
