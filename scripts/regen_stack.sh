#!/usr/bin/env bash
# Canonical, fully-seeded regeneration of the quality stack: synthetic
# fixtures -> extractor checkpoint -> LightGlue checkpoint -> pinned
# git-committable .npz weights (VERDICT r4 next #3). One command; every
# stage is seeded, so two runs on the same backend produce the same
# artifacts. The pinned weights under pinned/ are the measurement anchor:
# quality artifacts cite them, and a wiped model_ckpt/ can be rebuilt
# from them without retraining (tools use --model_path pinned/*.npz).
set -euo pipefail
cd "$(dirname "$0")/.."

EPOCHS=${EPOCHS:-1500}
STEPS_LG=${STEPS_LG:-8000}
SEED=${SEED:-42069}

echo "== [1/4] fixtures (seeded)"
python scripts/make_synthetic_pittsburgh.py fixtures/pitts_synth --seed 0
python scripts/make_synthetic_kitti.py fixtures/kitti_corridor_gray 30 corridor
python - <<'EOF'
import sys, os
sys.path.insert(0, os.getcwd())
from nanovs_slam_tpu.data.hpatches import ensure_synthetic_hpatches
print("hpatches fixture:", ensure_synthetic_hpatches())
EOF

echo "== [2/4] extractor (S/8, ${EPOCHS} epochs, seed ${SEED})"
python train_multitask.py --dataset_name synthetic --config S \
  --batch_size 16 --n_epochs "${EPOCHS}" --bf16 --device_cache \
  --scan_epoch --no_eval --seed "${SEED}" --log_every 200 \
  --out_model_path model_ckpt/r5_long

echo "== [3/4] LightGlue (${STEPS_LG} steps on the extractor's own descriptors)"
python train_lightglue.py --extractor_config S --n_classes 8 \
  --extractor_path model_ckpt/r5_long --n_steps "${STEPS_LG}" --seed 0 \
  --out_model_path model_ckpt/lg_r5

echo "== [4/4] pin to git-sized npz"
python tools/pin_checkpoint.py model_ckpt/r5_long pinned/extractor_S8.npz
python tools/pin_checkpoint.py model_ckpt/lg_r5 pinned/lightglue_S.npz
echo "done; commit pinned/*.npz"
