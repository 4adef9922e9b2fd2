#!/bin/sh
# Stage-3 recovery: after the post-labeling pipeline (regressor train +
# dynamic-resolution A/B eval) finishes with the chip, resume GP labeling
# for the scenes the tunnel outage orphaned (holes in 33-122). The scene
# loop is restart-idempotent (opt_den.npy completion check), so one
# supervised worker sweeps the full range and skips finished scenes.
# Launch: nohup sh scripts/resume_labeling.sh > logs/resume_labeling.log 2>&1 &
cd "$(dirname "$0")/.."

echo "$(date -u +%H:%M:%S) waiting for the post-labeling pipeline..."
while ! grep -q "post-labeling pipeline done" logs/post_labeling2.log 2>/dev/null; do
  sleep 300
done
echo "$(date -u +%H:%M:%S) A/B eval done; resuming GP labeling (scenes 33-122)"

tries=0
until env PYTHONPATH=/root/.axon_site:/root/repo \
  python -m dyn_res_pile_manip_tpu.datagen.res_rgr_data \
  --config config/data_gen/res_rgr_r3.yaml --dir data/res_rgr_data_r2 \
  --base-scene 33 --n-scenes 90 --seed $((5000 + tries)); do
  tries=$((tries + 1))
  [ $tries -gt 40 ] && break
  echo "labeler retry $tries after backoff"
  sleep 240
done
echo "$(date -u +%H:%M:%S) labeling sweep done: $(ls data/res_rgr_data_r2 | grep -c '^[0-9]*$') scenes"
