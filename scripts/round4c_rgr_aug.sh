#!/bin/sh
# Round-4c: retrain the resolution regressor WITH dihedral-8 augmentation
# (config/train/res_rgr_r4b.yaml) and promote it over the r4 baseline only
# if its best valid loss improves. The baseline (valid ~320 on 14 held-out
# scenes, logs/train_rgr_r4.log) memorizes the 125 raw train scenes within
# ~20 epochs; augmentation is the cheapest counter at 5% of the reference's
# labeled-set size.
# Launch: nohup sh scripts/round4c_rgr_aug.sh > logs/round4c_rgr_aug.log 2>&1 &
#         echo $! > /tmp/gp_r4_rgr2.pid   # endwatch glob kills it at 16:35
cd "$(dirname "$0")/.."

BASE_LOG=${BASE_LOG:-logs/train_rgr_r4.log}
TIMEOUT=${TIMEOUT:-3900}

base_valid=$(grep -o 'Best valid: [0-9.]*' "$BASE_LOG" | tail -1 | awk '{print $3}')
echo "$(date -u +%H:%M:%S) baseline best valid: $base_valid"

env PYTHONPATH=/root/.axon_site:/root/repo \
  timeout "$TIMEOUT" \
  python -m dyn_res_pile_manip_tpu.train.train_res_rgr \
  config/train/res_rgr_r4b.yaml \
  > logs/train_rgr_r4b.log 2>&1 || echo "aug train exited ($?)"

new_valid=$(grep -o 'Best valid: [0-9.]*' logs/train_rgr_r4b.log | tail -1 | awk '{print $3}')
echo "$(date -u +%H:%M:%S) augmented best valid: $new_valid"
TRAIN_DIR=$(ls -dt data/res_rgr_model/2*/ 2>/dev/null | head -1)
if [ -z "$new_valid" ] || [ ! -f "$TRAIN_DIR/net_best_dy.ckpt" ]; then
  echo "no augmented checkpoint produced; keeping baseline"
  exit 1
fi
better=$(python -c "print(int(float('$new_valid') < float('${base_valid:-1e9}')))")
if [ "$better" = "1" ]; then
  # atomic swap: the A/B eval may be about to load this path
  cp "$TRAIN_DIR/net_best_dy.ckpt" data/res_rgr_model/r4/.net_new.ckpt
  mv data/res_rgr_model/r4/.net_new.ckpt data/res_rgr_model/r4/net_best_dy.ckpt
  cp "$TRAIN_DIR/net_best_dy.ckpt" assets/r4/res_rgr_r4.ckpt
  cp logs/train_rgr_r4b.log assets/r4/res_rgr_r4_train_log.txt
  cp config/train/res_rgr_r4b.yaml assets/r4/
  git add assets/r4 && git commit -q -m \
    "Regressor retrained with dihedral augmentation (valid $new_valid < $base_valid)" || true
  echo "$(date -u +%H:%M:%S) promoted augmented regressor (valid $new_valid)"
else
  echo "$(date -u +%H:%M:%S) augmented run did not beat baseline ($new_valid >= $base_valid); keeping baseline"
fi
