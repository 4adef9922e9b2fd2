#!/bin/sh
# Round-3c post-labeling: wait for the GP labeling workers (pid files in
# $GP_PIDS), sync the labeled scenes into assets/ (restart-proof), train
# the resolution regressor on the full labeled set, promote it, and run
# the dynamic-resolution A/B on held-out scenes.
cd "$(dirname "$0")/.."

echo "waiting for GP labeling workers..."
for p in ${GP_PIDS:-/tmp/gp_r3c_0.pid /tmp/gp_r3c_1.pid}; do
  [ -f "$p" ] || continue
  pid=$(cat "$p")
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
done
NUM=$(ls data/res_rgr_data_r2 | wc -l)
echo "labeling done: $NUM scenes"

rm -rf assets/r2/res_rgr_data_r2
cp -r data/res_rgr_data_r2 assets/r2/res_rgr_data_r2
git add assets/r2/res_rgr_data_r2 && git commit -q -m \
  "Ship $NUM GP-labeled resolution scenes (restart-proof)" || true

sed "s/num_data: 32/num_data: $NUM/" config/train/res_rgr_r2.yaml \
  > config/train/res_rgr_r3c_train.yaml

env PYTHONPATH=/root/.axon_site:/root/repo \
  timeout 7200 python -m dyn_res_pile_manip_tpu.train.train_res_rgr \
  config/train/res_rgr_r3c_train.yaml \
  > logs/train_rgr_r3c.log 2>&1 || echo "regressor train exited"

TRAIN_DIR=$(ls -dt data/res_rgr_model/2*/ | head -1)
mkdir -p data/res_rgr_model/r3
cp "$TRAIN_DIR/net_best_dy.ckpt" data/res_rgr_model/r3/net_best_dy.ckpt
echo "promoted $TRAIN_DIR -> data/res_rgr_model/r3"

env PYTHONPATH=/root/.axon_site:/root/repo \
  timeout 14400 python scripts/eval_auto_res.py \
  --scenes 4 --n-mpc 8 --fixed 20 50 90 \
  --rgr-folder r3 --gnn-folder r3 --seed 777 \
  --out eval_auto_res_r3c.json \
  > logs/eval_auto_res_r3c.log 2>&1 || echo "eval exited"
echo "post-labeling pipeline done"
