#!/bin/sh
# Round-3 post-labeling pipeline: wait for the sharded GP labeling
# workers to finish, train the resolution regressor on the full labeled
# set, promote it to data/res_rgr_model/r3, and run the dynamic-
# resolution A/B (auto vs fixed particle counts) on held-out scenes.
# Launch: nohup sh scripts/post_labeling_pipeline.sh > logs/post_labeling.log 2>&1 &
set -e
cd "$(dirname "$0")/.."

echo "waiting for GP labeling workers..."
for p in /tmp/gp_r3_0.pid /tmp/gp_r3_1.pid /tmp/gp_r3_2.pid; do
  [ -f "$p" ] || continue
  pid=$(cat "$p")
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
done
NUM=$(ls data/res_rgr_data_r2 | wc -l)
echo "labeling done: $NUM scenes"

# r3 regressor config = r2 config with the full labeled count
sed "s/num_data: 32/num_data: $NUM/" config/train/res_rgr_r2.yaml \
  > config/train/res_rgr_r3_train.yaml

PYTHONPATH=/root/.axon_site:/root/repo \
  timeout 7200 python -m dyn_res_pile_manip_tpu.train.train_res_rgr \
  config/train/res_rgr_r3_train.yaml || echo "regressor train exited"

TRAIN_DIR=$(ls -dt data/res_rgr_model/2*/ | head -1)
mkdir -p data/res_rgr_model/r3
cp "$TRAIN_DIR/net_best_dy.ckpt" data/res_rgr_model/r3/net_best_dy.ckpt
echo "promoted $TRAIN_DIR -> data/res_rgr_model/r3"

PYTHONPATH=/root/.axon_site:/root/repo \
  timeout 14400 python scripts/eval_auto_res.py \
  --scenes 4 --n-mpc 8 --fixed 20 50 90 \
  --rgr-folder r3 --gnn-folder r3 --seed 777 \
  --out eval_auto_res_r3.json || echo "eval exited"
echo "post-labeling pipeline done"
