#!/bin/sh
# Round-3 post-training pipeline: promote the best GNN checkpoint to the
# 'r3' model folder, then launch sharded GP labeling workers extending
# the round-2 labeled set (scenes 33+) + the letter-goal closed-loop
# eval concurrently (the axon chip multiplexes processes).
set -e
TRAIN_DIR=$(ls -dt data/gnn_dyn_model/2*/ | head -1)
mkdir -p data/gnn_dyn_model/r3
cp "$TRAIN_DIR/net_best.ckpt" data/gnn_dyn_model/r3/net_best.ckpt
cp "$TRAIN_DIR/config.yaml" data/gnn_dyn_model/r3/config.yaml
echo "promoted $TRAIN_DIR -> data/gnn_dyn_model/r3"

BASE0=${BASE0:-33}
N_PER=${N_PER:-30}
for i in 0 1 2; do
  BASE=$((BASE0 + i * N_PER))
  nohup env PYTHONPATH=/root/.axon_site:/root/repo \
    python -m dyn_res_pile_manip_tpu.datagen.res_rgr_data \
    --config config/data_gen/res_rgr_r3.yaml --dir data/res_rgr_data_r2 \
    --base-scene $BASE --n-scenes $N_PER --seed $((4000 + i)) \
    > logs/gp_label_r3_$i.log 2>&1 &
  echo $! > /tmp/gp_r3_$i.pid
done
nohup env PYTHONPATH=/root/.axon_site:/root/repo \
  python visualize_mpc.py config/mpc/config_r3_fixed.yaml \
  > logs/ishape_eval_r3.log 2>&1 &
echo $! > /tmp/ishape_r3.pid
echo "launched 3 GP workers (scenes $BASE0+) + I-shape eval"
