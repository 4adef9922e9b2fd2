#!/bin/sh
# Post-training pipeline: promote the best GNN checkpoint to the 'r2'
# model folder, then launch sharded GP labeling workers + the I-shape
# closed-loop eval concurrently (the axon chip multiplexes processes).
set -e
TRAIN_DIR=$(ls -dt data/gnn_dyn_model/2*/ | head -1)
mkdir -p data/gnn_dyn_model/r2
cp "$TRAIN_DIR/net_best.ckpt" data/gnn_dyn_model/r2/net_best.ckpt
cp "$TRAIN_DIR/config.yaml" data/gnn_dyn_model/r2/config.yaml
echo "promoted $TRAIN_DIR -> data/gnn_dyn_model/r2"

N_PER=${N_PER:-20}
for i in 0 1 2; do
  BASE=$((i * N_PER))
  nohup python -m dyn_res_pile_manip_tpu.datagen.res_rgr_data \
    --config config/data_gen/res_rgr_r2.yaml \
    --base-scene $BASE --n-scenes $N_PER --seed $((1000 + i)) \
    > logs/gp_label_$i.log 2>&1 &
  echo $! > /tmp/gp_$i.pid
done
nohup python visualize_mpc.py config/mpc/config_r2_fixed.yaml \
  > logs/ishape_eval.log 2>&1 &
echo $! > /tmp/ishape.pid
echo "launched 3 GP workers + I-shape eval"
