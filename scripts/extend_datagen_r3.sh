#!/bin/sh
# Extend the round-3 GNN dataset from 1111 episodes toward the reference
# recipe's 2000 (config/data_gen/gnn_dyn.yaml:5). Waits for the GP
# labeling workers to free the chip, then launches sharded datagen.
# Launch: nohup sh scripts/extend_datagen_r3.sh > logs/extend_datagen.log 2>&1 &
set -e
cd "$(dirname "$0")/.."

for p in /tmp/gp_r3_0.pid /tmp/gp_r3_1.pid /tmp/gp_r3_2.pid; do
  [ -f "$p" ] || continue
  pid=$(cat "$p")
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
done

BASE=$(ls data/gnn_dyn_data_custom | sort -n | tail -1)
BASE=$((BASE + 1))
TARGET=2000
PER=$(( (TARGET - BASE + 2) / 3 ))
echo "extending from episode $BASE to $TARGET ($PER per worker)"
i=0
for off in 0 1 2; do
  START=$((BASE + off * PER))
  N=$PER
  [ $((START + N)) -gt $TARGET ] && N=$((TARGET - START))
  [ "$N" -le 0 ] && continue
  nohup env PYTHONPATH=/root/.axon_site:/root/repo \
    python -m dyn_res_pile_manip_tpu.datagen.gnn_dyn_data \
    config/data_gen/gnn_dyn.yaml \
    --base-epi "$START" --n-epi "$N" --seed $((9000 + off)) \
    > "logs/datagen_ext_$off.log" 2>&1 &
  echo $! > "/tmp/datagen_ext_$off.pid"
  i=$((i + 1))
done
echo "launched $i datagen workers"
