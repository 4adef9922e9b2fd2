#!/bin/sh
# Round-4 chip fleet: wait for the axon tunnel, then launch the
# wipe-proofing watcher, 4 supervised datagen workers (episodes 0-999,
# fresh post-wipe dataset, reference recipe config/data_gen/gnn_dyn.yaml)
# and 2 supervised GP labelers (scenes 101-200, extending the committed
# 101 toward the >=300 target; model_folder r2_labeler = the same r2 GNN
# bytes that labeled scenes 0-100, for label consistency).
# Workers start staggered: a cold-cache compile stampede wedges the
# remote-compile service on this 1-core host (round-3 lesson).
# Launch: nohup sh scripts/launch_r4_fleet.sh > logs/launch_r4.log 2>&1 &
cd "$(dirname "$0")/.."

STAGGER=${STAGGER:-150}

probe() {
  timeout 120 env PYTHONPATH=/root/.axon_site python -c \
    "import jax.numpy as j; print(float(j.ones(4).sum()))" >/dev/null 2>&1
}

echo "$(date -u +%H:%M:%S) waiting for the axon tunnel..."
until probe; do
  echo "$(date -u +%H:%M:%S) tunnel still down"
  sleep 120
done
echo "$(date -u +%H:%M:%S) tunnel is up"

nohup sh scripts/commit_artifacts_r4.sh > logs/commit_artifacts_r4.log 2>&1 &
echo $! > /tmp/watcher_r4.pid
echo "launched artifact watcher ($(cat /tmp/watcher_r4.pid))"

for off in 0 1 2 3; do
  START=$((off * 250))
  nohup sh -c "
    tries=0
    until env PYTHONPATH=/root/.axon_site:/root/repo \
      python -m dyn_res_pile_manip_tpu.datagen.gnn_dyn_data \
      config/data_gen/gnn_dyn.yaml \
      --base-epi $START --n-epi 250 --seed \$((4000 + $off * 100 + tries)) \
      --skip-existing; do
      tries=\$((tries + 1))
      [ \$tries -gt 60 ] && break
      echo \"datagen $off retry \$tries after backoff\"
      sleep 180
    done" > "logs/datagen_r4_$off.log" 2>&1 &
  echo $! > "/tmp/datagen_r4_$off.pid"
  echo "launched datagen supervisor $off ($(cat /tmp/datagen_r4_$off.pid))"
  sleep "$STAGGER"
done

for i in 0 1; do
  BASE=$((101 + i * 50))
  nohup sh -c "
    tries=0
    until env PYTHONPATH=/root/.axon_site:/root/repo \
      python -m dyn_res_pile_manip_tpu.datagen.res_rgr_data \
      --config config/data_gen/res_rgr_r4.yaml --dir data/res_rgr_data_r2 \
      --base-scene $BASE --n-scenes 50 --seed \$((6100 + $i * 100 + tries)); do
      tries=\$((tries + 1))
      [ \$tries -gt 60 ] && break
      echo \"labeler $i retry \$tries after backoff\"
      sleep 180
    done" > "logs/gp_label_r4_$i.log" 2>&1 &
  echo $! > "/tmp/gp_r4_$i.pid"
  echo "launched labeler supervisor $i ($(cat /tmp/gp_r4_$i.pid))"
  sleep "$STAGGER"
done
echo "$(date -u +%H:%M:%S) round-4 fleet launched"
