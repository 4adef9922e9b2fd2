#!/bin/sh
# Round-4 learning-stack rebuild (VERDICT r3 item 1): wait for enough
# fresh episodes, free the chip of datagen workers, train the GNN from
# scratch at the reference recipe (lr 1e-3, batch 4, 5-step rollout MSE,
# /root/reference/config/train/gnn_dyn.yaml:24-26), promote + COMMIT the
# checkpoint the moment training ends (the r4 watcher also commits
# net_best every 15 min while training runs), then resume datagen toward
# the reference's 2000 episodes with 2 workers.
# Launch: nohup sh scripts/round4_pipeline.sh > logs/round4_pipeline.log 2>&1 &
cd "$(dirname "$0")/.."

EPIS_FOR_TRAIN=${EPIS_FOR_TRAIN:-600}
TRAIN_CFG=${TRAIN_CFG:-config/train/gnn_dyn_r4.yaml}

count_complete() {
  env PYTHONPATH=/root/.axon_site:/root/repo python - <<'EOF'
from dyn_res_pile_manip_tpu.datasets.dataset_gnn_dyn import ParticleDataset
print(len(ParticleDataset.list_episodes("data/gnn_dyn_data_custom", 10)))
EOF
}

echo "$(date -u +%H:%M:%S) waiting for $EPIS_FOR_TRAIN complete episodes"
while true; do
  N=$(count_complete)
  echo "$(date -u +%H:%M:%S) complete episodes: $N"
  [ "${N:-0}" -ge "$EPIS_FOR_TRAIN" ] && break
  sleep 300
done

# stop datagen supervisors AND their python children (pid files hold the
# supervisor `sh -c until ...` loop; never kill by pattern)
for f in /tmp/datagen_r4_*.pid; do
  [ -f "$f" ] || continue
  sup=$(cat "$f")
  for child in $(ps -o pid= --ppid "$sup" 2>/dev/null); do
    kill "$child" 2>/dev/null && echo "stopped datagen child $child"
  done
  kill "$sup" 2>/dev/null && echo "stopped datagen supervisor $sup"
done
sleep 10

N=$(count_complete)
echo "$(date -u +%H:%M:%S) training on $N complete episodes ($TRAIN_CFG)"
env PYTHONPATH=/root/.axon_site:/root/repo \
  timeout "${TRAIN_TIMEOUT:-14400}" \
  python -m dyn_res_pile_manip_tpu.train.train_gnn_dyn "$TRAIN_CFG" \
  > logs/train_gnn_r4.log 2>&1 || echo "training exited ($?)"

TRAIN_DIR=$(ls -dt data/gnn_dyn_model/2*/ 2>/dev/null | head -1)
if [ -n "$TRAIN_DIR" ] && [ -f "$TRAIN_DIR/net_best.ckpt" ]; then
  mkdir -p data/gnn_dyn_model/r4 assets/r4
  cp "$TRAIN_DIR/net_best.ckpt" data/gnn_dyn_model/r4/net_best.ckpt
  cp "$TRAIN_DIR/config.yaml" data/gnn_dyn_model/r4/config.yaml 2>/dev/null
  cp "$TRAIN_DIR/net_best.ckpt" assets/r4/gnn_r4.ckpt
  cp "$TRAIN_DIR/config.yaml" assets/r4/gnn_r4_config.yaml 2>/dev/null
  cp "$TRAIN_DIR/log.txt" assets/r4/gnn_r4_train_log.txt 2>/dev/null
  git add assets/r4 && git commit -q -m \
    "Ship round-4 GNN checkpoint (trained on $N fresh episodes)" || true
  echo "$(date -u +%H:%M:%S) promoted $TRAIN_DIR -> r4 + assets/r4"
else
  echo "NO net_best.ckpt produced"
fi

# resume datagen: fill the 0-999 range the stopped fleet left incomplete
# (--skip-existing makes this idempotent), 2 workers
for off in 0 1; do
  START=$((off * 500))
  nohup sh -c "
    tries=0
    until env PYTHONPATH=/root/.axon_site:/root/repo \
      python -m dyn_res_pile_manip_tpu.datagen.gnn_dyn_data \
      config/data_gen/gnn_dyn.yaml \
      --base-epi $START --n-epi 500 --seed \$((4400 + $off * 100 + tries)) \
      --skip-existing; do
      tries=\$((tries + 1))
      [ \$tries -gt 60 ] && break
      sleep 180
    done" > "logs/datagen_r4_ext_$off.log" 2>&1 &
  echo $! > "/tmp/datagen_r4_ext_$off.pid"
done
echo "$(date -u +%H:%M:%S) round-4 pipeline done (extension workers launched)"
