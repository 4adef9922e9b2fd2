#!/bin/sh
# Round-4b takeover pipeline: replaces round4_pipeline.sh with a
# schedule that fits the remaining round budget (the original 4h train
# timeout would have collided with the end-of-round bench window).
#
# 1. Kill the original 600-episode watcher (avoid a double train).
# 2. Wait for >=EPIS_FOR_TRAIN complete episodes OR the start deadline.
# 3. Stop datagen supervisors + children (pid files; never by pattern).
# 4. Train the GNN at the reference recipe (config/train/gnn_dyn_r4.yaml)
#    with a bounded timeout, promote + COMMIT the checkpoint.
# 5. Run the model-only closed loop (VERDICT r3 item 3: sim_verify=0,
#    reference settings, config/mpc/config_r4_modelonly.yaml) and commit
#    the result JSON to results/r4/.
# Launch: nohup sh scripts/round4b_pipeline.sh > logs/round4b_pipeline.log 2>&1 &
cd "$(dirname "$0")/.."

EPIS_FOR_TRAIN=${EPIS_FOR_TRAIN:-560}
START_DEADLINE=${START_DEADLINE:-12:40}
TRAIN_TIMEOUT=${TRAIN_TIMEOUT:-8100}
TRAIN_CFG=${TRAIN_CFG:-config/train/gnn_dyn_r4.yaml}

# --- 1. retire the original watcher before it can fire at 600 episodes
if [ -f /tmp/round4_pipeline.pid ]; then
  old=$(cat /tmp/round4_pipeline.pid)
  for child in $(ps -o pid= --ppid "$old" 2>/dev/null); do
    kill "$child" 2>/dev/null
  done
  kill "$old" 2>/dev/null && echo "retired round4_pipeline ($old)"
  rm -f /tmp/round4_pipeline.pid
fi

count_complete() {
  env PYTHONPATH=/root/.axon_site:/root/repo python - <<'EOF'
from dyn_res_pile_manip_tpu.datasets.dataset_gnn_dyn import ParticleDataset
print(len(ParticleDataset.list_episodes("data/gnn_dyn_data_custom", 10)))
EOF
}

deadline_ts=$(date -u -d "$START_DEADLINE" +%s)
echo "$(date -u +%H:%M:%S) waiting for $EPIS_FOR_TRAIN episodes or $START_DEADLINE UTC"
while true; do
  N=$(count_complete)
  NOW=$(date +%s)
  echo "$(date -u +%H:%M:%S) complete episodes: $N"
  [ "${N:-0}" -ge "$EPIS_FOR_TRAIN" ] && break
  [ "$NOW" -ge "$deadline_ts" ] && { echo "start deadline hit"; break; }
  sleep 180
done

# --- 3. stop datagen supervisors AND their python children
for f in /tmp/datagen_r4_*.pid; do
  [ -f "$f" ] || continue
  sup=$(cat "$f")
  for child in $(ps -o pid= --ppid "$sup" 2>/dev/null); do
    kill "$child" 2>/dev/null && echo "stopped datagen child $child"
  done
  kill "$sup" 2>/dev/null && echo "stopped datagen supervisor $sup"
  rm -f "$f"
done
sleep 10

# don't let a tunnel outage burn the training timeout in backend init
probe() {
  timeout 90 env PYTHONPATH=/root/.axon_site python -c \
    "import jax.numpy as j; print(float(j.ones(4).sum()))" >/dev/null 2>&1
}
until probe; do
  echo "$(date -u +%H:%M:%S) tunnel down; waiting before training"
  sleep 120
done
while [ -f /tmp/r4_bisect_running ]; do
  echo "$(date -u +%H:%M:%S) bisect window active; deferring training"
  sleep 120
done

N=$(count_complete)
echo "$(date -u +%H:%M:%S) training on $N complete episodes ($TRAIN_CFG, timeout ${TRAIN_TIMEOUT}s)"
env PYTHONPATH=/root/.axon_site:/root/repo \
  timeout "$TRAIN_TIMEOUT" \
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
  touch /tmp/r4_gnn_done
else
  echo "NO net_best.ckpt produced"
  touch /tmp/r4_gnn_done
  exit 1
fi

# --- 5. model-only closed loop at reference settings (sim_verify=0)
echo "$(date -u +%H:%M:%S) model-only closed loop (config_r4_modelonly)"
env PYTHONPATH=/root/.axon_site:/root/repo \
  timeout "${MODELONLY_TIMEOUT:-4800}" \
  python visualize_mpc.py config/mpc/config_r4_modelonly.yaml \
  > logs/visualize_mpc_r4_modelonly.log 2>&1 || echo "model-only exited ($?)"
mkdir -p results/r4
if [ -f visualize_mpc_result.json ]; then
  cp visualize_mpc_result.json results/r4/visualize_mpc_model_only.json
  git add results/r4 logs/visualize_mpc_r4_modelonly.log \
    && git commit -q -m \
    "Round-4 model-only closed loop (sim_verify=0) result" || true
fi
touch /tmp/r4_modelonly_done
echo "$(date -u +%H:%M:%S) round-4b pipeline done"
