#!/bin/sh
# Round-3c pipeline (post-VM-restart rebuild): the gitignored data/ tree
# (datasets, checkpoints, GP labels) was wiped by a host restart; the
# datagen + labeling fleets were relaunched from the committed recipes.
# This orchestrator waits for a usable episode count, trains the GNN,
# promotes the best checkpoint to data/gnn_dyn_model/r3 AND commits it to
# assets/r3/ (so a future restart cannot lose it again), then launches
# the post-labeling pipeline (regressor + auto-res A/B).
# Launch: nohup sh scripts/round3c_pipeline.sh > logs/round3c.log 2>&1 &
cd "$(dirname "$0")/.."

EPIS_FOR_TRAIN=${EPIS_FOR_TRAIN:-600}
TRAIN_CFG=${TRAIN_CFG:-config/train/gnn_dyn_r4.yaml}

count_complete() {
  python - <<'EOF'
from dyn_res_pile_manip_tpu.datasets.dataset_gnn_dyn import ParticleDataset
print(len(ParticleDataset.list_episodes("data/gnn_dyn_data_custom", 10)))
EOF
}

echo "$(date -u +%H:%M:%S) waiting for $EPIS_FOR_TRAIN complete episodes"
while true; do
  N=$(count_complete)
  echo "$(date -u +%H:%M:%S) complete episodes: $N"
  [ "$N" -ge "$EPIS_FOR_TRAIN" ] && break
  sleep 300
done

echo "$(date -u +%H:%M:%S) launching GNN training ($TRAIN_CFG)"
env PYTHONPATH=/root/.axon_site:/root/repo \
  timeout "${TRAIN_TIMEOUT:-14400}" \
  python -m dyn_res_pile_manip_tpu.train.train_gnn_dyn "$TRAIN_CFG" \
  > logs/train_gnn_r3c.log 2>&1 || echo "training exited ($?)"

TRAIN_DIR=$(ls -dt data/gnn_dyn_model/2*/ | head -1)
mkdir -p data/gnn_dyn_model/r3 assets/r3
cp "$TRAIN_DIR/net_best.ckpt" data/gnn_dyn_model/r3/net_best.ckpt
cp "$TRAIN_DIR/config.yaml" data/gnn_dyn_model/r3/config.yaml
cp "$TRAIN_DIR/net_best.ckpt" assets/r3/gnn_r3.ckpt
cp "$TRAIN_DIR/config.yaml" assets/r3/gnn_r3_config.yaml
git add assets/r3 && git commit -q -m \
  "Ship round-3c GNN checkpoint (restart-proof artifact)" || true
echo "$(date -u +%H:%M:%S) promoted $TRAIN_DIR -> r3 + assets/r3"

# regressor + auto-res A/B once the GP labelers finish
GP_PIDS="/tmp/gp_r3c_0.pid /tmp/gp_r3c_1.pid" \
  nohup sh scripts/post_labeling_r3c.sh > logs/post_labeling_r3c.log 2>&1 &
echo "launched post-labeling pipeline ($!)"
