#!/bin/sh
# Round-3d GNN fine-tune (time-boxed endgame after the second VM wipe):
# warm-start from the committed round-2 checkpoint (assets/r2/gnn_r2.ckpt,
# trained on 511 episodes) and continue training on whatever fresh
# episodes the post-wipe datagen fleet produced — the feasible analog of
# the reference's 2000-episode recipe (config/data_gen/gnn_dyn.yaml:10-11)
# on one contended chip. Stops the datagen workers first to free the chip.
# Launch: nohup sh scripts/train_gnn_r3d.sh > logs/train_gnn_r3d_drv.log 2>&1 &
cd "$(dirname "$0")/.."

# stop datagen supervisors AND their python children (pid files hold the
# supervisor `sh -c until ...` loop; never kill by pattern)
for f in /tmp/datagen_r3d_*.pid; do
  [ -f "$f" ] || continue
  sup=$(cat "$f")
  for child in $(ps -o pid= --ppid "$sup" 2>/dev/null); do
    kill "$child" 2>/dev/null && echo "killed datagen child $child"
  done
  kill "$sup" 2>/dev/null && echo "killed datagen supervisor $sup"
done
sleep 5

N=$(python - <<'EOF'
from dyn_res_pile_manip_tpu.datasets.dataset_gnn_dyn import ParticleDataset
print(len(ParticleDataset.list_episodes("data/gnn_dyn_data_custom", 10)))
EOF
)
echo "$(date -u +%H:%M:%S) training on $N complete episodes (warm-start r2)"

mkdir -p data/gnn_dyn_model/r3d
cp assets/r2/gnn_r2.ckpt data/gnn_dyn_model/r3d/net_epoch_0_iter_0.ckpt

env PYTHONPATH=/root/.axon_site:/root/repo \
  timeout "${TRAIN_TIMEOUT:-7200}" \
  python -m dyn_res_pile_manip_tpu.train.train_gnn_dyn \
  config/train/gnn_dyn_r3d.yaml \
  > logs/train_gnn_r3d.log 2>&1 || echo "training exited ($?)"

if [ -f data/gnn_dyn_model/r3d/net_best.ckpt ]; then
  mkdir -p data/gnn_dyn_model/r3 assets/r3
  cp data/gnn_dyn_model/r3d/net_best.ckpt data/gnn_dyn_model/r3/net_best.ckpt
  cp data/gnn_dyn_model/r3d/config.yaml data/gnn_dyn_model/r3/config.yaml
  cp data/gnn_dyn_model/r3d/net_best.ckpt assets/r3/gnn_r3.ckpt
  cp data/gnn_dyn_model/r3d/config.yaml assets/r3/gnn_r3_config.yaml
  cp data/gnn_dyn_model/r3d/log.txt assets/r3/gnn_r3_train_log.txt 2>/dev/null
  git add assets/r3 && git commit -q -m \
    "Ship round-3d GNN checkpoint (r2 warm-start + $N fresh episodes)" || true
  echo "$(date -u +%H:%M:%S) promoted r3d -> r3 + assets/r3"
else
  echo "NO net_best.ckpt produced - leaving r3 as-is"
fi
