#!/bin/sh
# Round-3d label harvest (time-boxed): stop the GP labeling workers
# wherever they are (a killed worker loses only its in-flight scene —
# completed opt_den labels are written per-scene and committed by the
# watcher), sync labels to assets/, train the resolution regressor on the
# full labeled set, and promote it to data/res_rgr_model/r3.
# The dynamic-resolution A/B (eval_auto_res) is launched separately so
# its chip window can be scheduled against GNN training.
# Launch: nohup sh scripts/finish_labeling_r3d.sh > logs/finish_labeling_r3d.log 2>&1 &
cd "$(dirname "$0")/.."

for f in /tmp/gp_r3c_*.pid; do
  [ -f "$f" ] || continue
  sup=$(cat "$f")
  for child in $(ps -o pid= --ppid "$sup" 2>/dev/null); do
    kill "$child" 2>/dev/null && echo "killed labeler child $child"
  done
  kill "$sup" 2>/dev/null && echo "killed labeler supervisor $sup"
done
sleep 5

# drop scene dirs without a completed label (opt_den missing)
python - <<'EOF'
import os, shutil
root = "data/res_rgr_data_r2"
for d in sorted(os.listdir(root)):
    p = os.path.join(root, d)
    if not os.path.isdir(p):
        continue
    if not os.path.exists(os.path.join(p, "opt_den.npy")):
        shutil.rmtree(p)
        print("dropped incomplete scene", d)
EOF

NUM=$(ls -d data/res_rgr_data_r2/*/ | wc -l)
echo "labeled scenes: $NUM"

rm -rf assets/r2/res_rgr_data_r2
cp -r data/res_rgr_data_r2 assets/r2/res_rgr_data_r2
git add assets/r2/res_rgr_data_r2 && git commit -q -m \
  "Ship $NUM GP-labeled resolution scenes (restart-proof)" || true

sed "s/num_data: 32/num_data: $NUM/" config/train/res_rgr_r2.yaml \
  > config/train/res_rgr_r3d_train.yaml

env PYTHONPATH=/root/.axon_site:/root/repo \
  timeout "${RGR_TIMEOUT:-5400}" \
  python -m dyn_res_pile_manip_tpu.train.train_res_rgr \
  config/train/res_rgr_r3d_train.yaml \
  > logs/train_rgr_r3d.log 2>&1 || echo "regressor train exited ($?)"

TRAIN_DIR=$(ls -dt data/res_rgr_model/2*/ | head -1)
if [ -f "$TRAIN_DIR/net_best_dy.ckpt" ]; then
  mkdir -p data/res_rgr_model/r3 assets/r3
  cp "$TRAIN_DIR/net_best_dy.ckpt" data/res_rgr_model/r3/net_best_dy.ckpt
  cp "$TRAIN_DIR/net_best_dy.ckpt" assets/r3/res_rgr_r3.ckpt
  git add assets/r3 && git commit -q -m \
    "Ship round-3d resolution regressor ($NUM labeled scenes)" || true
  echo "promoted $TRAIN_DIR -> r3 + assets/r3"
else
  echo "NO net_best_dy.ckpt produced"
fi
