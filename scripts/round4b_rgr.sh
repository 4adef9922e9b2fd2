#!/bin/sh
# Round-4b regressor branch (VERDICT r3 item 2): wait for the GP
# labelers, train the resolution regressor on the full labeled set,
# promote + commit it, then (after the model-only MPC run frees the
# chip) run the dynamic-resolution A/B on held-out scenes.
# Launch: nohup sh scripts/round4b_rgr.sh > logs/round4b_rgr.log 2>&1 &
cd "$(dirname "$0")/.."

LABEL_DEADLINE=${LABEL_DEADLINE:-13:50}
EVAL_START_DEADLINE=${EVAL_START_DEADLINE:-15:55}

deadline_ts=$(date -u -d "$LABEL_DEADLINE" +%s)
echo "$(date -u +%H:%M:%S) waiting for GP labelers (deadline $LABEL_DEADLINE UTC)"
while true; do
  alive=0
  for p in /tmp/gp_r4_0.pid /tmp/gp_r4_1.pid; do
    [ -f "$p" ] && kill -0 "$(cat "$p")" 2>/dev/null && alive=1
  done
  [ "$alive" = 0 ] && { echo "labelers done"; break; }
  if [ "$(date +%s)" -ge "$deadline_ts" ]; then
    echo "label deadline hit; stopping labelers"
    for p in /tmp/gp_r4_0.pid /tmp/gp_r4_1.pid; do
      [ -f "$p" ] || continue
      sup=$(cat "$p")
      for child in $(ps -o pid= --ppid "$sup" 2>/dev/null); do
        kill "$child" 2>/dev/null && echo "stopped labeler child $child"
      done
      kill "$sup" 2>/dev/null
      rm -f "$p"
    done
    sleep 5
    break
  fi
  sleep 120
done

NUM=$(ls data/res_rgr_data_r2 | wc -l)
echo "$(date -u +%H:%M:%S) training regressor on $NUM labeled scenes"
sed "s/num_data: .*/num_data: $NUM/" config/train/res_rgr_r3e.yaml \
  > config/train/res_rgr_r4_train.yaml

env PYTHONPATH=/root/.axon_site:/root/repo \
  timeout "${RGR_TIMEOUT:-3000}" \
  python -m dyn_res_pile_manip_tpu.train.train_res_rgr \
  config/train/res_rgr_r4_train.yaml \
  > logs/train_rgr_r4.log 2>&1 || echo "regressor train exited ($?)"

TRAIN_DIR=$(ls -dt data/res_rgr_model/2*/ 2>/dev/null | head -1)
if [ -n "$TRAIN_DIR" ] && [ -f "$TRAIN_DIR/net_best_dy.ckpt" ]; then
  mkdir -p data/res_rgr_model/r4 assets/r4
  cp "$TRAIN_DIR/net_best_dy.ckpt" data/res_rgr_model/r4/net_best_dy.ckpt
  cp "$TRAIN_DIR/net_best_dy.ckpt" assets/r4/res_rgr_r4.ckpt
  cp "$TRAIN_DIR/log.txt" assets/r4/res_rgr_r4_train_log.txt 2>/dev/null
  cp config/train/res_rgr_r4_train.yaml assets/r4/ 2>/dev/null
  git add assets/r4 config/train/res_rgr_r4_train.yaml && git commit -q -m \
    "Ship round-4 resolution regressor (trained on $NUM GP-labeled scenes)" || true
  echo "$(date -u +%H:%M:%S) promoted $TRAIN_DIR -> r4 + assets/r4"
else
  echo "NO net_best_dy.ckpt produced"
  exit 1
fi

# wait for the chip: model-only MPC must finish first (or its deadline)
ev_ts=$(date -u -d "$EVAL_START_DEADLINE" +%s)
echo "$(date -u +%H:%M:%S) waiting for model-only run (start eval by $EVAL_START_DEADLINE UTC)"
while [ ! -f /tmp/r4_modelonly_done ]; do
  [ "$(date +%s)" -ge "$ev_ts" ] && { echo "eval start deadline hit"; break; }
  sleep 120
done

echo "$(date -u +%H:%M:%S) dynamic-resolution A/B (auto vs fixed)"
mkdir -p results/r4
env PYTHONPATH=/root/.axon_site:/root/repo \
  timeout "${EVAL_TIMEOUT:-3300}" \
  python scripts/eval_auto_res.py \
  --scenes 3 --n-mpc 6 --fixed 20 90 \
  --rgr-folder r4 --gnn-folder r4 --seed 777 \
  --out results/r4/eval_auto_res_r4.json \
  > logs/eval_auto_res_r4.log 2>&1 || echo "eval exited ($?)"
if [ -f results/r4/eval_auto_res_r4.json ]; then
  git add results/r4 logs/eval_auto_res_r4.log && git commit -q -m \
    "Round-4 dynamic-resolution A/B result (auto vs fixed-N)" || true
fi
echo "$(date -u +%H:%M:%S) regressor branch done"
