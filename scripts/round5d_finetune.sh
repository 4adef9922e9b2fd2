#!/bin/sh
# Optional round-5 fine-tune phase: used ONLY if the lr-1e-3 warm run
# plateaus (valid flat across epochs 0-5 — train log). Restarts training
# from the current net_best at a lower lr for the remainder of the GNN
# window, then hands back to the same promote/model-only/rgr/A-B/endwatch
# tail as round5c (this script replaces its trainer block; round5c must
# be killed BEFORE the trainer so its exit-handler doesn't fire early).
# Launch: nohup sh scripts/round5d_finetune.sh > logs/round5d.log 2>&1 &
cd "$(dirname "$0")/.."
mkdir -p logs results/r5

RGR_AT=$(date -u -d 12:45 +%s)
END_AT=$(date -u -d 15:10 +%s)
wait_until() { while [ "$(date +%s)" -lt "$1" ]; do sleep 60; done; }
kill_pidfiles() {
  for f in "$@"; do
    [ -f "$f" ] || continue
    sup=$(cat "$f")
    for c in $(ps -o pid= --ppid "$sup" 2>/dev/null); do
      for g in $(ps -o pid= --ppid "$c" 2>/dev/null); do kill "$g" 2>/dev/null; done
      kill "$c" 2>/dev/null
    done
    kill "$sup" 2>/dev/null; rm -f "$f"
  done
}

# ---- fine-tune from the best warm checkpoint at lower lr
mkdir -p data/gnn_dyn_model/r5_ft
cp data/gnn_dyn_model/r5_warm/net_best.ckpt \
   data/gnn_dyn_model/r5_ft/net_epoch_0_iter_0.ckpt
sed -e "s/lr: .*/lr: 0.0003/" \
    -e "s/folder: r5_warm/folder: r5_ft/" \
    config/train/gnn_dyn_r5.yaml > config/train/gnn_dyn_r5_ft.yaml
TRAIN_WIN=$(( RGR_AT - $(date +%s) - 120 ))
echo "$(date -u +%H:%M) fine-tune at lr 3e-4, ${TRAIN_WIN}s window"
env PYTHONPATH=/root/.axon_site:/root/repo timeout "$TRAIN_WIN" \
  python -m dyn_res_pile_manip_tpu.train.train_gnn_dyn \
  config/train/gnn_dyn_r5_ft.yaml > logs/train_gnn_r5_ft.log 2>&1 \
  || echo "fine-tune exited ($?)"

# ---- pick the better of warm/ft by their logged best valid
BEST=$(python - <<'EOF'
import re
def best(path):
    try:
        txt = open(path).read()
    except OSError:
        return float("inf")
    vals = [float(m) for m in re.findall(
        r"valid \[\d+/\d+\] Loss: ([0-9.]+)", txt)]
    return min(vals) if vals else float("inf")
w = best("data/gnn_dyn_model/r5_warm/log.txt")
f = best("data/gnn_dyn_model/r5_ft/log.txt")
print("r5_ft" if f < w else "r5_warm")
print(f"warm={w:.6f} ft={f:.6f}", file=__import__("sys").stderr)
EOF
)
echo "selected $BEST"
CK=data/gnn_dyn_model/$BEST/net_best.ckpt
mkdir -p data/gnn_dyn_model/r5 assets/r5
cp "$CK" data/gnn_dyn_model/r5/net_best.ckpt
cp data/gnn_dyn_model/$BEST/config.yaml data/gnn_dyn_model/r5/ 2>/dev/null
echo "trained r5 (warm from r4, best of lr1e-3/lr3e-4 phases: $BEST) $(md5sum $CK)" \
  > data/gnn_dyn_model/r5/PROVENANCE.txt
sh scripts/promote_artifact.sh "$CK" assets/r5/gnn_r5.ckpt
cp data/gnn_dyn_model/$BEST/log.txt assets/r5/gnn_r5_train_log.txt 2>/dev/null
git add assets/r5 assets/ckpts && git commit -q -m \
  "Ship round-5 GNN checkpoint (warm-started + lr-decay fine-tune)" || true

# ---- model-only closed loop (crash-safe per-push progress)
( env PYTHONPATH=/root/.axon_site:/root/repo \
    MPC_PROGRESS_JSON=results/r5/visualize_mpc_model_only_progress.json \
    timeout 6600 python visualize_mpc.py config/mpc/config_r5_modelonly.yaml \
    > logs/visualize_mpc_r5_modelonly.log 2>&1 || echo "model-only exited ($?)"
  [ -f visualize_mpc_result.json ] && \
    cp visualize_mpc_result.json results/r5/visualize_mpc_model_only.json
  git add results/r5 && git commit -q -m \
    "Round-5 model-only closed loop result (trained r5 GNN)" || true
  touch /tmp/r5_modelonly_done ) &
echo $! > /tmp/r5_modelonly.pid

# ---- regressor on all labels gathered so far
wait_until "$RGR_AT"
kill_pidfiles /tmp/gp_r5_1.pid
echo "$(date -u +%H:%M) labeler stopped"
NUM=$(ls data/res_rgr_data_r5 2>/dev/null | wc -l)
sed -e "s/num_data: .*/num_data: $NUM/" \
    -e "s#data_root: .*#data_root: data/res_rgr_data_r5#" \
    config/train/res_rgr_r4b.yaml > config/train/res_rgr_r5.yaml
env PYTHONPATH=/root/.axon_site:/root/repo timeout 2700 \
  python -m dyn_res_pile_manip_tpu.train.train_res_rgr \
  config/train/res_rgr_r5.yaml > logs/train_rgr_r5.log 2>&1 \
  || echo "rgr train exited ($?)"
TD=$(ls -dt data/res_rgr_model/2*/ 2>/dev/null | head -1)
if [ -n "$TD" ] && [ -f "$TD/net_best_dy.ckpt" ]; then
  mkdir -p data/res_rgr_model/r5 assets/r5
  cp "$TD/net_best_dy.ckpt" data/res_rgr_model/r5/net_best_dy.ckpt
  sh scripts/promote_artifact.sh "$TD/net_best_dy.ckpt" assets/r5/res_rgr_r5.ckpt
  cp "$TD/log.txt" assets/r5/res_rgr_r5_train_log.txt 2>/dev/null
  git add assets/r5 assets/ckpts config/train/res_rgr_r5.yaml && git commit -q -m \
    "Ship round-5 resolution regressor ($NUM labels, dihedral aug)" || true
fi

# ---- fresh-pairing A/B
env PYTHONPATH=/root/.axon_site:/root/repo timeout 4500 \
  python scripts/eval_auto_res.py --scenes 6 --n-mpc 6 --fixed 20 90 \
  --rgr-folder r5 --gnn-folder r5_labeler --seed 777 \
  --out results/r5/eval_auto_res_r5.json \
  > logs/eval_auto_res_r5.log 2>&1 || echo "A/B exited ($?)"
git add results/r5 && git commit -q -m "Round-5 dynamic-resolution A/B (fresh pairing)" || true

# ---- endwatch
wait_until "$END_AT"
kill_pidfiles /tmp/datagen_r5_*.pid /tmp/gp_r5_*.pid /tmp/watcher_r5.pid \
              /tmp/ab_matched.pid /tmp/r5_modelonly.pid
echo "$(date -u +%H:%M) fleet stopped; idle measurements"
env PYTHONPATH=/root/.axon_site:/root/repo timeout 1500 \
  python scripts/roofline_r4.py --measure > logs/roofline_r5.txt 2>&1 || true
cp logs/roofline_r5.json results/r5/ 2>/dev/null
env PYTHONPATH=/root/.axon_site:/root/repo timeout 1500 python bench.py \
  > logs/bench_preflight_r5b.json 2> logs/bench_preflight_r5b.log || true
tail -1 logs/bench_preflight_r5b.json
git add results/r5 logs/bench_preflight_r5b.json logs/roofline_r5.txt 2>/dev/null
git commit -q -m "Round-5 idle-chip roofline + bench preflight" || true
echo "$(date -u +%H:%M) round5d phases done"
