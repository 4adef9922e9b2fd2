#!/bin/sh
# Round-5 bootstrap orchestrator. Everything round 4 learned, scheduled
# RELATIVE to launch so it works whatever wall-clock the round starts at.
#
# Phases (budget fractions of ROUND_BUDGET_MIN, default 660 min):
#   0      launch wipe-proof artifact watcher + 4 datagen workers
#          (extend data/gnn_dyn_data_custom toward 1000 episodes,
#          --skip-existing; survives tunnel outages with backoff) +
#          2 GP labelers writing a FRESH label set (data/res_rgr_data_r5)
#          under the committed r4 GNN — round-4's A/B showed labels must
#          be optimal under the deployed model, not a stale one
#   55%    stop datagen; train the GNN WARM-STARTED from assets/r4
#          (net_best valid 0.033 on 386 episodes) on the larger set;
#          promote + commit to assets/r5
#   after  model-only closed loop (sim_verify=0, reference settings)
#          with MPC_PROGRESS_JSON so a deadline kill keeps the evidence
#   ~70%   stop labelers; train the regressor with dihedral augmentation
#          (config/train/res_rgr_r4b.yaml recipe) on ALL labels; promote
#   after  auto-vs-fixed A/B (scripts/eval_auto_res.py, incremental)
#   95%    endwatch: kill the fleet by pid files, idle-chip roofline +
#          bench preflight, leaving the chip free for the driver bench
#
# Launch: nohup sh scripts/round5_pipeline.sh > logs/round5_pipeline.log 2>&1 &
#         echo $! > /tmp/round5_pipeline.pid
cd "$(dirname "$0")/.."
mkdir -p logs results/r5

BUDGET=${ROUND_BUDGET_MIN:-660}
T0=$(date +%s)
at_frac() { echo $((T0 + BUDGET * 60 * $1 / 100)); }
TRAIN_TS=$(at_frac 55)
RGR_TS=$(at_frac 70)
END_TS=$(at_frac 95)
echo "budget ${BUDGET}min: train at $(date -u -d "@$TRAIN_TS" +%H:%M), rgr at $(date -u -d "@$RGR_TS" +%H:%M), endwatch at $(date -u -d "@$END_TS" +%H:%M) UTC"

probe() {
  timeout 120 env PYTHONPATH=/root/.axon_site python -c \
    "import jax.numpy as j; print(float(j.ones(4).sum()))" >/dev/null 2>&1
}
until probe; do echo "$(date -u +%H:%M:%S) tunnel down"; sleep 120; done
echo "$(date -u +%H:%M:%S) tunnel up"

# ASSETS_TAG=r5 is REQUIRED: in round 4 this launch defaulted to TAG=r4
# and the watcher clobbered assets/r4/res_rgr_r4.ckpt with r5-placeholder
# bytes (ADVICE r4 high). The watcher is now also append-only via
# promote_artifact.sh, so even a wrong tag can no longer destroy bytes.
nohup env ASSETS_TAG=r5 sh scripts/commit_artifacts_r4.sh > logs/commit_artifacts_r5.log 2>&1 &
echo $! > /tmp/watcher_r5.pid

for off in 0 1 2 3; do
  START=$((off * 250))
  nohup sh -c "
    tries=0
    until env PYTHONPATH=/root/.axon_site:/root/repo \
      python -m dyn_res_pile_manip_tpu.datagen.gnn_dyn_data \
      config/data_gen/gnn_dyn.yaml \
      --base-epi $START --n-epi 250 --seed \$((5000 + $off * 100 + tries)) \
      --skip-existing; do
      tries=\$((tries + 1)); [ \$tries -gt 60 ] && break
      echo \"datagen $off retry \$tries\"; sleep 180
    done" > "logs/datagen_r5_$off.log" 2>&1 &
  echo $! > "/tmp/datagen_r5_$off.pid"
  sleep "${STAGGER:-150}"
done
# labels must be optimal UNDER THE DEPLOYED MODEL: round-4's A/B showed
# the r2-labeled regressor mispredicting for the r4 GNN (auto lost to
# fixed-N). Fresh label set, labeled by the committed r4 GNN.
mkdir -p data/gnn_dyn_model/r5_labeler
cp assets/r4/gnn_r4.ckpt data/gnn_dyn_model/r5_labeler/net_best.ckpt
for i in 0 1; do
  BASE=$((i * 100))
  nohup sh -c "
    tries=0
    until env PYTHONPATH=/root/.axon_site:/root/repo \
      python -m dyn_res_pile_manip_tpu.datagen.res_rgr_data \
      --config config/data_gen/res_rgr_r5.yaml --dir data/res_rgr_data_r5 \
      --base-scene $BASE --n-scenes 100 --seed \$((7100 + $i * 100 + tries)); do
      tries=\$((tries + 1)); [ \$tries -gt 60 ] && break
      echo \"labeler $i retry \$tries\"; sleep 180
    done" > "logs/gp_label_r5_$i.log" 2>&1 &
  echo $! > "/tmp/gp_r5_$i.pid"
  sleep "${STAGGER:-150}"
done
echo "$(date -u +%H:%M:%S) fleet launched"

# ---- wait for the training window, then stop datagen (pid files only)
while [ "$(date +%s)" -lt "$TRAIN_TS" ]; do sleep 120; done
for f in /tmp/datagen_r5_*.pid; do
  [ -f "$f" ] || continue
  sup=$(cat "$f")
  for c in $(ps -o pid= --ppid "$sup" 2>/dev/null); do kill "$c" 2>/dev/null; done
  kill "$sup" 2>/dev/null; rm -f "$f"
done
sleep 10
until probe; do echo "$(date -u +%H:%M:%S) tunnel down pre-train"; sleep 120; done

# warm start: the resume path expects net_epoch_%d_iter_%d.ckpt
mkdir -p data/gnn_dyn_model/r5_warm
cp assets/r4/gnn_r4.ckpt data/gnn_dyn_model/r5_warm/net_epoch_0_iter_0.ckpt
N=$(env PYTHONPATH=/root/.axon_site:/root/repo python -c "
from dyn_res_pile_manip_tpu.datasets.dataset_gnn_dyn import ParticleDataset
print(len(ParticleDataset.list_episodes('data/gnn_dyn_data_custom', 10)))")
TRAIN_WIN=$(( (RGR_TS - $(date +%s)) ))
echo "$(date -u +%H:%M:%S) training GNN on $N episodes (warm start, ${TRAIN_WIN}s)"
env PYTHONPATH=/root/.axon_site:/root/repo timeout "$TRAIN_WIN" \
  python -m dyn_res_pile_manip_tpu.train.train_gnn_dyn \
  config/train/gnn_dyn_r5.yaml > logs/train_gnn_r5.log 2>&1 \
  || echo "gnn train exited ($?)"
CK=data/gnn_dyn_model/r5_warm/net_best.ckpt
if [ -f "$CK" ]; then
  mkdir -p data/gnn_dyn_model/r5 assets/r5
  cp "$CK" data/gnn_dyn_model/r5/net_best.ckpt
  cp data/gnn_dyn_model/r5_warm/config.yaml data/gnn_dyn_model/r5/ 2>/dev/null
  echo "trained r5 (warm-started from r4) $(md5sum $CK)" \
    > data/gnn_dyn_model/r5/PROVENANCE.txt
  sh scripts/promote_artifact.sh "$CK" assets/r5/gnn_r5.ckpt
  cp data/gnn_dyn_model/r5_warm/log.txt assets/r5/gnn_r5_train_log.txt 2>/dev/null
  git add assets/r5 assets/ckpts && git commit -q -m \
    "Ship round-5 GNN checkpoint (warm-started, $N episodes)" || true
else
  # Fallback keeps the closed-loop runnable but must never masquerade
  # (round-4 continuation left r4 bytes here unmarked — VERDICT r4 weak #1)
  echo "no r5 ckpt; falling back to r4"
  mkdir -p data/gnn_dyn_model/r5
  cp assets/r4/gnn_r4.ckpt data/gnn_dyn_model/r5/net_best.ckpt
  echo "FALLBACK: these are the r4 bytes $(md5sum assets/r4/gnn_r4.ckpt), NOT a trained r5 model" \
    > data/gnn_dyn_model/r5/PROVENANCE.txt
fi

# ---- model-only closed loop with crash-safe progress
( env PYTHONPATH=/root/.axon_site:/root/repo \
    MPC_PROGRESS_JSON=results/r5/visualize_mpc_model_only_progress.json \
    timeout 4500 python visualize_mpc.py config/mpc/config_r5_modelonly.yaml \
    > logs/visualize_mpc_r5_modelonly.log 2>&1 || echo "model-only exited ($?)"
  [ -f visualize_mpc_result.json ] && \
    cp visualize_mpc_result.json results/r5/visualize_mpc_model_only.json
  git add results/r5 && git commit -q -m \
    "Round-5 model-only closed loop result" || true
  touch /tmp/r5_modelonly_done ) &

# ---- regressor branch
while [ "$(date +%s)" -lt "$RGR_TS" ]; do sleep 120; done
for f in /tmp/gp_r5_*.pid; do
  [ -f "$f" ] || continue
  sup=$(cat "$f")
  for c in $(ps -o pid= --ppid "$sup" 2>/dev/null); do kill "$c" 2>/dev/null; done
  kill "$sup" 2>/dev/null; rm -f "$f"
done
NUM=$(ls data/res_rgr_data_r5 | wc -l)
sed -e "s/num_data: .*/num_data: $NUM/" \
    -e "s#data_root: .*#data_root: data/res_rgr_data_r5#" \
    config/train/res_rgr_r4b.yaml > config/train/res_rgr_r5.yaml
env PYTHONPATH=/root/.axon_site:/root/repo timeout 3600 \
  python -m dyn_res_pile_manip_tpu.train.train_res_rgr \
  config/train/res_rgr_r5.yaml > logs/train_rgr_r5.log 2>&1 \
  || echo "rgr train exited ($?)"
TD=$(ls -dt data/res_rgr_model/2*/ | head -1)
if [ -n "$TD" ] && [ -f "$TD/net_best_dy.ckpt" ]; then
  mkdir -p data/res_rgr_model/r5 assets/r5
  cp "$TD/net_best_dy.ckpt" data/res_rgr_model/r5/net_best_dy.ckpt
  sh scripts/promote_artifact.sh "$TD/net_best_dy.ckpt" assets/r5/res_rgr_r5.ckpt
  cp "$TD/log.txt" assets/r5/res_rgr_r5_train_log.txt 2>/dev/null
  git add assets/r5 assets/ckpts config/train/res_rgr_r5.yaml && git commit -q -m \
    "Ship round-5 resolution regressor ($NUM labels, dihedral aug)" || true
fi

while [ ! -f /tmp/r5_modelonly_done ] && [ "$(date +%s)" -lt "$END_TS" ]; do
  sleep 120
done
env PYTHONPATH=/root/.axon_site:/root/repo timeout 3300 \
  python scripts/eval_auto_res.py --scenes 3 --n-mpc 6 --fixed 20 90 \
  --rgr-folder r5 --gnn-folder r5_labeler --seed 777 \
  `# gnn matches the LABELER model: the regressor predicts the N that is` \
  `# optimal under that dynamics model (round-4 lesson)` \
  --out results/r5/eval_auto_res_r5.json \
  > logs/eval_auto_res_r5.log 2>&1 || echo "A/B exited ($?)"
git add results/r5 && git commit -q -m "Round-5 dynamic-resolution A/B" || true

# ---- endwatch: free the chip for the driver bench
while [ "$(date +%s)" -lt "$END_TS" ]; do sleep 60; done
for f in /tmp/datagen_r5_*.pid /tmp/gp_r5_*.pid /tmp/watcher_r5.pid; do
  [ -f "$f" ] || continue
  sup=$(cat "$f")
  for c in $(ps -o pid= --ppid "$sup" 2>/dev/null); do kill "$c" 2>/dev/null; done
  kill "$sup" 2>/dev/null; rm -f "$f"
done
env PYTHONPATH=/root/.axon_site:/root/repo timeout 1500 \
  python scripts/roofline_r4.py --measure > logs/roofline_r5.txt 2>&1 || true
cp logs/roofline_r5.json results/r5/ 2>/dev/null
env PYTHONPATH=/root/.axon_site:/root/repo timeout 1200 python bench.py \
  > logs/bench_preflight_r5.json 2> logs/bench_preflight_r5.log || true
git add results/r5 logs/bench_preflight_r5.json logs/bench_preflight_r5.log 2>/dev/null
git commit -q -m "Round-5 idle-chip roofline + bench preflight" || true
echo "$(date -u +%H:%M:%S) round-5 pipeline done"
