#!/bin/sh
# Chained phase B/C for the round5d session: the orchestrator's serial
# regressor-train phase died in a stuck backend init (44 min in futex
# wait on a dead tunnel connection; see logs/train_rgr_r5d.log), so the
# retrained run was relaunched manually. This script watches that
# trainer (pid file /tmp/rgr_r5d2.pid), promotes its checkpoint
# append-only, and runs the fresh-pairing A/B (VERDICT r4 missing #3:
# labels optimized under the DEPLOYED model — r4 GNN bytes in
# data/gnn_dyn_model/r5_labeler — evaluated end-to-end) alongside the
# orchestrator's matched-A/B completion.
# Launch: nohup sh scripts/round5d_freshab.sh > logs/round5d_freshab.log 2>&1 &
cd "$(dirname "$0")/.."
PIDF=/tmp/rgr_r5d2.pid
DEADLINE=$(date -u -d 02:45 +%s)
[ "$DEADLINE" -lt "$(date +%s)" ] && DEADLINE=$((DEADLINE + 86400))

# wait for the trainer process to exit (direct pid, never by pattern)
PID=$(cat "$PIDF" 2>/dev/null)
while [ -n "$PID" ] && kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "$(date -u +%H:%M) trainer exited"

TD=$(ls -dt data/res_rgr_model/2*/ 2>/dev/null | head -1)
if [ -z "$TD" ] || [ ! -f "$TD/net_best_dy.ckpt" ]; then
  echo "no regressor checkpoint; aborting fresh A/B"
  exit 1
fi
NUM=$(grep "num_data" config/train/res_rgr_r5.yaml | head -1 | tr -dc 0-9)
mkdir -p data/res_rgr_model/r5
cp "$TD/net_best_dy.ckpt" data/res_rgr_model/r5/net_best_dy.ckpt
echo "trained on $NUM fresh r5 labels (labeled under r4 GNN $(md5sum assets/r4/gnn_r4.ckpt | cut -c1-8)): $(md5sum $TD/net_best_dy.ckpt)" \
  > data/res_rgr_model/r5/PROVENANCE.txt
sh scripts/promote_artifact.sh "$TD/net_best_dy.ckpt" assets/r5/res_rgr_r5.ckpt
cp "$TD/config.yaml" assets/r5/res_rgr_r5_config.yaml 2>/dev/null
cp "$TD/log.txt" assets/r5/res_rgr_r5_train_log.txt 2>/dev/null
git add assets/r5 assets/ckpts config/train/res_rgr_r5.yaml && git commit -q -m \
  "Ship round-5 resolution regressor ($NUM fresh labels, dihedral aug)" || true

T=$((DEADLINE - $(date +%s))); [ "$T" -lt 300 ] && { echo "no window left"; exit 0; }
echo "$(date -u +%H:%M) fresh-pairing A/B, ${T}s window"
env PYTHONPATH=/root/.axon_site:/root/repo timeout "$T" \
  python scripts/eval_auto_res.py --scenes 6 --n-mpc 6 --fixed 20 90 \
  --rgr-folder r5 --gnn-folder r5_labeler --seed 777 \
  --out results/r5/eval_auto_res_r5.json \
  > logs/eval_auto_res_r5.log 2>&1 || echo "fresh A/B exited ($?)"
git add results/r5 && git commit -q -m \
  "Round-5 dynamic-resolution A/B (labels paired with deployed model)" || true
echo "$(date -u +%H:%M) fresh A/B done"
