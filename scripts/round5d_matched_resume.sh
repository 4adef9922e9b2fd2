#!/bin/sh
# Chained phase D-resume for round5d: when the fresh-pairing A/B exits,
# resume the 10-scene matched A/B at scene 5 (its first run tonight was
# preempted to unblock the regressor trainer — see CLAUDE.md round-5d
# init-starvation note; never start a fresh chip process mid-stream).
# Usage: sh scripts/round5d_matched_resume.sh <fresh_ab_pid>
cd "$(dirname "$0")/.."
PID=$1
DEADLINE=$(date -u -d 02:45 +%s)
[ "$DEADLINE" -lt "$(date +%s)" ] && DEADLINE=$((DEADLINE + 86400))

while [ -n "$PID" ] && kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "$(date -u +%H:%M) fresh A/B exited"
T=$((DEADLINE - $(date +%s)))
if [ "$T" -lt 600 ]; then echo "no window left"; exit 0; fi

cp results/r5/eval_auto_res_matched_10scene.json \
   results/r5/eval_auto_res_matched_10scene.work.json
echo "$(date -u +%H:%M) matched A/B resume at scene 5, ${T}s window"
env PYTHONPATH=/root/.axon_site:/root/repo timeout "$T" \
  python scripts/eval_auto_res.py --scenes 10 --start 5 --n-mpc 6 \
  --fixed 20 90 --rgr-folder r4 --gnn-folder r2_matched --seed 777 \
  --out results/r5/eval_auto_res_matched_10scene.work.json \
  > logs/eval_auto_res_matched_10s_e.log 2>&1 || echo "matched A/B exited ($?)"
cp results/r5/eval_auto_res_matched_10scene.work.json \
   results/r5/eval_auto_res_matched_10scene.json
git add results/r5 && git commit -q -m \
  "Matched-model A/B: scenes 5+ resumed after fresh-pairing run" || true
echo "$(date -u +%H:%M) matched resume done"
