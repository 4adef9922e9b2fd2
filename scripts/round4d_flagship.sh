#!/bin/sh
# Round-4d: once the auto-res A/B frees the chip, re-run the flagship
# 20-push I-shape closed loop (reference settings, sim_verify 3 + noop
# hold, auto resolution) with the COMMITTED r4 GNN + augmented regressor
# — restoring the reproducibility the round-3 host wipe destroyed
# (VERDICT r3 missing #1: the ckpt behind the r3 flagship run is gone).
# Per-push progress goes to results/r4 so the 16:35 endwatch kill cannot
# lose the trajectory.
# Launch: nohup sh scripts/round4d_flagship.sh > logs/round4d_flagship.log 2>&1 &
cd "$(dirname "$0")/.."

EVAL_PID=${EVAL_PID:-$(cat /tmp/gp_r4_eval.pid 2>/dev/null)}
HARD_STOP=${HARD_STOP:-16:33}

while [ -n "$EVAL_PID" ] && kill -0 "$EVAL_PID" 2>/dev/null; do
  sleep 60
done
echo "$(date -u +%H:%M:%S) A/B done; chip free"

stop_ts=$(date -u -d "$HARD_STOP" +%s)
now=$(date +%s)
left=$((stop_ts - now))
if [ "$left" -lt 600 ]; then
  echo "only ${left}s before the bench window; skipping flagship rerun"
  exit 0
fi

mkdir -p results/r4
env PYTHONPATH=/root/.axon_site:/root/repo \
  MPC_PROGRESS_JSON=results/r4/visualize_mpc_flagship_progress.json \
  timeout "$left" \
  python visualize_mpc.py config/mpc/config_r4_flagship.yaml \
  > logs/visualize_mpc_r4_flagship.log 2>&1 || echo "flagship exited ($?)"
[ -f visualize_mpc_result.json ] && \
  cp visualize_mpc_result.json results/r4/visualize_mpc_flagship.json
git add results/r4 logs/visualize_mpc_r4_flagship.log 2>/dev/null
git commit -q -m "Round-4 flagship closed loop (sim-verify + auto-res, committed ckpts)" || true
echo "$(date -u +%H:%M:%S) flagship done"
