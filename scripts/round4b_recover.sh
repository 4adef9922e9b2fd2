#!/bin/sh
# Tunnel-outage recovery for the round-4b bisect window: the SIGSTOP
# pause wedged the loopback relay (paused clients mid-RPC), so the
# window killed the worker pythons and left their supervisors STOPped.
# This script probes until the backend answers, then:
#   - if there is still time before the training deadline: bisect +
#     idle MPC bench on the now-idle chip, then resume the supervisors;
#   - otherwise: resume the supervisors immediately (datagen/labeling
#     restart from their retry loops; --skip-existing dedupes).
# Launch: nohup sh scripts/round4b_recover.sh > logs/round4b_recover.log 2>&1 &
cd "$(dirname "$0")/.."

BISECT_CUTOFF=${BISECT_CUTOFF:-12:25}

probe() {
  timeout 90 env PYTHONPATH=/root/.axon_site python -c \
    "import jax.numpy as j; print(float(j.ones(4).sum()))" >/dev/null 2>&1
}

echo "$(date -u +%H:%M:%S) waiting for the axon tunnel..."
until probe; do
  echo "$(date -u +%H:%M:%S) tunnel still down"
  sleep 120
done
echo "$(date -u +%H:%M:%S) tunnel is back"

resume() {
  for f in /tmp/datagen_r4_*.pid /tmp/gp_r4_*.pid; do
    [ -f "$f" ] || continue
    kill -CONT "$(cat "$f")" 2>/dev/null
  done
  echo "$(date -u +%H:%M:%S) supervisors resumed"
}

if [ "$(date +%s)" -lt "$(date -u -d "$BISECT_CUTOFF" +%s)" ]; then
  touch /tmp/r4_bisect_running   # round4b_pipeline defers training on this
  trap 'rm -f /tmp/r4_bisect_running' EXIT INT TERM
  echo "$(date -u +%H:%M:%S) bisect on idle chip (1 repeat per variant)"
  env PYTHONPATH=/root/.axon_site:/root/repo BISECT_REPEATS=1 \
    timeout 2400 python scripts/bisect_push_r4.py 2>&1 | tail -12
  echo "$(date -u +%H:%M:%S) idle MPC bench (3 reps)"
  env PYTHONPATH=/root/.axon_site:/root/repo timeout 900 python - <<'EOF'
import json, bench
r = [bench.bench_mpc() for _ in range(3)]
out = {"idle_rollouts_per_sec": r}
print(json.dumps(out))
json.dump(out, open("logs/mpc_idle_r4.json", "w"))
EOF
  resume
  git add logs/bisect_push_r4.json logs/mpc_idle_r4.json 2>/dev/null \
    && git commit -q -m "Record clean-chip bisect + idle MPC bench" || true
else
  echo "past bisect cutoff; resuming fleet directly"
  resume
fi
echo "$(date -u +%H:%M:%S) recovery done"
