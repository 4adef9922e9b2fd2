#!/bin/sh
# Clean-chip measurement window (VERDICT r3 items 4+5): SIGSTOP the
# datagen/labeler fleet (pid files only — never by pattern), run the
# push-regression bisect and an idle MPC bench, then SIGCONT everything.
# A paused worker whose tunnel RPC times out on resume just dies and is
# relaunched by its supervisor (datagen --skip-existing / labeler
# skip-if-labeled make that cheap).
# Launch: nohup sh scripts/round4b_bisect_window.sh > logs/bisect_window.log 2>&1 &
cd "$(dirname "$0")/.."

PIDS=""
for f in /tmp/datagen_r4_*.pid /tmp/gp_r4_*.pid; do
  [ -f "$f" ] || continue
  sup=$(cat "$f")
  kids=$(ps -o pid= --ppid "$sup" 2>/dev/null)
  PIDS="$PIDS $sup $kids"
done
echo "pausing: $PIDS"
for p in $PIDS; do kill -STOP "$p" 2>/dev/null; done

resume() {
  for p in $PIDS; do kill -CONT "$p" 2>/dev/null; done
  echo "$(date -u +%H:%M:%S) fleet resumed"
}
trap resume EXIT INT TERM

sleep 5
echo "$(date -u +%H:%M:%S) bisect (1 repeat per variant)"
env PYTHONPATH=/root/.axon_site:/root/repo BISECT_REPEATS=1 \
  timeout 2700 python scripts/bisect_push_r4.py 2>&1 | tail -20

echo "$(date -u +%H:%M:%S) idle MPC bench (3 reps)"
env PYTHONPATH=/root/.axon_site:/root/repo timeout 900 python - <<'EOF'
import json, bench
r = [bench.bench_mpc() for _ in range(3)]
out = {"idle_rollouts_per_sec": r}
print(json.dumps(out))
json.dump(out, open("logs/mpc_idle_r4.json", "w"))
EOF

resume
trap - EXIT INT TERM
git add logs/bisect_push_r4.json logs/mpc_idle_r4.json 2>/dev/null \
  && git commit -q -m "Record clean-chip bisect + idle MPC bench" || true
echo "$(date -u +%H:%M:%S) bisect window done"
