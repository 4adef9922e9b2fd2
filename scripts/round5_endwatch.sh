#!/bin/sh
# End-of-session chip guard (round-4 continuation session): the driver
# runs bench.py on the real chip when the round ends; a still-running
# fleet would contaminate it (same failure mode as BENCH_r03 —
# PERFORMANCE.md). At STOP_AT UTC, kill every fleet process started this
# session (pid files only — never by pattern), then warm the bench
# compile cache so the driver's run measures compute, not compiles.
# Launch: STOP_AT=00:08 nohup sh scripts/round5_endwatch.sh > logs/endwatch_r5.log 2>&1 &
cd "$(dirname "$0")/.."

STOP_AT=${STOP_AT:-00:08}
now=$(date +%s)
stop_ts=$(date -u -d "$STOP_AT" +%s)
[ "$stop_ts" -le "$now" ] && stop_ts=$((stop_ts + 86400))
# A STOP_AT more than 4h out is almost certainly a typo for this
# short-session guard. Fail loudly instead of silently clamping to
# "kill the fleet in 60s" (ADVICE r4 medium).
if [ "$((stop_ts - now))" -gt 14400 ]; then
  echo "ERROR: STOP_AT=$STOP_AT resolves $((stop_ts - now))s (>4h) away." >&2
  echo "Refusing to run — pass a nearer STOP_AT or use round5_pipeline's endwatch." >&2
  exit 1
fi
echo "sleeping $((stop_ts - now))s until $STOP_AT UTC"
sleep $((stop_ts - now))

kill_tree() {
  for c in $(ps -o pid= --ppid "$1" 2>/dev/null); do
    kill_tree "$c"
  done
  kill "$1" 2>/dev/null && echo "killed $1"
}

for f in /tmp/gp_r5_*.pid /tmp/datagen_r5_*.pid /tmp/ab_matched.pid \
         /tmp/watcher_r5.pid /tmp/round5_pipeline.pid; do
  [ -f "$f" ] || continue
  kill_tree "$(cat "$f")"
  rm -f "$f"
done
sleep 10
echo "$(date -u +%H:%M:%S) fleet stopped; bench preflight"

# stderr goes to a separate .log so the .json stays one parseable line
# (ADVICE r4 low: 2>&1 into the .json made it unparseable)
env PYTHONPATH=/root/.axon_site:/root/repo timeout 1200 python bench.py \
  > logs/bench_preflight_r5.json 2> logs/bench_preflight_r5.log \
  || echo "preflight exited ($?)"
tail -1 logs/bench_preflight_r5.json
git add logs/bench_preflight_r5.json logs/bench_preflight_r5.log 2>/dev/null
git commit -q -m "Idle-chip bench preflight (round-4 continuation)" || true
echo "$(date -u +%H:%M:%S) endwatch done"
