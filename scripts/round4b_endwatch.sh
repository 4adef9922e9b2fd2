#!/bin/sh
# End-of-round chip guard: the driver runs bench.py when the round ends;
# a still-running fleet would contaminate BENCH_r04 exactly the way the
# round-3 push numbers were contaminated (logs/mpc_idle_r4.json vs the
# contended 59-98k rollouts/s measurements). At STOP_AT UTC, kill every
# fleet/pipeline process (pid files only — never by pattern), then take
# the idle-chip roofline measurement and warm the bench compile cache.
# Launch: nohup sh scripts/round4b_endwatch.sh > logs/endwatch.log 2>&1 &
cd "$(dirname "$0")/.."

STOP_AT=${STOP_AT:-16:35}
now=$(date +%s)
stop_ts=$(date -u -d "$STOP_AT" +%s)
[ "$stop_ts" -le "$now" ] && stop_ts=$((now + 60))
echo "sleeping $((stop_ts - now))s until $STOP_AT UTC"
sleep $((stop_ts - now))

kill_tree() {
  for c in $(ps -o pid= --ppid "$1" 2>/dev/null); do
    kill_tree "$c"
  done
  kill "$1" 2>/dev/null && echo "killed $1"
}

for f in /tmp/datagen_r4_*.pid /tmp/gp_r4_*.pid /tmp/round4b_pipeline.pid \
         /tmp/round4b_rgr.pid /tmp/round4_pipeline.pid; do
  [ -f "$f" ] || continue
  kill_tree "$(cat "$f")"
  rm -f "$f"
done
sleep 10
echo "$(date -u +%H:%M:%S) fleet stopped; idle-chip measurements"

mkdir -p results/r4
env PYTHONPATH=/root/.axon_site:/root/repo timeout 1500 \
  python scripts/roofline_r4.py --measure \
  > logs/roofline_r4.txt 2> logs/roofline_r4.log \
  || echo "roofline exited ($?)"
cp logs/roofline_r4.json results/r4/roofline_r4.json 2>/dev/null
cp logs/roofline_r4.txt results/r4/roofline_r4.txt 2>/dev/null

env PYTHONPATH=/root/.axon_site:/root/repo timeout 1200 python bench.py \
  > logs/bench_preflight_r4.json 2>> logs/roofline_r4.log \
  || echo "bench preflight exited ($?)"
tail -1 logs/bench_preflight_r4.json

git add results/r4 logs/bench_preflight_r4.json 2>/dev/null
git commit -q -m "Idle-chip roofline + bench preflight at round end" || true
echo "$(date -u +%H:%M:%S) endwatch done; chip is idle for the driver bench"
