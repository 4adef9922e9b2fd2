#!/bin/sh
# Tunnel-outage recovery: the axon TPU tunnel dropped at 22:50 (round 3),
# killing the GP labelers, the post-labeling regressor pipeline, and the
# datagen extension. This watcher probes the backend every 3 min; once it
# answers, it relaunches the round-3 chip pipeline in priority order:
#   1. bench.py on the idle chip (measures the bf16 planner headline)
#   2. post_labeling_pipeline.sh (regressor train @83 scenes + auto-res A/B)
#   3. two sharded datagen workers extending episodes toward 2000
# Launch: nohup sh scripts/tunnel_recovery.sh > logs/tunnel_recovery.log 2>&1 &
cd "$(dirname "$0")/.."

probe() {
  timeout 90 env PYTHONPATH=/root/.axon_site python -c \
    "import jax.numpy as j; print(float(j.ones(4).sum()))" >/dev/null 2>&1
}

echo "$(date -u +%H:%M:%S) waiting for the axon tunnel..."
until probe; do sleep 180; done
echo "$(date -u +%H:%M:%S) tunnel is back"

echo "$(date -u +%H:%M:%S) running bench (bf16 headline)"
timeout 2400 env PYTHONPATH=/root/.axon_site:/root/repo \
  python bench.py > logs/bench_bf16_probe.log 2>&1 || echo "bench exited"
tail -1 logs/bench_bf16_probe.log

nohup sh scripts/post_labeling_pipeline.sh > logs/post_labeling2.log 2>&1 &
echo "launched post-labeling pipeline ($!)"

BASE=$(ls data/gnn_dyn_data_custom | sort -n | tail -1)
BASE=$((BASE + 1))
TARGET=2000
PER=$(( (TARGET - BASE + 1) / 2 ))
echo "extending datagen from $BASE to $TARGET (2 supervised workers x $PER)"
for off in 0 1; do
  START=$((BASE + off * PER))
  N=$PER
  [ $((START + N)) -gt $TARGET ] && N=$((TARGET - START))
  [ "$N" -le 0 ] && continue
  # supervisor loop: a tunnel drop kills the worker; --skip-existing makes
  # the relaunch idempotent (completed episodes are skipped)
  nohup sh -c "
    tries=0
    until env PYTHONPATH=/root/.axon_site:/root/repo \
      python -m dyn_res_pile_manip_tpu.datagen.gnn_dyn_data \
      config/data_gen/gnn_dyn.yaml \
      --base-epi $START --n-epi $N --seed \$((9500 + $off * 100 + tries)) \
      --skip-existing; do
      tries=\$((tries + 1))
      [ \$tries -gt 40 ] && break
      echo \"worker $off retry \$tries after backoff\"
      sleep 240
    done" > "logs/datagen_ext2_$off.log" 2>&1 &
  echo $! > "/tmp/datagen_ext2_$off.pid"
done
echo "$(date -u +%H:%M:%S) recovery launch complete"
