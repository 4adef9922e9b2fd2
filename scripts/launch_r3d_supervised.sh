#!/bin/sh
# Round-3d fleet (post second VM wipe): supervised, restart-idempotent
# datagen + GP-labeling workers. Every worker runs under an until-loop —
# the axon remote-compile service intermittently drops RPCs
# ("response body closed before all bytes were read"), which kills the
# process; --skip-existing / the opt_den completion check make relaunches
# cost only the in-flight episode/scene. Workers start STAGGERED: on this
# 1-core host a cold-cache stampede of big _run_frames compiles wedges the
# remote compile service (observed: a worker hung >25 min on a dead RPC).
# Launch: nohup sh scripts/launch_r3d_supervised.sh > logs/launch_r3d.log 2>&1 &
cd "$(dirname "$0")/.."

STAGGER=${STAGGER:-180}

for off in 0 1 2 3; do
  START=$((off * 250))
  nohup sh -c "
    tries=0
    until env PYTHONPATH=/root/.axon_site:/root/repo \
      python -m dyn_res_pile_manip_tpu.datagen.gnn_dyn_data \
      config/data_gen/gnn_dyn.yaml \
      --base-epi $START --n-epi 250 --seed \$((7000 + $off * 100 + tries)) \
      --skip-existing; do
      tries=\$((tries + 1))
      [ \$tries -gt 60 ] && break
      echo \"datagen $off retry \$tries after backoff\"
      sleep 180
    done" > "logs/datagen_r3d_$off.log" 2>&1 &
  echo $! > "/tmp/datagen_r3d_$off.pid"
  echo "launched datagen supervisor $off ($(cat /tmp/datagen_r3d_$off.pid))"
  sleep "$STAGGER"
done

for i in 0 1; do
  BASE=$((33 + i * 30))
  nohup sh -c "
    tries=0
    until env PYTHONPATH=/root/.axon_site:/root/repo \
      python -m dyn_res_pile_manip_tpu.datagen.res_rgr_data \
      --config config/data_gen/res_rgr_r3.yaml --dir data/res_rgr_data_r2 \
      --base-scene $BASE --n-scenes 30 --seed \$((5100 + $i * 100 + tries)); do
      tries=\$((tries + 1))
      [ \$tries -gt 60 ] && break
      echo \"labeler $i retry \$tries after backoff\"
      sleep 180
    done" > "logs/gp_label_r3d_$i.log" 2>&1 &
  echo $! > "/tmp/gp_r3c_$i.pid"
  echo "launched labeler supervisor $i ($(cat /tmp/gp_r3c_$i.pid))"
  sleep "$STAGGER"
done
echo "fleet launched"
