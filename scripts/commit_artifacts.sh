#!/bin/sh
# Wipe-proofing watcher: the host VM can be re-imaged at any time and only
# git-tracked files survive (it has happened twice this round). Every 20
# minutes, copy each COMPLETE GP-labeled scene (opt_den.npy present in the
# scene dir) from the gitignored data/ tree into assets/r2/res_rgr_data_r2
# and commit, plus any newly promoted model checkpoints under assets/.
# Launch: nohup sh scripts/commit_artifacts.sh > logs/commit_artifacts.log 2>&1 &
cd "$(dirname "$0")/.."

while true; do
  CHANGED=0
  for d in data/res_rgr_data_r2/*/; do
    s=$(basename "$d")
    [ -f "$d/opt_den.npy" ] || continue
    dst="assets/r2/res_rgr_data_r2/$s"
    if [ ! -f "$dst/opt_den.npy" ]; then
      mkdir -p "$dst"
      cp "$d"/*.npy "$dst/" 2>/dev/null
      cp "$d"/*.png "$dst/" 2>/dev/null
      CHANGED=1
    fi
  done
  if [ -d data/gnn_dyn_model/r3 ] && [ -f data/gnn_dyn_model/r3/config.yaml ]; then
    mkdir -p assets/r3
    if ! cmp -s data/gnn_dyn_model/r3/net_best.ckpt assets/r3/gnn_r3.ckpt; then
      cp data/gnn_dyn_model/r3/net_best.ckpt assets/r3/gnn_r3.ckpt
      cp data/gnn_dyn_model/r3/config.yaml assets/r3/gnn_r3_config.yaml
      CHANGED=1
    fi
  fi
  if [ "$CHANGED" = 1 ]; then
    git add assets/ >/dev/null 2>&1
    git commit -q -m "Checkpoint trained artifacts to assets (wipe-proofing watcher)" || true
    echo "$(date -u +%H:%M:%S) committed new artifacts"
  else
    echo "$(date -u +%H:%M:%S) no new artifacts"
  fi
  sleep 1200
done
