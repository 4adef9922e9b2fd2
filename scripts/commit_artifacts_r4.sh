#!/bin/sh
# Round-4 wipe-proofing watcher. Fixes the round-3 failure mode
# (scripts/commit_artifacts.sh:23 gated the GNN checkpoint on a
# config.yaml that never existed, so the model was lost in the VM wipe):
# this version commits EVERY net_best checkpoint it can find, gated on
# nothing but the bytes having changed.
#
# Every 15 minutes:
#   1. each COMPLETE GP-labeled scene (opt_den.npy) from any
#      data/res_rgr_data_* tree -> assets/r2/res_rgr_data_r2/<scene>
#   2. the NEWEST data/gnn_dyn_model/*/net_best.ckpt -> assets/$TAG/gnn_${TAG}.ckpt
#      (+ config.yaml / log.txt when present, but never required)
#   3. the NEWEST data/res_rgr_model/*/net_best_dy.ckpt -> assets/r4/
# Launch: nohup sh scripts/commit_artifacts_r4.sh > logs/commit_artifacts_r4.log 2>&1 &
cd "$(dirname "$0")/.."

# TAG selects the assets/<TAG>/ destination (round-5 reuses this watcher
# with TAG=r5; the r5 pipeline's warm-start dir is in the GNN glob below)
TAG=${ASSETS_TAG:-r4}

while true; do
  CHANGED=0

  for tree in r2 r5; do
    for d in data/res_rgr_data_$tree/*/; do
      [ -d "$d" ] || continue
      s=$(basename "$d")
      [ -f "$d/opt_den.npy" ] || continue
      dst="assets/$tree/res_rgr_data_$tree/$s"
      if [ ! -f "$dst/opt_den.npy" ]; then
        mkdir -p "$dst"
        cp "$d"/*.npy "$dst/" 2>/dev/null
        cp "$d"/*.png "$dst/" 2>/dev/null
        CHANGED=1
      fi
    done
  done

  # timestamped training dirs ONLY (2*): data/gnn_dyn_model/r2_labeler
  # holds the r2 bytes the labelers load — copying it here would
  # recreate the round-3 masquerade (VERDICT r3 weak #3)
  # Promotion is content-addressed and append-only (promote_artifact.sh):
  # old bytes are archived to assets/ckpts/ BEFORE any canonical path is
  # rewritten, and every promotion logs an md5 manifest line. This is the
  # round-5 fix for the r4 clobber (VERDICT r4 missing #1: a plain `cp`
  # here destroyed the regressor behind the headline A/B).
  GNN=$(ls -t data/gnn_dyn_model/2*/net_best.ckpt data/gnn_dyn_model/r5_warm/net_best.ckpt 2>/dev/null | head -1)
  if [ -n "$GNN" ] && ! cmp -s "$GNN" assets/$TAG/gnn_${TAG}.ckpt; then
    sh scripts/promote_artifact.sh "$GNN" assets/$TAG/gnn_${TAG}.ckpt
    D=$(dirname "$GNN")
    [ -f "$D/config.yaml" ] && cp "$D/config.yaml" assets/$TAG/gnn_${TAG}_config.yaml
    [ -f "$D/log.txt" ] && cp "$D/log.txt" assets/$TAG/gnn_${TAG}_train_log.txt
    CHANGED=1
  fi

  RGR=$(ls -t data/res_rgr_model/2*/net_best_dy.ckpt 2>/dev/null | head -1)
  if [ -n "$RGR" ] && ! cmp -s "$RGR" assets/$TAG/res_rgr_${TAG}.ckpt; then
    sh scripts/promote_artifact.sh "$RGR" assets/$TAG/res_rgr_${TAG}.ckpt
    D=$(dirname "$RGR")
    [ -f "$D/config.yaml" ] && cp "$D/config.yaml" assets/$TAG/res_rgr_${TAG}_config.yaml
    CHANGED=1
  fi

  # datagen episode ledger (VERDICT r4 #6): backfill manifests for
  # episodes written by pre-manifest code, then merge into the committed
  # append-only jsonl. Pure host work, never touches the chip.
  if [ -d data/gnn_dyn_data_custom ]; then
    NEWM=$(python scripts/collect_manifests.py --backfill \
             >/dev/null 2>&1; \
           python scripts/collect_manifests.py 2>/dev/null \
             | sed -n 's/.*(+\([0-9]*\) new.*/\1/p')
    [ -n "$NEWM" ] && [ "$NEWM" -gt 0 ] && CHANGED=1
  fi

  if [ "$CHANGED" = 1 ]; then
    git add assets/ >/dev/null 2>&1
    git commit -q -m "Checkpoint trained artifacts to assets ($TAG watcher)" || true
    echo "$(date -u +%H:%M:%S) committed new artifacts"
  else
    echo "$(date -u +%H:%M:%S) no new artifacts"
  fi
  sleep 900
done
