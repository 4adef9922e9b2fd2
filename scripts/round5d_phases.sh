#!/bin/sh
# Round-5 final session orchestrator. The VM was wiped again after the
# round5c session (data/ empty at 22:14 UTC); everything below rebuilds
# from COMMITTED assets only and closes the two experiments the wipe
# interrupted, in priority order:
#
#   A. (now) restore data/ trees from assets; launch append-only artifact
#      watcher + ONE GP labeler (extends the committed fresh label set,
#      scenes 15.. under the r4 GNN) + a 3-episode regeneration-
#      determinism check against the committed episode ledger
#      (assets/manifests/gnn_dyn_data_custom.jsonl — VERDICT r4 #4).
#   B. train the resolution regressor on the 51 COMMITTED fresh labels
#      (dihedral aug, res_rgr_r4b recipe) and promote append-only.
#   C. fresh-pairing A/B (VERDICT r4 missing #3, never evaluated
#      end-to-end): labels made under the deployed model (r4 GNN =
#      r5_labeler bytes), 6 scenes, incremental dumps.
#   D. complete the 10-scene matched A/B (r2 GNN + r4 regressor,
#      scenes 5-9 via eval_auto_res.py --start 5) to widen the round-4
#      headline win's statistical base (VERDICT r4 weak #2).
#   E. 02:55 UTC endwatch: kill fleet by pid files, idle bench preflight,
#      leave the chip free for the driver bench.
#
# No probe gates anywhere (round5b deadlock lesson): backend init takes
# 4+ min cold/contended; each worker pays it once inside its own retries.
# Launch: nohup sh scripts/round5d_phases.sh > logs/round5d_phases.log 2>&1 &
cd "$(dirname "$0")/.."
mkdir -p logs results/r5 results/r4

AB_FRESH_DEADLINE=$(date -u -d 01:45 +%s)
AB_MATCHED_DEADLINE=$(date -u -d 02:50 +%s)
END_AT=$(date -u -d 02:55 +%s)
now() { date +%s; }
# all deadlines are tomorrow if they already passed today
for v in AB_FRESH_DEADLINE AB_MATCHED_DEADLINE END_AT; do
  eval "t=\$$v"
  [ "$t" -lt "$(now)" ] && eval "$v=$((t + 86400))"
done
echo "$(date -u +%H:%M) deadlines: freshAB $(date -u -d @$AB_FRESH_DEADLINE +%H:%M), matchedAB $(date -u -d @$AB_MATCHED_DEADLINE +%H:%M), end $(date -u -d @$END_AT +%H:%M)"

kill_pidfiles() {
  for f in "$@"; do
    [ -f "$f" ] || continue
    sup=$(cat "$f")
    for c in $(ps -o pid= --ppid "$sup" 2>/dev/null); do
      for g in $(ps -o pid= --ppid "$c" 2>/dev/null); do kill "$g" 2>/dev/null; done
      kill "$c" 2>/dev/null
    done
    kill "$sup" 2>/dev/null; rm -f "$f"
  done
}

# ---- A. restore committed state into data/ ------------------------------
mkdir -p data/res_rgr_data_r5 data/gnn_dyn_model/r5_labeler \
         data/gnn_dyn_model/r2_matched data/res_rgr_model/r4
cp -rn assets/r5/res_rgr_data_r5/* data/res_rgr_data_r5/ 2>/dev/null
cp assets/r4/gnn_r4.ckpt data/gnn_dyn_model/r5_labeler/net_best.ckpt
echo "r4 GNN bytes $(md5sum assets/r4/gnn_r4.ckpt) - the model the r5 labels are optimized under" \
  > data/gnn_dyn_model/r5_labeler/PROVENANCE.txt
cp assets/r2/gnn_r2.ckpt data/gnn_dyn_model/r2_matched/net_best.ckpt
cp assets/r4/res_rgr_r4.ckpt data/res_rgr_model/r4/net_best_dy.ckpt
echo "restored $(ls data/res_rgr_data_r5 | wc -l) committed label dirs"

nohup env ASSETS_TAG=r5 sh scripts/commit_artifacts_r4.sh \
  > logs/commit_artifacts_r5.log 2>&1 &
echo $! > /tmp/watcher_r5.pid

# one labeler, continuing the fresh set (skips labeled scenes)
nohup sh -c '
  tries=0
  until env PYTHONPATH=/root/.axon_site:/root/repo \
    python -m dyn_res_pile_manip_tpu.datagen.res_rgr_data \
    --config config/data_gen/res_rgr_r5.yaml --dir data/res_rgr_data_r5 \
    --base-scene 0 --n-scenes 100 --seed $((7100 + tries)); do
    tries=$((tries + 1)); [ $tries -gt 40 ] && break
    echo "labeler retry $tries"; sleep 180
  done' > logs/gp_label_r5d.log 2>&1 &
echo $! > /tmp/gp_r5_0.pid

# regeneration-determinism check vs the committed episode ledger: datagen
# episodes 0-2 with the original fleet seed, then merge manifests -- the
# append-only ledger flags any hash conflict (scripts/collect_manifests.py)
( env PYTHONPATH=/root/.axon_site:/root/repo timeout 3600 \
    python -m dyn_res_pile_manip_tpu.datagen.gnn_dyn_data \
    config/data_gen/gnn_dyn.yaml --base-epi 0 --n-epi 3 --seed 5000 \
    > logs/regen_determinism.log 2>&1 || echo "regen exited ($?)" >> logs/regen_determinism.log
  python scripts/collect_manifests.py >> logs/regen_determinism.log 2>&1
  git add assets/manifests logs/regen_determinism.log 2>/dev/null
  git commit -q -m "Regeneration-determinism check vs episode ledger" || true ) &
echo $! > /tmp/regen_r5.pid

# ---- B. regressor on the committed fresh labels -------------------------
NUM=$(ls data/res_rgr_data_r5 | wc -l)
sed -e "s/num_data: .*/num_data: $NUM/" \
    -e "s#data_root: .*#data_root: data/res_rgr_data_r5#" \
    config/train/res_rgr_r4b.yaml > config/train/res_rgr_r5.yaml
echo "$(date -u +%H:%M) regressor train on $NUM labels"
env PYTHONPATH=/root/.axon_site:/root/repo timeout 4200 \
  python -m dyn_res_pile_manip_tpu.train.train_res_rgr \
  config/train/res_rgr_r5.yaml > logs/train_rgr_r5d.log 2>&1 \
  || echo "rgr train exited ($?)"
TD=$(ls -dt data/res_rgr_model/2*/ 2>/dev/null | head -1)
if [ -n "$TD" ] && [ -f "$TD/net_best_dy.ckpt" ]; then
  mkdir -p data/res_rgr_model/r5
  cp "$TD/net_best_dy.ckpt" data/res_rgr_model/r5/net_best_dy.ckpt
  echo "trained on $NUM fresh r5 labels (labeled under r4 GNN $(md5sum assets/r4/gnn_r4.ckpt | cut -c1-8)): $(md5sum $TD/net_best_dy.ckpt)" \
    > data/res_rgr_model/r5/PROVENANCE.txt
  sh scripts/promote_artifact.sh "$TD/net_best_dy.ckpt" assets/r5/res_rgr_r5.ckpt
  cp "$TD/config.yaml" assets/r5/res_rgr_r5_config.yaml 2>/dev/null
  cp "$TD/log.txt" assets/r5/res_rgr_r5_train_log.txt 2>/dev/null
  git add assets/r5 assets/ckpts config/train/res_rgr_r5.yaml && git commit -q -m \
    "Ship round-5 resolution regressor ($NUM fresh labels, dihedral aug)" || true
else
  echo "NO regressor ckpt produced; A/B would reuse stale bytes - skipping fresh A/B"
fi

# ---- C. fresh-pairing A/B ----------------------------------------------
if [ -f data/res_rgr_model/r5/net_best_dy.ckpt ]; then
  T=$((AB_FRESH_DEADLINE - $(now))); [ "$T" -lt 300 ] && T=300
  echo "$(date -u +%H:%M) fresh-pairing A/B, ${T}s window"
  env PYTHONPATH=/root/.axon_site:/root/repo timeout "$T" \
    python scripts/eval_auto_res.py --scenes 6 --n-mpc 6 --fixed 20 90 \
    --rgr-folder r5 --gnn-folder r5_labeler --seed 777 \
    --out results/r5/eval_auto_res_r5.json \
    > logs/eval_auto_res_r5.log 2>&1 || echo "fresh A/B exited ($?)"
  git add results/r5 && git commit -q -m \
    "Round-5 dynamic-resolution A/B (labels paired with deployed model)" || true
fi

# ---- D. matched A/B completion (scenes 5-9) -----------------------------
kill_pidfiles /tmp/gp_r5_0.pid /tmp/regen_r5.pid
cp results/r5/eval_auto_res_matched_10scene.json \
   results/r5/eval_auto_res_matched_10scene.work.json 2>/dev/null
T=$((AB_MATCHED_DEADLINE - $(now)))
if [ "$T" -gt 600 ]; then
  echo "$(date -u +%H:%M) matched A/B scenes 5-9, ${T}s window"
  env PYTHONPATH=/root/.axon_site:/root/repo timeout "$T" \
    python scripts/eval_auto_res.py --scenes 10 --start 5 --n-mpc 6 \
    --fixed 20 90 --rgr-folder r4 --gnn-folder r2_matched --seed 777 \
    --out results/r5/eval_auto_res_matched_10scene.work.json \
    > logs/eval_auto_res_matched_10s_d.log 2>&1 || echo "matched A/B exited ($?)"
  cp results/r5/eval_auto_res_matched_10scene.work.json \
     results/r5/eval_auto_res_matched_10scene.json
  git add results/r5 && git commit -q -m \
    "Matched-model A/B extended (10-scene completion)" || true
fi

# ---- E. endwatch --------------------------------------------------------
while [ "$(now)" -lt "$END_AT" ]; do sleep 30; done
kill_pidfiles /tmp/watcher_r5.pid /tmp/gp_r5_0.pid /tmp/regen_r5.pid
echo "$(date -u +%H:%M) fleet stopped; bench preflight"
env PYTHONPATH=/root/.axon_site:/root/repo timeout 1500 python bench.py \
  > logs/bench_preflight_r5d.json 2> logs/bench_preflight_r5d.log || true
tail -1 logs/bench_preflight_r5d.json
git add logs/bench_preflight_r5d.json 2>/dev/null
git commit -q -m "Round-5 idle-chip bench preflight" || true
echo "$(date -u +%H:%M) round5d phases done"
