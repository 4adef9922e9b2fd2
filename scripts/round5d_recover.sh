#!/bin/sh
# Tunnel-outage recovery for the round5d session: the fresh-pairing A/B
# hung at scene 3 when the axon tunnel dropped (~00:35 UTC; in-flight
# RPCs never recover — the process must be restarted, CLAUDE.md).
# Probe-gated: wait until a FRESH probe process completes a dispatch,
# then rerun the fresh A/B resumed at scene 3, then the matched A/B
# resumed at scene 5 — strictly serialized (init starvation note).
# Launch: nohup sh scripts/round5d_recover.sh > logs/round5d_recover.log 2>&1 &
cd "$(dirname "$0")/.."
FRESH_DEADLINE=$(date -u -d 02:10 +%s)
MATCHED_DEADLINE=$(date -u -d 02:45 +%s)
now() { date +%s; }
for v in FRESH_DEADLINE MATCHED_DEADLINE; do
  eval "t=\$$v"; [ "$t" -lt "$(now)" ] && eval "$v=$((t + 86400))"
done

probe() {
  timeout 300 env PYTHONPATH=/root/.axon_site python -c \
    "import jax.numpy as j; print(float(j.ones(4).sum()))" >/dev/null 2>&1
}
until probe; do
  echo "$(date -u +%H:%M) tunnel still down"
  [ "$(now)" -gt "$((MATCHED_DEADLINE - 900))" ] && { echo "gave up"; exit 1; }
  sleep 60
done
echo "$(date -u +%H:%M) tunnel up"

T=$((FRESH_DEADLINE - $(now)))
if [ "$T" -gt 480 ]; then
  echo "$(date -u +%H:%M) fresh A/B resume at scene 3, ${T}s window"
  env PYTHONPATH=/root/.axon_site:/root/repo timeout "$T" \
    python scripts/eval_auto_res.py --scenes 6 --start 3 --n-mpc 6 \
    --fixed 20 90 --rgr-folder r5 --gnn-folder r5_labeler --seed 777 \
    --out results/r5/eval_auto_res_r5.json \
    >> logs/eval_auto_res_r5.log 2>&1 || echo "fresh A/B exited ($?)"
  git add results/r5 && git commit -q -m \
    "Fresh-pairing A/B: scenes 3+ after tunnel recovery" || true
fi

T=$((MATCHED_DEADLINE - $(now)))
if [ "$T" -gt 600 ]; then
  cp results/r5/eval_auto_res_matched_10scene.json \
     results/r5/eval_auto_res_matched_10scene.work.json
  echo "$(date -u +%H:%M) matched A/B resume at scene 5, ${T}s window"
  env PYTHONPATH=/root/.axon_site:/root/repo timeout "$T" \
    python scripts/eval_auto_res.py --scenes 10 --start 5 --n-mpc 6 \
    --fixed 20 90 --rgr-folder r4 --gnn-folder r2_matched --seed 777 \
    --out results/r5/eval_auto_res_matched_10scene.work.json \
    > logs/eval_auto_res_matched_10s_e.log 2>&1 || echo "matched A/B exited ($?)"
  cp results/r5/eval_auto_res_matched_10scene.work.json \
     results/r5/eval_auto_res_matched_10scene.json
  git add results/r5 && git commit -q -m \
    "Matched-model A/B: scenes 5+ after tunnel recovery" || true
fi
echo "$(date -u +%H:%M) recovery script done"
