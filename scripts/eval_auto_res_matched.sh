#!/bin/sh
# Reproduce the matched-model dynamic-resolution A/B
# (results/r4/eval_auto_res_r4_matched.json, DEMO.md round-4 #2b).
#
# The r4 regressor (assets/r4/res_rgr_r4.ckpt) was trained on GP labels
# optimized UNDER THE R2 DYNAMICS MODEL (assets/r2 label set), so the
# A/B must deploy the r2 GNN for rollouts — the regressor predicts the
# N that is optimal under that model. Identical scenes/seeds/arms to the
# (mismatched, superseded) round-4 A/B so the deployed checkpoint is the
# only variable.
cd "$(dirname "$0")/.."
# Byte-identity guard (VERDICT r4 missing #1: a watcher overwrote this
# exact artifact after the A/B ran, making the headline unreproducible).
# These md5s are the bytes the committed result JSON was produced with.
want_rgr=a950f51ebe6fc6e8c3bb9a85c06f3d3e
want_gnn=8d4c80ef13d2663c3408f2bc1a549e69
have_rgr=$(md5sum assets/r4/res_rgr_r4.ckpt | cut -d' ' -f1)
have_gnn=$(md5sum assets/r2/gnn_r2.ckpt | cut -d' ' -f1)
if [ "$have_rgr" != "$want_rgr" ] || [ "$have_gnn" != "$want_gnn" ]; then
  echo "ERROR: checkpoint bytes do not match the A/B's provenance:" >&2
  echo "  assets/r4/res_rgr_r4.ckpt $have_rgr (want $want_rgr)" >&2
  echo "  assets/r2/gnn_r2.ckpt     $have_gnn (want $want_gnn)" >&2
  echo "Restore from assets/ckpts/ (see MANIFEST.tsv) before rerunning." >&2
  exit 1
fi
mkdir -p data/gnn_dyn_model/r2_matched data/res_rgr_model/r4 results/r4
cp assets/r2/gnn_r2.ckpt data/gnn_dyn_model/r2_matched/net_best.ckpt
cp assets/r4/res_rgr_r4.ckpt data/res_rgr_model/r4/net_best_dy.ckpt
env PYTHONPATH=/root/.axon_site:/root/repo \
  timeout "${EVAL_TIMEOUT:-4800}" \
  python scripts/eval_auto_res.py \
  --scenes 3 --n-mpc 6 --fixed 20 90 \
  --rgr-folder r4 --gnn-folder r2_matched --seed 777 \
  --out results/r4/eval_auto_res_r4_matched.json "$@"
