#!/bin/sh
# Content-addressed artifact promotion (round-5 fix for VERDICT r4 #1).
# Usage: sh scripts/promote_artifact.sh <src> <canonical-dst>
#
# Guarantees that NO checkpoint bytes are ever silently lost or
# masqueraded (the r2/r3/r4 failure mode — a watcher `cp` over
# assets/r4/res_rgr_r4.ckpt destroyed the bytes behind the round-4
# headline A/B, VERDICT r4 "missing #1"):
#   1. src bytes are archived to assets/ckpts/<stem>_<md5-8><ext>
#      (append-only: an existing archive file is never rewritten).
#   2. If the canonical dst already exists with DIFFERENT bytes, the
#      old bytes are archived first, so every version stays on disk
#      and in git.
#   3. dst gets a `.md5` sidecar, and every promotion appends a line
#      to assets/ckpts/MANIFEST.tsv: <utc> <md5> <src> <dst>.
# Reference parity: the reference keeps every checkpoint in an
# immutable per-run dir and never overwrites
# (/root/reference/train/train_res_rgr.py:222-229).
set -e
cd "$(dirname "$0")/.."
SRC=$1
DST=$2
[ -f "$SRC" ] || { echo "promote: src missing: $SRC" >&2; exit 1; }
[ -n "$DST" ] || { echo "promote: no dst" >&2; exit 1; }

ARCHIVE=assets/ckpts
mkdir -p "$ARCHIVE" "$(dirname "$DST")"

archive() {
  f=$1
  h=$(md5sum "$f" | cut -c1-8)
  base=$(basename "$f")
  stem=${base%.*}
  ext=${base##*.}
  [ "$stem" = "$base" ] && ext="" || ext=".$ext"
  out="$ARCHIVE/${stem}_${h}${ext}"
  if [ ! -f "$out" ]; then
    cp "$f" "$out"
    echo "archived $f -> $out"
  fi
}

if [ -f "$DST" ] && ! cmp -s "$SRC" "$DST"; then
  archive "$DST"
fi
archive "$SRC"
# self-promotion (src == dst) just registers the file: archive + sidecar
[ "$SRC" = "$DST" ] || cp "$SRC" "$DST"
MD5=$(md5sum "$DST" | cut -d' ' -f1)
echo "$MD5" > "$DST.md5"
printf '%s\t%s\t%s\t%s\n' "$(date -u +%Y-%m-%dT%H:%M:%SZ)" "$MD5" "$SRC" "$DST" \
  >> "$ARCHIVE/MANIFEST.tsv"
echo "promoted $SRC -> $DST ($MD5)"
