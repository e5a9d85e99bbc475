#!/usr/bin/env bash
# Dedup-family scale probe on the realistic Zipf-vocabulary corpus
# (round-12 verdict #1). Generates documents fixtures at three scales
# (25k / 50k / 100k docs — constant planted near-dup rate, so true
# pair output grows linearly), symlinks the sibling sf0.1 tables the
# table registrar expects, and runs graft.ZipfProbe on each.
#
# Usage: tools/zipf_probe.sh [outdir-base]   (default /tmp)
# Output: <base>/zipf_probe_{25k,50k,100k}.json — one JSON line each
# with per-query wall seconds + output rows and the census/dispatch
# diagnostics for q65 (JaccardDedup.pairsAuto) and q113
# (ContainmentDedup.pairsAuto).
set -euo pipefail
cd "$(dirname "$0")/.."
BASE="${1:-/tmp}"
SIBS="/root/testdata/sf0.1"

for n in 25000 50000 100000; do
  lbl="$((n / 1000))k"
  dir="$BASE/zipf_$lbl"
  if [ ! -f "$dir/documents.parquet" ]; then
    python3 tools/gen_zipf_docs.py "$dir" "$n"
  fi
  for t in region nation customer supplier part orders lineitem events embeddings; do
    ln -sf "$SIBS/$t.parquet" "$dir/$t.parquet"
  done
  echo "[zipf_probe] $lbl"
  sbt -batch "runMain graft.ZipfProbe $dir zipf-$lbl" 2>/dev/null \
    | grep zipf_dedup_probe | sed 's/^\[info\] //' \
    > "$BASE/zipf_probe_$lbl.json"
  cat "$BASE/zipf_probe_$lbl.json"
done
