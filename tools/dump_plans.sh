#!/bin/bash
# Dump `.explain("formatted")` per query into plans/<tag>/<query>_<suffix>.txt
# Usage: tools/dump_plans.sh <tag> <suffix> <query> [query...]
# e.g.:  tools/dump_plans.sh r17 before j5_range_join j3_semi_anti
set -e
cd "$(dirname "$0")/.."
TAG="$1"; SUFFIX="$2"; shift 2
mkdir -p "plans/$TAG"
tools/run.sh graft.Explain /root/testdata/sf0.1 "$@" 2>/dev/null | awk -v tag="$TAG" -v suf="$SUFFIX" '
  /^========== / { q=$2; f="plans/" tag "/" q "_" suf ".txt"; next }
  q != "" { print > f }
'
for q in "$@"; do
  echo "wrote plans/$TAG/${q}_$SUFFIX.txt ($(wc -l < plans/$TAG/${q}_$SUFFIX.txt) lines)"
done
