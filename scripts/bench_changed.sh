#!/usr/bin/env bash
# Fast-path bench: time only the queries whose registration or oracle text
# changed vs a git ref (default HEAD), via Bench's SPARK_GRAFT_ONLY subset
# flag. With ~190 registered queries a full min-of-3 pass is >10 min of sbt
# wall time; iterating on a handful of queries should not pay that.
#
#   scripts/bench_changed.sh              # changed vs HEAD (working tree)
#   scripts/bench_changed.sh HEAD~3       # changed in the last 3 commits
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 scripts/bench_changed.sh
#
# Query names are harvested from the diff of SparkEntry.scala: any "q..."
# string literal on a changed line (registration, oracle key, or helper)
# counts. Over-matching is harmless — Bench ignores unknown names; a nearby
# unchanged query timed once extra costs seconds.
set -euo pipefail
cd "$(dirname "$0")/.."

ref="${1:-HEAD}"
sf="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}"

changed=$(git diff "$ref" -- src/main/scala/graft/SparkEntry.scala \
  | grep -E '^[+-]' \
  | grep -oE '"q[a-z0-9_]+"' \
  | tr -d '"' | sort -u | paste -sd, - || true)

if [ -z "$changed" ]; then
  echo "bench_changed: no query registrations/oracles changed vs $ref" >&2
  exit 0
fi

echo "bench_changed: timing [$changed] at $sf" >&2
SPARK_GRAFT_SF_DIR="$sf" SPARK_GRAFT_ONLY="$changed" \
  exec sbt -batch "runMain graft.Bench"
