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

# one-time memoized builds: changed lines in the SparkEntry `builds` block
# register as _build:<name> (the builder bodies live in operator files the
# q-literal harvest can't see, so a touched operator still needs a full
# bench — but a touched builds WIRING is caught here)
builds=$(git diff "$ref" -- src/main/scala/graft/SparkEntry.scala \
  | grep -E '^[+-]' \
  | grep -oE '"[a-z0-9_]+" -> \(\(s, d\)' \
  | grep -oE '"[a-z0-9_]+"' \
  | tr -d '"' | sed 's/^/_build:/' | sort -u | paste -sd, - || true)
if [ -n "$builds" ]; then
  changed="${changed:+$changed,}$builds"
fi

if [ -z "$changed" ]; then
  echo "bench_changed: no query registrations/oracles changed vs $ref" >&2
  exit 0
fi

echo "bench_changed: timing [$changed] at $sf" >&2
SPARK_GRAFT_SF_DIR="$sf" SPARK_GRAFT_ONLY="$changed" \
  sbt -batch "runMain graft.Bench"

# Regression flag: any touched query whose fresh min moved >1.5x vs the
# last recorded full-run baseline for the SAME sf dir. Median+spread are in
# the fresh BENCH.json for judging whether a flag is co-tenant noise (min
# inside old spread) or a real plan change. Baseline = the newest BENCH_r*
# whose sf matches; missing/other-sf baselines skip silently (sf0.01 local
# iteration vs the driver's sf0.1 recordings are not comparable).
python3 - "$sf" <<'EOF'
import json, glob, os, sys
sf = sys.argv[1]
fresh = json.load(open("BENCH.json"))
base = None
for p in sorted(glob.glob("BENCH_r*.json"), reverse=True):
    try: b = json.load(open(p))
    except Exception: continue
    if b.get("sf") == sf and "queries" in b:
        base = (p, b); break
if base is None:
    print(f"bench_changed: no recorded baseline for sf={sf}; skip flagging",
          file=sys.stderr)
    sys.exit(0)
name, b = base
flags = 0
for q, t in fresh.get("queries", {}).items():
    old = b["queries"].get(q)
    if old is None or old <= 0: continue
    if t > 1.5 * old:
        spread = fresh.get("spread", {}).get(q, 0.0)
        print(f"FLAG {q}: min {t:.2f}s vs {old:.2f}s in {name} "
              f"({t/old:.2f}x; fresh spread {spread:.2f}s)")
        flags += 1
if flags == 0:
    print(f"bench_changed: no touched query moved >1.5x vs {name}")
sys.exit(1 if flags else 0)
EOF
