#!/usr/bin/env bash
# Pre-snapshot gate: NEVER create a "snapshot" / "close-out" commit without
# this script exiting 0 on the exact tree being committed.
#
# Rationale (round 5 post-mortem): the round-5 end-of-round snapshot was
# committed untested with a one-character syntax error; the driver's gate
# recorded zero working queries for the whole round even though the tree
# two commits earlier had a logged 126/126 sf1 oracle pass. This script
# makes that failure mode impossible: it compiles, runs graft.Verify on
# sf0.01, and runs the DuckDB oracle selfcheck — the same three steps the
# driver's official gate performs.
#
# Usage: tools/presnapshot.sh [sfDir]   (default /root/testdata/sf0.01)
#   Exit 0  -> safe to snapshot. Cite the run in the closing commit message.
#   Exit !=0 -> DO NOT COMMIT a snapshot; fix and re-run.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="$(mktemp -d /tmp/presnapshot.XXXXXX)"
trap 'rm -rf "$OUT_DIR"' EXIT

echo "[presnapshot] 1/5 sbt compile"
sbt -batch compile > "$OUT_DIR/compile.log" 2>&1 || {
  tail -30 "$OUT_DIR/compile.log"; echo "[presnapshot] COMPILE FAILED"; exit 1; }

echo "[presnapshot] 2/5 graft.Verify @ $SF_DIR"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
  sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR/verify" \
  > "$OUT_DIR/verify.log" 2>&1 || {
  tail -30 "$OUT_DIR/verify.log"; echo "[presnapshot] VERIFY FAILED"; exit 1; }

echo "[presnapshot] 3/5 gate completeness (round-6 post-mortem: a broken"
echo "              query must FAIL the gate, not silently shrink it)"
python3 - "$OUT_DIR/verify" <<'EOF'
import json, os, sys
out = sys.argv[1]
errs = json.load(open(os.path.join(out, "errors.json")))
if errs:
    for k, v in errs.items():
        print(f"[presnapshot] BROKEN QUERY {k}: {v[:200]}")
    sys.exit(1)
dumped = {d for d in os.listdir(out)
          if os.path.isdir(os.path.join(out, d))}
oracle = set(json.load(open(os.path.join(out, "oracle_sql.json"))))
missing = oracle - dumped
if missing:
    print(f"[presnapshot] {len(missing)} oracle queries missing from dump: "
          f"{sorted(missing)}")
    sys.exit(1)
print(f"[presnapshot] {len(dumped)} queries dumped, 0 errors")
EOF

echo "[presnapshot] 4/5 DuckDB oracle selfcheck"
python3 tools/selfcheck.py "$SF_DIR" "$OUT_DIR/verify" | tail -5

echo "[presnapshot] 5/5 sbt test (full suite — driver bar is exit 0)"
sbt -batch test > "$OUT_DIR/test.log" 2>&1 || {
  grep -E "TESTS FAILED|\*\*\* FAILED|Error" "$OUT_DIR/test.log" | tail -20
  echo "[presnapshot] SBT TEST FAILED"; exit 1; }
grep -E "Tests: succeeded" "$OUT_DIR/test.log" | tail -1

echo "[presnapshot] GATE GREEN — safe to snapshot ($(git rev-parse --short HEAD) + working tree)"
