#!/bin/bash
set -u
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
run() {
  cd "$1" || exit 1
  echo "[calib] $(date -u +%H:%M:%S) start $2" >&2
  export SPARK_GRAFT_BENCH_OUT="$2"
  sbt -batch "runMain graft.Bench" >/dev/null 2>&1
  echo "[calib] $(date -u +%H:%M:%S) done $2 total=$(python3 -c "import json;print(json.load(open('$2'))['value'])")" >&2
}
B=/root/repo/bench_history
run /root/repo/.calib_r12 $B/r14_calib_r12tree_c.json
run /root/repo/.calib_head $B/r14_calib_head_c.json
echo "[calib] all done" >&2
