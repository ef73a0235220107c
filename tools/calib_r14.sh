#!/bin/bash
# Round-14 calibration: r12 tree (be32278) vs HEAD, alternating same-box
# same-day sf0.1 bench runs (GraphBuildAB protocol generalized).
set -u
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
run() { # $1=dir $2=out
  cd "$1" || exit 1
  echo "[calib] $(date -u +%H:%M:%S) start $2" >&2
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' > "$2"
  echo "[calib] $(date -u +%H:%M:%S) done $2 total=$(python3 -c "import json,sys;print(json.load(open('$2'))['value'])")" >&2
}
H=/root/repo/.calib_head
R=/root/repo/.calib_r12
B=/root/repo/bench_history
run $R $B/r14_calib_r12tree_a.json
run $H $B/r14_calib_head_a.json
run $R $B/r14_calib_r12tree_b.json
run $H $B/r14_calib_head_b.json
echo "[calib] all done" >&2
