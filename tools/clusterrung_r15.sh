#!/bin/bash
# Round-15 verdict #5: local-cluster PERF rung for the heavy family.
# Correctness parity across process boundaries is standing (r13/r14);
# this measures TIMING behavior — real Netty shuffle + torrent
# broadcast — for q130/q132/q140/q129/q158 at sf10, next to a same-day
# local[32] twin of the identical tree. A plan secretly depending on
# local-mode shared memory would show here as a >2x cluster/local gap.
set -u
cd /root/repo
HEAVY=q129_minhash_dedup_stream,q130_pagerank,q132_personalized_pagerank,q140_pairs_auto_routed,q158_yield_stream
JAR=target/scala-2.13/avkjobskillanalyticsspark_2.13-0.1.0.jar

echo "== local[32] twin =="
SPARK_GRAFT_SF_DIR=/root/sf10 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  SPARK_GRAFT_ONLY=$HEAVY \
  SPARK_GRAFT_BENCH_OUT=bench_history/r15_local_sf10_heavy_local.json \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep metric

echo "== local-cluster[4,8,6144] =="
SPARK_GRAFT_SF_DIR=/root/sf10 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  SPARK_GRAFT_ONLY=$HEAVY \
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  SPARK_GRAFT_MASTER=local-cluster[4,8,6144] SPARK_GRAFT_JARS=$JAR \
  SPARK_GRAFT_EXEC_MEM=6g \
  SPARK_GRAFT_BENCH_OUT=bench_history/r15_cluster_sf10_heavy.json \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep metric

echo "== per-query cluster/local ratios =="
python3 - <<'EOF'
import json
loc = json.load(open("bench_history/r15_local_sf10_heavy_local.json"))
clu = json.load(open("bench_history/r15_cluster_sf10_heavy.json"))
bad = 0
for k in sorted(loc["queries"]):
    l, c = loc["queries"][k], clu["queries"].get(k)
    if c is None:
        print(f"{k}: MISSING in cluster run"); bad += 1; continue
    r = c / l
    flag = " <-- >2x" if r > 2.0 else ""
    if r > 2.0: bad += 1
    print(f"{k}: local {l:.1f}s cluster {c:.1f}s ratio {r:.2f}{flag}")
print("RESULT:", "FAIL (>2x rows above)" if bad else "PASS (no query >2x local)")
EOF
