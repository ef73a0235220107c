#!/bin/bash
# Round-16: local-cluster PERF rung for the new curation family
# (q176–q180) at sf10 — same protocol as tools/clusterrung_r15.sh: a
# same-day local[32] twin vs local-cluster[4,8,6144] with real Netty
# shuffle + torrent broadcast. A plan secretly depending on local-mode
# shared memory would show as a >2x cluster/local gap.
set -u
cd /root/repo
ROWS=q176_pii_redact,q177_url_canonicalize,q178_warc_roundtrip,q179_url_frontier_stream,q180_robots_filter
JAR=target/scala-2.13/avkjobskillanalyticsspark_2.13-0.1.0.jar

echo "== local[32] twin =="
SPARK_GRAFT_SF_DIR=/root/sf10 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  SPARK_GRAFT_ONLY=$ROWS \
  SPARK_GRAFT_BENCH_OUT=bench_history/r16_local_sf10_curation_local.json \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep metric

echo "== local-cluster[4,8,6144] =="
SPARK_GRAFT_SF_DIR=/root/sf10 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  SPARK_GRAFT_ONLY=$ROWS \
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  SPARK_GRAFT_MASTER=local-cluster[4,8,6144] SPARK_GRAFT_JARS=$JAR \
  SPARK_GRAFT_EXEC_MEM=6g \
  SPARK_GRAFT_BENCH_OUT=bench_history/r16_cluster_sf10_curation.json \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep metric

echo "== per-query cluster/local ratios =="
python3 - <<'EOF'
import json
l = json.load(open("bench_history/r16_local_sf10_curation_local.json"))
c = json.load(open("bench_history/r16_cluster_sf10_curation.json"))
worst = 0.0
for k in sorted(l["queries"]):
    r = c["queries"][k] / l["queries"][k]
    worst = max(worst, r)
    print(f"  {k}: local {l['queries'][k]:.1f}s cluster "
          f"{c['queries'][k]:.1f}s = {r:.2f}x")
print("PASS: no query >2x under real executor JVMs" if worst <= 2.0
      else f"FAIL: worst ratio {worst:.2f}x exceeds the 2x bar")
EOF
