#!/bin/bash
# Round-16 (r15 verdict #6): extend REAL executor-SIGKILL injection to
# the ADDITIVE-PARTIAL stream family. The r15 run covered the four
# store-heavy streams (q101/q104/q129/q134); these seven share the
# `batch=` partial pattern — per micro-batch partials appended under a
# batch-keyed Overwrite, folded at read — but had never seen a real
# executor death: q109 CMS, q111 IVF index maintenance, q122 bigram LM,
# q125 HLL, q138 NB sufficient statistics, q142 DSIR weights, q146
# temperature mixture. Same protocol as tools/streamkill_r15.sh:
# local-cluster[4,4,4096] with a SIGKILL every KILL_EVERY seconds,
# then (1) DuckDB batch-oracle check, (2) bit-compare against an
# uninterrupted local[32] run.
set -u
cd /root/repo
STREAMS=q109_cms_stream,q111_ivf_stream,q122_bigram_lm_stream,q125_hll_stream,q138_nb_stream,q142_dsir_stream,q146_mixture_stream,q179_url_frontier_stream,q182_warc_ingest_stream
SF=${SF:-/root/testdata/sf0.1}
JAR=target/scala-2.13/avkjobskillanalyticsspark_2.13-0.1.0.jar
KILL_EVERY=${KILL_EVERY:-12}
OUT=${OUT:-/tmp/killrun16}
REF=${REF:-/tmp/killref16}

if [ ! -d "$REF" ]; then
  echo "== uninterrupted local[32] reference =="
  SPARK_GRAFT_ONLY=$STREAMS SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Verify $SF $REF" 2>&1 | grep "\[verify\]" || true
fi
echo "errors.json (ref): $(cat "$REF"/errors.json)"

echo "== local-cluster[4,4,4096] run with executor kills every ${KILL_EVERY}s =="
rm -rf "$OUT"
SPARK_GRAFT_ONLY=$STREAMS SPARK_GRAFT_CPUS=16 \
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  SPARK_GRAFT_MASTER=local-cluster[4,4,4096] SPARK_GRAFT_JARS=$JAR \
  SPARK_GRAFT_EXEC_MEM=4g \
  sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | grep "\[verify\]" &
SBT_PID=$!

NKILLS=0
sleep 45
while kill -0 $SBT_PID 2>/dev/null; do
  VICTIM=$(pgrep -f CoarseGrainedExecutorBackend | shuf -n 1 || true)
  if [ -n "${VICTIM:-}" ]; then
    NKILLS=$((NKILLS + 1))
    echo "[kill $NKILLS] $(date +%H:%M:%S) SIGKILL executor pid $VICTIM"
    kill -9 "$VICTIM" 2>/dev/null || true
  fi
  for _ in $(seq "$KILL_EVERY"); do
    kill -0 $SBT_PID 2>/dev/null || break
    sleep 1
  done
done
wait $SBT_PID
echo "total kills: $NKILLS"
echo "errors.json (killrun): $(cat "$OUT"/errors.json)"

echo "== (1) DuckDB batch-oracle check of the killed run =="
python3 tools/selfcheck.py $SF "$OUT"
echo "== (2) dumpcmp vs uninterrupted local[32] =="
python3 tools/dumpcmp.py "$REF" "$OUT"
