#!/bin/bash
# Round-17: re-validate the retry contract AFTER the sink-overlap change
# (streaming/Sinks.inParallel) with REAL executor SIGKILLs. The overlap
# changes WHEN a batch's independent batch=-keyed Overwrite partials are
# written (concurrently, from a driver pool), so a kill can now land
# with any SUBSET of a batch's sinks committed — the retry must still
# recompute bit-identically and replace every partial. Targets are the
# five multi-sink streams the overlap touched (q101 span dedup, q104
# corpus prep, q129 minhash dedup, q134 incremental CC, q138 NB counts,
# q179 url frontier) plus q182 (warc ingest, staging-narrowed). Same
# protocol as tools/streamkill_r16.sh: local-cluster[4,4,4096] with a
# SIGKILL every KILL_EVERY seconds, then (1) DuckDB batch-oracle check,
# (2) bit-compare against an uninterrupted local[32] run.
set -u
cd /root/repo
STREAMS=q101_span_dedup_stream,q104_corpus_prep_stream,q129_minhash_dedup_stream,q134_incremental_cc_stream,q138_nb_stream,q179_url_frontier_stream,q182_warc_ingest_stream
SF=${SF:-/root/testdata/sf0.1}
JAR=target/scala-2.13/avkjobskillanalyticsspark_2.13-0.1.0.jar
KILL_EVERY=${KILL_EVERY:-12}
OUT=${OUT:-/tmp/killrun17}
REF=${REF:-/tmp/killref17}

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
