#!/bin/bash
# Reproduce driver-bench degradations: sweep cores x heap (x optional
# JVM flags) over a query family. r10's 18-query family is the default;
# override with SWEEP_FAMILY. Runs graft.Bench directly with java so
# -Xmx is controlled per run (sbt's run/javaOptions freezes
# SPARK_DRIVER_MEM at shell start).
#
# Config cells are "cpus:heap[:jvmflags]" — e.g. "32:89g" or
# "32:89g:+AlwaysPreTouch". The default matrix covers the original
# {4,32}x{8g,16g} sweep PLUS the driver's actual cell (32 cores x 89 GiB
# heap, from BENCH_r11's max_heap_mb=91136) with AlwaysPreTouch on/off
# to test the fresh-page-fault hypothesis (minflt_loop 5.5M in r11).
# SPARK_GRAFT_BENCH_NO_REEXEC: Bench self-heals heaps >24 GiB by
# re-executing at -Xmx8g — a sweep must measure each cell AS-IS.
set -u
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
FAMILY="${SWEEP_FAMILY:-doc_dup_spans,doc_gopher_rules,doc_chunks,doc_line_dedup,doc_common_shingles,doc_bpe_vocab,doc_hash_classifier,dedup_prefix,doc_length_hist,knn_top10,doc_repetition,snapshot_diff,source_drift,doc_lm_score,q16_exists,doc_lang,doc_strip_dup_spans,doc_keyword_search}"
SF="${SWEEP_SF:-/root/testdata/sf0.1}"
# Array default, not a single word: "${@:-a b c}" expands the default
# as ONE word, silently collapsing the matrix to a single mongrel
# config (advisor r11 — verified: cpus=4 from %%:*, heap from ##*:).
configs=("$@")
if [ ${#configs[@]} -eq 0 ]; then
  configs=(4:8g 32:8g 4:16g 32:16g 32:89g 32:89g:+AlwaysPreTouch)
fi
for cfg in "${configs[@]}"; do
  IFS=: read -r cpus heap flags <<<"$cfg"
  tag="${cpus}_${heap}${flags:+_${flags//+/}}"
  out="/tmp/sweep_${tag}.json"
  xx=""
  [ -n "${flags:-}" ] && xx="-XX:${flags}"
  echo "=== cpus=$cpus heap=$heap flags=${flags:-none} -> $out ==="
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$cpus" \
  SPARK_GRAFT_BENCH_ONLY="$FAMILY" SPARK_GRAFT_BENCH_OUT="$out" \
  SPARK_GRAFT_BENCH_NO_REEXEC=1 \
  java -Xmx"$heap" $xx $OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench 2>"/tmp/sweep_${tag}.err" \
    | tail -1
done
echo "sweep done"
