#!/bin/bash
# Reproduce the r10 driver-bench degradation: sweep cores x heap over
# the 18-query family the judge flagged (2-28x slower in the driver's
# run than the builder's same-day clean run on identical code+data).
# Runs graft.Bench directly with java so -Xmx is controlled per run
# (sbt's run/javaOptions freezes SPARK_DRIVER_MEM at shell start).
set -u
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
FAMILY="doc_dup_spans,doc_gopher_rules,doc_chunks,doc_line_dedup,doc_common_shingles,doc_bpe_vocab,doc_hash_classifier,dedup_prefix,doc_length_hist,knn_top10,doc_repetition,snapshot_diff,source_drift,doc_lm_score,q16_exists,doc_lang,doc_strip_dup_spans,doc_keyword_search"
SF="${SWEEP_SF:-/root/testdata/sf0.1}"
for cfg in "${@:-4:8g 32:8g 4:16g 32:16g}"; do
  cpus="${cfg%%:*}"; heap="${cfg##*:}"
  out="/tmp/sweep_${cpus}_${heap}.json"
  echo "=== cpus=$cpus heap=$heap -> $out ==="
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$cpus" \
  SPARK_GRAFT_BENCH_ONLY="$FAMILY" SPARK_GRAFT_BENCH_OUT="$out" \
  java -Xmx"$heap" $OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench 2>/tmp/sweep_${cpus}_${heap}.err \
    | tail -1
done
echo "sweep done"
