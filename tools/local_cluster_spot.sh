#!/usr/bin/env bash
# Multi-JVM spot check (VERDICT r6 #5): run the sf0.1 spot set on
# master local-cluster[2,8,2048] — two separate executor JVMs, so rows
# cross REAL serialization and network shuffle boundaries instead of
# staying in one heap as local[n] allows. Same spot set as sf1_spot.sh.
# Artifacts:
#   CORRECTNESS_r<N>_localcluster.txt  (oracle compare)
#   BENCH_r<N>_localcluster.json       (bench line, same protocol)
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="$(printf '%02d' "${1:?usage: tools/local_cluster_spot.sh <roundNumber>}")"
SF="${SF_DIR:-/root/testdata/sf0.1}"
SPOT=(q09_pricing_summary q22_json_events q54_repetition_filter
      q55_boilerplate_ngrams q62_funnel q71_dedup_corpus
      q76_theta_rank_join q77_theta_agg_join q78_theta_band_join
      q93_decontam_bloom q94_token_pack q96_cdc_compact
      q100_setsim_join q102_chunk_overlap q103_kl_divergence
      q109_winnow q114_contain_join q117_triangles
      q119_pmi_collocations q122_neardup_matrix q123_snapshot_diff
      q131_cooccur_lift q133_psi_drift q137_weighted_sample
      q139_centroid_sim q142_window_funnel q147_stickiness
      q149_auc q154_seq_pattern)

ADD_OPENS=()
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent \
         java.base/java.util.concurrent.atomic java.base/sun.nio.ch \
         java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADD_OPENS+=("--add-opens" "$p=ALL-UNNAMED")
done
# executors are separate JVMs: they need the graft classes on their
# classpath and the same --add-opens flags the driver gets
EXEC_OPENS="${ADD_OPENS[*]}"
JAVA=(env SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
      SPARK_GRAFT_MASTER="local-cluster[2,8,2048]"
      java "${ADD_OPENS[@]}" -Dspark.ui.enabled=false
      -Dspark.sql.session.timeZone=UTC
      "-Dspark.executor.extraClassPath=$PWD/target/scala-2.13/classes"
      "-Dspark.executor.extraJavaOptions=$EXEC_OPENS"
      "-Xmx${SPARK_DRIVER_MEM:-8g}"
      -cp "target/scala-2.13/classes:/opt/spark/jars/*")

OUT="$(mktemp -d /tmp/lc_spot.XXXXXX)"
echo "[lc_spot] verify spot set at $SF on local-cluster[2,8,2048] -> $OUT"
SPARK_GRAFT_CPUS=16 "${JAVA[@]}" graft.Verify "$SF" "$OUT" "${SPOT[@]}" >/dev/null
python3 tools/oracle_check.py "$SF" "$OUT" "${SPOT[@]}" \
  | tee "CORRECTNESS_r${ROUND}_localcluster.txt"

echo "[lc_spot] bench spot set"
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=16 \
  SPARK_GRAFT_BENCH_PASSES="${SPARK_GRAFT_BENCH_PASSES:-3}" \
  "${JAVA[@]}" graft.Bench "${SPOT[@]}" \
  | grep -a '"stat":"min-of' | tail -1 > "BENCH_r${ROUND}_localcluster.json"
cat "BENCH_r${ROUND}_localcluster.json"
echo "[lc_spot] wrote CORRECTNESS_r${ROUND}_localcluster.txt and BENCH_r${ROUND}_localcluster.json"
