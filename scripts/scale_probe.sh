#!/bin/bash
# Growth probe BEYOND sf0.1: times the shuffle/state/bucket-structured
# query families (text dedup, ANN, events/streaming) on the ScaleProbe
# blow-ups of the sf0.1 tables (x10 and x100 — statistically
# scale-invariant copies; see ScaleProbe.scala scaladoc), plus sf0.1
# itself as the anchor, in standalone JVMs. Render the growth table with
# scripts/scale_probe.py afterwards.
#
# Usage: scale_probe.sh [cpus]   (classpath in /tmp/cp.txt; blow-ups
#        generated first via `runMain graft.ScaleProbe`)
set -eu
CPUS=${1:-16}
CP=$(cat /tmp/cp.txt)
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"

QUERIES="x4_dedup_exact x5_dup_clusters x6_minhash_dedup x7_simhash \
x8_ngram_jaccard x9_fingerprint x10_langid x12_bpe_tokens \
x13_simhash_neardup x15_top_bigrams x16_dup_components x17_contamination \
x18_bm25 x21_lm_xent x22_token_pack x23_dup_spans x25_quality_quantiles \
x26_semantic_components x29_curation_pipeline x30_bloom_decontam \
y1_cosine_topk y2_centroids y3_knn_join y4_lsh_ann y5_ivf_ann y6_pq_ann \
y7_ivfpq_ann y8_semdedup \
z3_events_hourly z4_stream_windowed z5_sessionize z6_asof_join \
z7_range_join z8_stream_append z9_stream_sessions z10_session_window \
z13_stream_join z14_json_props z15_stream_sessions_all \
z1_multimodal_profile z2_frame_sample z11_image_roundtrip \
z12_audio_roundtrip z17_video_roundtrip \
z16_stream_session_window z18_stream_dedup"

OUT=${SCALE_PROBE_OUT:-/tmp/graft_probe_logs}
mkdir -p "$OUT"
for tag in anchor:/root/testdata/sf0.1 x10:/tmp/graft_probe_x10 \
           x100:/tmp/graft_probe_x100; do
  name=${tag%%:*}; dir=${tag#*:}
  echo "[scale_probe] timing $name ($dir, cpus=$CPUS)" >&2
  SPARK_GRAFT_CPUS=$CPUS java -Xmx24g $OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.QueryTime "$dir" \
    $QUERIES > "$OUT/qtime_$name.log" 2> "$OUT/qtime_$name.err"
done
python3 "$(dirname "$0")/scale_probe.py" \
  "$OUT/qtime_anchor.log" "$OUT/qtime_x10.log" "$OUT/qtime_x100.log"
