#!/bin/bash
# VERDICT r9 ask #5: re-run the top blow-up heavy hitters at x100/x1000
# under a REAL separate-JVM master, with content checksums, and the same
# fused-JVM runs as the hash baseline. Needs /tmp/cp.txt and the
# ScaleProbe corpora at /tmp/graft_probe_x100 / _x1000.
#   scripts/cluster_probe.sh OUTDIR
set -u
OUT="$1"; mkdir -p "$OUT"
CP=$(cat /tmp/cp.txt)
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
# top x1000-cost queries (VERDICT r9) + the star-edge reclassification
# targets (x16/x26) + the rule-driven stateful row (z16)
Q="x9_fingerprint x12_bpe_tokens x16_dup_components x17_contamination \
x21_lm_xent x26_semantic_components x30_bloom_decontam y4_lsh_ann \
y8_semdedup z12_audio_roundtrip z16_stream_session_window"

run_fused() { # $1 dir $2 tag $3 xmx $4 shuffle
  echo "[cluster_probe] fused $2" >&2
  SPARK_GRAFT_CHECKSUM=1 SPARK_GRAFT_CPUS=16 SPARK_GRAFT_SHUFFLE=$4 \
  java -Xmx"$3" $OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.QueryTime "$1" $Q \
    > "$OUT/fused_$2.log" 2> "$OUT/fused_$2.err"
}
run_cluster() { # $1 dir $2 tag $3 master $4 execmem $5 xmx $6 shuffle
  echo "[cluster_probe] cluster $2" >&2
  export SPARK_GRAFT_MASTER="$3"
  export SPARK_SCALA_VERSION=2.13
  SPARK_GRAFT_CHECKSUM=1 SPARK_GRAFT_CPUS=16 SPARK_GRAFT_SHUFFLE=$6 \
  java -Xmx"$5" $OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Dspark.executor.memory="$4" \
    -cp "$CP" graft.QueryTime "$1" $Q \
    > "$OUT/cluster_$2.log" 2> "$OUT/cluster_$2.err"
  unset SPARK_GRAFT_MASTER
}

run_fused   /tmp/graft_probe_x100  x100  16g 32
run_cluster /tmp/graft_probe_x100  x100  "local-cluster[2,8,8192]"  6g 6g 32
run_fused   /tmp/graft_probe_x1000 x1000 32g 64
run_cluster /tmp/graft_probe_x1000 x1000 "local-cluster[2,8,15360]" 13g 8g 64
echo "[cluster_probe] ALL DONE" >&2
