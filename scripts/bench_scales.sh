#!/bin/bash
# Runs graft.Bench at sf0.001 / sf0.01 / sf0.1 in standalone JVMs and
# collects the full-precision per-query lines, then renders the
# cross-scale growth table. Classpath: /tmp/cp.txt (sbt "export
# Runtime/fullClasspath"). Usage: bench_scales.sh [cpus]
set -eu
CPUS=${1:-16}
CP=$(cat /tmp/cp.txt)
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
OUT=$(mktemp -d)
for sf in sf0.001 sf0.01 sf0.1; do
  echo "[bench_scales] running $sf (cpus=$CPUS)" >&2
  d="$OUT/$sf"; mkdir -p "$d"
  (cd "$d" && SPARK_GRAFT_SF_DIR=/root/testdata/$sf SPARK_GRAFT_CPUS=$CPUS \
    java -Xmx8g $OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench \
    > bench_stdout.log 2> bench_stderr.log)
  cp "$d/BENCH_LOCAL.json" "$OUT/bench_$sf.json"
done
python3 "$(dirname "$0")/bench_scales.py" \
  "$OUT/bench_sf0.001.json" "$OUT/bench_sf0.01.json" "$OUT/bench_sf0.1.json"
echo "[bench_scales] raw lines kept in $OUT" >&2
