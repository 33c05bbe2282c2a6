#!/bin/bash
# One in-basin refinement worker (QUALITY_r11, VERDICT r10 ask #1):
# re-derives round ROUND's trial hypers from the shared loss file
# (RandomSearch.refineRoundPlan — bit-identical on every worker), then
# computes fold losses for its assigned GLOBAL trial indices.
# Usage: refine_worker.sh LOGFILE ARCH DATASET ROUND PERROUND LOSSFILE TRIALS_CSV
# Env: NBASE (default 50), EPOCHSCALE (default 1.0), BREADTH_SEED,
#      REFINE_SHRINK, GRAFT_CP (classpath file, default /tmp/cp.txt).
set -u
LOG="$1"; ARCH="$2"; DS="$3"; ROUND="$4"; PER="$5"; LOSSES="$6"; TRIALS="$7"
CP=$(cat "${GRAFT_CP:-/tmp/cp.txt}")
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
java -Xmx6g $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.RefineTrials run "${NBASE:-50}" "${EPOCHSCALE:-1.0}" \
  "$ARCH" "$DS" "$ROUND" "$PER" "$LOSSES" "$TRIALS" >> "$LOG" 2>&1
