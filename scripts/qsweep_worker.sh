#!/bin/bash
# Runs a sequence of QualitySweep slices in one worker, appending to one log.
# Usage: qsweep_worker.sh LOGFILE "ARCH GROUPS [DIFFS]" ["ARCH GROUPS [DIFFS]" ...]
# Classpath must be in /tmp/cp.txt (sbt "export Runtime/fullClasspath").
set -u
LOG="$1"; shift
CP=$(cat /tmp/cp.txt)
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
for slice in "$@"; do
  set -- $slice
  ARCH=$1; GRPS=$2; DIFFS=${3:-}
  echo "[worker] starting $ARCH groups=$GRPS diffs=${DIFFS:-all}" >> "$LOG"
  java -Xmx8g $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.QualitySweep "${NTRIALS:-3}" "${EPOCHSCALE:-0.02}" "${MODE:-ref}" "$ARCH" "$GRPS" $DIFFS >> "$LOG" 2>&1
done
echo "[worker] ALL DONE" >> "$LOG"
