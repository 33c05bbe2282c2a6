#!/bin/bash
# One full-breadth search worker: computes fold losses for the listed
# trial subset of the 50-trial seed-42 sequence (QUALITY_r10 ask #1).
# Usage: breadth_worker.sh LOGFILE ARCH DATASET TRIALS_CSV
# Classpath in /tmp/cp.txt (sbt "export Runtime/fullClasspath").
set -u
LOG="$1"; ARCH="$2"; DS="$3"; TRIALS="$4"
# GRAFT_CP: classpath file override — point it at a FROZEN classes
# snapshot so a concurrent `sbt compile` can't rewrite class bytes
# under the running JVMs (r11 ClosureCleaner incident)
CP=$(cat "${GRAFT_CP:-/tmp/cp.txt}")
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
java -Xmx6g $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.BreadthTrials run "${NTOTAL:-50}" "${EPOCHSCALE:-1.0}" \
  "$ARCH" "$DS" "$TRIALS" >> "$LOG" 2>&1
