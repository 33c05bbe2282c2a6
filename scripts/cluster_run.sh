#!/bin/bash
# Run a graft main under a REAL separate-JVM master (SCALE.md §separate-JVM).
#
#   scripts/cluster_run.sh [-m MASTER] [-x DRIVER_XMX] MAIN [args...]
#
# Defaults: MASTER=local-cluster[2,8,4096] (2 forked worker JVMs, 8 cores
# and 4 GiB capacity each), DRIVER_XMX=4g, EXEC_MEM=3g. The bracket's
# third field is the WORKER's capacity, NOT the executor heap — without
# spark.executor.memory the forked executors run at the 1g default (found
# the hard way: a 12288-capacity worker OOM'd its 1g executor on a 741 MiB
# broadcast). EXEC_MEM must fit the worker capacity. Needs /tmp/cp.txt
# (sbt "export Runtime/fullClasspath") — the main must be launched via
# bare `java -cp` so Sessions can forward the REAL classpath to the
# forked workers (sbt's in-process classloader would forward only the
# sbt launcher jar).
set -u
MASTER="local-cluster[2,8,4096]"
XMX="4g"
EXEC_MEM="3g"
while getopts "m:x:e:" opt; do
  case $opt in
    m) MASTER="$OPTARG";;
    x) XMX="$OPTARG";;
    e) EXEC_MEM="$OPTARG";;
    *) exit 2;;
  esac
done
shift $((OPTIND-1))
MAIN="$1"; shift
CP=$(cat /tmp/cp.txt)
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
export SPARK_GRAFT_MASTER="$MASTER"
# bin/load-spark-env.sh normally sets this; the worker-side executor
# launcher (AbstractCommandBuilder.getScalaVersion) needs it when spawned
# from a bare-java driver, else "Cannot find any build directories".
export SPARK_SCALA_VERSION=2.13
# GRAFT_JAVA_OPTS: extra -D flags for probe arms (e.g. the reliable-
# checkpoint mode: GRAFT_JAVA_OPTS=-Dspark.graft.checkpoint.dir=/tmp/x)
exec java -Xmx"$XMX" $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dspark.executor.memory="$EXEC_MEM" \
  ${GRAFT_JAVA_OPTS:-} \
  -cp "$CP" "$MAIN" "$@"
