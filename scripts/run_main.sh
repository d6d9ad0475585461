#!/bin/bash
# Run a graft main class directly on the compiled classes + Spark jars,
# bypassing sbt (no build-server lock, no 30 s startup). Same JDK-17
# --add-opens set as build.sbt's forked run.
# Usage: scripts/run_main.sh <mainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g) and the usual SPARK_GRAFT_* knobs.
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="$1"; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# -Xms=-Xmx + AlwaysPreTouch: fault the whole heap in ONCE at JVM start,
# outside any timed window. This VM guest pays heavily for first-touch
# page faults under host memory pressure (measured: 50-95% guest-kernel
# time during big-heap runs, zero steal); pre-touching moves that cost to
# startup and keeps it out of query timings. Keep SPARK_DRIVER_MEM modest
# (default 8g, big-sf runs ~24g): a 60g heap's fault+GC footprint alone
# degraded identical queries 4-20x here.
exec java $ADD_OPENS \
  -Xms"${SPARK_DRIVER_MEM:-8g}" -Xmx"${SPARK_DRIVER_MEM:-8g}" -XX:+AlwaysPreTouch \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
