#!/bin/bash
# Run a compiled graft main directly on the JVM — no sbt launch/lock, so
# measurement mains (Bench, ScaleUpData, IvfBuildBench, Verify) can run
# while sbt holds the project lock for a test sweep. Mirrors build.sbt's
# fork settings exactly: the JDK-17 add-opens Spark needs outside
# spark-submit, the UTC session timezone, no UI, SPARK_DRIVER_MEM heap.
# Dev tooling only.
#
# Usage: scripts/run_main.sh <mainClass> [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:target/scala-2.13/test-classes:/opt/spark/jars/*"
OPENS=(java.lang java.lang.invoke java.lang.reflect java.io java.net
       java.nio java.util java.util.concurrent java.util.concurrent.atomic
       sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar)
ARGS=()
for p in "${OPENS[@]}"; do ARGS+=(--add-opens "java.base/$p=ALL-UNNAMED"); done
exec java "${ARGS[@]}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" "$@"
