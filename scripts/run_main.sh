#!/bin/bash
# Run a compiled graft main directly on the JVM — no sbt launch/lock, so
# measurement mains (Bench, ScaleUpData, IvfBuildBench, Verify) can run
# while sbt holds the project lock for a test sweep. Mirrors build.sbt's
# fork settings exactly: the JDK-17 add-opens Spark needs outside
# spark-submit, the UTC session timezone, no UI, SPARK_DRIVER_MEM heap.
# Dev tooling only.
#
# Usage: scripts/run_main.sh <mainClass> [args...]
#
# local-cluster masters (ChurnProbe, SPARK_GRAFT_MASTER=local-cluster[...])
# additionally need SPARK_SCALA_VERSION=2.13 in the environment: the
# executor launcher resolves its classpath layout from it.
set -euo pipefail
cd "$(dirname "$0")/.."
# ABSOLUTE paths: GraftSession hands java.class.path to local-cluster
# executors as spark.executor.extraClassPath, and executor JVMs launch
# in their own work dir — relative entries resolve to nothing there and
# every deserialized lambda dies with a SerializedLambda ClassCastException.
REPO="$(pwd -P)"
CP="$REPO/target/scala-2.13/classes:$REPO/target/scala-2.13/test-classes:/opt/spark/jars/*"
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
