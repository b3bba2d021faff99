#!/bin/bash
# Direct-JVM launcher for graft mains (bypasses sbt lock + ~30s startup).
# Usage: run_main.sh [-d <treeDir>] <mainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 24g) and any SPARK_GRAFT_* vars pass through.
set -eu
TREE=/root/repo
if [ "${1:-}" = "-d" ]; then TREE="$2"; shift 2; fi
MAIN="$1"; shift
CP="$TREE/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
cd "$TREE"
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  -cp "$CP" "$MAIN" "$@"
