#!/bin/bash
# Run a graft main outside sbt (parallel JVMs don't contend on the sbt
# server lock): tools/run_main.sh <mainClass> [args...]
# Same JDK17 --add-opens set as build.sbt's javaOptions.
cd "$(dirname "$0")/.." || exit 1
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
