#!/bin/bash
# Plain-java runner for the measurement mains (no sbt JVM/compile noise
# in the timed process). Runs against a FROZEN copy of the compiled
# classes (/tmp/graft_r18_frozen, snapshot of target/scala-2.13/classes
# at launch) so development recompiles cannot swap class files under a
# live measurement JVM. Usage: graft_run.sh <mainClass> <heap>
MAIN=$1
MEM=${2:-16g}
shift 2 2>/dev/null || shift $#
CLASSES=${GRAFT_CLASSES:-/tmp/graft_r18_frozen}
exec java \
  --add-modules=jdk.incubator.vector \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx$MEM \
  -cp "$CLASSES:/opt/spark/jars/*" \
  "$MAIN" "$@"
