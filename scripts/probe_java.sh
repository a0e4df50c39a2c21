#!/bin/bash
# Run a graft test-classpath main in its own JVM WITHOUT the sbt build
# lock (probes can then run concurrently with sbt compile cycles; the
# classpath snapshot must be re-exported after a compile for new code:
#   sbt -batch "export Test/fullClasspath" | grep -E "^/" | tail -1 \
#     > /tmp/graft_test_cp.txt
# Mirrors build.sbt's forked-JVM flags exactly.
# Usage: probe_java.sh <MainClass> [args...]
set -e
CP=$(cat /tmp/graft_test_cp.txt)
MEM="${SPARK_DRIVER_MEM:-24g}"
exec java \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"$MEM" \
  -cp "$CP" "$@"
