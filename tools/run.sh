#!/bin/bash
# Dev helper: run a graft main class against the compiled classes without
# sbt's per-invocation startup cost. Usage:
#   tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/verify_out
set -e
cd /root/repo
# test-classes carries the probes/ source set (ForceProbe, VerifyOne,
# Explain, ...) — build it with `sbt Test/compile`
CP="target/scala-2.13/classes:target/scala-2.13/test-classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
exec java \
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
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx8g -cp "$CP" "$@"
