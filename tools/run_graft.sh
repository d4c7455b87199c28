#!/bin/bash
# run a graft main against compiled classes + spark jars, no sbt lock
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CLASSES="$REPO/target/scala-2.13/classes"
SPARK_JARS="${SPARK_JARS_DIR:-/opt/spark/jars}"
[ -d "$CLASSES" ] || { echo "missing $CLASSES — run 'sbt compile' first" >&2; exit 1; }
[ -d "$SPARK_JARS" ] || { echo "missing Spark jars dir $SPARK_JARS" >&2; exit 1; }
CP="$CLASSES:$SPARK_JARS/*"
exec java -cp "$CP" \
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
  -Xmx"${GRAFT_XMX:-100g}" "$@"
