#!/bin/bash
# Integrated streaming-topology soak: 4 concurrent checkpointed queries
# (traffic windows, UV detail, is_new repair, trade join) over two file
# buses, killed once mid-run, restarted, sinks compared to batch twins.
# Usage: scripts/soak.sh [rootDir]   (exit 0 iff every sink ≡ its twin)
set -e
cd "$(dirname "$0")/.."
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS -Xmx4g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.apps.Soak "$@"
