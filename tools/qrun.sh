#!/bin/bash
# detached standalone query timing (tmux; see memory: foreground skews wall)
cd "$(dirname "$0")/.."
JAR=target/scala-2.13/sourcesystemdatacheckerspark_2.13-0.1.0.jar
CP="$JAR:/opt/spark/jars/*"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
exec java $ADD_OPENS -Xmx16g -XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m \
  -Dspark.ui.enabled=false -cp "$CP" graft.QRun "$@"
