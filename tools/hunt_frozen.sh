#!/bin/bash
# 16-seed model-check hunt on frozen classes (safe to run while sbt recompiles)
cd /root/repo
ST=$(find ~/.cache/coursier -name "scalatest*.jar" -o -name "scalactic*.jar" | tr '\n' ':')
XML=$(find ~/.cache/coursier -path "*scala-xml*" -name "*.jar" | tr '\n' ':')
CP="target/frozen_hunt/test-classes:target/frozen_hunt/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')$ST$XML"
ADD=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD="$ADD --add-opens java.base/$p=ALL-UNNAMED"
done
GRAFT_MODEL_SEEDS="$1" java $ADD -Xmx8g -cp "$CP" org.scalatest.tools.Runner -o -s graft.StreamingAnnSpec -z randomized
