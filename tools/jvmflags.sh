# JDK-17 module opens for running graft mains with bare `java` (mirrors
# build.sbt's jdk17AddOpens; spark-submit injects these itself)
JVMFLAGS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  JVMFLAGS="$JVMFLAGS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  JVMFLAGS="$JVMFLAGS --add-opens java.base/$p=ALL-UNNAMED"
done
