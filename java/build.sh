#!/bin/sh
# Offline jar build for the pure-Java .bro codec — no Maven needed.
# Compiles java/src against a Hadoop classpath and emits
# java/target/bro-codec-<version>.jar (same artifact `mvn package`
# would produce from java/pom.xml).
#
# Classpath resolution order:
#   1. $HADOOP_CLASSPATH if set
#   2. pyspark's bundled hadoop-client-api/runtime jars (this repo's
#      test environment)
#
# Usage: sh java/build.sh [output-dir]
set -e

here="$(cd "$(dirname "$0")" && pwd)"
version="$(sed -n 's:.*<version>\(.*\)</version>.*:\1:p' "$here/pom.xml" | head -1)"
out="${1:-$here/target}"
classes="$out/classes"

if [ -n "$HADOOP_CLASSPATH" ]; then
  cp="$HADOOP_CLASSPATH"
else
  # many systems ship only python3 (r9 — ADVICE)
  py="$(command -v python3 || command -v python)" || {
    echo "no HADOOP_CLASSPATH and no python to locate pyspark jars" >&2
    exit 1
  }
  cp="$("$py" - <<'EOF'
import glob, os, sys
try:
    import pyspark
except ImportError:
    sys.exit("no HADOOP_CLASSPATH and no pyspark to borrow hadoop jars from")
jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
found = sorted(
    glob.glob(os.path.join(jars, "hadoop-client-api-*.jar"))
    + glob.glob(os.path.join(jars, "hadoop-client-runtime-*.jar"))
)
if not found:
    sys.exit("no hadoop client jars bundled with this pyspark")
print(os.pathsep.join(found))
EOF
)"
fi

mkdir -p "$classes"
# --release 8 matches the pom's bytecode target (oldest JVMs in the
# Hadoop field); falls back for JDKs without the flag
javac -encoding UTF-8 --release 8 -cp "$cp" -d "$classes" \
  "$here"/src/io/spark_graft/bro/*.java 2>/dev/null \
  || javac -encoding UTF-8 -cp "$cp" -d "$classes" \
       "$here"/src/io/spark_graft/bro/*.java
jar cf "$out/bro-codec-$version.jar" -C "$classes" .
echo "$out/bro-codec-$version.jar"
