#!/bin/bash
# Compile the reference engine (propi/rdfrules core, Scala) OFFLINE against
# the minimal dependency stubs in ./stubs, plus the MineHarness driver.
#
# Nothing from /root/reference is copied anywhere: the reference sources are
# read in place at compile time and the class files land in a scratch dir.
# The stubs replace external jars (jena/fastutil/spray-json/...) that cannot
# be resolved without network access; fastutil and the JSON value model are
# functional (hash maps / printer), the I/O-format surfaces compile but
# throw, and scala-parallel-collections is replaced by a SEQUENTIAL shim
# (deterministic; the mined rule set is order-independent).
#
# Validation that the stubs do not change behavior: every var-only golden in
# the reference's own AmieSpec reproduces bit-exactly (124 / 67 / 30 / 11 /
# 8 / 59 rules, same HeadCoverage values), and repeated runs are md5-stable.
set -euo pipefail
cd "$(dirname "$0")"

REF_SRC=${REF_SRC:-/root/reference/core/src/main/scala}
OUT=${OUT:-/tmp/refexec_out}
# Locate the Scala 2.13 jars in whatever local cache this machine has
# (coursier/ivy/maven layouts all work) — no network, no fixed mirror path.
_find_jar() {
  { find ~/.cache/coursier ~/.ivy2 ~/.m2 -name "$1-2.13*.jar" 2>/dev/null || true; } | sort | tail -1
}
SCALA_COMPILER=$(_find_jar scala-compiler)
SCALA_LIBRARY=$(_find_jar scala-library)
SCALA_REFLECT=$(_find_jar scala-reflect)
[ -n "$SCALA_COMPILER" ] && [ -n "$SCALA_LIBRARY" ] && [ -n "$SCALA_REFLECT" ] || {
  echo "scala 2.13 jars not found in local caches" >&2; exit 1; }
CP="$SCALA_COMPILER:$SCALA_LIBRARY:$SCALA_REFLECT"

mkdir -p "$OUT"
java -Xmx4g -cp "$CP" scala.tools.nsc.Main -usejavacp -nowarn -d "$OUT" \
  $(find stubs harness "$REF_SRC" -name "*.scala")
echo "compiled to $OUT"
echo "run e.g.:"
echo "  java -Xmx24g -cp $OUT:$SCALA_LIBRARY \\"
echo "    MineHarness /root/reference/core/src/test/resources/yago.tsv 0.02 /tmp/rules.tsv"
