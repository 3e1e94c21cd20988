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
CP="$CC/scala-compiler/2.13.17/scala-compiler-2.13.17.jar:$CC/scala-library/2.13.17/scala-library-2.13.17.jar:$CC/scala-reflect/2.13.17/scala-reflect-2.13.17.jar"

mkdir -p "$OUT"
java -Xmx4g -cp "$CP" scala.tools.nsc.Main -usejavacp -nowarn -d "$OUT" \
  $(find stubs harness "$REF_SRC" -name "*.scala")
echo "compiled to $OUT"
echo "run e.g.:"
echo "  java -Xmx24g -cp $OUT:$CC/scala-library/2.13.17/scala-library-2.13.17.jar \\"
echo "    MineHarness /root/reference/core/src/test/resources/yago.tsv 0.02 /tmp/rules.tsv"
