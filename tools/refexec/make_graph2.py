"""Deterministically derive a second graph from the reference's yago.tsv.

The reference's own two-graph fixtures (AmieSpec.scala:401-438 mine the
yago+dbpedia union; goldens 400 / 67) need dbpedia.ttl, which is stripped
from the snapshot. This generator synthesizes a second graph with the same
STRUCTURAL properties the two-graph tests exercise, derived purely from
yago.tsv (no external data, md5-keyed selection so the output is stable
across runs and machines):

  * a parallel predicate  (s, dbp:directed, o)   for ~1/2 of <directed>
    — cross-graph rules dbp:directed(x,y) <= directed(x,y) become minable;
  * a shared predicate    (s, <produced>, o)     for ~1/2 of <produced>
    — the SAME predicate occurs in both graphs (getGraphs(p) = {g1, g2})
    and ~half its triples are graph-2-only;
  * an inverted predicate (o, dbp:spouseOf, s)   for ~2/3 of <isMarriedTo>
    — inverse-shape cross-graph rules;
  * a shared predicate with instantiable objects
                          (s, <hasOfficialLanguage>, o) for ~1/2
    — object-INSTANTIATED atoms on a two-graph predicate survive the
      default thresholds, so the dump pins the position-restricted graph
      sets of toGraphAwareAtom (getGraphs(p, Object(c)), Atom.scala:34-43):
      a language whose triples land in both graphs resolves to
      [yago, dbpedia], one whose md5-half is empty resolves to yago only,
      while the PREDICATE-level set is always {yago, dbpedia};
  * a renamed predicate   (s, dbp:residence, o)  for ~1/2 of <livesIn>
    — below the default minHeadSize=100 after selection at ~236 rows: kept
      above it deliberately (236 >= 100).

Output format matches yago.tsv raw-TSV lines exactly: `<s>\t<p>\t<o>.`.

Usage: python tools/refexec/make_graph2.py [yago.tsv] [out.tsv]
"""

import hashlib
import sys

YAGO = "/root/reference/core/src/test/resources/yago.tsv"


def pick(s: str, o: str, mod: int, keep: int) -> bool:
    h = hashlib.md5(f"{s}|{o}".encode("utf-8")).digest()
    return h[0] % mod == keep


def main(src: str = YAGO, dst: str = "/tmp/graph2.tsv") -> None:
    out = []
    with open(src, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            s, p, o = line.split("\t")
            o = o[:-1].rstrip()  # strip the trailing '.'
            if p == "<directed>" and pick(s, o, 2, 0):
                out.append((s, "<dbp:directed>", o))
            elif p == "<produced>" and pick(s, o, 2, 0):
                out.append((s, "<produced>", o))
            elif p == "<hasOfficialLanguage>" and pick(s, o, 2, 0):
                out.append((s, "<hasOfficialLanguage>", o))
            elif p == "<isMarriedTo>" and pick(s, o, 3, 0):
                out.append((o, "<dbp:spouseOf>", s))
            elif p == "<livesIn>" and pick(s, o, 2, 1):
                out.append((s, "<dbp:residence>", o))
    out.sort()
    with open(dst, "w", encoding="utf-8") as f:
        for s, p, o in out:
            f.write(f"{s}\t{p}\t{o}.\n")
    print(f"{len(out)} triples -> {dst}")


if __name__ == "__main__":
    main(*sys.argv[1:])
