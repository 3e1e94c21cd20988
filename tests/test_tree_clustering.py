"""TreeBasedDbScan (ruleset.tree_dbscan_clusters_resolved) vs the EXECUTED
reference (tools/refexec ClusterHarness: TreeBasedDbScan.scala run through
makeClusters' grouped-by-head-predicate law on the lcs top-500 ruleset,
fixture cluster_tree_top500.tsv.gz). Insertion order is pinned by the
fixture's per-group position column — both sides feed identical order, so
the cluster PARTITION must match exactly (cluster numbering is
group-enumeration-order dependent in the reference and is not compared).
Also cross-checks the pure-Python AllAtoms similarity against the JVM
column expression."""

from __future__ import annotations

import gzip
import re

import pytest
from pyspark.sql import functions as F

from rdfrules_spark.ruleset import (
    _py_all_atoms_sim,
    all_atoms_similarity,
    tree_dbscan_clusters_resolved,
)

FIXTURE = "/root/repo/tests/fixtures/refexec/cluster_tree_top500.tsv.gz"
ATOM = re.compile(r"^\(\s*(\S+)\s+(.+?)\s+(\S+)\s*\)$")


def _term(x: str) -> str:
    return x if x.startswith("?") else "C=" + x[1:-1]


def _atom(s: str) -> str:
    m = ATOM.match(s.strip())
    assert m, s
    su, p, o = m.groups()
    return f"{_term(su)}|{p[1:-1]}|{_term(o)}"


def load_fixture():
    rows = []
    with gzip.open(FIXTURE, "rt", encoding="utf-8") as f:
        for line in f:
            pred, cid, pos, head, body, hc = line.rstrip("\n").split("\t")
            rows.append(
                {
                    "p": pred[1:-1],
                    "cid": int(cid),
                    "pos": int(pos),
                    "head": _atom(head),
                    "atoms": sorted(_atom(a) for a in body.split(" ^ ")),
                    "head_coverage": float(hc),
                }
            )
    assert len(rows) == 500
    return rows


def rule_key(head: str, atoms) -> tuple:
    return (head, frozenset(atoms))


def test_tree_clustering_matches_executed_reference(spark):
    rows = load_fixture()
    want: dict[str, dict[int, set]] = {}
    for r in rows:
        want.setdefault(r["p"], {}).setdefault(r["cid"], set()).add(
            rule_key(r["head"], r["atoms"])
        )
    df = spark.createDataFrame(
        [(r["head"], r["atoms"], r["p"], r["pos"], r["head_coverage"])
         for r in rows],
        "head string, atoms array<string>, p string, pos int, "
        "head_coverage double",
    )
    out = tree_dbscan_clusters_resolved(df, order_cols=["p", "pos"])
    got_rows = out.select("p", "cluster", "head", "atoms").collect()
    assert len(got_rows) == 500
    got: dict[str, dict[int, set]] = {}
    for r in got_rows:
        got.setdefault(r["p"], {}).setdefault(r["cluster"], set()).add(
            rule_key(r["head"], r["atoms"])
        )
    for p in want:
        want_partition = {frozenset(c) for c in want[p].values()}
        got_partition = {frozenset(c) for c in got.get(p, {}).values()}
        assert got_partition == want_partition, (
            f"{p}: {len(got_partition)} vs {len(want_partition)} clusters; "
            f"diff e.g. {sorted(map(sorted, got_partition - want_partition))[:1]}"
        )


def test_python_similarity_matches_column_expression(spark):
    rows = load_fixture()[:40]
    pairs = [
        (a["head"], a["atoms"], b["head"], b["atoms"])
        for i, a in enumerate(rows)
        for b in rows[i + 1:i + 4]
    ]
    df = spark.createDataFrame(
        pairs,
        "ha string, aa array<string>, hb string, ab array<string>",
    )
    col = df.select(
        all_atoms_similarity(
            F.col("ha"), F.col("aa"), F.col("hb"), F.col("ab")
        ).alias("sim")
    ).collect()
    for (ha, aa, hb, ab), r in zip(pairs, col):
        py = _py_all_atoms_sim((ha, tuple(aa)), (hb, tuple(ab)))
        assert py == pytest.approx(r["sim"], abs=1e-12), (ha, aa, hb, ab)


def test_tree_clustering_bound(spark):
    df = spark.createDataFrame(
        [("?a|p|?b", ["?a|q|?b"])] * 3, "head string, atoms array<string>"
    )
    with pytest.raises(ValueError, match="max_rules"):
        tree_dbscan_clusters_resolved(df, max_rules=2)


def test_tree_clustering_within_cluster_similarity_law(spark):
    """Every member of a cluster joined because its similarity to the
    cluster (mainElem, deepSim=False) was >= threshold at insertion —
    check the resulting invariant: each non-main member has sim >=
    threshold to the cluster's first (main) element."""
    rows = load_fixture()
    df = spark.createDataFrame(
        [(r["head"], r["atoms"], r["p"], r["pos"]) for r in rows],
        "head string, atoms array<string>, p string, pos int",
    )
    out = tree_dbscan_clusters_resolved(df, order_cols=["p", "pos"])
    clusters: dict[int, list] = {}
    for r in out.orderBy("p", "pos").collect():
        clusters.setdefault(r["cluster"], []).append(
            (r["head"], tuple(r["atoms"]))
        )
    n_multi = 0
    for members in clusters.values():
        main = members[0]
        for m in members[1:]:
            n_multi += 1
            assert _py_all_atoms_sim(main, m) >= 0.8 - 1e-12
    assert n_multi > 100  # the fixture has substantial multi-member clusters
