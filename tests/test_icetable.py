"""IceTable: snapshot commits, manifest pruning, time travel, concurrency,
exactly-once idempotency, per-partition lineage metrics.

Reference analog: the binary cache/durable index artifacts
(core:data/ops/Cacheable.scala, core:index/ops/Cacheable.scala:29-70);
north-star: "read an Iceberg table of interleaved text+media documents",
"resumable from checkpoint with per-partition lineage and metrics".
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from rdfrules_spark.sources.icetable import (
    CommitConflictError,
    IceTable,
    write_triple_store_ice,
)

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "event_type", "value"
    )


@pytest.fixture()
def table(spark, tmp_path):
    ev = _events(spark)
    t = IceTable.create(
        spark,
        str(tmp_path / "tbl"),
        ev.schema,
        partition_by=["event_type"],
    )
    return t


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_append_scan_roundtrip(spark, table):
    ev = _events(spark)
    table.append(ev)
    assert _rows(table.scan()) == _rows(ev)
    # schema preserved exactly (partition col is IN the data files)
    assert table.scan().schema == ev.schema


def test_partition_pruning_skips_files(spark, table):
    ev = _events(spark)
    table.append(ev)
    all_files = table.plan_files()
    clicks = table.plan_files(filters=[("event_type", "=", "click")])
    assert 0 < len(clicks) < len(all_files)
    assert all(e["partition"]["event_type"] == "click" for e in clicks)
    got = table.scan(filters=[("event_type", "=", "click")])
    want = ev.where(F.col("event_type") == "click")
    assert _rows(got) == _rows(want)


def test_minmax_pruning_on_data_column(spark, table):
    ev = _events(spark)
    # two commits with disjoint value ranges -> bounds separate the files
    table.append(ev.where(F.col("value") < 100.0))
    table.append(ev.where(F.col("value") >= 100.0))
    lo = table.plan_files(filters=[("value", "<", 50.0)])
    hi = table.plan_files(filters=[("value", ">=", 100.0)])
    assert lo and hi
    lo_paths = {e["path"] for e in lo}
    hi_paths = {e["path"] for e in hi}
    assert not (lo_paths & hi_paths)  # range pruning separated the commits
    got = table.scan(filters=[("value", ">=", 100.0)])
    assert _rows(got) == _rows(ev.where(F.col("value") >= 100.0))


def test_in_and_notnull_filters(spark, table):
    ev = _events(spark)
    table.append(ev)
    kinds = ["click", "view"]
    got = table.scan(filters=[("event_type", "in", kinds)])
    assert _rows(got) == _rows(ev.where(F.col("event_type").isin(kinds)))
    got = table.scan(filters=[("value", "notnull", None)])
    assert _rows(got) == _rows(ev.where(F.col("value").isNotNull()))


def test_overwrite_and_time_travel(spark, table):
    ev = _events(spark)
    first = ev.limit(10)
    s1 = table.append(first)
    s2 = table.overwrite(ev)
    assert s2["parent-snapshot-id"] == s1["snapshot-id"]
    assert table.scan().count() == ev.count()
    # by snapshot id
    assert _rows(table.scan(snapshot_id=s1["snapshot-id"])) == _rows(first)
    # by timestamp
    assert (
        table.scan(as_of_ms=s1["timestamp-ms"]).count() == first.count()
    )
    # before any snapshot -> empty, schema intact
    empty = table.scan(as_of_ms=s1["timestamp-ms"] - 10_000)
    assert empty.count() == 0 and empty.schema == ev.schema
    assert [h["snapshot-id"] for h in table.history()] == [
        s1["snapshot-id"],
        s2["snapshot-id"],
    ]


def test_append_accumulates(spark, table):
    ev = _events(spark)
    a = ev.where(F.col("value") < 100.0)
    b = ev.where(F.col("value") >= 100.0)
    table.append(a)
    table.append(b)
    assert _rows(table.scan()) == _rows(ev)


def test_idempotency_key_is_exactly_once(spark, table):
    ev = _events(spark)
    s1 = table.append(ev.limit(5), idempotency_key="batch-0")
    s2 = table.append(ev.limit(5), idempotency_key="batch-0")
    assert s1 and s2 == {}  # second commit is a no-op
    assert len(table.snapshots()) == 1
    assert table.scan().count() == 5
    assert (
        table.snapshots()[0]["summary"]["idempotency-key"] == "batch-0"
    )


def test_commit_conflict_retries_metadata_only(spark, table, monkeypatch):
    """Simulate losing the metadata race once: the commit retries against
    the new base and still lands (data files written exactly once)."""
    ev = _events(spark)
    table.append(ev.limit(3))
    real_metadata = IceTable.metadata
    state = {"stolen": False}

    def racing_metadata(self):
        meta = real_metadata(self)
        if not state["stolen"]:
            state["stolen"] = True
            # another writer swings v{N+1} between our read and our write
            v = self._current_version()
            import copy

            m2 = copy.deepcopy(meta)
            m2["properties"]["raced"] = "yes"
            with open(
                os.path.join(self.meta_dir, f"v{v + 1}.metadata.json"),
                "w",
            ) as f:
                json.dump(m2, f)
        return meta

    monkeypatch.setattr(IceTable, "metadata", racing_metadata)
    snap = table.append(ev.limit(7))
    monkeypatch.setattr(IceTable, "metadata", real_metadata)
    assert snap["operation"] == "append"
    assert table.scan().count() == 10
    # the raced version survived and ours landed after it
    assert table.metadata()["properties"].get("raced") == "yes"


def test_conflict_exhaustion_raises(spark, table, monkeypatch):
    ev = _events(spark)

    def always_excl_fail(path, payload):
        if "metadata.json" in path and "manifest" not in path:
            raise FileExistsError(path)
        with open(path, "w") as f:
            f.write(payload)

    import rdfrules_spark.sources.icetable as mod

    monkeypatch.setattr(mod, "_excl_write", always_excl_fail)
    with pytest.raises(CommitConflictError):
        table.append(ev.limit(1))


def test_snapshot_summary_lineage_metrics(spark, table):
    ev = _events(spark)
    snap = table.append(ev)
    summ = snap["summary"]
    assert summ["added-records"] == ev.count()
    assert summ["added-files"] == len(table.plan_files())
    # per-partition record counts == groupBy on the source
    want = {
        json.dumps({"event_type": r["event_type"]},
                   sort_keys=True, separators=(",", ":")): r["n"]
        for r in ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert summ["partition-records"] == want


def test_expire_snapshots_removes_orphans(spark, table):
    ev = _events(spark)
    table.append(ev.limit(10))
    table.overwrite(ev.limit(20))
    n_before = sum(
        fn.endswith(".parquet")
        for _r, _d, fs in os.walk(table.data_dir)
        for fn in fs
    )
    removed = table.expire_snapshots(keep_last=1)
    assert removed > 0
    n_after = sum(
        fn.endswith(".parquet")
        for _r, _d, fs in os.walk(table.data_dir)
        for fn in fs
    )
    assert n_after < n_before
    assert len(table.snapshots()) == 1
    assert table.scan().count() == 20  # current snapshot untouched


def test_schema_mismatch_rejected(spark, table):
    ev = _events(spark).drop("value")
    with pytest.raises(ValueError, match="schema mismatch"):
        table.append(ev)


def test_documents_ice_feed_extraction(spark, tmp_path):
    """North-star input path: interleaved documents AS an Iceberg table,
    extraction runs over table.scan() identically to the direct frame."""
    from rdfrules_spark.corpus import synth_documents
    from rdfrules_spark.extraction import extract_statements

    docs = synth_documents(spark, n_docs=200, n_entities=50)
    t = IceTable.create(
        spark, str(tmp_path / "docs"), docs.schema, partition_by=[]
    )
    t.append(docs, idempotency_key="ingest-0")
    direct = extract_statements(docs)
    via_ice = extract_statements(t.scan())
    assert _rows(direct) == _rows(via_ice)


def test_triple_store_ice_resume(spark, tmp_path):
    """write_triple_store_ice: pred_bucket partitioning, per-partition
    metrics, and the idempotency key makes a re-run a free resume."""
    from rdfrules_spark.dictionary import encode_triples

    ev = _events(spark)
    triples_str = ev.select(
        F.concat(F.lit("event:"), F.col("event_id")).alias("s"),
        F.col("event_type").alias("p"),
        F.concat(F.lit("user:"), F.col("user_id")).alias("o"),
    )
    triples = encode_triples(triples_str).distinct()
    path = str(tmp_path / "store")
    t = write_triple_store_ice(triples, path, idempotency_key="stage-1")
    assert _rows(t.scan()) == _rows(triples)
    v_before = t._current_version()
    write_triple_store_ice(triples, path, idempotency_key="stage-1")
    assert t._current_version() == v_before  # resumed, no new commit
    # pruned per-bucket scan reads a strict file subset
    bucket = triples.select("pred_bucket").first()["pred_bucket"]
    sub = t.plan_files(filters=[("pred_bucket", "=", bucket)])
    assert 0 < len(sub) < len(t.plan_files())


def test_uri_partition_values_prune_correctly(spark, tmp_path):
    """Partition values containing characters Spark hive-escapes in dir
    names (URIs: '/', ':') must round-trip through the manifest — before
    the _hive_unescape fix, pruning compared the escaped form and
    silently dropped every file of the partition."""
    rows = [("a", "http://ex.org/knows", "b"),
            ("c", "http://ex.org/knows", "d"),
            ("e", "http://ex.org/likes", "f")]
    df = spark.createDataFrame(rows, "s string, p string, o string")
    t = IceTable.create(
        spark, str(tmp_path / "uri_part"), df.schema, partition_by=["p"]
    )
    t.append(df)
    plan = t.plan_files(filters=[("p", "=", "http://ex.org/knows")])
    assert plan and all(
        e["partition"]["p"] == "http://ex.org/knows" for e in plan
    )
    got = t.scan(filters=[("p", "=", "http://ex.org/knows")])
    assert got.count() == 2
    assert t.scan(filters=[("p", "in", ["http://ex.org/likes"])]).count() == 1


def test_concurrent_snapshot_is_never_lost(spark, table, monkeypatch):
    """Lost-update guard: a snapshot committed by another writer between
    our metadata read and our version swing must survive (the commit
    retries against the NEW base; before the captured-version fix it
    could be silently dropped)."""
    ev = _events(spark)
    table.append(ev.limit(3))
    real_vm = IceTable._versioned_metadata
    state = {"stolen": False}

    def racing_vm(self):
        v, meta = real_vm(self)
        if not state["stolen"]:
            state["stolen"] = True
            import copy

            m2 = copy.deepcopy(meta)
            theirs = copy.deepcopy(m2["snapshots"][-1])
            theirs["snapshot-id"] = "theirs-123"
            theirs["summary"] = {"idempotency-key": "theirs"}
            m2["snapshots"].append(theirs)
            m2["current-snapshot-id"] = "theirs-123"
            with open(
                os.path.join(self.meta_dir, f"v{v + 1}.metadata.json"),
                "w",
            ) as f:
                json.dump(m2, f)
        return v, meta

    monkeypatch.setattr(IceTable, "_versioned_metadata", racing_vm)
    table.append(ev.limit(7))
    monkeypatch.setattr(IceTable, "_versioned_metadata", real_vm)
    ids = [s["snapshot-id"] for s in table.snapshots()]
    assert "theirs-123" in ids  # the raced snapshot survived
    assert len(ids) == 3
