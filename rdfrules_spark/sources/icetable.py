"""Iceberg-shaped table format: snapshot metadata + manifest file stats on
parquet, pure-Python metadata layer, Spark data plane.

North-star requirement (BASELINE.json): "read an Iceberg table of
interleaved text+media documents" and "materialize (subj, pred, obj)
triples into a partitioned, skew-aware triple store ... resumable from
checkpoint with per-partition lineage and metrics". The reference's analog
of the metadata-tracked store is its compressed triple index + binary cache
(core:index/ops/Cacheable.scala:29-70, core:data/ops/Cacheable.scala) —
a single-node serialized artifact; at cluster scale the idiomatic
replacement is an Iceberg-style table: immutable parquet data files,
JSON snapshot metadata, manifest-level column statistics, optimistic
atomic commits, and time travel.

Layout (structurally mirrors the Apache Iceberg spec; manifests are JSON
rather than Avro — this container has no Avro writer, and the spec's
*content* — per-file partition values, record counts, column bounds — is
what enables pruning, not its container format):

    <table>/
      metadata/version-hint.text        -> current metadata version N
      metadata/v{N}.metadata.json       -> schema, partition spec,
                                           snapshots + lineage log
      metadata/manifest-{snap}.json     -> data-file entries + stats
      data/snap-{uuid}/...              -> parquet, one dir per commit

Design decisions, all for the 100 TB posture:

  * Data files are immutable and commit-scoped (each commit writes into a
    fresh ``data/snap-{uuid}/`` dir), so a failed/conflicted commit leaves
    only unreferenced files — never corrupt table state. Commits are
    optimistic: the ``v{N+1}.metadata.json`` create is O_EXCL, the loser
    re-reads and retries METADATA ONLY (its data files and manifest are
    already on disk and reusable).
  * Partition layout uses dir columns ``__p_<col>=value`` while KEEPING the
    partition column in the data files, so a planned scan reads an explicit
    file list with a stable schema — no partition-discovery pass over the
    directory tree (at millions of files, directory listing is the
    bottleneck Iceberg exists to remove).
  * Per-file column bounds (min/max/null-count) come from the parquet
    FOOTERS of the just-written files. Footer harvesting is itself
    distributed (``mapInPandas`` over the file list) past a small-table
    gate — a million-file commit must not serialize footer reads on the
    driver.
  * Scan planning prunes twice: partition values (exact) then column
    bounds (range), and ALWAYS re-applies the full predicate on the
    surviving rows — pruning is a performance contract, never a
    correctness dependency.
  * Snapshot summaries carry per-partition record counts (the north-star's
    per-partition lineage/metrics) and an optional ``idempotency_key`` —
    a re-commit with a key the table has already seen is a no-op, which is
    exactly-once for streaming ``foreachBatch`` writers and free resume
    for checkpointed batch stages.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FOOTER_DRIVER_GATE = 64  # files; above this, harvest footers distributedly

_OPS = ("=", "!=", "<", "<=", ">", ">=", "in", "notnull")


class CommitConflictError(RuntimeError):
    """Another writer committed the same metadata version first."""


def _canon(obj) -> str:
    return json.dumps(obj, sort_keys=True, separators=(",", ":"))


def _atomic_write(path: str, payload: str) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(payload)
    os.replace(tmp, path)


def _excl_write(path: str, payload: str) -> None:
    """Create-exclusive write: the commit point of the optimistic
    protocol. The payload is fully written to a temp file first and
    hard-linked into place — link(2) is atomic in existence AND content,
    so a crash can never leave a torn metadata file that a reader's
    version roll-forward would trip over (plain O_EXCL create-then-write
    could)."""
    tmp = f"{path}.commit.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)  # FileExistsError = lost the race -> caller retries
    finally:
        os.remove(tmp)


def _json_safe(v):
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    return str(v)


def _harvest_footer(path: str) -> dict:
    """One file's manifest entry fields from its parquet footer only."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested (struct/array) — no top-level bounds
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                # ANY stats-less row group poisons the file's bounds: a
                # partial bound would prune rows it never saw
                mins[name] = maxs[name] = None
                continue
            lo, hi = _json_safe(st.min), _json_safe(st.max)
            if name not in mins:
                mins[name], maxs[name] = lo, hi
            elif mins[name] is not None:
                mins[name] = min(mins[name], lo)
                maxs[name] = max(maxs[name], hi)
            if st.null_count is not None:
                nulls[name] = nulls.get(name, 0) + st.null_count
    return {
        "record_count": md.num_rows,
        "file_size_bytes": os.path.getsize(path),
        "lower_bounds": mins,
        "upper_bounds": maxs,
        "null_counts": nulls,
    }


def _harvest_footers(
    spark: SparkSession, paths: list[str]
) -> dict[str, dict]:
    """Footer stats for every path; distributed past the driver gate."""
    if len(paths) <= _FOOTER_DRIVER_GATE:
        return {p: _harvest_footer(p) for p in paths}

    schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("entry_json", T.StringType()),
        ]
    )

    def read_batch(iterator):
        import pandas as pd

        for pdf in iterator:
            out = [
                (p, json.dumps(_harvest_footer(p))) for p in pdf["path"]
            ]
            yield pd.DataFrame(out, columns=["path", "entry_json"])

    n_slices = min(len(paths), spark.sparkContext.defaultParallelism)
    pdf = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).repartition(n_slices)
    rows = pdf.mapInPandas(read_batch, schema).collect()
    return {r["path"]: json.loads(r["entry_json"]) for r in rows}


_HIVE_ESC_RE = None  # compiled lazily (module import stays light)


def _hive_unescape(v: str) -> str | None:
    """Invert Hive/Spark partition-dir escaping: '%XX' hex sequences
    (escapePathName encodes '/', ':', '=', '#', '%', control chars, ...)
    and the null sentinel. Without this, a partition value that contains
    any escaped character (e.g. a URI-valued predicate column) would be
    stored escaped in the manifest and manifest pruning would wrongly
    drop every file of that partition."""
    global _HIVE_ESC_RE
    if v == "__HIVE_DEFAULT_PARTITION__":
        return None
    if "%" not in v:
        return v
    if _HIVE_ESC_RE is None:
        import re

        _HIVE_ESC_RE = re.compile("%([0-9A-Fa-f]{2})")
    return _HIVE_ESC_RE.sub(lambda m: chr(int(m.group(1), 16)), v)


def _partition_values(path: str, partition_by: list[str]) -> dict:
    """Parse ``__p_<col>=value`` dir segments back to partition values."""
    vals: dict = {}
    for seg in path.split(os.sep):
        if "=" in seg and seg.startswith("__p_"):
            k, v = seg.split("=", 1)
            vals[k[len("__p_"):]] = _hive_unescape(v)
    return {c: vals.get(c) for c in partition_by}


class IceTable:
    """A snapshot-versioned parquet table with manifest-pruned scans."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.meta_dir = os.path.join(path, "metadata")
        self.data_dir = os.path.join(path, "data")

    # ----------------------------------------------------------- lifecycle

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        partition_by: list[str] | None = None,
        properties: dict | None = None,
    ) -> "IceTable":
        t = cls(spark, path)
        os.makedirs(t.meta_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        for c in partition_by or []:
            if c not in schema.names:
                raise ValueError(f"partition column {c!r} not in schema")
        meta = {
            "format-version": 2,
            "table-uuid": uuid.uuid4().hex,
            "location": path,
            "schema": schema.jsonValue(),
            "partition-spec": list(partition_by or []),
            "properties": properties or {},
            "current-snapshot-id": None,
            "snapshots": [],
            "snapshot-log": [],
        }
        _excl_write(
            os.path.join(t.meta_dir, "v1.metadata.json"), _canon(meta)
        )
        _atomic_write(os.path.join(t.meta_dir, "version-hint.text"), "1")
        return t

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IceTable":
        t = cls(spark, path)
        t._current_version()  # raises if absent
        return t

    def _current_version(self) -> int:
        hint = os.path.join(self.meta_dir, "version-hint.text")
        with open(hint) as f:
            v = int(f.read().strip())
        # the hint is advisory (Iceberg HadoopTableOperations semantics):
        # roll forward past it if a higher committed version exists
        while os.path.exists(
            os.path.join(self.meta_dir, f"v{v + 1}.metadata.json")
        ):
            v += 1
        return v

    def _versioned_metadata(self) -> tuple[int, dict]:
        """(version, metadata) captured from ONE version resolution — the
        optimistic protocol is only sound if the base version and the
        snapshot list it swings from come from the same read (a separate
        re-read of the version could absorb a concurrent commit and
        silently drop its snapshot: lost update)."""
        v = self._current_version()
        with open(
            os.path.join(self.meta_dir, f"v{v}.metadata.json")
        ) as f:
            return v, json.load(f)

    def metadata(self) -> dict:
        return self._versioned_metadata()[1]

    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.metadata()["schema"])

    def snapshots(self) -> list[dict]:
        return self.metadata()["snapshots"]

    def history(self) -> list[dict]:
        return self.metadata()["snapshot-log"]

    # ------------------------------------------------------------- commits

    def _write_data(
        self, df: DataFrame, partition_by: list[str]
    ) -> tuple[str, list[dict]]:
        """Write ``df`` into a fresh commit-scoped dir; return its manifest
        entries (path, partition values, footer stats)."""
        snap_dir = os.path.join(self.data_dir, f"snap-{uuid.uuid4().hex}")
        writer = df
        dir_cols = []
        for c in partition_by:
            # dir column keeps the real column inside the data files, so a
            # planned scan needs no partition discovery (module docstring)
            dc = f"__p_{c}"
            writer = writer.withColumn(dc, F.col(c).cast("string"))
            dir_cols.append(dc)
        w = writer.write.mode("errorifexists")
        if dir_cols:
            w = w.partitionBy(*dir_cols)
        w.parquet(snap_dir)

        paths = []
        for root, _dirs, files in os.walk(snap_dir):
            for fn in files:
                if fn.endswith(".parquet"):
                    paths.append(os.path.join(root, fn))
        stats = _harvest_footers(self.spark, sorted(paths))
        entries = [
            {
                "path": p,
                "partition": _partition_values(p, partition_by),
                **stats[p],
            }
            for p in sorted(paths)
        ]
        return snap_dir, entries

    def _commit(
        self,
        entries: list[dict],
        operation: str,
        summary: dict,
        idempotency_key: str | None,
        retries: int = 10,
    ) -> dict:
        """Optimistic-concurrency metadata swing; retries metadata only."""
        manifest_name = f"manifest-{uuid.uuid4().hex}.json"
        _excl_write(
            os.path.join(self.meta_dir, manifest_name), _canon(entries)
        )
        for _ in range(retries):
            v, meta = self._versioned_metadata()
            if idempotency_key is not None and any(
                s["summary"].get("idempotency-key") == idempotency_key
                for s in meta["snapshots"]
            ):
                return {}  # exactly-once: this commit already landed
            prev = None
            live: list[str] = []
            if meta["current-snapshot-id"] is not None:
                prev = next(
                    s
                    for s in meta["snapshots"]
                    if s["snapshot-id"] == meta["current-snapshot-id"]
                )
                live = list(prev["manifest-list"])
            if operation == "overwrite":
                live = [manifest_name]
            else:
                live = live + [manifest_name]
            snap = {
                "snapshot-id": uuid.uuid4().hex,
                "parent-snapshot-id": prev["snapshot-id"] if prev else None,
                "timestamp-ms": int(time.time() * 1000),
                "operation": operation,
                "manifest-list": live,
                "summary": dict(
                    summary,
                    **(
                        {"idempotency-key": idempotency_key}
                        if idempotency_key is not None
                        else {}
                    ),
                ),
            }
            meta["snapshots"].append(snap)
            meta["current-snapshot-id"] = snap["snapshot-id"]
            meta["snapshot-log"].append(
                {
                    "timestamp-ms": snap["timestamp-ms"],
                    "snapshot-id": snap["snapshot-id"],
                }
            )
            try:
                _excl_write(
                    os.path.join(
                        self.meta_dir, f"v{v + 1}.metadata.json"
                    ),
                    _canon(meta),
                )
            except FileExistsError:
                continue  # lost the race: re-read metadata, retry swing
            _atomic_write(
                os.path.join(self.meta_dir, "version-hint.text"),
                str(v + 1),
            )
            return snap
        raise CommitConflictError(
            f"gave up after {retries} optimistic retries at {self.path}"
        )

    def _summarize(self, entries: list[dict], partition_by: list[str]):
        per_part: dict[str, int] = {}
        for e in entries:
            key = _canon(e["partition"]) if partition_by else "<table>"
            per_part[key] = per_part.get(key, 0) + e["record_count"]
        return {
            "added-files": len(entries),
            "added-records": sum(e["record_count"] for e in entries),
            "added-bytes": sum(e["file_size_bytes"] for e in entries),
            "partition-records": per_part,
        }

    def _commit_data(
        self, df: DataFrame, operation: str, idempotency_key: str | None
    ) -> dict:
        meta = self.metadata()
        if idempotency_key is not None and any(
            s["summary"].get("idempotency-key") == idempotency_key
            for s in meta["snapshots"]
        ):
            return {}  # short-circuit BEFORE writing data: free resume
        want = [f.name for f in self.schema().fields]
        got = df.columns
        if sorted(got) != sorted(want):
            raise ValueError(
                f"schema mismatch: table has {want}, commit has {got}"
            )
        partition_by = meta["partition-spec"]
        _snap_dir, entries = self._write_data(
            df.select(*want), partition_by
        )
        return self._commit(
            entries,
            operation,
            self._summarize(entries, partition_by),
            idempotency_key,
        )

    def append(
        self, df: DataFrame, idempotency_key: str | None = None
    ) -> dict:
        return self._commit_data(df, "append", idempotency_key)

    def overwrite(
        self, df: DataFrame, idempotency_key: str | None = None
    ) -> dict:
        return self._commit_data(df, "overwrite", idempotency_key)

    # --------------------------------------------------------------- scans

    def _snapshot(
        self, snapshot_id: str | None, as_of_ms: int | None
    ) -> dict | None:
        meta = self.metadata()
        snaps = meta["snapshots"]
        if snapshot_id is not None:
            for s in snaps:
                if s["snapshot-id"] == snapshot_id:
                    return s
            raise KeyError(f"no snapshot {snapshot_id}")
        if as_of_ms is not None:
            past = [s for s in snaps if s["timestamp-ms"] <= as_of_ms]
            if not past:
                return None
            return max(past, key=lambda s: s["timestamp-ms"])
        if meta["current-snapshot-id"] is None:
            return None
        return next(
            s
            for s in snaps
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )

    def _entries(self, snap: dict) -> list[dict]:
        out: list[dict] = []
        for m in snap["manifest-list"]:
            with open(os.path.join(self.meta_dir, m)) as f:
                out.extend(json.load(f))
        return out

    @staticmethod
    def _coerce(bound, like):
        """Coerce a manifest bound (partition-dir bounds are strings) to the
        filter literal's type; None = not coercible -> cannot prune."""
        if bound is None or like is None:
            return None
        try:
            if isinstance(like, bool):
                return str(bound).lower() == "true"
            if isinstance(like, int):
                return int(bound)
            if isinstance(like, float):
                return float(bound)
        except (TypeError, ValueError):
            return None
        return str(bound)

    def _file_may_match(self, e: dict, flt: tuple) -> bool:
        """Conservative: False ONLY when the file provably has no match."""
        col, op, val = flt
        if op not in _OPS:
            raise ValueError(f"unsupported op {op!r} (use one of {_OPS})")
        if op == "notnull":
            nc = e["null_counts"].get(col)
            return not (nc is not None and nc == e["record_count"])
        like = (val[0] if val else None) if op == "in" else val
        part = e["partition"]
        if col in part:  # partition value: exact, lo == hi
            lo = hi = self._coerce(part[col], like)
        else:
            lo = self._coerce(e["lower_bounds"].get(col), like)
            hi = self._coerce(e["upper_bounds"].get(col), like)
        if lo is None or hi is None:
            return True  # no usable bounds -> cannot prune
        if op == "=":
            return lo <= val <= hi
        if op == "!=":
            return not (lo == hi == val)
        if op == "<":
            return lo < val
        if op == "<=":
            return lo <= val
        if op == ">":
            return hi > val
        if op == ">=":
            return hi >= val
        return any(lo <= v <= hi for v in val)  # "in"

    def plan_files(
        self,
        filters: list[tuple] | None = None,
        snapshot_id: str | None = None,
        as_of_ms: int | None = None,
    ) -> list[dict]:
        """Manifest-pruned file plan (the scan's physical file list)."""
        snap = self._snapshot(snapshot_id, as_of_ms)
        if snap is None:
            return []
        entries = self._entries(snap)
        for flt in filters or []:
            entries = [
                e for e in entries if self._file_may_match(e, flt)
            ]
        return entries

    @staticmethod
    def _residual(filters: list[tuple]):
        cond = F.lit(True)
        for col, op, val in filters:
            c = F.col(col)
            cond = cond & {
                "=": lambda: c == val,
                "!=": lambda: c != val,
                "<": lambda: c < val,
                "<=": lambda: c <= val,
                ">": lambda: c > val,
                ">=": lambda: c >= val,
                "in": lambda: c.isin(list(val)),
                "notnull": lambda: c.isNotNull(),
            }[op]()
        return cond

    def scan(
        self,
        filters: list[tuple] | None = None,
        snapshot_id: str | None = None,
        as_of_ms: int | None = None,
    ) -> DataFrame:
        """DataFrame over the pruned file plan; the FULL predicate is
        re-applied on the surviving rows (pruning is perf, not truth)."""
        plan = self.plan_files(filters, snapshot_id, as_of_ms)
        schema = self.schema()
        if not plan:
            return self.spark.createDataFrame([], schema)
        df = self.spark.read.schema(schema).parquet(
            *[e["path"] for e in plan]
        )
        if filters:
            df = df.where(self._residual(filters))
        return df

    # --------------------------------------------------------- maintenance

    def expire_snapshots(self, keep_last: int = 1) -> int:
        """Drop all but the newest ``keep_last`` snapshots and delete data
        files + manifests no surviving snapshot references. Metadata swing
        uses the same captured-version optimistic protocol as _commit
        (a concurrent commit between read and write -> clean conflict,
        never a lost update)."""
        v, meta = self._versioned_metadata()
        snaps = sorted(meta["snapshots"], key=lambda s: s["timestamp-ms"])
        keep = snaps[-keep_last:] if keep_last > 0 else []
        keep_ids = {s["snapshot-id"] for s in keep}
        if meta["current-snapshot-id"] is not None:
            keep_ids.add(meta["current-snapshot-id"])
        keep = [s for s in snaps if s["snapshot-id"] in keep_ids]
        dead = [s for s in snaps if s["snapshot-id"] not in keep_ids]
        if not dead:
            return 0
        live_manifests = {m for s in keep for m in s["manifest-list"]}
        live_files = set()
        for m in live_manifests:
            with open(os.path.join(self.meta_dir, m)) as f:
                live_files.update(e["path"] for e in json.load(f))
        removed = 0
        meta["snapshots"] = keep
        meta["snapshot-log"] = [
            ln
            for ln in meta["snapshot-log"]
            if ln["snapshot-id"] in keep_ids
        ]
        # swing the metadata FIRST: on conflict nothing has been deleted;
        # after the swing the dead snapshots are unreachable, so orphan
        # deletion below can never break a reachable time travel
        try:
            _excl_write(
                os.path.join(self.meta_dir, f"v{v + 1}.metadata.json"),
                _canon(meta),
            )
        except FileExistsError as e:
            raise CommitConflictError(
                f"concurrent commit during expire at {self.path}"
            ) from e
        _atomic_write(
            os.path.join(self.meta_dir, "version-hint.text"), str(v + 1)
        )
        for s in dead:
            for m in s["manifest-list"]:
                if m in live_manifests:
                    continue
                mp = os.path.join(self.meta_dir, m)
                if not os.path.exists(mp):
                    continue
                with open(mp) as f:
                    for e in json.load(f):
                        if e["path"] not in live_files and os.path.exists(
                            e["path"]
                        ):
                            os.remove(e["path"])
                            removed += 1
                os.remove(mp)
        return removed


# ------------------------------------------------------------ convenience


def write_triple_store_ice(
    triples: DataFrame, path: str, idempotency_key: str | None = None
) -> IceTable:
    """Materialize the encoded triple store (dictionary.encode_triples
    output) as an IceTable partitioned by pred_bucket — the snapshot
    summary carries the per-partition record counts (north-star lineage
    metrics), and re-running with the same idempotency key is a no-op."""
    spark = triples.sparkSession
    if os.path.exists(os.path.join(path, "metadata")):
        t = IceTable.load(spark, path)
    else:
        t = IceTable.create(
            spark, path, triples.schema, partition_by=["pred_bucket"]
        )
    t.overwrite(triples, idempotency_key=idempotency_key)
    return t
