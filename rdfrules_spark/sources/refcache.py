"""Reference binary ``.cache`` reader/writer — interop with the reference
product's own on-disk cache artifacts.

Wire format (reference core:utils/serialization/Serializer.scala:24-33,
Deserializer.scala:25-46, NumericByteArray.scala): every AnyRef value is
framed as ``[int32 BE length][payload]``; numbers and booleans are raw
fixed-width big-endian (no frame).

- **Dataset cache** (core:data/ops/Cacheable.scala:68-72, core:data/formats/
  Cache.scala, serialization/QuadSerialization.scala): a stream of Quad
  frames; quad payload = frame(graph TripleItem) + frame(triple); triple
  payload = frame(s) + frame(p) + frame(o) (TripleSerialization.scala:18-33);
  TripleItem payload = 1 type-tag byte + fields
  (TripleItemSerialization.scala:15-60, tags 1..12).
- **Index cache** (core:index/ops/Cacheable.scala:25-45,
  serialization/IndexItemSerialization.scala): a stream of SerItem frames —
  tag 0 = dictionary entry ``(TripleItem, int32 id)``, tag 1 = part marker
  (frame-wrapped byte: 0 Train / 1 Test), tag 2 = fixed 16-byte int quad
  ``(s, p, o, g)`` of dictionary ids.

Scale posture: one ``.cache`` file is a sequential length-prefixed stream
with no sync markers, so (like the reference's own single-threaded reader)
it parses on ONE task; a directory/glob of cache files parallelizes
per-file. Files are read through ``binaryFile`` (hard 2 GiB/file Spark
limit — a larger artifact fails loudly at scan time, not silently).
Writing streams through ``toLocalIterator`` on the driver, mirroring the
reference's single OutputStream writer; both bounds are inherent to the
reference's own format, not to this engine (native caching uses parquet —
rdfrules_spark/checkpointing.py).

String rendering matches this engine's canonical TSV forms
(sources/tsv.py): URIs bracket-less, Text quoted, BlankNode ``_:id``,
numbers/booleans lexical, Interval ``[lo;hi)`` compact
(operators/discretize.py interval_literal).
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdfrules_spark.dictionary import term_kind

_INT = struct.Struct(">i")


def _java_num_str(x: float) -> str:
    """Java Double.toString-style rendering (shortest round-trip repr with
    E-notation outside [1e-3, 1e7), always a decimal point)."""
    if x != x or x in (float("inf"), float("-inf")):
        return {float("inf"): "Infinity", float("-inf"): "-Infinity"}.get(
            x, "NaN"
        )
    a = abs(x)
    r = repr(x)
    if 1e-3 <= a < 1e7 or x == 0.0:
        return r if ("." in r and "e" not in r) else format(x, ".1f")
    # E-notation ranges. Java switches at [1e-3, 1e7) but Python repr at
    # [1e-4, 1e16): in [1e7, 1e16) and [1e-4, 1e-3) the repr is PLAIN
    # decimal, so the digit string + exponent must be derived, not just
    # re-punctuated (partition('e') used to crash here on e.g. 4.138e11).
    neg = r.startswith("-")
    rr = r.lstrip("-")
    mant_s, _, exp_s = rr.partition("e")
    exp = int(exp_s) if exp_s else 0
    point = mant_s.find(".")
    int_len = point if point >= 0 else len(mant_s)
    digits = mant_s.replace(".", "")
    sig = digits.lstrip("0")
    e10 = int_len - (len(digits) - len(sig)) - 1 + exp
    sig = sig.rstrip("0") or "0"
    mant = sig[0] + "." + (sig[1:] or "0")
    return ("-" if neg else "") + mant + "E" + str(e10)


def _read_frame(buf: bytes, pos: int) -> tuple[bytes, int]:
    (n,) = _INT.unpack_from(buf, pos)
    pos += 4
    return buf[pos : pos + n], pos + n


def _item_to_str(
    payload: bytes, strip_brackets: bool = True
) -> tuple[str, str]:
    """Decode one TripleItem payload -> (canonical string, kind).
    Tags per TripleItemSerialization.scala:15-28."""
    tag = payload[0]
    pos = 1
    if tag == 1:  # LongUri — Raw-mode TSV keeps the raw lexical form
        s, _ = _read_frame(payload, pos)
        u = s.decode("utf-8")
        if strip_brackets and u.startswith("<") and u.endswith(">"):
            u = u[1:-1]
        return u, "uri"
    if tag == 2:  # PrefixedUri(prefix, nameSpace, localName) -> full URI
        _, pos = _read_frame(payload, pos)
        ns, pos = _read_frame(payload, pos)
        ln, _ = _read_frame(payload, pos)
        return ns.decode("utf-8") + ln.decode("utf-8"), "uri"
    if tag == 3:  # BlankNode
        s, _ = _read_frame(payload, pos)
        return "_:" + s.decode("utf-8"), "uri"
    if tag == 4:  # Text -> quoted (engine keeps raw quoted literals)
        s, _ = _read_frame(payload, pos)
        return '"' + s.decode("utf-8") + '"', "text"
    if tag in (5, 8, 9, 10):  # Int / Long / Short / Byte
        width = {5: 4, 8: 8, 9: 2, 10: 1}[tag]
        v = int.from_bytes(payload[pos : pos + width], "big", signed=True)
        return str(v), "number"
    if tag in (6, 7):  # Double / Float
        v = struct.unpack_from(">d" if tag == 6 else ">f", payload, pos)[0]
        return _java_num_str(float(v)), "number"
    if tag == 11:  # BooleanValue
        return ("true" if payload[pos] == 1 else "false"), "boolean"
    if tag == 12:  # Interval: bool lo_closed, double lo, bool hi_closed, double hi
        lc = payload[pos] == 1
        (lo,) = struct.unpack_from(">d", payload, pos + 1)
        hc = payload[pos + 9] == 1
        (hi,) = struct.unpack_from(">d", payload, pos + 10)
        return (
            ("[" if lc else "(")
            + _java_num_str(lo)
            + ";"
            + _java_num_str(hi)
            + ("]" if hc else ")")
        ), "interval"
    raise ValueError(f"unknown TripleItem tag {tag} in .cache stream")


def _parse_dataset(
    buf: bytes, strip_brackets: bool = True
) -> Iterator[tuple[str, str, str, str]]:
    """Yield (g, s, p, o) string quads from a dataset .cache byte stream."""
    pos, n = 0, len(buf)
    while pos < n:
        quad, pos = _read_frame(buf, pos)
        gp, qpos = _read_frame(quad, 0)
        g, _ = _item_to_str(gp, strip_brackets)
        triple, _ = _read_frame(quad, qpos)
        sp, tpos = _read_frame(triple, 0)
        pp, tpos = _read_frame(triple, tpos)
        op, _ = _read_frame(triple, tpos)
        yield (
            g,
            _item_to_str(sp, strip_brackets)[0],
            _item_to_str(pp, strip_brackets)[0],
            _item_to_str(op, strip_brackets)[0],
        )


def _parse_dataset_raw(buf: bytes) -> Iterator[tuple[str, str, str, str]]:
    return _parse_dataset(buf, strip_brackets=False)


def _parse_index(buf: bytes):
    """Yield SerItems from an index .cache stream: ("item", id, string,
    kind) | ("part", name) | ("quad", s, p, o, g)."""
    pos, n = 0, len(buf)
    while pos < n:
        rec, pos = _read_frame(buf, pos)
        tag = rec[0]
        if tag == 0:  # (0: Byte, TripleItem frame, int32 id)
            ip, rpos = _read_frame(rec, 1)
            (num,) = _INT.unpack_from(rec, rpos)
            s, kind = _item_to_str(ip)
            yield ("item", num, s, kind)
        elif tag == 1:  # (1: Byte, PartType frame)
            part, _ = _read_frame(rec, 1)
            yield ("part", "test" if part and part[0] == 1 else "train")
        elif tag == 2:  # (2: Byte, 16 raw bytes s p o g)
            s, p, o, g = struct.unpack_from(">iiii", rec, 1)
            yield ("quad", s, p, o, g)
        else:
            raise ValueError(f"unknown index SerItem tag {tag}")


def _per_file(spark: SparkSession, path: str, schema: str, gen):
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches):
        cols = [f.split()[0] for f in schema.split(",")]
        for pdf in batches:
            for content in pdf["content"]:
                yield pd.DataFrame(gen(bytes(content)), columns=cols)

    return files.mapInPandas(parse, schema)


def read_dataset_cache(
    spark: SparkSession, path: str, parse_uris: bool = True
) -> DataFrame:
    """Load a reference Dataset ``.cache`` -> quads(g, s, p, o, okind) in
    this engine's canonical string forms (equals read_tsv on the same
    source data; default graph renders as ""). ``parse_uris=False`` keeps
    every LongUri verbatim (brackets intact) — the byte-faithful Raw view,
    mirroring read_tsv(parse_uris=False)."""
    gen = _parse_dataset if parse_uris else _parse_dataset_raw
    df = _per_file(
        spark, path, "g string, s string, p string, o string", gen
    )
    return df.withColumn("okind", term_kind(F.col("o")))


def write_dataset_cache(df: DataFrame, path: str, raw: bool = False) -> None:
    """Write quads to the reference's Dataset ``.cache`` format so the
    reference product's ``Dataset.fromCache`` loads them (verified against
    the executed reference's own loader in tests). Every item is a LongUri
    — exactly what the reference itself caches after a Raw TSV load
    (Tsv.scala Raw parseUri = parseLiteral = LongUri). ``raw=True`` writes
    every column verbatim (pair with read_tsv(parse_uris=False) for a
    byte-faithful reference roundtrip); the default re-brackets canonical
    bracket-less URIs (s/p always, o when okind == 'uri'). Driver-side
    single stream through toLocalIterator, like the reference's own single
    OutputStream writer."""

    def frame(payload: bytes) -> bytes:
        return _INT.pack(len(payload)) + payload

    def long_uri(s: str, kind: str) -> bytes:
        rebracket = not raw and kind == "uri" and not s.startswith("_:")
        b = (f"<{s}>" if rebracket else s).encode("utf-8")
        return frame(b"\x01" + frame(b))

    cols = df.columns
    rows = df.select(
        (F.col("g") if "g" in cols else F.lit("")).alias("g"),
        "s", "p", "o",
        (F.col("okind") if "okind" in cols else term_kind(F.col("o"))).alias(
            "okind"
        ),
    ).toLocalIterator()
    with open(path, "wb") as out:
        for r in rows:
            g = long_uri(r["g"] or "", "uri" if r["g"] else "text")
            t = (
                long_uri(r["s"], "uri")
                + long_uri(r["p"], "uri")
                + long_uri(r["o"], r["okind"])
            )
            out.write(frame(g + frame(t)))


def index_cache_items(spark: SparkSession, path: str) -> DataFrame:
    """Dictionary section of an Index ``.cache`` -> (id, item, kind)."""
    return _per_file(
        spark,
        path,
        "id int, item string, kind string",
        lambda b: (r[1:] for r in _parse_index(b) if r[0] == "item"),
    )


def index_cache_quads(spark: SparkSession, path: str) -> DataFrame:
    """Compressed-quad section -> (s, p, o, g int ids, part train/test).
    The part label replays the reference's sequential part markers."""

    def gen(buf: bytes):
        part = "train"
        for r in _parse_index(buf):
            if r[0] == "part":
                part = r[1]
            elif r[0] == "quad":
                yield (*r[1:], part)

    return _per_file(
        spark, path, "s int, p int, o int, g int, part string", gen
    )


def index_cache_to_dataset(spark: SparkSession, path: str) -> DataFrame:
    """Decode an Index ``.cache`` back to string triples (s, p, o, part) by
    joining the quad ids against the dictionary section — the inverse of
    the reference's TripleItemHashIndex numbering. Plain equi-joins; AQE
    broadcasts the dictionary when it is small."""
    items = index_cache_items(spark, path)
    quads = index_cache_quads(spark, path)
    out = quads
    for c in ("s", "p", "o"):
        m = items.select(
            F.col("id").alias(c), F.col("item").alias(c + "_str")
        )
        out = out.join(m, c, "left")
    return out.select(
        F.col("s_str").alias("s"),
        F.col("p_str").alias("p"),
        F.col("o_str").alias("o"),
        "part",
    )
