"""Query registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable plus a DuckDB-equivalent oracle SQL.

This is the driver's correctness gate (CORRECTNESS_r{N}.json): each pair is
run side-by-side at sf0.01 and compared on row count + schema + order-
insensitive value hash, columns matched by NAME — hence every computed
column is aliased identically on both sides.

Cross-engine determinism rules used throughout (see functions/hashing.py):
  * hashes = md5-60bit (identical in Spark/DuckDB/Python)
  * no rand(): splits/sampling are key-hash based
  * double sums avoided or rounded; ratios are single divisions of exact
    integers (bit-identical IEEE across engines)
  * no double->string casts (Java vs C++ formatting differs); numeric
    literals are scaled to bigint cents where needed
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdfrules_spark.functions.hashing import P as MINHASH_P
from rdfrules_spark.functions.hashing import h60_sql, hk_sql

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

TOKEN_RE = "[^a-z0-9]+"


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# Relational -> triples (reference core:data/formats/Sql.scala:26-52)
# --------------------------------------------------------------------------

_REL_TRIPLES_SQL = """
    select concat('customer:', c_custkey) as s, 'c_name' as p, c_name as o,
           'text' as okind, 'customer' as g from customer
    union all
    select concat('customer:', c_custkey), 'c_nationkey',
           concat('nation:', c_nationkey), 'uri', 'customer' from customer
    union all
    select concat('customer:', c_custkey), 'c_acctbal_cents',
           cast(cast(round(c_acctbal * 100) as bigint) as varchar), 'number',
           'customer' from customer
    union all
    select concat('customer:', c_custkey), 'c_mktsegment', c_mktsegment,
           'text', 'customer' from customer
    union all
    select concat('orders:', o_orderkey), 'o_custkey',
           concat('customer:', o_custkey), 'uri', 'orders' from orders
    union all
    select concat('orders:', o_orderkey), 'o_orderstatus', o_orderstatus,
           'text', 'orders' from orders
    union all
    select concat('orders:', o_orderkey), 'o_totalprice_cents',
           cast(cast(round(o_totalprice * 100) as bigint) as varchar), 'number',
           'orders' from orders
    union all
    select concat('nation:', n_nationkey), 'n_name', n_name, 'text', 'nation'
    from nation
    union all
    select concat('nation:', n_nationkey), 'n_regionkey',
           concat('region:', n_regionkey), 'uri', 'nation' from nation
    union all
    select concat('region:', r_regionkey), 'r_name', r_name, 'text', 'region'
    from region
"""


def rel_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H slice as (s, p, o, okind, g) string quads — the generic-operator
    test dataset (same unpivot shape as the reference's SQL source)."""
    from rdfrules_spark.operators.relational import table_to_triples

    cents = lambda c: F.round(F.col(c) * 100).cast("bigint")  # noqa: E731
    customer = (
        _t(spark, sf_dir, "customer")
        .withColumn("c_acctbal_cents", cents("c_acctbal"))
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .withColumn("o_totalprice_cents", cents("o_totalprice"))
    )
    parts = [
        table_to_triples(
            customer, "customer", "c_custkey", {"c_nationkey": "nation"},
            ["c_name", "c_nationkey", "c_acctbal_cents", "c_mktsegment"],
        ).withColumn("g", F.lit("customer")),
        table_to_triples(
            orders, "orders", "o_orderkey", {"o_custkey": "customer"},
            ["o_custkey", "o_orderstatus", "o_totalprice_cents"],
        ).withColumn("g", F.lit("orders")),
        table_to_triples(
            _t(spark, sf_dir, "nation"), "nation", "n_nationkey",
            {"n_regionkey": "region"}, ["n_name", "n_regionkey"],
        ).withColumn("g", F.lit("nation")),
        table_to_triples(
            _t(spark, sf_dir, "region"), "region", "r_regionkey", {}, ["r_name"]
        ).withColumn("g", F.lit("region")),
    ]
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out


@register(
    "rel_to_triples_histogram",
    f"""
    with t as ({_REL_TRIPLES_SQL})
    select g, p, count(*) as cnt from t group by g, p
    """,
)
def q_rel_to_triples_histogram(spark, sf_dir):
    from rdfrules_spark.operators.histogram import histogram

    return histogram(rel_triples(spark, sf_dir), "g", "p")


@register(
    "triple_histogram_po",
    f"""
    with t as ({_REL_TRIPLES_SQL})
    select p, o, count(*) as cnt from t where p = 'o_orderstatus' group by p, o
    """,
)
def q_triple_histogram_po(spark, sf_dir):
    from rdfrules_spark.operators.histogram import histogram

    t = rel_triples(spark, sf_dir).where(F.col("p") == "o_orderstatus")
    return histogram(t, "p", "o")


@register(
    "properties_types",
    f"""
    with t as ({_REL_TRIPLES_SQL}),
    typed as (
      select p,
             case when o similar to '-?[0-9]+(\\.[0-9]+)?' then 'number'
                  when o in ('true','false') then 'boolean'
                  when o similar to '\\[[^;]*;[^\\]]*\\)' then 'interval'
                  when regexp_matches(o, '^[A-Za-z][A-Za-z0-9+.-]*:')
                       or o like '\\_:%' escape '\\' then 'uri'
                  else 'text' end as okind
      from t)
    select p, okind, count(*) as cnt from typed group by p, okind
    """,
)
def q_properties_types(spark, sf_dir):
    from rdfrules_spark.operators.histogram import properties

    return properties(rel_triples(spark, sf_dir))


@register(
    "property_cardinalities",
    f"""
    with t as ({_REL_TRIPLES_SQL})
    select p, count(*) as size,
           count(distinct s) as n_subjects,
           count(distinct o) as n_objects,
           count(distinct s) / count(*) as subj_rel_card,
           count(distinct o) / count(*) as obj_rel_card
    from t group by p
    """,
)
def q_property_cardinalities(spark, sf_dir):
    from rdfrules_spark.operators.histogram import property_cardinalities

    return property_cardinalities(rel_triples(spark, sf_dir))


# --------------------------------------------------------------------------
# Filters / maps / shrink (reference Transformable, FilterQuads, MapQuads)
# --------------------------------------------------------------------------


@register(
    "filter_quads",
    """
    select event_id, user_id, event_type, value from events
    where (regexp_matches(event_type, '^(click|view)$')
           and value >= 50.0 and value <= 500.0)
       or (event_type = 'error' and not (value >= 100.0))
    """,
)
def q_filter_quads(spark, sf_dir):
    from rdfrules_spark.operators.filters import Matcher, QuadMatcher, filter_quads

    ev = _t(spark, sf_dir, "events")
    pat1 = QuadMatcher(
        [
            Matcher("event_type", rlike="^(click|view)$"),
            Matcher("value", lo=50.0, hi=500.0),
        ]
    )
    pat2 = QuadMatcher(
        [Matcher("event_type", eq="error"), Matcher("value", lo=100.0, inverse=True)]
    )
    return filter_quads(ev, pat1, pat2).select(
        "event_id", "user_id", "event_type", "value"
    )


@register(
    "map_quads_regex",
    """
    select event_id,
           regexp_replace(event_type, '^(click|view)$', 'interaction:\\1', 'g')
             as event_type
    from events
    """,
)
def q_map_quads_regex(spark, sf_dir):
    from rdfrules_spark.operators.filters import map_quads

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type")
    return map_quads(ev, "event_type", "^(click|view)$", r"interaction:$1")


@register(
    "shrink_take",
    """
    select l_orderkey, l_linenumber, l_quantity from lineitem
    order by l_orderkey, l_linenumber limit 100
    """,
)
def q_shrink_take(spark, sf_dir):
    from rdfrules_spark.operators.shrink import take

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    return take(li, 100, "l_orderkey", "l_linenumber")


@register(
    "shrink_slice",
    """
    with r as (
      select l_orderkey, l_linenumber, l_quantity,
             row_number() over (order by l_orderkey, l_linenumber) - 1 as rn
      from lineitem)
    select l_orderkey, l_linenumber, l_quantity from r
    where rn >= 50 and rn < 150
    """,
)
def q_shrink_slice(spark, sf_dir):
    from rdfrules_spark.operators.shrink import slice_rows

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    return slice_rows(li, 50, 150, "l_orderkey", "l_linenumber")


# --------------------------------------------------------------------------
# Sampling / split (reference Sampleable.scala — deterministic hash variant)
# --------------------------------------------------------------------------

_SPLIT_BUCKET = (
    "cast(concat('0x', substr(md5(concat('split', cast(o_orderkey as varchar))), 1, 15))"
    " as bigint) % 10000"
)


@register(
    "hash_split_sizes",
    f"""
    with b as (select o_orderkey, {_SPLIT_BUCKET} as bucket from orders)
    select case when bucket < 8000 then 0 else 1 end as part,
           count(*) as cnt,
           count(distinct o_orderkey) as n_keys
    from b group by 1
    """,
)
def q_hash_split_sizes(spark, sf_dir):
    from rdfrules_spark.operators.sampling import hash_split

    orders = _t(spark, sf_dir, "orders")
    train, test = hash_split(orders, "o_orderkey", [0.8, 0.2])
    return (
        train.select(F.lit(0).alias("part"), "o_orderkey")
        .unionByName(test.select(F.lit(1).alias("part"), "o_orderkey"))
        .groupBy("part")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("o_orderkey").alias("n_keys"),
        )
    )


@register(
    "stratified_split_sizes",
    """
    with b as (
      select o_orderstatus,
             cast(concat('0x', substr(md5(concat('strat', o_orderstatus,
                  cast(o_orderkey as varchar))), 1, 15)) as bigint) % 10000
               as bucket
      from orders)
    select o_orderstatus,
           case when bucket < 7000 then 0 else 1 end as part,
           count(*) as cnt
    from b group by 1, 2
    """,
)
def q_stratified_split_sizes(spark, sf_dir):
    from rdfrules_spark.operators.sampling import stratified_split

    orders = _t(spark, sf_dir, "orders")
    left, right = stratified_split(orders, "o_orderstatus", "o_orderkey", 0.7)
    return (
        left.select("o_orderstatus", F.lit(0).alias("part"))
        .unionByName(right.select("o_orderstatus", F.lit(1).alias("part")))
        .groupBy("o_orderstatus", "part")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "bootstrap_sizes",
    """
    with m as (
      select o_orderstatus,
             cast(concat('0x', substr(md5(concat('boot',
                  cast(o_orderkey as varchar))), 1, 15)) as bigint) % 4 as mult
      from orders)
    select o_orderstatus, cast(sum(mult) as bigint) as cnt from m group by 1
    """,
)
def q_bootstrap_sizes(spark, sf_dir):
    from rdfrules_spark.operators.sampling import bootstrap

    orders = _t(spark, sf_dir, "orders")
    return bootstrap(orders, "o_orderkey", copies=3).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )


# --------------------------------------------------------------------------
# Discretization (reference Discretizable.scala)
# --------------------------------------------------------------------------


@register(
    "equidistance_intervals",
    """
    with mm as (select min(l_extendedprice) as mn, max(l_extendedprice) as mx
                from lineitem),
    b as (select cast(least(floor((l_extendedprice - mn) / ((mx - mn) / 8)), 7)
                 as int) as bin, mn, mx
          from lineitem, mm)
    select bin, mn + bin * (mx - mn) / 8 as lo,
           mn + (bin + 1) * (mx - mn) / 8 as hi, count(*) as cnt
    from b group by bin, mn, mx
    """,
)
def q_equidistance_intervals(spark, sf_dir):
    from rdfrules_spark.operators.discretize import equidistance_intervals

    return equidistance_intervals(_t(spark, sf_dir, "lineitem"), "l_extendedprice", 8)


@register(
    "equifrequency_intervals",
    """
    with t as (
      select cast(l_quantity as double) as v,
             ntile(5) over (order by cast(l_quantity as double),
                            l_orderkey, l_linenumber) - 1 as bin
      from lineitem)
    select bin, min(v) as lo, max(v) as hi, count(*) as cnt
    from t group by bin
    """,
)
def q_equifrequency_intervals(spark, sf_dir):
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    w = Window.orderBy(
        F.col("l_quantity").cast("double"), "l_orderkey", "l_linenumber"
    )
    tiled = li.select(
        F.col("l_quantity").cast("double").alias("v"),
        (F.ntile(5).over(w) - 1).alias("bin"),
    )
    return tiled.groupBy("bin").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"), F.count(F.lit(1)).alias("cnt")
    )


@register(
    "discretize_rewrite",
    """
    with mm as (select min(l_quantity) as mn, max(l_quantity) as mx from lineitem),
    b as (select cast(least(floor((l_quantity - mn) / ((mx - mn) / 10)), 9) as int)
            as bin, mn, mx from lineitem, mm)
    select concat('[', cast(cast(round((mn + bin * (mx - mn) / 10) * 10000) as bigint)
                      as varchar),
                  ';', cast(cast(round((mn + (bin + 1) * (mx - mn) / 10) * 10000)
                      as bigint) as varchar), ')') as interval_lit,
           count(*) as cnt
    from b group by 1
    """,
)
def q_discretize_rewrite(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    mm = li.agg(
        F.min("l_quantity").cast("double").alias("mn"),
        F.max("l_quantity").cast("double").alias("mx"),
    )
    width = (F.col("mx") - F.col("mn")) / 10
    b = F.least(F.floor((F.col("l_quantity") - F.col("mn")) / width), F.lit(9)).cast(
        "int"
    )
    scaled = lambda x: F.round(x * 10000).cast("bigint").cast("string")  # noqa: E731
    lit = F.concat(
        F.lit("["),
        scaled(F.col("mn") + b * width),
        F.lit(";"),
        scaled(F.col("mn") + (b + 1) * width),
        F.lit(")"),
    )
    return (
        li.crossJoin(F.broadcast(mm))
        .select(lit.alias("interval_lit"))
        .groupBy("interval_lit")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# --------------------------------------------------------------------------
# Top-k / windows / modes (reference TopKQueue, Sortable, TripleIndex modes)
# --------------------------------------------------------------------------


@register(
    "topk_global",
    """
    select o_orderkey, o_totalprice from orders
    order by o_totalprice desc, o_orderkey limit 50
    """,
)
def q_topk_global(spark, sf_dir):
    from rdfrules_spark.operators.topk import topk

    return topk(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        50,
        F.desc("o_totalprice"),
        "o_orderkey",
    )


@register(
    "topk_per_group",
    """
    with r as (
      select l_orderkey, l_linenumber, l_extendedprice,
             row_number() over (partition by l_orderkey
                                order by l_extendedprice desc, l_linenumber) as rank
      from lineitem)
    select l_orderkey, l_linenumber, l_extendedprice, rank from r where rank <= 2
    """,
)
def q_topk_per_group(spark, sf_dir):
    from rdfrules_spark.operators.topk import topk_per_group

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return topk_per_group(
        li, ["l_orderkey"], 2, F.desc("l_extendedprice"), "l_linenumber"
    )


@register(
    "mode_per_group",
    """
    with c as (select user_id, event_type, count(*) as cnt
               from events group by 1, 2),
    r as (select user_id, event_type, cnt,
                 row_number() over (partition by user_id
                                    order by cnt desc, event_type) as r
          from c),
    t as (select user_id, count(*) as total from events group by 1)
    select r.user_id, r.event_type as mode_value, r.cnt, r.cnt / t.total as mode_prob
    from r join t on r.user_id = t.user_id where r.r = 1
    """,
)
def q_mode_per_group(spark, sf_dir):
    from rdfrules_spark.operators.topk import mode_per_group

    return mode_per_group(_t(spark, sf_dir, "events"), "user_id", "event_type")


@register(
    "noisy_or_scores",
    """
    with c as (select user_id, (event_id % 997) / 1000.0 as conf from events)
    select user_id, round(1.0 - exp(sum(ln(1.0 - conf))), 6) as noisy_or,
           round(max(conf), 6) as max_score, count(*) as n
    from c group by user_id
    """,
)
def q_noisy_or_scores(spark, sf_dir):
    from rdfrules_spark.operators.topk import noisy_or

    ev = _t(spark, sf_dir, "events").select(
        "user_id", ((F.col("event_id") % 997) / 1000.0).alias("conf")
    )
    return ev.groupBy("user_id").agg(
        F.round(noisy_or(F.col("conf")), 6).alias("noisy_or"),
        F.round(F.max("conf"), 6).alias("max_score"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# Event-stream style windows (lag/session gaps)
# --------------------------------------------------------------------------


@register(
    "event_gaps",
    """
    with g as (
      select user_id,
             epoch_us(ts) - lag(epoch_us(ts)) over (partition by user_id
                                                    order by ts, event_id) as gap_us
      from events)
    select user_id,
           count(*) as n_events,
           cast(sum(case when gap_us > 3600000000 then 1 else 0 end) as bigint)
             as n_session_breaks
    from g group by user_id
    """,
)
def q_event_gaps(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet timestamps load as TIMESTAMP_NTZ; session tz is UTC so the
    # cast is instant-preserving
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    g = ev.select("user_id", (us - F.lag(us).over(w)).alias("gap_us"))
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("gap_us") > 3_600_000_000, 1).otherwise(0)).alias(
            "n_session_breaks"
        ),
    )
