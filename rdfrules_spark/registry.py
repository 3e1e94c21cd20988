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


@register(
    "predicate_neighbours",
    f"""
    with t as (select distinct s, p, o from ({_REL_TRIPLES_SQL})),
    ps as (select p, s as e, count(distinct o) as c from t group by p, s),
    po as (select p, o as e, count(distinct s) as c from t group by p, o)
    select a.p as p, b.p as q, 'SS' as mode,
           cast(sum(case when a.p = b.p then a.c * (a.c - 1)
                    else a.c * b.c end) as bigint) as est
    from ps a join ps b on a.e = b.e group by a.p, b.p
    union all
    select a.p, b.p, 'SO', cast(sum(a.c * b.c) as bigint)
    from ps a join po b on a.e = b.e group by a.p, b.p
    union all
    select a.p, b.p, 'OO',
           cast(sum(case when a.p = b.p then a.c * (a.c - 1)
                    else a.c * b.c end) as bigint)
    from po a join po b on a.e = b.e group by a.p, b.p
    union all
    select a.p, b.p, 'OS', cast(sum(a.c * b.c) as bigint)
    from po a join ps b on a.e = b.e group by a.p, b.p
    """,
)
def q_predicate_neighbours(spark, sf_dir):
    """neighboursSS/SO/OO/OS join-size statistics
    (TripleIndex.scala:58-95) over the relational triple view.

    No .distinct() here: predicate_neighbours' groupBy+countDistinct
    already deduplicates (s,p,o) repeats, so a pre-distinct would only
    add a full extra shuffle on the fact table."""
    from rdfrules_spark.dictionary import predicate_neighbours

    t = rel_triples(spark, sf_dir).select("s", "p", "o")
    return predicate_neighbours(t)


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
    # scale-safe exact ntile (per-partition-offset global rank — no
    # single-partition window); lo/hi/cnt are tie-order-invariant so the
    # ntile oracle matches bit-for-bit
    from rdfrules_spark.operators.discretize import equifrequency_intervals

    return equifrequency_intervals(
        _t(spark, sf_dir, "lineitem"), "l_quantity", 5
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


_EQS_HIST_SQL = """
    hist as (select cast(l_quantity as double) as v, count(*) as c
             from lineitem group by 1),
    cum as (select v, c, sum(c) over (order by v) as cum from hist),
    tot as (select sum(c) as n from hist)
"""


@register(
    "nt_roundtrip",
    """
    select n_name as s, 'ex:inRegion' as p,
           concat('region:', r_name) as o, 'uri' as okind
    from nation join region on n_regionkey = r_regionkey
    """,
)
def q_nt_roundtrip(spark, sf_dir):
    """N-Triples writer -> reader round-trip against relational truth
    (RdfSource.scala:52-67; formats/JenaLang parity for the NT subset)."""
    import tempfile

    from rdfrules_spark.sources.rdf import read_nt, write_nt

    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    df = nation.join(
        region, nation.n_regionkey == region.r_regionkey
    ).select(
        F.col("n_name").alias("s"),
        F.lit("ex:inRegion").alias("p"),
        F.concat(F.lit("region:"), F.col("r_name")).alias("o"),
        F.lit("uri").alias("okind"),
    )
    path = tempfile.mkdtemp(prefix="rdfrules_nt_") + "/data"
    write_nt(df, path)
    return read_nt(spark, path)


@register(
    "equisize_intervals",
    f"""
    with recursive {_EQS_HIST_SQL},
    params as (select greatest(cast(floor(n * 0.08) as bigint), 2) as s, n
               from tot),
    cuts(i, cut) as (
      select 0, cast(0 as bigint)
      union all
      select i + 1,
             (select min(cum) from cum, params where cum >= cut + s)
      from cuts
      where (select min(cum) from cum, params where cum >= cut + s)
            is not null
    ),
    adj as (select i,
                   case when i > 0 and i = (select max(i) from cuts)
                             and cut < (select n from tot)
                        then (select n from tot) else cut end as cut
            from cuts
            union all
            select 1, n from tot where (select max(i) from cuts) = 0),
    iv as (select a.i - 1 as bin, b.cut as lo_c, a.cut as hi_c
           from adj a join adj b on b.i = a.i - 1)
    select bin,
           cast((select min(v) from cum where cum > lo_c) as double) as lo,
           cast((select max(v) from cum where cum <= hi_c) as double) as hi,
           cast(hi_c - lo_c as bigint) as cnt
    from iv
    """,
)
def q_equisize_intervals(spark, sf_dir):
    """Equisize discretization (DiscretizationTask.Equisize, greedy
    support-floor intervals over the sorted value histogram)."""
    from rdfrules_spark.operators.discretize import equisize_intervals

    return equisize_intervals(_t(spark, sf_dir, "lineitem"), "l_quantity", 0.08)


@register(
    "equisize_tree_intervals",
    f"""
    with recursive {_EQS_HIST_SQL},
    params as (select greatest(cast(floor(n * 0.1) as bigint), 2) as s
               from tot),
    nodes(lo, hi) as (
      select cast(0 as bigint), n from tot
      union all
      select lo + ((hi - lo) * j) // 2, lo + ((hi - lo) * (j + 1)) // 2
      from nodes, unnest([0, 1]) as u(j), params
      where (hi - lo) // 2 >= s
    ),
    leaves as (select lo, hi from nodes, params where (hi - lo) // 2 < s)
    select row_number() over (order by lo) - 1 as bin,
           cast((select min(v) from cum where cum > lo) as double) as lo,
           cast((select min(v) from cum where cum > hi - 1) as double) as hi,
           cast(hi - lo as bigint) as cnt
    from leaves
    """,
)
def q_equisize_tree_intervals(spark, sf_dir):
    """EquisizeTree discretization (DiscretizationTask.EquisizeTree,
    recursive arity-2 rank splits while both children hold >= support)."""
    from rdfrules_spark.operators.discretize import equisize_tree_intervals

    return equisize_tree_intervals(
        _t(spark, sf_dir, "lineitem"), "l_quantity", 0.1, arity=2
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


# --------------------------------------------------------------------------
# Text analysis (training-data pipeline first-class ops)
# --------------------------------------------------------------------------

_TOKS_SQL = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
_SW_SQL = {
    "en": "['the','and','of','to','a']",
    "es": "['el','la','de','que','y']",
    "fr": "['le','la','et','les','des']",
    "de": "['der','die','und','das','ist']",
    "zh": "['de5','shi4','le5','zai4','he2']",
}
_ALL_SW_SQL = (
    "['the','and','of','to','a','el','la','de','que','y','le','la','et','les',"
    "'des','der','die','und','das','ist','de5','shi4','le5','zai4','he2']"
)
_LANG_CASE = " ".join(
    f"when best > 0 and s_{lang} = best then '{lang}'" for lang in _SW_SQL
)
_FP_STEP = "(a * 31 + b) % 1000000007"


@register(
    "text_profile",
    f"""
    with t as (select doc_id, text, {_TOKS_SQL} as ts from documents),
    scored as (
      select doc_id, text, ts, len(ts) as n_tokens,
             {", ".join(f"len(list_filter(ts, t -> list_contains({sw}, t))) as s_{lang}" for lang, sw in _SW_SQL.items())},
             length(text) as n_chars
      from t),
    lang as (
      select *, greatest(s_en, s_es, s_fr, s_de, s_zh) as best from scored),
    q as (
      select doc_id, n_tokens,
             case {_LANG_CASE} else 'und' end as lang_pred,
             case when n_tokens > 0 then cast(n_chars as double) / n_tokens
                  else 0.0 end as mean_tok_len,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
               / greatest(n_chars, 1) as punct_ratio,
             len(list_filter(ts, t -> list_contains({_ALL_SW_SQL}, t)))
               / greatest(n_tokens, 1) as sw_ratio,
             least(n_tokens / 50.0, 1.0) as len_score,
             list_reduce(
               list_prepend(cast(0 as bigint),
                 list_transform(ts, t -> {h60_sql('t')} % 1000000007)),
               (a, b) -> {_FP_STEP}) as fp
      from lang)
    select doc_id, n_tokens, lang_pred,
           round(0.4 * len_score
                 + 0.2 * (case when mean_tok_len >= 3 and mean_tok_len <= 10
                               then 1.0 else 0.5 end)
                 + 0.2 * (case when punct_ratio <= 0.1 then 1.0 else 0.5 end)
                 + 0.2 * sw_ratio, 6) as quality,
           fp
    from q
    """,
)
def q_text_profile(spark, sf_dir):
    from rdfrules_spark.operators.textops import (
        fingerprint,
        lang_id,
        quality_score,
        token_count,
    )

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        lang_id("text").alias("lang_pred"),
        quality_score("text").alias("quality"),
        fingerprint("text").alias("fp"),
    )


# --------------------------------------------------------------------------
# Deduplication suite
# --------------------------------------------------------------------------


@register(
    "exact_dedup",
    "select min(doc_id) as doc_id from documents group by md5(text)",
)
def q_exact_dedup(spark, sf_dir):
    from rdfrules_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"), "text", "doc_id")


_SHINGLES_SQL = f"""
    toks as (select doc_id, {_TOKS_SQL} as ts from documents),
    sh as (select doc_id,
                  unnest(list_distinct(list_transform(range(len(ts) - 2),
                         i -> ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3])))
                    as sh
           from toks where len(ts) >= 3)
"""
_MH_MINS = ", ".join(f"min({hk_sql('sh', i)}) as mh_{i}" for i in range(8))
_MH_BANDS = " ".join(
    f"when {b} then concat(mh_{2*b}, '_', mh_{2*b+1})" for b in range(4)
)


@register(
    "minhash_signatures",
    f"""
    with {_SHINGLES_SQL}
    select doc_id as id, {_MH_MINS} from sh group by doc_id
    """,
)
def q_minhash_signatures(spark, sf_dir):
    from rdfrules_spark.operators.dedup import minhash_signature

    return minhash_signature(_t(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "minhash_lsh_pairs",
    f"""
    with {_SHINGLES_SQL},
    sig as (select doc_id as id, {_MH_MINS} from sh group by doc_id),
    bands0 as (select id, b, case b {_MH_BANDS} end as key,
                     {", ".join(f"mh_{i}" for i in range(8))}
              from sig, unnest([0, 1, 2, 3]) as u(b)),
    okb as (select b, key from bands0 group by b, key
            having count(*) <= 1000),
    bands as (select bands0.* from bands0 join okb using (b, key)),
    cand as (
      select distinct a.id as id_a, b.id as id_b,
             ({" + ".join(f"(case when a.mh_{i} = b.mh_{i} then 1 else 0 end)" for i in range(8))})
               / 8 as est_jaccard
      from bands a join bands b on a.b = b.b and a.key = b.key and a.id < b.id)
    select id_a, id_b, est_jaccard from cand where est_jaccard >= 0.0
    """,
)
def q_minhash_lsh_pairs(spark, sf_dir):
    from rdfrules_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", threshold=0.0
    )


@register(
    "ngram_jaccard_pairs",
    f"""
    with {_SHINGLES_SQL},
    oks as (select sh from sh group by sh having count(*) <= 1000),
    shc as (select sh.* from sh join oks using (sh)),
    sizes as (select doc_id, count(*) as n from shc group by doc_id),
    inter as (select a.doc_id as id_a, b.doc_id as id_b, count(*) as inter
              from shc a join shc b on a.sh = b.sh and a.doc_id < b.doc_id
              group by 1, 2)
    select id_a, id_b,
           inter / (sa.n + sb.n - inter) as jaccard
    from inter
    join sizes sa on sa.doc_id = id_a
    join sizes sb on sb.doc_id = id_b
    where inter / (sa.n + sb.n - inter) >= 0.0
    """,
)
def q_ngram_jaccard_pairs(spark, sf_dir):
    from rdfrules_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", threshold=0.0
    )


@register(
    "simhash_signatures",
    f"""
    with toks as (select doc_id, {_TOKS_SQL} as ts from documents),
    tok as (select doc_id, unnest(ts) as t from toks),
    h as (select doc_id, {h60_sql('t')} as hv from tok),
    bits as (select doc_id, j,
                    sum(case when (hv >> j) & 1 = 1 then 1 else -1 end) as c
             from h, unnest(range(48)) as u(j) group by 1, 2)
    select doc_id,
           cast(sum(case when c > 0 then (cast(1 as bigint) << j) else 0 end)
                as bigint) as sig
    from bits group by doc_id
    """,
)
def q_simhash_signatures(spark, sf_dir):
    from rdfrules_spark.operators.dedup import simhash

    return _t(spark, sf_dir, "documents").select(
        "doc_id", simhash("text").alias("sig")
    )


@register(
    "simhash_near_dup_pairs",
    f"""
    with toks as (select doc_id, {_TOKS_SQL} as ts from documents),
    tok as (select doc_id, unnest(ts) as t from toks),
    h as (select doc_id, {h60_sql('t')} as hv from tok),
    bits as (select doc_id, j,
                    sum(case when (hv >> j) & 1 = 1 then 1 else -1 end) as c
             from h, unnest(range(48)) as u(j) group by 1, 2),
    sig as (select doc_id,
                   cast(sum(case when c > 0 then (cast(1 as bigint) << j)
                            else 0 end) as bigint) as sig
            from bits group by doc_id),
    chunks0 as (select doc_id, sig, c,
                      (sig >> (16 * c)) & 65535 as v
               from sig, unnest([0, 1, 2]) as u(c)),
    okc as (select c, v from chunks0 group by c, v
            having count(*) <= 1000),
    chunks as (select chunks0.* from chunks0 join okc using (c, v)),
    cand as (select distinct a.doc_id as id_a, b.doc_id as id_b,
                    bit_count(xor(a.sig, b.sig)) as hamming
             from chunks a join chunks b
               on a.c = b.c and a.v = b.v and a.doc_id < b.doc_id)
    select id_a, id_b, hamming from cand where hamming <= 24
    """,
)
def q_simhash_near_dup_pairs(spark, sf_dir):
    from rdfrules_spark.operators.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=24
    )


def _emb_lsh_oracle() -> str:
    from rdfrules_spark.operators.dedup import lsh_planes

    _VD = "list_transform(embedding, x -> cast(x as double))"

    def _dot_sql(a, b, dim=64):
        return (
            f"list_reduce(list_prepend(0.0, list_transform(range({dim}), "
            f"i -> {a}[i+1] * {b}[i+1])), (s, x) -> s + x)"
        )

    def _norm_sql(a, dim=64):
        return (
            f"sqrt(list_reduce(list_prepend(0.0, list_transform(range({dim}), "
            f"i -> {a}[i+1] * {a}[i+1])), (s, x) -> s + x))"
        )

    planes = lsh_planes(8, 64)
    plane_lit = lambda i: (  # noqa: E731
        "[" + ", ".join(str(c) for c in planes[i]) + "]"
    )
    sign = lambda i: (  # noqa: E731
        f"(case when list_reduce(list_prepend(0.0, list_transform(range(64), "
        f"i -> ve[i+1] * ({plane_lit(i)})[i+1])), (s, x) -> s + x) > 0 "
        f"then '1' else '0' end)"
    )
    key = "concat(" + ", ".join(sign(i) for i in range(8)) + ")"
    return f"""
    with v as (select vec_id, {_VD} as ve from embeddings),
    keyed0 as (select vec_id, ve, {key} as bk from v),
    okk as (select bk from keyed0 group by bk having count(*) <= 1000),
    keyed as (select keyed0.* from keyed0 join okk using (bk))
    select distinct a.vec_id as id_a, b.vec_id as id_b,
           {_dot_sql('a.ve', 'b.ve')} / ({_norm_sql('a.ve')} * {_norm_sql('b.ve')})
             as cosine
    from keyed a join keyed b on a.bk = b.bk and a.vec_id < b.vec_id
    """


@register("embedding_near_dup_pairs")
def q_embedding_near_dup_pairs(spark, sf_dir):
    from rdfrules_spark.operators.dedup import embedding_near_dup_pairs

    out = embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", threshold=-1.0
    )
    return out.select("id_a", "id_b", "cosine")


ORACLES["embedding_near_dup_pairs"] = _emb_lsh_oracle()


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------

_VD = "list_transform(embedding, x -> cast(x as double))"


def _dot_sql(a: str, b: str, dim: int = 64) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range({dim}), "
        f"i -> {a}[i+1] * {b}[i+1])), (s, x) -> s + x)"
    )


def _norm_sql(a: str, dim: int = 64) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(0.0, list_transform(range({dim}), "
        f"i -> {a}[i+1] * {a}[i+1])), (s, x) -> s + x))"
    )


@register(
    "cosine_topk",
    f"""
    with v as (select vec_id, {_VD} as ve from embeddings),
    q as (select vec_id as q_id, ve as qv from v order by vec_id limit 5),
    scored as (select q_id, vec_id,
                      {_dot_sql('ve', 'qv')} / ({_norm_sql('ve')} * {_norm_sql('qv')})
                        as cosine
               from v, q),
    r as (select q_id, vec_id, cosine,
                 row_number() over (partition by q_id
                                    order by cosine desc, vec_id) as rank
          from scored)
    select q_id, vec_id, rank, round(cosine, 6) as cosine
    from r where rank <= 10
    """,
)
def q_cosine_topk(spark, sf_dir):
    from rdfrules_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    qs = (
        emb.orderBy("vec_id")
        .limit(5)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    )
    out = cosine_topk(emb, qs, k=10)
    return out.select(
        "q_id", "vec_id", "rank", F.round("cosine", 6).alias("cosine")
    )


@register(
    "ivf_topk",
    f"""
    with v as (select vec_id, {_VD} as ve from embeddings),
    cents as (select vec_id as c_id, ve as cv from v order by vec_id limit 16),
    assign_scored as (
      select v.vec_id, v.ve, c.c_id,
             {_dot_sql('ve', 'cv')} / ({_norm_sql('ve')} * {_norm_sql('cv')}) as s
      from v, cents c),
    assigned as (
      select vec_id, ve, c_id as bucket from (
        select *, row_number() over (partition by vec_id
                                     order by s desc, c_id) as r
        from assign_scored) where r = 1),
    q as (select vec_id as q_id, ve as qv from v order by vec_id limit 5),
    probe_scored as (
      select q.q_id, q.qv, c.c_id,
             {_dot_sql('qv', 'cv')} / ({_norm_sql('qv')} * {_norm_sql('cv')}) as s
      from q, cents c),
    probes as (
      select q_id, qv, c_id as bucket from (
        select *, row_number() over (partition by q_id
                                     order by s desc, c_id) as r
        from probe_scored) where r <= 4),
    scored as (
      select p.q_id, a.vec_id,
             {_dot_sql('a.ve', 'p.qv')} / ({_norm_sql('a.ve')} * {_norm_sql('p.qv')})
               as cosine
      from assigned a join probes p on a.bucket = p.bucket),
    r as (select q_id, vec_id, cosine,
                 row_number() over (partition by q_id
                                    order by cosine desc, vec_id) as rank
          from scored)
    select q_id, vec_id, rank, round(cosine, 6) as cosine
    from r where rank <= 10
    """,
)
def q_ivf_topk(spark, sf_dir):
    from rdfrules_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    qs = (
        emb.orderBy("vec_id")
        .limit(5)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    )
    out = ivf_topk(emb, qs, k=10, n_centroids=16, nprobe=4)
    return out.select(
        "q_id", "vec_id", "rank", F.round("cosine", 6).alias("cosine")
    )


# --------------------------------------------------------------------------
# KG-construction pipeline over the derived corpus (north-star stages)
# --------------------------------------------------------------------------

_KG_W_SQL = """
    ktoks as (select doc_id, string_split(text, ' ') as ts from documents),
    w as (select doc_id, i,
                 ts[i*3 + 1] as s_surf, ts[i*3 + 2] as p, ts[i*3 + 3] as o_surf
          from ktoks,
               unnest(range(cast(floor(len(ts) / 3) as bigint))) as u(i)
          where i*3 + 3 <= len(ts))
"""


@register(
    "kg_extract_pred_counts",
    f"""
    with {_KG_W_SQL}
    select p, count(*) as cnt from w where p <> 'dup' group by p
    """,
)
def q_kg_extract_pred_counts(spark, sf_dir):
    from rdfrules_spark.corpus import derive_documents
    from rdfrules_spark.extraction import extract_window3

    docs = _t(spark, sf_dir, "documents")
    stmts = extract_window3(derive_documents(docs))
    return stmts.where(F.col("p") != "dup").groupBy("p").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "kg_canonical_triples",
    f"""
    with recursive {_KG_W_SQL},
    stmts as (select concat('w:', s_surf) as s, p, concat('w:', o_surf) as o
              from w),
    edges as (select s as a, o as b from stmts where p = 'dup'),
    sym as (select a, b from edges union select b as a, a as b from edges),
    reach(a, b) as (
      select a, b from sym
      union
      select r.a, s.b from reach r join sym s on r.b = s.a where r.a <> s.b),
    canon as (
      select a as node, least(a, min(b)) as canon from reach group by a),
    rewritten as (
      select coalesce(cs.canon, t.s) as s, t.p, coalesce(co.canon, t.o) as o
      from stmts t
      left join canon cs on cs.node = t.s
      left join canon co on co.node = t.o
      where t.p <> 'dup')
    select p, count(*) as n_statements,
           count(distinct (s, o)) as n_triples
    from rewritten group by p
    """,
)
def q_kg_canonical_triples(spark, sf_dir):
    from rdfrules_spark.canonicalize import canonicalize_triples
    from rdfrules_spark.corpus import derive_documents
    from rdfrules_spark.extraction import extract_window3

    docs = _t(spark, sf_dir, "documents")
    stmts = extract_window3(derive_documents(docs))
    iri = lambda c: F.concat(F.lit("w:"), F.col(c))  # noqa: E731
    linked = stmts.select(
        "doc_id", iri("s_surf").alias("s"), "p", iri("o_surf").alias("o")
    )
    rels = linked.where(F.col("p") != "dup")
    sameas = linked.where(F.col("p") == "dup").select(
        F.col("s").alias("a"), F.col("o").alias("b")
    )
    canon_rels, _ = canonicalize_triples(rels, sameas)
    return canon_rels.groupBy("p").agg(
        F.count(F.lit(1)).alias("n_statements"),
        F.countDistinct("s", "o").alias("n_triples"),
    )


@register(
    "kg_media_spans",
    """
    with ktoks as (select doc_id, string_split(text, ' ') as ts from documents)
    select 'image' as kind,
           cast(sum(len(list_filter(range(cast(ceil(len(ts) / 9.0) as bigint)),
                    j -> (doc_id * 31 + j) % 3 = 0))) as bigint) as cnt
    from ktoks
    """,
)
def q_kg_media_spans(spark, sf_dir):
    from rdfrules_spark.corpus import derive_documents

    docs = _t(spark, sf_dir, "documents")
    spans = derive_documents(docs).select(F.explode("spans").alias("sp"))
    return spans.where(F.col("sp.kind") != "text").groupBy(
        F.col("sp.kind").alias("kind")
    ).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "kg_span_invariant",
    "select cast(0 as bigint) as violations",
)
def q_kg_span_invariant(spark, sf_dir):
    """Invariant assertion: span sequences survive the pipeline untouched
    (expected violations = 0; the oracle pins the expectation)."""
    from rdfrules_spark.corpus import derive_documents
    from rdfrules_spark.extraction import span_sequence_invariant

    docs = derive_documents(_t(spark, sf_dir, "documents"))
    carried = docs.select("doc_id", "spans")  # post-extraction carrier cols
    n = span_sequence_invariant(docs, carried)
    return spark.createDataFrame([(n,)], "violations bigint")


@register(
    "media_features",
    """
    with ktoks as (select doc_id, string_split(text, ' ') as ts
                   from documents),
    sent as (select doc_id, cast(ceil(len(ts) / 9.0) as int) as n
             from ktoks),
    media as (select concat('media://', doc_id, '/', j) as media_ref
              from sent, unnest(range(n)) as u(j)
              where (cast(doc_id as bigint) * 31 + j) % 3 = 0),
    h as (select media_ref,
                 list_reduce(list_prepend(0,
                   list_transform(range(length(media_ref)),
                                  i -> unicode(media_ref[i+1]))),
                   (a, b) -> a + b) as hs
          from media)
    select media_ref, 'image' as kind,
           hs % 997 as f0, (hs * 6) % 997 as f5
    from h
    """,
)
def q_media_features(spark, sf_dir):
    """mapInPandas media feature plumbing. The decode is a declared STUB
    (no image libs in the container) but DETERMINISTIC — feature[i] =
    ((sum(content bytes) * (i+1)) % 997) / 997 — so the oracle recomputes
    the exact per-ref features from the documents table (values scaled
    back to integers to avoid float32 hashing)."""
    from rdfrules_spark.corpus import derive_documents
    from rdfrules_spark.operators.multimodal import (
        extract_features,
        media_from_documents,
    )

    docs = derive_documents(_t(spark, sf_dir, "documents"))
    media = media_from_documents(docs)
    feats = extract_features(media, dim=16)
    return feats.select(
        "media_ref", "kind",
        F.round(F.get("feature", 0) * 997).cast("bigint").alias("f0"),
        F.round(F.get("feature", 5) * 997).cast("bigint").alias("f5"),
    )


# --------------------------------------------------------------------------
# Rule mining (flagship workload — reference core:algorithm/amie/)
# --------------------------------------------------------------------------

# mined over the derived-document KG (dense token graph -> real rules)
_MINE_BASE_SQL = f"""
    {_KG_W_SQL},
    t as (select distinct concat('w:', s_surf) as s, p, concat('w:', o_surf) as o
          from w where p <> 'dup'),
    heads as (select p, count(*) as head_size from t group by p
              having count(*) >= 50),
    b as (select s as x, o as y, p as q, 'f' as d,
                 concat_ws('|', s, p, o) as tid from t
          union all
          select o as x, s as y, p as q, 'i' as d,
                 concat_ws('|', s, p, o) from t)
"""


def _kg_triples_df(spark, sf_dir):
    from rdfrules_spark.corpus import derive_documents
    from rdfrules_spark.extraction import extract_window3

    stmts = extract_window3(derive_documents(_t(spark, sf_dir, "documents")))
    iri = lambda c: F.concat(F.lit("w:"), F.col(c))  # noqa: E731
    return (
        stmts.where(F.col("p") != "dup")
        .select(iri("s_surf").alias("s"), "p", iri("o_surf").alias("o"))
        .distinct()
    )


@register(
    "mine_l2_rules",
    f"""
    with {_MINE_BASE_SQL},
    j as (select t.p, b.q, b.d as d1
          from t join b on t.s = b.x and t.o = b.y
          where (b.q <> t.p or b.d <> 'f')
            and b.tid <> concat_ws('|', t.s, t.p, t.o)),
    agg as (select p, q, d1, count(*) as support from j group by p, q, d1)
    select agg.p, 'l2' as shape, q, d1, head_size, support,
           support / head_size as head_coverage
    from agg join heads on agg.p = heads.p
    where support >= 2 and support / head_size >= 0.01
    """,
)
def q_mine_l2_rules(spark, sf_dir):
    from rdfrules_spark.mining.amie import MiningParams, head_sizes, mine_l2

    t = _kg_triples_df(spark, sf_dir)
    params = MiningParams(min_head_size=50, min_support=2, min_head_coverage=0.01)
    heads = head_sizes(t, params)
    return mine_l2(t, heads, params).drop("r", "d2")


@register(
    "mine_l3_3var_rules",
    f"""
    with {_MINE_BASE_SQL},
    j as (select t.p, b1.q, b1.d as d1, b2.q as r, b2.d as d2, t.s as a, t.o as bb
          from t
          join b b1 on t.s = b1.x
          join b b2 on t.o = b2.x and b1.y = b2.y
          where b1.tid <> b2.tid
            and b1.tid <> concat_ws('|', t.s, t.p, t.o)
            and b2.tid <> concat_ws('|', t.s, t.p, t.o)),
    agg as (select p, q, d1, r, d2, count(distinct (a, bb)) as support
            from j group by p, q, d1, r, d2)
    select agg.p, 'l3v3' as shape, q, d1, r, d2, head_size, support,
           support / head_size as head_coverage
    from agg join heads on agg.p = heads.p
    where support >= 2 and support / head_size >= 0.05
    """,
)
def q_mine_l3_3var_rules(spark, sf_dir):
    from rdfrules_spark.mining.amie import MiningParams, head_sizes, mine_l3_3var

    t = _kg_triples_df(spark, sf_dir)
    params = MiningParams(min_head_size=50, min_support=2, min_head_coverage=0.05)
    heads = head_sizes(t, params)
    return mine_l3_3var(t, heads, params)


_L4_PREDS = "('join', 'scan', 'filter', 'hash')"

_L4_ORACLE_SQL = f"""
    with {_KG_W_SQL},
    t as (select distinct concat('w:', s_surf) as s, p, concat('w:', o_surf) as o
          from w where p in {_L4_PREDS}),
    heads as (select p, count(*) as head_size from t group by p
              having count(*) >= 50),
    b as (select s as x, o as y, p as q, 'f' as d,
                 concat_ws('|', s, p, o) as tid from t
          union all
          select o as x, s as y, p as q, 'i' as d,
                 concat_ws('|', s, p, o) from t),
    m as (select t.p, t.s as a, t.o as bb, b.q, b.d, b.tid
          from t join b on t.s = b.x and t.o = b.y
          where (b.q <> t.p or b.d <> 'f')
            and b.tid <> concat_ws('|', t.s, t.p, t.o)),
    ac as (select t.p, t.s as a, t.o as bb, b.y as c, b.q, b.d, b.tid
           from t join b on t.s = b.x
           where b.tid <> concat_ws('|', t.s, t.p, t.o)),
    bc as (select t.p, t.s as a, t.o as bb, b.y as c, b.q, b.d, b.tid
           from t join b on t.o = b.x
           where b.tid <> concat_ws('|', t.s, t.p, t.o)),
    s_v2 as (
      select m0.p, 'ab-ab-ab' as shape,
             concat('ab ', m0.q, ' ', m0.d, ';ab ', m1.q, ' ', m1.d,
                    ';ab ', m2.q, ' ', m2.d) as body,
             count(*) as support
      from m m0
      join m m1 on m0.p = m1.p and m0.a = m1.a and m0.bb = m1.bb
      join m m2 on m0.p = m2.p and m0.a = m2.a and m0.bb = m2.bb
      where (m0.q, m0.d) < (m1.q, m1.d) and (m1.q, m1.d) < (m2.q, m2.d)
        and m0.tid <> m1.tid and m0.tid <> m2.tid and m1.tid <> m2.tid
      group by 1, 3),
    s_abacac as (
      select m0.p, 'ab-ac-ac' as shape,
             concat('ab ', m0.q, ' ', m0.d, ';ac ', a1.q, ' ', a1.d,
                    ';ac ', a2.q, ' ', a2.d) as body,
             count(distinct (m0.a, m0.bb)) as support
      from m m0
      join ac a1 on m0.p = a1.p and m0.a = a1.a and m0.bb = a1.bb
      join ac a2 on a1.p = a2.p and a1.a = a2.a and a1.bb = a2.bb
                and a1.c = a2.c
      where (a1.q, a1.d) < (a2.q, a2.d)
        and a1.tid <> a2.tid and m0.tid <> a1.tid and m0.tid <> a2.tid
      group by 1, 3),
    s_abacbc as (
      select m0.p, 'ab-ac-bc' as shape,
             concat('ab ', m0.q, ' ', m0.d, ';ac ', a1.q, ' ', a1.d,
                    ';bc ', b1.q, ' ', b1.d) as body,
             count(distinct (m0.a, m0.bb)) as support
      from m m0
      join ac a1 on m0.p = a1.p and m0.a = a1.a and m0.bb = a1.bb
      join bc b1 on a1.p = b1.p and a1.a = b1.a and a1.bb = b1.bb
                and a1.c = b1.c
      where m0.tid <> a1.tid and m0.tid <> b1.tid and a1.tid <> b1.tid
      group by 1, 3),
    s_abbcbc as (
      select m0.p, 'ab-bc-bc' as shape,
             concat('ab ', m0.q, ' ', m0.d, ';bc ', b1.q, ' ', b1.d,
                    ';bc ', b2.q, ' ', b2.d) as body,
             count(distinct (m0.a, m0.bb)) as support
      from m m0
      join bc b1 on m0.p = b1.p and m0.a = b1.a and m0.bb = b1.bb
      join bc b2 on b1.p = b2.p and b1.a = b2.a and b1.bb = b2.bb
                and b1.c = b2.c
      where (b1.q, b1.d) < (b2.q, b2.d)
        and b1.tid <> b2.tid and m0.tid <> b1.tid and m0.tid <> b2.tid
      group by 1, 3),
    s_acacbc as (
      select a1.p, 'ac-ac-bc' as shape,
             concat('ac ', a1.q, ' ', a1.d, ';ac ', a2.q, ' ', a2.d,
                    ';bc ', b1.q, ' ', b1.d) as body,
             count(distinct (a1.a, a1.bb)) as support
      from ac a1
      join ac a2 on a1.p = a2.p and a1.a = a2.a and a1.bb = a2.bb
                and a1.c = a2.c
      join bc b1 on a1.p = b1.p and a1.a = b1.a and a1.bb = b1.bb
                and a1.c = b1.c
      where (a1.q, a1.d) < (a2.q, a2.d)
        and a1.tid <> a2.tid and a1.tid <> b1.tid and a2.tid <> b1.tid
      group by 1, 3),
    s_acbcbc as (
      select a1.p, 'ac-bc-bc' as shape,
             concat('ac ', a1.q, ' ', a1.d, ';bc ', b1.q, ' ', b1.d,
                    ';bc ', b2.q, ' ', b2.d) as body,
             count(distinct (a1.a, a1.bb)) as support
      from ac a1
      join bc b1 on a1.p = b1.p and a1.a = b1.a and a1.bb = b1.bb
                and a1.c = b1.c
      join bc b2 on b1.p = b2.p and b1.a = b2.a and b1.bb = b2.bb
                and b1.c = b2.c
      where (b1.q, b1.d) < (b2.q, b2.d)
        and b1.tid <> b2.tid and a1.tid <> b1.tid and a1.tid <> b2.tid
      group by 1, 3),
    allr as (select * from s_v2 union all select * from s_abacac
             union all select * from s_abacbc union all select * from s_abbcbc
             union all select * from s_acacbc union all select * from s_acbcbc)
    select allr.p, shape, body, head_size, support,
           support / head_size as head_coverage
    from allr join heads on allr.p = heads.p
    where support >= 2 and support / head_size >= 0.1
"""


@register("mine_l4_rules", _L4_ORACLE_SQL)
def q_mine_l4_rules(spark, sf_dir):
    """Length-4 (three-body-atom) var-only rules over the synthetic KG —
    the generic shape miner restricted to the reference-reachable L4
    shapes (ac-bd-cd path excluded; pinned by the AmieSpec maxLen4=98
    golden, see mining/shapes.py)."""
    from rdfrules_spark.mining.amie import MiningParams, head_sizes
    from rdfrules_spark.mining.shapes import (
        enumerate_shapes,
        mine_shape,
        shape_reachable,
    )

    # the full synthetic KG is pathologically dense (30 subjects, avg
    # degree ~250) — the L4 label-combination space explodes, so the
    # registry entry mines a fixed 4-predicate slice (the yago golden in
    # tests/test_l4_mining.py covers the full-graph case)
    t = _kg_triples_df(spark, sf_dir).where(
        F.col("p").isin("join", "scan", "filter", "hash")
    )
    params = MiningParams(
        min_head_size=50, min_support=2, min_head_coverage=0.1,
        max_rule_length=4,
    )
    heads = head_sizes(t, params)
    out = None
    for pairs in enumerate_shapes(3):
        if not shape_reachable(pairs, 4):
            continue
        r = mine_shape(t, heads, pairs, params)
        out = r if out is None else out.unionByName(r)
    return out


@register(
    "pattern_filter_l4",
    f"""
    with base as ({_L4_ORACLE_SQL})
    select p, shape, body, head_size, support, head_coverage
    from base
    where list_sort(list_transform(string_split(body, ';'),
                                   x -> string_split(x, ' ')[2]))
          = ['filter', 'join', 'scan']
    """,
)
def q_pattern_filter_l4(spark, sf_dir):
    """Ruleset.filter with a 3-body-atom pattern (Ruleset.scala:76-84,
    RulePatternMatcher.scala — orderless-injective with aliasing; full
    semantics pinned vs the executed reference in
    tests/test_pattern_filters.py): keep the L4 rules whose three body
    atoms injectively match predicates {{join, scan, filter}}."""
    from rdfrules_spark.mining.patterns import (
        AtomPattern,
        RulePattern,
        filter_resolved,
    )

    base = q_mine_l4_rules(spark, sf_dir)

    def slot_atom(s):
        parts = F.split(s, " ")
        u = F.substring(parts[0], 1, 1)
        v = F.substring(parts[0], 2, 1)
        fwd = F.concat(F.lit("?"), u, F.lit("|"), parts[1], F.lit("|?"), v)
        rev = F.concat(F.lit("?"), v, F.lit("|"), parts[1], F.lit("|?"), u)
        return F.when(parts[2] == "f", fwd).otherwise(rev)

    rules = base.withColumn(
        "head", F.concat(F.lit("?a|"), F.col("p"), F.lit("|?b"))
    ).withColumn("atoms", F.transform(F.split("body", ";"), slot_atom))
    pattern = RulePattern(body=[
        AtomPattern(predicate="join"),
        AtomPattern(predicate="scan"),
        AtomPattern(predicate="filter"),
    ])
    return filter_resolved(rules, pattern).select(
        "p", "shape", "body", "head_size", "support", "head_coverage"
    )


@register(
    "multigraph_l2_rules",
    f"""
    with {_KG_W_SQL},
    t0 as (select distinct concat('w:', s_surf) as s, p, concat('w:', o_surf) as o
           from w where p <> 'dup'),
    quads as (select s, p, o,
                     case when {h60_sql("s")} % 2 = 0 then 'g0' else 'g1' end as g
              from t0),
    t as (select distinct s, p, o from quads),
    heads as (select p, count(*) as head_size from t group by p
              having count(*) >= 50),
    b as (select s as x, o as y, p as q, 'f' as d,
                 concat_ws('|', s, p, o) as tid from t
          union all
          select o as x, s as y, p as q, 'i' as d,
                 concat_ws('|', s, p, o) from t),
    agg as (select t.p, b.q, b.d as d1, count(*) as support
            from t join b on t.s = b.x and t.o = b.y
            where (b.q <> t.p or b.d <> 'f')
              and b.tid <> concat_ws('|', t.s, t.p, t.o)
            group by t.p, b.q, b.d),
    rules as (select agg.p, agg.q, agg.d1, heads.head_size, agg.support
              from agg join heads on agg.p = heads.p
              where agg.support >= 2
                and agg.support / heads.head_size >= 0.01),
    pg as (select p, list_sort(list(distinct g)) as graphs
           from quads group by p)
    select r.p, r.q, r.d1, r.head_size, r.support,
           array_to_string(ph.graphs, ',') as g_head,
           array_to_string(pq.graphs, ',') as g1
    from rules r
    join pg ph on ph.p = r.p
    join pg pq on pq.p = r.q
    """,
)
def q_multigraph_l2_rules(spark, sf_dir):
    """Multi-graph mining + graphAwareRules (Ruleset.scala:160-170): the KG
    split into two graphs by a deterministic hash; every rule atom carries
    the graph set its predicate occurs in."""
    from rdfrules_spark.functions.hashing import h60
    from rdfrules_spark.mining.amie import MiningParams
    from rdfrules_spark.mining.multigraph import graph_aware_rules, mine_quads

    quads = _kg_triples_df(spark, sf_dir).withColumn(
        "g",
        F.when(h60(F.col("s")) % 2 == 0, "g0").otherwise("g1"),
    )
    params = MiningParams(min_head_size=50, min_support=2,
                          min_head_coverage=0.01, max_rule_length=2)
    rules = mine_quads(quads, params)
    out = graph_aware_rules(rules, quads)
    # Stringify the graph-set arrays: the driver's pandas canonicalizer
    # cannot sort list cells, so emit sorted comma-joined strings exactly
    # like graph_aware_atom_sets does.
    return out.select(
        "p", "q", "d1", "head_size", "support",
        F.concat_ws(",", F.array_sort("g_head")).alias("g_head"),
        F.concat_ws(",", F.array_sort("g1")).alias("g1"),
    )


@register(
    "graph_aware_atom_sets",
    f"""
    with {_KG_W_SQL},
    t0 as (select distinct concat('w:', s_surf) as s, p, concat('w:', o_surf) as o
           from w where p <> 'dup'),
    quads as (select s, p, o,
                     case when {h60_sql("s")} % 2 = 0 then 'g0' else 'g1' end as g
              from t0),
    t as (select distinct s, p, o from quads),
    top as (select p, o, count(*) as c from t group by p, o
            order by c desc, p, o limit 20),
    kp as (select p, list_sort(list(distinct g)) as gs from quads group by p),
    ko as (select p, o, list_sort(list(distinct g)) as gs
           from quads group by p, o),
    ks as (select p, s, list_sort(list(distinct g)) as gs
           from quads group by p, s)
    select head, pos, graphs from (
      select concat('?a|', t.p, '|C=', t.o) as head, 0 as pos,
             array_to_string(ko.gs, ',') as graphs
      from top t join ko on ko.p = t.p and ko.o = t.o
      union all
      select concat('?a|', t.p, '|C=', t.o), 1, array_to_string(kp.gs, ',')
      from top t join kp on kp.p = t.p
      union all
      select concat('?a|', t.p, '|C=', t.o), 2,
             coalesce(array_to_string(ks.gs, ','), '')
      from top t left join ks on ks.p = t.p and ks.s = t.o
    )
    """,
)
def q_graph_aware_atom_sets(spark, sf_dir):
    """Position-restricted per-atom graph sets (Atom.toGraphAwareAtom,
    rule/Atom.scala:34-43) over instantiated rules: for the 20 most frequent
    (p, object) pairs of the two-graph KG, a rule ?a p C=o <= ?a p ?b ^
    C=o p ?b gets, per atom, the graph set of (p restricted to Object(o)) /
    (p alone) / (p restricted to Subject(o)) — flattened to one row per
    atom position for the oracle."""
    from rdfrules_spark.functions.hashing import h60
    from rdfrules_spark.mining.multigraph import graph_aware_atoms

    quads = _kg_triples_df(spark, sf_dir).withColumn(
        "g",
        F.when(h60(F.col("s")) % 2 == 0, "g0").otherwise("g1"),
    )
    top = (
        quads.select("s", "p", "o").distinct()
        .groupBy("p", "o").count()
        .orderBy(F.desc("count"), "p", "o").limit(20)
    )
    rules = top.select(
        F.concat_ws(
            "|", F.lit("?a"), F.col("p"), F.concat(F.lit("C="), F.col("o"))
        ).alias("head"),
        F.array(
            F.concat_ws("|", F.lit("?a"), F.col("p"), F.lit("?b")),
            F.concat_ws(
                "|", F.concat(F.lit("C="), F.col("o")), F.col("p"),
                F.lit("?b"),
            ),
        ).alias("atoms"),
    )
    out = graph_aware_atoms(rules, quads)
    return out.select(
        "head",
        F.posexplode(
            F.concat(F.array(F.col("head_graphs")), F.col("atom_graphs"))
        ).alias("pos", "_g"),
    ).select(
        "head",
        F.col("pos").cast("int").alias("pos"),
        F.coalesce(F.concat_ws(",", "_g"), F.lit("")).alias("graphs"),
    )


@register(
    "mine_l2_cwa_confidence",
    f"""
    with {_MINE_BASE_SQL},
    j as (select t.p, b.q, b.d as d1
          from t join b on t.s = b.x and t.o = b.y
          where (b.q <> t.p or b.d <> 'f')
            and b.tid <> concat_ws('|', t.s, t.p, t.o)),
    agg as (select p, q, d1, count(*) as support from j group by p, q, d1),
    rules as (
      select agg.p, q, d1, head_size, support,
             support / head_size as head_coverage
      from agg join heads on agg.p = heads.p
      where support >= 2 and support / head_size >= 0.01),
    bsize as (select q, count(*) as body_size from t group by q)
    select p, q, d1, head_size, support, head_coverage, body_size,
           support / body_size as cwa_confidence
    from rules join (select p as q, count(*) as body_size from t group by p)
      using (q)
    """,
)
def q_mine_l2_cwa_confidence(spark, sf_dir):
    from rdfrules_spark.mining.amie import MiningParams, head_sizes, mine_l2
    from rdfrules_spark.mining.measures import cwa_confidence

    t = _kg_triples_df(spark, sf_dir)
    params = MiningParams(min_head_size=50, min_support=2, min_head_coverage=0.01)
    heads = head_sizes(t, params)
    rules = mine_l2(t, heads, params)
    return cwa_confidence(rules, t).select(
        "p", "q", "d1", "head_size", "support", "head_coverage",
        "body_size", "cwa_confidence",
    )


# --------------------------------------------------------------------------
# Prediction + evaluation (reference core:prediction/) and ruleset
# post-processing (core:ruleset/Ruleset.scala)
# --------------------------------------------------------------------------

# L2 ruleset with CWA confidence, tight thresholds (bounds prediction size)
_L2_CONF_SQL = f"""
    {_MINE_BASE_SQL},
    agg as (select t.p, b.q, b.d as d1, count(*) as support
            from t join b on t.s = b.x and t.o = b.y
            where (b.q <> t.p or b.d <> 'f')
            and b.tid <> concat_ws('|', t.s, t.p, t.o)
            group by t.p, b.q, b.d),
    rules as (select agg.p, agg.q, agg.d1, heads.head_size, agg.support,
                     agg.support / heads.head_size as head_coverage
              from agg join heads on agg.p = heads.p
              where agg.support >= 5
                and agg.support / heads.head_size >= 0.1),
    bsize as (select p as q, count(*) as body_size from t group by p),
    rconf as (select r.*, bsize.body_size,
                     r.support / bsize.body_size as conf
              from rules r join bsize using (q)),
    side as (select p, case when count(distinct s) >= count(distinct o)
                            then 'subject' else 'object' end as hc_side
             from t group by p),
    preds as (select r.p, b.x as s, b.y as o, r.q, r.d1, r.conf
              from rconf r join b on b.q = r.q and b.d = r.d1),
    tagged as (
      select pr.p, pr.s, pr.o, pr.q, pr.d1, pr.conf,
             case when k.s is not null then 'Positive'
                  when sd.hc_side = 'subject' and su.e is null then 'PcaPositive'
                  when sd.hc_side = 'object' and ob.e is null then 'PcaPositive'
                  else 'Negative' end as result
      from preds pr
      join side sd on sd.p = pr.p
      left join (select distinct s, p, o from t) k
        on k.s = pr.s and k.p = pr.p and k.o = pr.o
      left join (select distinct p, s as e from t) su
        on su.p = pr.p and su.e = pr.s
      left join (select distinct p, o as e from t) ob
        on ob.p = pr.p and ob.e = pr.o)
"""

_L2_PARAMS = dict(min_head_size=50, min_support=5, min_head_coverage=0.1,
                  max_rule_length=2)


@register(
    "qpca_l2",
    f"""
    with {_L2_CONF_SQL},
    pairs as (select distinct r.p, r.q, r.d1, r.support, b.x as a, b.y as yb
              from rules r join b on b.q = r.q and b.d = r.d1),
    tg as (select pairs.*, sd.hc_side,
                  case when k.s is not null then 1 else 0 end as pos
           from pairs
           join side sd on sd.p = pairs.p
           left join (select distinct s, p, o from t) k
             on k.p = pairs.p and k.s = pairs.a and k.o = pairs.yb),
    perent as (select p, q, d1, support, hc_side,
                      case when hc_side = 'subject' then a else yb end as ent,
                      sum(pos) as pos, sum(1 - pos) as neg
               from tg group by 1, 2, 3, 4, 5, 6),
    ec as (select p, 'subject' as hc_side, s as ent,
                  count(distinct o) as ecard from t group by 1, 3
           union all
           select p, 'object', o, count(distinct s) from t group by 1, 3),
    avgc as (select t.p, case when sd.hc_side = 'subject'
                              then round(count(*) / count(distinct t.s))
                              else round(count(*) / count(distinct t.o))
                         end as avg_card
             from t join side sd on sd.p = t.p group by t.p, sd.hc_side),
    sized as (select pe.p, pe.q, pe.d1, pe.support,
                     cast(sum(pe.pos + greatest(0, pe.neg -
                          greatest(0, av.avg_card - coalesce(ec.ecard, 0))))
                          as bigint) as qpca_body_size
              from perent pe
              join avgc av on av.p = pe.p
              left join ec on ec.p = pe.p and ec.hc_side = pe.hc_side
                          and ec.ent = pe.ent
              group by 1, 2, 3, 4)
    select p, q, d1, support, qpca_body_size,
           round(case when qpca_body_size = 0 then 0.0
                      else support / qpca_body_size end, 6) as qpca_confidence
    from sized
    """,
)
def q_qpca_l2(spark, sf_dir):
    """QPCA confidence (RuleCounting.scala:298-380): PCA with per-entity
    negative budgets from the head predicate's average cardinality."""
    from rdfrules_spark.mining.measures import qpca_confidence

    t, rules = _l2_rules_conf(spark, sf_dir)
    out = qpca_confidence(rules, t)
    return out.select(
        "p", "q", "d1", "support", "qpca_body_size",
        F.round("qpca_confidence", 6).alias("qpca_confidence"),
    )


def _l2_rules_conf(spark, sf_dir):
    from rdfrules_spark.mining.amie import MiningParams, head_sizes, mine_l2
    from rdfrules_spark.mining.measures import cwa_confidence

    t = _kg_triples_df(spark, sf_dir)
    params = MiningParams(**_L2_PARAMS)
    heads = head_sizes(t, params)
    return t, cwa_confidence(mine_l2(t, heads, params), t)


@register(
    "predict_l2_tagged",
    f"""
    with {_L2_CONF_SQL}
    select p, result, count(*) as n, count(distinct (s, o)) as n_pairs
    from tagged group by p, result
    """,
)
def q_predict_l2_tagged(spark, sf_dir):
    """Rule-driven prediction with Positive/PcaPositive/Negative tagging
    (reference core:prediction/Instantiation.scala:37-53)."""
    from rdfrules_spark.prediction import predict_triples

    t, rules = _l2_rules_conf(spark, sf_dir)
    preds = predict_triples(rules, t)
    return preds.groupBy("p", "result").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("s", "o").alias("n_pairs"),
    )


@register(
    "cba_prune_l2",
    f"""
    with {_L2_CONF_SQL},
    pri as (select p, q, d1,
                   row_number() over (
                     order by conf desc, head_coverage desc, support desc,
                              concat(p, '|l2|', q, '|', d1, '|-|-')) as pri
            from rconf),
    ranked as (select pr.p, pr.q, pr.d1,
                      row_number() over (
                        partition by pr.s, pr.p, pr.o order by pi.pri) as rk
               from tagged pr
               join pri pi on pi.p = pr.p and pi.q = pr.q and pi.d1 = pr.d1
               where pr.result = 'Positive')
    select distinct p, q, d1 from ranked where rk = 1
    """,
)
def q_cba_prune_l2(spark, sf_dir):
    """CBA data-coverage pruning (Ruleset.scala:123-149): keep rules that
    cover >= 1 new existing triple in priority order."""
    from rdfrules_spark.prediction import predict_triples
    from rdfrules_spark.ruleset import cba_prune

    t, rules = _l2_rules_conf(spark, sf_dir)
    preds = predict_triples(rules, t)
    return cba_prune(preds, rules).select("p", "q", "d1")


@register(
    "rank_eval_l2",
    f"""
    with {_KG_W_SQL},
    allt as (select distinct concat('w:', s_surf) as s, p,
                    concat('w:', o_surf) as o
             from w where p <> 'dup'),
    t as (select * from allt
          where {h60_sql("concat(s, '|', p, '|', o)")} % 10 <> 0),
    test as (select * from allt
             where {h60_sql("concat(s, '|', p, '|', o)")} % 10 = 0),
    heads as (select p, count(*) as head_size from t group by p
              having count(*) >= 50),
    b as (select s as x, o as y, p as q, 'f' as d,
                 concat_ws('|', s, p, o) as tid from t
          union all
          select o as x, s as y, p as q, 'i' as d,
                 concat_ws('|', s, p, o) from t),
    agg as (select t.p, b.q, b.d as d1, count(*) as support
            from t join b on t.s = b.x and t.o = b.y
            where (b.q <> t.p or b.d <> 'f')
            and b.tid <> concat_ws('|', t.s, t.p, t.o)
            group by t.p, b.q, b.d),
    rules as (select agg.p, agg.q, agg.d1, heads.head_size, agg.support
              from agg join heads on agg.p = heads.p
              where agg.support >= 5
                and agg.support / heads.head_size >= 0.1),
    bsize as (select p as q, count(*) as body_size from t group by p),
    rconf as (select r.*, r.support / bsize.body_size as conf
              from rules r join bsize using (q)),
    preds as (select r.p, b.x as s, b.y as o, max(r.conf) as max_score
              from rconf r join b on b.q = r.q and b.d = r.d1
              group by r.p, b.x, b.y),
    pside as (select p, case when count(distinct s) < count(distinct o)
                             then 'subject' else 'object' end as predict_side
              from t group by p),
    tasks as (select pr.p, sd.predict_side,
                     case when sd.predict_side = 'subject' then pr.o
                          else pr.s end as fixed_entity,
                     case when sd.predict_side = 'subject' then pr.s
                          else pr.o end as candidate,
                     pr.max_score as score
              from preds pr join pside sd on sd.p = pr.p),
    ranked as (select *, row_number() over (
                 partition by p, predict_side, fixed_entity
                 order by score desc, candidate asc) as rank
               from tasks),
    topk as (select * from ranked where rank <= 10),
    truth as (select te.p,
                     coalesce(sd.predict_side, 'object') as predict_side,
                     case when coalesce(sd.predict_side, 'object') = 'subject'
                          then te.o else te.s end as fixed_entity,
                     case when coalesce(sd.predict_side, 'object') = 'subject'
                          then te.s else te.o end as candidate
              from test te left join pside sd on sd.p = te.p),
    j as (select tr.*, tk.rank
          from truth tr
          left join topk tk
            on tk.p = tr.p and tk.predict_side = tr.predict_side
           and tk.fixed_entity = tr.fixed_entity
           and tk.candidate = tr.candidate)
    select count(*) as n_tasks,
           round(avg(coalesce(1.0 / rank, 0.0)), 6) as mrr,
           round(avg(cast(rank as double)), 6) as mr_found,
           round(avg(case when rank <= 1 then 1.0 else 0.0 end), 6) as hits_1,
           round(avg(case when rank <= 3 then 1.0 else 0.0 end), 6) as hits_3,
           round(avg(case when rank <= 10 then 1.0 else 0.0 end), 6) as hits_10
    from j
    """,
)
def q_rank_eval_l2(spark, sf_dir):
    """End-to-end KGC ranking evaluation: deterministic 90/10 train/test
    split -> L2 mining + CWA confidence on train -> max-score candidate
    ranking -> hits@k/MR/MRR vs the held-out triples
    (eval/RankingEvaluationBuilder.scala:6-64)."""
    from rdfrules_spark.functions.hashing import h60
    from rdfrules_spark.mining.amie import MiningParams, head_sizes, mine_l2
    from rdfrules_spark.mining.measures import cwa_confidence
    from rdfrules_spark.prediction import (
        evaluate_ranking,
        predict_triples,
        prediction_tasks,
        score_predictions,
    )

    allt = _kg_triples_df(spark, sf_dir)
    bucket = h60(F.concat_ws("|", "s", "p", "o")) % 10
    train = allt.where(bucket != 0)
    test = allt.where(bucket == 0)
    params = MiningParams(**_L2_PARAMS)
    heads = head_sizes(train, params)
    rules = cwa_confidence(mine_l2(train, heads, params), train)
    scored = score_predictions(predict_triples(rules, train))
    ranked = prediction_tasks(scored, train, top_k=10, score_col="max_score")
    out = evaluate_ranking(ranked, test, ks=(1, 3, 10), train=train)
    return out.select(
        "n_tasks",
        F.round("mrr", 6).alias("mrr"),
        F.round("mr_found", 6).alias("mr_found"),
        F.round("hits_1", 6).alias("hits_1"),
        F.round("hits_3", 6).alias("hits_3"),
        F.round("hits_10", 6).alias("hits_10"),
    )


@register(
    "rule_dbscan_clusters",
    f"""
    with recursive {_KG_W_SQL},
    t as (select distinct concat('w:', s_surf) as s, p, concat('w:', o_surf) as o
          from w where p in {_L4_PREDS}),
    heads as (select p, count(*) as head_size from t group by p
              having count(*) >= 50),
    b as (select s as x, o as y, p as q, 'f' as d,
                 concat_ws('|', s, p, o) as tid from t
          union all
          select o as x, s as y, p as q, 'i' as d,
                 concat_ws('|', s, p, o) from t),
    m as (select t.p, t.s as a, t.o as bb, b.q, b.d, b.tid
          from t join b on t.s = b.x and t.o = b.y
          where (b.q <> t.p or b.d <> 'f')
            and b.tid <> concat_ws('|', t.s, t.p, t.o)),
    l2 as (select p, 'l2' as shape, q, d as d1, cast(null as varchar) as r,
                  cast(null as varchar) as d2, count(*) as support
           from m group by 1, 3, 4),
    l3v2 as (select m0.p, 'l3v2' as shape, m0.q, m0.d as d1,
                    m1.q as r, m1.d as d2, count(*) as support
             from m m0 join m m1
               on m0.p = m1.p and m0.a = m1.a and m0.bb = m1.bb
             where (m0.q, m0.d) < (m1.q, m1.d) and m0.tid <> m1.tid
             group by 1, 3, 4, 5, 6),
    l3v3 as (select t.p, 'l3v3' as shape, b1.q, b1.d as d1,
                    b2.q as r, b2.d as d2,
                    count(distinct (t.s, t.o)) as support
             from t join b b1 on t.s = b1.x
                    join b b2 on t.o = b2.x and b1.y = b2.y
             where b1.tid <> b2.tid
               and b1.tid <> concat_ws('|', t.s, t.p, t.o)
               and b2.tid <> concat_ws('|', t.s, t.p, t.o)
             group by 1, 3, 4, 5, 6),
    allr as (select * from l2 union all select * from l3v2
             union all select * from l3v3),
    rr as (select allr.p, shape, q, d1, r, d2, support, heads.head_size,
                  support / heads.head_size as hc,
                  concat_ws('|', allr.p, shape, q, d1,
                            coalesce(r, '-'), coalesce(d2, '-')) as rid,
                  case when r is null then [concat(q, '|', d1)]
                       else list_distinct([concat(q, '|', d1),
                                           concat(r, '|', d2)]) end as atoms
           from allr join heads on allr.p = heads.p
           where support >= 2 and support / heads.head_size >= 0.05),
    base as (select * from (select rr.*, row_number() over
                    (partition by p order by hc desc, rid) as rk from rr)
             where rk <= 60),
    sims as (select a.p, a.rid as ra, b.rid as rb
             from base a join base b on a.p = b.p and a.rid < b.rid
             where 0.5 * (case when len(list_distinct(
                                 list_concat(a.atoms, b.atoms))) > 0
                          then cast(len(list_intersect(a.atoms, b.atoms))
                                    as double)
                               / len(list_distinct(
                                     list_concat(a.atoms, b.atoms)))
                          else 0.0 end)
                   + 0.5 * (1.0 - abs(a.hc - b.hc)) >= 0.8),
    sym as (select ra as a, rb as b from sims
            union all select rb, ra from sims),
    deg as (select a, count(*) as d from sym group by a),
    core as (select a as n from deg where d >= 2),
    ce as (select s.a, s.b from sym s
           join core c1 on c1.n = s.a join core c2 on c2.n = s.b),
    reach(a, b) as (
      select a, b from ce
      union
      select r.a, e.b from reach r join ce e on r.b = e.a
    ),
    lab0 as (select a as node, least(min(b), a) as label
             from reach group by a),
    lone as (select n as node, n as label from core
             where n not in (select node from lab0)),
    border as (select s.a as node, min(l.label) as label
               from sym s
               join core cb on cb.n = s.b
               join (select node, label from lab0
                     union all select node, label from lone) l
                 on l.node = s.b
               where s.a not in (select n from core)
               group by s.a),
    labels as (select * from lab0 union all select * from lone
               union all select * from border)
    select rr.p, count(distinct coalesce(labels.label, rr.rid)) as n_clusters,
           count(*) as n_rules
    from rr left join labels on labels.node = rr.rid
    group by rr.p
    """,
)
def q_rule_dbscan_clusters(spark, sf_dir):
    """DBSCAN rule clustering (DbScan.scala:10-57) with a recursive-CTE
    transitive-closure oracle (cluster counts per head predicate)."""
    from rdfrules_spark.mining.amie import MiningParams, mine
    from rdfrules_spark.ruleset import dbscan_clusters

    # same 4-predicate slice as mine_l4_rules: the full synthetic KG
    # yields ~150k rules whose mining CTEs grind the SQL oracle; the
    # clustering semantics are fully exercised on the slice
    t = _kg_triples_df(spark, sf_dir).where(
        F.col("p").isin("join", "scan", "filter", "hash")
    )
    params = MiningParams(min_head_size=50, min_support=2,
                          min_head_coverage=0.05)
    # materialize once: dbscan references the ruleset from several plan
    # branches (similarity base + final label join)
    rules = mine(t, params).localCheckpoint(eager=True)
    # sim 0.8 / top-60 per group: keeps the epsilon-graph sparse enough
    # for the oracle's recursive-CTE transitive closure (a dense
    # near-clique graph makes the closure intermediate explode)
    out = dbscan_clusters(rules, min_similarity=0.8, min_neighbours=2,
                          max_group=60)
    return out.groupBy("p").agg(
        F.countDistinct("cluster").alias("n_clusters"),
        F.count(F.lit(1)).alias("n_rules"),
    )


@register(
    "lift_l2",
    f"""
    with {_L2_CONF_SQL},
    card as (select p, count(distinct s) as ns, count(distinct o) as no
             from t group by p),
    smode as (select p, max(c) as smode from
              (select p, s, count(*) as c from t group by p, s)
              group by p),
    omode as (select p, max(c) as omode from
              (select p, o, count(*) as c from t group by p, o)
              group by p),
    sz as (select p, count(*) as size_full from t group by p),
    mp as (select card.p,
                  (case when ns < no then smode else omode end)
                  / size_full as mode_probability
           from card join smode using (p) join omode using (p)
           join sz using (p))
    select r.p, r.q, r.d1, r.support, mp.mode_probability,
           r.conf / mp.mode_probability as lift
    from rconf r join mp on mp.p = r.p
    """,
)
def q_lift_l2(spark, sf_dir):
    """Lift measure (RuleCounting.scala:127-141)."""
    from rdfrules_spark.mining.measures import lift

    t, rules = _l2_rules_conf(spark, sf_dir)
    return lift(rules, t).select(
        "p", "q", "d1", "support", "mode_probability",
        F.col("lift").alias("lift"),
    )


@register(
    "mine_constants_l2_object",
    f"""
    with {_MINE_BASE_SQL},
    l2 as (select t.p, b.q, b.d as d1, count(*) as support
           from t join b on t.s = b.x and t.o = b.y
           where (b.q <> t.p or b.d <> 'f')
            and b.tid <> concat_ws('|', t.s, t.p, t.o)
           group by t.p, b.q, b.d),
    l2r as (select concat('?a|', l2.p, '|?b') as head, l2.p,
                   case when d1 = 'f' then concat('?a|', q, '|?b')
                        else concat('?b|', q, '|?a') end as body,
                   support, heads.head_size
            from l2 join heads on l2.p = heads.p
            where support >= 3 and support / heads.head_size >= 0.04),
    ih as (select p, o as A, s as f from t
           where p in (select p from heads)),
    ca as (select s as x, p as q2, o as cst from t),
    s6 as (select ih.p, ih.A, ca.q2, ca.cst,
                  count(distinct ih.f) as support
           from ih join ca on ca.x = ih.f
           where not (ca.q2 = ih.p and ca.cst = ih.A)
           group by ih.p, ih.A, ca.q2, ca.cst),
    s6r as (select concat('?a|', s6.p, '|C=', s6.A) as head, s6.p,
                   concat('?a|', q2, '|C=', cst) as body,
                   support, heads.head_size
            from s6 join heads on s6.p = heads.p
            where support >= 3 and support / heads.head_size >= 0.04)
    select head, body, support, head_size,
           support / head_size as head_coverage
    from (select * from l2r union all select * from s6r)
    """,
)
def q_mine_constants_l2_object(spark, sf_dir):
    """Length-2 mining with object-position constants (instantiated heads
    (?a p C) + instantiated body atoms; HeadsFetcher.scala:24-92,
    RuleConstraint.ConstantsAtPosition)."""
    from rdfrules_spark.mining.amie import MiningParams
    from rdfrules_spark.mining.constants import mine_constants

    t = _kg_triples_df(spark, sf_dir)
    params = MiningParams(min_head_size=50, min_support=3,
                          min_head_coverage=0.04, max_rule_length=2)
    out = mine_constants(t, params, constants="object")
    return out.select(
        "head",
        F.array_join(F.array_sort("atoms"), ";").alias("body"),
        "support", "head_size", "head_coverage",
    )


@register(
    "mine_constants_l2_qb",
    f"""
    with {_MINE_BASE_SQL},
    l2 as (select t.p, b.q, b.d as d1, count(*) as support
           from t join b on t.s = b.x and t.o = b.y
           where (b.q <> t.p or b.d <> 'f')
           group by t.p, b.q, b.d),
    l2r as (select concat('?a|', l2.p, '|?b') as head, l2.p,
                   case when d1 = 'f' then concat('?a|', q, '|?b')
                        else concat('?b|', q, '|?a') end as body,
                   support, heads.head_size
            from l2 join heads on l2.p = heads.p
            where support >= 3 and support / heads.head_size >= 0.04),
    ih as (select p, o as A, s as f from t
           where p in (select p from heads)),
    ca as (select s as x, p as q2, o as cst from t),
    ca_ok as (select q2, cst from ca group by q2, cst
              having count(distinct x) >= 2),
    s6 as (select ih.p, ih.A, ca.q2, ca.cst,
                  count(distinct ih.f) as support
           from ih join ca on ca.x = ih.f
           join ca_ok on ca.q2 = ca_ok.q2 and ca.cst = ca_ok.cst
           where not (ca.q2 = ih.p and ca.cst = ih.A)
           group by ih.p, ih.A, ca.q2, ca.cst),
    s6r as (select concat('?a|', s6.p, '|C=', s6.A) as head, s6.p,
                   concat('?a|', q2, '|C=', cst) as body,
                   support, heads.head_size
            from s6 join heads on s6.p = heads.p
            where support >= 3 and support / heads.head_size >= 0.04)
    select head, body, support, head_size,
           support / head_size as head_coverage
    from (select * from l2r union all select * from s6r)
    """,
)
def q_mine_constants_l2_qb(spark, sf_dir):
    """Executable-spec L2 constants mining: plain support counting + the
    generation-time QuasiBindingFilter (RuleRefinement.scala:175,
    RuleFilter.scala:334 — an instantiated fresh atom must admit >= 2
    distinct bindings of its variable). Set-verified against the executed
    reference snapshot in tests/test_refexec_parity.py; this entry keeps
    the law under the independent DuckDB oracle too."""
    from rdfrules_spark.mining.amie import MiningParams
    from rdfrules_spark.mining.constants import mine_constants

    t = _kg_triples_df(spark, sf_dir)
    params = MiningParams(min_head_size=50, min_support=3,
                          min_head_coverage=0.04, max_rule_length=2)
    out = mine_constants(t, params, constants="object", quasi_binding=True)
    return out.select(
        "head",
        F.array_join(F.array_sort("atoms"), ";").alias("body"),
        "support", "head_size", "head_coverage",
    )


# --------------------------------------------------------------------------
# Round-2 additions: graph split, rule instantiation, rule lattice,
# NonRedundantTopRules aggregator, auto-discretization
# --------------------------------------------------------------------------


@register(
    "graph_split_sizes",
    f"""
    with t as ({_REL_TRIPLES_SQL})
    select 'train' as part, count(*) as n from t where g = 'customer'
    union all
    select 'test', count(*) from t where g = 'orders'
    """,
)
def q_graph_split_sizes(spark, sf_dir):
    """Dataset.index(trainGraph, testGraph) by graph membership
    (TrainTestIndex): partition-pruned filters, no shuffle."""
    from rdfrules_spark.operators.sampling import graph_split

    train, test = graph_split(rel_triples(spark, sf_dir), "customer", "orders")
    a = train.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("train").alias("part"), "n"
    )
    b = test.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("test").alias("part"), "n"
    )
    return a.unionByName(b)


@register(
    "instantiate_l2",
    f"""
    with {_MINE_BASE_SQL},
    agg as (select t.p, b.q, b.d as d1, count(*) as support
            from t join b on t.s = b.x and t.o = b.y
            where (b.q <> t.p or b.d <> 'f')
              and b.tid <> concat_ws('|', t.s, t.p, t.o)
            group by t.p, b.q, b.d),
    rules as (select agg.p, agg.q, agg.d1
              from agg join heads on agg.p = heads.p
              where agg.support >= 5
                and agg.support / heads.head_size >= 0.1)
    select r.p, 'l2' as shape, r.q, r.d1, b.x as va, b.y as vb
    from rules r join b on b.q = r.q and b.d = r.d1
    """,
)
def q_instantiate_l2(spark, sf_dir):
    """InstantiatedRuleset (Ruleset.scala:222-224, Instantiation.scala:59-80):
    every concrete variable binding of each mined L2 rule."""
    from rdfrules_spark.mining.amie import MiningParams, head_sizes, mine_l2
    from rdfrules_spark.ruleset import instantiate_rules

    t = _kg_triples_df(spark, sf_dir)
    params = MiningParams(**_L2_PARAMS)
    rules = mine_l2(t, head_sizes(t, params), params)
    inst = instantiate_rules(rules, t)
    return inst.select("p", "shape", "q", "d1", "va", "vb")


@register(
    "rule_parents_l3",
    f"""
    with {_MINE_BASE_SQL},
    m as (select t.p, t.s, t.o, b.q, b.d, b.tid
          from t join b on t.s = b.x and t.o = b.y
          where (b.q <> t.p or b.d <> 'f')
            and b.tid <> concat_ws('|', t.s, t.p, t.o)),
    l2agg as (select p, q, d as d1, count(*) as support
              from m group by p, q, d),
    l2 as (select l2agg.p, l2agg.q, l2agg.d1
           from l2agg join heads on l2agg.p = heads.p
           where support >= 2 and support / heads.head_size >= 0.05),
    l3agg as (select m1.p, m1.q, m1.d as d1, m2.q as r, m2.d as d2,
                     count(*) as support
              from m m1 join m m2
                on m1.s = m2.s and m1.o = m2.o and m1.p = m2.p
              where (m1.q < m2.q or (m1.q = m2.q and m1.d < m2.d))
                and m1.tid <> m2.tid
              group by m1.p, m1.q, m1.d, m2.q, m2.d),
    l3 as (select l3agg.p, l3agg.q, l3agg.d1, l3agg.r, l3agg.d2
           from l3agg join heads on l3agg.p = heads.p
           where support >= 2 and support / heads.head_size >= 0.05)
    select distinct child_p, child_shape, child_q, child_d1, child_r,
                    child_d2, parent_p, parent_shape, parent_q, parent_d1
    from (
      select c.p as child_p, 'l3v2' as child_shape, c.q as child_q,
             c.d1 as child_d1, c.r as child_r, c.d2 as child_d2,
             l2.p as parent_p, 'l2' as parent_shape, l2.q as parent_q,
             l2.d1 as parent_d1
      from l3 c join l2 on l2.p = c.p and l2.q = c.q and l2.d1 = c.d1
      union all
      select c.p, 'l3v2', c.q, c.d1, c.r, c.d2, l2.p, 'l2', l2.q, l2.d1
      from l3 c join l2 on l2.p = c.p and l2.q = c.r and l2.d1 = c.d2
    ) e
    """,
)
def q_rule_parents_l3(spark, sf_dir):
    """Rule lattice edges (ruleset/ops/Treeable.scala:14-60): each l3v2
    rule's closed L2 sub-rules over the same head."""
    from rdfrules_spark.mining.amie import MiningParams, mine
    from rdfrules_spark.ruleset import rule_parents

    t = _kg_triples_df(spark, sf_dir)
    rules = mine(t, MiningParams(min_head_size=50, min_support=2,
                                 min_head_coverage=0.05))
    return rule_parents(rules)


@register(
    "non_redundant_top",
    f"""
    with {_L2_CONF_SQL},
    cl as (select q, d1, substr(md5(q), 1, 1) as cluster
           from (select distinct q, d1 from rconf)
           where substr(md5(q), 1, 1) between '0' and '7'),
    px as (select pr.p, pr.s, pr.o, pr.q, pr.d1, pr.conf,
                  coalesce(cl.cluster, '-1') as cluster
           from tagged pr left join cl on cl.q = pr.q and cl.d1 = pr.d1),
    best as (select *, row_number() over (
               partition by s, p, o, cluster
               order by conf desc, p, q, d1) as cr from px),
    topk as (select *, row_number() over (
               partition by s, p, o
               order by conf desc, p, q, d1) as tr
             from best where cr = 1)
    select s, p, o, q, d1, round(conf, 6) as conf
    from topk where tr <= 2
    """,
)
def q_non_redundant_top(spark, sf_dir):
    """NonRedundantTopRules (prediction/aggregator/NonRedundantTopRules
    .scala:11-37): per predicted triple keep the best rule per rule cluster,
    then the global top-2. Clusters assigned deterministically (md5 bucket
    of q, half the rules left unclustered to exercise the -1 bucket)."""
    from rdfrules_spark.prediction import non_redundant_top_rules, predict_triples
    from rdfrules_spark.ruleset import RULE_KEY

    t, rules = _l2_rules_conf(spark, sf_dir)
    preds = predict_triples(rules, t)
    clusters = (
        rules.select(*RULE_KEY).distinct()
        .withColumn("cluster", F.substring(F.md5("q"), 1, 1))
        .where(F.col("cluster").between("0", "7"))
    )
    best = non_redundant_top_rules(preds, clusters, k=2)
    return best.select("s", "p", "o", "q", "d1",
                       F.round("conf", 6).alias("conf"))


@register(
    "autodiscretize_intervals",
    f"""
    with recursive t as (select s, p, o from ({_REL_TRIPLES_SQL})),
    inc as (select distinct s as e, p from t
            union select distinct o, p from t),
    nb as (select distinct a.p, b.p as q
           from inc a join inc b using (e) where a.p <> b.p),
    r1 as (select q from nb where p = 'c_acctbal_cents'),
    r2 as (select distinct nb.q from nb join r1 on nb.p = r1.q),
    reach as (select 'c_acctbal_cents' as p
              union select q from r1 union select q from r2),
    sizes as (select p, count(*) as n from t group by p),
    qual as (select n from sizes join reach using (p) where n >= 50),
    bounds as (select cast(ceil(0.1 * min(n)) as bigint) as lower_,
                      cast(ceil(0.1 * max(n)) as bigint) as upper_
               from qual),
    vals as (select s, try_cast(o as double) as v from t
             where p = 'c_acctbal_cents' and try_cast(o as double) is not null),
    hist as (select v, count(*) as c from vals group by v),
    cum as (select v, sum(c) over (order by v) as cum from hist),
    tot as (select max(cum) as n from cum),
    nodes(level, lo, hi, plo, phi) as (
      select 0, cast(0 as bigint), n, cast(-1 as bigint), cast(-1 as bigint)
      from tot
      union all
      select level + 1, lo + ((hi - lo) * j) // 2,
             lo + ((hi - lo) * (j + 1)) // 2, lo, hi
      from nodes, unnest([0, 1]) as u(j), bounds
      where (hi - lo) // 2 >= lower_
    ),
    nv as (select level, lo, hi, plo, phi,
                  (select min(v) from cum where cum > lo) as vlo,
                  (select min(v) from cum where cum > hi - 1) as vhi
           from nodes),
    nd as (select c.*,
                  (p.vlo is not null and c.vlo = p.vlo and c.vhi = p.vhi)
                    as dropped
           from nv c left join nv p on c.plo = p.lo and c.phi = p.hi
                                   and c.level = p.level + 1),
    cut as (select n.level, n.lo, n.hi,
                   bool_and(k.hi - k.lo >= bounds.upper_) as cutoff
            from nd n join nd k on k.plo = n.lo and k.phi = n.hi
                               and k.level = n.level + 1
                               and not k.dropped, bounds
            group by n.level, n.lo, n.hi),
    iv as (select n.level, n.lo, n.vlo, n.vhi from nd n
           left join cut on cut.level = n.level and cut.lo = n.lo
                        and cut.hi = n.hi
           where n.level >= 1 and not n.dropped
             and not coalesce(cut.cutoff, false)),
    assigned as (select vals.s, vals.v, iv.level, iv.vlo, iv.vhi,
                        row_number() over (
                          partition by vals.s, vals.v, iv.level
                          order by iv.lo) as rk
                 from vals join iv
                   on vals.v >= iv.vlo and vals.v <= iv.vhi)
    select s, concat('c_acctbal_cents#discretized_level_', level) as p,
           concat('[', cast(vlo as varchar), ';', cast(vhi as varchar), ')')
             as o
    from assigned where rk = 1
    """,
)
def q_autodiscretize_intervals(spark, sf_dir):
    """Auto-discretization of an indexed dataset (index/ops/
    DiscretizationOps.scala:18-247): hop-bounded support bounds ->
    EquisizeTree per numeric predicate -> interval quads per tree level."""
    from rdfrules_spark.operators.autodiscretize import (
        AutoDiscretizationTask,
        auto_discretize,
    )

    t = rel_triples(spark, sf_dir).select("s", "p", "o")
    return auto_discretize(
        t,
        AutoDiscretizationTask(
            min_head_size=50, min_head_coverage=0.1, max_rule_length=3,
            arity=2, predicates=["c_acctbal_cents"],
        ),
    )


@register(
    "sql_dump_triples",
    """
    select concat('nation/n_nationkey/', n_nationkey) as s,
           'n_name' as p, n_name as o from nation
    union all
    select concat('nation/n_nationkey/', n_nationkey), 'n_regionkey',
           concat('region/r_regionkey/', n_regionkey) from nation
    """,
)
def q_sql_dump_triples(spark, sf_dir):
    """SQL-dump reader (data/formats/Sql.scala:134-166): a deterministic
    mysqldump-style dump of the nation table (PK n_nationkey, FK
    n_regionkey -> region.r_regionkey) is written to a temp file, parsed
    back distributed, and must reproduce the relational unpivot."""
    import os
    import tempfile

    from rdfrules_spark.sources.formats import read_sql_dump

    rows = sorted(
        (r["n_nationkey"], r["n_name"], r["n_regionkey"])
        for r in _t(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey").collect()
    )
    dump = [
        "CREATE TABLE nation (\n"
        "  n_nationkey INT PRIMARY KEY,\n"
        "  n_name VARCHAR(32),\n"
        "  n_regionkey INT,\n"
        "  FOREIGN KEY (n_regionkey) REFERENCES region (r_regionkey)\n"
        ");"
    ]
    vals = ", ".join(
        "({}, '{}', {})".format(k, n.replace("'", "''"), g)
        for k, n, g in rows
    )
    dump.append(f"INSERT INTO nation VALUES {vals};")
    d = tempfile.mkdtemp(prefix="sqldump_")
    path = os.path.join(d, "nation.sql")
    with open(path, "w") as f:
        f.write("\n".join(dump))
    return read_sql_dump(spark, path).select("s", "p", "o")


# --------------------------------------------------------------------------
# Scalar-function surface (SURVEY §2.10: URI explode, interval literals)
# and prediction stats/conversions (SURVEY §2.9 tail)
# --------------------------------------------------------------------------

@register(
    "uri_explode_parts",
    """
    with u as (
      select concat('http://tpch.example.org/customer/',
                    cast(c_custkey as varchar)) as uri from customer
      union all
      select concat('http://tpch.example.org/nation#', n_name) from nation
      union all
      select r_name from region
    ),
    e as (select regexp_extract(uri, '^(.+[/#])(.+)$', 1) as name_space,
                 case when regexp_extract(uri, '^(.+[/#])(.+)$', 2) = ''
                      then uri
                      else regexp_extract(uri, '^(.+[/#])(.+)$', 2)
                 end as local_name
          from u)
    select name_space, count(*) as n, count(distinct local_name) as n_local
    from e group by name_space
    """,
)
def q_uri_explode_parts(spark, sf_dir):
    """URI namespace/localName split on the last '/' or '#'
    (core:data/TripleItem.scala:53-65 explode; '' namespace fallback)."""
    from rdfrules_spark.functions.scalar import uri_explode

    u = (
        _t(spark, sf_dir, "customer")
        .select(
            F.concat(
                F.lit("http://tpch.example.org/customer/"),
                F.col("c_custkey").cast("string"),
            ).alias("uri")
        )
        .unionByName(
            _t(spark, sf_dir, "nation").select(
                F.concat(
                    F.lit("http://tpch.example.org/nation#"), F.col("n_name")
                ).alias("uri")
            )
        )
        .unionByName(
            _t(spark, sf_dir, "region").select(F.col("r_name").alias("uri"))
        )
    )
    e = u.select(uri_explode("uri").alias("x")).select("x.*")
    return e.groupBy("name_space").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("local_name").alias("n_local"),
    )


_IVL_SQL_RE = r"^(\[|\()\s*(.+?)\s*;\s*(.+?)\s*(\]|\))$"


@register(
    "interval_membership",
    f"""
    with iv as (
      select concat(case when o_orderkey % 2 = 0 then '[' else '(' end,
                    cast(o_orderkey % 7 as varchar), ';',
                    cast(o_orderkey % 7 + 5 as varchar),
                    case when o_orderkey % 3 = 0 then ']' else ')' end) as txt,
             cast(o_custkey % 12 as double) as v
      from orders
      union all select 'not-an-interval', 1.0 from region
    ),
    p as (select txt, v,
                 regexp_extract(txt, '{_IVL_SQL_RE}', 1) = '[' as l_incl,
                 try_cast(regexp_extract(txt, '{_IVL_SQL_RE}', 2) as double)
                   as lv,
                 try_cast(regexp_extract(txt, '{_IVL_SQL_RE}', 3) as double)
                   as rv,
                 regexp_extract(txt, '{_IVL_SQL_RE}', 4) = ']' as r_incl,
                 regexp_extract(txt, '{_IVL_SQL_RE}', 1) <> '' as ok
          from iv)
    select case when not ok or lv is null or rv is null then 'invalid'
                when (case when l_incl then v >= lv else v > lv end)
                 and (case when r_incl then v <= rv else v < rv end)
                then 'in' else 'out' end as membership,
           count(*) as n
    from p group by 1
    """,
)
def q_interval_membership(spark, sf_dir):
    """Interval literal parse + membership (TripleItem.scala:147-183):
    synthetic '[a;b)' literals over orders, bucketed in/out/invalid."""
    from rdfrules_spark.functions.scalar import interval_contains, parse_interval

    iv = (
        _t(spark, sf_dir, "orders")
        .select(
            F.concat(
                F.when(F.col("o_orderkey") % 2 == 0, F.lit("[")).otherwise(
                    F.lit("(")
                ),
                (F.col("o_orderkey") % 7).cast("string"),
                F.lit(";"),
                (F.col("o_orderkey") % 7 + 5).cast("string"),
                F.when(F.col("o_orderkey") % 3 == 0, F.lit("]")).otherwise(
                    F.lit(")")
                ),
            ).alias("txt"),
            (F.col("o_custkey") % 12).cast("double").alias("v"),
        )
        .unionByName(
            _t(spark, sf_dir, "region").select(
                F.lit("not-an-interval").alias("txt"), F.lit(1.0).alias("v")
            )
        )
    )
    parsed = iv.select(parse_interval("txt").alias("ivl"), "v")
    member = interval_contains(F.col("ivl"), "v")
    return (
        parsed.select(
            F.when(F.col("ivl").isNull(), "invalid")
            .when(member, "in")
            .otherwise("out")
            .alias("membership")
        )
        .groupBy("membership")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "prediction_task_stats",
    f"""
    with {_L2_CONF_SQL},
    scored as (select p, s, o, max(conf) as max_score
               from preds group by 1, 2, 3),
    pside as (select p, case when count(distinct s) < count(distinct o)
                             then 'subject' else 'object' end as predict_side
              from t group by p),
    tasks as (select sc.p, sd.predict_side,
                     case when sd.predict_side = 'subject' then sc.o
                          else sc.s end as fixed_entity,
                     case when sd.predict_side = 'subject' then sc.s
                          else sc.o end as candidate,
                     sc.max_score as score
              from scored sc join pside sd on sd.p = sc.p),
    ranked as (select *, row_number() over (
                 partition by p, predict_side, fixed_entity
                 order by score desc, candidate asc) as rank
               from tasks),
    topk as (select * from ranked where rank <= 10),
    per_task as (select p, predict_side, fixed_entity, count(*) as n_cand
                 from topk group by 1, 2, 3),
    ds as (select count(*) as n_distinct_triples from (
             select distinct
               case when predict_side = 'subject' then candidate
                    else fixed_entity end as s,
               p,
               case when predict_side = 'subject' then fixed_entity
                    else candidate end as o
             from topk))
    select (select count(*) from per_task) as n_tasks,
           (select sum(n_cand) from per_task) as n_candidates,
           (select count(distinct p) from per_task) as n_predicates,
           (select round(avg(n_cand), 6) from per_task) as avg_candidates,
           n_distinct_triples
    from ds
    """,
)
def q_prediction_task_stats(spark, sf_dir):
    """Prediction-task stats (eval/StatsBuilder.scala; EvaluationResult.
    Stats) + the ToDataset conversion cardinality
    (http:task/predictionTasks/ToDataset.scala)."""
    from rdfrules_spark.prediction import (
        predict_triples,
        prediction_task_stats,
        prediction_tasks,
        score_predictions,
        tasks_to_dataset,
    )

    t, rules = _l2_rules_conf(spark, sf_dir)
    scored = score_predictions(predict_triples(rules, t))
    ranked = prediction_tasks(scored, t, top_k=10, score_col="max_score")
    stats = prediction_task_stats(ranked)
    n_ds = tasks_to_dataset(ranked).agg(
        F.count(F.lit(1)).alias("n_distinct_triples")
    )
    return stats.crossJoin(n_ds)


# --------------------------------------------------------------------------
# IVF with a trained k-means codebook (similarity-search scale path)
# --------------------------------------------------------------------------

def _km_assign_sql(out: str, cents: str) -> str:
    """Argmax-cosine assignment of v to centroid table `cents` (ties to the
    lower c_id) — one Lloyd half-step, mirrors similarity.ivf_assign."""
    d = _dot_sql("ve", "cv")
    n = f"({_norm_sql('ve')} * {_norm_sql('cv')})"
    return f"""
    {out} as (
      select vec_id, ve, c_id as bucket from (
        select v.vec_id, v.ve, c.c_id,
               row_number() over (partition by v.vec_id
                                  order by {d} / {n} desc, c.c_id) as r
        from v, {cents} c) where r = 1)"""


def _km_update_sql(out: str, assigned: str, prev: str) -> str:
    """Per-(bucket, dimension) mean -> new centroid list; empty clusters
    keep the previous centroid — one Lloyd half-step, mirrors
    similarity.kmeans_centroids."""
    return f"""
    {out}_m as (
      select bucket, d.i as dim, avg(ve[d.i]) as mval
      from {assigned}, (select unnest(generate_series(1, 64)) as i) d
      group by 1, 2),
    {out}_u as (
      select bucket, list(mval order by dim) as nv from {out}_m group by 1),
    {out} as (
      select {prev}.c_id, coalesce({out}_u.nv, {prev}.cv) as cv
      from {prev} left join {out}_u on {prev}.c_id = {out}_u.bucket)"""


_KM_FINAL_DOT = _dot_sql("a.ve", "p.qv")
_KM_FINAL_NORM = f"({_norm_sql('a.ve')} * {_norm_sql('p.qv')})"
_KM_Q_DOT = _dot_sql("qv", "cv")
_KM_Q_NORM = f"({_norm_sql('qv')} * {_norm_sql('cv')})"


@register(
    "ivf_kmeans_topk",
    f"""
    with v as (select vec_id, {_VD} as ve from embeddings),
    c0 as (select vec_id as c_id, ve as cv from v order by vec_id limit 16),
    {_km_assign_sql('ka1', 'c0')},
    {_km_update_sql('c1', 'ka1', 'c0')},
    {_km_assign_sql('ka2', 'c1')},
    {_km_update_sql('c2', 'ka2', 'c1')},
    {_km_assign_sql('assigned', 'c2')},
    q as (select vec_id as q_id, ve as qv from v order by vec_id limit 5),
    probes as (
      select q_id, qv, c_id as bucket from (
        select q.q_id, q.qv, c.c_id,
               row_number() over (partition by q.q_id
                                  order by {_KM_Q_DOT} / {_KM_Q_NORM} desc,
                                           c.c_id) as r
        from q, c2 c) where r <= 4),
    scored as (
      select p.q_id, a.vec_id,
             {_KM_FINAL_DOT} / {_KM_FINAL_NORM} as cosine
      from assigned a join probes p on a.bucket = p.bucket),
    r as (select q_id, vec_id, cosine,
                 row_number() over (partition by q_id
                                    order by cosine desc, vec_id) as rank
          from scored)
    select q_id, vec_id, rank, round(cosine, 6) as cosine
    from r where rank <= 10
    """,
)
def q_ivf_kmeans_topk(spark, sf_dir):
    """IVF top-k with a TRAINED codebook: 2 deterministic Lloyd iterations
    (first-16 init) refine the centroids before bucketing/probing. The
    oracle unrolls both iterations as CTEs with identical tie-breaks."""
    from rdfrules_spark.operators.similarity import ivf_topk, kmeans_centroids

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    cents = kmeans_centroids(emb, 16, iters=2)
    qs = (
        emb.orderBy("vec_id")
        .limit(5)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    )
    out = ivf_topk(emb, qs, k=10, nprobe=4, centroids=cents)
    return out.select(
        "q_id", "vec_id", "rank", F.round("cosine", 6).alias("cosine")
    )


# --------------------------------------------------------------------------
# Structured Streaming (bounded availableNow drains -> batch results)
# The reference is batch-only; these prove the streaming path (readStream +
# foreach-batch / stateful dedup) computes EXACTLY what the batch operators
# compute, which is the module's design contract (streaming/ingest.py reuses
# the batch stage transforms verbatim).
# --------------------------------------------------------------------------


def _drain_stream(df, output_mode: str):
    """Run a bounded availableNow stream into a memory sink; return the
    drained result as a batch DataFrame (unique sink name + throwaway
    checkpoint per call so the driver can re-invoke the query freely)."""
    import tempfile
    import uuid

    name = "strm_" + uuid.uuid4().hex[:12]
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix=name + "_ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return df.sparkSession.table(name)


@register(
    "stream_extract_pred_counts",
    f"""
    with {_KG_W_SQL}
    select p, count(*) as cnt from w where p <> 'dup' group by p
    """,
)
def q_stream_extract_pred_counts(spark, sf_dir):
    """Streaming analog of kg_extract_pred_counts: file-source readStream
    over documents.parquet -> batch extraction transform -> windowless
    streaming aggregation (complete mode). Must equal the batch answer."""
    from rdfrules_spark.streaming import (
        stream_plain_documents,
        stream_statements,
    )

    stmts = stream_statements(
        stream_plain_documents(spark, f"{sf_dir}/documents.parquet"),
        window3=True,
    )
    agg = stmts.where(F.col("p") != "dup").groupBy("p").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return _drain_stream(agg, "complete")


@register(
    "stream_dedup_distinct_counts",
    f"""
    with {_KG_W_SQL}
    select p, count(distinct (s_surf, o_surf)) as n_distinct from w group by p
    """,
)
def q_stream_dedup_distinct_counts(spark, sf_dir):
    """applyInPandasWithState exact streaming dedup (streaming/ingest.py
    dedup_statements_stateful): each distinct (s_surf,p,o_surf) statement is
    emitted exactly once across the stream, so a batch count(*) per p over
    the drained output equals the batch count(distinct) per p."""
    from rdfrules_spark.streaming import (
        dedup_statements_stateful,
        stream_plain_documents,
        stream_statements,
    )

    stmts = stream_statements(
        stream_plain_documents(spark, f"{sf_dir}/documents.parquet"),
        window3=True,
    ).select("s_surf", "p", "o_surf")
    drained = _drain_stream(dedup_statements_stateful(stmts), "append")
    return drained.groupBy("p").agg(F.count(F.lit(1)).alias("n_distinct"))


@register(
    "http_pipeline_histogram",
    f"""
    with t as ({_REL_TRIPLES_SQL})
    select p, cast(count(*) as bigint) as cnt
    from t where g = 'orders' group by p
    """,
)
def q_http_pipeline_histogram(spark, sf_dir):
    """End-to-end JSON task pipeline (http_pipeline.run_pipeline_json — the
    reference's `bin/main task.json` entry point): LoadDataset over the
    engine's native parquet cache -> FilterQuads(graph) -> Histogram, over
    the same relational->triples view as rel_to_triples_histogram. The
    triples are materialized once to a scratch parquet because LoadDataset,
    like the reference task, takes a PATH."""
    import tempfile

    from rdfrules_spark.http_pipeline import run_pipeline_json

    path = f"{tempfile.gettempdir()}/rdfrules_http_pipeline_triples.parquet"
    rel_triples(spark, sf_dir).write.mode("overwrite").parquet(path)
    return run_pipeline_json(spark, [
        {"name": "LoadDataset", "parameters": {"path": path}},
        {"name": "FilterQuads",
         "parameters": {"or": [{"graph": "^orders$"}]}},
        {"name": "Histogram", "parameters": {"predicate": True}},
    ])


@register(
    "http_pipeline_export_ttl",
    """
    select concat('nation:', replace(n_name, ' ', '_')) as s,
           'ex:inRegion' as p,
           concat('region:', replace(r_name, ' ', '_')) as o,
           'uri' as okind
    from nation join region on n_regionkey = r_regionkey
    """,
)
def q_http_pipeline_export_ttl(spark, sf_dir):
    """JSON task pipeline driving the round-4 RDF WRITERS through the
    product entry point (data/ExportQuads.scala -> write_rdf dispatch by
    .ttl extension -> sources/rdf_writers.write_ttl with prefix
    compaction): LoadDataset -> ExportQuads(.ttl), then the exported
    Turtle is read back by the full-grammar reader and checked against
    relational truth."""
    import tempfile

    from rdfrules_spark.http_pipeline import run_pipeline_json
    from rdfrules_spark.sources.rdf import read_rdf

    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    df = nation.join(
        region, nation.n_regionkey == region.r_regionkey
    ).select(
        F.concat(F.lit("nation:"),
                 F.translate(F.col("n_name"), " ", "_")).alias("s"),
        F.lit("ex:inRegion").alias("p"),
        F.concat(F.lit("region:"),
                 F.translate(F.col("r_name"), " ", "_")).alias("o"),
        F.lit("uri").alias("okind"),
        F.lit("").alias("g"),
    )
    scratch = tempfile.mkdtemp(prefix="rdfrules_http_export_")
    df.write.mode("overwrite").parquet(f"{scratch}/in.parquet")
    run_pipeline_json(spark, [
        {"name": "LoadDataset", "parameters": {"path": f"{scratch}/in.parquet"}},
        {"name": "ExportQuads", "parameters": {"path": f"{scratch}/out.ttl"}},
    ])
    return read_rdf(spark, f"{scratch}/out.ttl").select(
        "s", "p", "o", "okind"
    )


@register(
    "refcache_roundtrip",
    """
    select n_name as s, 'ex:inRegion' as p,
           concat('region:', r_name) as o, 'uri' as okind, '' as g
    from nation join region on n_regionkey = r_regionkey
    """,
)
def q_refcache_roundtrip(spark, sf_dir):
    """Reference BINARY .cache writer -> reader round-trip (core:data/ops/
    Cacheable.scala + serialization/QuadSerialization.scala) against
    relational truth; the same byte format is pinned byte-identical to the
    executed reference's own artifact in tests/test_refcache.py."""
    import tempfile

    from rdfrules_spark.sources.refcache import (
        read_dataset_cache, write_dataset_cache,
    )

    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    df = nation.join(
        region, nation.n_regionkey == region.r_regionkey
    ).select(
        F.col("n_name").alias("s"),
        F.lit("ex:inRegion").alias("p"),
        F.concat(F.lit("region:"), F.col("r_name")).alias("o"),
        F.lit("uri").alias("okind"),
    )
    path = tempfile.mkdtemp(prefix="rdfrules_refcache_") + "/data.cache"
    write_dataset_cache(df, path)
    return read_dataset_cache(spark, path).select("s", "p", "o", "okind", "g")


# --------------------------------------------------------------------------
# Iceberg-shaped table scan (north-star input/output table format)
# --------------------------------------------------------------------------


@register(
    "ice_pruned_scan",
    """
    select event_id, user_id, event_type, value from events
    where event_type in ('click', 'view') and value >= 50.0
    """,
)
def q_ice_pruned_scan(spark, sf_dir):
    """IceTable commit/scan: two append snapshots (disjoint value ranges)
    then a manifest-pruned scan — partition pruning on event_type dirs +
    min/max file pruning on value bounds, full predicate re-applied on the
    survivors (sources/icetable.py). North-star: 'read an Iceberg table';
    reference durable-store analog core:index/ops/Cacheable.scala:29-70."""
    import tempfile

    from rdfrules_spark.sources.icetable import IceTable

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    t = IceTable.create(
        spark,
        tempfile.mkdtemp(prefix="rdfrules_ice_") + "/events",
        ev.schema,
        partition_by=["event_type"],
    )
    t.append(ev.where(F.col("value") < 100.0), idempotency_key="lo")
    t.append(ev.where(F.col("value") >= 100.0), idempotency_key="hi")
    t.append(ev.where(F.col("value") >= 100.0), idempotency_key="hi")  # no-op
    return t.scan(
        filters=[("event_type", "in", ["click", "view"]),
                 ("value", ">=", 50.0)]
    )


@register(
    "rdfxml_roundtrip",
    """
    select concat('http://kg/nation/', n_nationkey) as s,
           'http://kg/t#name' as p, n_name as o from nation
    union all
    select concat('http://kg/nation/', n_nationkey),
           'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
           'http://kg/t#Nation' from nation
    """,
)
def q_rdfxml_roundtrip(spark, sf_dir):
    """RDF/XML writer-side template -> full-grammar reader round-trip
    (sources/formats.py _rdfxml_triples; reference 'xml/rdf/owl' dispatch
    RdfSource.scala:52-67): typed nodes with property attributes parse to
    the same triples the relational oracle produces."""
    import os
    import tempfile

    from rdfrules_spark.sources.formats import read_rdfxml

    rows = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name").collect()
    body = "".join(
        f'<t:Nation rdf:about="http://kg/nation/{r.n_nationkey}" '
        f't:name="{r.n_name}"/>'
        for r in rows
    )
    doc = (
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:t="http://kg/t#">' + body + "</rdf:RDF>"
    )
    d = tempfile.mkdtemp(prefix="rdfrules_rdfxml_")
    with open(os.path.join(d, "nations.rdf"), "w") as f:
        f.write(doc)
    return read_rdfxml(spark, os.path.join(d, "nations.rdf")).select(
        "s", "p", "o"
    )


@register(
    "jsonld_triples",
    """
    select concat('http://kg/region/', r_regionkey) as s,
           'http://kg/t#name' as p, r_name as o, 'text' as okind
    from region
    union all
    select concat('http://kg/region/', r_regionkey),
           'http://kg/t#key', cast(r_regionkey as varchar), 'number'
    from region
    """,
)
def q_jsonld_triples(spark, sf_dir):
    """JSON-LD document (context with @vocab + @base + term def) -> triples
    through the full context-processing reader (sources/formats.py;
    reference 'json/jsonld' dispatch RdfSource.scala:52-67)."""
    import json as _j
    import os
    import tempfile

    from rdfrules_spark.sources.formats import read_jsonld

    rows = _t(spark, sf_dir, "region").select("r_regionkey", "r_name").collect()
    doc = {
        "@context": {
            "@vocab": "http://kg/t#",
            "@base": "http://kg/",
            "name": "http://kg/t#name",
        },
        "@graph": [
            {"@id": f"region/{r.r_regionkey}", "name": r.r_name,
             "key": r.r_regionkey}
            for r in rows
        ],
    }
    d = tempfile.mkdtemp(prefix="rdfrules_jsonld_")
    with open(os.path.join(d, "regions.jsonld"), "w") as f:
        _j.dump(doc, f)
    return read_jsonld(spark, os.path.join(d, "regions.jsonld"))


@register(
    "stream_ice_relation_counts",
    f"""
    with {_KG_W_SQL}
    select p, count(*) as cnt from w where p <> 'dup' group by p
    """,
)
def q_stream_ice_relation_counts(spark, sf_dir):
    """Streaming ingest THROUGH the IceTable sink (streaming/ingest.py
    run_incremental_pipeline_ice): one append snapshot per micro-batch,
    idempotency-keyed (exactly-once); the relations read back through the
    manifest-planned scan must equal the batch per-predicate counts."""
    import tempfile

    from rdfrules_spark.sources.icetable import IceTable
    from rdfrules_spark.streaming import (
        run_incremental_pipeline_ice,
        stream_plain_documents,
    )

    workdir = tempfile.mkdtemp(prefix="rdfrules_stream_ice_")
    q = run_incremental_pipeline_ice(
        spark,
        stream_plain_documents(spark, f"{sf_dir}/documents.parquet"),
        workdir,
        window3=True,
    )
    q.awaitTermination(600)
    rel = IceTable.load(spark, f"{workdir}/relations_ice").scan()
    return rel.groupBy("p").agg(F.count(F.lit(1)).alias("cnt"))


# ---------------------------------------------------------------------------
# RDF writers (round 4): Turtle / RDF/XML / JSON-LD export -> own reader
# (reference exports any Jena format, core:data/Graph.scala:52-60 /
# core:data/RdfWriter.scala; read side spec-verified in tests)
# ---------------------------------------------------------------------------

_WRITER_ORACLE = """
    select concat('http://kg/nation/', replace(n_name, ' ', '_')) as s,
           'http://kg/ont/inRegion' as p,
           concat('http://kg/region/', replace(r_name, ' ', '_')) as o,
           'uri' as okind
    from nation join region on n_regionkey = r_regionkey
    union all
    select concat('http://kg/nation/', replace(n_name, ' ', '_')),
           'http://kg/ont/key', cast(n_nationkey as varchar), 'number'
    from nation
    union all
    select concat('http://kg/nation/', replace(n_name, ' ', '_')),
           'http://kg/ont/comment',
           concat('note "', n_name, '" &', chr(10), 'end'), 'text'
    from nation
"""


def _writer_fixture(spark, sf_dir):
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    s = F.concat(F.lit("http://kg/nation/"),
                 F.regexp_replace("n_name", " ", "_"))
    rel = nation.join(
        region, nation.n_regionkey == region.r_regionkey
    ).select(
        s.alias("s"),
        F.lit("http://kg/ont/inRegion").alias("p"),
        F.concat(F.lit("http://kg/region/"),
                 F.regexp_replace("r_name", " ", "_")).alias("o"),
        F.lit("uri").alias("okind"),
    )
    keys = nation.select(
        s.alias("s"), F.lit("http://kg/ont/key").alias("p"),
        F.col("n_nationkey").cast("string").alias("o"),
        F.lit("number").alias("okind"),
    )
    comments = nation.select(
        s.alias("s"), F.lit("http://kg/ont/comment").alias("p"),
        F.concat(F.lit('note "'), F.col("n_name"), F.lit('" &\nend'))
        .alias("o"),
        F.lit("text").alias("okind"),
    )
    return rel.unionByName(keys).unionByName(comments)


@register("ttl_roundtrip", _WRITER_ORACLE)
def q_ttl_roundtrip(spark, sf_dir):
    """Turtle writer (prefix compaction, subject grouping, numeric short
    forms) -> full-grammar Turtle 1.1 reader round-trip vs relational
    truth (reference Graph.export to Lang.TTL, Graph.scala:52-60)."""
    import tempfile

    from rdfrules_spark.sources.rdf import read_ttl
    from rdfrules_spark.sources.rdf_writers import write_ttl

    path = tempfile.mkdtemp(prefix="rdfrules_ttlw_") + "/data.ttl"
    write_ttl(_writer_fixture(spark, sf_dir), path)
    out = read_ttl(spark, path)
    return out.select("s", "p", "o", "okind")


@register("rdfxml_write_roundtrip", _WRITER_ORACLE)
def q_rdfxml_write_roundtrip(spark, sf_dir):
    """RDF/XML writer (QName property elements over auto-declared
    namespaces, per-part complete <rdf:RDF> documents) -> full-grammar
    reader round-trip vs relational truth (Graph.export to Lang.RDFXML)."""
    import tempfile

    from rdfrules_spark.dictionary import term_kind
    from rdfrules_spark.sources.formats import read_rdfxml
    from rdfrules_spark.sources.rdf_writers import write_rdfxml

    path = tempfile.mkdtemp(prefix="rdfrules_xmlw_") + "/data.xml"
    write_rdfxml(_writer_fixture(spark, sf_dir), path)
    out = read_rdfxml(spark, path)
    return out.select("s", "p", "o", term_kind(F.col("o")).alias("okind"))


@register("jsonld_write_roundtrip", _WRITER_ORACLE)
def q_jsonld_write_roundtrip(spark, sf_dir):
    """JSON-LD writer (node objects per subject, native JSON scalars for
    number/boolean, per-part complete array documents) -> full-context
    reader round-trip vs relational truth (Graph.export to Lang.JSONLD)."""
    import tempfile

    from rdfrules_spark.dictionary import term_kind
    from rdfrules_spark.sources.formats import read_jsonld
    from rdfrules_spark.sources.rdf_writers import write_jsonld

    path = tempfile.mkdtemp(prefix="rdfrules_jldw_") + "/data.jsonld"
    write_jsonld(_writer_fixture(spark, sf_dir), path)
    out = read_jsonld(spark, path)
    return out.select("s", "p", "o", term_kind(F.col("o")).alias("okind"))


@register("trix_roundtrip", _WRITER_ORACLE)
def q_trix_roundtrip(spark, sf_dir):
    """TriX writer -> spec-audited reader round-trip vs relational truth
    (W3C TriX note; reference dispatch RdfSource.scala:52-67 via Jena
    Lang.TRIX; corner cases in tests/test_trix_full.py)."""
    import tempfile

    from rdfrules_spark.sources.formats import read_trix
    from rdfrules_spark.sources.rdf_writers import write_trix

    path = tempfile.mkdtemp(prefix="rdfrules_trixw_") + "/data.trix"
    write_trix(_writer_fixture(spark, sf_dir), path)
    out = read_trix(spark, path)
    return out.select("s", "p", "o", "okind")
