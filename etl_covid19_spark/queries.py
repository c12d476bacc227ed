"""Query registry: the engine's public query surface, one entry per
operator family in SURVEY.md §2 (+ the §7.2-step-9 extension ops),
each with a DuckDB-runnable ANSI-SQL oracle.

Oracle-parity rules used throughout:
- every computed column is aliased identically in Spark and SQL;
- money/double aggregations go through exact DECIMAL arithmetic and
  the *final* value is cast to DOUBLE on both sides → bit-identical
  results independent of partial-aggregation order;
- ratios are plain double divisions of exactly-equal operands;
- day/month names rely on the session's pinned en-US locale.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_covid19_spark.functions import datetime_kit as dk
from etl_covid19_spark.functions import json_kit, text, vectors
from etl_covid19_spark.operators import aggregates as agg
from etl_covid19_spark.operators import joins as J
from etl_covid19_spark.operators import relational as R
from etl_covid19_spark.plans import star
from etl_covid19_spark.sources.catalog import load_table

# Sequential per-dim float64 cosine fold (ANSI list_reduce) — the
# identical IEEE op sequence as `vectors.cosine` / the Arrow kernels,
# shared by every vector oracle. Defined before the first generated
# oracle that formats it at import time.
_FOLD_COS = """
             CASE WHEN sqrt(list_reduce(list_transform({a}, q -> q * q),
                                        (q, w) -> q + w))
                     * sqrt(list_reduce(list_transform({b}, q -> q * q),
                                        (q, w) -> q + w)) = 0
                  THEN 0.0
                  ELSE list_reduce(list_transform(list_zip({a}, {b}),
                         p -> struct_extract(p, 1) * struct_extract(p, 2)),
                         (q, w) -> q + w)
                       / (sqrt(list_reduce(list_transform({a}, q -> q * q),
                                           (q, w) -> q + w))
                          * sqrt(list_reduce(list_transform({b}, q -> q * q),
                                             (q, w) -> q + w)))
             END"""


@dataclass(frozen=True)
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible, rows-only check
    headline: bool = False  # include in bench.py


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, headline: bool = False):
    def deco(fn):
        REGISTRY[name] = QueryDef(fn, oracle, headline)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


def dsum(col, scale: str = "decimal(18,4)"):
    """Order-independent exact sum: decimal accumulate → double out."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(scale)).cast("double")


_GATE_TMP_ROOT: str | None = None


def _gate_tmpdir(prefix: str) -> str:
    """Scratch directory for the write-path gate queries.

    Every zone/export/checkpoint these queries write lands under ONE
    per-process root that is removed at interpreter exit. Cleanup
    cannot happen inside the query itself: the returned DataFrame is
    lazy and still reads these paths when the caller materializes it,
    so atexit is the earliest point where deletion is always safe.
    This bounds /tmp growth to a single root per process instead of
    a dozen orphaned zones per sweep (round-8 verdict, "What's wrong"
    #2)."""
    import atexit
    import shutil
    import tempfile

    global _GATE_TMP_ROOT
    if _GATE_TMP_ROOT is None:
        _GATE_TMP_ROOT = tempfile.mkdtemp(prefix="spark_graft_gate_")
        atexit.register(shutil.rmtree, _GATE_TMP_ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_GATE_TMP_ROOT)


def _await_stream(q, name: str, timeout_s: int = 300) -> None:
    """Block on a bounded (Trigger.AvailableNow) streaming query and
    FAIL LOUDLY on timeout: a stream that has not finished must not
    fall through to reading partially-committed output — that would
    surface as a misleading value mismatch instead of the real error
    (round-8 verdict, "What's wrong" #1)."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"{name}: streaming query did not terminate within "
            f"{timeout_s}s; refusing to read partial output"
        )


# ---------------------------------------------------------------------------
# Relational core (SURVEY.md §2.3, §2.5, §7.2 step 8)
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l_discount AS DECIMAL(8,4))
                    * CAST(1 + l_tax AS DECIMAL(8,4))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the groupBy().agg() hash-aggregate surface
    (SURVEY.md §2.5: the mart's purpose). Map-side partial aggregation
    → 4 groups shuffle, never the 100 TB scan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    ext = F.col("l_extendedprice").cast("decimal(18,4)")
    one_disc = (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    one_tax = (F.lit(1) + F.col("l_tax")).cast("decimal(8,4)")
    n = F.count(F.lit(1))
    return agg.grouped_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": dsum("l_quantity"),
            "sum_base_price": dsum("l_extendedprice"),
            "sum_disc_price": F.sum(ext * one_disc).cast("double"),
            "sum_charge": F.sum(ext * one_disc * one_tax).cast("double"),
            "avg_qty": dsum("l_quantity") / n,
            "avg_price": dsum("l_extendedprice") / n,
            "avg_disc": dsum("l_discount", "decimal(8,4)") / n,
            "count_order": n,
        },
    )


@register(
    "filter_project",
    oracle="""
    SELECT l_orderkey AS order_key, l_linenumber AS line_number,
           l_quantity AS qty, l_extendedprice AS price, l_returnflag AS flag
    FROM lineitem
    WHERE l_returnflag <> 'R'
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P4/F1/F4 — projection+rename with an isin-style anti-filter
    and a date-sliced predicate; both reach the parquet scan as
    PushedFilters + pruned ReadSchema."""
    li = _t(spark, sf_dir, "lineitem")
    sliced = li.filter(
        (~F.col("l_returnflag").isin("R"))
        & (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    return R.project(
        sliced,
        {
            "order_key": "l_orderkey",
            "line_number": "l_linenumber",
            "qty": "l_quantity",
            "price": "l_extendedprice",
            "flag": "l_returnflag",
        },
    )


@register(
    "union_slices",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, 'early' AS slice FROM orders
    WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    UNION ALL
    SELECT o_orderkey, o_custkey, o_totalprice, 'late' AS slice FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    """,
)
def q_union_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — unionByName over date slices (the pandas concat loop,
    ``dags/ETL_covid19_pandas.py:68-72``, as one lazy plan node)."""
    o = _t(spark, sf_dir, "orders")
    early = o.filter(
        F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_totalprice", F.lit("early").alias("slice"))
    late = o.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_totalprice", F.lit("late").alias("slice"))
    return R.union_all(early, late)


@register(
    "distinct_dedup",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    """,
)
def q_distinct_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup as hash aggregate (SURVEY.md §2.7 M6's missing
    DISTINCT, done right)."""
    return R.dedup(
        _t(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment")
    )


@register(
    "top_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 10
    """,
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit top-k (SURVEY.md §2.10) — plans as
    TakeOrderedAndProject: per-partition top-k, no global sort."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    rev = agg.grouped_agg(
        o.join(c, o.o_custkey == c.c_custkey),
        ["c_custkey", "c_name"],
        {"revenue": dsum("o_totalprice"), "n_orders": F.count(F.lit(1))},
    )
    return agg.top_k(rev, [F.col("revenue").desc(), F.col("c_custkey").asc()], 10)


@register(
    "star_join_revenue",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l.l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    headline=True,
)
def q_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JN1/JN2 — the star join (TPC-H Q5 shape): every dimension
    broadcast so the fact scan streams through BroadcastHashJoins;
    only the final 2-key aggregate shuffles."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region")
    ext = F.col("l_extendedprice").cast("decimal(18,4)")
    one_disc = (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    # orders/customer scale with the fact table → leave their join
    # strategy to Catalyst/AQE (auto-broadcast when under threshold,
    # sort-merge + skew split at 100 TB); nation/region are bounded
    # dims → always broadcast.
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return agg.grouped_agg(
        joined.select(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            (ext * one_disc).alias("disc_price"),
        ),
        ["region_name", "nation_name"],
        {
            "revenue": F.sum(F.col("disc_price")).cast("double"),
            "n_lineitems": F.count(F.lit(1)),
        },
    )


# ---------------------------------------------------------------------------
# Semi-structured / JSON (SURVEY.md §2.2 J1-J6)
# ---------------------------------------------------------------------------


@register(
    "json_path_agg",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    headline=True,
)
def q_json_path_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — JSON path extraction (`json_data -> 'data'` analog,
    ``spark_transform_data.py:24``) feeding an aggregate."""
    ev = _t(spark, sf_dir, "events")
    k = json_kit.json_path("props", "$.k").cast("bigint")
    return agg.grouped_agg(
        ev.select("event_type", k.alias("k")),
        ["event_type"],
        {"sum_k": F.sum("k"), "n_events": F.count(F.lit(1))},
    )


@register(
    "json_typed_parse",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_high,
           MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 50
    GROUP BY event_type
    """,
)
def q_json_typed_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — schema-bound `from_json` parse (the typed parse of
    ``spark_transform_data.py:49``) with a post-parse filter."""
    ev = _t(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    parsed = ev.withColumn("p", json_kit.parse_json("props", schema))
    high = parsed.filter(F.col("p.k") >= 50)
    return agg.grouped_agg(
        high,
        ["event_type"],
        {
            "n_high": F.count(F.lit(1)),
            "min_k": F.min("p.k"),
            "max_k": F.max("p.k"),
        },
    )


@register(
    "explode_tokens",
    oracle="""
    WITH toks AS (
      SELECT d.lang, t.tok
      FROM documents d,
           unnest(list_filter(regexp_split_to_array(trim(d.text), '\\s+'),
                              x -> x <> '')) AS t(tok)
    )
    SELECT lang, COUNT(*) AS n_tokens,
           COUNT(DISTINCT tok) AS n_distinct_tokens
    FROM toks GROUP BY lang
    """,
    headline=True,
)
def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — array explode (``spark_transform_data.py:51``) over the
    tokenizer; the cardinality-raising operator at document scale."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select("lang", F.explode(text.tokens("text")).alias("tok"))
    return agg.grouped_agg(
        toks,
        ["lang"],
        {
            "n_tokens": F.count(F.lit(1)),
            "n_distinct_tokens": F.count_distinct(F.col("tok")),
        },
    )


@register(
    "json_roundtrip_star",
    oracle="""
    SELECT n.n_nationkey AS nation_key, n.n_name AS nation_name,
           r.r_name AS region_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def q_json_roundtrip_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+J2+J4+J6 end-to-end: serialize nation rows into the
    reference's envelope shape {"data": [...]}, then run the covid
    clean path (path-extract → typed parse → explode → nested
    select). The oracle computes the same relation without the
    round-trip, so agreement proves parse/explode fidelity."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    payloads = joined.groupBy("r_regionkey").agg(
        F.to_json(
            F.struct(
                F.collect_list(
                    F.struct(
                        F.col("n_nationkey").alias("nationkey"),
                        F.col("n_name").alias("name"),
                        F.struct(F.col("r_name").alias("name")).alias("region"),
                    )
                ).alias("data")
            )
        ).alias("json_data")
    )
    schema = T.ArrayType(
        T.StructType(
            [
                T.StructField("nationkey", T.IntegerType()),
                T.StructField("name", T.StringType()),
                T.StructField(
                    "region",
                    T.StructType([T.StructField("name", T.StringType())]),
                ),
            ]
        )
    )
    parsed = payloads.withColumn(
        "recs", json_kit.parse_json(json_kit.json_path("json_data", "$.data"), schema)
    )
    exploded = json_kit.explode_records(parsed, "recs")
    return json_kit.select_nested(
        exploded,
        {
            "rec.nationkey": "nation_key",
            "rec.name": "nation_name",
            "rec.region.name": "region_name",
        },
    )


# ---------------------------------------------------------------------------
# Calendar / date dimension (SURVEY.md §2.6 D1-D8)
# ---------------------------------------------------------------------------


@register(
    "date_dimension",
    oracle="""
    SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS date_key,
           CAST(d AS DATE) AS full_date,
           dayname(d) AS day_of_week,
           CAST(isodow(d) AS INT) AS day_number_in_week,
           isodow(d) = 7 AS last_day_in_week_indicator,
           monthname(d) AS month_name,
           CAST(month(d) AS INT) AS month_number_in_year,
           isodow(d) <= 5 AS weekday_flag
    FROM generate_series(DATE '2023-01-01', DATE '2024-12-31',
                         INTERVAL 1 DAY) t(d)
    """,
    headline=True,
)
def q_date_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1-D8 — the reference's 46-line PLpgSQL date-dimension loop
    (``postgres/pg_init_covid19.sql:192-237``) as one `sequence()`
    plus seven column expressions, fully distributed."""
    return star.build_date_dimension(spark, "2023-01-01", "2024-12-31")


@register(
    "date_dimension_full",
    oracle="""
    SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS date_key,
           CAST(d AS DATE) AS full_date,
           dayname(d) AS day_of_week,
           CAST(isodow(d) AS INT) AS day_number_in_week,
           isodow(d) = 7 AS last_day_in_week_indicator,
           monthname(d) AS month_name,
           CAST(month(d) AS INT) AS month_number_in_year,
           isodow(d) <= 5 AS weekday_flag
    FROM generate_series(DATE '2000-01-01', DATE '2100-12-31',
                         INTERVAL 1 DAY) t(d)
    """,
)
def q_date_dimension_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's EXACT date-dimension extent: 36,890 rows,
    2000-01-01 → 2100-12-31 (``postgres/pg_init_covid19.sql:192-237``
    materializes this range with a PLpgSQL day-by-day loop; here it
    is one `sequence()` explode + seven column expressions). All
    seven calendar attributes oracle-checked over the full range —
    including the century's leap-day edge cases (2000 leap, 2100
    not)."""
    return star.build_date_dimension(spark, "2000-01-01", "2100-12-31")


@register(
    "date_key_enrich",
    oracle="""
    SELECT CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS date_key,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS day_revenue
    FROM orders
    GROUP BY 1
    """,
)
def q_date_key_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1/M2 — smart yyyymmdd key recomputed-on-read (replaces the
    reference's UPDATE at ``postgres/pg_init_covid19.sql:147-154``)."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "date_key", dk.date_key("o_orderdate")
    )
    return agg.grouped_agg(
        o,
        ["date_key"],
        {"n_orders": F.count(F.lit(1)), "day_revenue": dsum("o_totalprice")},
    )


# ---------------------------------------------------------------------------
# Star-schema build (SURVEY.md §2.7 M2-M6, §7.2 step 5)
# ---------------------------------------------------------------------------


@register(
    "dim_mktsegment",
    oracle="""
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_mktsegment) AS INT) AS segment_key,
           c_mktsegment
    FROM (SELECT DISTINCT c_mktsegment FROM customer)
    """,
)
def q_dim_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6-fixed — dimension builder: dedup + deterministic surrogate
    key (the reference's `insert_region_dimension` lacks DISTINCT,
    quirk Q6)."""
    return star.build_dimension(
        _t(spark, sf_dir, "customer"),
        natural_keys=["c_mktsegment"],
        key_col="segment_key",
    )


@register(
    "fact_build",
    oracle="""
    WITH dim AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_mktsegment) AS INT) AS segment_key,
             c_mktsegment
      FROM (SELECT DISTINCT c_mktsegment FROM customer)
    )
    SELECT o.o_orderkey, o.o_totalprice,
           CAST(strftime(o.o_orderdate, '%Y%m%d') AS INT) AS date_key,
           d.segment_key
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN dim d ON c.c_mktsegment = d.c_mktsegment
    """,
)
def q_fact_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4/M5/JN1 — fact build: date_key expression + broadcast
    surrogate-key enrichment + measure projection (the INSERT…SELECT
    procedures at ``postgres/pg_init_covid19.sql:106-127,168-188``)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    dim = star.build_dimension(
        _t(spark, sf_dir, "customer"),
        natural_keys=["c_mktsegment"],
        key_col="segment_key",
    )
    enriched = o.join(c, o.o_custkey == c.c_custkey)
    keyed = J.enrich_with_key(
        enriched, dim, on="c_mktsegment", key_col="segment_key", how="inner"
    )
    return keyed.select(
        "o_orderkey",
        "o_totalprice",
        dk.date_key("o_orderdate").alias("date_key"),
        "segment_key",
    )


@register(
    "quality_counts",
    oracle="""
    SELECT CAST(o_orderdate AS DATE) AS order_day, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1995-07-01 00:00:00'
    GROUP BY 1
    """,
)
def q_quality_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — the quality-gate count shape (per-day row counts; the
    engine-side tolerance assert lives in plans.quality and is
    unit-tested)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01 00:00:00").cast("timestamp"))
    )
    return agg.grouped_agg(
        o.select(F.col("o_orderdate").cast("date").alias("order_day")),
        ["order_day"],
        {"n_orders": F.count(F.lit(1))},
    )


# ---------------------------------------------------------------------------
# Windows / rollup / set ops (SURVEY.md §2.10, §7.2 step 8)
# ---------------------------------------------------------------------------


@register(
    "window_running",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS order_day,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      FROM orders GROUP BY 1
    )
    SELECT order_day,
           CAST(rev AS DOUBLE) AS day_revenue,
           CAST(SUM(rev) OVER (ORDER BY order_day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total,
           CAST(rev AS DOUBLE)
             - CAST(COALESCE(LAG(rev) OVER (ORDER BY order_day), 0) AS DOUBLE)
             AS day_over_day
    FROM daily
    """,
    headline=True,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window kit — running total + day-over-day diff: natively
    recomputes the reference's precomputed `*_diff` measures
    (SURVEY.md §2.6 M1) with a window over the ordered day series.

    The unpartitioned window is deliberate: it runs AFTER the per-day
    aggregate, over a bounded series (one row per calendar day — a
    few thousand rows at any corpus size), so the single-partition
    sort Spark warns about is O(days), never O(rows). Per-entity
    running windows partition by key (aggregates.running_totals)."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("order_day")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"))
    w = Window.orderBy("order_day")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "order_day",
        F.col("rev").cast("double").alias("day_revenue"),
        F.sum("rev").over(cum).cast("double").alias("running_total"),
        (
            F.col("rev").cast("double")
            - F.coalesce(F.lag("rev").over(w), F.lit(0)).cast("double")
        ).alias("day_over_day"),
    )


@register(
    "rollup_revenue",
    oracle="""
    SELECT r.r_name AS region_name, c.c_mktsegment AS segment,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, c.c_mktsegment)
    """,
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region ⊃ segment hierarchy — subtotals and a
    grand total in one pass (SURVEY.md §7.2 step 8)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_mktsegment")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("region_name"),
            F.col("c_mktsegment").alias("segment"),
            F.col("o_totalprice"),
        )
    )
    return agg.rollup_agg(
        joined,
        ["region_name", "segment"],
        {"revenue": dsum("o_totalprice"), "n_orders": F.count(F.lit(1))},
    )


@register(
    "intersect_customers",
    oracle="""
    SELECT o_custkey AS cust_key FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def q_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (SURVEY.md §2.10 — absent from the reference, part
    of the engine's standard set-op surface)."""
    o = _t(spark, sf_dir, "orders")

    def year_custs(start: str, end: str) -> DataFrame:
        return o.filter(
            (F.col("o_orderdate") >= F.lit(start).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(end).cast("timestamp"))
        ).select(F.col("o_custkey").alias("cust_key"))

    return year_custs("1995-01-01 00:00:00", "1996-01-01 00:00:00").intersect(
        year_custs("1996-01-01 00:00:00", "1997-01-01 00:00:00")
    )


@register(
    "except_customers",
    oracle="""
    SELECT c_custkey AS cust_key FROM customer
    EXCEPT
    SELECT o_custkey FROM orders
    """,
)
def q_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — customers who never ordered."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("cust_key"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("cust_key"))
    return c.subtract(o)


@register(
    "semi_join_active",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
    """,
)
def q_semi_join_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left-semi join — EXISTS (quality-gate building block,
    SURVEY.md §7.2 step 6)."""
    c = _t(spark, sf_dir, "customer")
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select(F.col("o_custkey").alias("c_custkey"))
    return J.semi_join(c, recent, on=["c_custkey"]).select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "anti_join_integrity",
    oracle="""
    SELECT COUNT(*) AS n_orphans
    FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
    )
    """,
)
def q_anti_join_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left-anti join — the referential-integrity check (engine-native
    form of the mart's FK constraints,
    ``postgres/pg_init_covid19.sql:78-79``)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    return J.anti_join(o, c, on=["o_custkey"]).agg(
        F.count(F.lit(1)).alias("n_orphans")
    )


# ---------------------------------------------------------------------------
# Extension ops: dedup / similarity / text / windows / multimodal
# (SURVEY.md §7.2 step 9 — the 100 TB training-data surface)
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
    FROM documents GROUP BY text
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy on the content hash — shuffles
    8-byte keys, never document bodies."""
    from etl_covid19_spark.operators.dedup import exact_dedup

    return exact_dedup(
        _t(spark, sf_dir, "documents"), "text", "doc_id"
    ).select("canonical_id", "n_copies")


@register(
    "dedup_ngram_jaccard",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks)-1),
                                   i -> array_to_string(toks[i:i+2], ' '))
               ELSE [array_to_string(toks, ' ')] END) AS grams
      FROM t
    ),
    p AS (SELECT doc_id, len(grams) AS n, unnest(grams) AS sh FROM g),
    c AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
             COUNT(*) AS nc
      FROM p a JOIN p b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b, nc * 1.0 / (na + nb - nc) AS jaccard
    FROM c WHERE nc * 1.0 / (na + nb - nc) >= 0.5
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs via the shingle-postings
    join (never |docs|²) — but Σ df² join volume, which sf1 measured
    at 655 s cold / 40 s warm (vs 1.8 s at sf0.1): common shingles
    make the uncapped postings join superlinear. Retained as the
    tiny-SF cross-check; the bench headline and scale default is
    `dedup_ngram_jaccard_capped` (round-2-endorsed twin-swap
    pattern)."""
    from etl_covid19_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", n=3, threshold=0.5
    )


@register(
    "dedup_ngram_jaccard_capped",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks)-1),
                                   i -> array_to_string(toks[i:i+2], ' '))
               ELSE [array_to_string(toks, ' ')] END) AS grams
      FROM t
    ),
    p AS (SELECT doc_id, unnest(grams) AS sh FROM g),
    keep AS (SELECT sh FROM p GROUP BY sh HAVING COUNT(*) <= 5),
    cp AS (SELECT p.doc_id, p.sh FROM p JOIN keep USING (sh)),
    s AS (SELECT doc_id, COUNT(*) AS n FROM cp GROUP BY doc_id),
    c AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS nc
      FROM cp a JOIN cp b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, nc * 1.0 / (sa.n + sb.n - nc) AS jaccard
    FROM c JOIN s sa ON sa.doc_id = doc_a JOIN s sb ON sb.doc_id = doc_b
    WHERE nc * 1.0 / (sa.n + sb.n - nc) >= 0.5
    """,
    headline=True,
)
def q_dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-frequency-capped Jaccard (stop-shingles with df > 5
    dropped, set sizes recomputed over the capped universe) — the
    skew-hardened twin of dedup_ngram_jaccard; the exact query stays
    registered unchanged. Capped semantics are mirrored exactly in
    the oracle. HEADLINE since round 3: sf1 measured the uncapped
    postings join at 655 s cold vs 24 s cold / 1.3 s warm here —
    join volume ≤ postings·max_df is the shape that survives 100 TB,
    so the benched path is the one you'd actually run (same
    reasoning as round 2's ann_lsh_topk swap)."""
    from etl_covid19_spark.operators.dedup import ngram_jaccard_pairs_capped

    return ngram_jaccard_pairs_capped(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        n=3, threshold=0.5, max_df=5,
    )


@register(
    "dedup_minhash_lsh",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks)-1),
                                   i -> array_to_string(toks[i:i+2], ' '))
               ELSE [array_to_string(toks, ' ')] END) AS grams
      FROM t
    ),
    p AS (SELECT doc_id, len(grams) AS n, unnest(grams) AS sh FROM g),
    c AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
             COUNT(*) AS nc
      FROM p a JOIN p b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b, nc * 1.0 / (na + nb - nc) AS jaccard
    FROM c WHERE nc * 1.0 / (na + nb - nc) >= 0.8
    """,
    headline=True,
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(96) + LSH(24×4) candidate pairs, exact-verified at
    J≥0.8. Recall at the threshold ≈ 1-3e-6 — still effectively 1,
    while the signature aggregate and band-key fan-out are 25%
    cheaper than the original 128×32 (the ROADMAP experiment,
    measured: identical pair sets at sf0.01/sf0.1, warm 1.7→1.3 s,
    cold 6.1→4.8 s). The oracle stays the exact-Jaccard pair set."""
    from etl_covid19_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        n=3, num_hashes=96, bands=24, threshold=0.8,
    )


def _simhash_fp_ctes(bits: int = 30) -> str:
    """Shared WITH-clause text computing each doc's 30-bit simhash in
    DuckDB, bit-for-bit identical to the Spark expressions (engine-
    agnostic polynomial token hash + per-bit majority votes). Ends at
    CTE `f(doc_id, fp)`; callers append their own downstream CTEs."""
    th = """list_transform(
      list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''),
      t -> list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, length(t)+1),
                              i -> CAST(ascii(substr(t, i, 1)) AS BIGINT))),
             (a, c) -> (a * 131 + c) % 2147483647))"""
    votes = ", ".join(
        f"2 * len(list_filter(th, h -> (h // {1 << j}) % 2 = 1)) - len(th) AS v{j}"
        for j in range(bits)
    )
    fp = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(bits)
    )
    return f"""t AS (SELECT doc_id, {th} AS th FROM documents),
    v AS (SELECT doc_id, {votes} FROM t),
    f AS (SELECT doc_id, CAST({fp} AS BIGINT) AS fp FROM v)"""


def _simhash_oracle(bits: int = 30) -> str:
    """GENERATED oracle for dedup_simhash: the fingerprint is fully
    deterministic, so the bit-vote expressions are emitted
    programmatically into one SQL statement that DuckDB evaluates
    bit-for-bit identically to the Spark column expressions."""
    return f"""
    WITH {_simhash_fp_ctes(bits)},
    b AS (
      SELECT doc_id, fp, fp % 32768 AS key, 0 AS chunk FROM f
      UNION ALL
      SELECT doc_id, fp, (fp // 32768) % 32768, 1 FROM f
    ),
    c AS (
      SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
                      a.fp AS h_a, b2.fp AS h_b
      FROM b a JOIN b b2
        ON a.key = b2.key AND a.chunk = b2.chunk AND a.doc_id < b2.doc_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(h_a, h_b)) AS INT) AS hamming
    FROM c WHERE bit_count(xor(h_a, h_b)) <= 8
    """


@register("dedup_simhash", oracle=_simhash_oracle())
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(30-bit) near-dup pairs, 15-bit-chunk blocked
    (pigeonhole exact for hamming ≤ 1; heuristic recall above). The
    whole pipeline is deterministic, so the oracle is generated SQL
    reproducing hash, votes, blocking, and the hamming filter.

    Scale caveat (measured at sf1): the PAIR OUTPUT itself is
    quadratic on duplicate-heavy corpora (50k docs → 23.4M pairs).
    This form is the tiny-SF cross-check; the registered scale
    default is `dedup_simhash_clustered` (linear output)."""
    from etl_covid19_spark.operators.dedup import simhash_pairs

    return simhash_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", max_hamming=8
    )


def _simhash_cluster_oracle(bits: int = 30) -> str:
    """GENERATED oracle for dedup_simhash_clustered: same fp CTEs,
    then distinct-fp half-blocked edges, a recursive min-label
    closure over the fp graph, and min-doc-id canonicalization."""
    return f"""
    WITH RECURSIVE {_simhash_fp_ctes(bits)},
    d AS (SELECT DISTINCT fp FROM f),
    b AS (
      SELECT fp, fp % 32768 AS key, 0 AS chunk FROM d
      UNION ALL
      SELECT fp, (fp // 32768) % 32768, 1 FROM d
    ),
    e0 AS (
      SELECT DISTINCT a.fp AS fa, b2.fp AS fb
      FROM b a JOIN b b2
        ON a.key = b2.key AND a.chunk = b2.chunk AND a.fp < b2.fp
      WHERE bit_count(xor(a.fp, b2.fp)) <= 8
    ),
    edges AS (
      SELECT fa AS src, fb AS dst FROM e0
      UNION SELECT fb, fa FROM e0
    ),
    reach(node, label) AS (
      SELECT fp, fp FROM d
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    ),
    fpc AS (SELECT node AS fp, MIN(label) AS fl FROM reach GROUP BY node),
    asg AS (
      SELECT f.doc_id, fpc.fl FROM f JOIN fpc ON f.fp = fpc.fp
    ),
    rep AS (SELECT fl, MIN(doc_id) AS cluster_id FROM asg GROUP BY fl)
    SELECT asg.doc_id, rep.cluster_id
    FROM asg JOIN rep USING (fl) ORDER BY doc_id
    """


@register("dedup_simhash_clustered", oracle=_simhash_cluster_oracle())
def q_dedup_simhash_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale default for SimHash dedup (VERDICT r2 pattern: scale
    twin promoted to a registered, oracle-checked query): cluster
    assignment instead of all near-dup pairs. Identical fingerprints
    collapse first, the hamming graph lives on DISTINCT fps, and the
    output is one (doc_id, cluster_id) row per doc — linear where
    `dedup_simhash`'s pair set measured quadratic at sf1 (23.4M
    pairs / 50k docs). The oracle replays fp computation, distinct-fp
    blocking, and a recursive min-label closure."""
    from etl_covid19_spark.operators.dedup import simhash_clusters

    return simhash_clusters(
        _t(spark, sf_dir, "documents"), "text", "doc_id", max_hamming=8
    ).orderBy("doc_id")


def _near_dup_lsh_oracle(
    threshold: float = 0.45, band_bits: int = 4, n_bands: int = 16
) -> str:
    """GENERATED oracle for the LSH-bucketed embedding near-dup: the
    sign-bit band keys are pure CASE expressions, so DuckDB reproduces
    bucketing, candidate generation, and exact-cosine verification."""
    keys = []
    for band in range(n_bands):
        bits = " + ".join(
            f"(CASE WHEN v[{band * band_bits + j + 1}] > 0 "
            f"THEN {1 << j} ELSE 0 END)"
            for j in range(band_bits)
        )
        keys.append(f"({band * (1 << band_bits)} + {bits})")
    key_list = ", ".join(keys)
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    b AS (SELECT vec_id, unnest([{key_list}]) AS band_key FROM e),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
      FROM b a JOIN b c ON a.band_key = c.band_key AND a.vec_id < c.vec_id
    ),
    scored AS (
      SELECT id_a, id_b,
             list_reduce(list_transform(list_zip(x.v, y.v),
                         p -> struct_extract(p, 1) * struct_extract(p, 2)), (q, w) -> q + w) AS dot,
             sqrt(list_reduce(list_transform(x.v, q -> q * q),
                              (q, w) -> q + w)) AS norm_a,
             sqrt(list_reduce(list_transform(y.v, q -> q * q),
                              (q, w) -> q + w)) AS norm_b
      FROM cand JOIN e x ON x.vec_id = id_a JOIN e y ON y.vec_id = id_b
    )
    SELECT id_a, id_b, dot / (norm_a * norm_b) AS cosine
    FROM scored
    WHERE CASE WHEN norm_a * norm_b = 0 THEN 0.0
               ELSE dot / (norm_a * norm_b) END >= {threshold}
    """


@register("embedding_near_dup", oracle=_near_dup_lsh_oracle())
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via sign-bit LSH banding +
    exact-cosine verification — equi-joins only, no all-pairs scan
    (operators/dedup.embedding_near_dup has the scale math). Recall
    vs the exact baseline is unit-tested; the exact all-pairs twin
    stays registered as embedding_near_dup_exact."""
    from etl_covid19_spark.operators.dedup import embedding_near_dup

    return embedding_near_dup(
        _t(spark, sf_dir, "embeddings"), "embedding", "vec_id",
        threshold=0.45, band_bits=4, n_bands=16,
    )


@register(
    "embedding_near_dup_exact",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_reduce(list_transform(list_zip(a.v, b.v),
                         p -> struct_extract(p, 1) * struct_extract(p, 2)), (x, y) -> x + y) AS dot,
             sqrt(list_reduce(list_transform(a.v, x -> x * x),
                              (x, y) -> x + y)) AS norm_a,
             sqrt(list_reduce(list_transform(b.v, x -> x * x),
                              (x, y) -> x + y)) AS norm_b
      FROM e a JOIN e b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, dot / (norm_a * norm_b) AS cosine
    FROM pairs
    WHERE CASE WHEN norm_a * norm_b = 0 THEN 0.0
               ELSE dot / (norm_a * norm_b) END >= 0.45
    """,
)
def q_embedding_near_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force all-pairs cosine near-dup — the EXACT baseline the
    LSH operator's recall is measured against. O(n²) by construction;
    tiny-SF cross-check only, never the scale path."""
    from etl_covid19_spark.operators.dedup import embedding_near_dup_exact

    return embedding_near_dup_exact(
        _t(spark, sf_dir, "embeddings"), "embedding", "vec_id", threshold=0.45
    )


@register(
    "ann_cosine_topk",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    q AS (SELECT vec_id, v FROM e WHERE vec_id < 8),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_reduce(list_transform(list_zip(q.v, c.v),
                         p -> struct_extract(p, 1) * struct_extract(p, 2)), (x, y) -> x + y)
             / (sqrt(list_reduce(list_transform(q.v, x -> x * x), (x, y) -> x + y))
                * sqrt(list_reduce(list_transform(c.v, x -> x * x), (x, y) -> x + y)))
               AS cosine
      FROM q JOIN e c ON q.vec_id <> c.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank,
             cosine
      FROM scored
    )
    SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= 10
    """,
)
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for 8 query vectors: broadcast queries ×
    corpus scan, per-query window rank — the similarity-search
    correctness baseline. Deliberately NOT a headline bench query:
    the broadcast nested-loop is tiny-query-set-only by design; the
    headline scale path is ann_lsh_topk (bucketed equi-join)."""
    from etl_covid19_spark.operators.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    return brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 8), "embedding", "vec_id", k=10
    )


def _lsh_ann_oracle(
    n_planes: int = 6,
    dim: int = 64,
    query_pred: str = "q.vec_id < 8",
    k: int = 10,
) -> str:
    """GENERATED oracle for ann_lsh_topk: the hyperplanes are
    deterministic LCG constants, so they embed as SQL literals and
    DuckDB reproduces signature, bucketing, and ranking exactly
    (left-to-right double folds on both sides)."""
    from etl_covid19_spark.operators.similarity import make_planes

    planes = make_planes(dim, n_planes)

    def dot_plane(vcol: str, plane: list[float]) -> str:
        lits = ", ".join(repr(x) for x in plane)
        return (
            f"list_reduce(list_prepend(0.0, list_transform(list_zip({vcol}, "
            f"[{lits}]), p -> struct_extract(p, 1) * struct_extract(p, 2))), "
            f"(x, y) -> x + y)"
        )

    sig = " + ".join(
        f"(CASE WHEN {dot_plane('v', planes[i])} > 0 "
        f"THEN {1 << (n_planes - 1 - i)} ELSE 0 END)"
        for i in range(n_planes)
    )
    cos = (
        "list_reduce(list_prepend(0.0, list_transform(list_zip(q.v, c.v), "
        "p -> struct_extract(p, 1) * struct_extract(p, 2))), (x, y) -> x + y)"
        " / (sqrt(list_reduce(list_prepend(0.0, "
        "list_transform(q.v, x -> x * x)), (x, y) -> x + y))"
        " * sqrt(list_reduce(list_prepend(0.0, "
        "list_transform(c.v, x -> x * x)), (x, y) -> x + y)))"
    )
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    s AS (SELECT vec_id, v, {sig} AS bucket FROM e),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cosine
      FROM s q JOIN s c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
      WHERE {query_pred}
    )
    SELECT query_id, neighbor_id, rank, cosine
    FROM (SELECT query_id, neighbor_id,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank,
                 cosine
          FROM scored)
    WHERE rank <= {k}
    """


@register("ann_lsh_topk", oracle=_lsh_ann_oracle(), headline=True)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH bucketing — the
    scale path (join degree = bucket size, not corpus size). The
    planes are deterministic, so even this approximate operator is
    oracle-checked end-to-end (generated SQL); recall vs the exact
    baseline is additionally unit-tested."""
    from etl_covid19_spark.operators.similarity import lsh_bucket_ann

    emb = _t(spark, sf_dir, "embeddings")
    return lsh_bucket_ann(
        emb, emb.filter(F.col("vec_id") < 8), "embedding", "vec_id",
        k=10, n_planes=6, dim=64,
    )


# shared between the HOF form and its Arrow-kernel twin
_TEXT_QUALITY_ORACLE = """
    WITH t AS (
      SELECT doc_id, text, lang,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks,
             length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS n_punct
      FROM documents
    ),
    m AS (
      SELECT doc_id, lang,
             len(toks) AS n_tokens,
             list_reduce(list_prepend(0, list_transform(toks, x -> length(x))),
                         (a, b) -> a + b)
               / greatest(len(toks), 1) AS mean_token_len,
             n_punct / greatest(length(text), 1) AS punct_ratio,
             len(list_filter(toks, x -> lower(x) IN
                 ('the','a','an','and','or','of','to','in','is','are','for',
                  'on','with','as','at','by','it','this','that')))
               / greatest(len(toks), 1) AS stopword_ratio,
             least(length(text) / 200.0, 1.0) AS len_score
      FROM t
    )
    SELECT doc_id, lang, n_tokens, mean_token_len, punct_ratio, stopword_ratio,
           round(0.3 * len_score
                 + 0.3 * (CASE WHEN mean_token_len >= 2 AND mean_token_len <= 12
                               THEN 1.0 ELSE 0.3 END)
                 + 0.2 * (1.0 - least(punct_ratio * 5, 1.0))
                 + 0.2 * least(stopword_ratio * 4, 1.0), 6) AS quality
    FROM m
    """


@register("text_quality", oracle=_TEXT_QUALITY_ORACLE)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality metrics: token count, mean token length,
    punctuation ratio, stopword ratio, composite quality score —
    the pre-training quality-filter feature set, all JVM-side."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        text.token_count("text").alias("n_tokens"),
        text.mean_token_length("text").alias("mean_token_len"),
        text.punct_ratio("text").alias("punct_ratio"),
        text.stopword_ratio("text").alias("stopword_ratio"),
        text.quality_score("text").alias("quality"),
    )


@register("text_quality_arrow", oracle=_TEXT_QUALITY_ORACLE, headline=True)
def q_text_quality_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same quality metrics through the Arrow counting kernel
    (`text.quality_counts_arrow`) — the default/benched path, the
    same HOF-vs-kernel swap as `quality_classifier_arrow`: the
    kernel emits only exact integer counts and the Spark-side
    finisher (`text.quality_from_counts`) replays the HOF formulas
    expression-for-expression, so the twin is bit-exact against the
    shared oracle. `text_quality` stays registered as the
    engine-pure cross-check."""
    d = _t(spark, sf_dir, "documents")
    staged = text.quality_counts_arrow(d, ["doc_id", "lang"], "text")
    m = text.quality_from_counts()
    return staged.select(
        "doc_id",
        "lang",
        "n_tokens",
        m["mean_token_len"].alias("mean_token_len"),
        m["punct_ratio"].alias("punct_ratio"),
        m["stopword_ratio"].alias("stopword_ratio"),
        m["quality"].alias("quality"),
    )


# shared with langid_confusion below
_LANG_ID_ORACLE = """
    WITH t AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id, lang,
        len(list_filter(toks, x -> lower(x) IN ('the','and','of','to','a'))) AS s_en,
        len(list_filter(toks, x -> lower(x) IN ('el','la','de','que','y'))) AS s_es,
        len(list_filter(toks, x -> lower(x) IN ('le','la','de','et','les'))) AS s_fr,
        len(list_filter(toks, x -> lower(x) IN ('der','die','und','das','ist'))) AS s_de,
        len(list_filter(toks, x -> lower(x) IN ('de5','shi4','le5','zai4','he2'))) AS s_zh
      FROM t
    )
    SELECT doc_id, lang AS actual_lang,
           CASE WHEN s_en >= greatest(s_es, s_fr, s_de, s_zh) THEN 'en'
                WHEN s_es >= greatest(s_fr, s_de, s_zh) THEN 'es'
                WHEN s_fr >= greatest(s_de, s_zh) THEN 'fr'
                WHEN s_de >= s_zh THEN 'de'
                ELSE 'zh' END AS predicted_lang
    FROM s
    """


@register("lang_id", oracle=_LANG_ID_ORACLE)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID: stopword-marker hit counts per
    language, deterministic priority argmax (en>es>fr>de>zh on
    ties). Marker counts come from the Arrow counting kernel
    (`quality_counts_arrow(with_lang=True)` — exact integers, so
    the kernel shares the HOF oracle; `text.lang_scores` stays the
    engine-pure cross-check): the five `size(filter(tokens(...)))`
    HOFs re-tokenized the corpus per language and cost 45 s at
    sf10's 500k docs vs kernel cost."""
    d = _t(spark, sf_dir, "documents")
    staged = text.quality_counts_arrow(
        d, ["doc_id", "lang"], "text", with_lang=True
    )
    return staged.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        text.predicted_lang_from_counts().alias("predicted_lang"),
    )


@register(
    "doc_fingerprint",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(toks,
                 x -> CAST(ascii(substr(x, 1, 1)) AS BIGINT) * 1000 + length(x))),
             (acc, c) -> (acc * 131 + c) % 1000000007) AS fingerprint
    FROM t
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic rolling document fingerprint (engine-agnostic
    polynomial hash — same value computable in ANSI SQL, unlike
    xxhash64), the cross-system dedup key."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", text.fingerprint("text").alias("fingerprint"))


@register(
    "tumbling_windows",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 300) * 300 * 1000000 AS BIGINT) AS window_start_us,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    headline=True,
)
def q_tumbling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute event-time windows (batch mode; the same
    expression runs under readStream — streaming.windows)."""
    from etl_covid19_spark.streaming.windows import tumbling

    ev = _t(spark, sf_dir, "events")
    out = tumbling(
        ev, "ts", "5 minutes", ["event_type"],
        {
            "n_events": F.count(F.lit(1)),
            "sum_value": F.sum(F.col("value").cast("decimal(18,6)")).cast("double"),
        },
    )
    return out.select(
        F.unix_micros(F.col("window_start")).alias("window_start_us"),
        "event_type",
        "n_events",
        "sum_value",
    )


@register(
    "session_windows",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM e
    )
    SELECT user_id,
           CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM s GROUP BY user_id, sid
    """,
    headline=True,
)
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user — Spark's native
    `session_window`; oracle reproduces the merge semantics with
    gaps-and-islands SQL."""
    from etl_covid19_spark.streaming.windows import session

    ev = _t(spark, sf_dir, "events")
    out = session(
        ev, "ts", "30 minutes", ["user_id"],
        {
            "n_events": F.count(F.lit(1)),
            "sum_value": F.sum(F.col("value").cast("decimal(18,6)")).cast("double"),
        },
    )
    return out.select(
        "user_id",
        F.unix_micros(F.col("session_start")).alias("session_start_us"),
        "n_events",
        "sum_value",
    )


@register(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           upper(substr(hex(encode(text)), 1, 4)) AS magic,
           CAST(64 + ascii(substr(text, 1, 1)) % 64 AS INT) AS width,
           CAST(64 + ascii(substr(text, length(text), 1)) % 64 AS INT) AS height
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: treat the document body as an opaque
    binary payload, extract metadata via Arrow-batched mapInPandas
    (decode step is a deterministic stub — operators.multimodal)."""
    from etl_covid19_spark.operators.multimodal import extract_media_meta

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return extract_media_meta(d, "doc_id", "payload")


# ---------------------------------------------------------------------------
# Advanced joins: as-of / range / salted (time-series + skew surface)
# ---------------------------------------------------------------------------


@register(
    "asof_join_events",
    oracle="""
    WITH c AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    e AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'error'
    )
    SELECT c.event_id, c.user_id,
           epoch_us(c.ts) AS ts_us,
           epoch_us(e.ts) AS err_ts_us,
           e.value AS err_value
    FROM c ASOF JOIN e ON c.user_id = e.user_id AND e.ts <= c.ts
    """,
    headline=True,
)
def q_asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click paired with the user's most recent
    prior error — union + single window pass (operators.joins), one
    key shuffle; the oracle is DuckDB's native ASOF JOIN."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "value"
    )
    out = J.asof_join(
        clicks, errors, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["ts", "value"], how="inner",
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.unix_micros(F.col("asof_ts")).alias("err_ts_us"),
        F.col("asof_value").alias("err_value"),
    )


@register(
    "range_join_events",
    oracle="""
    SELECT a.user_id,
           COUNT(*) AS n_pairs,
           CAST(SUM(CAST(b.value AS DECIMAL(18,6))) AS DOUBLE) AS purchase_value
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'purchase'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
    GROUP BY a.user_id
    """,
)
def q_range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join: purchases within 5 minutes after each
    click, binned into an equi-join (operators.joins.range_join) so
    Catalyst never falls back to a nested-loop theta join."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"), "value"
    )
    pairs = J.range_join(
        clicks, purchases, on=["user_id"],
        left_ts="click_ts", right_ts="purchase_ts",
        lower_s=0, upper_s=300,
    )
    return agg.grouped_agg(
        pairs,
        ["user_id"],
        {
            "n_pairs": F.count(F.lit(1)),
            "purchase_value": F.sum(
                F.col("value").cast("decimal(18,6)")
            ).cast("double"),
        },
    )


@register(
    "skew_salted_join",
    oracle="""
    SELECT concat('flag_', l_returnflag) AS flag_label,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY 1
    """,
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join on a pathologically skewed key (3 distinct
    l_returnflag values over the whole fact table): the salt spreads
    each hot key over 8 reducers; result is identical to the plain
    join the oracle computes."""
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    dim = (
        li.select("l_returnflag")
        .distinct()
        .withColumn("flag_label", F.concat(F.lit("flag_"), F.col("l_returnflag")))
    )
    joined = J.salted_join(li, dim, on=["l_returnflag"], n_salts=8)
    return agg.grouped_agg(
        joined,
        ["flag_label"],
        {"revenue": dsum("l_extendedprice"), "n_items": F.count(F.lit(1))},
    )


# ---------------------------------------------------------------------------
# OLAP shapes: cube / grouping sets / pivot / quantiles
# ---------------------------------------------------------------------------


def _orders_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("region_name"),
            F.col("c_mktsegment").alias("segment"),
            F.col("o_totalprice"),
        )
    )


@register(
    "cube_revenue",
    oracle="""
    SELECT r.r_name AS region_name, c.c_mktsegment AS segment,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY CUBE (r.r_name, c.c_mktsegment)
    """,
)
def q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (region, segment) — all four grouping combinations
    in one Expand + hash aggregate pass."""
    return agg.cube_agg(
        _orders_geo(spark, sf_dir),
        ["region_name", "segment"],
        {"revenue": dsum("o_totalprice"), "n_orders": F.count(F.lit(1))},
    )


@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT r.r_name AS region_name, c.c_mktsegment AS segment,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY GROUPING SETS ((r.r_name), (c.c_mktsegment))
    """,
)
def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — per-region and per-segment totals in
    one pass, no self-union."""
    return agg.grouping_sets_agg(
        _orders_geo(spark, sf_dir),
        sets=[["region_name"], ["segment"]],
        keys=["region_name", "segment"],
        aggs={
            "revenue": (
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)"
            )
        },
    )


@register(
    "pivot_flag_qty",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
                FILTER (l_returnflag = 'A') AS DOUBLE) AS A,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
                FILTER (l_returnflag = 'N') AS DOUBLE) AS N,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
                FILTER (l_returnflag = 'R') AS DOUBLE) AS R
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q_pivot_flag_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (no extra distinct() pass
    over the fact table to discover columns)."""
    li = _t(spark, sf_dir, "lineitem")
    return agg.pivot_agg(
        li, "l_linestatus", "l_returnflag", ["A", "N", "R"],
        dsum("l_quantity"),
    )


@register(
    "order_quantiles",
    oracle="""
    SELECT o_orderpriority,
           CAST(quantile_cont(o_totalprice, 0.25) AS DOUBLE) AS p25,
           CAST(quantile_cont(o_totalprice, 0.50) AS DOUBLE) AS p50,
           CAST(quantile_cont(o_totalprice, 0.75) AS DOUBLE) AS p75,
           CAST(quantile_cont(o_totalprice, 0.90) AS DOUBLE) AS p90
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_order_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (sorted interpolation). The
    operator's approx=True flag switches to t-digest sketches for
    unbounded groups at scale (not oracle-comparable)."""
    return agg.percentiles(
        _t(spark, sf_dir, "orders"),
        ["o_orderpriority"],
        "o_totalprice",
        [0.25, 0.50, 0.75, 0.90],
    )


# ---------------------------------------------------------------------------
# Text: BPE-ish token statistics (portable regex, no lookarounds)
# ---------------------------------------------------------------------------


@register(
    "token_stats",
    oracle="""
    SELECT doc_id,
           len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                           x -> x <> '')) AS n_ws_tokens,
           len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]+'))
             AS n_bpe_tokens,
           len(list_distinct(regexp_extract_all(
               text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]+'))) AS n_distinct_pieces
    FROM documents
    """,
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways — whitespace tokens and BPE-ish pieces
    (alnum runs + punct runs; the same RE2-safe regex runs in the
    oracle) — plus the distinct-piece count."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        text.token_count("text").alias("n_ws_tokens"),
        text.bpe_ish_token_count("text").alias("n_bpe_tokens"),
        F.size(F.array_distinct(text.bpe_ish_tokens("text"))).alias(
            "n_distinct_pieces"
        ),
    )


# ---------------------------------------------------------------------------
# Custom stateful sessionization (applyInPandas / applyInPandasWithState)
# ---------------------------------------------------------------------------


@register(
    "sessionize_pandas",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM e
    )
    SELECT user_id,
           CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start_us,
           CAST(epoch_us(MAX(ts)) AS BIGINT) AS session_end_us,
           COUNT(*) AS n_events,
           CAST(SUM(value) AS DOUBLE) AS sum_value,
           MAX(n_user) > 100000 AS truncated
    FROM (SELECT *, COUNT(*) OVER (PARTITION BY user_id) AS n_user
          FROM s) GROUP BY user_id, sid
    """,
)
def q_sessionize_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom sessionization (10-min gap) through the Arrow/pandas
    path — `applyInPandas` per-key fold; the streaming twin
    (`applyInPandasWithState`) shares the same fold and is exercised
    in tests. Complements the JVM-native session_windows query.
    Per-key group size into the Python worker is capped at the 100k
    earliest events (JVM-side filter), surfaced per row as
    `truncated` (false at test SFs on both sides)."""
    from etl_covid19_spark.streaming.stateful import sessionize_batch

    ev = _t(spark, sf_dir, "events")
    return sessionize_batch(ev, gap_s=600)


# ---------------------------------------------------------------------------
# Spark 4 surface: Variant JSON, Python DataSource; multimodal fan-out; IVF
# ---------------------------------------------------------------------------


@register(
    "variant_json_agg",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS INT))
             AS n_distinct_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_variant_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured via Spark 4's VARIANT type: `parse_json` once,
    then typed `variant_get` path access — the forward-looking
    replacement for string JSON + per-path re-parsing (SURVEY.md
    §1.2's jsonb mapping)."""
    ev = _t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return agg.grouped_agg(
        ev.select("event_type", k.alias("k")),
        ["event_type"],
        {
            "n_distinct_k": F.count_distinct(F.col("k")),
            "max_k": F.max("k"),
        },
    )


@register(
    "ann_ivf_topk",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
    ec AS (
      SELECT e.vec_id, c.cid,
             list_reduce(list_transform(list_zip(e.v, c.cv),
                         p -> struct_extract(p, 1) * struct_extract(p, 2)),
                         (x, y) -> x + y)
             / (sqrt(list_reduce(list_transform(e.v, x -> x * x), (x, y) -> x + y))
                * sqrt(list_reduce(list_transform(c.cv, x -> x * x), (x, y) -> x + y)))
               AS cos
      FROM e CROSS JOIN c
    ),
    assign AS (
      SELECT vec_id AS neighbor_id, cid AS bucket
      FROM (SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY cos DESC, cid DESC) AS rn
            FROM ec)
      WHERE rn = 1
    ),
    probe AS (
      SELECT vec_id AS query_id, cid AS bucket
      FROM (SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY cos DESC, cid DESC) AS rn
            FROM ec WHERE vec_id BETWEEN 8 AND 15)
      WHERE rn <= 2
    ),
    scored AS (
      SELECT p.query_id, a.neighbor_id,
             list_reduce(list_transform(list_zip(q.v, n.v),
                         p2 -> struct_extract(p2, 1) * struct_extract(p2, 2)),
                         (x, y) -> x + y)
             / (sqrt(list_reduce(list_transform(q.v, x -> x * x), (x, y) -> x + y))
                * sqrt(list_reduce(list_transform(n.v, x -> x * x), (x, y) -> x + y)))
               AS cosine
      FROM probe p
      JOIN assign a ON p.bucket = a.bucket
      JOIN e q ON q.vec_id = p.query_id
      JOIN e n ON n.vec_id = a.neighbor_id
      WHERE p.query_id <> a.neighbor_id
    )
    SELECT query_id, neighbor_id, rank, cosine
    FROM (SELECT query_id, neighbor_id,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank,
                 cosine
          FROM scored)
    WHERE rank <= 10
    """,
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k (deterministic centroid stub, 2 probes)
    — unlike most ANN demos this one is fully oracle-checked: the SQL
    replicates assignment, probing, and ranking exactly."""
    from etl_covid19_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb,
        emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 16)),
        "embedding", "vec_id", k=10, n_centroids=8, n_probe=2,
    )


def _ann_ivf_topk_trained_oracle(
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    scale: int = 1_000_000,
) -> str:
    """GENERATED oracle for trained-quantizer IVF retrieval: the
    `knn_graph_ivf_trained` training CTEs (one Lloyd step from
    first-N-by-id seeds, exact fixed-point means) feeding the
    `ann_ivf_topk` assign/probe/rank shape (queries = vec_id 8..15,
    self excluded, ties cosine DESC / neighbor ASC)."""
    seed_cos = _FOLD_COS.format(a="e.v", b="s.cv")
    cent_cos = _FOLD_COS.format(a="e.v", b="t.cv")
    pair_cos = _FOLD_COS.format(a="q.v", b="n.v")
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    seeds AS (
      SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT {n_centroids}
    ),
    sscore AS (
      SELECT e.vec_id, s.cid, {seed_cos} AS cos
      FROM e CROSS JOIN seeds s
    ),
    assign0 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid DESC) AS rn
        FROM sscore
      ) WHERE rn = 1
    ),
    comp AS (
      SELECT a.cid, r.i - 1 AS d,
             SUM(CAST(FLOOR(e.v[r.i] * {scale}) AS BIGINT)) AS s,
             COUNT(*) AS n
      FROM assign0 a JOIN e USING (vec_id),
           unnest(range(1, len(e.v) + 1)) r(i)
      GROUP BY a.cid, r.i
    ),
    trained AS (
      SELECT cid,
             list(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * {scale}.0)
                  ORDER BY d) AS cv
      FROM comp GROUP BY cid
    ),
    ec AS (
      SELECT e.vec_id, t.cid, {cent_cos} AS cos
      FROM e CROSS JOIN trained t
    ),
    assign AS (
      SELECT vec_id AS neighbor_id, cid AS bucket
      FROM (SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY cos DESC, cid DESC) AS rn
            FROM ec)
      WHERE rn = 1
    ),
    probe AS (
      SELECT vec_id AS query_id, cid AS bucket
      FROM (SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY cos DESC, cid DESC) AS rn
            FROM ec WHERE vec_id BETWEEN 8 AND 15)
      WHERE rn <= {n_probe}
    ),
    scored AS (
      SELECT p.query_id, a.neighbor_id, {pair_cos} AS cosine
      FROM probe p
      JOIN assign a ON p.bucket = a.bucket
      JOIN e q ON q.vec_id = p.query_id
      JOIN e n ON n.vec_id = a.neighbor_id
      WHERE p.query_id <> a.neighbor_id
    )
    SELECT query_id, neighbor_id, rank, cosine
    FROM (SELECT query_id, neighbor_id,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank,
                 cosine
          FROM scored)
    WHERE rank <= {k}
    """


@register("ann_ivf_topk_trained", oracle=_ann_ivf_topk_trained_oracle())
def q_ann_ivf_topk_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-quantizer IVF retrieval, fully oracle-checked — the
    retrieval sibling of `knn_graph_ivf_trained`: the fixed-point
    one-Lloyd-step trainer (`train_centroids_fixedpoint`) replaces
    `ann_ivf_topk`'s raw id-ordered centroid stub while keeping a
    CONSTANT centroid count (assignment linear in n at any scale;
    `ivf_topk_trained`'s Spark ML k-means stays the production
    training path, this is its externally-verified twin)."""
    from etl_covid19_spark.operators.similarity import (
        ivf_topk_trained_fixedpoint,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk_trained_fixedpoint(
        emb,
        emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 16)),
        "embedding", "vec_id", k=10, n_centroids=8, n_probe=2,
    )


@register(
    "frame_sample",
    oracle="""
    SELECT doc_id, CAST(f AS INT) AS frame_idx
    FROM documents, unnest(range(0, 300, 30)) t(f)
    """,
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal fan-out plumbing: per-video sampled-frame rows
    (stubbed 300-frame videos, every 30th frame) — the explode shape
    that precedes any per-frame decode UDF."""
    from etl_covid19_spark.operators.multimodal import frame_sample_plan

    d = _t(spark, sf_dir, "documents")
    return frame_sample_plan(d, "doc_id", "text", every_n=30)


@register("rest_extract_datasource", oracle=None)
def q_rest_extract_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 at scale: the REST extract as a Spark 4 Python DataSource —
    one InputPartition per (date, iso), fetched executor-side — fed
    straight into the covid clean plan. Rows-only check (the staging
    payloads don't come from the oracle's parquet tables)."""
    from etl_covid19_spark.plans import covid
    from etl_covid19_spark.sources.rest_datasource import RestReportsDataSource

    spark.dataSource.register(RestReportsDataSource)
    raw = (
        spark.read.format("rest_reports")
        .option("ds_start", "2023-01-01")
        .option("ds_end", "2023-01-03")
        .load()
    )
    clean = covid.clean(raw)
    return agg.grouped_agg(
        clean,
        ["day_of_data", "country_name"],
        {"n_regions": F.count(F.lit(1))},
    )


# ---------------------------------------------------------------------------
# Multi-dimension profit rollup (covers part + supplier) and a true
# streaming execution checked against the batch oracle
# ---------------------------------------------------------------------------


@register(
    "profit_by_nation_brand",
    oracle="""
    SELECT n.n_name AS nation, p.p_brand AS brand,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l.l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_size <= 20
    GROUP BY n.n_name, p.p_brand
    """,
    headline=True,
)
def q_profit_by_nation_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape over part ⋈ supplier ⋈ nation: the filtered
    part dimension broadcasts (its p_size predicate prunes before the
    join, the dynamic-filter pattern), so the fact scan streams
    through three hash joins and only the 2-key aggregate shuffles."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 20)
        .select("p_partkey", "p_brand")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ext = F.col("l_extendedprice").cast("decimal(18,4)")
    one_disc = (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    # only nation (25 rows, constant) carries a broadcast HINT; the
    # filtered part and supplier sides scale linearly with the
    # corpus, so AQE decides from measured sizes (it converts both
    # to broadcast at every bench SF — plan-checked — without the
    # 100 TB forced-broadcast hazard)
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("p_brand").alias("brand"),
            (ext * one_disc).alias("disc_price"),
        )
    )
    return agg.grouped_agg(
        joined,
        ["nation", "brand"],
        {
            "revenue": F.sum("disc_price").cast("double"),
            "n_items": F.count(F.lit(1)),
        },
    )


@register(
    "streaming_tumbling",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 600) * 600 * 1000000 AS BIGINT) AS window_start_us,
           event_type,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def q_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Structured Streaming execution, oracle-checked: the
    events parquet replayed through readStream with a watermark,
    10-minute tumbling windows aggregated in complete mode into a
    memory sink, drained with Trigger.AvailableNow. Complete mode
    emits every window at end-of-input, so the final table equals the
    batch aggregation — which is exactly what the oracle computes."""
    import uuid

    from etl_covid19_spark.sources.catalog import (
        ensure_runtime_confs,
        events_stream,
    )

    # defensively apply nanosAsLong/UTC before the stream is built —
    # this query bypasses load_table, so on a host-built session it
    # would otherwise depend on some earlier query having run first
    ensure_runtime_confs(spark)

    name = f"stream_tumb_{uuid.uuid4().hex[:8]}"
    stream = (
        events_stream(spark, sf_dir)
        .select("ts", "event_type")
        .withWatermark("ts", "10 minutes")
    )
    agg_df = stream.groupBy(
        F.window("ts", "10 minutes"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    q = (
        agg_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        "event_type",
        "n_events",
    )


@register(
    "stream_stream_join",
    oracle="""
    SELECT a.user_id,
           epoch_us(a.ts) AS click_us,
           epoch_us(b.ts) AS purchase_us,
           b.value AS purchase_value
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'purchase'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL stream-stream join execution, oracle-checked: clicks
    and purchases replayed as two watermarked streams, inner-joined
    on user within a 5-minute attribution window, drained with
    Trigger.AvailableNow into a memory sink. Inner joins emit on
    match (the watermark bounds STATE, not output), so the drained
    table equals the batch interval join — which is exactly what the
    oracle computes. The watermark is the 100 TB story: state per
    side is O(rate × (delay + window)), never the whole stream."""
    import uuid

    from etl_covid19_spark.sources.catalog import (
        ensure_runtime_confs,
        events_stream,
    )
    from etl_covid19_spark.streaming.joins import interval_stream_join

    ensure_runtime_confs(spark)

    def event_stream():
        return events_stream(spark, sf_dir).select(
            "ts", "user_id", "event_type", "value"
        )

    clicks = (
        event_stream()
        .where(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"))
    )
    purchases = (
        event_stream()
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    joined = interval_stream_join(
        clicks,
        purchases,
        key_cols=["user_id"],
        left_ts="click_ts",
        right_ts="purchase_ts",
        lower_s=0,
        upper_s=300,
        watermark="10 minutes",
        right_payload=["purchase_value"],
    )
    name = f"stream_join_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "user_id",
        F.unix_micros(F.col("click_ts")).alias("click_us"),
        F.unix_micros(F.col("purchase_ts")).alias("purchase_us"),
        "purchase_value",
    )


@register(
    "dedup_clusters",
    oracle="""
    WITH RECURSIVE t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks)-1),
                                   i -> array_to_string(toks[i:i+2], ' '))
               ELSE [array_to_string(toks, ' ')] END) AS grams
      FROM t
    ),
    p AS (SELECT doc_id, len(grams) AS n, unnest(grams) AS sh FROM g),
    c AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
             COUNT(*) AS nc
      FROM p a JOIN p b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM c
      WHERE nc * 1.0 / (na + nb - nc) >= 0.8
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS doc_id, MIN(label) AS cluster_id
    FROM reach GROUP BY node
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair graph → dedup clusters: MinHash+LSH near-dup pairs
    (exact-verified at J≥0.8) fed through iterative min-label
    connected components. cluster_id = the component's smallest doc
    id, i.e. the canonical document to keep. The oracle recomputes
    the same components with a recursive CTE over the exact-Jaccard
    pair set."""
    from etl_covid19_spark.operators.dedup import (
        components_auto,
        minhash_lsh_pairs,
    )

    pairs = minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        n=3, num_hashes=96, bands=24, threshold=0.8,
    )
    return components_auto(pairs)


@register(
    "window_rank_suite",
    oracle="""
    WITH cust AS (
      SELECT c.c_custkey, c.c_mktsegment,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    )
    SELECT c_custkey, c_mktsegment, revenue,
           CAST(RANK() OVER w AS INT) AS rnk,
           CAST(DENSE_RANK() OVER w AS INT) AS drnk,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           CAST(FIRST_VALUE(revenue) OVER w AS DOUBLE) AS seg_top_revenue
    FROM cust
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY revenue DESC, c_custkey ASC)
    QUALIFY rnk <= 25
    """,
)
def q_window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window suite — rank / dense_rank / ntile / first_value
    over a per-segment revenue ordering, top-25 per segment. One
    shuffle on the partition key serves all four functions."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = _t(spark, sf_dir, "orders")
    cust = agg.grouped_agg(
        o.join(c, o.o_custkey == c.c_custkey),
        ["c_custkey", "c_mktsegment"],
        {"revenue": dsum("o_totalprice")},
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("revenue").desc(), F.col("c_custkey").asc()
    )
    return (
        cust.select(
            "c_custkey", "c_mktsegment", "revenue",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.first("revenue").over(w).alias("seg_top_revenue"),
        )
        .where(F.col("rnk") <= 25)
    )


@register(
    "sliding_windows",
    oracle="""
    WITH e AS (
      SELECT event_type, value,
             CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS base
      FROM events
    ),
    w AS (
      SELECT event_type, value, unnest([base, base - 300]) AS win_start
      FROM e
    )
    SELECT CAST(win_start * 1000000 AS BIGINT) AS window_start_us,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM w GROUP BY 1, 2
    """,
)
def q_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (10 min long, 5 min hop): every
    event lands in exactly two overlapping windows — Spark's window()
    Expand; the oracle unrolls the same two starts per event."""
    from etl_covid19_spark.streaming.windows import sliding

    ev = _t(spark, sf_dir, "events")
    out = sliding(
        ev, "ts", "10 minutes", "5 minutes", ["event_type"],
        {
            "n_events": F.count(F.lit(1)),
            "sum_value": F.sum(F.col("value").cast("decimal(18,6)")).cast("double"),
        },
    )
    return out.select(
        F.unix_micros(F.col("window_start")).alias("window_start_us"),
        "event_type",
        "n_events",
        "sum_value",
    )


@register("sketch_distinct_users", oracle=None)
def q_sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx distinct users per event type via Apache DataSketches
    HLL (Spark's hll_sketch_agg): the 100 TB path for COUNT(DISTINCT)
    — fixed-size mergeable sketches shuffle instead of the full key
    set, and pre-aggregated sketches can be stored and re-merged
    across partitions/days without rescanning. Estimate-valued →
    rows-only check; accuracy vs exact is asserted in tests."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id"), F.lit(14))
            ).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "corpus_curation",
    oracle="""
    WITH RECURSIVE t AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks,
             length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS n_punct
      FROM documents
    ),
    m AS (
      SELECT doc_id, text, toks,
             round(0.3 * least(length(text) / 200.0, 1.0)
                 + 0.3 * (CASE WHEN list_reduce(list_prepend(0,
                               list_transform(toks, x -> length(x))), (a,b) -> a+b)
                               / greatest(len(toks), 1) >= 2
                           AND list_reduce(list_prepend(0,
                               list_transform(toks, x -> length(x))), (a,b) -> a+b)
                               / greatest(len(toks), 1) <= 12
                          THEN 1.0 ELSE 0.3 END)
                 + 0.2 * (1.0 - least(n_punct / greatest(length(text), 1) * 5, 1.0))
                 + 0.2 * least(len(list_filter(toks, x -> lower(x) IN
                     ('the','a','an','and','or','of','to','in','is','are','for',
                      'on','with','as','at','by','it','this','that')))
                     / greatest(len(toks), 1) * 4, 1.0), 6) AS quality,
             CASE WHEN len(list_filter(toks, x -> lower(x) IN ('the','and','of','to','a')))
                       >= greatest(
                          len(list_filter(toks, x -> lower(x) IN ('el','la','de','que','y'))),
                          len(list_filter(toks, x -> lower(x) IN ('le','la','de','et','les'))),
                          len(list_filter(toks, x -> lower(x) IN ('der','die','und','das','ist'))),
                          len(list_filter(toks, x -> lower(x) IN ('de5','shi4','le5','zai4','he2'))))
                  THEN 'en'
                  WHEN len(list_filter(toks, x -> lower(x) IN ('el','la','de','que','y')))
                       >= greatest(
                          len(list_filter(toks, x -> lower(x) IN ('le','la','de','et','les'))),
                          len(list_filter(toks, x -> lower(x) IN ('der','die','und','das','ist'))),
                          len(list_filter(toks, x -> lower(x) IN ('de5','shi4','le5','zai4','he2'))))
                  THEN 'es'
                  WHEN len(list_filter(toks, x -> lower(x) IN ('le','la','de','et','les')))
                       >= greatest(
                          len(list_filter(toks, x -> lower(x) IN ('der','die','und','das','ist'))),
                          len(list_filter(toks, x -> lower(x) IN ('de5','shi4','le5','zai4','he2'))))
                  THEN 'fr'
                  WHEN len(list_filter(toks, x -> lower(x) IN ('der','die','und','das','ist')))
                       >= len(list_filter(toks, x -> lower(x) IN ('de5','shi4','le5','zai4','he2')))
                  THEN 'de'
                  ELSE 'zh' END AS predicted_lang
      FROM t
    ),
    surv AS (
      SELECT doc_id, text, toks FROM m
      WHERE quality >= 0.5 AND predicted_lang = 'en'
    ),
    canon AS (SELECT MIN(doc_id) AS doc_id FROM surv GROUP BY text),
    ek AS (SELECT s.doc_id, s.toks FROM surv s JOIN canon c ON s.doc_id = c.doc_id),
    g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks)-1),
                                   i -> array_to_string(toks[i:i+2], ' '))
               ELSE [array_to_string(toks, ' ')] END) AS grams
      FROM ek
    ),
    p AS (SELECT doc_id, len(grams) AS n, unnest(grams) AS sh FROM g),
    c2 AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
             COUNT(*) AS nc
      FROM p a JOIN p b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM c2
      WHERE nc * 1.0 / (na + nb - nc) >= 0.8
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    ),
    clusters AS (SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node),
    near_drop AS (SELECT node AS doc_id FROM clusters WHERE cluster_id <> node)
    SELECT m.doc_id, m.quality, m.predicted_lang,
           (CASE WHEN m.quality < 0.5 THEN 'low_quality'
                 WHEN m.predicted_lang <> 'en' THEN 'wrong_lang'
                 WHEN ek.doc_id IS NULL THEN 'exact_dup'
                 WHEN nd.doc_id IS NOT NULL THEN 'near_dup'
                 ELSE 'kept' END) AS reason,
           (CASE WHEN m.quality < 0.5 THEN 'low_quality'
                 WHEN m.predicted_lang <> 'en' THEN 'wrong_lang'
                 WHEN ek.doc_id IS NULL THEN 'exact_dup'
                 WHEN nd.doc_id IS NOT NULL THEN 'near_dup'
                 ELSE 'kept' END) = 'kept' AS keep
    FROM m
    LEFT JOIN ek ON m.doc_id = ek.doc_id
    LEFT JOIN near_drop nd ON m.doc_id = nd.doc_id
    """,
)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE flagship training-data pipeline, end-to-end: quality
    scoring → language-ID → exact-dup canonicalization → LSH near-dup
    cluster canonicalization → per-document (keep, reason) verdict.
    Cheap columnar filters run before the pair-generation stages; the
    whole chain, including the iterative component step, hash-matches
    the composed SQL oracle."""
    from etl_covid19_spark.plans.corpus import curate

    return curate(_t(spark, sf_dir, "documents"))


@register(
    "above_avg_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 1.5 * (
      SELECT AVG(o2.o_totalprice) FROM orders o2
      WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def q_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — orders 1.5× above their
    customer's average. Expressed through the SQL surface so
    Catalyst's decorrelation rewrites it into an aggregate + join
    (SURVEY.md §4: subquery decorrelation, unused by the reference
    but part of the engine's analytics surface)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_orders_corr")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM _orders_corr o
        WHERE o.o_totalprice > 1.5 * (
          SELECT AVG(o2.o_totalprice) FROM _orders_corr o2
          WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@register(
    "scalar_kit",
    oracle="""
    SELECT s_suppkey,
           upper(s_name) AS name_upper,
           reverse(s_name) AS name_rev,
           lpad(s_name, 30, '*') AS name_lpad,
           rpad(s_name, 30, '-') AS name_rpad,
           substr(s_name, 3, 5) AS name_mid,
           replace(s_name, '#', '-') AS name_repl,
           concat_ws('|', s_name, CAST(s_nationkey AS VARCHAR)) AS name_tag,
           CAST(abs(s_acctbal) AS DOUBLE) AS bal_abs,
           CAST(sign(s_acctbal) AS DOUBLE) AS bal_sign,
           CAST(ceil(s_acctbal) AS DOUBLE) AS bal_ceil,
           CAST(floor(s_acctbal) AS DOUBLE) AS bal_floor,
           CAST(round(s_acctbal) AS DOUBLE) AS bal_round,
           CAST(sqrt(abs(s_acctbal)) AS DOUBLE) AS bal_sqrt,
           CAST(pow(CAST(s_nationkey AS DOUBLE), 2) AS DOUBLE) AS nk_sq,
           coalesce(nullif(s_nationkey, 0), -1) AS nk_nz,
           least(s_nationkey, 10) AS nk_least,
           greatest(s_nationkey, 10) AS nk_greatest
    FROM supplier
    """,
)
def q_scalar_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function breadth (SURVEY.md §2.6 C1/ST1/ST2/CA1
    generalized): string pad/reverse/substr/replace/concat, numeric
    abs/sign/ceil/floor/round/sqrt/pow, and the null kit
    (coalesce/nullif/least/greatest) — all JVM expressions inside one
    codegen stage, bit-matched against the oracle."""
    s = _t(spark, sf_dir, "supplier")
    bal = F.col("s_acctbal")
    return s.select(
        "s_suppkey",
        F.upper("s_name").alias("name_upper"),
        F.reverse(F.col("s_name")).alias("name_rev"),
        F.lpad("s_name", 30, "*").alias("name_lpad"),
        F.rpad("s_name", 30, "-").alias("name_rpad"),
        F.substring("s_name", 3, 5).alias("name_mid"),
        F.regexp_replace("s_name", "#", "-").alias("name_repl"),
        F.concat_ws("|", "s_name", F.col("s_nationkey").cast("string")).alias(
            "name_tag"
        ),
        F.abs(bal).cast("double").alias("bal_abs"),
        F.signum(bal).cast("double").alias("bal_sign"),
        F.ceil(bal).cast("double").alias("bal_ceil"),
        F.floor(bal).cast("double").alias("bal_floor"),
        F.round(bal).cast("double").alias("bal_round"),
        F.sqrt(F.abs(bal)).cast("double").alias("bal_sqrt"),
        F.pow(F.col("s_nationkey").cast("double"), 2).cast("double").alias("nk_sq"),
        F.coalesce(F.nullif(F.col("s_nationkey"), F.lit(0)), F.lit(-1)).alias(
            "nk_nz"
        ),
        F.least(F.col("s_nationkey"), F.lit(10)).alias("nk_least"),
        F.greatest(F.col("s_nationkey"), F.lit(10)).alias("nk_greatest"),
    )


@register(
    "posexplode_positions",
    oracle="""
    SELECT d.doc_id,
           generate_subscripts(toks, 1) - 1 AS pos,
           unnest(toks) AS tok
    FROM (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents WHERE doc_id < 50
    ) d
    """,
)
def q_posexplode_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode — (doc_id, token position, token), the
    fan-out shape for order-aware token processing (0-based to match
    Spark's posexplode)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id", F.posexplode(text.tokens("text")).alias("pos", "tok")
    )


@register(
    "unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, name AS measure, value
    FROM (
      UNPIVOT (
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
        FROM lineitem WHERE l_orderkey < 100
      ) ON l_quantity, l_extendedprice, l_discount
      INTO NAME name VALUE value
    )
    """,
)
def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt — wide measures to (measure, value) rows; the
    inverse of pivot_flag_qty, one Expand node, no shuffle."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "value",
    )


@register(
    "array_kit",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           len(toks) AS n_toks,
           COALESCE(array_to_string(toks[1:3], ' '), '') AS first3,
           COALESCE(array_to_string(list_sort(toks[1:5]), ' '), '')
             AS sorted5,
           list_contains(toks, 'the') AS has_the,
           COALESCE(array_to_string(toks[1:4], ' '), '') AS joined4,
           COALESCE(array_to_string(list_sort(list_distinct(
               list_intersect(toks, ['the', 'a', 'of', 'and']))), ' '), '')
             AS stop_hits,
           COALESCE(array_to_string(list_sort(list_distinct(toks[1:6])),
                                    ' '), '') AS distinct6
    FROM t
    """,
)
def q_array_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function breadth: size/slice/sort/contains/join/
    intersect/distinct over the token arrays.  Every array-valued
    result leaves the query as a space-joined string (array_join vs
    array_to_string, sorted first where set-valued) because the
    driver's pandas canonicalizer cannot sort ndarray cells — the
    same encode contract map_kit uses for its map columns (r7 red
    row, VERDICT round-7 ask #1)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = text.tokens("text")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.coalesce(F.array_join(F.slice(toks, 1, 3), " "), F.lit("")).alias("first3"),
        F.coalesce(
            F.array_join(F.array_sort(F.slice(toks, 1, 5)), " "), F.lit("")
        ).alias("sorted5"),
        F.array_contains(toks, "the").alias("has_the"),
        F.coalesce(F.array_join(F.slice(toks, 1, 4), " "), F.lit("")).alias("joined4"),
        F.coalesce(
            F.array_join(
                F.array_sort(
                    F.array_distinct(
                        F.array_intersect(
                            toks,
                            F.array(
                                *[F.lit(x) for x in ("the", "a", "of", "and")]
                            ),
                        )
                    )
                ),
                " ",
            ),
            F.lit(""),
        ).alias("stop_hits"),
        F.coalesce(
            F.array_join(
                F.array_sort(F.array_distinct(F.slice(toks, 1, 6))), " "
            ),
            F.lit(""),
        ).alias("distinct6"),
    )


@register(
    "datetime_breadth",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT)
             AS days_since_95,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
           CAST(o_orderdate + INTERVAL 10 DAY AS DATE) AS plus_10d
    FROM orders WHERE o_orderkey < 200
    """,
)
def q_datetime_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime breadth beyond D1-D8: trunc/last_day/quarter/ISO
    week/datediff/add_months/date_add, matched against the oracle's
    interval arithmetic."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.trunc(d, "month").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.quarter(d).alias("qtr"),
        F.weekofyear(d).alias("iso_week"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        F.add_months(d, 3).alias("plus_3m"),
        F.date_add(d, 10).alias("plus_10d"),
    )


@register(
    "regexp_kit",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+) ([a-z]+)', 1) AS first_word,
           regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
           len(regexp_extract_all(text, '[a-z]+a[a-z]*')) AS n_a_words,
           regexp_matches(text, 'spark') AS mentions_spark,
           regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled
    FROM documents WHERE doc_id < 100
    """,
)
def q_regexp_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex kit with RE2-portable patterns (no lookarounds, no
    backrefs): group extraction, extract-all counting, boolean match,
    global replace — identical semantics across engines."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    pat = r"([a-z]+) ([a-z]+)"
    return d.select(
        "doc_id",
        F.regexp_extract("text", pat, 1).alias("first_word"),
        F.regexp_extract("text", pat, 2).alias("second_word"),
        F.size(
            F.regexp_extract_all("text", F.lit(r"[a-z]+a[a-z]*"), F.lit(0))
        ).alias("n_a_words"),
        F.col("text").rlike("spark").alias("mentions_spark"),
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled"),
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — the pure scan-filter-aggregate: every
    predicate reaches the parquet scan, zero joins, one global
    aggregate; the canonical pushdown benchmark."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    )
    ext = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(8,4)")
    return li.agg(
        F.sum(ext * disc).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l.l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS DATE) AS order_date,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 20
    """,
)
def q_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — selective dim filter → fact joins → grouped
    revenue → top-k. The segment-filtered customer side broadcasts;
    the top-20 plans as TakeOrderedAndProject."""
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    ext = F.col("l_extendedprice").cast("decimal(18,4)")
    one_disc = (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    # the segment-filtered customer side is still ~1/5 of a
    # linearly-scaling table — no forced broadcast; AQE converts at
    # bench SFs, shuffles it at 100 TB
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
    )
    grouped = joined.groupBy(
        "l_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        "o_orderpriority",
    ).agg(F.sum(ext * one_disc).cast("double").alias("revenue"))
    return agg.top_k(
        grouped.select("l_orderkey", "revenue", "order_date", "o_orderpriority"),
        [F.col("revenue").desc(), F.col("l_orderkey").asc()],
        20,
    )


@register(
    "chunk_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id, CAST(c AS INT) AS chunk_idx,
           array_to_string(toks[c * 24 + 1 : c * 24 + 32], ' ') AS chunk_text,
           len(toks[c * 24 + 1 : c * 24 + 32]) AS n_tokens
    FROM t, unnest(range(0, CAST(ceil(greatest(len(toks) - 8, 1) / 24.0) AS BIGINT)))
           AS u(c)
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking — 32-token windows with 8-token overlap
    (stride 24), the context-window prep step for pre-training/RAG
    pipelines. Pure fan-out: sequence + explode + slice, no shuffle
    until a downstream consumer groups."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    size, stride = 32, 24
    toks = text.tokens("text")
    n_chunks = F.ceil(
        F.greatest(F.size(toks) - (size - stride), F.lit(1)) / stride
    ).cast("bigint")
    chunks = d.select(
        "doc_id",
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    piece = F.slice(F.col("_toks"), F.col("chunk_idx") * stride + 1, size)
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


@register(
    "vocab_top_tokens",
    oracle="""
    WITH toks AS (
      SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                x -> x <> '')) AS tok
      FROM documents
    )
    SELECT tok, COUNT(*) AS freq,
           CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok ASC) AS INT)
             AS vocab_id
    FROM toks GROUP BY tok
    ORDER BY freq DESC, tok ASC
    LIMIT 100
    """,
)
def q_vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building — corpus-wide token frequencies with
    deterministic vocab ids (freq desc, token asc). Explode + hash
    aggregate + top-k; at 100 TB the aggregate's map-side combine
    keeps the shuffle at |vocab|, not |tokens|."""
    d = _t(spark, sf_dir, "documents")
    freqs = (
        d.select(F.explode(text.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # top-k FIRST (TakeOrderedAndProject — per-partition heads), THEN
    # rank: the single-partition row_number window only ever sees k
    # rows, never the full vocabulary
    top = agg.top_k(freqs, [F.col("freq").desc(), F.col("tok").asc()], 100)
    w = Window.orderBy(F.col("freq").desc(), F.col("tok").asc())
    return top.withColumn("vocab_id", F.row_number().over(w).cast("int")).select(
        "tok", "freq", "vocab_id"
    )


@register(
    "sql_surface_priority_revenue",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY o_orderpriority
    """,
)
def q_sql_surface_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure-SQL entry point (SURVEY.md §3.3): tables registered
    as views, the query itself is a SQL string — Catalyst replaces
    the reference's in-database Postgres planner. Same engine, same
    plan as the DataFrame surface."""
    from etl_covid19_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY o_orderpriority
        """
    )


@register(
    "hof_kit",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           len(list_filter(toks, x -> length(x) > 5)) > 0 AS any_long,
           len(list_filter(toks, x -> length(x) >= 10)) = 0 AS none_huge,
           list_reduce(list_prepend(0, list_transform(toks, x -> length(x))),
                       (a, b) -> a + b) AS total_chars,
           COALESCE(array_to_string(
               list_transform(toks[1:3], x -> upper(x)), ' '), '') AS upper3,
           COALESCE(array_to_string(
               list_filter(toks[1:6], x -> length(x) = 4), ' '), '')
             AS four_letter
    FROM t
    """,
)
def q_hof_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function kit — exists/forall/aggregate/transform/
    filter lambdas over token arrays, the per-row functional surface
    the dedup and text operators are built from.  Array-valued
    outputs (upper3, four_letter) leave as space-joined strings —
    the driver's pandas canonicalizer cannot sort ndarray cells
    (map_kit encode contract; VERDICT round-7 ask #1)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = text.tokens("text")
    return d.select(
        "doc_id",
        F.exists(toks, lambda x: F.length(x) > 5).alias("any_long"),
        F.forall(toks, lambda x: F.length(x) < 10).alias("none_huge"),
        F.aggregate(
            toks, F.lit(0), lambda acc, x: acc + F.length(x)
        ).alias("total_chars"),
        F.coalesce(
            F.array_join(
                F.transform(F.slice(toks, 1, 3), lambda x: F.upper(x)), " "
            ),
            F.lit(""),
        ).alias("upper3"),
        F.coalesce(
            F.array_join(
                F.filter(F.slice(toks, 1, 6), lambda x: F.length(x) == 4), " "
            ),
            F.lit(""),
        ).alias("four_letter"),
    )


@register(
    "map_kit",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority, o_orderstatus AS k, COUNT(*) AS v
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS INT) AS n_statuses,
           string_agg(k, ',' ORDER BY k) AS status_list,
           CAST(SUM(v) AS BIGINT) AS total_orders,
           COALESCE(MAX(CASE WHEN k = 'F' THEN v END), 0) AS f_orders,
           string_agg(k || '=' || CAST(v AS VARCHAR), ';' ORDER BY k)
             AS encoded,
           COALESCE(string_agg(k, ',' ORDER BY k)
                      FILTER (v * 2 > (SELECT SUM(v) FROM g g2
                                       WHERE g2.o_orderpriority = g.o_orderpriority)),
                    '') AS majority_statuses,
           string_agg(k || '=' ||
                      CAST(CAST(FLOOR(v * 1000000.0 / (SELECT SUM(v) FROM g g3
                            WHERE g3.o_orderpriority = g.o_orderpriority))
                           AS BIGINT) AS VARCHAR), ';' ORDER BY k) AS ppm_encoded
    FROM g
    GROUP BY o_orderpriority
    """,
)
def q_map_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type function kit over REAL map columns, made oracle-
    stable by a canonical encoding (the ROADMAP deferral, resolved):
    map values are built with map_from_entries over SORTED entries,
    manipulated with map_keys/map_values/element_at/map_filter/
    transform_values, and every map leaving the query is flattened to
    a deterministic 'k=v;…' string in sorted-key order — sidestepping
    engine-dependent map key order (Spark insertion vs DuckDB/Python
    round-trips) without giving up map semantics inside the plan.
    Doubles never stringify: ratio values are floored to integer ppm
    first (identical FLOOR semantics both engines)."""
    o = _t(spark, sf_dir, "orders")
    g = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("v")
    )
    m = g.groupBy("o_orderpriority").agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("o_orderstatus").alias("k"), F.col("v").alias("v")
                    )
                )
            )
        ).alias("status_counts")
    )
    sc = F.col("status_counts")
    total = F.aggregate(
        F.map_values(sc), F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    m = m.withColumn("_total", total)
    # transform_values → integer ppm shares; map_filter → majority
    # statuses; entries are already key-sorted by construction, so
    # array_join over map_entries is the canonical encoding
    ppm = F.transform_values(
        sc,
        lambda k, v: F.floor(
            v * F.lit(1000000.0) / F.col("_total")
        ).cast("bigint"),
    )
    majority = F.map_filter(sc, lambda k, v: v * 2 > F.col("_total"))

    def encode(map_col) -> F.Column:
        return F.array_join(
            F.transform(
                F.map_entries(map_col),
                lambda e: F.concat(
                    e.getField("key"),
                    F.lit("="),
                    e.getField("value").cast("string"),
                ),
            ),
            ";",
        )

    return m.select(
        "o_orderpriority",
        F.size(sc).alias("n_statuses"),
        F.array_join(F.map_keys(sc), ",").alias("status_list"),
        F.col("_total").alias("total_orders"),
        F.coalesce(
            F.element_at(sc, F.lit("F")), F.lit(0).cast("bigint")
        ).alias("f_orders"),
        encode(sc).alias("encoded"),
        F.array_join(F.map_keys(majority), ",").alias("majority_statuses"),
        encode(ppm).alias("ppm_encoded"),
    )


@register(
    "window_range_frame",
    oracle="""
    WITH cust AS (
      SELECT o_custkey, o_orderdate,
             CAST(o_totalprice AS DECIMAL(18,4)) AS price
      FROM orders WHERE o_custkey < 200
    )
    SELECT o_custkey,
           CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS order_date_key,
           CAST(SUM(price) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS trailing_90d_revenue,
           CAST(COUNT(*) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW)
                AS BIGINT) AS trailing_90d_orders
    FROM cust
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE window frames (INTERVAL-bounded): trailing
    90-day revenue per customer. RANGE frames bound by *values* of
    the ordering column, not row counts — the standard trailing-
    window analytic, and at scale a single hash-partition + one
    in-partition sort per key (no self-join formulation). Expressed
    through the SQL surface because interval range frames are a
    SQL-grammar feature (the DataFrame rangeBetween API takes only
    numeric offsets)."""
    from etl_covid19_spark.sources.catalog import load_table

    load_table(spark, "orders", sf_dir).createOrReplaceTempView(
        "orders_range_v"
    )
    return spark.sql(
        """
        WITH cust AS (
          SELECT o_custkey, o_orderdate,
                 CAST(o_totalprice AS DECIMAL(18,4)) AS price
          FROM orders_range_v WHERE o_custkey < 200
        )
        SELECT o_custkey,
               CAST(date_format(o_orderdate, 'yyyyMMdd') AS INT)
                 AS order_date_key,
               CAST(SUM(price) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate
                     RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS trailing_90d_revenue,
               COUNT(*) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate
                     RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW)
                 AS trailing_90d_orders
        FROM cust
        """
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — correlated EXISTS subquery (the one subquery
    flavor the surface lacked; above_avg_orders covers the scalar
    kind), adapted to the fixture's lineitem columns: orders with at
    least one line shipped >60 days after ordering. Catalyst
    decorrelates EXISTS into a left-semi join, so at scale this is
    one shuffle on the order key, not a per-row probe."""
    from etl_covid19_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
        """
    )


@register(
    "q12_lineflag_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q_q12_lineflag_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — conditional aggregation (CASE inside SUM)
    over a fact-fact join, adapted to the fixture's columns (return
    flag standing in for ship mode). The ship-date window pushes into
    the lineitem scan; the join carries only surviving lines."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = _t(spark, sf_dir, "lineitem")
    lines = l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lines.join(o, lines.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "stratified_sample",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang, length(text) AS n_chars,
             ((doc_id * 2654435761) % 1000 + 1000) % 1000 AS bucket
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
    FROM scored
    WHERE bucket < CASE WHEN lang = 'en' THEN 200 ELSE 500 END
    GROUP BY lang
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling — the training-data-mix
    operator: per-stratum rates (20% of English docs, 50% of
    everything else) selected by KEY-HASH bucketing, not an RNG.
    Hash sampling is the scale-correct form: reproducible across
    runs/engines (hence oracle-checkable, unlike sampleBy's RNG),
    stable under repartitioning, and map-side only — the sample
    decision never shuffles. The same bucket column splits
    train/validation/test disjointly."""
    d = _t(spark, sf_dir, "documents")
    bucket = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(1000))
    rate = F.when(F.col("lang") == "en", F.lit(200)).otherwise(F.lit(500))
    return (
        d.withColumn("bucket", bucket)
        .where(F.col("bucket") < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.length("text")).alias("sampled_chars"),
        )
    )


@register(
    "json_try_parse",
    oracle="""
    WITH mixed AS (
      SELECT 'props' AS source, props AS payload FROM events
      UNION ALL
      SELECT 'text' AS source, text AS payload FROM documents
    )
    SELECT source,
           CAST(SUM(CASE WHEN COALESCE(json_valid(payload), false)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           CAST(SUM(CASE WHEN COALESCE(json_valid(payload), false)
                    THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid
    FROM mixed
    GROUP BY source
    """,
)
def q_json_try_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input tolerance for the JSON surface: try_parse_json
    classifies every payload as parseable or not WITHOUT failing the
    job (the PERMISSIVE posture a raw ingest zone needs — one corrupt
    API response must not kill a 100 TB backfill; the reference's
    Postgres flavor would abort the whole INSERT). Valid JSON event
    props and free-text documents are unioned and tallied per
    source."""
    ev = _t(spark, sf_dir, "events").select(
        F.lit("props").alias("source"), F.col("props").alias("payload")
    )
    docs = _t(spark, sf_dir, "documents").select(
        F.lit("text").alias("source"), F.col("text").alias("payload")
    )
    ok = F.try_parse_json(F.col("payload")).isNotNull()
    return (
        ev.unionByName(docs)
        .groupBy("source")
        .agg(
            F.sum(F.when(ok, 1).otherwise(0)).alias("n_valid"),
            F.sum(F.when(ok, 0).otherwise(1)).alias("n_invalid"),
        )
    )


@register(
    "multimodal_resize",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             64 + ascii(substr(text, 1, 1)) % 64 AS w,
             64 + ascii(substr(text, length(text), 1)) % 64 AS h
      FROM documents
    )
    SELECT doc_id,
           GREATEST(CAST(FLOOR(n_bytes / 4.0) AS BIGINT), 1) AS thumb_bytes,
           GREATEST(CAST(FLOOR(w / (GREATEST(w, h) / 32.0)) AS INT), 1)
             AS thumb_w,
           GREATEST(CAST(FLOOR(h / (GREATEST(w, h) / 32.0)) AS INT), 1)
             AS thumb_h
    FROM dims
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The thumbnail pass over a binary media column, driven through
    the REAL Arrow mapInPandas plumbing (operators/multimodal.
    resize_images; the decoder is the documented deterministic stub —
    no codec libs in this env — so the oracle can mirror its math).
    The blob itself is reduced to its byte length for comparison;
    blob column pruning and batch shape are what this query pins."""
    from etl_covid19_spark.operators.multimodal import resize_images

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    out = resize_images(d, "doc_id", "payload", max_side=32)
    return out.select(
        "doc_id",
        F.length(F.col("thumb")).cast("bigint").alias("thumb_bytes"),
        "thumb_w",
        "thumb_h",
    )


@register(
    "media_pixel_stats",
    oracle="""
    WITH g AS (
      SELECT i.range AS doc_id, x.range AS x, y.range AS y
      FROM range(16) i, range(8) x, range(8) y
    )
    SELECT doc_id,
           CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
           CAST(SUM((doc_id*31 + x*7 + y*13) % 256) AS DOUBLE) / 64
             AS mean_r,
           CAST(SUM((doc_id*31 + x*7 + y*13 + 101) % 256) AS DOUBLE) / 64
             AS mean_g,
           CAST(SUM((doc_id*31 + x*7 + y*13 + 202) % 256) AS DOUBLE) / 64
             AS mean_b
    FROM g GROUP BY doc_id ORDER BY doc_id
    """,
)
def q_media_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, oracle-verified pixel-for-pixel: sixteen
    8×8 RGB PNGs are encoded driver-side from the arithmetic formula
    v(i,x,y,c) = (i·31 + x·7 + y·13 + c·101) mod 256
    (functions/media.encode_png — filter-0 scanlines, zlib IDAT,
    CRC'd chunks), shipped as binary rows, and decoded
    EXECUTOR-SIDE through the stdlib inflate+unfilter path
    (media.decode_png via operators.multimodal.image_pixel_stats).
    The DuckDB oracle re-derives the channel means from the same
    formula without ever seeing the bytes — if the codec round-trip
    mis-places a single pixel, the means mismatch. Channel sums are
    int64-exact, divided once, so both sides are bit-identical.
    Fixture-sized by design (codec correctness, not scale; the scale
    path for blob columns is blob_stats_arrow/multimodal_meta)."""
    import numpy as np

    from etl_covid19_spark.functions import media as M
    from etl_covid19_spark.operators.multimodal import image_pixel_stats

    y, x, c = np.meshgrid(
        np.arange(8), np.arange(8), np.arange(3), indexing="ij"
    )
    rows = []
    for i in range(16):
        arr = ((i * 31 + x * 7 + y * 13 + c * 101) % 256).astype(np.uint8)
        rows.append((i, bytearray(M.encode_png(arr))))
    d = spark.createDataFrame(rows, "doc_id long, payload binary")
    return image_pixel_stats(d, "doc_id", "payload").orderBy("doc_id")


@register(
    "media_audio_stats",
    oracle="""
    WITH s AS (
      SELECT i.range AS doc_id, t.range AS t,
             ((i.range*17 + t.range*13) % 200 - 100) * 100 AS k
      FROM range(8) i, range(2000) t
    ), f AS (
      SELECT doc_id, k,
             lag(k) OVER (PARTITION BY doc_id ORDER BY t) AS pk
      FROM s
    )
    SELECT doc_id,
           CAST(0.25 AS DOUBLE) AS duration_s,
           sqrt(CAST(SUM(k*k) AS DOUBLE) / 2000) / 32768.0 AS rms,
           CAST(COALESCE(SUM(CASE WHEN (k < 0) != (pk < 0) THEN 1 END), 0)
                AS BIGINT) AS zero_crossings
    FROM f GROUP BY doc_id ORDER BY doc_id
    """,
)
def q_media_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, oracle-verified sample-for-sample: eight
    2000-sample mono PCM16 WAVs at 8 kHz are written driver-side
    from k(i,t) = ((i·17 + t·13) mod 200 − 100)·100 (stdlib `wave`
    writer, integer samples verbatim — no float rounding), then
    decoded EXECUTOR-SIDE via media.decode_wav and reduced to
    duration / RMS / zero-crossings (operators.multimodal.
    audio_features real-WAV path). RMS accumulates the square-sum in
    int64 and the oracle recomputes it from the generating formula —
    sqrt(exact/n)/2^15 on both sides, bit-identical. Fixture-sized
    by design (codec correctness, not scale)."""
    import numpy as np

    from etl_covid19_spark.functions import media as M
    from etl_covid19_spark.operators.multimodal import audio_features

    t = np.arange(2000)
    rows = []
    for i in range(8):
        k = ((i * 17 + t * 13) % 200 - 100) * 100
        rows.append((i, bytearray(M.encode_wav(k, rate=8000))))
    d = spark.createDataFrame(rows, "doc_id long, payload binary")
    return audio_features(d, "doc_id", "payload").orderBy("doc_id")


@register(
    "media_jpeg_stats",
    oracle="""
    WITH blocks AS (
      SELECT i.range AS doc_id, b.range AS blk,
             (i.range*37 + b.range*11) % 256 AS r,
             (i.range*53 + b.range*29 + 85) % 256 AS g,
             (i.range*71 + b.range*47 + 170) % 256 AS bl
      FROM range(12) i, range(4) b
    ),
    ycc AS (
      SELECT doc_id, blk,
        least(greatest(floor(CAST(0.299 AS DOUBLE)*r
              + CAST(0.587 AS DOUBLE)*g + CAST(0.114 AS DOUBLE)*bl
              + CAST(0.5 AS DOUBLE)), CAST(0 AS DOUBLE)),
              CAST(255 AS DOUBLE)) AS y,
        least(greatest(floor(CAST(-0.168736 AS DOUBLE)*r
              + CAST(-0.331264 AS DOUBLE)*g + CAST(0.5 AS DOUBLE)*bl
              + CAST(128 AS DOUBLE) + CAST(0.5 AS DOUBLE)),
              CAST(0 AS DOUBLE)), CAST(255 AS DOUBLE)) AS cb,
        least(greatest(floor(CAST(0.5 AS DOUBLE)*r
              + CAST(-0.418688 AS DOUBLE)*g
              + CAST(-0.081312 AS DOUBLE)*bl
              + CAST(128 AS DOUBLE) + CAST(0.5 AS DOUBLE)),
              CAST(0 AS DOUBLE)), CAST(255 AS DOUBLE)) AS cr
      FROM blocks
    ),
    dcq AS (
      SELECT doc_id, blk,
        least(greatest(
          (CASE WHEN y >= 128
                THEN floor((CAST(8 AS DOUBLE)*(y-128))/16
                           + CAST(0.5 AS DOUBLE))
                ELSE -floor((CAST(8 AS DOUBLE)*(128-y))/16
                            + CAST(0.5 AS DOUBLE)) END * 16)
            / CAST(8 AS DOUBLE) + 128,
          CAST(0 AS DOUBLE)), CAST(255 AS DOUBLE)) AS yd,
        least(greatest(
          (CASE WHEN cb >= 128
                THEN floor((CAST(8 AS DOUBLE)*(cb-128))/17
                           + CAST(0.5 AS DOUBLE))
                ELSE -floor((CAST(8 AS DOUBLE)*(128-cb))/17
                            + CAST(0.5 AS DOUBLE)) END * 17)
            / CAST(8 AS DOUBLE) + 128,
          CAST(0 AS DOUBLE)), CAST(255 AS DOUBLE)) AS cbd,
        least(greatest(
          (CASE WHEN cr >= 128
                THEN floor((CAST(8 AS DOUBLE)*(cr-128))/17
                           + CAST(0.5 AS DOUBLE))
                ELSE -floor((CAST(8 AS DOUBLE)*(128-cr))/17
                            + CAST(0.5 AS DOUBLE)) END * 17)
            / CAST(8 AS DOUBLE) + 128,
          CAST(0 AS DOUBLE)), CAST(255 AS DOUBLE)) AS crd
      FROM ycc
    ),
    rgb AS (
      SELECT doc_id, blk,
        least(greatest(floor(yd + CAST(1.402 AS DOUBLE)*(crd-128)
              + CAST(0.5 AS DOUBLE)), CAST(0 AS DOUBLE)),
              CAST(255 AS DOUBLE)) AS rd,
        least(greatest(floor(yd + CAST(-0.344136 AS DOUBLE)*(cbd-128)
              + CAST(-0.714136 AS DOUBLE)*(crd-128)
              + CAST(0.5 AS DOUBLE)), CAST(0 AS DOUBLE)),
              CAST(255 AS DOUBLE)) AS gd,
        least(greatest(floor(yd + CAST(1.772 AS DOUBLE)*(cbd-128)
              + CAST(0.5 AS DOUBLE)), CAST(0 AS DOUBLE)),
              CAST(255 AS DOUBLE)) AS bd
      FROM dcq
    ),
    color AS (
      SELECT doc_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
             AVG(rd) AS mean_r, AVG(gd) AS mean_g, AVG(bd) AS mean_b
      FROM rgb GROUP BY doc_id
    ),
    gray AS (
      SELECT 12 + i.range AS doc_id, CAST(16 AS INT) AS width,
             CAST(16 AS INT) AS height,
             AVG(gv) AS mean_r, AVG(gv) AS mean_g, AVG(gv) AS mean_b
      FROM range(4) i, range(4) b,
      LATERAL (SELECT (i.range*19 + b.range*53 + 7) % 256 AS v) s,
      LATERAL (SELECT least(greatest(
          (CASE WHEN v >= 128
                THEN floor((CAST(8 AS DOUBLE)*(v-128))/16
                           + CAST(0.5 AS DOUBLE))
                ELSE -floor((CAST(8 AS DOUBLE)*(128-v))/16
                            + CAST(0.5 AS DOUBLE)) END * 16)
            / CAST(8 AS DOUBLE) + 128,
          CAST(0 AS DOUBLE)), CAST(255 AS DOUBLE)) AS gv) d
      GROUP BY i.range
    )
    SELECT * FROM color UNION ALL SELECT * FROM gray
    """,
)
def q_media_jpeg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode, oracle-verified to the pixel: 12
    color 16×16 JPEGs (2×2 grid of flat 8×8 blocks from a formula)
    plus 4 grayscale ones are ENCODED driver-side by the pure-stdlib
    baseline encoder (`media.encode_jpeg`, Annex K tables at
    quality 50 → the unscaled base tables) and decoded
    EXECUTOR-SIDE through the full marker-parse → Huffman → dequant
    → IDCT → YCbCr path (`media.decode_jpeg` via
    `image_pixel_stats`). Flat blocks quantize to DC-only
    coefficients whose decode is EXACT integer math (the codec pins
    half-up rounding and an exact-DC shortcut), so the DuckDB
    oracle re-derives every decoded pixel value from the generating
    formula — color convert, quantize, dequantize, RGB — without
    seeing a byte. The AC/Huffman path is covered by round-trip
    tests (`tests/test_media.py`); fixture-sized by design (codec
    correctness, not scale — blob accounting at scale is
    blob_stats_arrow)."""
    import numpy as np

    from etl_covid19_spark.functions import media as M
    from etl_covid19_spark.operators.multimodal import image_pixel_stats

    rows = []
    for i in range(12):
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        for b in range(4):
            by, bx = divmod(b, 2)
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                (i * 37 + b * 11) % 256,
                (i * 53 + b * 29 + 85) % 256,
                (i * 71 + b * 47 + 170) % 256,
            )
        rows.append((i, bytearray(M.encode_jpeg(img, quality=50))))
    for i in range(4):
        img = np.zeros((16, 16), dtype=np.uint8)
        for b in range(4):
            by, bx = divmod(b, 2)
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                i * 19 + b * 53 + 7
            ) % 256
        rows.append((12 + i, bytearray(M.encode_jpeg(img, quality=50))))
    d = spark.createDataFrame(rows, "doc_id long, payload binary")
    return image_pixel_stats(d, "doc_id", "payload").orderBy("doc_id")


@register(
    "media_video_frames",
    oracle="""
    WITH px AS (
      SELECT i.range AS doc_id, f.range AS frame_idx,
             (i.range*7 + f.range*13 + x.range*3 + y.range*5) % 256 AS r,
             (i.range*7 + f.range*13 + x.range*3 + y.range*5 + 17) % 256 AS g,
             (i.range*7 + f.range*13 + x.range*3 + y.range*5 + 34) % 256 AS b
      FROM range(6) i, range(0, 10, 3) f, range(16) x, range(12) y
    )
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(16 AS INT) AS width, CAST(12 AS INT) AS height,
           CAST(10 AS INT) AS n_frames, CAST(10 AS INT) AS fps,
           CAST(SUM(r) AS DOUBLE) / 192 AS mean_r,
           CAST(SUM(g) AS DOUBLE) / 192 AS mean_g,
           CAST(SUM(b) AS DOUBLE) / 192 AS mean_b
    FROM px GROUP BY doc_id, frame_idx ORDER BY doc_id, frame_idx
    """,
)
def q_media_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video container decode + INDEXED frame sampling,
    oracle-verified to the pixel (round 6): six 10-frame 16×12
    uncompressed AVIs (pixel v(i,f,x,y,c) = (i·7 + f·13 + x·3 +
    y·5 + c·17) mod 256) are encoded driver-side by the pure-stdlib
    RIFF writer (`media.encode_avi` — bottom-up padded DIB rows,
    idx1 index), then EXECUTOR-SIDE every 3rd frame is decoded via
    the idx1 seek table (`video_frame_stats` → `decode_avi_frames`
    — unsampled frames' bytes are never touched) and reduced to
    exact int64-sum channel means. The codec is lossless, so the
    DuckDB oracle re-derives every decoded pixel from the
    generating formula without seeing a byte. Fixture-sized by
    design (container correctness, not scale — the sampled-seek
    cost model is the scale story, blob accounting is
    blob_stats_arrow)."""
    import numpy as np

    from etl_covid19_spark.functions import media as M
    from etl_covid19_spark.operators.multimodal import video_frame_stats

    f = np.arange(10)[:, None, None, None]
    y = np.arange(12)[None, :, None, None]
    x = np.arange(16)[None, None, :, None]
    c = np.arange(3)[None, None, None, :]
    rows = []
    for i in range(6):
        fr = ((i * 7 + f * 13 + x * 3 + y * 5 + c * 17) % 256).astype(
            np.uint8
        )
        rows.append((i, bytearray(M.encode_avi(fr, fps=10))))
    d = spark.createDataFrame(rows, "doc_id long, payload binary")
    return video_frame_stats(d, "doc_id", "payload", every_n=3).orderBy(
        "doc_id", "frame_idx"
    )


@register(
    "table_profile",
    oracle="""
    SELECT 'o_custkey' AS column_name,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_custkey) AS n_nulls,
           COUNT(DISTINCT o_custkey) AS n_distinct,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    """,
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling — the data-quality reconnaissance every
    warehouse zone needs before rules can be written (the reference
    hardcodes its 240±2% expectation; profiling is how such numbers
    are discovered). One scan per profiled column set: counts, null
    counts, exact distinct cardinalities, min/max (stringified for a
    uniform schema). At 100 TB swap COUNT(DISTINCT) for the HLL
    sketch (sketch_distinct_users) — same plan shape, bounded
    memory."""
    o = _t(spark, sf_dir, "orders")

    # ONE scan computes every column's stats as a wide aggregate row;
    # stack() pivots it to per-column rows afterwards — a union of
    # per-column aggregates would scan the table once per column,
    # which is the difference between 1 and N passes at 100 TB
    cols = ["o_custkey", "o_orderstatus", "o_orderpriority"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n_rows"),
            (F.count(F.lit(1)) - F.count(F.col(c))).alias(f"{c}__n_nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__n_distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__n_rows, {c}__n_nulls, {c}__n_distinct, "
        f"{c}__min, {c}__max"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)"
    )


@register(
    "null_safe_join",
    oracle="""
    WITH a AS (
      SELECT NULLIF(o_orderstatus, 'O') AS status_key,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    ),
    b AS (
      SELECT NULLIF(o_orderstatus, 'O') AS status_key,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue
      FROM orders GROUP BY 1
    )
    SELECT a.status_key, a.n_orders, b.revenue
    FROM a JOIN b ON a.status_key IS NOT DISTINCT FROM b.status_key
    """,
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    keys match each other instead of silently dropping — the
    semantics gap behind many lost-rows bugs when dimension keys are
    nullable. Planned as an ordinary hash join (null-safe equality is
    still an equi-join key for Catalyst), so no nested-loop
    penalty."""
    o = _t(spark, sf_dir, "orders")
    key = F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_key")
    a = o.select(key).groupBy("status_key").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    b = o.select(key, "o_totalprice").groupBy("status_key").agg(
        dsum("o_totalprice").alias("revenue")
    )
    return (
        a.join(b, a["status_key"].eqNullSafe(b["status_key"]))
        .select(a["status_key"], "n_orders", "revenue")
    )


@register(
    "latest_event_per_user",
    oracle="""
    SELECT user_id,
           arg_max(event_type, ts) AS last_event_type,
           arg_max(value, ts) AS last_value,
           epoch_us(MAX(ts)) AS last_ts_us,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-per-key via max_by/arg_max — the snapshot
    pattern (current state from an event log) as ONE hash aggregate.
    The ROW_NUMBER()=1 window formulation gives the same answer but
    pays a per-key sort; max_by keeps it a streaming-friendly
    aggregate with map-side partials. (ts is unique per user in this
    fixture, so arg_max is deterministic.)"""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", "ts").alias("last_event_type"),
        F.max_by("value", "ts").alias("last_value"),
        F.unix_micros(F.max("ts")).alias("last_ts_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "array_agg_kit",
    oracle="""
    SELECT o_orderpriority,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
             AS statuses,
           list_sort(list(DISTINCT o_orderstatus))[1] AS first_status,
           len(list(DISTINCT o_orderstatus)) AS n_statuses
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_array_agg_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List aggregation surface: collect_set → sorted array columns
    (canonical order makes array outputs hash-stable across
    engines), element access, cardinality. Arrays-as-values is how
    training pipelines carry per-group token lists / id sets without
    a second explode round trip.  The statuses array leaves the
    query comma-joined: the driver's pandas canonicalizer cannot
    sort ndarray cells (map_kit encode contract)."""
    o = _t(spark, sf_dir, "orders")
    statuses = F.array_sort(F.collect_set("o_orderstatus"))
    return o.groupBy("o_orderpriority").agg(
        F.array_join(statuses, ",").alias("statuses"),
        statuses.getItem(0).alias("first_status"),
        F.size(F.collect_set("o_orderstatus")).alias("n_statuses"),
    )


@register(
    "sequence_packing",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, doc_id % 8 AS shard,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             x -> x <> '')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT lang, doc_id, n_tokens,
             shard * 1000000 +
             CAST(FLOOR((SUM(n_tokens) OVER (
                    PARTITION BY lang, shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - n_tokens) / 2048.0) AS BIGINT) AS pack_id
      FROM toks
    )
    SELECT lang, pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
    FROM packed
    GROUP BY lang, pack_id
    """,
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM training: assign documents to
    fixed-token-budget packs (2048 here) by running token total in a
    deterministic order — the distributed form of greedy packing
    (exact first-fit is inherently sequential; running-total
    bucketing is the standard parallel approximation). The cumsum
    window partitions on (stratum, shard), NOT the stratum alone: a
    window keyed by language would pull an entire language through
    ONE task at corpus scale, while deterministic doc_id shards keep
    every window partition bounded — pack ids are disambiguated by a
    shard offset, costing at most one underfull pack per shard.
    Output is per-pack document and token counts."""
    d = _t(spark, sf_dir, "documents")
    n_tokens = F.size(text.tokens("text"))
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = d.select(
        "lang",
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        n_tokens.alias("n_tokens"),
    ).withColumn(
        "pack_id",
        F.col("shard") * F.lit(1000000)
        + F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(2048.0)
        ),
    )
    return packed.groupBy("lang", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
    )


@register(
    "contamination_check",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks)-1),
                                   i -> array_to_string(toks[i:i+2], ' '))
               ELSE [array_to_string(toks, ' ')] END) AS grams
      FROM t
    ),
    p AS (SELECT doc_id, unnest(grams) AS sh FROM g),
    eval_p AS (SELECT doc_id, sh FROM p WHERE doc_id % 50 = 0),
    train_p AS (SELECT doc_id, sh FROM p WHERE doc_id % 50 <> 0)
    SELECT e.doc_id AS eval_doc_id,
           COUNT(DISTINCT t.doc_id) AS n_contaminating_docs,
           COUNT(DISTINCT t.sh) AS n_shared_shingles
    FROM eval_p e JOIN train_p t ON e.sh = t.sh
    GROUP BY e.doc_id
    """,
)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination detection: for each held-out eval
    document (doc_id % 50 = 0 stands in for a benchmark set), find
    training documents sharing any n-gram shingle — the standard
    n-gram-overlap decontamination pass. Dataflow is a postings
    equi-join keyed by the (tiny) eval side's shingles, so cost
    scales with |eval|·avg_df, not the corpus. The engine side uses
    the POOLED hashed shingle postings (one tokenize/shingle Arrow
    pass shared with the whole dedup family — the per-query string
    HOF re-derivation measured 56 s at sf1); the oracle keeps string
    shingles, which is contract-safe because only distinct-equality
    COUNTS are compared (the repo-wide hashed-postings convention:
    collisions ~2⁻³¹ per shingle pair are the only divergence)."""
    from etl_covid19_spark.operators.dedup import shingle_postings_cached

    d = _t(spark, sf_dir, "documents")
    grams = shingle_postings_cached(d, "text", "doc_id", 3).select(
        "doc_id", "sh"
    )
    eval_p = grams.where(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("eval_doc_id"), "sh"
    )
    # prune the (corpus-sized) train postings down to eval shingles
    # BEFORE the shuffle join. No broadcast hint: the eval shingle
    # vocabulary is 2% of the CORPUS vocabulary — linear in corpus
    # size — so a forced broadcast is a driver OOM at 100 TB; AQE
    # still broadcasts it at bench SFs from the measured size
    eval_sh = eval_p.select("sh").distinct()
    train_p = grams.where(F.col("doc_id") % 50 != 0).join(
        eval_sh, "sh", "left_semi"
    )
    joined = eval_p.join(train_p, "sh")
    return joined.groupBy("eval_doc_id").agg(
        F.count_distinct(F.col("doc_id")).alias("n_contaminating_docs"),
        F.count_distinct(F.col("sh")).alias("n_shared_shingles"),
    )


@register(
    "contamination_check_capped",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks)-1),
                                   i -> array_to_string(toks[i:i+2], ' '))
               ELSE [array_to_string(toks, ' ')] END) AS grams
      FROM t
    ),
    p AS (SELECT doc_id, unnest(grams) AS sh FROM g),
    eval_p AS (SELECT doc_id, sh FROM p WHERE doc_id % 50 = 0),
    train_p AS (SELECT doc_id, sh FROM p WHERE doc_id % 50 <> 0),
    keep AS (
      SELECT sh FROM train_p GROUP BY sh HAVING COUNT(*) <= 100
    )
    SELECT e.doc_id AS eval_doc_id,
           COUNT(DISTINCT t.doc_id) AS n_contaminating_docs,
           COUNT(DISTINCT t.sh) AS n_shared_shingles
    FROM eval_p e
    JOIN keep k ON e.sh = k.sh
    JOIN train_p t ON e.sh = t.sh
    GROUP BY e.doc_id
    """,
)
def q_contamination_check_capped(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Train-df-capped contamination check — the scale twin of
    `contamination_check` (same convention as the capped Jaccard /
    containment twins). The exact form's eval×train postings join
    expands to Σ_sh df_eval·df_train rows, and BOTH factors grow
    with the corpus: measured 6 s at sf1 → 100+ s at sf10, i.e.
    superlinear by construction — at decontamination scale the
    standard practice is to ignore ultra-common n-grams anyway
    (they carry no contamination signal, only expansion). Shingles
    with train doc-frequency > 100 are excluded from matching; the
    join volume is then ≤ |eval shingles|·cap.

    Shingle keys are 64-BIT wraparound hashes
    (`dedup.shingle_postings_arrow64`), not the pair-set pool's
    mod-P keys: the df THRESHOLD makes shingle identity
    output-visible, and mod-P expects ~45 colliding gram pairs on
    even an sf0.01 vocabulary — each collision merges two shingles'
    dfs and can flip a cap decision the string-keyed oracle would
    not."""
    from etl_covid19_spark.operators.dedup import (
        shingle_postings_arrow64,
    )
    from etl_covid19_spark.operators.df_cache import (
        SHARED_CACHE,
        corpus_key,
    )

    max_df = 100
    d = _t(spark, sf_dir, "documents")
    grams = SHARED_CACHE.get_or_build(
        ("shingle_postings64", corpus_key(d), "text", "doc_id", 3),
        lambda: shingle_postings_arrow64(d, "text", "doc_id", 3),
    )
    eval_p = grams.where(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("eval_doc_id"), "sh"
    )
    train_all = grams.where(F.col("doc_id") % 50 != 0)
    # rare = the matching vocabulary: eval shingles whose TRAIN df
    # is within the cap. NO broadcast hints here: eval_sh and rare
    # are corpus-PROPORTIONAL distinct sets (the eval slice is 2%
    # of the corpus — its shingle vocabulary is billions of keys at
    # 100 TB), so a forced broadcast is a driver OOM at scale. AQE
    # still picks broadcast at bench SFs from the measured sizes,
    # and the semi-joins stay shuffle-partitioned equi-joins when
    # the sets outgrow the threshold (plan-pinned in
    # tests/test_plan_invariants.py with broadcasts disabled).
    eval_sh = eval_p.select("sh").distinct()
    rare = (
        train_all.join(eval_sh, "sh", "left_semi")
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") <= max_df)
        .select("sh")
    )
    train_p = train_all.join(rare, "sh", "left_semi")
    joined = eval_p.join(rare, "sh", "left_semi").join(
        train_p, "sh"
    )
    return joined.groupBy("eval_doc_id").agg(
        F.count_distinct(F.col("doc_id")).alias("n_contaminating_docs"),
        F.count_distinct(F.col("sh")).alias("n_shared_shingles"),
    )


@register(
    "pii_redaction",
    oracle="""
    WITH seeded AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com or +1-555-0100'
                  ELSE text END AS raw
      FROM documents
    ),
    red AS (
      SELECT doc_id, raw,
             regexp_replace(
               regexp_replace(raw,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g'),
               '\\+?[0-9][0-9()\\-\\s]{7,}[0-9]', '<PHONE>', 'g') AS clean
      FROM seeded
    )
    SELECT doc_id,
           length(raw) - length(clean) AS bytes_removed,
           CAST(raw <> clean AS BOOLEAN) AS was_redacted,
           length(clean) AS clean_len
    FROM red
    """,
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — regex redaction of emails/phone numbers, the
    compliance pass every training corpus goes through. Patterns are
    RE2-portable (no lookarounds) so the oracle runs them verbatim;
    a deterministic PII seed is injected into every 10th document so
    the redaction path is actually exercised. Pure codegen'd
    regexp_replace — no UDF in the hot path."""
    d = _t(spark, sf_dir, "documents")
    raw = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-0100"),
        ),
    ).otherwise(F.col("text"))
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"
    seeded = d.select("doc_id", raw.alias("raw"))
    clean = F.regexp_replace(
        F.regexp_replace(F.col("raw"), email, "<EMAIL>"),
        phone,
        "<PHONE>",
    )
    return seeded.select(
        "doc_id",
        (F.length("raw") - F.length(clean)).alias("bytes_removed"),
        (F.col("raw") != clean).alias("was_redacted"),
        F.length(clean).alias("clean_len"),
    )


@register(
    "stream_static_join",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE)
             AS purchase_value
    FROM events e
    JOIN customer c ON c.c_custkey = (e.user_id % 100) + 1
    WHERE e.event_type = 'purchase'
    GROUP BY c.c_mktsegment
    """,
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static (dimension-enrichment) join, executed as a REAL
    stream: purchase events replayed through readStream are joined
    to the static customer dimension and aggregated per segment in
    complete mode. The static side needs no watermark or state —
    each micro-batch joins the dimension's current snapshot
    (broadcast under the threshold), which is how streaming facts
    pick up dimension keys at scale without a stateful join."""
    import uuid

    from etl_covid19_spark.sources.catalog import (
        ensure_runtime_confs,
        events_stream,
    )

    ensure_runtime_confs(spark)
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    stream = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            ((F.col("user_id") % 100) + 1).alias("c_custkey"), "value"
        )
    )
    # stream-static equi-join: no forced broadcast on the (linearly
    # scaling) customer snapshot — Spark re-plans the static side
    # per micro-batch and broadcasts only under the threshold
    joined = stream.join(cust, "c_custkey")
    agg_df = joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("purchase_value"),
    )
    name = f"stream_static_{uuid.uuid4().hex[:8]}"
    q = (
        agg_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@register(
    "streaming_dedup",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id, event_type FROM events
    )
    SELECT event_type, COUNT(*) AS n_distinct_users
    FROM d GROUP BY event_type
    """,
)
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact deduplication, executed as a REAL stream:
    dropDuplicates on (user_id, event_type) maintains seen-key state
    in the state store and emits each key once; the drained result
    equals batch DISTINCT. The bounded-state production variant
    (dropDuplicatesWithinWatermark, which can evict old keys) is
    exercised in tests/test_stateful.py — this registry entry keeps
    the oracle exact."""
    import uuid

    from etl_covid19_spark.sources.catalog import (
        ensure_runtime_confs,
        events_stream,
    )

    ensure_runtime_confs(spark)
    stream = (
        events_stream(spark, sf_dir)
        .select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"])
    )
    agg_df = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_distinct_users")
    )
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        agg_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@register(
    "explode_outer_tokens",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> length(x) >= 12) AS long_toks
      FROM documents WHERE doc_id < 200
    ),
    e AS (
      SELECT doc_id,
             unnest(CASE WHEN len(long_toks) = 0
                         THEN [NULL] ELSE long_toks END) AS tok
      FROM t
    )
    SELECT doc_id,
           COUNT(*) AS n_rows,
           COUNT(tok) AS n_tokens
    FROM e GROUP BY doc_id
    """,
)
def q_explode_outer_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer — the null-preserving fan-out: documents with NO
    qualifying tokens keep one NULL row instead of vanishing. The
    inner/outer distinction is the classic silent-row-loss bug in
    fan-out pipelines (a doc with no long tokens disappearing from a
    per-doc report); the counts pin that every input doc survives."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    long_toks = F.filter(text.tokens("text"), lambda t: F.length(t) >= 12)
    exploded = d.select(
        "doc_id", F.explode_outer(long_toks).alias("tok")
    )
    return exploded.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("tok").alias("n_tokens"),
    )


@register(
    "streaming_topk",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY n_events DESC, user_id ASC
    LIMIT 10
    """,
)
def q_streaming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming top-k, executed as a REAL stream: per-user counts
    aggregated in complete mode with ORDER BY + LIMIT on the stream
    (sorts are only legal on streams in complete mode — each trigger
    re-ranks the full aggregate state, which is exactly the
    leaderboard semantics wanted). Drained with AvailableNow, the
    final table is the batch top-10 — deterministic via the user_id
    tiebreak."""
    import uuid

    from etl_covid19_spark.sources.catalog import (
        ensure_runtime_confs,
        events_stream,
    )

    ensure_runtime_confs(spark)
    stream = events_stream(spark, sf_dir).select("user_id", "value")
    ranked = (
        stream.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy(F.col("n_events").desc(), F.col("user_id").asc())
        .limit(10)
    )
    name = f"stream_topk_{uuid.uuid4().hex[:8]}"
    q = (
        ranked.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


# ---------------------------------------------------------------------------
# Python extension surface: UDTF + cogrouped Arrow (SURVEY.md §6)
# ---------------------------------------------------------------------------


@register(
    "udtf_sentence_spans",
    oracle=r"""
    WITH s AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(text, '.'),
                                        x -> trim(x, ' ' || chr(9) || chr(10) || chr(13))),
                         x -> x <> '') AS sents
      FROM documents
    )
    SELECT doc_id,
           CAST(i - 1 AS INT) AS span_idx,
           sents[i] AS sentence,
           CAST(length(sents[i]) AS INT) AS n_chars
    FROM s, unnest(range(1, len(sents) + 1)) AS t(i)
    """,
)
def q_udtf_sentence_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table-function extension point) splitting
    each document into sentence spans via ``LATERAL sentence_spans``
    — the grammar-level row→rows shape where the span index is
    sequential state across emitted rows (functions/udtf_kit has the
    when-to-UDTF rule; delimiter splits without such state stay in
    explode(split())). Arrow-batched, map-side only — no shuffle."""
    from etl_covid19_spark.functions.udtf_kit import register_udtfs

    register_udtfs(spark)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.span_idx, s.sentence, s.n_chars
        FROM udtf_docs d, LATERAL sentence_spans(d.text) s
        """
    )


@register(
    "asof_join_cogrouped",
    oracle="""
    WITH c AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    e AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'error'
    )
    SELECT c.event_id, c.user_id,
           epoch_us(c.ts) AS ts_us,
           epoch_us(e.ts) AS err_ts_us,
           e.value AS err_value
    FROM c ASOF JOIN e ON c.user_id = e.user_id AND e.ts <= c.ts
    """,
)
def q_asof_join_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The as-of join again, through ``cogroup().applyInPandas`` —
    the two-table Arrow extension point (per-key pandas.merge_asof).
    Same oracle as asof_join_events, so the driver proves the custom
    cogrouped operator IS the window formulation, row for row. The
    JVM window path stays the default/headline; this is the template
    for per-key two-table logic Catalyst can't express."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "value"
    )
    out = J.asof_join_cogrouped(
        clicks, errors, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["ts", "value"], how="inner",
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.unix_micros(F.col("asof_ts")).alias("err_ts_us"),
        F.col("asof_value").alias("err_value"),
    )


@register(
    "repetition_signals",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    base AS (
      SELECT doc_id, len(toks) AS n_toks,
             len(list_distinct(toks)) AS n_distinct,
             list_sum(list_transform(toks, x -> length(x))) AS total_chars
      FROM t
    ),
    g2 AS (
      SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS g
      FROM t, unnest(range(1, len(toks))) r(i) WHERE len(toks) >= 2
    ),
    g3 AS (
      SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS g
      FROM t, unnest(range(1, len(toks) - 1)) r(i) WHERE len(toks) >= 3
    ),
    c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
    c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1, 2),
    top2 AS (
      SELECT doc_id, g, c FROM (
        SELECT doc_id, g, c,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY c DESC, g ASC) AS rn
        FROM c2) WHERE rn = 1
    ),
    top3 AS (
      SELECT doc_id, g, c FROM (
        SELECT doc_id, g, c,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY c DESC, g ASC) AS rn
        FROM c3) WHERE rn = 1
    )
    SELECT b.doc_id,
           CASE WHEN b.n_toks > 0
                THEN CAST(b.n_toks - b.n_distinct AS DOUBLE)
                     / CAST(b.n_toks AS DOUBLE)
                ELSE 0.0 END AS dup_token_frac,
           COALESCE(t2.g, '') AS top_bigram,
           COALESCE(t2.c, 0) AS top_bigram_n,
           CASE WHEN b.total_chars > 0 AND t2.c > 0
                THEN CAST(t2.c * length(replace(t2.g, ' ', '')) AS DOUBLE)
                     / CAST(b.total_chars AS DOUBLE)
                ELSE 0.0 END AS top_bigram_char_frac,
           COALESCE(t3.g, '') AS top_trigram,
           COALESCE(t3.c, 0) AS top_trigram_n,
           CASE WHEN b.total_chars > 0 AND t3.c > 0
                THEN CAST(t3.c * length(replace(t3.g, ' ', '')) AS DOUBLE)
                     / CAST(b.total_chars AS DOUBLE)
                ELSE 0.0 END AS top_trigram_char_frac
    FROM base b
    LEFT JOIN top2 t2 USING (doc_id)
    LEFT JOIN top3 t3 USING (doc_id)
    """,
)
def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-family repetition quality signals (Rae et al. 2021):
    unigram duplicate fraction plus the most frequent word bi-/tri-
    gram with its character-coverage fraction. The registered path is
    the Arrow batch kernel (`curation.repetition_signals_batch`) —
    the Catalyst sorted-array fold (`text.top_ngram_stats`, still the
    zero-Python option for short docs) measured >9 min on a
    2000×3000-token fat corpus where the kernel takes seconds; a
    parity test pins the two implementations equal. The oracle
    recomputes everything the relational way (unnest → count →
    window), so tie-breaking and char math are proven against an
    independent formulation."""
    return CUR.repetition_signals_batch(
        _t(spark, sf_dir, "documents"), "text", "doc_id"
    )


@register(
    "source_reputation_filter",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, text,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks,
             length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
               AS n_punct
      FROM documents
    ),
    m AS (
      SELECT doc_id, source,
             round(0.3 * least(length(text) / 200.0, 1.0)
             + 0.3 * (CASE WHEN list_reduce(list_prepend(0,
                        list_transform(toks, x -> length(x))), (a, b) -> a + b)
                        / greatest(len(toks), 1) BETWEEN 2 AND 12
                      THEN 1.0 ELSE 0.3 END)
             + 0.2 * (1.0 - least(n_punct / greatest(length(text), 1) * 5,
                                  1.0))
             + 0.2 * least(len(list_filter(toks, x -> lower(x) IN
                 ('the','a','an','and','or','of','to','in','is','are','for',
                  'on','with','as','at','by','it','this','that')))
                 / greatest(len(toks), 1) * 4, 1.0), 6) AS q
      FROM t
    ),
    s AS (
      SELECT source,
             COUNT(*) AS n_src_docs,
             round(CAST(SUM(CAST(q AS DECIMAL(18, 6))) AS DOUBLE)
                   / COUNT(*), 6) AS src_avg_q
      FROM m GROUP BY source
    )
    SELECT m.doc_id, m.source, m.q, s.src_avg_q, s.n_src_docs
    FROM m JOIN s USING (source)
    WHERE s.src_avg_q >= 0.82
    """,
)
def q_source_reputation_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/source-level reputation filtering — the two-level
    corpus filter web-scale pipelines apply before any per-document
    work (RefinedWeb/FineWeb-style: a document inherits its domain's
    aggregate quality). Dataflow for 100 TB: per-doc scores stay
    map-side; ONE aggregate shuffles fixed-width (source, decimal)
    pairs down to |sources| rows; the source verdict table is tiny by
    construction and broadcasts back onto the corpus — so the filter
    costs one small aggregate plus a broadcast hash join, never a
    corpus-sized shuffle. The average accumulates in DECIMAL so the
    source verdict is order-independent (FP-sum nondeterminism would
    flip sources sitting on the threshold). Per-doc q comes from
    the Arrow counting kernel + `quality_from_counts` replay (the
    `text_quality_arrow` swap — bit-exact vs the HOF scorer, which
    cost 33 s at sf10's 500k docs)."""
    d = _t(spark, sf_dir, "documents")
    scored = text.quality_counts_arrow(
        d, ["doc_id", "source"], "text"
    ).select(
        "doc_id",
        "source",
        text.quality_from_counts()["quality"].alias("q"),
    )
    src = (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_src_docs"),
            F.round(
                F.sum(F.col("q").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("src_avg_q"),
        )
        .where(F.col("src_avg_q") >= 0.82)
    )
    return scored.join(F.broadcast(src), "source").select(
        "doc_id", "source", "q", "src_avg_q", "n_src_docs"
    )


@register(
    "cosine_pairs_pandas",
    oracle="""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(
             CASE WHEN sqrt(list_reduce(list_transform(a.v, q -> q * q),
                                        (q, w) -> q + w))
                     * sqrt(list_reduce(list_transform(b.v, q -> q * q),
                                        (q, w) -> q + w)) = 0
                  THEN 0.0
                  ELSE list_reduce(list_transform(list_zip(a.v, b.v),
                         p -> struct_extract(p, 1) * struct_extract(p, 2)),
                         (q, w) -> q + w)
                       / (sqrt(list_reduce(list_transform(a.v, q -> q * q),
                                           (q, w) -> q + w))
                          * sqrt(list_reduce(list_transform(b.v, q -> q * q),
                                             (q, w) -> q + w)))
             END, 8) AS cosine
    FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
    """,
)
def q_cosine_pairs_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized Arrow `pandas_udf` scoring (functions/vectors.
    cosine_batch): consecutive-id embedding pairs scored by a numpy
    einsum over each Arrow batch, rounded to 8 dp so the ~2-ulp
    summation-order difference vs the sequential oracle fold
    vanishes. Proves the pandas_udf surface end-to-end; the HOF
    `cosine` stays the default (measured tie at 64 dims — docstring
    has the numbers)."""
    emb = _t(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(
        (F.col("vec_id") - 1).alias("id_a"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
    )
    return (
        a.join(b, "id_a")
        .select(
            "id_a",
            "id_b",
            F.round(vectors.cosine_batch("va", "vb"), 8).alias("cosine"),
        )
    )


def _knn_graph_oracle(k: int = 5, band_bits: int = 4, n_bands: int = 16) -> str:
    """GENERATED oracle for the kNN graph: sign-bit band keys as CASE
    expressions (same generator shape as _near_dup_lsh_oracle, both
    pair directions), exact cosine via the same sequential fold, and
    the per-source top-k window with the operator's tie-break."""
    keys = []
    for band in range(n_bands):
        bits = " + ".join(
            f"(CASE WHEN v[{band * band_bits + j + 1}] > 0 "
            f"THEN {1 << j} ELSE 0 END)"
            for j in range(band_bits)
        )
        keys.append(f"({band * (1 << band_bits)} + {bits})")
    key_list = ", ".join(keys)
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    b AS (SELECT vec_id, unnest([{key_list}]) AS band_key FROM e),
    cand AS (
      SELECT DISTINCT a.vec_id AS src, c.vec_id AS dst
      FROM b a JOIN b c ON a.band_key = c.band_key AND a.vec_id <> c.vec_id
    ),
    scored AS (
      SELECT src, dst,
             CASE WHEN sqrt(list_reduce(list_transform(x.v, q -> q * q),
                                        (q, w) -> q + w))
                     * sqrt(list_reduce(list_transform(y.v, q -> q * q),
                                        (q, w) -> q + w)) = 0
                  THEN 0.0
                  ELSE list_reduce(list_transform(list_zip(x.v, y.v),
                         p -> struct_extract(p, 1) * struct_extract(p, 2)),
                         (q, w) -> q + w)
                       / (sqrt(list_reduce(list_transform(x.v, q -> q * q),
                                           (q, w) -> q + w))
                          * sqrt(list_reduce(list_transform(y.v, q -> q * q),
                                             (q, w) -> q + w)))
             END AS cosine
      FROM cand JOIN e x ON x.vec_id = src JOIN e y ON y.vec_id = dst
    )
    SELECT src, dst, cosine, rank FROM (
      SELECT src, dst, cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY src
                                     ORDER BY cosine DESC, dst ASC) AS INT)
               AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def _pagerank_oracle(
    k: int = 5, n_iter: int = 10, damping: float = 0.85, top: int = 50
) -> str:
    """GENERATED oracle for PageRank over the kNN graph: a fixed
    iteration budget needs no fixpoint test, so the loop UNROLLS
    into n_iter chained CTEs (r0 → r1 → … → rN), each one
    edge-join + per-dst aggregate — plain ANSI SQL, no recursive
    aggregation (which standard recursive CTEs disallow). Float
    parity holds because both engines run the identical IEEE op
    sequence: per-round sums are DECIMAL(38,18)-accumulated then
    cast to DOUBLE (partition- and engine-invariant), and every
    scalar constant is CAST to DOUBLE so DuckDB's decimal literals
    can't change the arithmetic. Dangling mass is redistributed
    exactly as the operator does (graph.pagerank)."""
    d = f"CAST({damping} AS DOUBLE)"
    parts = [
        f"WITH knn AS MATERIALIZED ({_knn_graph_oracle(k=k)}),",
        "edges AS MATERIALIZED (SELECT src, dst FROM knn),",
        "verts AS (SELECT DISTINCT v FROM (SELECT src AS v FROM edges"
        " UNION ALL SELECT dst AS v FROM edges)),",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM verts),",
        "deg AS (SELECT src AS vertex, COUNT(*) AS out_deg"
        " FROM edges GROUP BY src),",
        "r0 AS MATERIALIZED (SELECT v.v AS vertex, g.out_deg,"
        " CAST(1.0 AS DOUBLE) / nn.n AS rank"
        " FROM verts v LEFT JOIN deg g ON g.vertex = v.v CROSS JOIN nn),",
    ]
    for i in range(n_iter):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT e.dst AS vertex,"
            " CAST(SUM(CAST(r.rank / r.out_deg AS DECIMAL(38,18)))"
            " AS DOUBLE) AS contrib"
            f" FROM edges e JOIN r{i} r"
            " ON r.vertex = e.src AND r.out_deg IS NOT NULL"
            " GROUP BY e.dst),"
        )
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT COALESCE(CAST(SUM(CAST(rank AS"
            " DECIMAL(38,18))) AS DOUBLE), CAST(0.0 AS DOUBLE)) AS m"
            f" FROM r{i} WHERE out_deg IS NULL),"
        )
        parts.append(
            f"r{i + 1} AS MATERIALIZED (SELECT r.vertex, r.out_deg,"
            f" (CAST(1.0 AS DOUBLE) - {d}) / nn.n"
            f" + {d} * (COALESCE(c.contrib, CAST(0.0 AS DOUBLE))"
            " + dm.m / nn.n) AS rank"
            f" FROM r{i} r LEFT JOIN c{i} c ON c.vertex = r.vertex"
            f" CROSS JOIN d{i} dm CROSS JOIN nn),"
        )
    parts.append(
        f"final AS (SELECT vertex AS vec_id, rank FROM r{n_iter})"
        f" SELECT vec_id, rank FROM final"
        f" ORDER BY rank DESC, vec_id ASC LIMIT {top}"
    )
    return "\n".join(parts)


@register("knn_graph", oracle=_knn_graph_oracle())
def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate kNN graph over the embedding corpus: each vector's
    top-5 cosine neighbors among its sign-band LSH candidates
    (operators/similarity.knn_graph — the all-points primitive behind
    graph clustering and diversity sampling). Executed per band
    BUCKET (grouped Arrow kernel: BLAS preselect + exact fold-order
    cosine on survivors) so candidate pairs never materialize as a
    vector-carrying join — the round-4 sweep's sf1 timeout was that
    pair join shuffling 64-float payloads onto ~64% of all pairs.
    Final merge is one narrow window per source; same semantics and
    oracle as the pair-form since round 3."""
    from etl_covid19_spark.operators.similarity import knn_graph

    return knn_graph(
        _t(spark, sf_dir, "embeddings"), "embedding", "vec_id",
        k=5, band_bits=4, n_bands=16,
    )


def _knn_graph_ivf_oracle(
    k: int = 5,
    cell_target: int = 4000,
    n_probe: int = 2,
    max_bucket: int = 100_000,
) -> str:
    """GENERATED oracle for the IVF-blocked kNN graph twin: the
    deterministic first-k-by-id centroids — k sized adaptively as
    GREATEST(16, CEIL(n/cell_target)) to mirror the operator's
    cell-size-targeted scaling (identical plan at every gate SF,
    where n/cell_target < 16) — fold-order centroid cosines ranked
    (cos DESC, cid DESC) — rank 1 is the assignment, ranks ≤
    n_probe the probes — bucket membership capped at max_bucket by
    ascending id, candidates = probers × members, and the same
    exact-fold top-k window as the sign-band graph."""
    cent_cos = _FOLD_COS.format(a="e.v", b="c.cv")
    pair_cos = _FOLD_COS.format(a="x.v", b="y.v")
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    cents AS (
      SELECT cid, cv FROM (
        SELECT vec_id AS cid, v AS cv,
               ROW_NUMBER() OVER (ORDER BY vec_id) AS rn,
               COUNT(*) OVER () AS nn
        FROM e
      ) WHERE rn <= GREATEST(
        16, CAST(CEIL(nn / {cell_target}.0) AS BIGINT))
    ),
    cscore AS (
      SELECT e.vec_id, c.cid, {cent_cos} AS cos
      FROM e CROSS JOIN cents c
    ),
    probes AS (
      SELECT vec_id, cid AS bucket,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, cid DESC) AS pr
      FROM cscore
    ),
    members AS (
      SELECT vec_id, bucket FROM (
        SELECT vec_id, bucket,
               ROW_NUMBER() OVER (PARTITION BY bucket
                                  ORDER BY vec_id ASC) AS mr
        FROM probes WHERE pr = 1
      ) WHERE mr <= {max_bucket}
    ),
    cand AS (
      SELECT DISTINCT p.vec_id AS src, m.vec_id AS dst
      FROM probes p
      JOIN members m ON m.bucket = p.bucket AND p.vec_id <> m.vec_id
      WHERE p.pr <= {n_probe}
    ),
    scored AS (
      SELECT src, dst, {pair_cos} AS cosine
      FROM cand JOIN e x ON x.vec_id = src JOIN e y ON y.vec_id = dst
    )
    SELECT src, dst, cosine, rank FROM (
      SELECT src, dst, cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY src
                                     ORDER BY cosine DESC, dst ASC) AS INT)
               AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


@register("knn_graph_ivf", oracle=_knn_graph_ivf_oracle())
def q_knn_graph_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-blocked kNN graph (operators/similarity.knn_graph_ivf) —
    the round-6 scale twin closing the sign-band graph's isotropic
    Σ bucket² flops floor: candidates come from each vector's
    n_probe nearest centroid lists (hard per-point budget of
    n_probe·max_bucket), so total work is n_probe·n·(n/n_centroids)
    regardless of how isotropic the embedding space is. Same
    exact/capped-twin convention as the dedup family: deterministic
    first-N-by-id centroids keep it oracle-reproducible, with N
    sized as max(16, ceil(n/4000)) so cell size stays ~constant at
    scale (the round-10 fix for the sf100 O((n/16)²) timeout — the
    oracle computes the identical formula in SQL); k-means centers
    slot into the identical dataflow via `cents=`."""
    from etl_covid19_spark.operators.similarity import knn_graph_ivf

    return knn_graph_ivf(
        _t(spark, sf_dir, "embeddings"), "embedding", "vec_id",
        k=5, n_centroids=None, n_probe=2,
    )


def _knn_graph_ivf_trained_oracle(
    k: int = 5,
    n_centroids: int = 512,
    n_probe: int = 2,
    max_bucket: int = 100_000,
    scale: int = 1_000_000,
) -> str:
    """GENERATED oracle for the TRAINED fixed-count IVF kNN graph:
    seeds = first `n_centroids` vectors by id; one Lloyd refinement
    assigns every vector to its fold-cosine-nearest seed (ties to the
    higher cid — the shared `_probe_buckets_arrow` convention); the
    trained centroid is the per-cell componentwise FIXED-POINT mean,
    sum(floor(x·scale)) as exact int64 then ONE double division —
    bit-identical to the engine's `train_centroids_fixedpoint` under
    any partitioning, the `quantized_centroids` reproducibility
    trick. The graph stage is then `_knn_graph_ivf_oracle`'s exact
    dataflow against the trained centers. The centroid COUNT is a
    constant — the whole point: assignment work is n·n_centroids·d,
    linear in n, replacing `knn_graph_ivf`'s n·(n/4000)·d term
    (VERDICT r10 weak residual #1)."""
    seed_cos = _FOLD_COS.format(a="e.v", b="s.cv")
    cent_cos = _FOLD_COS.format(a="e.v", b="t.cv")
    pair_cos = _FOLD_COS.format(a="x.v", b="y.v")
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    seeds AS (
      SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT {n_centroids}
    ),
    sscore AS (
      SELECT e.vec_id, s.cid, {seed_cos} AS cos
      FROM e CROSS JOIN seeds s
    ),
    assign0 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid DESC) AS rn
        FROM sscore
      ) WHERE rn = 1
    ),
    comp AS (
      SELECT a.cid, r.i - 1 AS d,
             SUM(CAST(FLOOR(e.v[r.i] * {scale}) AS BIGINT)) AS s,
             COUNT(*) AS n
      FROM assign0 a JOIN e USING (vec_id),
           unnest(range(1, len(e.v) + 1)) r(i)
      GROUP BY a.cid, r.i
    ),
    trained AS (
      SELECT cid,
             list(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * {scale}.0)
                  ORDER BY d) AS cv
      FROM comp GROUP BY cid
    ),
    cscore AS (
      SELECT e.vec_id, t.cid, {cent_cos} AS cos
      FROM e CROSS JOIN trained t
    ),
    probes AS (
      SELECT vec_id, cid AS bucket,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, cid DESC) AS pr
      FROM cscore
    ),
    members AS (
      SELECT vec_id, bucket FROM (
        SELECT vec_id, bucket,
               ROW_NUMBER() OVER (PARTITION BY bucket
                                  ORDER BY vec_id ASC) AS mr
        FROM probes WHERE pr = 1
      ) WHERE mr <= {max_bucket}
    ),
    cand AS (
      SELECT DISTINCT p.vec_id AS src, m.vec_id AS dst
      FROM probes p
      JOIN members m ON m.bucket = p.bucket AND p.vec_id <> m.vec_id
      WHERE p.pr <= {n_probe}
    ),
    scored AS (
      SELECT src, dst, {pair_cos} AS cosine
      FROM cand JOIN e x ON x.vec_id = src JOIN e y ON y.vec_id = dst
    )
    SELECT src, dst, cosine, rank FROM (
      SELECT src, dst, cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY src
                                     ORDER BY cosine DESC, dst ASC) AS INT)
               AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


@register("knn_graph_ivf_trained", oracle=_knn_graph_ivf_trained_oracle())
def q_knn_graph_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED fixed-count-centroid IVF kNN graph — the externally
    verified replacement for `knn_graph_ivf`'s cell-size-targeted
    sizing at the next decade (VERDICT r10 ask #1): there,
    n_centroids = ceil(n/4000) keeps CELL work linear but makes the
    centroid-ASSIGNMENT pass n·(n/4000)·d — quadratic past sf100.
    Here `train_centroids_fixedpoint` learns a CONSTANT number of
    centers (one deterministic Lloyd step from first-N-by-id seeds,
    exact int64 fixed-point means — reproducible by the SQL twin
    bit-for-bit), so assignment is n·512·d and per-cell work is
    bounded by max_bucket: linear in n forever. 512 is a DEPLOYMENT
    constant — sized to the cell budget you want (sf100's 2M vectors
    → ~3.9k-wide cells, the same cell size the adaptive form
    targets), trained on a sample at 100 TB, and never a function of
    n inside the pipeline. At SFs below 512 vectors every vector
    seeds its own cell and the graph degenerates to nearest-seed
    edges — still oracle-exact (the SQL twin computes the identical
    LIMIT), the scale behavior is what the sf100 sweep measures.
    Same downstream dataflow (`cents=` slot), same top-k semantics
    as knn_graph_ivf."""
    from etl_covid19_spark.operators.similarity import (
        knn_graph_ivf,
        train_centroids_fixedpoint,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cents = train_centroids_fixedpoint(
        emb, "embedding", "vec_id", n_centroids=512
    )
    return knn_graph_ivf(
        emb, "embedding", "vec_id", k=5, cents=cents, n_probe=2
    )


@register(
    "blob_stats_arrow",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           upper(substr(hex(encode(text)), 1, 4)) AS magic
    FROM documents
    """,
)
def q_blob_stats_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-blob byte accounting through raw ``mapInArrow``
    (operators/multimodal.blob_stats_arrow): columnar C++ kernels
    over the Arrow value buffers, zero per-row Python objects —
    completing the Arrow API family next to mapInPandas, cogrouped
    applyInPandas, applyInPandasWithState, pandas_udf, and the
    UDTF."""
    from etl_covid19_spark.operators.multimodal import blob_stats_arrow

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return blob_stats_arrow(d, "doc_id", "payload")


@register(
    "temperature_mix",
    oracle="""
    WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    w AS (
      SELECT list_reduce(list_sort(list(sqrt(CAST(n AS DOUBLE)))),
                         (a, b) -> a + b) AS wsum
      FROM c
    ),
    q AS (
      SELECT lang, n,
             CAST(floor(200 * sqrt(CAST(n AS DOUBLE)) / wsum) AS BIGINT)
               AS quota
      FROM c, w
    ),
    keyed AS (
      SELECT doc_id, lang,
             (doc_id * 2654435761) % 1000000007 AS mix_key
      FROM documents
    ),
    pre AS (
      SELECT k.doc_id, k.lang, k.mix_key, q.quota
      FROM keyed k JOIN q USING (lang)
      WHERE k.mix_key < CAST(2.0 * q.quota / q.n * 1000000007 AS BIGINT)
    )
    SELECT doc_id, lang, CAST(rk AS INT) AS mix_rank FROM (
      SELECT doc_id, lang, quota,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY mix_key, doc_id) AS rk
      FROM pre
    ) WHERE rk <= quota
    """,
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language mixing (the mT5/XLM-R data-mix
    op): a 200-doc budget is allocated ∝ n_lang^(1/2), upsampling
    tail languages relative to proportional sampling, and each
    language's quota is filled by deterministic hash order.

    Determinism across engines: the weight sum folds over the SORTED
    weight list (both engines reduce left-to-right over identical
    order — a bare SUM of doubles is order-nondeterministic and
    could flip a floor() at the boundary).

    Scale shape: quotas come from a |langs|-row aggregate; selection
    is two-phase so no task ever sorts a whole language — a rate
    pre-filter (2× the quota rate against the hash range) bounds
    each language's candidates to ~2×quota rows, and the exact-rank
    window runs on that bounded set. The pre-filter is mirrored in
    the oracle, so both engines select identical rows by
    construction."""
    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    # the weight sum rides a GLOBAL window over the counts frame —
    # bounded at |langs| rows, and it avoids the 1-row cross join
    # (which Catalyst plans as a nested-loop, tripping the repo's
    # no-NLJ plan invariant even though a 1-row build is benign)
    wsum = F.aggregate(
        F.array_sort(
            F.collect_list(F.sqrt(F.col("n").cast("double"))).over(
                Window.partitionBy()
            )
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    quotas = counts.select(
        "lang",
        "n",
        F.floor(
            F.lit(200) * F.sqrt(F.col("n").cast("double")) / wsum
        ).alias("quota"),
    )
    keyed = d.select(
        "doc_id",
        "lang",
        F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(1000000007)).alias(
            "mix_key"
        ),
    )
    pre = keyed.join(F.broadcast(quotas), "lang").where(
        F.col("mix_key")
        < (F.lit(2.0) * F.col("quota") / F.col("n") * F.lit(1000000007))
        .cast("long")
    )
    w = Window.partitionBy("lang").orderBy("mix_key", "doc_id")
    return (
        pre.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= F.col("quota"))
        .select("doc_id", "lang", F.col("rk").cast("int").alias("mix_rank"))
    )


@register(
    "substring_dedup",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, i, array_to_string(toks[i:i+7], ' ') AS gram
      FROM t, unnest(range(1, len(toks) - 6)) r(i) WHERE len(toks) >= 8
    ),
    seeds AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) > 1),
    cov AS (
      SELECT DISTINCT doc_id, i + off AS tpos
      FROM g JOIN seeds USING (gram), unnest(range(0, 8)) o(off)
    ),
    covagg AS (
      SELECT doc_id, COUNT(*) AS n_dup, list(tpos) AS cpos
      FROM cov GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(COALESCE(ca.n_dup, 0) AS BIGINT) AS n_dup_tokens,
           COALESCE(array_to_string(
             list_transform(
               list_filter(range(1, len(t.toks) + 1),
                           i -> NOT list_contains(COALESCE(ca.cpos, []), i)),
               i -> t.toks[i]),
             ' '), '') AS clean_text
    FROM t LEFT JOIN covagg ca USING (doc_id)
    """,
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup (Lee et al. 2022 family): tokens covered
    by any 8-gram occurring more than once corpus-wide are stripped
    (operators/dedup.strip_duplicate_spans — anchor-seeded, all
    equi-joins). The registry path runs the SCALE default: cached
    Arrow-kernel positioned grams with 64-bit keys (the sf1 sweep
    measured the string-gram formulation at ~98 s — 3 evaluations of
    a concat-per-gram HOF — vs ~12 s kernel-backed); the SQL oracle
    keeps gram STRINGS, which is the same result to a ~2⁻⁶⁴
    birthday term, the policy every xxhash64 key in the engine
    already carries. String/hash path equivalence is additionally
    test-pinned at fixture scale."""
    from etl_covid19_spark.operators.dedup import strip_duplicate_spans

    return strip_duplicate_spans(
        _t(spark, sf_dir, "documents"), "text", "doc_id", n=8, hashed=True
    )


@register(
    "substring_dedup_keep_first",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, i, array_to_string(toks[i:i+7], ' ') AS gram
      FROM t, unnest(range(1, len(toks) - 6)) r(i) WHERE len(toks) >= 8
    ),
    ranked AS (
      SELECT doc_id, i,
             row_number() OVER (PARTITION BY gram ORDER BY doc_id, i) AS rn,
             COUNT(*) OVER (PARTITION BY gram) AS c
      FROM g
    ),
    cov AS (
      SELECT DISTINCT doc_id, i + off AS tpos
      FROM ranked, unnest(range(0, 8)) o(off)
      WHERE c > 1 AND rn > 1
    ),
    covagg AS (
      SELECT doc_id, COUNT(*) AS n_dup, list(tpos) AS cpos
      FROM cov GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(COALESCE(ca.n_dup, 0) AS BIGINT) AS n_dup_tokens,
           COALESCE(array_to_string(
             list_transform(
               list_filter(range(1, len(t.toks) + 1),
                           i -> NOT list_contains(COALESCE(ca.cpos, []), i)),
               i -> t.toks[i]),
             ' '), '') AS clean_text
    FROM t LEFT JOIN covagg ca USING (doc_id)
    """,
)
def q_substring_dedup_keep_first(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Substring dedup with Lee et al. 2022's published KEEP-ONE-COPY
    semantics: the lexicographically-first occurrence of each
    duplicated 8-gram (min (doc_id, position), carried as a
    min(struct) on the same seed aggregate — no window sort) is
    exempted from removal, so exactly one copy of every duplicated
    span survives corpus-wide. The oracle mirrors the ownership rule
    with a row_number() window; closes the documented semantics delta
    in ROADMAP.md ("keep ONE copy … needs an ownership tie-break")."""
    from etl_covid19_spark.operators.dedup import strip_duplicate_spans

    return strip_duplicate_spans(
        _t(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        n=8,
        hashed=True,  # kernel-backed scale path; see substring_dedup
        keep_first=True,
    )


# ---------------------------------------------------------------------------
# TPC-H multi-join analogs (join reordering / DPP / disjunctive pushdown)
# ---------------------------------------------------------------------------


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — six-way star-plus-snowflake join where the
    customer↔supplier same-nation equality makes join ORDER matter:
    region→nation prune first (broadcast), facts joined on keys, the
    c_nationkey = s_nationkey constraint applied as a join condition
    rather than a post-filter so no cross-nation pairs materialize.
    CBO stats (ANALYZE-pinned in test_cbo_stats.py) let Catalyst
    reorder the fact joins; dims broadcast under the threshold."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    ext = F.col("l_extendedprice").cast("decimal(18,4)")
    one_disc = (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return joined.groupBy("n_name").agg(
        F.sum(ext * one_disc).cast("double").alias("revenue")
    )


@register(
    "q10_returned_item",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q_q10_returned_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — returned-item revenue per customer over one
    quarter, top-20. The returnflag filter prunes lineitem at the
    scan; nation broadcasts; top-k plans as TakeOrderedAndProject
    (no global sort). Tie-break on c_custkey keeps the LIMIT
    deterministic across engines."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ext = F.col("l_extendedprice").cast("decimal(18,4)")
    one_disc = (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    grouped = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(ext * one_disc).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )
    return agg.top_k(
        grouped, [F.col("revenue").desc(), F.col("c_custkey").asc()], 20
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice AS DECIMAL(18,4))
                              * CAST(1 - l_discount AS DECIMAL(8,4)) END)
                AS DOUBLE) AS promo_revenue,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE)
               AS total_revenue,
           CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice AS DECIMAL(18,4))
                              * CAST(1 - l_discount AS DECIMAL(8,4)) END)
                AS DOUBLE) * 100
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                        * CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE)
               AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — conditional aggregation over a fact⋈dim
    join: promo share of one month's revenue. The NULL-else CASE
    keeps both conditional and total sums in exact DECIMAL until the
    final DOUBLE cast; the pct is a plain double division of the two
    already-equal operands (oracle-parity rule from the module
    docstring)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    ext = F.col("l_extendedprice").cast("decimal(18,4)")
    one_disc = (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    rev = ext * one_disc
    out = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev))
            .cast("double")
            .alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
        .withColumn(
            "promo_pct",
            F.col("promo_revenue") * 100 / F.col("total_revenue"),
        )
    )
    return out


@register(
    "q19_disjunctive_pricing",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q_q19_disjunctive_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — OR-of-ANDs predicate spanning both join
    sides, the classic pushdown stress test. Catalyst cannot push a
    cross-side disjunction into either scan, so the implementation
    adds the REDUNDANT per-side envelopes (brand IN-list on part,
    quantity range on lineitem) that TPC-H implementations derive by
    hand — semantics unchanged, but both scans prune before the join
    and the disjunction only runs on the survivors."""
    brands = ("Brand#11", "Brand#12", "Brand#13")
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin(*brands)  # redundant envelope → scan prune
    ).select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(1, 30)  # redundant envelope
    ).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    cond = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    ext = F.col("l_extendedprice").cast("decimal(18,4)")
    one_disc = (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(
            F.sum(ext * one_disc).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "incremental_dedup",
    oracle="""
    SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
    FROM documents b
    WHERE doc_id >= 250
      AND NOT EXISTS (SELECT 1 FROM documents c
                      WHERE c.doc_id < 250 AND c.text = b.text)
    GROUP BY b.text
    """,
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot exact dedup (operators/dedup.
    incremental_exact_dedup): the daily-ingest shape — new batch
    (doc_id >= 250) probed against the already-ingested corpus
    (doc_id < 250) with an anti-join on distinct content keys, then
    deduped within the batch. Registry path joins on raw text for
    oracle portability; the xxhash64 12-byte-key scale path is
    test-pinned equivalent."""
    from etl_covid19_spark.operators.dedup import incremental_exact_dedup

    docs = _t(spark, sf_dir, "documents")
    return incremental_exact_dedup(
        docs.filter(F.col("doc_id") >= 250),
        docs.filter(F.col("doc_id") < 250),
        "text",
        "doc_id",
        hashed=False,
    )


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH ex AS (
      SELECT vec_id, i AS o, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, unnest(range(1, len(embedding) + 1)) r(i)
    ),
    s AS (
      SELECT o - 1 AS d, MIN(x) AS mn, MAX(x) AS mx
      FROM ex GROUP BY o
    ),
    qv AS (
      SELECT ex.vec_id, ex.o,
             CAST(CASE WHEN s.mx = s.mn THEN 0
                  ELSE LEAST(FLOOR((ex.x - s.mn) * CAST(255 AS DOUBLE)
                                   / (s.mx - s.mn)), 255) END AS INT) AS q
      FROM ex JOIN s ON ex.o - 1 = s.d
    )
    SELECT vec_id, array_to_string(list(q ORDER BY o), ',') AS q_embedding
    FROM qv GROUP BY vec_id
    """,
)
def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar (per-dim affine) int8 quantization of the embeddings
    table (operators/similarity.embedding_quantize_int8): the 4×
    compression step before ANN indexing at 100 TB. Stats shuffle is
    d rows per partition (partial agg); the d-row model re-enters as
    literals; the quantize is map-side codegen. Double arithmetic
    end-to-end keeps the oracle bit-identical.  The registry wrapper
    comma-joins the int array (the library operator keeps returning
    array<int>): the driver's pandas canonicalizer cannot sort
    ndarray cells (map_kit encode contract)."""
    from etl_covid19_spark.operators.similarity import (
        embedding_quantize_int8,
    )

    q = embedding_quantize_int8(
        _t(spark, sf_dir, "embeddings"), "embedding", "vec_id"
    )
    return q.select(
        "vec_id",
        F.array_join(
            F.transform(F.col("q_embedding"), lambda x: x.cast("string")), ","
        ).alias("q_embedding"),
    )


@register(
    "dedup_cluster_representatives",
    oracle=r"""
    WITH RECURSIVE t AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(trim(text), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks)-1),
                                   i -> array_to_string(toks[i:i+2], ' '))
               ELSE [array_to_string(toks, ' ')] END) AS grams
      FROM t
    ),
    p AS (SELECT doc_id, len(grams) AS n, unnest(grams) AS sh FROM g),
    c AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
             COUNT(*) AS nc
      FROM p a JOIN p b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM c
      WHERE nc * 1.0 / (na + nb - nc) >= 0.8
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    ),
    clusters AS (
      SELECT node AS doc_id, MIN(label) AS cluster_id
      FROM reach GROUP BY node
    ),
    q AS (
      SELECT doc_id,
             round(0.3 * least(length(text) / 200.0, 1.0)
                 + 0.3 * (CASE WHEN
                       list_reduce(list_prepend(0,
                           list_transform(toks, x -> length(x))),
                                   (a, b) -> a + b)
                         / greatest(len(toks), 1) BETWEEN 2 AND 12
                       THEN 1.0 ELSE 0.3 END)
                 + 0.2 * (1.0 - least(
                       length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
                         / greatest(length(text), 1) * 5, 1.0))
                 + 0.2 * least(
                       len(list_filter(toks, x -> lower(x) IN
                           ('the','a','an','and','or','of','to','in','is',
                            'are','for','on','with','as','at','by','it',
                            'this','that')))
                         / greatest(len(toks), 1) * 4, 1.0), 6) AS quality
      FROM t
    ),
    ranked AS (
      SELECT c.cluster_id, c.doc_id, q.quality,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY q.quality DESC, c.doc_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY c.cluster_id) AS cluster_size
      FROM clusters c JOIN q USING (doc_id)
    )
    SELECT cluster_id, doc_id AS rep_doc_id,
           CAST(cluster_size AS BIGINT) AS cluster_size,
           quality AS rep_quality
    FROM ranked WHERE rn = 1
    """,
)
def q_dedup_cluster_representatives(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Near-dup clusters with QUALITY-BASED representative selection
    — the curation policy real pipelines use instead of keep-min-id:
    within each connected component, keep the highest-quality member
    (ties → smallest id). Clusters come from the same LSH pair graph
    as `dedup_clusters`; the per-cluster argmax is a window over the
    component (components are near-dup groups — bounded, so the
    window partition never skews). Member quality rides the Arrow
    counting kernel (`quality_from_counts` replay — the HOF scorer
    was ~half this query's sf10 cost)."""
    from etl_covid19_spark.operators.dedup import (
        components_auto,
        minhash_lsh_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", n=3, num_hashes=96, bands=24, threshold=0.8
    )
    clusters = components_auto(pairs)
    q = text.quality_counts_arrow(docs, ["doc_id"], "text").select(
        "doc_id", text.quality_from_counts()["quality"].alias("quality")
    )
    ranked = clusters.join(q, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    wc = Window.partitionBy("cluster_id")
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .withColumn("cluster_size", F.count(F.lit(1)).over(wc))
        .where(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("rep_doc_id"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.col("quality").alias("rep_quality"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) cnt
    GROUP BY c_count
    """,
)
def q_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — order-count histogram over a LEFT OUTER
    join with an ON-side (not WHERE-side) filter, the classic
    outer-join-semantics trap: customers with zero qualifying orders
    must appear with c_count = 0, so the priority predicate belongs
    in the join condition. Two hash aggregates, both map-side
    partial."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    joined = c.join(
        o,
        (c.c_custkey == o.o_custkey)
        & (o.o_orderpriority != "1-URGENT"),
        "left_outer",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
             AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def q_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — correlated scalar subquery (per-part average
    quantity) gating the fact scan. Implemented as the decorrelated
    form Catalyst itself would produce: one pre-aggregate per
    p_partkey joined back to the filtered fact — no per-row subquery
    execution, one extra shuffle keyed the same as the join."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#13"
    ).select("p_partkey")
    avg_q = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cap")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avg_q, on="l_partkey")
        .where(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
                .cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           CAST(o.o_totalprice AS DOUBLE) AS total_price,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM customer c, orders o, lineitem l
    WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 250
          )
      AND c.c_custkey = o.o_custkey
      AND o.o_orderkey = l.l_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY total_price DESC, o.o_orderkey ASC
    LIMIT 20
    """,
)
def q_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — IN-subquery with HAVING over the same fact
    (big orders by total quantity), planned as an aggregate →
    left-semi join, then the reporting join + top-k. The semi-join
    side carries only qualifying order keys — tiny — so it
    broadcasts."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .where(F.col("sq") > 250)
        .select("l_orderkey")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    # `big` is very selective (~1 in 10⁴ orders) but still grows
    # linearly with the corpus — AQE broadcasts it at bench SFs
    # without pinning a 100 TB hazard into the plan
    filt_o = o.join(
        big, o.o_orderkey == big.l_orderkey, "left_semi"
    )
    grouped = (
        li.join(filt_o, li.l_orderkey == filt_o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("o_totalprice").cast("double").alias("total_price"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_qty")
        )
        .select(
            "c_name", "c_custkey", "o_orderkey", "order_date",
            "total_price", "sum_qty",
        )
    )
    return agg.top_k(
        grouped,
        [F.col("total_price").desc(), F.col("o_orderkey").asc()],
        20,
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT CAST(c.c_custkey % 10 AS INT) AS cntrycode,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
            SELECT AVG(c2.c_acctbal) FROM customer c2
            WHERE c2.c_acctbal > 0
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > 400000
          )
    GROUP BY CAST(c.c_custkey % 10 AS INT)
    """,
)
def q_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — rich customers who never ordered: an
    uncorrelated scalar-average subquery (computed once, enters the
    filter as a broadcast single-row cross join — no collect) plus a
    NOT EXISTS (no big-ticket order) planned as a left-anti join
    on the orders key after the price filter prunes the build side."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 400000)
        .select("o_custkey")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("cutoff")
    )
    rich = (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("cutoff"))
        .drop("cutoff")
    )
    never_ordered = rich.join(
        o, rich.c_custkey == o.o_custkey, "left_anti"
    )
    return never_ordered.groupBy(
        (F.col("c_custkey") % 10).cast("int").alias("cntrycode")
    ).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
        .cast("double")
        .alias("totacctbal"),
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
           o.unit_cost
    FROM offers o
    JOIN part p ON p.p_partkey = o.l_partkey
    JOIN supplier s ON s.s_suppkey = o.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
      AND o.unit_cost = (
        SELECT MIN(o2.unit_cost)
        FROM offers o2
        JOIN supplier s2 ON s2.s_suppkey = o2.l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        WHERE o2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — min-cost supplier per part, the correlated
    MIN subquery classic. The part↔supplier offer relation (the
    reference schema's partsupp) is derived from lineitem as the
    minimum observed unit price per (part, supplier). Decorrelated:
    one region-pruned offer frame, a per-part MIN pre-aggregate,
    joined back on (partkey, unit_cost) — the exact plan Catalyst's
    RewriteCorrelatedScalarSubquery would emit, with region/nation
    broadcast and the fact aggregated before any wide join."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "unit_cost"
        )
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    regional = offers.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
    best = regional.groupBy(
        F.col("l_partkey").alias("bp_partkey")
    ).agg(F.min("unit_cost").alias("best_cost"))
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15).select(
        "p_partkey", "p_name"
    )
    out = (
        regional.join(
            best,
            (F.col("l_partkey") == F.col("bp_partkey"))
            & (F.col("unit_cost") == F.col("best_cost")),
        )
        .drop("bp_partkey")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            "unit_cost",
        )
    )
    return agg.top_k(
        out,
        [
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        ],
        100,
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l.l_discount AS DECIMAL(8,4))) AS DOUBLE)
             AS revenue
    FROM supplier s, lineitem l, orders o, customer c,
         nation n1, nation n2
    WHERE s.s_suppkey = l.l_suppkey AND o.o_orderkey = l.l_orderkey
      AND c.c_custkey = o.o_custkey AND s.s_nationkey = n1.n_nationkey
      AND c.c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, CAST(YEAR(l.l_shipdate) AS INT)
    """,
)
def q_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — bilateral trade volume between two nations
    by ship year. The nation pair disjunction is applied as a
    post-join filter over two broadcast nation joins (supplier side
    aliased n1, customer side n2); both single-nation prunes happen
    first so the fact join never carries other nations' rows."""
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = ["NATION_3", "NATION_7"]
    n1 = n.filter(F.col("n_name").isin(pair)).withColumnRenamed(
        "n_name", "supp_nation"
    )
    n2 = (
        n.filter(F.col("n_name").isin(pair))
        .withColumnRenamed("n_name", "cust_nation")
        .withColumnRenamed("n_nationkey", "n2_nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate",
             "l_extendedprice", "l_discount")
    ext = F.col("l_extendedprice").cast("decimal(18,4)")
    one_disc = (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    joined = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_nationkey"))
        .where(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("int").alias("l_year"),
    ).agg(F.sum(ext * one_disc).cast("double").alias("revenue"))


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                         THEN volume END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,4))
               * CAST(1 - l.l_discount AS DECIMAL(8,4)) AS volume,
             n2.n_name AS supp_nation
      FROM part p, supplier s, lineitem l, orders o, customer c,
           nation n1, nation n2, region r
      WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
        AND l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
        AND c.c_nationkey = n1.n_nationkey
        AND n1.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
        AND s.s_nationkey = n2.n_nationkey
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND p.p_type = 'ECONOMY'
      ) all_nations
    GROUP BY o_year
    """,
)
def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — national market share: one nation's slice of
    a region's part-type import volume by order year. The eight-way
    join keeps every dim broadcast (part filtered to one type first);
    the share is a conditional-sum / total-sum division computed in
    ONE aggregate pass — never two scans of the joined fact."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    volume = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    )
    joined = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_nationkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    return joined.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")))
            .cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH natval AS (
      SELECT l.l_partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS value_dec
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM natval
    WHERE CAST(value_dec AS DOUBLE) > (
      SELECT 0.001 * CAST(SUM(value_dec) AS DOUBLE) FROM natval
    )
    ORDER BY part_value DESC, l_partkey ASC
    """,
)
def q_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — parts whose one-nation inventory value
    exceeds a FRACTION OF THE GLOBAL TOTAL: per-group aggregate
    gated by an uncorrelated scalar aggregate over the same frame.
    The per-part frame is computed once and reused for both sides
    (self-referencing CTE); the scalar total enters as a broadcast
    single-row cross join, never a collect. Threshold compare runs
    in exact DECIMAL — only the reported value casts to double."""
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    natval = (
        # one nation's suppliers = 1/25 of a linear table — AQE call
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias(
                "value_dec"
            )
        )
    )
    total = natval.agg(
        (F.lit(0.001) * F.sum("value_dec").cast("double")).alias("cutoff")
    )
    out = (
        natval.join(F.broadcast(total))
        .where(F.col("value_dec").cast("double") > F.col("cutoff"))
        .select(
            "l_partkey", F.col("value_dec").cast("double").alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), F.col("l_partkey").asc())
    )
    return out


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                 * CAST(1 - l_discount AS DECIMAL(8,4))) AS total_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_dec AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_dec = (SELECT MAX(total_dec) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — the top-revenue supplier for a quarter,
    i.e. the VIEW + scalar-MAX-over-the-view pattern. The revenue
    frame is built once; its MAX re-enters as a broadcast single-row
    cross join (Spark reuses the shuffle output for both branches —
    ReusedExchange in the plan). Equality on the exact DECIMAL total
    keeps ties bit-deterministic where a double compare could flake."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    ext = F.col("l_extendedprice").cast("decimal(18,4)")
    one_disc = (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(ext * one_disc).alias("total_dec")
    )
    mx = revenue.agg(F.max("total_dec").alias("max_dec"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx))
        .where(F.col("total_dec") == F.col("max_dec"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q16_part_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q_q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — distinct-supplier counts per part attribute
    triple, minus blacklisted suppliers. NOT IN over a non-nullable
    key plans as a left-anti join (the tiny blacklist broadcasts);
    COUNT(DISTINCT) expands to the two-phase partial-distinct
    aggregate, so the shuffle carries (triple, suppkey) pairs, not
    row multiplicity."""
    excluded = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        # the blacklist is a fixed FRACTION of supplier (linear in
        # corpus) — let AQE broadcast it only while it measures small
        li.join(
            excluded,
            li.l_suppkey == excluded.s_suppkey,
            "left_anti",
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_type").asc(),
            F.col("p_size").asc(),
        )
    )


@register(
    "q20_excess_quantity_suppliers",
    oracle="""
    WITH per_ps AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) AS supp_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ),
    per_part AS (
      SELECT l_partkey, SUM(supp_qty) AS part_qty FROM per_ps
      GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_name, n.n_name
    FROM per_ps ps
    JOIN per_part pp ON ps.l_partkey = pp.l_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE ps.supp_qty > 0.5 * pp.part_qty
      AND n.n_name IN ('NATION_3', 'NATION_7')
    ORDER BY s.s_name, n.n_name
    """,
)
def q_q20_excess_quantity_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — suppliers holding an outsized share of a
    part's yearly flow: NESTED aggregate subqueries (per-(part,supp)
    sum vs half the per-part sum) feeding a semi-join against a
    nation-pruned supplier list. Both aggregates reuse one shuffle
    (the per-part total folds over the per-(part,supp) frame), and
    the 0.5× threshold compare joins on partkey only — the same
    decorrelation Q17 uses, one level deeper."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("supp_qty")
    )
    per_part = per_ps.groupBy("l_partkey").agg(
        F.sum("supp_qty").alias("part_qty")
    )
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    return (
        per_ps.join(per_part, on="l_partkey")
        .where(F.col("supp_qty") > F.lit(0.5) * F.col("part_qty"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "n_name")
        .distinct()
        .orderBy("s_name", "n_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s, lineitem l1, orders o, nation n
    WHERE s.s_suppkey = l1.l_suppkey
      AND o.o_orderkey = l1.l_orderkey
      AND o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
      AND s.s_nationkey = n.n_nationkey
      AND n.n_name = 'NATION_3'
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def q_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the sole-blocking-supplier query: EXISTS
    (another supplier touched the order) + NOT EXISTS (no OTHER
    supplier failed it). Both correlated subqueries collapse into
    ONE per-order aggregate — distinct suppliers overall and
    distinct failing suppliers — computed in a single shuffle over
    the order key; the exists/not-exists pair becomes two scalar
    predicates (n_supp > 1, n_fail_supp = 1) on the joined frame.
    Counting stays per-l1-row, matching the reference semantics."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_fail_supp"),
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    l1 = li.filter(F.col("l_returnflag") == "R")
    out = (
        l1.join(o, l1.l_orderkey == o.o_orderkey)
        .join(per_order, on="l_orderkey")
        .where((F.col("n_supp") > 1) & (F.col("n_fail_supp") == 1))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return agg.top_k(
        out, [F.col("numwait").desc(), F.col("s_name").asc()], 100
    )


# ---------------------------------------------------------------------------
# Statistics kit (§2.5 extension): deterministic bivariate statistics,
# deterministic mode, fixed-width histograms
# ---------------------------------------------------------------------------


@register(
    "stats_kit",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    ), d AS (
      SELECT l_returnflag, n,
             (n * sxy - sx * sy) /
               (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price,
             (n * sxy - sx * sy) / (n * n) AS covar_pop,
             (n * sxy - sx * sy) / (n * (n - 1)) AS covar_samp,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS regr_slope,
             sqrt(n * sxx - sx * sx) / n AS stddev_pop_qty,
             sx, sy
      FROM m
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows, corr_qty_price,
           covar_pop, covar_samp, regr_slope,
           (sy - regr_slope * sx) / n AS regr_intercept, stddev_pop_qty
    FROM d ORDER BY l_returnflag
    """,
)
def q_stats_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics (corr / covar / regression line / stddev)
    per return flag, derived from exact decimal moment sums
    (`aggregates.exact_moments`) instead of the built-in `corr()` /
    `covar_samp()` accumulators. The built-ins fold doubles in
    partition order, so their low bits drift with partitioning and
    executor count; the moment route is ONE map-side-combined hash
    aggregate whose six partials are exact, making every derived
    statistic bit-reproducible on any cluster size — the property a
    100 TB differential gate actually needs. Formula shapes are
    written identically on both engines so IEEE-correctly-rounded
    ops land on identical bits (no transcendentals involved)."""
    li = _t(spark, sf_dir, "lineitem")
    m = agg.exact_moments(li, ["l_returnflag"], "l_quantity", "l_extendedprice")
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    d = m.select(
        "l_returnflag",
        n,
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_qty_price"),
        ((n * sxy - sx * sy) / (n * n)).alias("covar_pop"),
        ((n * sxy - sx * sy) / (n * (n - F.lit(1.0)))).alias("covar_samp"),
        ((n * sxy - sx * sy) / (n * sxx - sx * sx)).alias("regr_slope"),
        (F.sqrt(n * sxx - sx * sx) / n).alias("stddev_pop_qty"),
        sx,
        sy,
    )
    return d.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_rows"),
        "corr_qty_price",
        "covar_pop",
        "covar_samp",
        "regr_slope",
        (
            (F.col("sy") - F.col("regr_slope") * F.col("sx")) / F.col("n")
        ).alias("regr_intercept"),
        "stddev_pop_qty",
    ).orderBy("l_returnflag")


@register(
    "mode_per_group",
    oracle="""
    WITH counts AS (
      SELECT user_id % 10 AS cohort, event_type, COUNT(*) AS n_events
      FROM events GROUP BY user_id % 10, event_type
    ), ranked AS (
      SELECT cohort, event_type, n_events,
             ROW_NUMBER() OVER (
               PARTITION BY cohort
               ORDER BY n_events DESC, event_type ASC
             ) AS rn
      FROM counts
    )
    SELECT cohort, event_type AS mode_event, n_events
    FROM ranked WHERE rn = 1 ORDER BY cohort
    """,
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode. The built-in `mode()` aggregate
    breaks frequency ties arbitrarily (hash-map iteration order), so
    two runs of the same job can disagree — this spells the standard
    fix: count per (group, value) with map-side partial aggregation,
    then a rank-1 window with an explicit (count DESC, value ASC)
    tiebreak. The window's partition count is |groups|, each holding
    |distinct values| rows — never the raw events — so it scales as
    an aggregate, not a sort of the fact table."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy(
        (F.col("user_id") % 10).alias("cohort"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("cohort").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("cohort", F.col("event_type").alias("mode_event"), "n_events")
        .orderBy("cohort")
    )


@register(
    "value_histogram",
    oracle="""
    SELECT CAST(least(floor(value / 25.0), 19) AS BIGINT) AS bucket,
           CAST(least(floor(value / 25.0), 19) AS BIGINT) * CAST(25.0 AS DOUBLE) AS lo,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY bucket ORDER BY bucket
    """,
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram over a measure column — the profiling
    primitive behind data-quality dashboards and equi-width binning
    for stratification. The bucket id is pure closed-form arithmetic
    (floor of a division, clamped into the last bucket), so binning
    rides inside whole-stage codegen and the aggregate shuffles one
    partial per bucket — 20 rows of state regardless of input size.
    No `width_bucket` dependency: the explicit floor keeps the
    expression portable and bit-identical across engines."""
    ev = _t(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 25.0), F.lit(19)).cast("long")
    return (
        ev.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("value", "decimal(18,4)").alias("sum_value"),
        )
        .select(
            "bucket",
            (F.col("bucket") * 25.0).alias("lo"),
            "n_rows",
            "sum_value",
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# History & time-series regularization (§2.7/§2.8 extensions)
# ---------------------------------------------------------------------------


@register(
    "scd2_dimension",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS rn
      FROM events
    ), changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE rn = 1 OR prev IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type, ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           ROW_NUMBER() OVER w AS version,
           lead(ts) OVER w IS NULL AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, version
    """,
)
def q_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension from an append-only change log: collapse
    each user's event-type runs into [valid_from, valid_to) intervals
    with version numbers and an is_current flag. The reference's
    dimension load is Type 1 (latest wins, history lost —
    `dags/ETL_covid19_SQL.py` dimension inserts); this is the
    history-preserving upgrade, two window passes sharing ONE
    (user_id) shuffle. The (ts, event_id) ordering is total, so run
    boundaries are deterministic."""
    from etl_covid19_spark.operators.scd import scd2_collapse

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    out = scd2_collapse(ev, "user_id", ["ts", "event_id"], "event_type")
    return out.orderBy("user_id", "version")


@register(
    "gap_fill_interpolate",
    oracle="""
    WITH agg AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS _sum,
             COUNT(*) AS n_events
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), span AS (
      SELECT event_type, min(bucket_ts) AS lo, max(bucket_ts) AS hi
      FROM agg GROUP BY event_type
    ), grid AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
      FROM span
    ), joined AS (
      SELECT g.event_type, g.bucket_ts, a._sum / a.n_events AS avg_value
      FROM grid g
      LEFT JOIN agg a
        ON g.event_type = a.event_type AND g.bucket_ts = a.bucket_ts
    ), scan AS (
      SELECT event_type, bucket_ts, avg_value,
             CAST(epoch(bucket_ts) AS DOUBLE) AS t,
             last_value(avg_value IGNORE NULLS) OVER wb AS pv,
             last_value(CASE WHEN avg_value IS NOT NULL
                             THEN CAST(epoch(bucket_ts) AS DOUBLE) END
                        IGNORE NULLS) OVER wb AS pt,
             first_value(avg_value IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN avg_value IS NOT NULL
                              THEN CAST(epoch(bucket_ts) AS DOUBLE) END
                         IGNORE NULLS) OVER wf AS nt
      FROM joined
      WINDOW wb AS (PARTITION BY event_type ORDER BY bucket_ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY event_type ORDER BY bucket_ts
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, bucket_ts,
           CASE WHEN avg_value IS NOT NULL THEN avg_value
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                ELSE pv + (nv - pv) * ((t - pt) / (nt - pt)) END AS avg_value,
           avg_value IS NULL AS filled
    FROM scan ORDER BY event_type, bucket_ts
    """,
)
def q_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap-fill: hourly per-event-type averages on a
    DENSE time grid, missing buckets linearly interpolated between
    their nearest known neighbors (edge gaps take the single
    neighbor). The grid is sequence()+explode per key (distributed,
    bucket-grained), the join is bucket-grained equi-join, and both
    interpolation scans share one (key, time) sort — raw events are
    touched exactly once, in the initial map-side-combined aggregate.
    Averages divide exact decimal sums and the lerp runs over
    integral epoch seconds, so every engine lands on identical
    bits."""
    from etl_covid19_spark.operators import timeseries as ts
    from etl_covid19_spark.operators.df_cache import SHARED_CACHE, corpus_key

    ev = _t(spark, sf_dir, "events")
    # the bucket aggregate feeds BOTH the grid-span branch and the
    # values side of the left join; persist it through the shared
    # bounded pool so events is scanned once, not once per branch
    agg_df = SHARED_CACHE.get_or_build(
        ("bucket_agg_hour", "event_type", "value", *corpus_key(ev)),
        lambda: ts.bucket_aggregate(ev, "event_type", "ts", "value"),
    )
    grid = ts.dense_grid(agg_df, "event_type")
    joined = grid.join(agg_df, ["event_type", "bucket_ts"], "left").select(
        "event_type",
        "bucket_ts",
        (F.col("_sum") / F.col("n_events")).alias("avg_value"),
    )
    out = ts.interpolate_gaps(joined, "event_type", "avg_value")
    return out.orderBy("event_type", "bucket_ts")


# ---------------------------------------------------------------------------
# Lexical retrieval & fuzzy matching (§7.2-step-9 extensions)
# ---------------------------------------------------------------------------


# shared with hybrid_retrieval_rrf's oracle (the kw side)
_BM25_ORACLE = """
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ), dl AS (
      SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id
    ), stats AS (
      SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs,
             CAST(SUM(tf) AS DOUBLE) / COUNT(DISTINCT doc_id) AS avgdl
      FROM tf
    ), dft AS (
      SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
      FROM tf GROUP BY term
    ), q AS (
      SELECT * FROM (VALUES ('vector'), ('stream'), ('window'), ('join'))
      AS t(term)
    ), scored AS (
      SELECT tf.doc_id,
             ln(1.0 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5)) *
             ((CAST(tf.tf AS DOUBLE) * (1.2 + 1.0)) /
              (CAST(tf.tf AS DOUBLE) +
               1.2 * (1.0 - 0.75 +
                      0.75 * (CAST(dl.dl AS DOUBLE) / s.avgdl)))) AS s
      FROM tf
      JOIN q ON tf.term = q.term
      JOIN dft ON tf.term = dft.term
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN stats s
    )
    SELECT doc_id,
           round(CAST(SUM(CAST(s AS DECIMAL(28,12))) AS DOUBLE), 6) AS score,
           COUNT(*) AS n_terms_matched
    FROM scored GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC LIMIT 20
    """


@register("bm25_search", oracle=_BM25_ORACLE)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search over the documents corpus: inverted-index
    postings (one hash aggregate), term document frequencies, and a
    scoring join where the BROADCAST query-term list prunes postings
    down to only the queried terms — the classic inverted-index
    access pattern as join pruning, no full-corpus scan past the
    postings build. Top-k via TakeOrderedAndProject. Scores are
    decimal-accumulated per doc and rounded to 6 dp so ranking is
    engine- and partitioning-stable (ln is the one libm call)."""
    from etl_covid19_spark.operators.search import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    return bm25_topk(docs, ["vector", "stream", "window", "join"], k=20)


@register(
    "fuzzy_join_nations",
    oracle="""
    WITH probes AS (
      SELECT * FROM (VALUES
        ('NATOIN_3'), ('NATION_12'), ('NATON_7'), ('REGIN_1'), ('XQZZY')
      ) AS t(probe)
    )
    SELECT p.probe, n.n_name AS matched, 
           levenshtein(p.probe, n.n_name) AS edit_dist
    FROM probes p
    JOIN nation n ON levenshtein(p.probe, n.n_name) <= 2
    ORDER BY p.probe, edit_dist, matched
    """,
)
def q_fuzzy_join_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy dimension lookup: match (possibly misspelled) probe
    strings against the nation dimension within edit distance 2 —
    the entity-resolution primitive for dirty reference data.
    Levenshtein is unit-cost on both engines, so distances are
    exact integers. The probe list is broadcast and the predicate is
    a theta join — correct here ONLY because one side is a bounded
    broadcast (|probes| × |dim| comparisons, dims are bounded); at
    corpus scale the candidate set must come from an equi-joinable
    blocking key first (the n-gram/LSH machinery in
    operators/dedup)."""
    n = _t(spark, sf_dir, "nation").select("n_name")
    probes = spark.createDataFrame(
        [("NATOIN_3",), ("NATION_12",), ("NATON_7",), ("REGIN_1",), ("XQZZY",)],
        "probe string",
    )
    dist = F.levenshtein(F.col("probe"), F.col("n_name"))
    return (
        n.join(F.broadcast(probes), dist <= 2)
        .select(
            "probe",
            F.col("n_name").alias("matched"),
            dist.alias("edit_dist"),
        )
        .orderBy("probe", "edit_dist", "matched")
    )


# ---------------------------------------------------------------------------
# Behavioral analytics & anomaly detection (§2.8 extensions)
# ---------------------------------------------------------------------------


@register(
    "funnel_conversion",
    oracle="""
    WITH s0 AS (
      SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s1 AS (
      SELECT e.user_id, min(e.ts) AS t1 FROM events e
      JOIN s0 ON e.user_id = s0.user_id
      WHERE e.event_type = 'click' AND e.ts > s0.t0 GROUP BY e.user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2 FROM events e
      JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s1.t1 GROUP BY e.user_id
    ), one AS (
      SELECT (SELECT count(*) FROM s0) AS n0,
             (SELECT count(*) FROM s1) AS n1,
             (SELECT count(*) FROM s2) AS n2
    ), tr AS (
      SELECT event_type, count(*) AS n_over FROM (
        SELECT user_id, event_type FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
        GROUP BY user_id, event_type HAVING count(*) > 100000
      ) GROUP BY event_type
    ), tall AS (
      SELECT 1 AS step_idx, 'view' AS step, n0 AS users FROM one
      UNION ALL SELECT 2, 'click', n1 FROM one
      UNION ALL SELECT 3, 'purchase', n2 FROM one
    )
    SELECT step_idx, step, users,
           CAST(users AS DOUBLE) / lag(users) OVER (ORDER BY step_idx)
             AS conv_from_prev,
           COALESCE((SELECT n_over FROM tr WHERE tr.event_type = tall.step),
                    0) AS truncated_users
    FROM tall ORDER BY step_idx
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ordered funnel view → click → purchase: each stage
    counts users whose step event comes strictly after their
    previous-stage conversion. Every stage is a user-keyed
    min-aggregate equi-joined to the previous stage — user-grained
    shuffles, no event-grained window sort — and the whole funnel is
    ONE lazy plan (per-step counts collapse into a single-row
    aggregate, unpivoted with stack). Per-user per-step state is
    capped at 100k earliest events with truncation surfaced as
    `truncated_users` (oracle computes the same >cap census — 0 at
    test SFs, which is the point: values only diverge where the
    unbounded form would be OOMing anyway)."""
    from etl_covid19_spark.operators.behavior import funnel_steps

    ev = _t(spark, sf_dir, "events")
    return funnel_steps(ev, ["view", "click", "purchase"]).orderBy("step_idx")


@register(
    "cohort_retention",
    oracle="""
    WITH first AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
      FROM events GROUP BY user_id
    ), active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events
    )
    SELECT f.cohort_day,
           datediff('day', f.cohort_day, a.active_day) AS day_offset,
           count(DISTINCT a.user_id) AS users
    FROM active a JOIN first f ON a.user_id = f.user_id
    WHERE datediff('day', f.cohort_day, a.active_day) <= 7
    GROUP BY f.cohort_day, day_offset
    ORDER BY f.cohort_day, day_offset
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: users bucketed by first-seen day, counted
    on each of their first 7 activity-day offsets. Two user-keyed
    aggregates plus one user-grained equi-join; output is
    |cohorts| × 8 rows."""
    from etl_covid19_spark.operators.behavior import cohort_retention

    ev = _t(spark, sf_dir, "events")
    return cohort_retention(ev, max_offset_days=7).orderBy(
        "cohort_day", "day_offset"
    )


@register(
    "anomaly_zscore",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), scan AS (
      SELECT event_type, bucket_ts, v,
             CAST(COUNT(v) OVER w AS DOUBLE) AS n,
             CAST(SUM(CAST(v AS DECIMAL(38,8))) OVER w AS DOUBLE) AS sx,
             CAST(SUM(CAST(v * v AS DECIMAL(38,8))) OVER w AS DOUBLE) AS sxx
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, bucket_ts, v,
           CASE WHEN n >= 12 AND sqrt(n * sxx - sx * sx) / n > 0
                THEN (v - sx / n) / (sqrt(n * sxx - sx * sx) / n)
           END AS zscore,
           CASE WHEN n >= 12 AND sqrt(n * sxx - sx * sx) / n > 0
                THEN abs((v - sx / n) / (sqrt(n * sxx - sx * sx) / n)) > 3.0
           END AS is_anomaly
    FROM scan ORDER BY event_type, bucket_ts
    """,
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection over hourly value sums: each
    bucket is scored against the mean/stddev of the 24 buckets
    strictly before it (the row never contaminates its own baseline;
    cold-start rows get NULL). Windowed sums accumulate in exact
    decimal so the z-score — and therefore the anomaly FLAG — is
    identical under any partitioning, which is what you need before
    paging someone at 3am. Input is bucket-grained, so the window
    partition is one key's series, never raw events."""
    from etl_covid19_spark.operators import timeseries as ts

    ev = _t(spark, sf_dir, "events")
    hourly = ts.bucket_aggregate(ev, "event_type", "ts", "value").select(
        "event_type", "bucket_ts", F.col("_sum").alias("v")
    )
    out = ts.rolling_zscore(
        hourly, "event_type", "bucket_ts", "v", 24, 12, 3.0
    )
    return out.orderBy("event_type", "bucket_ts")


@register(
    "sequence_pattern_match",
    oracle="""
    WITH seqs AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY ts, event_id) AS seq,
             count(*) > 100000 AS truncated
      FROM events GROUP BY user_id
    )
    SELECT user_id, length(seq) AS seq_len,
           regexp_matches(seq, 'v.*c.*p') AS has_funnel_pattern,
           truncated
    FROM seqs ORDER BY user_id
    """,
)
def q_sequence_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex over behavior: fold each user's (ts, event_id)-ordered
    event initials into a string and pattern-match it —
    MATCH_RECOGNIZE-lite for funnels with arbitrary gaps
    ('v.*c.*p' = view then click then purchase as a subsequence).
    One hash aggregate (collect_list of structs, sorted per group
    post-aggregation — no global sort) + a codegen'd rlike. Per-user
    state is capped at the 100k earliest events, surfaced as
    `truncated` (both sides compute the >cap census; 0/false at test
    SFs)."""
    from etl_covid19_spark.operators.behavior import event_sequences

    ev = _t(spark, sf_dir, "events")
    seqs = event_sequences(ev)
    return seqs.select(
        "user_id",
        F.length("seq").alias("seq_len"),
        F.col("seq").rlike("v.*c.*p").alias("has_funnel_pattern"),
        "truncated",
    ).orderBy("user_id")


@register(
    "event_transition_matrix",
    oracle="""
    WITH pairs AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS to_type
      FROM events
    ), counts AS (
      SELECT from_type, to_type, COUNT(*) AS n_transitions
      FROM pairs WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n_transitions,
           CAST(n_transitions AS DOUBLE) /
             SUM(n_transitions) OVER (PARTITION BY from_type) AS prob
    FROM counts ORDER BY from_type, to_type
    """,
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix between event types along
    each user's ordered timeline: one user-keyed window pass (lead),
    one (from, to)-keyed aggregate, |types|² rows out. Probabilities
    divide exact longs — deterministic under any partitioning."""
    from etl_covid19_spark.operators.behavior import transition_matrix

    ev = _t(spark, sf_dir, "events")
    return transition_matrix(ev).orderBy("from_type", "to_type")


@register(
    "revenue_share",
    oracle="""
    WITH nat AS (
      SELECT n.n_nationkey, n.n_name, r.r_name
      FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    ), rev AS (
      SELECT nat.r_name, nat.n_name,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nat ON c.c_nationkey = nat.n_nationkey
      GROUP BY nat.r_name, nat.n_name
    )
    SELECT r_name, n_name, revenue,
           revenue / CAST(SUM(CAST(revenue AS DECIMAL(28,6)))
                          OVER (PARTITION BY r_name) AS DOUBLE)
             AS share_of_region,
           revenue / CAST(SUM(CAST(revenue AS DECIMAL(28,6)))
                          OVER () AS DOUBLE) AS share_global
    FROM rev ORDER BY r_name, n_name
    """,
)
def q_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's revenue as a share of its
    region and of the world. The heavy work is one fact-side
    aggregate (map-side combined, broadcast dims); both window
    denominators run over the 25-row AGGREGATED frame, so the
    'global window' that would be a scale smell on raw data is
    constant work here. Shares divide exact decimal-summed doubles:
    deterministic. The region denominator re-derives (not carries)
    so a filter pushdown upstream can't desync numerator/denominator."""
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nat = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nat), c.c_nationkey == nat.n_nationkey)
        .groupBy("r_name", "n_name")
        .agg(dsum("o_totalprice", "decimal(18,2)").alias("revenue"))
    )
    w_region = Window.partitionBy("r_name")
    w_all = Window.partitionBy()
    return rev.select(
        "r_name",
        "n_name",
        "revenue",
        (
            F.col("revenue")
            / F.sum(F.col("revenue").cast("decimal(28,6)"))
            .over(w_region)
            .cast("double")
        ).alias("share_of_region"),
        (
            F.col("revenue")
            / F.sum(F.col("revenue").cast("decimal(28,6)"))
            .over(w_all)
            .cast("double")
        ).alias("share_global"),
    ).orderBy("r_name", "n_name")


@register(
    "pagerank_similarity",
    # Fixed iteration budget → the "iterative fixpoint" objection
    # dissolves: 10 rounds unroll into 10 chained SQL CTEs with the
    # identical decimal-accumulated arithmetic (see _pagerank_oracle).
    oracle=_pagerank_oracle(k=5, n_iter=10, top=50),
)
def q_pagerank_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-centrality ranking: PageRank over the approximate
    kNN graph of document embeddings — central documents are
    canonical-copy candidates, isolated ones are quality suspects.
    Edges come from the LSH-banded kNN machinery (no all-pairs), and
    each PageRank round is an edge-join + decimal-accumulated vertex
    aggregate, so ranks are bit-identical under any partitioning.
    Returns the top 50 by rank with a deterministic (rank desc, id)
    tiebreak."""
    from etl_covid19_spark.operators.graph import pagerank
    from etl_covid19_spark.operators.similarity import knn_graph

    emb = _t(spark, sf_dir, "embeddings")
    edges = knn_graph(emb, "embedding", "vec_id", k=5).select(
        F.col("src"), F.col("dst")
    )
    ranks = pagerank(edges, n_iter=10)
    return agg.top_k(
        ranks.select(F.col("vertex").alias("vec_id"), "rank"),
        [F.col("rank").desc(), F.col("vec_id").asc()],
        50,
    )


@register(
    "quantized_centroids",
    oracle="""
    WITH ex AS (
      SELECT vec_id, i AS o, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, unnest(range(1, len(embedding) + 1)) r(i)
    ),
    s AS (
      SELECT o - 1 AS d, MIN(x) AS mn, MAX(x) AS mx
      FROM ex GROUP BY o
    ),
    qv AS (
      SELECT ex.vec_id, ex.o,
             CAST(CASE WHEN s.mx = s.mn THEN 0
                  ELSE LEAST(FLOOR((ex.x - s.mn) * CAST(255 AS DOUBLE)
                                   / (s.mx - s.mn)), 255) END AS INT) AS q
      FROM ex JOIN s ON ex.o - 1 = s.d
    ),
    qlab AS (
      SELECT qv.vec_id, qv.o, qv.q, e.label
      FROM qv JOIN embeddings e ON qv.vec_id = e.vec_id
    ),
    per AS (
      SELECT label, o,
             CAST((SUM(q) * 1000000) // COUNT(*) AS BIGINT) AS m
      FROM qlab GROUP BY label, o
    ),
    cnt AS (
      SELECT label, COUNT(*) AS n_vectors FROM embeddings GROUP BY label
    )
    SELECT p.label, c.n_vectors,
           array_to_string(list(p.m ORDER BY p.o), ',') AS centroid
    FROM per p JOIN cnt c ON p.label = c.label
    GROUP BY p.label, c.n_vectors ORDER BY p.label
    """,
)
def q_quantized_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids over int8-QUANTIZED embeddings — the
    class-prototype builder (nearest-centroid classification, cluster
    seeding, drift monitoring), chained on the scalar quantizer.
    Quantizing first is what makes the centroid exactly reproducible:
    per-dim sums of small ints are exact under any partitioning and
    any engine, where float sums are not. Dataflow: posexplode →
    (label, dim) hash aggregate (partials collapse each partition to
    |labels|·d rows pre-shuffle) → per-label array re-pack via sorted
    collect_list (bounded: d entries per group).  Output contract:
    each dim's mean leaves as an exact integer micro-mean
    (sum·10⁶ div count — integer math on both engines, so no float
    formatting drift) and the centroid array is comma-joined (the
    driver's pandas canonicalizer cannot sort ndarray cells)."""
    from etl_covid19_spark.operators.similarity import embedding_quantize_int8

    emb = _t(spark, sf_dir, "embeddings")
    q = embedding_quantize_int8(emb, "embedding", "vec_id")
    lab = emb.select("vec_id", "label")
    ex = q.join(lab, "vec_id").select(
        "label", F.posexplode("q_embedding").alias("d", "qv")
    )
    per = ex.groupBy("label", "d").agg(
        F.expr("(sum(qv) * 1000000) div count(1)").alias("m")
    )
    cnt = lab.groupBy("label").agg(F.count(F.lit(1)).alias("n_vectors"))
    cent = per.groupBy("label").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("d"), F.col("m")))
                ),
                lambda x: x["m"].cast("string"),
            ),
            ",",
        ).alias("centroid")
    )
    return (
        cent.join(F.broadcast(cnt), "label")
        .select("label", "n_vectors", "centroid")
        .orderBy("label")
    )


@register(
    "chi_square_independence",
    oracle="""
    WITH cells AS (
      SELECT user_id % 5 AS cohort, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id % 5, event_type
    ), tot AS (
      SELECT cohort, event_type, CAST(n AS DOUBLE) AS n,
             CAST(SUM(n) OVER (PARTITION BY cohort) AS DOUBLE) AS rt,
             CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE) AS ct,
             CAST(SUM(n) OVER () AS DOUBLE) AS nn
      FROM cells
    )
    SELECT
      CAST(SUM(CAST(
        (n - rt * ct / nn) * (n - rt * ct / nn) / (rt * ct / nn)
        AS DECIMAL(38,12))) AS DOUBLE) AS chi2,
      (COUNT(DISTINCT cohort) - 1) * (COUNT(DISTINCT event_type) - 1)
        AS dof
    FROM tot
    """,
)
def q_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence statistic between user cohort
    and event type — the categorical-drift / A-B-sanity primitive.
    Observed and marginal totals are exact integers (one hash
    aggregate + window sums over the |cohorts|×|types| cell frame);
    each cell's (O-E)²/E term is a pure double formula and the final
    reduction decimal-accumulates, so the statistic is bit-stable
    under any partitioning. Cell frame is tiny; nothing touches raw
    events after the first aggregate."""
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.col("user_id") % 5).alias("cohort"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w_r = Window.partitionBy("cohort")
    w_c = Window.partitionBy("event_type")
    w_all = Window.partitionBy()
    tot = cells.select(
        "cohort",
        "event_type",
        F.col("n").cast("double").alias("n"),
        F.sum("n").over(w_r).cast("double").alias("rt"),
        F.sum("n").over(w_c).cast("double").alias("ct"),
        F.sum("n").over(w_all).cast("double").alias("nn"),
    )
    e = F.col("rt") * F.col("ct") / F.col("nn")
    term = (F.col("n") - e) * (F.col("n") - e) / e
    return tot.agg(
        F.sum(term.cast("decimal(38,12)")).cast("double").alias("chi2"),
        (
            (F.countDistinct("cohort") - 1)
            * (F.countDistinct("event_type") - 1)
        ).alias("dof"),
    )


@register(
    "activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), islands AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY d
                 ) AS INTEGER) AS island
      FROM days
    ), streaks AS (
      SELECT user_id, island, COUNT(*) AS streak_len,
             MIN(d) AS streak_start
      FROM islands GROUP BY user_id, island
    ), ranked AS (
      SELECT user_id, streak_len, streak_start,
             ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY streak_len DESC, streak_start ASC
             ) AS rn
      FROM streaks
    )
    SELECT user_id, streak_len AS longest_streak, streak_start
    FROM ranked WHERE rn = 1 ORDER BY user_id
    """,
)
def q_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's LONGEST run of consecutive
    active days. The island key is the classic date-minus-row_number
    trick — consecutive days share a constant difference — so streaks
    fall out of one (user)-keyed window plus two user-grained
    aggregates; no self-join, no iteration. Distinct-day state is
    |user×days|, never raw events, and every window partitions by
    user. Ties (two equal-length streaks) break on earliest start —
    deterministic."""
    ev = _t(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "island", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len"),
        F.min("d").alias("streak_start"),
    )
    w_r = Window.partitionBy("user_id").orderBy(
        F.col("streak_len").desc(), F.col("streak_start").asc()
    )
    return (
        streaks.withColumn("rn", F.row_number().over(w_r))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("streak_len").alias("longest_streak"),
            "streak_start",
        )
        .orderBy("user_id")
    )


@register(
    "window_dist_suite",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS spend
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, spend,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           nth_value(spend, 3) OVER (
             ORDER BY spend DESC, o_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS third_highest_spend
    FROM per_cust
    WINDOW w AS (ORDER BY spend DESC, o_custkey)
    ORDER BY spend DESC, o_custkey LIMIT 100
    """,
)
def q_window_dist_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-window breadth: percent_rank / cume_dist /
    nth_value over per-customer spend. The global window is over the
    AGGREGATED per-customer frame (|customers| rows, one partial-
    combined aggregate upstream) — at 100 TB you'd partition the rank
    window by a coarse bucket and merge, but the aggregate-first
    shape is what keeps the sorted frame small. Ordering carries a
    unique tiebreak so every rank function is deterministic."""
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        dsum("o_totalprice", "decimal(18,2)").alias("spend")
    )
    w = Window.orderBy(F.col("spend").desc(), F.col("o_custkey"))
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        per_cust.select(
            "o_custkey",
            "spend",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.nth_value("spend", 3).over(w_full).alias("third_highest_spend"),
        )
        .orderBy(F.col("spend").desc(), "o_custkey")
        .limit(100)
    )


@register(
    "window_dist_scaled",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS spend
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, spend,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           nth_value(spend, 3) OVER (
             ORDER BY spend DESC, o_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS third_highest_spend
    FROM per_cust
    WINDOW w AS (ORDER BY spend DESC, o_custkey)
    ORDER BY spend DESC, o_custkey LIMIT 100
    """,
)
def q_window_dist_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale twin of `window_dist_suite`, promoted per VERDICT r2 #2:
    the SAME oracle (percent_rank / cume_dist / nth_value over
    per-customer spend), computed WITHOUT the global unpartitioned
    window — `operators.aggregates.distributed_rank` buckets the
    domain by sketch cut points, ranks within buckets, and merges
    via broadcast offsets. Cut precision only balances work, never
    changes output, so this form is EXACT at every scale while the
    biggest sorted run is one bucket (n/64) instead of n. The exact
    global-window form is retained as the tiny-SF cross-check."""
    from etl_covid19_spark.operators.aggregates import distributed_rank

    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        dsum("o_totalprice", "decimal(18,2)").alias("spend")
    )
    ranked = distributed_rank(per_cust, "spend", "o_custkey")
    third = ranked.agg(
        F.max(F.when(F.col("_pos") == 3, F.col("spend"))).alias("_third")
    )
    return (
        ranked.crossJoin(F.broadcast(third))
        .select(
            "o_custkey",
            "spend",
            F.when(
                F.col("_n") > 1,
                (F.col("_pos") - 1).cast("double") / (F.col("_n") - 1),
            )
            .otherwise(F.lit(0.0))
            .alias("pct_rank"),
            (F.col("_pos").cast("double") / F.col("_n")).alias("cume"),
            F.col("_third").alias("third_highest_spend"),
        )
        .orderBy(F.col("spend").desc(), "o_custkey")
        .limit(100)
    )


@register(
    "agg_predicates",
    oracle="""
    SELECT l_returnflag,
           CAST(count_if(l_quantity > 25.0) AS BIGINT) AS n_bulk,
           bool_and(l_extendedprice > 0.0) AS all_priced,
           bool_or(l_discount > 0.09) AS any_deep_discount,
           CAST(COUNT(CASE WHEN l_tax = 0.0 THEN 1 END) AS BIGINT)
             AS n_tax_free
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q_agg_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate-aggregate breadth: count_if / bool_and / bool_or /
    conditional COUNT — the data-quality assertion aggregates
    (completeness and invariant checks as ONE pass over the fact,
    all map-side combined). Deterministic by construction: booleans
    and counts carry no float accumulation."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_if(F.col("l_quantity") > 25.0).alias("n_bulk"),
            F.bool_and(F.col("l_extendedprice") > 0.0).alias("all_priced"),
            F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
            F.count(
                F.when(F.col("l_tax") == 0.0, F.lit(1))
            ).alias("n_tax_free"),
        )
        .orderBy("l_returnflag")
    )


def _split_bucket(doc_id: Column) -> Column:
    """Overflow-free Knuth multiplicative split bucket in [0, 100).

    `id % 2^31` first keeps the product under 2^63 (ANSI-safe at any
    corpus scale); DuckDB oracle twin:
    ``(((doc_id % 2147483648) * 2654435761) % 4294967296) % 100``.
    Assumes non-negative ids (all zone surrogate keys are)."""
    return (
        ((doc_id % F.lit(2147483648)) * F.lit(2654435761))
        % F.lit(4294967296)
    ) % F.lit(100)


@register(
    "dataset_split",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             (((doc_id % 2147483648) * 2654435761) % 4294967296) % 100
               AS bucket
      FROM documents
    )
    SELECT doc_id, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM h ORDER BY doc_id
    """,
)
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test assignment via a
    Knuth multiplicative hash on the document id — pure integer
    arithmetic, so the SAME document lands in the SAME split on any
    engine, any cluster size, any rerun (the reproducibility property
    `rand()`-based splitting silently lacks, and the reason eval
    contamination audits are possible at all). Map-side only: no
    shuffle, no state. The id is reduced mod 2^31 BEFORE the
    multiply so the intermediate ((2^31-1)·2654435761 ≈ 5.7e18)
    stays inside int64 — the naive `doc_id * 2654435761` overflows
    (throws under ANSI mode) for doc_id ≳ 3.47e9, i.e. exactly at
    the corpus scale the split serves. Buckets are unchanged for
    any doc_id < 2^31."""
    docs = _t(spark, sf_dir, "documents")
    bucket = _split_bucket(F.col("doc_id"))
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(F.col("bucket") < 80, "train")
        .when(F.col("bucket") < 90, "valid")
        .otherwise("test")
        .alias("split"),
    ).orderBy("doc_id")


@register(
    "split_leakage",
    oracle="""
    WITH h AS (
      SELECT doc_id, text,
             CASE WHEN (((doc_id % 2147483648) * 2654435761)
                        % 4294967296) % 100 < 80
                  THEN 'train'
                  WHEN (((doc_id % 2147483648) * 2654435761)
                        % 4294967296) % 100 < 90
                  THEN 'valid' ELSE 'test' END AS split
      FROM documents
    ), groups AS (
      SELECT text, COUNT(*) AS n_copies,
             COUNT(DISTINCT split) AS n_splits
      FROM h GROUP BY text HAVING COUNT(*) > 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS dup_groups,
           CAST(COUNT(CASE WHEN n_splits > 1 THEN 1 END) AS BIGINT)
             AS leaking_groups,
           CAST(COALESCE(SUM(CASE WHEN n_splits > 1 THEN n_copies END), 0)
                AS BIGINT) AS leaking_docs
    FROM groups
    """,
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage audit: duplicate-text groups whose members span
    MORE THAN ONE split — the eval-contamination failure mode a
    random per-doc split guarantees at corpus scale (duplicates land
    in train AND test). One text-keyed aggregate (at 100 TB, key on
    xxhash64(text) as the dedup family does); the split assignment is
    the same arithmetic hash as `dataset_split`, so the audit is
    reproducible anywhere. The fix this audit motivates: split by
    CLUSTER representative (dedup_clusters), not by raw doc."""
    docs = _t(spark, sf_dir, "documents")
    bucket = _split_bucket(F.col("doc_id"))
    h = docs.select(
        "text",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )
    groups = (
        h.groupBy("text")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("split").alias("n_splits"),
        )
        .where(F.col("n_copies") > 1)
    )
    return groups.agg(
        F.count(F.lit(1)).alias("dup_groups"),
        F.count(F.when(F.col("n_splits") > 1, F.lit(1))).alias(
            "leaking_groups"
        ),
        F.coalesce(
            F.sum(F.when(F.col("n_splits") > 1, F.col("n_copies"))),
            F.lit(0),
        ).cast("long").alias("leaking_docs"),
    )


@register(
    "equidepth_histogram",
    oracle="""
    WITH ranked AS (
      SELECT value, ntile(10) OVER (ORDER BY value, event_id) AS tile
      FROM events
    )
    SELECT tile, COUNT(*) AS n_rows,
           MIN(value) AS lo, MAX(value) AS hi,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM ranked GROUP BY tile ORDER BY tile
    """,
)
def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (decile buckets of equal row count) — the
    other profiling primitive next to the equi-width one
    (`value_histogram`), and the substrate for optimizer-style
    selectivity estimation. ntile carries a unique (value, event_id)
    tiebreak so bucket membership is total-order deterministic.
    Scale note: a global ntile sorts — fine at bucket-able sizes;
    at 100 TB swap in approx_percentile cut points + the closed-form
    binning of value_histogram (same output contract, no global
    sort). The exact form here IS the oracle for that swap."""
    ev = _t(spark, sf_dir, "events")
    w = Window.orderBy("value", "event_id")
    ranked = ev.select(
        "value", F.ntile(10).over(w).alias("tile")
    )
    return (
        ranked.groupBy("tile")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            dsum("value", "decimal(18,4)").alias("sum_value"),
        )
        .orderBy("tile")
    )


@register(
    "equidepth_histogram_sketch",
    oracle="""
    WITH nn AS (SELECT COUNT(*) AS n FROM events),
    o AS (
      SELECT value, row_number() OVER (ORDER BY value) AS rn FROM events
    ),
    c AS (
      SELECT list(o.value ORDER BY o.rn) AS cs
      FROM o, nn
      WHERE o.rn IN (
        SELECT CAST(ceil(i.range * nn.n / 10.0) AS BIGINT)
        FROM range(1, 10) i, nn
      )
    )
    SELECT CAST(len(list_filter(c.cs, x -> e.value >= x)) AS INT) AS bin,
           COUNT(*) AS n_rows,
           MIN(e.value) AS lo,
           MAX(e.value) AS hi
    FROM events e, c
    GROUP BY 1 ORDER BY bin
    """,
)
def q_equidepth_histogram_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promoted scale twin of `equidepth_histogram` (VERDICT r2 #2):
    decile buckets WITHOUT the global ntile sort —
    `timeseries.equidepth_bins_approx` takes t-digest/GK cut points
    from `approx_percentile` (mergeable sketch, map-side combined)
    and bins with a broadcast closed form. The oracle re-derives the
    cut points by explicit rank arithmetic: `percentile_approx`
    returns the smallest value whose rank/n ≥ p, i.e. the value at
    rank ceil(p·n) — EXACT whenever n ≤ accuracy (verified both rank
    conventions and DuckDB's quantile_disc agree at test SFs), so
    the compare is hash-exact here while the operator stays a sketch
    (±n/accuracy ranks) at 100 TB, where the exact ntile form cannot
    run at all. Above the compression threshold the exact-rank
    oracle diverges BY DESIGN — the sf1 differential (DIFF_sf1.json,
    1M events vs accuracy=100k) recorded the expected sub-0.1%-rank
    boundary drift; the approximate regime's contract is the GK rank
    bound, pinned in tests/test_statistics.py::
    test_equidepth_approx_error_bound_above_compression_threshold.
    Bucket edges differ from ntile's by design: binning
    is by VALUE cuts (ties share a bucket), the property selectivity
    estimation actually wants."""
    from etl_covid19_spark.operators import timeseries as ts

    ev = _t(spark, sf_dir, "events")
    return (
        ts.equidepth_bins_approx(ev, "value", n_bins=10, accuracy=100_000)
        .orderBy("bin")
    )


@register(
    "correlation_matrix",
    oracle="""
    WITH m AS (
      SELECT
        CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS s1,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) AS s2,
        CAST(SUM(CAST(l_discount AS DECIMAL(38,8))) AS DOUBLE) AS s3,
        CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS s11,
        CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) AS s22,
        CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(38,8))) AS DOUBLE) AS s33,
        CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) AS s12,
        CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(38,8))) AS DOUBLE) AS s13,
        CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,8))) AS DOUBLE) AS s23
      FROM lineitem
    )
    SELECT pair, corr FROM (
      SELECT 'quantity~extendedprice' AS pair,
             (n*s12 - s1*s2) / (sqrt(n*s11 - s1*s1) * sqrt(n*s22 - s2*s2)) AS corr, 1 AS ord
      FROM m
      UNION ALL
      SELECT 'quantity~discount',
             (n*s13 - s1*s3) / (sqrt(n*s11 - s1*s1) * sqrt(n*s33 - s3*s3)), 2
      FROM m
      UNION ALL
      SELECT 'extendedprice~discount',
             (n*s23 - s2*s3) / (sqrt(n*s22 - s2*s2) * sqrt(n*s33 - s3*s3)), 3
      FROM m
    ) ORDER BY ord
    """,
)
def q_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise correlation matrix over three measures from ONE pass:
    a single scalar aggregate collects all 9 decimal-exact moment
    sums (the built-in route runs one corr() pass per pair — 3 scans
    here, 45 at 10 columns), then every pairwise correlation is a
    pure double formula over identical operands — deterministic and
    engine-portable, same contract as `stats_kit`."""
    li = _t(spark, sf_dir, "lineitem")
    dec = "decimal(38,8)"
    c1, c2, c3 = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")

    def s(col, name):
        return F.sum(col.cast(dec)).cast("double").alias(name)

    m = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        s(c1, "s1"), s(c2, "s2"), s(c3, "s3"),
        s(c1 * c1, "s11"), s(c2 * c2, "s22"), s(c3 * c3, "s33"),
        s(c1 * c2, "s12"), s(c1 * c3, "s13"), s(c2 * c3, "s23"),
    )

    def corr_expr(sa, sb, saa, sbb, sab):
        n = F.col("n")
        return (n * F.col(sab) - F.col(sa) * F.col(sb)) / (
            F.sqrt(n * F.col(saa) - F.col(sa) * F.col(sa))
            * F.sqrt(n * F.col(sbb) - F.col(sb) * F.col(sb))
        )

    pairs = [
        ("quantity~extendedprice", corr_expr("s1", "s2", "s11", "s22", "s12")),
        ("quantity~discount", corr_expr("s1", "s3", "s11", "s33", "s13")),
        ("extendedprice~discount", corr_expr("s2", "s3", "s22", "s33", "s23")),
    ]
    # ONE reference to the aggregate: explode an array of structs
    # (a unionByName of per-pair selects would recompute the full
    # moments scan once per pair — the exact waste this op removes)
    return m.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("pair"), expr.alias("corr")
                    )
                    for name, expr in pairs
                ]
            )
        ).alias("kv")
    ).select("kv.pair", "kv.corr")


@register(
    "seasonal_baseline",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), season AS (
      SELECT event_type, EXTRACT(hour FROM bucket_ts) AS hod,
             CAST(SUM(CAST(v AS DECIMAL(38,8))) AS DOUBLE) AS sv,
             COUNT(*) AS nh
      FROM hourly GROUP BY event_type, EXTRACT(hour FROM bucket_ts)
    )
    SELECT h.event_type, h.bucket_ts, h.v,
           s.sv / s.nh AS seasonal_mean,
           h.v - s.sv / s.nh AS residual
    FROM hourly h
    JOIN season s
      ON h.event_type = s.event_type
     AND EXTRACT(hour FROM h.bucket_ts) = s.hod
    ORDER BY h.event_type, h.bucket_ts
    """,
)
def q_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal decomposition, the simplest honest form: each hourly
    bucket's value against its (event_type, hour-of-day) seasonal
    mean, residual = value − baseline — what turns a daily-rhythm
    metric into something the z-score detector can threshold without
    flagging every evening peak. Two bucket-grained aggregates and a
    broadcast-able (|types|×24)-row profile joined back; the seasonal
    mean divides decimal-exact sums, so residuals are deterministic.
    Raw events are touched once."""
    from etl_covid19_spark.operators import timeseries as ts
    from etl_covid19_spark.operators.df_cache import SHARED_CACHE, corpus_key

    ev = _t(spark, sf_dir, "events")
    hourly = SHARED_CACHE.get_or_build(
        ("bucket_agg_hour", "event_type", "value", *corpus_key(ev)),
        lambda: ts.bucket_aggregate(ev, "event_type", "ts", "value"),
    ).select("event_type", "bucket_ts", F.col("_sum").alias("v"))
    season = hourly.groupBy(
        "event_type", F.hour("bucket_ts").alias("hod")
    ).agg(
        F.sum(F.col("v").cast("decimal(38,8)")).cast("double").alias("sv"),
        F.count(F.lit(1)).alias("nh"),
    )
    mean = F.col("sv") / F.col("nh")
    return (
        hourly.withColumn("hod", F.hour("bucket_ts"))
        .join(F.broadcast(season), ["event_type", "hod"])
        .select(
            "event_type",
            "bucket_ts",
            "v",
            mean.alias("seasonal_mean"),
            (F.col("v") - mean).alias("residual"),
        )
        .orderBy("event_type", "bucket_ts")
    )


@register(
    "anomaly_seasonal_adjusted",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), season AS (
      SELECT event_type, EXTRACT(hour FROM bucket_ts) AS hod,
             CAST(SUM(CAST(v AS DECIMAL(38,8))) AS DOUBLE) AS sv,
             COUNT(*) AS nh
      FROM hourly GROUP BY event_type, EXTRACT(hour FROM bucket_ts)
    ), resid AS (
      SELECT h.event_type, h.bucket_ts,
             h.v - s.sv / s.nh AS r
      FROM hourly h
      JOIN season s ON h.event_type = s.event_type
                   AND EXTRACT(hour FROM h.bucket_ts) = s.hod
    ), scan AS (
      SELECT event_type, bucket_ts, r,
             CAST(COUNT(r) OVER w AS DOUBLE) AS n,
             CAST(SUM(CAST(r AS DECIMAL(38,8))) OVER w AS DOUBLE) AS sx,
             CAST(SUM(CAST(r * r AS DECIMAL(38,8))) OVER w AS DOUBLE) AS sxx
      FROM resid
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, bucket_ts, r AS residual,
           CASE WHEN n >= 12 AND sqrt(n * sxx - sx * sx) / n > 0
                THEN (r - sx / n) / (sqrt(n * sxx - sx * sx) / n)
           END AS zscore,
           CASE WHEN n >= 12 AND sqrt(n * sxx - sx * sx) / n > 0
                THEN abs((r - sx / n) / (sqrt(n * sxx - sx * sx) / n)) > 3.0
           END AS is_anomaly
    FROM scan ORDER BY event_type, bucket_ts
    """,
)
def q_anomaly_seasonal_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator COMPOSITION: z-score anomaly detection over
    seasonally-ADJUSTED residuals — the production shape (raw-value
    z-scores alarm on every evening peak; residual z-scores alarm on
    departures from the rhythm). Chains `bucket_aggregate` (cached,
    shared with gap-fill/seasonal) → seasonal profile join →
    `rolling_zscore` unchanged on the residual column. Everything
    downstream of the one events scan is bucket-grained."""
    from etl_covid19_spark.operators import timeseries as ts
    from etl_covid19_spark.operators.df_cache import SHARED_CACHE, corpus_key

    ev = _t(spark, sf_dir, "events")
    hourly = SHARED_CACHE.get_or_build(
        ("bucket_agg_hour", "event_type", "value", *corpus_key(ev)),
        lambda: ts.bucket_aggregate(ev, "event_type", "ts", "value"),
    ).select("event_type", "bucket_ts", F.col("_sum").alias("v"))
    season = hourly.groupBy(
        "event_type", F.hour("bucket_ts").alias("hod")
    ).agg(
        F.sum(F.col("v").cast("decimal(38,8)")).cast("double").alias("sv"),
        F.count(F.lit(1)).alias("nh"),
    )
    resid = (
        hourly.withColumn("hod", F.hour("bucket_ts"))
        .join(F.broadcast(season), ["event_type", "hod"])
        .select(
            "event_type",
            "bucket_ts",
            (F.col("v") - F.col("sv") / F.col("nh")).alias("r"),
        )
    )
    out = ts.rolling_zscore(resid, "event_type", "bucket_ts", "r", 24, 12, 3.0)
    return out.select(
        "event_type",
        "bucket_ts",
        F.col("r").alias("residual"),
        "zscore",
        "is_anomaly",
    ).orderBy("event_type", "bucket_ts")


@register(
    "unique_key_audit",
    oracle="""
    WITH dups AS (
      SELECT l_orderkey, l_linenumber, COUNT(*) AS n
      FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1
    )
    SELECT (SELECT COUNT(*) FROM lineitem) AS n_rows,
           (SELECT COUNT(*)
            FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem))
             AS n_keys,
           (SELECT COUNT(*) FROM dups) AS violating_keys,
           CAST(COALESCE((SELECT SUM(n) FROM dups), 0) AS BIGINT)
             AS violating_rows
    """,
)
def q_unique_key_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit for the fact's composite key —
    the data-quality check every load should run before publishing
    (the reference trusts its source blindly; quirk family). One
    key-grained aggregate feeds all four measures; no self-join. A
    healthy table reports violating_keys = 0 and n_rows = n_keys."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    per_key = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.count(F.lit(1)).alias("n")
    )
    return per_key.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.count(F.when(F.col("n") > 1, F.lit(1))).alias("violating_keys"),
        F.coalesce(
            F.sum(F.when(F.col("n") > 1, F.col("n"))), F.lit(0)
        ).cast("long").alias("violating_rows"),
    )


@register(
    "key_skew_report",
    oracle="""
    WITH per_key AS (
      SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
    ), tot AS (
      SELECT CAST(SUM(n) AS DOUBLE) AS total,
             CAST(COUNT(*) AS DOUBLE) AS n_keys
      FROM per_key
    )
    SELECT p.o_custkey, p.n,
           CAST(p.n AS DOUBLE) / t.total AS share,
           CAST(p.n AS DOUBLE) / (t.total / t.n_keys) AS x_mean
    FROM per_key p CROSS JOIN tot t
    ORDER BY p.n DESC, p.o_custkey LIMIT 20
    """,
)
def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter diagnostics: the 20 hottest join/groupBy keys
    with their share of total rows and multiple-of-mean — the report
    you run BEFORE a big join to decide between plain shuffle, AQE
    skew split, and explicit salting (`skew_salted_join`). One
    key-grained aggregate + a one-row stats broadcast + top-k; at
    100 TB the per-key frame is the only shuffle and the hot keys it
    surfaces are exactly the ones that would have made that shuffle
    pathological."""
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    per_key = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    tot = per_key.agg(
        F.sum("n").cast("double").alias("total"),
        F.count(F.lit(1)).cast("double").alias("n_keys"),
    )
    nd = F.col("n").cast("double")
    return agg.top_k(
        per_key.crossJoin(F.broadcast(tot)).select(
            "o_custkey",
            "n",
            (nd / F.col("total")).alias("share"),
            (nd / (F.col("total") / F.col("n_keys"))).alias("x_mean"),
        ),
        [F.col("n").desc(), F.col("o_custkey").asc()],
        20,
    )


# --------------------------------------------------------------------
# model-based corpus curation (operators/curation.py) + the IVF-PQ /
# SemDeDup completions of the ANN/semantic-dedup family
# --------------------------------------------------------------------

from etl_covid19_spark.operators import curation as CUR  # noqa: E402

_CLF_WEIGHTS_SQL = "[" + ", ".join(repr(x) for x in CUR.make_classifier_weights()) + "]"

_CLF_ORACLE = f"""
    WITH w AS (SELECT CAST({_CLF_WEIGHTS_SQL} AS DOUBLE[]) AS wl),
    t AS (
      SELECT doc_id, lang,
             list_transform(
               list_filter(regexp_split_to_array(trim(text), '\\s+'),
                           x -> x <> ''),
               tk -> CAST((ascii(substr(tk, 1, 1)) * 1000 + length(tk)) % 64
                          AS BIGINT)) AS b
      FROM documents
    ),
    f AS (
      SELECT doc_id, lang,
             list_concat(b,
               CASE WHEN len(b) >= 2
                    THEN list_transform(
                           list_zip(b[1:len(b)-1], b[2:len(b)]),
                           p -> (struct_extract(p, 1) * 31
                                 + struct_extract(p, 2)) % 64)
                    ELSE CAST([] AS BIGINT[]) END) AS feats
      FROM t
    ),
    s AS (
      SELECT doc_id, lang, len(feats) AS n_features,
             CASE WHEN len(feats) > 0
                  THEN list_reduce(
                         list_prepend(0.0,
                           list_transform(feats,
                             ff -> wl[CAST(ff AS INT) + 1])),
                         (x, y) -> x + y) / len(feats)
                  ELSE 0.0 END AS mean_w
      FROM f CROSS JOIN w
    )
    SELECT doc_id, lang, CAST(n_features AS INT) AS n_features,
           round(1.0 / (1.0 + exp(-(0.25 + mean_w))), 6) AS score,
           1.0 / (1.0 + exp(-(0.25 + mean_w))) >= 0.5 AS keep
    FROM s
    """


@register("quality_classifier", oracle=_CLF_ORACLE)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-shaped hashed-n-gram linear quality classifier
    (Joulin et al. 2016): unigram+bigram buckets → literal weight
    array lookup → mean → sigmoid — the learned quality-filter
    architecture as a zero-shuffle map-side Catalyst expression.
    Weights here are deterministic LCG stand-ins; a trained model
    ships the same way (a K-float literal)."""
    d = _t(spark, sf_dir, "documents")
    return CUR.with_classifier_score(d, "text").select(
        "doc_id",
        "lang",
        "n_features",
        F.round("_score_raw", 6).alias("score"),
        (F.col("_score_raw") >= 0.5).alias("keep"),
    )


@register("quality_classifier_arrow", oracle=_CLF_ORACLE, headline=True)
def q_quality_classifier_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same classifier through the Arrow kernel
    (`curation.classifier_scores_arrow`) — the default/benched path:
    Catalyst HOFs are CodegenFallback, so the pure-Column form pays
    per-row interpreter cost (5.6 s at sf1); the RE2+numpy kernel
    does the identical arithmetic batch-at-a-time and is bit-exact
    against both the HOF form (parity-tested) and this shared
    oracle. `quality_classifier` stays registered as the engine-pure
    cross-check — the same twin pattern as embedding_near_dup."""
    d = _t(spark, sf_dir, "documents")
    return CUR.classifier_scores_arrow(d, "text", ["doc_id", "lang"]).select(
        "doc_id",
        "lang",
        "n_features",
        F.round("_score_raw", 6).alias("score"),
        (F.col("_score_raw") >= 0.5).alias("keep"),
    )


@register(
    "unigram_lm_perplexity",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                x -> x <> '')) AS token
      FROM documents
    ),
    dt AS (SELECT doc_id, token, count(*) AS n FROM t GROUP BY doc_id, token),
    v AS (SELECT token, sum(n) AS cnt FROM dt GROUP BY token),
    s AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n_total,
                 CAST(count(*) AS DOUBLE) AS vsz
          FROM v),
    d AS (
      SELECT dt.doc_id,
             CAST(sum(dt.n) AS BIGINT) AS n_tokens,
             CAST(sum(CAST(dt.n * -ln((CAST(v.cnt AS DOUBLE) + 0.5)
                                      / (s.n_total + 0.5 * s.vsz))
                           AS DECIMAL(28,18))) AS DOUBLE) AS h_sum
      FROM dt JOIN v USING (token) CROSS JOIN s
      GROUP BY dt.doc_id
    )
    SELECT doc_id, n_tokens,
           round(h_sum / n_tokens, 6) AS cross_entropy,
           round(exp(h_sum / n_tokens), 6) AS perplexity
    FROM d
    """,
)
def q_unigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM-perplexity filter (Wenzek et al. 2020) with the
    LM trained in-engine: add-0.5-smoothed unigram model over the
    corpus, per-doc cross-entropy and perplexity. One explode, two
    map-side-partial aggregations, one vocab equi-join; the exact
    DECIMAL accumulation makes the statistic partition-invariant
    (same contract as `exact_moments`)."""
    return CUR.unigram_perplexity(
        _t(spark, sf_dir, "documents"), "text", "doc_id"
    )


@register(
    "semantic_dedup",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
    ec AS (
      SELECT e.vec_id, c.cid,
             list_reduce(list_transform(list_zip(e.v, c.cv),
                         p -> struct_extract(p, 1) * struct_extract(p, 2)),
                         (x, y) -> x + y)
             / (sqrt(list_reduce(list_transform(e.v, x -> x * x), (x, y) -> x + y))
                * sqrt(list_reduce(list_transform(c.cv, x -> x * x), (x, y) -> x + y)))
               AS cos
      FROM e CROSS JOIN c
    ),
    assign AS (
      SELECT vec_id, cid AS cluster_id, cos AS cent_cos
      FROM (SELECT vec_id, cid, cos,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY cos DESC, cid DESC) AS rn
            FROM ec)
      WHERE rn = 1
    ),
    pairs AS (
      SELECT a.vec_id AS i, b.vec_id AS j,
             a.cent_cos AS ci, b.cent_cos AS cj,
             list_reduce(list_transform(list_zip(ei.v, ej.v),
                         p -> struct_extract(p, 1) * struct_extract(p, 2)),
                         (x, y) -> x + y)
             / (sqrt(list_reduce(list_transform(ei.v, x -> x * x), (x, y) -> x + y))
                * sqrt(list_reduce(list_transform(ej.v, x -> x * x), (x, y) -> x + y)))
               AS cos
      FROM assign a
      JOIN assign b ON a.cluster_id = b.cluster_id AND a.vec_id <> b.vec_id
      JOIN e ei ON ei.vec_id = a.vec_id
      JOIN e ej ON ej.vec_id = b.vec_id
    ),
    dropped AS (
      SELECT DISTINCT j AS vec_id FROM pairs
      WHERE cos > 0.40 AND (ci > cj OR (ci = cj AND i < j))
    )
    SELECT a.vec_id, a.cluster_id, round(a.cent_cos, 6) AS cent_cos,
           d.vec_id IS NULL AS keep
    FROM assign a LEFT JOIN dropped d USING (vec_id)
    """,
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023): coarse
    cluster, prune near-duplicates within clusters only — pairwise
    work is Sigma cluster-squared, never corpus-squared. One row per
    vector with its cluster, centroid cosine, and keep flag."""
    from etl_covid19_spark.operators.similarity import semantic_dedup

    return semantic_dedup(
        _t(spark, sf_dir, "embeddings"), "embedding", "vec_id",
        n_clusters=8, threshold=0.40,
    )


@register(
    "ann_ivf_pq_topk",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
    ec AS (
      SELECT e.vec_id, c.cid,
             list_reduce(list_transform(list_zip(e.v, c.cv),
                         p -> struct_extract(p, 1) * struct_extract(p, 2)),
                         (x, y) -> x + y)
             / (sqrt(list_reduce(list_transform(e.v, x -> x * x), (x, y) -> x + y))
                * sqrt(list_reduce(list_transform(c.cv, x -> x * x), (x, y) -> x + y)))
               AS cos
      FROM e CROSS JOIN c
    ),
    assign AS (
      SELECT vec_id AS neighbor_id, cid AS bucket
      FROM (SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY cos DESC, cid DESC) AS rn
            FROM ec)
      WHERE rn = 1
    ),
    probe AS (
      SELECT vec_id AS query_id, cid AS bucket
      FROM (SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY cos DESC, cid DESC) AS rn
            FROM ec WHERE vec_id BETWEEN 8 AND 15)
      WHERE rn <= 2
    ),
    seeds AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS p, v
      FROM e WHERE vec_id < 16
    ),
    cb AS (
      SELECT s.s, seeds.p,
             list_slice(seeds.v, s.s * 8 + 1, s.s * 8 + 8) AS cv
      FROM seeds CROSS JOIN range(8) s(s)
    ),
    subd AS (
      SELECT e.vec_id, cb.s, cb.p,
             list_reduce(
               list_prepend(0.0,
                 list_transform(
                   list_zip(list_slice(e.v, cb.s * 8 + 1, cb.s * 8 + 8), cb.cv),
                   pr -> (struct_extract(pr, 1) - struct_extract(pr, 2))
                         * (struct_extract(pr, 1) - struct_extract(pr, 2)))),
               (x, y) -> x + y) AS dist
      FROM e CROSS JOIN cb
    ),
    codes AS (
      SELECT vec_id, s, p AS code
      FROM (SELECT vec_id, s, p,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, s
                        ORDER BY dist ASC, p ASC) AS rn
            FROM subd)
      WHERE rn = 1
    ),
    adc AS (
      SELECT pr.query_id, a.neighbor_id,
             CAST(sum(CAST(qd.dist AS DECIMAL(28,18))) AS DOUBLE) AS adc
      FROM probe pr
      JOIN assign a ON pr.bucket = a.bucket AND pr.query_id <> a.neighbor_id
      JOIN codes n ON n.vec_id = a.neighbor_id
      JOIN subd qd ON qd.vec_id = pr.query_id AND qd.s = n.s AND qd.p = n.code
      GROUP BY pr.query_id, a.neighbor_id
    )
    SELECT query_id, neighbor_id, rank, round(adc, 6) AS adc
    FROM (SELECT query_id, neighbor_id,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY adc ASC, neighbor_id ASC) AS INT) AS rank,
                 adc
          FROM adc)
    WHERE rank <= 10
    """,
    headline=True,
)
def q_ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate top-k (Jegou et al. 2011): coarse IVF
    probing + product-quantized codes ranked by asymmetric distance
    (per-query m-by-ks lookup table, m element_at fetches per
    candidate). The ADC accumulation is exact DECIMAL on both sides
    so group-order can never flip a rank."""
    from etl_covid19_spark.operators.similarity import ivf_pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_pq_topk(
        emb,
        emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 16)),
        "embedding", "vec_id",
        k=10, n_centroids=8, n_probe=2, m=8, ks=16, dim=64,
    )


@register(
    "dsir_importance",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             list_transform(
               list_filter(regexp_split_to_array(trim(text), '\\s+'),
                           x -> x <> ''),
               tk -> CAST((ascii(substr(tk, 1, 1)) * 1000 + length(tk)) % 64
                          AS BIGINT)) AS b
      FROM documents
    ),
    x AS (SELECT doc_id, lang, unnest(b) AS f FROM t),
    counts AS (
      SELECT f, count(*) AS cr,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
      FROM x GROUP BY f
    ),
    tot AS (
      SELECT CAST(sum(cr) AS DOUBLE) AS nr, CAST(sum(ct) AS DOUBLE) AS nt
      FROM counts
    ),
    w AS (
      SELECT f,
             ln((ct + 0.5) / (nt + 0.5 * 64))
             - ln((cr + 0.5) / (nr + 0.5 * 64)) AS lam
      FROM counts CROSS JOIN tot
    ),
    d AS (
      SELECT x.doc_id, sum(w.lam) AS s
      FROM x JOIN w USING (f)
      GROUP BY x.doc_id
    )
    SELECT t.doc_id, t.lang, CAST(len(t.b) AS INT) AS n_features,
           round(COALESCE(d.s, 0.0), 6) + 0.0 AS log_importance
    FROM t LEFT JOIN d USING (doc_id)
    """,
)
def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weighting (Xie et al. 2023) with lang='en' as
    the target domain: hashed-unigram importance model learned in one
    conditional aggregate, per-doc log-importance scored map-side
    against the collected k-entry weight array (zero shuffle)."""
    d = _t(spark, sf_dir, "documents")
    return CUR.dsir_importance(
        d, "text", "doc_id",
        target=F.col("lang") == "en",
        keep_cols=("lang",),
    )


@register(
    "gopher_quality_filter",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(trim(text), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             list_reduce(list_prepend(0, list_transform(toks, x -> length(x))),
                         (a, b) -> a + b)
               / greatest(len(toks), 1) AS mean_word_len,
             ((length(text) - length(replace(text, '#', '')))
              + (length(text) - length(replace(text, '...', ''))) / 3)
               / greatest(len(toks), 1) AS symbol_ratio,
             len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
               / greatest(len(toks), 1) AS alpha_word_frac,
             len(list_intersect(
                   list_distinct(list_transform(toks, x -> lower(x))),
                   ['the','be','to','of','and','that','have','with']))
               AS n_stop_distinct
      FROM t
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(mean_word_len, 6) AS mean_word_len,
           round(symbol_ratio, 6) AS symbol_ratio,
           round(alpha_word_frac, 6) AS alpha_word_frac,
           CAST(n_stop_distinct AS INT) AS n_stop_distinct,
           (n_tokens BETWEEN 50 AND 100000)
           AND (mean_word_len BETWEEN 3 AND 10)
           AND (symbol_ratio <= 0.1)
           AND (alpha_word_frac >= 0.8)
           AND (n_stop_distinct >= 2) AS pass
    FROM m
    """,
)
def q_gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher document-level quality rule bundle (Rae et al.
    2021, §A1.1): word-count bounds, mean-word-length bounds,
    symbol-to-word ratio, alphabetic-word fraction, and stop-word
    presence, each surfaced as its metric plus a composite pass
    flag. (The repetition rules of the same appendix live in
    `repetition_signals`.) Still a zero-shuffle map scan at any
    corpus size — the rule COUNTS come out of the Arrow counting
    kernel (`text.quality_counts_arrow(with_gopher=True)`, the same
    HOF-vs-kernel swap as `text_quality_arrow`: exact integers from
    the kernel, every division/round replayed Spark-side by
    `text.gopher_from_counts`), which took the sf10 scan from 38 s
    of interpreted HOFs to kernel cost; `curation.gopher_metrics`
    stays the engine-pure cross-check."""
    d = _t(spark, sf_dir, "documents")
    staged = text.quality_counts_arrow(
        d, ["doc_id"], "text", with_gopher=True
    )
    m = text.gopher_from_counts()
    return staged.select(
        "doc_id",
        m["n_tokens"].cast("bigint").alias("n_tokens"),
        F.round(m["mean_word_len"], 6).alias("mean_word_len"),
        F.round(m["symbol_ratio"], 6).alias("symbol_ratio"),
        F.round(m["alpha_word_frac"], 6).alias("alpha_word_frac"),
        m["n_stop_distinct"].cast("int").alias("n_stop_distinct"),
        m["pass"].alias("pass"),
    )


@register(
    "streaming_quality_filter",
    oracle=f"""
    WITH w AS (SELECT CAST({_CLF_WEIGHTS_SQL} AS DOUBLE[]) AS wl),
    t AS (
      SELECT doc_id,
             list_transform(
               list_filter(regexp_split_to_array(trim(text), '\\s+'),
                           x -> x <> ''),
               tk -> CAST((ascii(substr(tk, 1, 1)) * 1000 + length(tk)) % 64
                          AS BIGINT)) AS b
      FROM documents
    ),
    f AS (
      SELECT doc_id,
             list_concat(b,
               CASE WHEN len(b) >= 2
                    THEN list_transform(
                           list_zip(b[1:len(b)-1], b[2:len(b)]),
                           p -> (struct_extract(p, 1) * 31
                                 + struct_extract(p, 2)) % 64)
                    ELSE CAST([] AS BIGINT[]) END) AS feats
      FROM t
    ),
    s AS (
      SELECT doc_id,
             CASE WHEN len(feats) > 0
                  THEN list_reduce(
                         list_prepend(0.0,
                           list_transform(feats,
                             ff -> wl[CAST(ff AS INT) + 1])),
                         (x, y) -> x + y) / len(feats)
                  ELSE 0.0 END AS mean_w
      FROM f CROSS JOIN w
    )
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-(0.25 + mean_w))), 6) AS score,
           1.0 / (1.0 + exp(-(0.25 + mean_w))) >= 0.5 AS keep
    FROM s
    """,
)
def q_streaming_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus curation, executed as a REAL stream: the
    hashed-n-gram classifier scores every document at ingest time
    (map-only — no state store, no watermark, each Arrow/codegen
    batch scored as it arrives) and the drained result hash-matches
    the batch SQL oracle. The shape that matters at scale: quality
    filtering needs no nightly batch pass when the scorer is a
    stateless map over the ingest stream."""
    import uuid

    from etl_covid19_spark.sources.catalog import documents_stream

    scored = CUR.classifier_scores_arrow(
        documents_stream(spark, sf_dir), "text", ["doc_id"]
    ).select(
        "doc_id",
        F.round("_score_raw", 6).alias("score"),
        (F.col("_score_raw") >= 0.5).alias("keep"),
    )
    name = f"stream_qf_{uuid.uuid4().hex[:8]}"
    q = (
        scored.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@register(
    "curation_pipeline",
    oracle=f"""
    WITH w AS (SELECT CAST({_CLF_WEIGHTS_SQL} AS DOUBLE[]) AS wl),
    tb AS (
      SELECT doc_id,
             list_transform(
               list_filter(regexp_split_to_array(trim(text), '\\s+'),
                           x -> x <> ''),
               tk -> CAST((ascii(substr(tk, 1, 1)) * 1000 + length(tk)) % 64
                          AS BIGINT)) AS b
      FROM documents
    ),
    fe AS (
      SELECT doc_id,
             list_concat(b,
               CASE WHEN len(b) >= 2
                    THEN list_transform(
                           list_zip(b[1:len(b)-1], b[2:len(b)]),
                           p -> (struct_extract(p, 1) * 31
                                 + struct_extract(p, 2)) % 64)
                    ELSE CAST([] AS BIGINT[]) END) AS feats
      FROM tb
    ),
    sc AS (
      SELECT doc_id,
             1.0 / (1.0 + exp(-(0.25 +
               CASE WHEN len(feats) > 0
                    THEN list_reduce(
                           list_prepend(0.0,
                             list_transform(feats,
                               ff -> wl[CAST(ff AS INT) + 1])),
                           (x, y) -> x + y) / len(feats)
                    ELSE 0.0 END))) AS score_raw
      FROM fe CROSS JOIN w
    ),
    t AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                x -> x <> '')) AS token
      FROM documents
    ),
    dt AS (SELECT doc_id, token, count(*) AS n FROM t GROUP BY doc_id, token),
    v AS (SELECT token, sum(n) AS cnt FROM dt GROUP BY token),
    s AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n_total,
                 CAST(count(*) AS DOUBLE) AS vsz
          FROM v),
    p AS (
      SELECT dt.doc_id,
             CAST(sum(dt.n) AS BIGINT) AS n_tokens,
             round(exp(
               CAST(sum(CAST(dt.n * -ln((CAST(v.cnt AS DOUBLE) + 0.5)
                                        / (s.n_total + 0.5 * s.vsz))
                             AS DECIMAL(28,18))) AS DOUBLE)
               / sum(dt.n)), 6) AS perplexity
      FROM dt JOIN v USING (token) CROSS JOIN s
      GROUP BY dt.doc_id
    ),
    filtered AS (
      SELECT d.doc_id, d.lang, d.text,
             round(sc.score_raw, 6) AS score, p.n_tokens, p.perplexity
      FROM documents d
      JOIN sc USING (doc_id)
      JOIN p USING (doc_id)
      WHERE sc.score_raw >= 0.5 AND p.perplexity <= 30.5
    ),
    dedup AS (
      SELECT doc_id, lang, n_tokens, score, perplexity,
             ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM filtered
    )
    SELECT doc_id, lang, n_tokens, score, perplexity
    FROM dedup WHERE rn = 1
    """,
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline as ONE declarative plan (the
    FineWeb/CCNet shape): learned classifier keep (score ≥ 0.5) →
    LM-perplexity band (ppl ≤ 30.5, model trained on the RAW corpus
    as CCNet does) → exact dedup keep-first. Composition stays a
    single Catalyst plan: the classifier is a map, the perplexity
    join carries only (doc_id, two doubles), and the dedup window
    partitions on (xxhash64, length) so document bodies are never
    shuffled twice."""
    d = _t(spark, sf_dir, "documents")
    ppl = CUR.unigram_perplexity(d, "text", "doc_id")
    scored = (
        CUR.classifier_scores_arrow(d, "text", ["doc_id", "lang", "text"])
        .where(F.col("_score_raw") >= 0.5)
        .select(
            "doc_id", "lang", "text",
            F.round("_score_raw", 6).alias("score"),
        )
    )
    joined = scored.join(
        ppl.select("doc_id", "n_tokens", "perplexity"), "doc_id"
    ).where(F.col("perplexity") <= 30.5)
    w = Window.partitionBy(
        F.xxhash64("text"), F.length("text")
    ).orderBy("doc_id")
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("doc_id", "lang", "n_tokens", "score", "perplexity")
    )


@register(
    "image_phash_dedup",
    oracle="""
    WITH ids AS (SELECT range AS id FROM range(24)),
    imgs AS (
      SELECT id,
             CASE WHEN id < 16 THEN id
                  WHEN id < 20 THEN id - 16
                  ELSE id - 20 END AS base,
             id >= 20 AS bumped
      FROM ids
    ),
    pix AS (
      SELECT i.id, x.range AS x, y.range AS y,
             (CASE WHEN i.bumped AND x.range < 2 AND y.range < 2
                   THEN least((i.base*31 + x.range*7 + y.range*13) % 256 + 40, 255)
                   ELSE (i.base*31 + x.range*7 + y.range*13) % 256 END)
             + (CASE WHEN i.bumped AND x.range < 2 AND y.range < 2
                     THEN least((i.base*31 + x.range*7 + y.range*13 + 101) % 256 + 40, 255)
                     ELSE (i.base*31 + x.range*7 + y.range*13 + 101) % 256 END)
             + (CASE WHEN i.bumped AND x.range < 2 AND y.range < 2
                     THEN least((i.base*31 + x.range*7 + y.range*13 + 202) % 256 + 40, 255)
                     ELSE (i.base*31 + x.range*7 + y.range*13 + 202) % 256 END)
               AS gsum
      FROM imgs i, range(8) x, range(8) y
    ),
    tot AS (SELECT id, sum(gsum) AS tot FROM pix GROUP BY id),
    bits AS (
      SELECT p.id, p.x, p.y,
             CASE WHEN 64 * p.gsum > t.tot THEN 1 ELSE 0 END AS bit
      FROM pix p JOIN tot t USING (id)
    ),
    bands AS (
      SELECT id, CAST(y // 2 AS INT) AS band_idx,
             CAST(sum(bit * (1 << ((y % 2) * 8 + x))) AS INT) AS band_val
      FROM bits GROUP BY id, y // 2
    ),
    cands AS (
      SELECT DISTINCT a.id AS i, b.id AS j
      FROM bands a
      JOIN bands b ON a.band_idx = b.band_idx
                  AND a.band_val = b.band_val
                  AND a.id < b.id
    ),
    ham AS (
      SELECT c.i AS doc_a, c.j AS doc_b,
             CAST(sum(bit_count(xor(ba.band_val, bb.band_val))) AS INT)
               AS hamming
      FROM cands c
      JOIN bands ba ON ba.id = c.i
      JOIN bands bb ON bb.id = c.j AND bb.band_idx = ba.band_idx
      GROUP BY c.i, c.j
    )
    SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 3
    """,
)
def q_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup over the REAL codec path: 24 formula-
    derived 8x8 PNGs (16 bases, 4 exact pixel copies, 4 copies with a
    brightened corner — different bytes, near-identical perception)
    decode executor-side, average-hash into four 16-bit bands, and
    near-dup pairs come from SimHash-style band-equality blocking
    (hamming <= 3 over 4 bands guarantees a shared band) + exact
    hamming verify. The DuckDB oracle re-derives hash bits, bands,
    blocking, and hamming from the generating formula without seeing
    a byte — byte-level dedup misses the brightened copies; the
    pixel hash catches them. Fixture-sized (codec correctness); the
    band join IS the scale shape (candidates = Sigma band-bucket^2,
    never images^2)."""
    import numpy as np

    from etl_covid19_spark.functions import media as M
    from etl_covid19_spark.operators.multimodal import image_ahash_bands

    y, x, c = np.meshgrid(
        np.arange(8), np.arange(8), np.arange(3), indexing="ij"
    )
    rows = []
    for n in range(24):
        base = n if n < 16 else (n - 16 if n < 20 else n - 20)
        arr = ((base * 31 + x * 7 + y * 13 + c * 101) % 256).astype(np.int64)
        if n >= 20:
            arr[:2, :2, :] = np.minimum(arr[:2, :2, :] + 40, 255)
        rows.append((n, bytearray(M.encode_png(arr.astype(np.uint8)))))
    d = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashed = image_ahash_bands(d, "doc_id", "payload")
    banded = hashed.select(
        "doc_id", "bands", F.posexplode("bands").alias("band_idx", "band_val")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            on=(F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.bands").alias("bands_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.bands").alias("bands_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = sum(
        F.bit_count(
            F.element_at("bands_a", k + 1).bitwiseXOR(
                F.element_at("bands_b", k + 1)
            )
        )
        for k in range(4)
    )
    return (
        cands.withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )


@register(
    "audio_fingerprint_dedup",
    oracle="""
    WITH ids AS (SELECT range AS id FROM range(16)),
    clips AS (
      SELECT id,
             CASE WHEN id < 10 THEN id
                  WHEN id < 13 THEN id - 10
                  ELSE id - 13 END AS base,
             id >= 13 AS pert
      FROM ids
    ),
    s AS (
      SELECT c.id, t.range AS t,
             ((c.base*17 + t.range*13) % 200 - 100) * 100
             + CASE WHEN c.pert AND t.range < 50 THEN 500 ELSE 0 END AS k
      FROM clips c, range(2000) t
    ),
    fr AS (
      SELECT id, CAST(t // 125 AS INT) AS frame, sum(k * k) AS e
      FROM s GROUP BY id, t // 125
    ),
    tot AS (SELECT id, sum(e) AS tot FROM fr GROUP BY id),
    bits AS (
      SELECT f.id, f.frame,
             CASE WHEN 16 * f.e > t.tot THEN 1 ELSE 0 END AS bit
      FROM fr f JOIN tot t USING (id)
    ),
    bands AS (
      SELECT id, CAST(frame // 4 AS INT) AS band_idx,
             CAST(sum(bit * (1 << (frame % 4))) AS INT) AS band_val
      FROM bits GROUP BY id, frame // 4
    ),
    cands AS (
      SELECT DISTINCT a.id AS i, b.id AS j
      FROM bands a
      JOIN bands b ON a.band_idx = b.band_idx
                  AND a.band_val = b.band_val
                  AND a.id < b.id
    ),
    ham AS (
      SELECT c.i AS doc_a, c.j AS doc_b,
             CAST(sum(bit_count(xor(ba.band_val, bb.band_val))) AS INT)
               AS hamming
      FROM cands c
      JOIN bands ba ON ba.id = c.i
      JOIN bands bb ON bb.id = c.j AND bb.band_idx = ba.band_idx
      GROUP BY c.i, c.j
    )
    SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 3
    """,
)
def q_audio_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acoustic near-dup detection over the REAL codec path: sixteen
    formula-derived PCM16 WAVs (10 bases, 3 exact copies, 3 copies
    with the opening 50 samples amplified — different bytes, same
    sound) decode executor-side, fingerprint into frame-energy bits,
    and near-dup pairs come from band-equality blocking + exact
    hamming verify — the audio twin of `image_phash_dedup`. The
    oracle re-derives energies, bits, and hamming from the sample
    formula without seeing a byte."""
    import numpy as np

    from etl_covid19_spark.functions import media as M
    from etl_covid19_spark.operators.multimodal import (
        audio_fingerprint_bands,
    )

    t = np.arange(2000)
    rows = []
    for n in range(16):
        base = n if n < 10 else (n - 10 if n < 13 else n - 13)
        k = ((base * 17 + t * 13) % 200 - 100) * 100
        if n >= 13:
            k = k + np.where(t < 50, 500, 0)
        rows.append((n, bytearray(M.encode_wav(k, rate=8000))))
    d = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashed = audio_fingerprint_bands(d, "doc_id", "payload")
    banded = hashed.select(
        "doc_id", "bands", F.posexplode("bands").alias("band_idx", "band_val")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            on=(F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.bands").alias("bands_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.bands").alias("bands_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = sum(
        F.bit_count(
            F.element_at("bands_a", k + 1).bitwiseXOR(
                F.element_at("bands_b", k + 1)
            )
        )
        for k in range(4)
    )
    return (
        cands.withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )


@register(
    "bigram_lm_perplexity",
    oracle="""
    WITH tkn AS MATERIALIZED (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    uni AS MATERIALIZED (SELECT doc_id, unnest(toks) AS w FROM tkn),
    c1 AS (SELECT w, count(*) AS c1 FROM uni GROUP BY w),
    st AS (SELECT CAST(sum(c1) AS DOUBLE) AS n_total,
                  CAST(count(*) AS DOUBLE) AS vsz
           FROM c1),
    pr AS MATERIALIZED (
      SELECT doc_id, struct_extract(p, 1) AS w1, struct_extract(p, 2) AS w2
      FROM (SELECT doc_id,
                   unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)]))
                     AS p
            FROM tkn WHERE len(toks) >= 2)
    ),
    c2 AS MATERIALIZED (SELECT w1, w2, count(*) AS c2 FROM pr GROUP BY w1, w2),
    ctx AS (SELECT w1, sum(c2) AS cctx FROM c2 GROUP BY w1),
    dt2 AS MATERIALIZED (SELECT doc_id, w1, w2, count(*) AS n FROM pr GROUP BY doc_id, w1, w2),
    nll2 AS (
      SELECT dt2.doc_id,
             CAST(dt2.n * -ln(
               CAST(0.7 AS DOUBLE)
                 * ((c2.c2 + 0.5) / (ctx.cctx + 0.5 * st.vsz))
               + (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE))
                 * ((u.c1 + 0.5) / (st.n_total + 0.5 * st.vsz))
             ) AS DECIMAL(28,18)) AS nll
      FROM dt2
      JOIN c2 USING (w1, w2)
      JOIN ctx USING (w1)
      JOIN c1 u ON u.w = dt2.w2
      CROSS JOIN st
    ),
    nll1 AS (
      SELECT t.doc_id,
             CAST(-ln((c1.c1 + 0.5) / (st.n_total + 0.5 * st.vsz))
                  AS DECIMAL(28,18)) AS nll
      FROM tkn t
      JOIN c1 ON c1.w = t.toks[1]
      CROSS JOIN st
      WHERE len(t.toks) >= 1
    ),
    d AS (
      SELECT doc_id, CAST(sum(nll) AS DOUBLE) AS h
      FROM (SELECT * FROM nll1 UNION ALL SELECT * FROM nll2)
      GROUP BY doc_id
    )
    SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
           round(d.h / len(t.toks), 6) AS cross_entropy,
           round(exp(d.h / len(t.toks)), 6) AS perplexity
    FROM tkn t JOIN d USING (doc_id)
    """,
)
def q_bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM perplexity (λ=0.7 bigram, add-0.5
    smoothing, exact context counts) — the next rung of the CCNet
    ladder above `unigram_lm_perplexity`: sequence-aware, so shuffled
    word salad scores worse than fluent text even when the unigram
    mix matches. Model tables stay vocab-bounded; scoring joins on
    token keys and re-aggregates by doc with exact DECIMAL sums."""
    return CUR.bigram_perplexity(
        _t(spark, sf_dir, "documents"), "text", "doc_id"
    )


@register(
    "corpus_datacard",
    oracle="""
    WITH t AS (
      SELECT source, lang,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             x -> x <> '')) AS n_tok,
             n_chars, md5(text) AS h
      FROM documents
    )
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           round(CAST(SUM(n_tok) AS DOUBLE) / COUNT(*), 6) AS avg_tokens,
           round(1.0 - CAST(COUNT(DISTINCT h) AS DOUBLE) / COUNT(*), 6)
             AS dup_rate
    FROM t
    GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())
    """,
)
def q_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card summary in ONE pass: per-(source, lang) cell plus
    both marginals and the corpus total via GROUPING SETS — document
    counts, token/char volumes, mean length, and the exact-dup rate
    (distinct content hashes, so text never shuffles — only its
    md5). The report every corpus release ships, as a single
    Expand + hash aggregate."""
    from etl_covid19_spark.operators import aggregates as AGG

    d = _t(spark, sf_dir, "documents").select(
        "source",
        "lang",
        text.token_count("text").alias("n_tok"),
        "n_chars",
        F.md5("text").alias("h"),
    )
    return AGG.grouping_sets_agg(
        d,
        sets=[["source", "lang"], ["source"], ["lang"], []],
        keys=["source", "lang"],
        aggs={
            "n_docs": "CAST(COUNT(*) AS BIGINT)",
            "total_tokens": "CAST(SUM(n_tok) AS BIGINT)",
            "total_chars": "CAST(SUM(n_chars) AS BIGINT)",
            "avg_tokens": "round(CAST(SUM(n_tok) AS DOUBLE) / COUNT(*), 6)",
            "dup_rate":
                "round(1.0 - CAST(COUNT(DISTINCT h) AS DOUBLE) / COUNT(*), 6)",
        },
    )


@register(
    "semantic_dedup_scaled",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    kk AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS k FROM e),
    c AS (SELECT vec_id AS cid, v AS cv FROM e CROSS JOIN kk
          WHERE vec_id < kk.k),
    ec AS (
      SELECT e.vec_id, c.cid,
             list_reduce(list_transform(list_zip(e.v, c.cv),
                         p -> struct_extract(p, 1) * struct_extract(p, 2)),
                         (x, y) -> x + y)
             / (sqrt(list_reduce(list_transform(e.v, x -> x * x), (x, y) -> x + y))
                * sqrt(list_reduce(list_transform(c.cv, x -> x * x), (x, y) -> x + y)))
               AS cos
      FROM e CROSS JOIN c
    ),
    assign AS (
      SELECT vec_id, cid AS cluster_id, cos AS cent_cos
      FROM (SELECT vec_id, cid, cos,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY cos DESC, cid DESC) AS rn
            FROM ec)
      WHERE rn = 1
    ),
    pairs AS (
      SELECT a.vec_id AS i, b.vec_id AS j,
             a.cent_cos AS ci, b.cent_cos AS cj,
             list_reduce(list_transform(list_zip(ei.v, ej.v),
                         p -> struct_extract(p, 1) * struct_extract(p, 2)),
                         (x, y) -> x + y)
             / (sqrt(list_reduce(list_transform(ei.v, x -> x * x), (x, y) -> x + y))
                * sqrt(list_reduce(list_transform(ej.v, x -> x * x), (x, y) -> x + y)))
               AS cos
      FROM assign a
      JOIN assign b ON a.cluster_id = b.cluster_id AND a.vec_id <> b.vec_id
      JOIN e ei ON ei.vec_id = a.vec_id
      JOIN e ej ON ej.vec_id = b.vec_id
    ),
    dropped AS (
      SELECT DISTINCT j AS vec_id FROM pairs
      WHERE cos > 0.40 AND (ci > cj OR (ci = cj AND i < j))
    )
    SELECT a.vec_id, a.cluster_id, round(a.cent_cos, 6) AS cent_cos,
           d.vec_id IS NULL AS keep
    FROM assign a LEFT JOIN dropped d USING (vec_id)
    """,
)
def q_semantic_dedup_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the paper's k ≈ √n cluster sizing REGISTERED,
    not just documented: n_clusters = ceil(√corpus), so the per-task
    pairwise block is O(n) total (Σ cluster² ≈ n·√n/√n) and keeps
    shrinking relative to the corpus as it grows. The fixed-k form
    (`semantic_dedup`) stays as the deterministic small-k
    cross-check — same promote-the-scale-twin pattern as
    `equidepth_histogram_sketch` and `window_dist_scaled`."""
    import math

    from etl_covid19_spark.operators.similarity import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    k = math.ceil(math.sqrt(emb.count()))
    return semantic_dedup(
        emb, "embedding", "vec_id", n_clusters=k, threshold=0.40
    )


@register(
    "curation_signal_agreement",
    oracle=f"""
    WITH w AS (SELECT CAST({_CLF_WEIGHTS_SQL} AS DOUBLE[]) AS wl),
    tb AS (
      SELECT doc_id, lang, text,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    fe AS (
      SELECT doc_id,
             list_concat(b,
               CASE WHEN len(b) >= 2
                    THEN list_transform(
                           list_zip(b[1:len(b)-1], b[2:len(b)]),
                           p -> (struct_extract(p, 1) * 31
                                 + struct_extract(p, 2)) % 64)
                    ELSE CAST([] AS BIGINT[]) END) AS feats
      FROM (SELECT doc_id,
                   list_transform(toks,
                     tk -> CAST((ascii(substr(tk, 1, 1)) * 1000
                                 + length(tk)) % 64 AS BIGINT)) AS b
            FROM tb)
    ),
    clf AS (
      SELECT doc_id,
             1.0 / (1.0 + exp(-(0.25 +
               CASE WHEN len(feats) > 0
                    THEN list_reduce(
                           list_prepend(0.0,
                             list_transform(feats,
                               ff -> wl[CAST(ff AS INT) + 1])),
                           (x, y) -> x + y) / len(feats)
                    ELSE 0.0 END))) >= 0.5 AS clf_keep
      FROM fe CROSS JOIN w
    ),
    gph AS (
      SELECT doc_id,
             (len(toks) BETWEEN 50 AND 100000)
             AND (list_reduce(list_prepend(0,
                    list_transform(toks, x -> length(x))), (a, b) -> a + b)
                  / greatest(len(toks), 1) BETWEEN 3 AND 10)
             AND (((length(text) - length(replace(text, '#', '')))
                   + (length(text) - length(replace(text, '...', ''))) / 3)
                  / greatest(len(toks), 1) <= 0.1)
             AND (len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
                  / greatest(len(toks), 1) >= 0.8)
             AND (len(list_intersect(
                    list_distinct(list_transform(toks, x -> lower(x))),
                    ['the','be','to','of','and','that','have','with'])) >= 2)
               AS gopher_pass
      FROM tb
    ),
    t AS (SELECT doc_id, unnest(toks) AS token FROM tb),
    dt AS (SELECT doc_id, token, count(*) AS n FROM t GROUP BY doc_id, token),
    v AS (SELECT token, sum(n) AS cnt FROM dt GROUP BY token),
    s AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n_total,
                 CAST(count(*) AS DOUBLE) AS vsz
          FROM v),
    p AS (
      SELECT dt.doc_id,
             round(exp(
               CAST(sum(CAST(dt.n * -ln((CAST(v.cnt AS DOUBLE) + 0.5)
                                        / (s.n_total + 0.5 * s.vsz))
                             AS DECIMAL(28,18))) AS DOUBLE)
               / sum(dt.n)), 6) <= 30.5 AS ppl_band
      FROM dt JOIN v USING (token) CROSS JOIN s
      GROUP BY dt.doc_id
    ),
    joined AS (
      SELECT d.lang, c.clf_keep, g.gopher_pass,
             COALESCE(p.ppl_band, FALSE) AS ppl_band
      FROM documents d
      JOIN clf c USING (doc_id)
      JOIN gph g USING (doc_id)
      LEFT JOIN p USING (doc_id)
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(CAST(SUM(CASE WHEN clf_keep THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS clf_keep_rate,
           round(CAST(SUM(CASE WHEN gopher_pass THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS gopher_pass_rate,
           round(CAST(SUM(CASE WHEN ppl_band THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS ppl_band_rate,
           round(CAST(SUM(CASE WHEN clf_keep AND gopher_pass AND ppl_band
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS all_pass_rate,
           round(CAST(SUM(CASE WHEN clf_keep = gopher_pass
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS clf_gopher_agree
    FROM joined GROUP BY lang
    """,
)
def q_curation_signal_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-calibration audit: per-language keep rates of the
    learned classifier, the Gopher rule bundle, and the perplexity
    band, plus their joint pass rate and classifier↔rules agreement.
    The report you read BEFORE trusting any single curation signal —
    systematic per-language disagreement means a filter is biased
    against that slice (the practical failure mode of quality
    filtering). One scan feeds all three signal branches; the rates
    aggregate exact integer counts. All three signals ride their
    Arrow kernels (classifier buckets, gopher counting kernel,
    hashed token-count perplexity) — the HOF composition cost 50 s
    at sf10; the engine-pure forms remain the per-signal
    cross-checks."""
    d = _t(spark, sf_dir, "documents")
    clf = CUR.classifier_scores_arrow(d, "text", ["doc_id", "lang"]).select(
        "doc_id", "lang", (F.col("_score_raw") >= 0.5).alias("clf_keep")
    )
    gph = text.quality_counts_arrow(
        d, ["doc_id"], "text", with_gopher=True
    ).select(
        "doc_id", text.gopher_from_counts()["pass"].alias("gopher_pass")
    )
    ppl = CUR.unigram_perplexity(d, "text", "doc_id").select(
        "doc_id", (F.col("perplexity") <= 30.5).alias("ppl_band")
    )
    joined = (
        clf.join(gph, "doc_id")
        .join(ppl, "doc_id", "left")
        .withColumn("ppl_band", F.coalesce("ppl_band", F.lit(False)))
    )
    cnt = F.count(F.lit(1))

    def rate(c):
        return F.round(
            F.sum(c.cast("int")).cast("double") / cnt, 6
        )

    return joined.groupBy("lang").agg(
        cnt.cast("bigint").alias("n_docs"),
        rate(F.col("clf_keep")).alias("clf_keep_rate"),
        rate(F.col("gopher_pass")).alias("gopher_pass_rate"),
        rate(F.col("ppl_band")).alias("ppl_band_rate"),
        rate(
            F.col("clf_keep") & F.col("gopher_pass") & F.col("ppl_band")
        ).alias("all_pass_rate"),
        rate(F.col("clf_keep") == F.col("gopher_pass")).alias(
            "clf_gopher_agree"
        ),
    )


# ---------------------------------------------------------------------------
# Corpus-statistics batch (round 3, late): heavy hitters, tf-idf,
# OOV audit, lang-ID confusion, Bloom incremental dedup
# ---------------------------------------------------------------------------

_TOKS_CTE = """
      SELECT doc_id, unnest(list_filter(
               regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''))
               AS tok
      FROM documents
"""


@register(
    "heavy_hitter_tokens",
    oracle=f"""
    WITH toks AS ({_TOKS_CTE}),
    tot AS (SELECT COUNT(*) AS n FROM toks)
    SELECT tok, COUNT(*) AS freq,
           CAST(COUNT(*) AS DOUBLE) / n AS share
    FROM toks CROSS JOIN tot
    GROUP BY tok, n
    HAVING COUNT(*) * 30 > n
    """,
)
def q_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters (tokens with > 1/30 of all
    occurrences) via the two-pass Misra-Gries sketch
    (aggregates.frequent_items): bounded per-partition candidate
    state + exact verify, so the full-vocabulary shuffle of a naive
    token groupBy never happens. The output is provably exact — the
    sketch only generates the candidate superset. The token stream
    feeds from the Arrow tokenizer (`text.tokens_stream_arrow`,
    identical strings) — the sketch evaluates its input three times
    (candidates / total / recount) and the HOF explode cost 42 s per
    pass-set at sf10."""
    d = _t(spark, sf_dir, "documents")
    toks = text.tokens_stream_arrow(d, "text", "tok")
    return agg.frequent_items(toks, "tok", k=30, capacity=240)


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH toks AS ({_TOKS_CTE}),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS term_freq
      FROM toks GROUP BY doc_id, tok
    ),
    dfreq AS (SELECT tok, COUNT(*) AS doc_freq FROM tf GROUP BY tok),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok, tf.term_freq, dfreq.doc_freq,
             CAST(tf.term_freq AS DOUBLE) * n_docs / dfreq.doc_freq
               AS score
      FROM tf JOIN dfreq USING (tok) CROSS JOIN nd
    )
    SELECT doc_id, tok, term_freq, doc_freq, score
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY score DESC, tok ASC) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document distinctive terms: top-3 by a tf-idf-shaped
    rarity score (term_freq · n_docs / doc_freq — an exact integer
    ratio, monotone in idf, so rankings are engine-reproducible
    without transcendental log rounding). Three keyed shuffles —
    (doc, tok) term counts, |vocab| doc frequencies, per-doc window —
    every one on hashed grouping keys with map-side partials; the
    tf⋈df join is a plain equi-join (AQE broadcasts the vocab side
    when it fits; at web scale with 10⁹ distinct tokens it
    sort-merges — never a loop join)."""
    from etl_covid19_spark.operators.df_cache import (
        SHARED_CACHE,
        corpus_key,
    )

    d = _t(spark, sf_dir, "documents")
    key = ("lm_positions", corpus_key(d), "text", "doc_id")
    toks = SHARED_CACHE.get_or_build(
        key, lambda: text.token_positions_arrow(d, "text", "doc_id")
    ).select(F.col("_doc").alias("doc_id"), F.col("token").alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("term_freq")
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("doc_freq"))
    nd = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        agg.attach_scalar(tf.join(dfreq, "tok"), nd)
        .withColumn(
            "score",
            F.col("term_freq").cast("double")
            * F.col("n_docs")
            / F.col("doc_freq"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tok", "term_freq", "doc_freq", "score")
    )


@register(
    "oov_rate",
    oracle=f"""
    WITH toks AS ({_TOKS_CTE}),
    vocab AS (
      SELECT tok FROM toks GROUP BY tok
      ORDER BY COUNT(*) DESC, tok ASC LIMIT 10
    )
    SELECT t.doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_oov,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
    GROUP BY t.doc_id
    """,
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage audit: per-document out-of-vocabulary rate
    against the corpus top-10 vocabulary — the check you run before
    freezing a tokenizer (docs with high OOV are the slices the
    vocab underserves). The vocabulary is a TakeOrderedAndProject
    top-k broadcast to the token stream; the per-doc aggregate
    shuffles doc-grain partials only."""
    from etl_covid19_spark.operators.df_cache import (
        SHARED_CACHE,
        corpus_key,
    )

    d = _t(spark, sf_dir, "documents")
    key = ("lm_positions", corpus_key(d), "text", "doc_id")
    toks = SHARED_CACHE.get_or_build(
        key, lambda: text.token_positions_arrow(d, "text", "doc_id")
    ).select(F.col("_doc").alias("doc_id"), F.col("token").alias("tok"))
    freqs = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    vocab = agg.top_k(
        freqs, [F.col("freq").desc(), F.col("tok").asc()], 10
    ).select("tok", F.lit(True).alias("in_vocab"))
    oov = F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(oov).cast("bigint").alias("n_oov"),
            (F.sum(oov).cast("double") / F.count(F.lit(1))).alias(
                "oov_rate"
            ),
        )
    )


@register(
    "langid_confusion",
    oracle=f"""
    WITH pred AS ({_LANG_ID_ORACLE})
    SELECT actual_lang, predicted_lang, COUNT(*) AS n_docs,
           CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY actual_lang)
             AS share_of_actual
    FROM pred GROUP BY actual_lang, predicted_lang
    """,
)
def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lang-ID calibration: confusion matrix of the heuristic
    detector against the corpus's labeled language, with each cell's
    share of its actual-language row. At most |langs|² cells ever
    shuffle; the window normalization runs over the aggregated
    matrix, not the documents."""
    pred = q_lang_id(spark, sf_dir)
    cells = pred.groupBy("actual_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("actual_lang")
    return cells.withColumn(
        "share_of_actual",
        F.col("n_docs").cast("double") / F.sum("n_docs").over(w),
    )


@register(
    "incremental_dedup_bloom",
    oracle="""
    SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
    FROM documents b
    WHERE doc_id >= 250
      AND NOT EXISTS (SELECT 1 FROM documents c
                      WHERE c.doc_id < 250 AND c.text = b.text)
    GROUP BY b.text
    """,
)
def q_incremental_dedup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale twin of `incremental_dedup` (same oracle): the
    historical corpus collapses to a 64 Kbit Bloom filter built with
    bit_or aggregation; only batch rows the filter cannot rule out
    enter the exact anti-join verify. Result is exact by
    construction — Bloom sizing tunes cost, never correctness
    (dedup.incremental_exact_dedup_bloom)."""
    from etl_covid19_spark.operators.dedup import (
        incremental_exact_dedup_bloom,
    )

    docs = _t(spark, sf_dir, "documents")
    return incremental_exact_dedup_bloom(
        docs.filter(F.col("doc_id") >= 250),
        docs.filter(F.col("doc_id") < 250),
        "text",
        "doc_id",
    )


def _bpe_training_ctes(n_merges: int, min_count: int) -> list[str]:
    """Shared CTE rounds for the two BPE oracles (see
    _bpe_encode_oracle for the full derivation)."""
    D = "chr(1)"
    parts = [
        "WITH toks AS MATERIALIZED (SELECT doc_id,"
        " list_filter(regexp_split_to_array(trim(text), '\\s+'),"
        " x -> x <> '') AS ws FROM documents),",
        "wordocc AS MATERIALIZED (SELECT doc_id, unnest(ws) AS word"
        " FROM toks),",
        "vocab AS MATERIALIZED (SELECT word, COUNT(*) AS freq"
        " FROM wordocc GROUP BY word),",
        f"w0 AS MATERIALIZED (SELECT word, freq, {D} ||"
        f" array_to_string(list_append(string_split(word, ''), '</w>'),"
        f" {D}||{D}) || {D} AS s FROM vocab),",
    ]
    for i in range(n_merges):
        parts.append(
            f"sy{i} AS MATERIALIZED (SELECT freq,"
            f" string_split(trim(s, {D}), {D}||{D}) AS syms FROM w{i}),"
        )
        parts.append(
            f"pr{i} AS MATERIALIZED (SELECT t.syms[r.i] AS l,"
            f" t.syms[r.i + 1] AS r2, SUM(t.freq) AS cnt"
            f" FROM sy{i} t, unnest(range(1, len(t.syms))) r(i)"
            " GROUP BY 1, 2),"
        )
        parts.append(
            f"b{i} AS MATERIALIZED (SELECT l, r2, cnt FROM pr{i}"
            f" WHERE cnt >= {min_count}"
            " ORDER BY cnt DESC, l ASC, r2 ASC LIMIT 1),"
        )
        parts.append(
            f"w{i + 1} AS MATERIALIZED (SELECT w.word, w.freq,"
            " CASE WHEN b.l IS NULL THEN w.s ELSE"
            f" replace(w.s, {D}||b.l||{D}||{D}||b.r2||{D},"
            f" {D}||b.l||b.r2||{D}) END AS s"
            f" FROM w{i} w LEFT JOIN b{i} b ON TRUE),"
        )
    return parts


def _bpe_merges_oracle(n_merges: int = 20, min_count: int = 2) -> str:
    """GENERATED oracle for the BPE merge TABLE itself: the per-round
    argmax CTEs (b0..bN-1) from the unrolled training are unioned
    with their rank; rounds after an early stop are empty (the word
    table stops changing once no pair reaches min_count, so every
    later argmax stays empty — the same rows Spark's `break`
    omits)."""
    rounds = " UNION ALL ".join(
        f"SELECT CAST({i} AS INT) AS rank, l AS \"left\","
        f" r2 AS \"right\", l || r2 AS merged,"
        f" CAST(cnt AS BIGINT) AS pair_count FROM b{i}"
        for i in range(n_merges)
    )
    return "\n".join(
        _bpe_training_ctes(n_merges, min_count) + [f"m AS ({rounds})", "SELECT * FROM m ORDER BY rank"]
    )


def _bpe_encode_oracle(n_merges: int = 20, min_count: int = 2) -> str:
    """GENERATED oracle for BPE encode: the training loop UNROLLS
    into n_merges chained CTE rounds (same move as _pagerank_oracle
    — a fixed merge budget is not a fixpoint), so DuckDB re-learns
    the merge table from scratch and re-encodes, with zero Spark
    state smuggled in. Two tricks make it plain SQL:

    1. Greedy merge-apply == string replace. Each word's symbol
       sequence is one string with every symbol wrapped in chr(1)
       delimiters (`\\x01sym\\x01`, so symbol boundaries are
       unambiguous — chr(1) never occurs in the corpus, asserted
       by construction of the delimiter choice); applying merge
       (l, r) is `replace(s, ·l··r·, ·lr·)`, whose non-overlapping
       left-to-right scan is EXACTLY the operator's greedy fold
       (`bpe._apply_merge`): a freshly merged symbol can never
       re-match within the same pass in either formulation.
    2. encode == final training state. Every document word is in
       the training vocabulary, so a word's encoded token count is
       the length of its round-N symbol sequence — the encode pass
       is a join from doc words to the trained word table, no
       second merge replay.

    Each round: re-split symbols → adjacent-pair counts weighted by
    word freq → argmax with the operator's (cnt desc, l, r)
    tiebreak (empty under min_count = training stopped; LEFT JOIN
    ON TRUE makes later rounds no-ops, matching the break). CTEs
    are MATERIALIZED: each round is referenced multiple times and
    DuckDB's default inlining would re-derive round i once per
    downstream reference (exponential)."""
    D = "chr(1)"
    parts = _bpe_training_ctes(n_merges, min_count)
    parts.append(
        f"wtok AS MATERIALIZED (SELECT word,"
        f" len(string_split(trim(s, {D}), {D}||{D})) AS n_tok"
        f" FROM w{n_merges}),"
        " perdoc AS (SELECT o.doc_id, SUM(w.n_tok) AS n_bpe_tokens"
        " FROM wordocc o JOIN wtok w ON w.word = o.word"
        " GROUP BY o.doc_id)"
        " SELECT d.doc_id,"
        " CAST(length(d.text) AS BIGINT) AS n_chars,"
        " CAST(COALESCE(p.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens,"
        " round(CAST(length(d.text) AS DOUBLE)"
        " / GREATEST(COALESCE(p.n_bpe_tokens, 0), 1), 6)"
        " AS chars_per_token"
        " FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id"
    )
    return "\n".join(parts)


@register("bpe_vocab_merges", oracle=_bpe_merges_oracle())
def q_bpe_vocab_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer induction (operators/bpe.py): first 20 merges
    learned over the corpus word-frequency dictionary. The oracle
    re-learns the table from scratch with the training rounds
    unrolled into SQL CTEs (see _bpe_merges_oracle) — a fixed merge
    budget is not a fixpoint, so 'iterative' no longer means
    'rows-only'; tests/test_bpe.py additionally pins against a
    pure-Python Sennrich-shape reference plus
    compositionality/tie-break/overlap edge pins. Corpus-scale work
    is one map-side-combined token groupBy; every merge round runs
    on the |vocab|-row symbol table and collects one row."""
    from etl_covid19_spark.operators.bpe import bpe_merge_table

    d = _t(spark, sf_dir, "documents")
    return bpe_merge_table(spark, d, "text", n_merges=20, min_count=2)


@register(
    "pmi_bigrams",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                 x -> x <> '') AS toks
      FROM documents
    ),
    bg AS (
      SELECT toks[i] AS w1, toks[i + 1] AS w2
      FROM t, unnest(range(1, len(toks))) r(i)
    ),
    cbg AS (SELECT w1, w2, COUNT(*) AS pair_count FROM bg GROUP BY w1, w2),
    uni AS (SELECT unnest(toks) AS tok FROM t),
    cuni AS (SELECT tok, COUNT(*) AS cnt FROM uni GROUP BY tok),
    tot AS (
      SELECT (SELECT COUNT(*) FROM uni) AS n_uni,
             (SELECT COUNT(*) FROM bg) AS n_bi
    )
    SELECT w1, w2, pair_count,
           (CAST(pair_count AS DOUBLE) / n_bi)
             / ((CAST(u1.cnt AS DOUBLE) / n_uni)
                * (CAST(u2.cnt AS DOUBLE) / n_uni)) AS lift
    FROM cbg
    JOIN cuni u1 ON cbg.w1 = u1.tok
    JOIN cuni u2 ON cbg.w2 = u2.tok
    CROSS JOIN tot
    WHERE pair_count >= 20
    ORDER BY lift DESC, w1 ASC, w2 ASC
    LIMIT 20
    """,
)
def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation / phrase mining: top-20 adjacent-token pairs by
    pointwise-mutual-information LIFT — P(w1,w2) / (P(w1)·P(w2)) as
    a pure ratio of exact integer counts (the log-PMI ordering is
    identical since log is monotone, and skipping the transcendental
    keeps the score engine-reproducible). Bigrams never cross
    document borders. ONE tokenization pass: reads the pooled
    (doc, pos, token) frame shared with the LM-perplexity family
    (the per-branch HOF re-tokenization measured 68 s warm at sf1;
    this shape is ~4 s), bigrams via a lag window over it. Shuffle
    budget: the (doc, pos) sort, one |vocab|²-bounded bigram
    aggregate, one |vocab| unigram aggregate, two equi-joins of the
    bigram table to unigram counts (AQE broadcasts the count side
    when it fits), scalars attached via the non-foldable constant
    key, min-support 20, TakeOrderedAndProject top-20."""
    from etl_covid19_spark.operators.df_cache import (
        SHARED_CACHE,
        corpus_key,
    )

    d = _t(spark, sf_dir, "documents")
    key = ("lm_positions", corpus_key(d), "text", "doc_id")
    pos_frame = SHARED_CACHE.get_or_build(
        key,
        lambda: text.token_positions_arrow(d, "text", "doc_id"),
    )
    wspec = Window.partitionBy("_doc").orderBy("pos")
    bg = (
        pos_frame.withColumn("w1", F.lag("token").over(wspec))
        .where(F.col("w1").isNotNull())
        .select("w1", F.col("token").alias("w2"))
    )
    cbg = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
    uni = pos_frame.select(F.col("token").alias("tok"))
    cuni = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    totals = agg.attach_scalar(
        uni.agg(F.count(F.lit(1)).alias("n_uni")),
        bg.agg(F.count(F.lit(1)).alias("n_bi")),
    )
    u1 = cuni.select(
        F.col("tok").alias("w1"), F.col("cnt").alias("cnt1")
    )
    u2 = cuni.select(
        F.col("tok").alias("w2"), F.col("cnt").alias("cnt2")
    )
    scored = agg.attach_scalar(
        cbg.join(u1, "w1").join(u2, "w2"), totals
    ).withColumn(
        "lift",
        (F.col("pair_count").cast("double") / F.col("n_bi"))
        / (
            (F.col("cnt1").cast("double") / F.col("n_uni"))
            * (F.col("cnt2").cast("double") / F.col("n_uni"))
        ),
    )
    return agg.top_k(
        scored.filter(F.col("pair_count") >= 20),
        [F.col("lift").desc(), F.col("w1").asc(), F.col("w2").asc()],
        20,
    ).select("w1", "w2", "pair_count", "lift")


@register(
    "training_shuffle",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             (((doc_id + 7919) % 2147483648) * 2654435761) % 4294967296
               AS shuffle_key
      FROM documents
    )
    SELECT doc_id, shuffle_key,
           CAST(shuffle_key % 16 AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY shuffle_key % 16
             ORDER BY shuffle_key, doc_id
           ) AS BIGINT) AS position
    FROM h
    ORDER BY shard, position
    """,
)
def q_training_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded global shuffle for training export: every
    document gets a pseudo-random shuffle key (the `dataset_split`
    Knuth hash with the epoch seed folded into the id BEFORE the
    mod-2^31 reduce, so a new seed permutes everything), a shard
    assignment, and a position within its shard. Reruns and engines
    agree bit-for-bit — the property `ORDER BY rand()` lacks, and the
    reason interrupted exports can resume. No GLOBAL sort at scale:
    the plan is one hash shuffle on the shard key plus a per-shard
    local sort (the window partitions by shard). Shard count is
    chosen so one shard ≈ one loader file (sf registry pins 16;
    at 100 TB you'd size n_shards = bytes / ~250 MB, keeping each
    window partition a single spill-friendly task)."""
    seed = 7919  # epoch seed; re-export with a new prime → new order
    docs = _t(spark, sf_dir, "documents")
    key = (
        ((F.col("doc_id") + F.lit(seed)) % F.lit(2147483648))
        * F.lit(2654435761)
    ) % F.lit(4294967296)
    n_shards = 16
    w = Window.partitionBy(F.col("shuffle_key") % n_shards).orderBy(
        "shuffle_key", "doc_id"
    )
    # no presentation orderBy: it would append a rangepartition +
    # global Sort over the FULL corpus output (plan-checked); the
    # driver compare is order-insensitive and the export path orders
    # by sortWithinPartitions
    return docs.select("doc_id", key.alias("shuffle_key")).select(
        "doc_id",
        "shuffle_key",
        (F.col("shuffle_key") % n_shards).cast("bigint").alias("shard"),
        F.row_number().over(w).cast("bigint").alias("position"),
    )


def _hybrid_rrf_oracle() -> str:
    """GENERATED oracle for hybrid_retrieval_rrf: the kw side is the
    shared BM25 SQL (rank = dense order over its rounded scores), the
    vector side is the generated LSH SQL pinned to query vector 0 and
    k=20, fused with reciprocal-rank weights 1/(60+rank)."""
    kw = _BM25_ORACLE.strip().rstrip()
    vec = _lsh_ann_oracle(
        n_planes=6, dim=64, query_pred="q.vec_id = 0", k=20
    ).strip()
    return f"""
    WITH kw AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC)
                  AS INT) AS kw_rank
      FROM ({kw})
    ),
    vec AS (
      SELECT neighbor_id AS doc_id, rank AS vec_rank
      FROM ({vec})
    ),
    fused AS (
      SELECT COALESCE(kw.doc_id, vec.doc_id) AS doc_id, kw_rank, vec_rank,
             round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + kw_rank), 0.0)
                   + COALESCE(CAST(1.0 AS DOUBLE) / (60 + vec_rank), 0.0),
                   6) AS rrf_score
      FROM kw FULL OUTER JOIN vec ON kw.doc_id = vec.doc_id
    )
    SELECT doc_id, kw_rank, vec_rank, rrf_score
    FROM fused ORDER BY rrf_score DESC, doc_id ASC LIMIT 20
    """


@register("hybrid_retrieval_rrf", oracle=_hybrid_rrf_oracle())
def q_hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse BM25 keyword ranks with ANN vector
    ranks by reciprocal-rank fusion (Cormack, Clarke & Buettcher
    2009 — score = Σ 1/(60+rank), the standard rank-level combiner
    that needs NO score calibration between the two retrievers).
    The keyword side is the bm25_search top-20 (inverted-index
    postings, broadcast-pruned to the query terms); the vector side
    is the LSH-bucketed ANN top-20 for query vector 0 (the SCALE
    path — bucket equi-join, never corpus²). Both lists are ≤k rows,
    so the fusion join is a broadcast of bounded model-sized frames
    no matter the corpus size; ranks are deterministic on both
    engines (rounded scores, id tie-breaks), which is what makes an
    approximate two-retriever pipeline oracle-checkable at all."""
    from etl_covid19_spark.operators.search import bm25_topk
    from etl_covid19_spark.operators.similarity import lsh_bucket_ann

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    kw = bm25_topk(docs, ["vector", "stream", "window", "join"], k=20)
    kw_ranked = kw.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col("doc_id").asc()))
        .alias("kw_rank"),
    )
    vec = lsh_bucket_ann(
        emb,
        emb.filter(F.col("vec_id") == 0),
        "embedding",
        "vec_id",
        k=20,
        n_planes=6,
        dim=64,
    ).select(
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("vec_rank"),
    )
    fused = kw_ranked.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        "kw_rank",
        "vec_rank",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("kw_rank")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(60) + F.col("vec_rank")), F.lit(0.0)
            ),
            6,
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc()).limit(
        20
    )


def _binary_sig_ctes(band_bits: int) -> str:
    """Shared CTE prefix for the binary-quantization family:
    per-vector banded sign-bit signatures (``band_bits`` bits per
    band, MSB-first inside the band) as exact BIGINTs."""
    return f"""
    e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    bits AS (
      SELECT vec_id,
             CAST((r.i - 1) // {band_bits} AS INT) AS band_idx,
             CASE WHEN v[r.i] > 0
                  THEN (CAST(1 AS BIGINT)
                        << ({band_bits - 1} - ((r.i - 1) % {band_bits})))
                  ELSE 0 END AS bit
      FROM e, unnest(range(1, len(v) + 1)) r(i)
    ),
    sig AS (
      SELECT vec_id, band_idx, CAST(SUM(bit) AS BIGINT) AS val
      FROM bits GROUP BY vec_id, band_idx
    )
"""


@register(
    "embedding_binarize",
    oracle=f"""
    WITH {_binary_sig_ctes(16)}
    SELECT vec_id,
           MAX(CASE WHEN band_idx = 0 THEN val END) AS sig0,
           MAX(CASE WHEN band_idx = 1 THEN val END) AS sig1,
           MAX(CASE WHEN band_idx = 2 THEN val END) AS sig2,
           MAX(CASE WHEN band_idx = 3 THEN val END) AS sig3
    FROM sig GROUP BY vec_id ORDER BY vec_id
    """,
)
def q_embedding_binarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit embedding quantization: pack the sign bit of each of
    the 64 dimensions into four 16-bit band integers — a 256-byte
    float vector becomes 32 bytes, and angular similarity becomes
    integer Hamming distance (the storage/recall trade below int8;
    `embedding_quantize_int8` is the 8-bit sibling). Map-only scan,
    integer-exact on both engines."""
    from etl_covid19_spark.operators.similarity import (
        binary_signature_bands,
    )

    emb = _t(spark, sf_dir, "embeddings")
    sigs = binary_signature_bands("embedding", dim=64, band_bits=16)
    return emb.select(
        "vec_id",
        *[s.alias(f"sig{i}") for i, s in enumerate(sigs)],
    ).orderBy("vec_id")


@register(
    "ann_hamming_topk",
    oracle=f"""
    WITH {_binary_sig_ctes(8)},
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM sig q
      JOIN sig c ON q.band_idx = c.band_idx AND q.val = c.val
      WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id
    ),
    ham AS (
      SELECT cand.query_id, cand.neighbor_id,
             CAST(SUM(bit_count(xor(a.val, b.val))) AS INT) AS hamming
      FROM cand
      JOIN sig a ON a.vec_id = cand.query_id
      JOIN sig b ON b.vec_id = cand.neighbor_id
                AND b.band_idx = a.band_idx
      GROUP BY cand.query_id, cand.neighbor_id
    )
    SELECT query_id, neighbor_id, rank, hamming
    FROM (SELECT query_id, neighbor_id, hamming,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY hamming ASC, neighbor_id ASC) AS INT) AS rank
          FROM ham)
    WHERE rank <= 10
    """,
)
def q_ann_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-space ANN over the 1-bit codes: pigeonhole band
    blocking (share ≥1 of eight 8-bit bands — any vector within
    Hamming 7 of a query is GUARANTEED a candidate) generates them
    via a (band_idx, band_val) equi-join, exact integer Hamming
    re-ranks, window top-10 per query. Everything is int64
    arithmetic — approximate retrieval with an EXACT oracle. The
    simhash-dedup blocking shape applied to retrieval; join degree
    = band-bucket size, corpus² never materializes."""
    from etl_covid19_spark.operators.similarity import hamming_banded_topk

    emb = _t(spark, sf_dir, "embeddings")
    return hamming_banded_topk(
        emb,
        emb.filter(F.col("vec_id") < 8),
        "embedding",
        "vec_id",
        k=10,
        dim=64,
        band_bits=8,
    )


@register("bpe_encode_stats", oracle=_bpe_encode_oracle())
def q_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION: train the 20-merge table (bounded
    model parameter, collected once), then re-encode the corpus with
    it and report per-document token counts and chars-per-token
    compression. Map-only corpus pass — the merge folds run
    per-word inside a transform, no shuffle. The oracle re-derives
    the merge table independently (unrolled training rounds — see
    _bpe_encode_oracle), so the hash match covers training AND
    encoding; tests/test_bpe.py additionally pins both against a
    pure-Python reference."""
    from etl_covid19_spark.operators.bpe import (
        bpe_merge_table,
        encode_stats_arrow,
    )

    d = _t(spark, sf_dir, "documents")
    merges = [
        tuple(r)
        for r in bpe_merge_table(
            spark, d, "text", n_merges=20, min_count=2
        ).collect()
    ]
    return encode_stats_arrow(d, "text", merges).orderBy("doc_id")


def _negative_sampling_oracle(n_queries: int = 8, k: int = 5) -> str:
    """GENERATED oracle for negative_sampling: reuses the LSH plane
    literals so DuckDB reproduces the bucket-mate exclusion set, the
    Knuth sampling hash, and the per-query rank exactly."""
    from etl_covid19_spark.operators.similarity import make_planes

    planes = make_planes(64, 6)

    def dot_plane(vcol: str, plane: list[float]) -> str:
        lits = ", ".join(repr(x) for x in plane)
        return (
            f"list_reduce(list_prepend(0.0, list_transform(list_zip({vcol}, "
            f"[{lits}]), p -> struct_extract(p, 1) * struct_extract(p, 2))), "
            f"(x, y) -> x + y)"
        )

    sig = " + ".join(
        f"(CASE WHEN {dot_plane('v', planes[i])} > 0 "
        f"THEN {1 << (6 - 1 - i)} ELSE 0 END)"
        for i in range(6)
    )
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    s AS (SELECT vec_id, {sig} AS bucket FROM e),
    fanout AS (
      SELECT c.vec_id AS cand_id, q.query_id
      FROM s c CROSS JOIN (
        SELECT unnest(range(0, {n_queries})) AS query_id
      ) q
      WHERE c.vec_id <> q.query_id
    ),
    excluded AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id
      FROM s q JOIN s c ON q.bucket = c.bucket
      WHERE q.vec_id < {n_queries}
    ),
    pool AS (
      SELECT f.query_id, f.cand_id,
             ((((f.cand_id % 2147483648) * 31 + f.query_id) % 2147483648)
              * 2654435761) % 4294967296 AS h
      FROM fanout f
      LEFT JOIN excluded x
        ON f.query_id = x.query_id AND f.cand_id = x.cand_id
      WHERE x.cand_id IS NULL
    )
    SELECT query_id, negative_id, sample_rank
    FROM (SELECT query_id, cand_id AS negative_id,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY h ASC, cand_id ASC) AS INT) AS sample_rank
          FROM pool)
    WHERE sample_rank <= {k}
    """


@register("negative_sampling", oracle=_negative_sampling_oracle())
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training:
    for each query vector, pick k pseudo-random negatives from the
    corpus EXCLUDING its approximate neighbors (hyperplane-LSH
    bucket mates — sampling a near-duplicate as a 'negative'
    poisons the loss, the failure hard-negative pipelines guard
    against). The fan-out is a map-side explode of the bounded
    query-id list over the corpus scan (no join), the exclusion is
    a left-anti equi-join on the signature bucket pairs, and the
    'random' choice is the Knuth hash of (candidate, query) — so
    sampling is rerun- and engine-identical, which is what makes a
    SAMPLING operator oracle-checkable at all. Shuffle budget: the
    anti-join on (query_id, cand_id) plus one per-query window."""
    from etl_covid19_spark.operators.similarity import (
        hyperplane_signature,
        make_planes,
    )

    n_queries, k = 8, 5
    emb = _t(spark, sf_dir, "embeddings")
    planes = make_planes(64, 6)
    sigs = emb.select(
        "vec_id", hyperplane_signature("embedding", planes).alias("bucket")
    )
    fanout = (
        sigs.select("vec_id")
        .select(
            F.col("vec_id").alias("cand_id"),
            F.explode(
                F.array(*[F.lit(i) for i in range(n_queries)])
            ).alias("query_id"),
        )
        .where(F.col("cand_id") != F.col("query_id"))
    )
    excluded = (
        F.broadcast(
            sigs.where(F.col("vec_id") < n_queries).select(
                F.col("vec_id").alias("query_id"),
                F.col("bucket"),
            )
        )
        .join(
            sigs.select(F.col("vec_id").alias("cand_id"), "bucket"),
            "bucket",
        )
        .select("query_id", "cand_id")
    )
    pool = fanout.join(excluded, ["query_id", "cand_id"], "left_anti")
    h = (
        (
            ((F.col("cand_id") % F.lit(2147483648)) * 31 + F.col("query_id"))
            % F.lit(2147483648)
        )
        * F.lit(2654435761)
    ) % F.lit(4294967296)
    w = Window.partitionBy("query_id").orderBy(
        F.col("h").asc(), F.col("cand_id").asc()
    )
    return (
        pool.withColumn("h", h)
        .withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .where(F.col("sample_rank") <= k)
        .select(
            "query_id",
            F.col("cand_id").alias("negative_id"),
            "sample_rank",
        )
    )


@register(
    "zipf_fit",
    oracle="""
    WITH tok AS (
      SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                x -> x <> '')) AS token
      FROM documents
    ),
    cnt AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
    top AS (
      SELECT token, c FROM cnt ORDER BY c DESC, token ASC LIMIT 1000
    ),
    ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, token ASC) AS r
      FROM top
    ),
    xy AS (
      SELECT round(ln(r), 8) AS x, round(ln(c), 8) AS y FROM ranked
    ),
    m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,8))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,8))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(x * y AS DECIMAL(38,8))) AS DOUBLE) AS sxy
      FROM xy
    )
    SELECT CAST(n AS BIGINT) AS n_tokens,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n,
                 6) AS zipf_intercept
    FROM m
    """,
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency audit: least-squares slope of
    ln(freq) ~ ln(rank) over the top-1000 vocabulary — natural
    corpora sit near slope −1; a synthetic or templated corpus
    shows up immediately as a flat or kinked fit (the cheap
    anomaly check for scraped training data). The corpus-scale
    work is ONE map-side-combined token aggregate (shared with the
    LM family via the pooled positions frame); the regression runs
    over the bounded 1000-row top-k. ln values are rounded to 8 dp
    BEFORE the moment products so both engines accumulate identical
    decimals — the exact_moments discipline (`aggregates.py:95`)
    applied to a libm input."""
    from etl_covid19_spark.operators.df_cache import (
        SHARED_CACHE,
        corpus_key,
    )

    d = _t(spark, sf_dir, "documents")
    key = ("lm_positions", corpus_key(d), "text", "doc_id")
    pos_frame = SHARED_CACHE.get_or_build(
        key,
        lambda: text.token_positions_arrow(d, "text", "doc_id"),
    )
    cnt = pos_frame.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    top = agg.top_k(
        cnt, [F.col("c").desc(), F.col("token").asc()], 1000
    )
    ranked = top.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), F.col("token").asc()))
        .alias("r"),
    )
    x = F.round(F.log(F.col("r")), 8)
    y = F.round(F.log(F.col("c")), 8)
    dec = "decimal(38,8)"
    m = ranked.select(x.alias("x"), y.alias("y")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(dec))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast(dec))
        .cast("double")
        .alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_tokens"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / F.col("n"), 6
        ).alias("zipf_intercept"),
    )


@register(
    "dedup_containment",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks)-1),
                                   i -> array_to_string(toks[i:i+2], ' '))
               ELSE [array_to_string(toks, ' ')] END) AS grams
      FROM t
    ),
    p AS (SELECT doc_id, len(grams) AS n, unnest(grams) AS sh FROM g),
    c AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb,
             COUNT(*) AS nc
      FROM p a JOIN p b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b, nc * 1.0 / least(na, nb) AS containment
    FROM c WHERE nc * 1.0 / least(na, nb) >= 0.8
    """,
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup pairs (|A∩B| / min set size ≥ 0.8): the
    asymmetric dedup metric that catches quotes and boilerplate
    wrappers — a 50-token doc living verbatim inside a 5000-token
    doc has Jaccard ≈ 0.01 but containment 1.0, so symmetric dedup
    never sees it. Reuses the pooled hashed shingle postings (one
    tokenize/shingle pass shared with the Jaccard/MinHash family);
    the pair join carries 8-byte keys. EXACT over all co-shingled
    pairs — Σ df² work by definition (~35 s at sf1), kept as the
    semantic baseline of the df-capped scale twin
    dedup_containment_capped (same exact/capped pairing as the
    Jaccard family)."""
    from etl_covid19_spark.operators.dedup import containment_pairs

    return containment_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", n=3, threshold=0.8
    )


@register(
    "dedup_containment_capped",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks)-1),
                                   i -> array_to_string(toks[i:i+2], ' '))
               ELSE [array_to_string(toks, ' ')] END) AS grams
      FROM t
    ),
    p AS (SELECT doc_id, unnest(grams) AS sh FROM g),
    keep AS (SELECT sh FROM p GROUP BY sh HAVING COUNT(*) <= 100),
    cp AS (SELECT p.doc_id, p.sh FROM p JOIN keep USING (sh)),
    s AS (SELECT doc_id, COUNT(*) AS n FROM cp GROUP BY doc_id),
    c AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS nc
      FROM cp a JOIN cp b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, nc * 1.0 / least(sa.n, sb.n) AS containment
    FROM c JOIN s sa ON sa.doc_id = doc_a JOIN s sb ON sb.doc_id = doc_b
    WHERE nc * 1.0 / least(sa.n, sb.n) >= 0.8
    """,
)
def q_dedup_containment_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-frequency-capped containment (stop-shingles with df > 100
    dropped, intersection AND min-set denominator recomputed over
    the capped universe) — the skew-hardened scale twin of
    dedup_containment, same discipline as dedup_ngram_jaccard_capped:
    the exact form's Σ df² pair aggregate measured ~35 s at sf1
    (349M co-shingle rows) and is unbounded under boilerplate skew;
    capping bounds join volume at postings·max_df. The exact query
    stays registered as the semantic baseline."""
    from etl_covid19_spark.operators.dedup import containment_pairs_capped

    return containment_pairs_capped(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        n=3, threshold=0.8, max_df=100,
    )


@register(
    "readability_scores",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             x -> x <> '')) AS n_words,
             greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
               AS n_sentences,
             len(regexp_extract_all(lower(text), '[aeiouy]+'))
               AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           round(206.835
                 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                 - 84.6 * (CAST(n_syllables AS DOUBLE)
                           / greatest(n_words, 1)), 6) AS flesch
    FROM m
    """,
)
def q_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document over integer proxies:
    words (whitespace tokens), sentences (runs of [.!?], floor 1),
    syllables (vowel-group runs — the standard heuristic). The
    text-quality filter family's readability axis; everything is a
    map-side regexp count, ratios are doubles of identical integers
    on both engines. Prose scores land ~60-80; token-salad training
    fixtures score deeply negative — either extreme is a filter
    signal."""
    d = _t(spark, sf_dir, "documents")
    n_words = text.token_count("text")
    n_sentences = F.greatest(
        F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
    )
    n_syllables = F.size(
        F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")
    )
    m = d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sentences.alias("n_sentences"),
        n_syllables.alias("n_syllables"),
    )
    return m.withColumn(
        "flesch",
        F.round(
            F.lit(206.835)
            - F.lit(1.015)
            * (F.col("n_words").cast("double") / F.col("n_sentences"))
            - F.lit(84.6)
            * (
                F.col("n_syllables").cast("double")
                / F.greatest(F.col("n_words"), F.lit(1))
            ),
            6,
        ),
    )


@register(
    "incremental_minhash_dedup",
    oracle="""
    WITH d AS (
      SELECT doc_id, text,
             (((doc_id % 2147483648) * 2654435761) % 4294967296) % 100
               AS bucket
      FROM documents
    ),
    t AS (
      SELECT doc_id, bucket,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM d
    ),
    g AS (
      SELECT doc_id, bucket,
             list_distinct(CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks)-1),
                                   i -> array_to_string(toks[i:i+2], ' '))
               ELSE [array_to_string(toks, ' ')] END) AS grams
      FROM t
    ),
    p AS (SELECT doc_id, bucket, len(grams) AS n, unnest(grams) AS sh FROM g),
    c AS (
      SELECT a.doc_id AS corpus_doc, b.doc_id AS delta_doc,
             a.n AS na, b.n AS nb, COUNT(*) AS nc
      FROM p a JOIN p b ON a.sh = b.sh
      WHERE a.bucket < 80 AND b.bucket >= 80
      GROUP BY 1, 2, 3, 4
    )
    SELECT corpus_doc, delta_doc, nc * 1.0 / (na + nb - nc) AS jaccard
    FROM c WHERE nc * 1.0 / (na + nb - nc) >= 0.8
    """,
)
def q_incremental_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest NEAR-dedup: find delta documents (the 'new
    snapshot' — Knuth bucket ≥ 80, the dataset_split arithmetic)
    that near-duplicate the EXISTING corpus (bucket < 80) without
    re-deduping the corpus. Candidates are a corpus×delta MinHash
    band-key equi-join — at 100 TB the corpus signatures are
    computed once per snapshot and pooled; each delta pays only its
    own signatures plus the band join. Recall at J≥0.8 ≈ 1-3e-6,
    so the exact cross-side Jaccard pair set is the oracle (the
    `dedup_minhash_lsh` pattern, restricted to cross-snapshot
    pairs). The exact-hash twin is `incremental_dedup`; this is its
    NEAR-duplicate counterpart."""
    from etl_covid19_spark.operators.dedup import (
        minhash_lsh_pairs_incremental,
    )

    d = _t(spark, sf_dir, "documents")
    bucket = _split_bucket(F.col("doc_id"))
    corpus = d.where(bucket < 80)
    delta = d.where(bucket >= 80)
    return minhash_lsh_pairs_incremental(
        corpus, delta, "text", "doc_id",
        n=3, num_hashes=96, bands=24, threshold=0.8,
    )


@register("compressibility_scores", oracle=None)
def q_compressibility_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal (deflate bytes / raw bytes):
    word salad and boilerplate compress dramatically better than
    prose — the RefinedWeb-family entropy proxy. Arrow kernel emits
    exact byte counts (zlib has no Catalyst/DuckDB expression →
    rows-only at the driver gate); the ratio is a Spark-side double
    of identical integers, and tests/test_functions.py recomputes
    the deflate length byte-for-byte in pure Python."""
    d = _t(spark, sf_dir, "documents")
    staged = text.compressibility_arrow(d, ["doc_id"], "text")
    return staged.select(
        "doc_id",
        "n_bytes",
        "n_deflate",
        F.round(
            F.col("n_deflate")
            / F.greatest(F.col("n_bytes"), F.lit(1)).cast("double"),
            6,
        ).alias("compress_ratio"),
    )


@register(
    "triangle_count",
    oracle=f"""
    WITH knn AS ({_knn_graph_oracle()}),
    und AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM knn
    ),
    tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM und e1
      JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    deg AS (
      SELECT v, COUNT(*) AS d
      FROM (SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und)
      GROUP BY v
    ),
    agg AS (
      SELECT CAST((SELECT COUNT(*) FROM und) AS BIGINT) AS n_edges,
             (SELECT n_triangles FROM tri) AS n_triangles,
             CAST(SUM((d * (d - 1)) // 2) AS BIGINT) AS n_wedges
      FROM deg
    )
    SELECT n_edges, n_triangles, n_wedges,
           round(CASE WHEN n_wedges = 0 THEN 0.0
                      ELSE 3.0 * n_triangles / n_wedges END, 6)
             AS clustering_coefficient
    FROM agg
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient over the
    (undirected) kNN similarity graph — the classic graph statistic
    for 'how clique-ish is my corpus' (high coefficient → dense
    near-duplicate neighborhoods; a quality/dedup prioritization
    signal at corpus scale). Edge list is the bounded |V|·k kNN
    output symmetrized to a<b; triangles come from the standard
    ordered three-way equi-self-join (each join keyed on vertex
    ids, so the join degree is the max vertex degree ≤ 2k after
    symmetrization — never |E|²); wedges are one degree aggregate.
    Completes the graph family next to PageRank and connected
    components."""
    from etl_covid19_spark.operators.similarity import knn_graph

    from etl_covid19_spark.operators.df_cache import (
        SHARED_CACHE,
        corpus_key,
    )

    emb = _t(spark, sf_dir, "embeddings")
    und = SHARED_CACHE.get_or_build(
        ("knn_und_edges", corpus_key(emb), 5, 4, 16),
        lambda: knn_graph(
            emb, "embedding", "vec_id", k=5, band_bits=4, n_bands=16
        )
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct(),
    )
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wedges = deg.agg(
        F.sum((F.col("d") * (F.col("d") - 1)) / 2)
        .cast("bigint")
        .alias("n_wedges")
    )
    edges = und.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    out = agg.attach_scalar(agg.attach_scalar(edges, tri), wedges)
    return out.select(
        "n_edges",
        "n_triangles",
        "n_wedges",
        F.round(
            F.when(F.col("n_wedges") == 0, F.lit(0.0)).otherwise(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges")
            ),
            6,
        ).alias("clustering_coefficient"),
    )


@register(
    "item_cooccurrence",
    oracle="""
    WITH ui0 AS (
      SELECT DISTINCT user_id,
             CAST(json_extract_string(props, '$.k') AS INT) AS item
      FROM events
      WHERE json_extract_string(props, '$.k') IS NOT NULL
    ),
    ranked AS (
      SELECT user_id, item,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY item) AS rn
      FROM ui0
    ),
    ui AS (SELECT user_id, item FROM ranked WHERE rn <= 200),
    tr AS (
      SELECT CAST(COUNT(DISTINCT CASE WHEN rn > 200 THEN user_id END)
                  AS BIGINT) AS truncated_users
      FROM ranked
    ),
    cnt AS (SELECT item, COUNT(*) AS n FROM ui GROUP BY item),
    u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM ui),
    co AS (
      SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_both
      FROM ui a JOIN ui b
        ON a.user_id = b.user_id AND a.item < b.item
      GROUP BY a.item, b.item
    )
    SELECT item_a, item_b, n_both,
           round(CAST(n_both AS DOUBLE) * n_users
                 / (ca.n * cb.n), 6) AS lift,
           round(CAST(n_both AS DOUBLE)
                 / (ca.n + cb.n - n_both), 6) AS jaccard,
           truncated_users
    FROM co
    JOIN cnt ca ON ca.item = co.item_a
    JOIN cnt cb ON cb.item = co.item_b
    CROSS JOIN u
    CROSS JOIN tr
    WHERE n_both >= 20
    ORDER BY lift DESC, item_a ASC, item_b ASC
    LIMIT 20
    """,
)
def q_item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket / co-visitation mining over the event stream:
    top item pairs by lift (and their user-set Jaccard) — the
    collaborative-filtering primitive behind 'users who touched X
    also touched Y'. The user-item incidence is DISTINCT'd first so
    heavy users count once per item, then CAPPED at 200 items per
    user (`operators/behavior.py::item_cooccurrence` — row_number
    over the deterministic item order, `truncated_users` scalar in
    the output) so the pair self-join's per-key fan-out is bounded
    by cap² regardless of skew: one bot user touching 10⁵ items
    would otherwise emit 10¹⁰ pairs from a single key. Same
    heavy-key discipline as `event_sequences`' max_events_per_key.
    Lift and Jaccard are double ratios of exact integer counts
    computed from the SAME capped incidence (internally
    consistent); the oracle applies the identical cap."""
    from etl_covid19_spark.operators import behavior as BHV

    ev = _t(spark, sf_dir, "events")
    ui = ev.select(
        "user_id",
        json_kit.json_path("props", "$.k").cast("int").alias("item"),
    )
    scored = BHV.item_cooccurrence(
        ui, min_support=20, max_items_per_user=200
    )
    return agg.top_k(
        scored,
        [F.col("lift").desc(), F.col("item_a").asc(), F.col("item_b").asc()],
        20,
    ).select(
        "item_a", "item_b", "n_both", "lift", "jaccard", "truncated_users"
    )


@register(
    "attribution_last_touch",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, ts, event_type, value,
             CAST(json_extract_string(props, '$.k') AS INT) AS item
      FROM events
    ),
    attributed AS (
      SELECT user_id, event_id, value,
             LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN item END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_item
      FROM ev
      QUALIFY event_type = 'purchase'
    )
    SELECT touch_item,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           round(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6)
             AS attributed_value
    FROM attributed
    WHERE touch_item IS NOT NULL
    GROUP BY touch_item
    ORDER BY attributed_value DESC, touch_item ASC
    LIMIT 20
    """,
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent PRECEDING non-purchase event's item — the marketing-
    attribution primitive (swap the frame for first-touch; split
    credit across the frame for linear/time-decay models). One
    (user, time) window over one events pass — same shuffle shape
    as sessionization; attribution never joins events to events.
    Revenue sums are decimal-accumulated (partition-invariant),
    ties broken by event_id so the 'last' touch is deterministic."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "value",
        json_kit.json_path("props", "$.k").cast("int").alias("item"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("item")),
        ignorenulls=True,
    ).over(w)
    purchases = (
        ev.withColumn("touch_item", touch)
        .where(F.col("event_type") == "purchase")
        .where(F.col("touch_item").isNotNull())
    )
    out = purchases.groupBy("touch_item").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.round(
            F.sum(F.col("value").cast("decimal(28,10)")).cast("double"), 6
        ).alias("attributed_value"),
    )
    return agg.top_k(
        out,
        [F.col("attributed_value").desc(), F.col("touch_item").asc()],
        20,
    ).select("touch_item", "n_purchases", "attributed_value")


@register(
    "phrase_search",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    hits AS (
      SELECT doc_id, COUNT(*) AS n_hits
      FROM t, unnest(range(1, len(toks) - 1)) r(i)
      WHERE toks[i] = 'table' AND toks[i + 1] = 'value'
            AND toks[i + 2] = 'part'
      GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits
    FROM hits ORDER BY n_hits DESC, doc_id ASC LIMIT 20
    """,
)
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ('table value part') via POSITIONAL
    postings: filter the pooled (doc, pos, token) frame to each
    phrase term, then equi-join consecutive positions on
    (doc, pos+offset) — the classic inverted-index phrase
    algorithm, here as selective-filter-then-join so the join
    inputs are only the matching terms' postings, never the corpus.
    Completes the retrieval family: BM25 (bag of words), RRF hybrid
    (rank fusion), phrase (order-sensitive)."""
    from etl_covid19_spark.operators.df_cache import (
        SHARED_CACHE,
        corpus_key,
    )

    phrase = ["table", "value", "part"]
    d = _t(spark, sf_dir, "documents")
    key = ("lm_positions", corpus_key(d), "text", "doc_id")
    pos_frame = SHARED_CACHE.get_or_build(
        key,
        lambda: text.token_positions_arrow(d, "text", "doc_id"),
    )
    legs = None
    for i, term in enumerate(phrase):
        leg = pos_frame.where(F.col("token") == term).select(
            F.col("_doc"), (F.col("pos") - i).alias("start")
        )
        legs = leg if legs is None else legs.join(leg, ["_doc", "start"])
    hits = legs.groupBy("_doc").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits")
    )
    return agg.top_k(
        hits, [F.col("n_hits").desc(), F.col("_doc").asc()], 20
    ).select(F.col("_doc").alias("doc_id"), "n_hits")


@register(
    "attribution_first_touch",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, ts, event_type, value,
             CAST(json_extract_string(props, '$.k') AS INT) AS item
      FROM events
    ),
    attributed AS (
      SELECT user_id, event_id, value,
             FIRST_VALUE(CASE WHEN event_type <> 'purchase' THEN item END
                         IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_item
      FROM ev
      QUALIFY event_type = 'purchase'
    )
    SELECT touch_item,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           round(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6)
             AS attributed_value
    FROM attributed
    WHERE touch_item IS NOT NULL
    GROUP BY touch_item
    ORDER BY attributed_value DESC, touch_item ASC
    LIMIT 20
    """,
)
def q_attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch twin of `attribution_last_touch`: the purchase
    credits the user's EARLIEST preceding non-purchase event — same
    single (user, time) window pass, FIRST instead of LAST over the
    preceding frame. The two models bracket the multi-touch family
    (linear/time-decay interpolate between them)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "value",
        json_kit.json_path("props", "$.k").cast("int").alias("item"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.first(
        F.when(F.col("event_type") != "purchase", F.col("item")),
        ignorenulls=True,
    ).over(w)
    purchases = (
        ev.withColumn("touch_item", touch)
        .where(F.col("event_type") == "purchase")
        .where(F.col("touch_item").isNotNull())
    )
    out = purchases.groupBy("touch_item").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.round(
            F.sum(F.col("value").cast("decimal(28,10)")).cast("double"), 6
        ).alias("attributed_value"),
    )
    return agg.top_k(
        out,
        [F.col("attributed_value").desc(), F.col("touch_item").asc()],
        20,
    ).select("touch_item", "n_purchases", "attributed_value")


@register(
    "boilerplate_shingles",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks)-1),
                                   i -> array_to_string(toks[i:i+2], ' '))
               ELSE [array_to_string(toks, ' ')] END) AS grams
      FROM t
    ),
    p AS (SELECT doc_id, unnest(grams) AS sh FROM g),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM t)
    SELECT sh AS shingle, CAST(COUNT(*) AS BIGINT) AS df,
           round(CAST(COUNT(*) AS DOUBLE) / n_docs, 6) AS doc_ratio
    FROM p CROSS JOIN n
    GROUP BY sh, n_docs
    ORDER BY df DESC, shingle ASC
    LIMIT 20
    """,
)
def q_boilerplate_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detector: the 3-gram shingles appearing in the
    most DOCUMENTS (doc frequency, not raw count) — the C4-style
    prep step for stripping site chrome, licence footers, and
    navigation text before dedup/training. This query keeps STRING
    shingles (unlike the hashed dedup postings) because the whole
    point is a human-readable removal list; one map-side-combined
    aggregate over distinct shingles per doc. Shingle construction
    runs through the pooled string-gram kernel
    (text.word_shingle_pairs_arrow) — the interpreted HOF form
    measured 89 s at sf1, the kernel ~3 s for identical strings."""
    d = _t(spark, sf_dir, "documents")
    p = text.word_shingle_pairs_arrow(d, "doc_id", "text", 3).select(
        F.col("sh").alias("shingle")
    )
    df_ = p.groupBy("shingle").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    out = agg.attach_scalar(
        df_, d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    ).select(
        "shingle",
        "df",
        F.round(F.col("df").cast("double") / F.col("n_docs"), 6).alias(
            "doc_ratio"
        ),
    )
    return agg.top_k(
        out, [F.col("df").desc(), F.col("shingle").asc()], 20
    ).select("shingle", "df", "doc_ratio")


@register(
    "dup_cluster_sizes",
    oracle="""
    WITH g AS (
      SELECT text, COUNT(*) AS n_copies FROM documents GROUP BY text
    )
    SELECT CAST(n_copies AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(n_copies) AS BIGINT) AS n_docs
    FROM g GROUP BY n_copies ORDER BY cluster_size ASC
    """,
)
def q_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size distribution: how much of the corpus
    sits in exact-duplicate groups of each size — the dataset-card
    number that decides whether dedup is worth a full pass (a long
    tail of big clusters = crawl loops or mirrors). Two chained
    map-side-combined aggregates; at 100 TB the first groups on
    xxhash64(text) like exact_dedup."""
    d = _t(spark, sf_dir, "documents")
    g = d.groupBy("text").agg(F.count(F.lit(1)).alias("n_copies"))
    return (
        g.groupBy(F.col("n_copies").cast("bigint").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum("n_copies").cast("bigint").alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


@register(
    "session_bounce_rate",
    oracle="""
    WITH e AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM e
    ),
    per AS (
      SELECT user_id, sid, COUNT(*) AS n_events,
             epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
      FROM s GROUP BY user_id, sid
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(CASE WHEN n_events = 1 THEN 1 END) AS BIGINT)
             AS n_bounces,
           round(CAST(COUNT(CASE WHEN n_events = 1 THEN 1 END) AS DOUBLE)
                 / COUNT(*), 6) AS bounce_rate,
           round(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6)
             AS avg_events_per_session,
           CAST(SUM(dur_us) // COUNT(*) AS BIGINT) AS avg_duration_us
    FROM per
    """,
)
def q_session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-analytics session summary: bounce rate (one-event
    sessions), events per session, mean session duration — built on
    Spark's NATIVE session_window (30-min gap), summarized in one
    follow-up aggregate; the oracle replays the merge semantics
    with gaps-and-islands SQL. Ratios are doubles of exact integer
    counts; the mean duration is integer microseconds (floor
    division on both engines)."""
    ev = _t(spark, sf_dir, "events")
    per = (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
            ).alias("dur_us"),
        )
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.count(F.when(F.col("n_events") == 1, 1))
        .cast("bigint")
        .alias("n_bounces"),
        F.round(
            F.count(F.when(F.col("n_events") == 1, 1)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("bounce_rate"),
        F.round(
            F.sum("n_events").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_events_per_session"),
        F.floor(F.sum("dur_us") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("avg_duration_us"),
    )


@register(
    "source_language_entropy",
    oracle="""
    WITH c AS (
      SELECT source, lang, COUNT(*) AS n FROM documents
      GROUP BY source, lang
    ),
    t AS (SELECT source, SUM(n) AS total FROM c GROUP BY source),
    e AS (
      SELECT c.source,
             CAST(SUM(CAST(round(
               -1.0 * (CAST(c.n AS DOUBLE) / t.total)
                    * ln(CAST(c.n AS DOUBLE) / t.total), 10)
               AS DECIMAL(28,10))) AS DOUBLE) AS h,
             CAST(MAX(t.total) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_langs
      FROM c JOIN t ON c.source = t.source
      GROUP BY c.source
    )
    SELECT source, n_docs, n_langs, round(h, 6) AS lang_entropy
    FROM e ORDER BY source
    """,
)
def q_source_language_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Shannon entropy of the language mix — the
    data-mixing audit that flags monolingual crawls (entropy ~0)
    and scrambled-metadata sources (entropy ~ln|langs|) before
    weights are assigned. Two chained map-side aggregates; each
    -p·ln p term is rounded to 10 dp and decimal-summed so the
    entropy is partition- and engine-invariant (the exact_moments
    discipline applied to a libm term)."""
    d = _t(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("source").agg(F.sum("n").alias("total"))
    p = F.col("n").cast("double") / F.col("total")
    term = F.round(-p * F.log(p), 10).cast("decimal(28,10)")
    e = (
        c.join(t, "source")
        .groupBy("source")
        .agg(
            F.sum(term).cast("double").alias("h"),
            F.max("total").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_langs"),
        )
    )
    return e.select(
        "source",
        "n_docs",
        "n_langs",
        F.round(F.col("h"), 6).alias("lang_entropy"),
    ).orderBy("source")


@register(
    "source_overlap_matrix",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT source,
             list_distinct(CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks)-1),
                                   i -> array_to_string(toks[i:i+2], ' '))
               ELSE [array_to_string(toks, ' ')] END) AS grams
      FROM t
    ),
    p AS (SELECT DISTINCT source, unnest(grams) AS sh FROM g),
    n AS (SELECT source, COUNT(*) AS n FROM p GROUP BY source),
    c AS (
      SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS n_common
      FROM p a JOIN p b ON a.sh = b.sh AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT source_a, source_b, CAST(n_common AS BIGINT) AS n_common,
           round(CAST(n_common AS DOUBLE)
                 / (na.n + nb.n - n_common), 6) AS jaccard,
           round(CAST(n_common AS DOUBLE) / least(na.n, nb.n), 6)
             AS containment
    FROM c
    JOIN n na ON na.source = c.source_a
    JOIN n nb ON nb.source = c.source_b
    ORDER BY source_a, source_b
    """,
)
def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-source duplication matrix: pairwise Jaccard AND
    containment of the sources' distinct 3-gram shingle sets — the
    mirror/re-crawl detector run before mixing sources into a
    training set (a high-containment pair means one source is
    largely a copy of the other and its mixing weight double-counts
    it). Source-level sets are |sources|·|shingle vocab| — tiny next
    to the corpus — and the pair join is the usual postings
    equi-join. STRING shingles here (human-auditable output), same
    choice as boilerplate_shingles — and the same pooled string-gram
    kernel (87 s of interpreted HOF at sf1 without it)."""
    d = _t(spark, sf_dir, "documents")
    p = text.word_shingle_pairs_arrow(d, "source", "text", 3).distinct()
    n = p.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = p.select(F.col("source").alias("source_a"), "sh")
    b = p.select(F.col("source").alias("source_b"), "sh")
    c = (
        a.join(b, "sh")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    na = n.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    nb = n.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    return (
        c.join(na, "source_a")
        .join(nb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ).alias("jaccard"),
            F.round(
                F.col("n_common").cast("double")
                / F.least(F.col("na"), F.col("nb")),
                6,
            ).alias("containment"),
        )
        .orderBy("source_a", "source_b")
    )


@register(
    "length_drift_ks",
    oracle="""
    WITH lens AS (SELECT source, n_chars FROM documents),
    per AS (
      SELECT source, n_chars, COUNT(*) AS c FROM lens
      GROUP BY source, n_chars
    ),
    tot AS (SELECT source, SUM(c) AS n_s FROM per GROUP BY source),
    grand AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM per),
    gx AS (
      SELECT n_chars,
             SUM(SUM(c)) OVER (ORDER BY n_chars
                 ROWS UNBOUNDED PRECEDING) AS cum_all
      FROM per GROUP BY n_chars
    ),
    grid AS (
      SELECT t.source, x.n_chars, x.cum_all, t.n_s
      FROM tot t CROSS JOIN gx x
    ),
    cum AS (
      SELECT g.source, g.n_chars, g.cum_all, g.n_s,
             SUM(COALESCE(p.c, 0)) OVER (PARTITION BY g.source
                 ORDER BY g.n_chars ROWS UNBOUNDED PRECEDING) AS cum_in
      FROM grid g
      LEFT JOIN per p
        ON p.source = g.source AND p.n_chars = g.n_chars
    )
    SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_docs,
           round(MAX(abs(CAST(cum_in AS DOUBLE) / n_s
                 - CAST(cum_all - cum_in AS DOUBLE)
                   / (grand.n - n_s))), 6) AS ks_stat
    FROM cum CROSS JOIN grand
    GROUP BY source ORDER BY source
    """,
)
def q_length_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift audit: the exact two-sample
    Kolmogorov-Smirnov statistic of each source's document-length
    distribution against the REST of the corpus — the statistical
    test behind 'did this crawl change shape' monitoring (KS needs
    no binning choices, unlike the chi-square already in the
    registry). Exact: both CDFs are ratios of integer cumulative
    counts evaluated on the observed support, where the sup of the
    difference is attained. The grid is a stats-table cross product
    (|sources| × |distinct lengths| — bounded model-sized frames,
    never row-level data)."""
    d = _t(spark, sf_dir, "documents")
    per = d.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = per.groupBy("source").agg(F.sum("c").alias("n_s"))
    grand = per.agg(F.sum("c").cast("bigint").alias("n"))
    gx = (
        per.groupBy("n_chars")
        .agg(F.sum("c").alias("cx"))
        .withColumn(
            "cum_all",
            F.sum("cx").over(
                Window.orderBy("n_chars").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
        .drop("cx")
    )
    grid = tot.crossJoin(gx)
    cum = grid.join(per, ["source", "n_chars"], "left").withColumn(
        "cum_in",
        F.sum(F.coalesce(F.col("c"), F.lit(0))).over(
            Window.partitionBy("source")
            .orderBy("n_chars")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    scored = agg.attach_scalar(cum, grand).withColumn(
        "d",
        F.abs(
            F.col("cum_in").cast("double") / F.col("n_s")
            - (F.col("cum_all") - F.col("cum_in")).cast("double")
            / (F.col("n") - F.col("n_s"))
        ),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.max("n_s").cast("bigint").alias("n_docs"),
            F.round(F.max("d"), 6).alias("ks_stat"),
        )
        .orderBy("source")
    )


@register(
    "filter_funnel",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(trim(text), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    m AS (
      SELECT doc_id, text,
             len(toks) AS n_tokens,
             list_reduce(list_prepend(0, list_transform(toks, x -> length(x))),
                         (a, b) -> a + b)
               / greatest(len(toks), 1) AS mean_word_len,
             ((length(text) - length(replace(text, '#', '')))
              + (length(text) - length(replace(text, '...', ''))) / 3)
               / greatest(len(toks), 1) AS symbol_ratio,
             len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
               / greatest(len(toks), 1) AS alpha_word_frac,
             len(list_intersect(
                   list_distinct(list_transform(toks, x -> lower(x))),
                   ['the','be','to','of','and','that','have','with']))
               AS n_stop_distinct
      FROM t
    ),
    c AS (
      SELECT doc_id, text,
             (n_tokens BETWEEN 50 AND 100000) AS c1,
             (n_tokens BETWEEN 50 AND 100000)
               AND (mean_word_len BETWEEN 3 AND 10) AS c2,
             (n_tokens BETWEEN 50 AND 100000)
               AND (mean_word_len BETWEEN 3 AND 10)
               AND (symbol_ratio <= 0.1) AS c3,
             (n_tokens BETWEEN 50 AND 100000)
               AND (mean_word_len BETWEEN 3 AND 10)
               AND (symbol_ratio <= 0.1)
               AND (alpha_word_frac >= 0.8) AS c4,
             (n_tokens BETWEEN 50 AND 100000)
               AND (mean_word_len BETWEEN 3 AND 10)
               AND (symbol_ratio <= 0.1)
               AND (alpha_word_frac >= 0.8)
               AND (n_stop_distinct >= 2) AS c5
      FROM m
    ),
    k AS (
      SELECT *,
             c5 AND doc_id = MIN(CASE WHEN c5 THEN doc_id END)
                             OVER (PARTITION BY text) AS c6
      FROM c
    ),
    n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN c3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
             CAST(SUM(CASE WHEN c4 THEN 1 ELSE 0 END) AS BIGINT) AS n4,
             CAST(SUM(CASE WHEN c5 THEN 1 ELSE 0 END) AS BIGINT) AS n5,
             CAST(SUM(CASE WHEN c6 THEN 1 ELSE 0 END) AS BIGINT) AS n6
      FROM k
    )
    SELECT * FROM (
      SELECT 1 AS stage_idx, 'token_count' AS stage, n0 AS docs_in,
             n1 AS docs_out, n0 - n1 AS dropped,
             round(CAST(n0 - n1 AS DOUBLE) / greatest(n0, 1), 6) AS drop_frac
      FROM n
      UNION ALL SELECT 2, 'word_shape', n1, n2, n1 - n2,
             round(CAST(n1 - n2 AS DOUBLE) / greatest(n1, 1), 6) FROM n
      UNION ALL SELECT 3, 'symbol_ratio', n2, n3, n2 - n3,
             round(CAST(n2 - n3 AS DOUBLE) / greatest(n2, 1), 6) FROM n
      UNION ALL SELECT 4, 'alpha_words', n3, n4, n3 - n4,
             round(CAST(n3 - n4 AS DOUBLE) / greatest(n3, 1), 6) FROM n
      UNION ALL SELECT 5, 'stopwords', n4, n5, n4 - n5,
             round(CAST(n4 - n5 AS DOUBLE) / greatest(n4, 1), 6) FROM n
      UNION ALL SELECT 6, 'exact_dedup', n5, n6, n5 - n6,
             round(CAST(n5 - n6 AS DOUBLE) / greatest(n5, 1), 6) FROM n
    ) ORDER BY stage_idx
    """,
)
def q_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The filter FUNNEL datacard: every curation pipeline publishes
    not just its survivors but how many documents each rule removed
    INCREMENTALLY (the FineWeb/Dolma 'removal cascade' table —
    without it you cannot tell an aggressive rule from a dead one,
    or notice that a rule upstream starves one downstream).
    Stages: the five Gopher rules in their published order, then
    exact dedup keep-first among rule survivors. One corpus pass:
    per-doc metrics → cumulative stage flags → min-survivor-id
    window for the dedup stage → a single-row aggregate stacked to
    one row per stage. The only shuffles are the dedup-key window
    and the final 1-row agg — the funnel adds NO pass over the
    corpus beyond what the rules themselves read. Rule metrics ride
    the Arrow counting kernel (`gopher_from_counts` replay — the
    HOF rule stack was the measured bulk of this query's sf10
    cost)."""
    d = _t(spark, sf_dir, "documents")
    staged = text.quality_counts_arrow(
        d.select("doc_id", "text", F.col("text").alias("_scan")),
        ["doc_id", "text"],
        "_scan",
        with_gopher=True,
    )
    m = text.gopher_from_counts()
    flags = staged.select(
        "doc_id",
        "text",
        (m["n_tokens"].between(50, 100000)).alias("r1"),
        (m["mean_word_len"].between(3, 10)).alias("r2"),
        (m["symbol_ratio"] <= 0.1).alias("r3"),
        (m["alpha_word_frac"] >= 0.8).alias("r4"),
        (m["n_stop_distinct"] >= 2).alias("r5"),
    )
    c = flags.select(
        "doc_id",
        "text",
        F.col("r1").alias("c1"),
        (F.col("r1") & F.col("r2")).alias("c2"),
        (F.col("r1") & F.col("r2") & F.col("r3")).alias("c3"),
        (F.col("r1") & F.col("r2") & F.col("r3") & F.col("r4")).alias("c4"),
        (
            F.col("r1") & F.col("r2") & F.col("r3") & F.col("r4")
            & F.col("r5")
        ).alias("c5"),
    )
    w = Window.partitionBy(F.xxhash64("text"), F.length("text"))
    k = c.withColumn(
        "c6",
        F.col("c5")
        & (
            F.col("doc_id")
            == F.min(F.when(F.col("c5"), F.col("doc_id"))).over(w)
        ),
    )
    n = k.agg(
        F.count(F.lit(1)).cast("bigint").alias("n0"),
        *[
            F.sum(F.col(f"c{i}").cast("bigint"))
            .cast("bigint")
            .alias(f"n{i}")
            for i in range(1, 7)
        ],
    )
    stages = [
        "token_count", "word_shape", "symbol_ratio",
        "alpha_words", "stopwords", "exact_dedup",
    ]
    stack_expr = ", ".join(
        f"{i + 1}, '{s}', n{i}, n{i + 1}" for i, s in enumerate(stages)
    )
    tall = n.selectExpr(
        f"stack({len(stages)}, {stack_expr})"
        " AS (stage_idx, stage, docs_in, docs_out)"
    )
    return tall.select(
        "stage_idx",
        "stage",
        "docs_in",
        "docs_out",
        (F.col("docs_in") - F.col("docs_out")).alias("dropped"),
        F.round(
            (F.col("docs_in") - F.col("docs_out")).cast("double")
            / F.greatest(F.col("docs_in"), F.lit(1)),
            6,
        ).alias("drop_frac"),
    ).orderBy("stage_idx")


@register(
    "normalized_exact_dedup",
    oracle=r"""
    WITH norm AS (
      SELECT doc_id,
             text AS raw,
             trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
               '\s+', ' ', 'g')) AS ntext
      FROM documents
    ),
    g AS (
      SELECT ntext,
             CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT raw) AS BIGINT) AS n_raw_variants
      FROM norm GROUP BY ntext
    )
    SELECT keeper_doc_id, n_docs, n_raw_variants
    FROM g WHERE n_docs > 1
    ORDER BY n_docs DESC, keeper_doc_id ASC
    LIMIT 50
    """,
)
def q_normalized_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NORMALIZED exact dedup (the C4/CCNet canonicalization step):
    lowercase → strip non-alphanumerics → collapse whitespace, then
    group identical normalized bodies. Catches the near-identical
    variants plain exact dedup misses (case, punctuation,
    reflowing); `n_raw_variants > 1` rows are exactly the value-add
    over `dedup_exact`. Top-50 classes by size, deterministic
    tiebreak.

    Shuffle discipline (round-9 sf100 finding): the original
    `countDistinct(raw)` shuffled every distinct normalized BODY
    corpus-wide (398.7 s at 5M docs), and a two-pass
    semi-join-the-dup-classes variant was WORSE once the class list
    outgrew broadcast (SMJ re-shuffled the bodies anyway, >900 s).
    The scale-stable form counts distinct raw variants through
    `xxhash64(raw)` — an 8-byte stand-in for the body — so the one
    aggregate shuffles a constant ~32-byte row (class key, doc_id,
    raw hash) regardless of document size, with no broadcast
    assumption on the number of dup classes. A 64-bit collision
    (P ≈ n²·2⁻⁶⁴ within one class) could undercount variants by
    one; the oracle's COUNT(DISTINCT raw) agrees whenever no
    collision occurs, i.e. always in practice."""
    d = _t(spark, sf_dir, "documents")
    # One fused regex pass instead of strip-then-collapse: a maximal
    # run of non-alphanumerics (each char either whitespace or
    # junk-replaced-by-space) becomes exactly one space under both
    # forms, so the output string is identical — verified 0 differing
    # rows over the full 5M-doc sf100 entropic corpus, oracle
    # (which keeps the two-pass spelling) green at sf0.01/sf0.1.
    # The collapse pass dominated the query: its ~one-match-per-gap
    # rebuild over every document body measured 361.3 -> 28.6 s
    # (12.6x) at sf100 entropic (guide §4 — per-row work is the
    # operator; OPTIMIZATION_r12.md "normalized_exact_dedup").
    ntext = F.trim(
        F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]+", " ")
    )
    g = (
        d.select(
            "doc_id",
            F.xxhash64("text").alias("_raw_h"),
            F.xxhash64(ntext).alias("_h"),
            F.length(ntext).alias("_l"),
        )
        .groupBy("_h", "_l")
        .agg(
            F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("_raw_h").cast("bigint").alias("n_raw_variants"),
        )
        .where(F.col("n_docs") > 1)
    )
    return agg.top_k(
        g.select("keeper_doc_id", "n_docs", "n_raw_variants"),
        [F.col("n_docs").desc(), F.col("keeper_doc_id").asc()],
        50,
    )


@register(
    "attribution_linear",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, ts, event_type, value,
             CAST(json_extract_string(props, '$.k') AS INT) AS item,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS seg
      FROM events
    ),
    touches AS (
      SELECT user_id, seg, item
      FROM ev WHERE event_type <> 'purchase' AND item IS NOT NULL
    ),
    purch AS (
      SELECT user_id, seg,
             SUM(CAST(value AS DECIMAL(28,10))) AS seg_value
      FROM ev WHERE event_type = 'purchase'
      GROUP BY user_id, seg
    ),
    segn AS (
      SELECT user_id, seg, COUNT(*) AS n_touches
      FROM touches GROUP BY user_id, seg
    ),
    credited AS (
      SELECT t.item,
             CAST(p.seg_value AS DOUBLE) / s.n_touches AS credit
      FROM touches t
      JOIN segn s ON s.user_id = t.user_id AND s.seg = t.seg
      JOIN purch p ON p.user_id = t.user_id AND p.seg = t.seg
    )
    SELECT item,
           CAST(COUNT(*) AS BIGINT) AS n_credited_touches,
           round(CAST(SUM(CAST(credit AS DECIMAL(28,10))) AS DOUBLE), 6)
             AS attributed_value
    FROM credited
    GROUP BY item
    ORDER BY attributed_value DESC, item ASC
    LIMIT 20
    """,
)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR (equal-split) multi-touch attribution — the third of
    the attribution family after first/last touch: each purchase's
    value divides equally among ALL the user's non-purchase touches
    since their previous purchase. Segmenting is one running count
    of preceding purchases over the (user, time) window — a touch
    and the purchase it precedes share the same segment number, so
    attribution is an equi-join on (user, segment), never an
    event-to-event range join. Per-touch credit is a single IEEE
    division (identical both engines); per-item totals re-enter the
    proven DECIMAL-accumulate → DOUBLE discipline so the sum is
    partition-invariant."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "value",
        json_kit.json_path("props", "$.k").cast("int").alias("item"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seg = F.count(
        F.when(F.col("event_type") == "purchase", F.lit(1))
    ).over(w)
    e = ev.withColumn("seg", seg)
    touches = e.where(
        (F.col("event_type") != "purchase") & F.col("item").isNotNull()
    ).select("user_id", "seg", "item")
    purch = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "seg")
        .agg(
            F.sum(F.col("value").cast("decimal(28,10)")).alias("seg_value")
        )
    )
    segn = touches.groupBy("user_id", "seg").agg(
        F.count(F.lit(1)).alias("n_touches")
    )
    credited = (
        touches.join(segn, ["user_id", "seg"])
        .join(purch, ["user_id", "seg"])
        .select(
            "item",
            (
                F.col("seg_value").cast("double") / F.col("n_touches")
            ).alias("credit"),
        )
    )
    out = credited.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_credited_touches"),
        F.round(
            F.sum(F.col("credit").cast("decimal(28,10)")).cast("double"),
            6,
        ).alias("attributed_value"),
    )
    return agg.top_k(
        out,
        [F.col("attributed_value").desc(), F.col("item").asc()],
        20,
    ).select("item", "n_credited_touches", "attributed_value")


@register(
    "item_item_recs",
    oracle="""
    WITH ui0 AS (
      SELECT DISTINCT user_id,
             CAST(json_extract_string(props, '$.k') AS INT) AS item
      FROM events
      WHERE json_extract_string(props, '$.k') IS NOT NULL
    ),
    ranked AS (
      SELECT user_id, item,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY item) AS rn
      FROM ui0
    ),
    ui AS (SELECT user_id, item FROM ranked WHERE rn <= 200),
    cnt AS (SELECT item, COUNT(*) AS n FROM ui GROUP BY item),
    u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM ui),
    co AS (
      SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_both
      FROM ui a JOIN ui b
        ON a.user_id = b.user_id AND a.item < b.item
      GROUP BY a.item, b.item
    ),
    scored AS (
      SELECT item_a, item_b, n_both,
             round(CAST(n_both AS DOUBLE) * n_users
                   / (ca.n * cb.n), 6) AS lift
      FROM co
      JOIN cnt ca ON ca.item = co.item_a
      JOIN cnt cb ON cb.item = co.item_b
      CROSS JOIN u
      WHERE n_both >= 10
    ),
    sym AS (
      SELECT item_a AS src, item_b AS rec, n_both, lift FROM scored
      UNION ALL
      SELECT item_b, item_a, n_both, lift FROM scored
    )
    SELECT src, rec, n_both, lift, CAST(rnk AS INT) AS rnk FROM (
      SELECT src, rec, n_both, lift,
             ROW_NUMBER() OVER (PARTITION BY src
                                ORDER BY lift DESC, rec ASC) AS rnk
      FROM sym
    ) WHERE rnk <= 3
    ORDER BY src, rnk
    """,
)
def q_item_item_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering RECOMMENDATIONS: each
    item's top-3 co-items by lift ('users who touched X also
    touched Y'), built on the SAME capped co-occurrence operator as
    `item_cooccurrence` (cap² pair-fanout bound) — the pair set is
    symmetrized (both directions of each a<b pair) and ranked with
    a per-source window, so no task ever sorts more than one item's
    candidate list. This is the serving-side artifact the global
    top-pairs query is the diagnostic for."""
    from etl_covid19_spark.operators import behavior as BHV

    ev = _t(spark, sf_dir, "events")
    ui = ev.select(
        "user_id",
        json_kit.json_path("props", "$.k").cast("int").alias("item"),
    )
    scored = BHV.item_cooccurrence(
        ui, min_support=10, max_items_per_user=200
    ).select("item_a", "item_b", "n_both", "lift")
    sym = scored.select(
        F.col("item_a").alias("src"),
        F.col("item_b").alias("rec"),
        "n_both",
        "lift",
    ).unionByName(
        scored.select(
            F.col("item_b").alias("src"),
            F.col("item_a").alias("rec"),
            "n_both",
            "lift",
        )
    )
    w = Window.partitionBy("src").orderBy(
        F.col("lift").desc(), F.col("rec").asc()
    )
    return (
        sym.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= 3)
        .select("src", "rec", "n_both", "lift", "rnk")
        .orderBy("src", "rnk")
    )


def _hll_portable_parts(p_bits: int = 10):
    """Shared constants + generated expressions for the PORTABLE
    HyperLogLog (see q_sketch_distinct_users_portable). Everything
    is integer or exact-power-of-two double arithmetic, so Spark
    and DuckDB produce bit-identical estimates:

    - the hash is an affine -> SQUARE -> affine -> square chain mod
      P (2^31-1): squaring supplies the non-linearity a bare affine
      map lacks (sequential ids through an affine map alone biased
      the n>>m regime by +54%, measured; the quadratic chain is
      within 1σ across n = 5k..200k). Every product stays < 2^62 —
      ANSI long overflow is a throw, not a wrap;
    - rho (position of the lowest set bit, 1-based; 32 for w=0) is
      a generated 31-arm CASE ladder — pure integer comparisons,
      no log2() float edge cases;
    - 2^-M terms are 1.0/(1<<M): exact doubles whose sum over ≤2^p
      buckets spans < 52 mantissa bits, so the SUM is exact under
      ANY accumulation order — partition-invariant by construction;
    - the small-range correction m·ln(m/zeros) divides exact
      integers before one libm ln() call, identical IEEE input on
      both engines.

    The step expressions are ONE shared string per stage (the
    arithmetic subset of SQL that Spark and DuckDB parse
    identically), so the two engines cannot drift."""
    m = 1 << p_bits
    alpha = 0.7213 / (1.0 + 1.079 / m)
    a1, b1, a2, b2 = 1103515245, 12345, 1299709, 7919
    P = 2147483647
    steps = {
        "h": f"({a1} * (user_id % {P}) + {b1}) % {P}",
        "h2": f"(h * h) % {P}",
        "g": f"({a2} * h2 + {b2}) % {P}",
        "w": f"(g * g) % {P}",
        "bucket": f"h2 % {m}",
    }
    rho_arms = " ".join(
        f"WHEN w % {1 << (k + 1)} = {1 << k} THEN {k + 1}"
        for k in range(31)
    )
    rho = f"CASE WHEN w = 0 THEN 32 {rho_arms} END"
    return m, alpha, steps, rho


@register(
    "sketch_distinct_users_portable",
    oracle=(lambda: (lambda m, alpha, S, rho: f"""
    WITH s1 AS (SELECT event_type, {S['h']} AS h FROM events),
    s2 AS (SELECT event_type, {S['h2']} AS h2 FROM s1),
    s3 AS (SELECT event_type, h2, {S['g']} AS g FROM s2),
    s4 AS (SELECT event_type, {S['bucket']} AS bucket,
                  {S['w']} AS w FROM s3),
    r AS (SELECT event_type, bucket, {rho} AS rho FROM s4),
    regs AS (
      SELECT event_type, bucket, MAX(rho) AS M
      FROM r GROUP BY event_type, bucket
    ),
    s AS (
      SELECT event_type,
             SUM(CAST(1.0 AS DOUBLE) / (CAST(1 AS BIGINT) << M))
               AS s_present,
             COUNT(*) AS n_present
      FROM regs GROUP BY event_type
    ),
    est AS (
      SELECT event_type,
             CAST({alpha!r} AS DOUBLE) * {m} * {m}
               / (s_present + ({m} - n_present)) AS e_raw,
             {m} - n_present AS zeros
      FROM s
    ),
    ex AS (
      SELECT event_type,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
      FROM events GROUP BY event_type
    )
    SELECT est.event_type,
           round(CASE WHEN e_raw <= CAST(2.5 AS DOUBLE) * {m} AND zeros > 0
                      THEN {m} * ln(CAST({m} AS DOUBLE) / zeros)
                      ELSE e_raw END, 6) AS hll_users,
           exact_users
    FROM est JOIN ex ON ex.event_type = est.event_type
    ORDER BY est.event_type
    """)(*_hll_portable_parts()))(),
)
def q_sketch_distinct_users_portable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PORTABLE HyperLogLog distinct-user estimate per event type —
    the engine-agnostic twin of `sketch_distinct_users` (which uses
    Spark's DataSketches HLL and is therefore estimate-valued /
    rows-only). This one is built from first principles out of
    integer hashes, a generated rho CASE ladder, and exact
    power-of-two sums (`_hll_portable_parts`), so the ESTIMATE
    ITSELF is deterministic and hash-matches DuckDB running the
    same arithmetic — an approximate algorithm with an exact
    differential oracle. Scale shape is the HLL point: the shuffle
    carries ≤ (types × 2^p) register rows, never the user-id key
    set; `exact_users` rides along as the self-audit (drop it in
    production — it is the cost the sketch exists to avoid)."""
    m, alpha, S, rho = _hll_portable_parts()
    ev = _t(spark, sf_dir, "events")
    staged = (
        ev.selectExpr("event_type", f"{S['h']} AS h")
        .selectExpr("event_type", f"{S['h2']} AS h2")
        .selectExpr("event_type", "h2", f"{S['g']} AS g")
        .selectExpr(
            "event_type", f"{S['bucket']} AS bucket", f"{S['w']} AS w"
        )
    )
    r = staged.selectExpr("event_type", "bucket", f"{rho} AS rho")
    regs = r.groupBy("event_type", "bucket").agg(
        F.max("rho").alias("M")
    )
    s = regs.groupBy("event_type").agg(
        F.sum(
            F.lit(1.0) / F.expr("shiftleft(CAST(1 AS BIGINT), M)")
        ).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    est = s.select(
        "event_type",
        (
            F.lit(alpha * m * m)
            / (F.col("s_present") + (F.lit(m) - F.col("n_present")))
        ).alias("e_raw"),
        (F.lit(m) - F.col("n_present")).alias("zeros"),
    )
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    corrected = F.when(
        (F.col("e_raw") <= 2.5 * m) & (F.col("zeros") > 0),
        F.lit(m)
        * F.log(F.lit(float(m)) / F.col("zeros").cast("double")),
    ).otherwise(F.col("e_raw"))
    return (
        est.join(ex, "event_type")
        .select(
            "event_type",
            F.round(corrected, 6).alias("hll_users"),
            "exact_users",
        )
        .orderBy("event_type")
    )


def _weighted_sample_parts(alpha: float = 0.7, k: int = 200):
    """Shared expressions for the deterministic weighted sampler
    (Efraimidis-Spirakis priority sampling): u comes from the same
    quadratic hash chain as the portable HLL but seeded by doc_id,
    mapped into (0, 1] by dividing by 2^31 (a power of two — the
    division is EXACT, so u is bit-identical across engines); the
    priority is ln(u) · n_source^(1-alpha) (equivalent ordering to
    the textbook u^(1/w) with per-doc weight w = n^(alpha-1), via
    one ln/exp pair — the only libm calls, applied to identical
    IEEE inputs)."""
    P = 2147483647
    steps = {
        "h": f"(1103515245 * (doc_id % {P}) + 12345) % {P}",
        "h2": f"(h * h) % {P}",
        "g": f"(1299709 * h2 + 7919) % {P}",
        "w4": f"(g * g) % {P}",
        "u": f"CAST(w4 + 1 AS DOUBLE) / 2147483648",
        "inv_w": f"exp(CAST({1.0 - alpha!r} AS DOUBLE) * ln(CAST(n_src AS DOUBLE)))",
        "priority": "ln(u) * inv_w",
    }
    return steps, k


@register(
    "weighted_corpus_sample",
    oracle=(lambda: (lambda S, k: f"""
    WITH cnt AS (
      SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source
    ),
    s1 AS (
      SELECT d.doc_id, d.source, c.n_src, {S['h']} AS h
      FROM documents d JOIN cnt c ON c.source = d.source
    ),
    s2 AS (SELECT doc_id, source, n_src, {S['h2']} AS h2 FROM s1),
    s3 AS (SELECT doc_id, source, n_src, {S['g']} AS g FROM s2),
    s4 AS (SELECT doc_id, source, n_src, {S['w4']} AS w4 FROM s3),
    s5 AS (SELECT doc_id, source, n_src, {S['u']} AS u FROM s4),
    s6 AS (SELECT doc_id, source, u, {S['inv_w']} AS inv_w FROM s5),
    keyed AS (SELECT doc_id, source, {S['priority']} AS priority FROM s6)
    SELECT doc_id, source FROM keyed
    ORDER BY priority DESC, doc_id ASC
    LIMIT {k}
    """)(*_weighted_sample_parts()))(),
)
def q_weighted_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED corpus sampling (Efraimidis-Spirakis
    2006 priority sampling): draw exactly k documents with
    per-source inclusion odds ∝ n_source^alpha — the reproducible
    one-pass alternative to quota allocation (`temperature_mix`):
    no per-group quotas, no rejection, a re-run or a resumed job
    selects the IDENTICAL sample because the 'randomness' is the
    quadratic hash of doc_id. Scale shape: the per-doc priority is
    map-side (source counts broadcast), and exactly-k selection is
    TakeOrderedAndProject — each partition keeps k candidates, the
    driver merges; no global sort. The textbook u^(1/w) ordering is
    computed as ln(u)·n^(1-alpha) so both engines run one identical
    ln/exp pair instead of pow()."""
    S, k = _weighted_sample_parts()
    d = _t(spark, sf_dir, "documents")
    cnt = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    staged = (
        d.select("doc_id", "source")
        .join(F.broadcast(cnt), "source")
        .selectExpr("doc_id", "source", "n_src", f"{S['h']} AS h")
        .selectExpr("doc_id", "source", "n_src", f"{S['h2']} AS h2")
        .selectExpr("doc_id", "source", "n_src", f"{S['g']} AS g")
        .selectExpr("doc_id", "source", "n_src", f"{S['w4']} AS w4")
        .selectExpr("doc_id", "source", "n_src", f"{S['u']} AS u")
        .selectExpr("doc_id", "source", "u", f"{S['inv_w']} AS inv_w")
        .selectExpr("doc_id", "source", f"{S['priority']} AS priority")
    )
    return agg.top_k(
        staged,
        [F.col("priority").desc(), F.col("doc_id").asc()],
        k,
    ).select("doc_id", "source")


@register(
    "length_drift_psi",
    oracle="""
    WITH b AS (
      SELECT source,
             CAST(floor(ln(CAST(greatest(length(text), 1) AS DOUBLE))
                        / ln(CAST(2 AS DOUBLE))) AS INT) AS bucket
      FROM documents
    ),
    per AS (
      SELECT source, bucket, COUNT(*) AS n
      FROM b GROUP BY source, bucket
    ),
    stot AS (SELECT source, SUM(n) AS n_s FROM per GROUP BY source),
    ctot AS (SELECT bucket, SUM(n) AS n_b FROM per GROUP BY bucket),
    grand AS (SELECT SUM(n) AS n FROM per),
    grid AS (
      SELECT st.source, ct.bucket, st.n_s, ct.n_b, g.n,
             COALESCE(p.n, 0) AS n_sb
      FROM stot st
      CROSS JOIN ctot ct
      CROSS JOIN grand g
      LEFT JOIN per p ON p.source = st.source AND p.bucket = ct.bucket
    ),
    terms AS (
      SELECT source,
             (greatest(CAST(n_sb AS DOUBLE) / n_s, CAST(0.000001 AS DOUBLE))
              - greatest(CAST(n_b AS DOUBLE) / n, CAST(0.000001 AS DOUBLE)))
             * ln(greatest(CAST(n_sb AS DOUBLE) / n_s,
                           CAST(0.000001 AS DOUBLE))
                  / greatest(CAST(n_b AS DOUBLE) / n,
                             CAST(0.000001 AS DOUBLE))) AS term
      FROM grid
    )
    SELECT source,
           round(CAST(SUM(CAST(term AS DECIMAL(28,18))) AS DOUBLE), 6)
             AS psi
    FROM terms GROUP BY source ORDER BY source
    """,
)
def q_length_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per source against the whole-corpus
    length distribution — the industry-standard drift score next to
    the exact KS test (`length_drift_ks`), and unlike KS it needs NO
    global order: buckets are fixed log₂-width length bands (a pure
    map-side expression), so the whole query is two small hash
    aggregates over (source × ~20 buckets) — the same plan at 100 TB.
    Shares are clamped at 1e-6 (the standard zero-bin guard) and the
    term sum is DECIMAL-accumulated for partition invariance.
    PSI < 0.1 ≈ stable, 0.1-0.25 ≈ moderate shift, > 0.25 ≈ major."""
    d = _t(spark, sf_dir, "documents")
    b = d.select(
        "source",
        F.floor(
            F.log(F.greatest(F.length("text"), F.lit(1)).cast("double"))
            / F.log(F.lit(2.0))
        )
        .cast("int")
        .alias("bucket"),
    )
    per = b.groupBy("source", "bucket").agg(F.count(F.lit(1)).alias("n"))
    stot = per.groupBy("source").agg(F.sum("n").alias("n_s"))
    ctot = per.groupBy("bucket").agg(F.sum("n").alias("n_b"))
    grand = per.agg(F.sum("n").alias("n_all"))
    grid = (
        stot.crossJoin(F.broadcast(ctot))
        .join(per, ["source", "bucket"], "left")
        .withColumn("n_sb", F.coalesce(F.col("n"), F.lit(0)))
        .drop("n")
    )
    grid = agg.attach_scalar(grid, grand)
    eps = F.lit(0.000001)
    p_s = F.greatest(F.col("n_sb").cast("double") / F.col("n_s"), eps)
    p_c = F.greatest(F.col("n_b").cast("double") / F.col("n_all"), eps)
    terms = grid.select(
        "source", ((p_s - p_c) * F.log(p_s / p_c)).alias("term")
    )
    return (
        terms.groupBy("source")
        .agg(
            F.round(
                F.sum(F.col("term").cast("decimal(28,18)")).cast("double"),
                6,
            ).alias("psi")
        )
        .orderBy("source")
    )


def _near_dup_hyperplane_oracle(
    threshold: float = 0.9,
    band_bits: int = 12,
    n_bands: int = 24,
    dim: int = 64,
) -> str:
    """GENERATED oracle for the tight-threshold hyperplane-banded
    near-dup: every plane dot is the SAME left-to-right fold the
    Arrow kernel replays (bit-exact band keys — the proven
    negative_sampling/ann pattern), band keys are CASE packs, and
    verification is the exact fold cosine."""
    from etl_covid19_spark.operators.similarity import make_planes

    planes = make_planes(dim, band_bits * n_bands)

    def dot_plane(plane: list[float]) -> str:
        lits = ", ".join(repr(x) for x in plane)
        return (
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(list_zip(v, [{lits}]), "
            "p -> struct_extract(p, 1) * struct_extract(p, 2))), "
            "(x, y) -> x + y)"
        )

    band_keys = []
    for band in range(n_bands):
        bits = " + ".join(
            f"(CASE WHEN {dot_plane(planes[band * band_bits + j])} > 0 "
            f"THEN {1 << (band_bits - 1 - j)} ELSE 0 END)"
            for j in range(band_bits)
        )
        band_keys.append(f"({band * (1 << band_bits)} + {bits})")
    key_list = ", ".join(band_keys)
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    b AS (SELECT vec_id, unnest([{key_list}]) AS band_key FROM e),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
      FROM b a JOIN b c ON a.band_key = c.band_key AND a.vec_id < c.vec_id
    ),
    scored AS (
      SELECT id_a, id_b,
             CASE WHEN sqrt(list_reduce(list_transform(x.v, q -> q * q),
                                        (q, w) -> q + w))
                     * sqrt(list_reduce(list_transform(y.v, q -> q * q),
                                        (q, w) -> q + w)) = 0
                  THEN 0.0
                  ELSE list_reduce(list_transform(list_zip(x.v, y.v),
                         p -> struct_extract(p, 1) * struct_extract(p, 2)),
                         (q, w) -> q + w)
                       / (sqrt(list_reduce(list_transform(x.v, q -> q * q),
                                           (q, w) -> q + w))
                          * sqrt(list_reduce(list_transform(y.v, q -> q * q),
                                             (q, w) -> q + w)))
             END AS cosine
      FROM cand JOIN e x ON x.vec_id = id_a JOIN e y ON y.vec_id = id_b
    )
    SELECT id_a, id_b, cosine FROM scored WHERE cosine >= {threshold}
    """


@register(
    "embedding_near_dup_tight",
    oracle=_near_dup_hyperplane_oracle(),
    headline=True,
)
def q_embedding_near_dup_tight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIGHT-threshold (cos ≥ 0.9) embedding near-dup — the
    production semantics and the subquadratic scale path. The
    registry sweep showed the low-threshold demo
    (`embedding_near_dup`, cos ≥ 0.45) degenerating at sf1: with
    p_bit ≈ 0.65, 4-bit bands mark ~64% of ALL pairs as candidates
    (and this corpus's max pair cosine is 0.60, so mid-threshold
    similarity here is inherently ~quadratic — SCALE.md "isotropic
    mid-threshold" note). At the REAL near-dup threshold the same
    LSH family is sharp: 12-plane bands × 24 → recall ≈ 0.983 at
    the 0.9 boundary with a 2⁻¹² random-pair band collision rate
    (~0.6% of pairs as candidates, tightening as the threshold
    rises). On this synthetic corpus the result is EMPTY (max
    cosine 0.60) and the oracle verifies that emptiness exactly;
    recall and candidate-bound behavior are pinned on constructed
    clustered data in tests/test_dedup_similarity.py."""
    from etl_covid19_spark.operators.similarity import (
        hyperplane_near_dup_pairs,
    )

    return hyperplane_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), "embedding", "vec_id",
        threshold=0.9, band_bits=12, n_bands=24,
    )


@register(
    "snapshot_zone_dv_read",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS open_revenue
    FROM orders
    WHERE o_orderkey < 2000 AND o_orderstatus <> 'F'
    GROUP BY o_orderpriority
    """,
)
def q_snapshot_zone_dv_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACID snapshot zone end-to-end UNDER THE CORRECTNESS GATE
    (sources/snapshot_zone.py — manifest commits, time travel,
    deletion vectors): write a multi-file snapshot of the small
    orders slice → metadata-only DELETE of fulfilled orders via a
    deletion vector (`strategy="dv"`: one sidecar parquet, zero data
    rewrite) → `snapshot_read` merges-on-read through the positional
    anti-join → aggregate. The oracle reconstructs the DV
    subtraction as the equivalent plain filter over the same parquet
    — if the vector masks one row too many/few, counts and the
    DECIMAL-accumulated revenue both drift. The zone lands in a
    fresh temp dir per run (commit ids are content-independent
    UUIDs), so reruns never see stale state; the o_orderkey bound
    keeps the written slice constant-size at any SF while the scan
    that feeds it stays distributed."""
    from etl_covid19_spark.sources import snapshot_zone as sz

    path = _gate_tmpdir("sz_dv_query_")
    base = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    sz.snapshot_write(base.repartition(4), path, mode="overwrite")
    sz.snapshot_delete_where(
        spark, path, F.col("o_orderstatus") == "F", strategy="dv"
    )
    live = sz.snapshot_read(spark, path)
    return live.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("open_revenue"),
    )


@register(
    "snapshot_time_travel",
    oracle="""
    SELECT 'v0' AS version_label,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
             AS total_acctbal
    FROM customer
    WHERE c_custkey % 2 = 0 AND c_custkey BETWEEN 40 AND 100000
    UNION ALL
    SELECT 'live' AS version_label,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
             AS total_acctbal
    FROM customer
    WHERE c_mktsegment <> 'BUILDING'
      AND c_custkey BETWEEN 40 AND 100000
    """,
)
def q_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel under the gate (sources/snapshot_zone.py —
    versioned manifests): v0 = overwrite with the even-custkey half,
    v1 = APPEND the odd half, v2 = DV-delete the BUILDING segment.
    Reading `version=0` must see exactly the original write — a later
    append or deletion vector that bleeds into an old manifest shows
    up as a count/balance drift against the oracle's plain-filter
    reconstruction; the default read must see the post-append,
    post-delete state.

    Round-10 scale fix: BOTH reads route through the manifest
    min/max file-skip (`snapshot_read(prune=...)`) over a bounded
    custkey slice, and the writes are range-partitioned so per-file
    stats have pruning power — the unpruned form re-scanned the
    whole base slice per versioned read (12.6× slope at sf100 while
    `snapshot_prune_read` stayed flat). Pruning a TIME-TRAVEL read
    is the same code path as pruning the live read — version just
    selects which manifest's stats to skip against (pruned ≡
    unpruned equality is pinned in tests/test_snapshot_zone.py).
    Both reads aggregate through the same DECIMAL-accumulate so
    float order can't flake the compare."""
    from etl_covid19_spark.sources import snapshot_zone as sz

    path = _gate_tmpdir("sz_tt_query_")
    cust = _t(spark, sf_dir, "customer")
    sz.snapshot_write(
        cust.filter(F.col("c_custkey") % 2 == 0)
        .repartitionByRange(8, "c_custkey"),
        path,
        mode="overwrite",
    )
    sz.snapshot_write(
        cust.filter(F.col("c_custkey") % 2 == 1)
        .repartitionByRange(8, "c_custkey"),
        path,
        mode="append",
    )
    sz.snapshot_delete_where(
        spark, path, F.col("c_mktsegment") == "BUILDING", strategy="dv"
    )

    def agg(df: DataFrame, label: str) -> DataFrame:
        return df.filter(F.col("c_custkey").between(40, 100_000)).agg(
            F.lit(label).alias("version_label"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_acctbal"),
        )

    rng = {"c_custkey": (40, 100_000)}
    v0 = sz.snapshot_read(spark, path, version=0, prune=rng)
    live = sz.snapshot_read(spark, path, prune=rng)
    return agg(v0, "v0").unionByName(agg(live, "live"))


@register(
    "snapshot_change_feed",
    oracle="""
    SELECT '+' AS change, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM customer WHERE c_custkey % 2 = 1 AND c_mktsegment <> 'MACHINERY'
    UNION ALL
    SELECT '-' AS change, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM customer WHERE c_custkey % 2 = 0 AND c_mktsegment = 'MACHINERY'
    """,
)
def q_snapshot_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-exact change data feed under the gate
    (`snapshot_row_diff`, sources/snapshot_zone.py): between v0
    (even-custkey half) and v2 (append odd half, DV-delete
    MACHINERY), the exact delta is '+' every surviving odd row and
    '-' every even MACHINERY row. snapshot_row_diff computes it as
    two exceptAll passes over DV-aware reads — multiplicity-exact,
    so a deletion vector that hides the wrong row count flips a tag
    count. The oracle reconstructs both tags as plain filters
    (customer rows are unique, so set difference = multiset
    difference here)."""
    from etl_covid19_spark.sources import snapshot_zone as sz

    path = _gate_tmpdir("sz_cdf_query_")
    cust = _t(spark, sf_dir, "customer")
    sz.snapshot_write(
        cust.filter(F.col("c_custkey") % 2 == 0).repartition(2),
        path,
        mode="overwrite",
    )
    sz.snapshot_write(
        cust.filter(F.col("c_custkey") % 2 == 1).repartition(2),
        path,
        mode="append",
    )
    sz.snapshot_delete_where(
        spark, path, F.col("c_mktsegment") == "MACHINERY", strategy="dv"
    )
    diff = sz.snapshot_row_diff(spark, path, v_from=0, v_to=2)
    return (
        diff.groupBy(F.col("_change").alias("change"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "snapshot_prune_read",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
             AS seg_acctbal
    FROM customer
    WHERE c_custkey BETWEEN 40 AND 80
    GROUP BY c_mktsegment
    """,
)
def q_snapshot_prune_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-stats file skipping under the gate (`snapshot_read`
    prune=, sources/snapshot_zone.py): the zone is written
    range-partitioned on c_custkey so each data file's manifest
    [min, max] is a disjoint slice, then read with
    prune={c_custkey: (40, 80)} — files whose stats can't overlap
    are skipped WITHOUT footer I/O. Pruning is an optimization, not
    a filter: the real BETWEEN predicate still applies on top, and
    the oracle is the plain filtered aggregate — a prune that drops
    a file it shouldn't (stats off by one) loses rows and fails the
    compare; a prune that skips nothing still passes but the plan
    test in test_snapshot_zone pins the file-skipping behavior."""
    from etl_covid19_spark.sources import snapshot_zone as sz

    path = _gate_tmpdir("sz_prune_query_")
    cust = _t(spark, sf_dir, "customer")
    sz.snapshot_write(
        cust.repartitionByRange(4, "c_custkey"), path, mode="overwrite"
    )
    pruned = sz.snapshot_read(spark, path, prune={"c_custkey": (40, 80)})
    return (
        pruned.filter(F.col("c_custkey").between(40, 80))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
            .cast("double")
            .alias("seg_acctbal"),
        )
    )


@register(
    "snapshot_compact_vacuum_read",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             AS kept_revenue
    FROM lineitem
    WHERE l_orderkey < 600 AND l_linestatus <> 'F'
    GROUP BY l_returnflag
    """,
)
def q_snapshot_compact_vacuum_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone lifecycle end-to-end under the gate
    (sources/snapshot_zone.py): write a bounded lineitem slice →
    DV-delete fulfilled lines (metadata-only) → `snapshot_compact`
    folds the vectors back into rewritten data files (the new
    manifest carries no DVs, reads drop the anti-join) → `vacuum`
    removes the superseded manifests, the orphaned originals, and
    the spent DV sidecars → read and aggregate. The oracle is the
    plain filtered aggregate over the source parquet: a compaction
    that drops or duplicates a surviving row, or a vacuum that
    deletes a file the live manifest still references (the read
    would throw), fails the compare. Compaction cost is
    proportional to the MASKED files only — untouched files carry
    by reference, which is what makes the operation viable on a
    100 TB zone where a delete touched one partition."""
    from etl_covid19_spark.sources import snapshot_zone as sz

    path = _gate_tmpdir("sz_compact_query_")
    base = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 600)
    sz.snapshot_write(base.repartition(4), path, mode="overwrite")
    sz.snapshot_delete_where(
        spark, path, F.col("l_linestatus") == "F", strategy="dv"
    )
    if sz.snapshot_compact(spark, path) is None:
        raise RuntimeError(
            "snapshot_compact produced no new version: the DV delete "
            "left nothing to fold, so the vacuum-then-read below would "
            "be testing the wrong lifecycle"
        )
    sz.vacuum(path, keep_versions=1)
    live = sz.snapshot_read(spark, path)
    return live.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("kept_revenue"),
    )


@register(
    "streaming_snapshot_sink_read",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE user_id % 10 = 0
    GROUP BY event_type
    """,
)
def q_streaming_snapshot_sink_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming ingestion into the snapshot zone, under
    the gate (sources/snapshot_zone.py `streaming_snapshot_sink`): a
    real Structured Streaming run (Trigger.AvailableNow) over the
    events parquet feeds a foreachBatch sink that appends each
    micro-batch as one atomic epoch-stamped snapshot commit; replayed
    batch ids consult the zone's epoch ledger and skip, so
    at-least-once delivery becomes exactly-once output (the Delta
    txnAppId/txnVersion ledger trick). The read-back aggregate must
    equal the oracle's plain batch aggregate over the same parquet —
    a dropped batch loses rows, a double-committed replay doubles
    them, and either fails the compare. Zone and checkpoint live in
    fresh temp dirs per run."""
    from etl_covid19_spark.sources import catalog
    from etl_covid19_spark.sources import snapshot_zone as sz

    path = _gate_tmpdir("sz_sink_query_")
    cp = _gate_tmpdir("sz_sink_query_cp_")
    src = catalog.events_stream(spark, sf_dir).filter(
        F.col("user_id") % 10 == 0
    )
    q = (
        src.writeStream.foreachBatch(sz.streaming_snapshot_sink(path))
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q, "streaming_snapshot_sink_read")
    live = sz.snapshot_read(spark, path)
    return live.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "snapshot_merge_upsert_read",
    oracle="""
    WITH merged AS (
      SELECT o_orderpriority, o_totalprice AS price
      FROM orders WHERE o_orderkey < 1000
      UNION ALL
      SELECT o_orderpriority, o_totalprice + 1000.0
      FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 3000
    ),
    agg AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(price AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue
      FROM merged GROUP BY o_orderpriority
    )
    SELECT 'rewrite' AS strategy, o_orderpriority, n_orders, revenue
    FROM agg
    UNION ALL
    SELECT 'dv' AS strategy, o_orderpriority, n_orders, revenue
    FROM agg
    """,
)
def q_snapshot_merge_upsert_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE upsert at both granularities under the gate
    (sources/snapshot_zone.py `snapshot_merge_upsert`): two zones
    are built from the same base slice (o_orderkey < 2000); the
    same update set (keys 1000–2999, o_totalprice shifted +1000 —
    half matched updates, half fresh inserts) merges into one with
    strategy="rewrite" (affected files rewritten, found via a
    semi-join that shuffles only the update KEY set) and into the
    other with strategy="dv" (superseded rows masked by a sidecar,
    updates appended — O(|updates|) regardless of zone size). Both
    read-backs aggregate to the same oracle reconstruction, so the
    query simultaneously checks merge semantics AND
    rewrite-vs-merge-on-read equivalence; a DV that masks the wrong
    superseded row or a rewrite that drops a survivor diverges from
    the plain-SQL branch with its strategy label."""
    from etl_covid19_spark.sources import snapshot_zone as sz

    base = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    updates = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 3000)
        )
        .withColumn(
            "o_totalprice", F.col("o_totalprice") + F.lit(1000.0)
        )
    )

    def build(strategy: str) -> DataFrame:
        path = _gate_tmpdir(f"sz_merge_{strategy}_query_")
        sz.snapshot_write(base.repartition(4), path, mode="overwrite")
        sz.snapshot_merge_upsert(
            spark, path, updates, keys=["o_orderkey"], strategy=strategy
        )
        live = sz.snapshot_read(spark, path)
        return live.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
        ).select(
            F.lit(strategy).alias("strategy"),
            "o_orderpriority",
            "n_orders",
            "revenue",
        )

    return build("rewrite").unionByName(build("dv"))


@register(
    "zone_mutation_read",
    oracle="""
    WITH survivors AS (
      SELECT CASE WHEN event_type = 'purchase'
                  THEN 'purchase_adj' ELSE event_type END AS event_type,
             CASE WHEN event_type = 'purchase'
                  THEN value + 100.0 ELSE value END AS value
      FROM events WHERE event_type <> 'error'
      UNION ALL
      SELECT 'backfill' AS event_type, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             AS total_value
    FROM survivors GROUP BY event_type
    """,
)
def q_zone_mutation_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-granularity zone mutations under the gate
    (sources/parquet_zone.py — the reference's DELETE/MERGE shape,
    quirk Q1's idempotent dynamic-partition overwrite): build a
    ds-partitioned events zone → `delete_where` drops error events
    (only partitions CONTAINING matches are rewritten — cost
    proportional to affected data) → `merge_upsert` replaces every
    purchase row (same event_id key, value +100, relabeled
    purchase_adj) AND inserts a backfill copy under fresh ids —
    WHEN MATCHED / WHEN NOT MATCHED in one call → `read_zone`
    aggregates. The oracle reconstructs the final state as CASE +
    UNION over the source parquet: a lost survivor, a superseded
    row that outlives its update, or a dropped insert all drift the
    per-type counts/sums. The +100.0 shift is exact double
    arithmetic on both sides; sums DECIMAL-accumulate."""
    from etl_covid19_spark.sources import parquet_zone as pz

    path = _gate_tmpdir("pz_mut_query_")
    base = (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd").alias("ds"),
            "user_id",
            "event_type",
            "value",
        )
    )
    # Write-layout-aligned shuffle before the partitioned write: the
    # unaligned form emitted tasks×days files (hundreds at gate SF),
    # which is both a file-count bug and the widest exposure to
    # transient task-side write failures — round 9's sole red driver
    # row was a FileFormatWriter task error in exactly this write.
    pz.write_zone(
        base.repartition(F.col("ds")), path, partition_by=("ds",)
    )
    pz.delete_where(spark, path, F.col("event_type") == "error")
    purchases = pz.read_zone(spark, path).filter(
        F.col("event_type") == "purchase"
    )
    updates = purchases.withColumn(
        "event_type", F.lit("purchase_adj")
    ).withColumn("value", F.col("value") + F.lit(100.0))
    inserts = purchases.withColumn(
        "event_id", F.col("event_id") + F.lit(10_000_000_000)
    ).withColumn("event_type", F.lit("backfill"))
    pz.merge_upsert(
        spark, path, updates.unionByName(inserts), keys=["event_id"]
    )
    final = pz.read_zone(spark, path)
    return final.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("total_value"),
    )


@register(
    "bucketed_join_agg",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_custkey % 7 = 0 AND o_custkey % 7 = 0
    GROUP BY c_mktsegment
    """,
)
def q_bucketed_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located (bucketed) join under the gate
    (sources/bucketing.py): both sides are materialized as
    catalog-tracked bucketed tables on the join key (16 buckets,
    sorted within buckets), so the fact⋈dim join and the downstream
    groupBy run WITHOUT shuffling either side — the write pays the
    shuffle once, every later join/agg on that key is Exchange-free
    (zero-Exchange plan pinned by test_bucketing; this query pins
    the VALUES through the bucketed write+read round trip against
    the plain join-agg oracle). The %7 slice keeps the rewritten
    tables a fixed fraction of the input at any SF."""
    import atexit
    import shutil
    import uuid

    from etl_covid19_spark.sources import bucketing as bk

    # Table names are NAMESPACED PER INVOCATION (round-8 verdict,
    # "What's wrong" #3): fixed global names plus an rmtree into the
    # shared warehouse let two concurrent runs clobber each other's
    # tables mid-join. A uuid suffix makes each run's tables private;
    # the stale-unregistered-location hazard is handled inside
    # write_bucketed itself. Cleanup is deferred to interpreter exit
    # because the returned DataFrame still reads these tables lazily.
    run_id = uuid.uuid4().hex[:12]
    t_cust = f"bkt_gate_customer_{run_id}"
    t_ord = f"bkt_gate_orders_{run_id}"
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", ""
    ).removeprefix("file:")

    def _drop_gate_tables() -> None:
        for t in (t_cust, t_ord):
            try:
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass  # session may already be stopped at exit
            if wh:
                shutil.rmtree(f"{wh}/{t}", ignore_errors=True)

    atexit.register(_drop_gate_tables)

    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 7 == 0
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % 7 == 0
    )
    bk.write_bucketed(cust, t_cust, ["c_custkey"], sort_cols=["c_custkey"])
    bk.write_bucketed(orders, t_ord, ["o_custkey"], sort_cols=["o_custkey"])
    c = bk.read_table(spark, t_cust)
    o = bk.read_table(spark, t_ord)
    joined = o.join(c, o["o_custkey"] == c["c_custkey"])
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "export_roundtrip_read",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
    FROM documents
    WHERE doc_id % 5 = 0
    GROUP BY lang
    """,
)
def q_export_roundtrip_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data export round trip under the gate
    (sources/export.py): a documents slice is exported as
    deterministic sharded JSONL (shard = pmod(xxhash64(doc_id), 8) —
    key-uniform without a global sort; ONE repartition pass writes
    data AND the manifest's per-shard rows/tokens/order-invariant
    checksums), `verify_jsonl_shards` re-aggregates the written
    files against the manifest (raises on any corruption), and the
    registered result re-reads the JSONL and aggregates per-lang
    counts and character totals. The oracle runs the same aggregate
    over the source parquet — so JSON escaping that mangles one
    text body, a dropped shard, or a manifest drift all fail the
    compare. Integer outputs only: the round trip is exact by
    construction, no float tolerance needed."""
    from etl_covid19_spark.sources import export as ex

    out = _gate_tmpdir("export_query_")
    docs = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 5 == 0
    )
    ex.export_jsonl_shards(
        docs, out, id_col="doc_id", text_col="text", n_shards=8
    )
    ex.verify_jsonl_shards(spark, out)
    back = spark.read.option("basePath", out).json(f"{out}/shard=*")
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
    )


@register(
    "clustered_compact_read",
    oracle="""
    WITH slice AS (
      SELECT user_id, value FROM events
      WHERE user_id BETWEEN 40 AND 90
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               AS total_value
      FROM slice
    )
    SELECT 'clustered' AS layout, n_events, total_value FROM agg
    UNION ALL
    SELECT 'compacted' AS layout, n_events, total_value FROM agg
    """,
)
def q_clustered_compact_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-layout governance under the gate
    (sources/parquet_zone.py `clustered_write` / `compact_zone`):
    the same events frame is written twice — once CLUSTERED on
    user_id (range-repartition + in-partition sort → disjoint
    per-file key ranges, the table-format-free OPTIMIZE ZORDER;
    a point/range filter then skips files on footer stats alone),
    and once as a deliberately fragmented ds-partitioned zone that
    `compact_zone` rewrites to one file per partition (small-file
    pathology → planning cost fix). Both layouts must read back the
    identical filtered aggregate as the plain-parquet oracle — a
    row lost in the range repartition or the compaction rewrite
    flips its branch. The layout PROPERTIES (disjoint ranges, file
    counts) are pinned separately in test_layout; this query pins
    the values through both write paths."""
    from etl_covid19_spark.sources import parquet_zone as pz

    events = _t(spark, sf_dir, "events").select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("ds"),
        "user_id",
        "value",
    )

    clustered_path = _gate_tmpdir("pz_clustered_query_")
    pz.clustered_write(
        events, clustered_path, cluster_by=["user_id"], n_files=8
    )

    fragmented_path = _gate_tmpdir("pz_compact_query_")
    pz.write_zone(
        events.repartition(16), fragmented_path, partition_by=("ds",)
    )
    pz.compact_zone(spark, fragmented_path, target_files=1)

    def agg(df: DataFrame, label: str) -> DataFrame:
        return (
            df.filter(F.col("user_id").between(40, 90))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("double")
                .alias("total_value"),
            )
            .select(F.lit(label).alias("layout"), "n_events", "total_value")
        )

    return agg(
        spark.read.parquet(clustered_path), "clustered"
    ).unionByName(agg(spark.read.parquet(fragmented_path), "compacted"))


@register(
    "streaming_export_read",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             AS total_value
    FROM events
    WHERE user_id % 10 = 1
    GROUP BY event_type
    """,
)
def q_streaming_export_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay-safe streaming training export under the gate
    (sources/export.py `streaming_export_sink`): a real Structured
    Streaming run publishes each micro-batch as an epoch-stamped
    JSONL shard set (epoch=<id>/shard=N/*.json + manifest) — a
    retried epoch overwrites its own directory byte-identically
    (deterministic xxhash64 shard assignment), the same idempotency
    contract as the zone writer's dynamic partition overwrite.
    `verify_export_epochs` re-aggregates every epoch's files against
    its manifest checksums (raises on corruption), then the
    registered result re-reads ALL epochs' JSONL and must reproduce
    the oracle's plain aggregate over the source parquet: a dropped
    epoch, a double-published batch, or JSON mangling of one value
    all fail the compare. The double round trip is exact — Jackson
    emits shortest-round-trip doubles, so the DECIMAL-accumulated
    sum sees bit-identical operands on both sides."""
    from etl_covid19_spark.sources import catalog
    from etl_covid19_spark.sources import export as ex

    out = _gate_tmpdir("stream_export_query_")
    cp = _gate_tmpdir("stream_export_query_cp_")
    src = catalog.events_stream(spark, sf_dir).filter(
        F.col("user_id") % 10 == 1
    )
    q = (
        src.writeStream.foreachBatch(
            ex.streaming_export_sink(out, id_col="event_id", n_shards=4)
        )
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q, "streaming_export_read")
    ex.verify_export_epochs(spark, out)
    back = spark.read.option("basePath", out).json(
        f"{out}/epoch=*/shard=*"
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("total_value"),
    )
