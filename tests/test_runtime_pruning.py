"""Runtime pruning at the plan level: dynamic partition pruning and
runtime bloom-filter join pruning.

These are the two scan-reduction mechanisms that matter most at
100 TB beyond static pushdown: DPP prunes whole partition directories
of a fact scan using join-time values from a filtered dimension, and
the runtime bloom filter cuts the shuffle volume of a large-large
join by pre-filtering the probe side with a bloom filter built from
the selective side. Both are Catalyst features the engine relies on
(no code path of our own) — these tests pin the conditions under
which they actually fire, because each has a non-obvious gate:

- DPP requires a "likely selective" predicate on the dimension —
  an equality/IN against a LITERAL. A bare boolean column filter
  (`WHERE is_hot`) does NOT qualify and silently skips pruning.
- Bloom injection requires the join to be a probable shuffle join
  (no broadcast), a selective creation side under
  `creationSideThreshold`, and an application-side scan LARGER than
  `applicationSideScanSizeThreshold` (10 GB by default — at test SF
  it must be lowered to observe the rewrite).
"""

import contextlib

from pyspark.sql import functions as F


@contextlib.contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            spark.conf.set(key, v)


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    fact = orders.withColumn("ds", F.date_format("o_orderdate", "yyyy-MM"))
    fact_path = str(tmp_path / "fact")
    fact.write.partitionBy("ds").mode("overwrite").parquet(fact_path)
    months = sorted({r[0] for r in fact.select("ds").distinct().collect()})
    dim = spark.createDataFrame(
        [(m, "hot" if m.startswith("1996") else "cold") for m in months],
        "ds string, label string",
    )

    f = spark.read.parquet(fact_path)
    q = (
        f.join(F.broadcast(dim), "ds")
        .where(F.col("label") == "hot")
        .groupBy("ds")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows = {r.ds: r.n for r in q.collect()}
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower(), plan[:2000]

    # same answer as a static partition filter
    static = {
        r.ds: r.n
        for r in f.where(F.col("ds").startswith("1996"))
        .groupBy("ds")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert rows == static and rows


def test_dpp_requires_selective_literal_predicate(spark, tmp_path):
    """The gotcha pinned: a bare boolean dimension filter is not
    'likely selective', so DPP silently does not fire — engine code
    must phrase dimension slicing as literal comparisons."""
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    fact = orders.withColumn("ds", F.date_format("o_orderdate", "yyyy-MM"))
    fact_path = str(tmp_path / "fact2")
    fact.write.partitionBy("ds").mode("overwrite").parquet(fact_path)
    months = sorted({r[0] for r in fact.select("ds").distinct().collect()})
    dim = spark.createDataFrame(
        [(m, m.startswith("1996")) for m in months], "ds string, is_hot boolean"
    )
    f = spark.read.parquet(fact_path)
    q = f.join(F.broadcast(dim.where("is_hot")), "ds").groupBy("ds").count()
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" not in plan.lower()


def test_runtime_bloom_filter_join_pruning(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    def build():
        # built fresh per conf regime: a DataFrame's QueryExecution
        # caches its optimized plan on first action, so a frame
        # planned before the conf change would never see the rewrite
        sel = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
            "o_orderkey"
        )
        return (
            li.join(sel, li.l_orderkey == sel.o_orderkey)
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    baseline = {(r.l_returnflag, r.n) for r in build().collect()}

    with _confs(
        spark,
        spark__sql__autoBroadcastJoinThreshold="-1",
        spark__sql__optimizer__runtime__bloomFilter__applicationSideScanSizeThreshold="1b",
        spark__sql__optimizer__runtime__bloomFilter__creationSideThreshold="100MB",
    ):
        q = build()
        filtered = {(r.l_returnflag, r.n) for r in q.collect()}
        plan = q._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan, plan[:2000]
    # the bloom filter is a pure pre-filter: results are unchanged
    assert filtered == baseline and baseline


def test_aqe_splits_skewed_join_partition(spark):
    """The third runtime-adaptivity leg next to DPP and bloom
    pruning: AQE must detect a pathologically skewed join key at
    RUNTIME and split its partition (OptimizeSkewedJoin) — the
    no-code-change answer to hot keys that `joins.salted_join`
    handles manually when AQE can't see the skew."""
    from pyspark.sql import functions as F

    # 1 hot key carrying ~all rows + uniform cold keys
    left = spark.range(200_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7))
        .otherwise(F.col("id") % 97)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(100).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("r")
    )
    confs = {
        # force a shuffle join and make the skew thresholds tiny so
        # the 200k-row fixture trips them
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # NOTE: the consumer must not require hash distribution on k
        # (a groupBy("k") downstream would forbid the split — AQE
        # preserves required distributions over skew handling)
        joined = left.join(right, "k").select("k", "payload", "r")
        # drive the DataFrame's OWN execution (a write/count would
        # clone the plan and leave this handle pre-AQE)
        assert len(joined.collect()) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
