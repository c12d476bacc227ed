"""Catalog statistics + cost-based optimizer estimates.

At 100 TB the optimizer's join-strategy and reorder decisions hang on
table/column statistics: without ANALYZE, Spark only knows file sizes
(so a selective filter's output is estimated at full scan size and a
broadcastable side is never recognized as such). These tests pin the
stats surface the engine relies on: ANALYZE TABLE populates
row/column stats on an external parquet table, and with
`spark.sql.cbo.enabled` the optimizer's row-count estimate for a
selective equality filter drops below the unfiltered count —
the input the broadcast/reorder decisions consume.
"""

import contextlib


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


def _row_count_estimate(df):
    opt = df._jdf.queryExecution().optimizedPlan()
    rc = opt.stats().rowCount()
    return int(rc.get()) if rc.isDefined() else None


def test_analyze_populates_stats_and_cbo_estimates(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    n_total = src.count()
    loc = str(tmp_path / "cbo_orders")
    src.write.mode("overwrite").parquet(loc)
    spark.sql("DROP TABLE IF EXISTS cbo_orders")
    spark.sql(
        f"CREATE TABLE cbo_orders USING parquet LOCATION '{loc}'"
    )
    try:
        with _confs(spark, spark__sql__cbo__enabled="true"):
            # before ANALYZE: no row count known
            assert _row_count_estimate(spark.table("cbo_orders")) is None

            spark.sql(
                "ANALYZE TABLE cbo_orders COMPUTE STATISTICS "
                "FOR COLUMNS o_orderkey, o_orderpriority"
            )

            assert _row_count_estimate(spark.table("cbo_orders")) == n_total

            filtered = spark.table("cbo_orders").where(
                "o_orderpriority = '1-URGENT'"
            )
            est = _row_count_estimate(filtered)
            actual = filtered.count()
            # the estimate reflects the column's NDV, not the full
            # table: it must shrink materially and land in the right
            # regime (within 3x of truth for a uniform column)
            assert est is not None and est < n_total
            assert actual / 3 <= est <= actual * 3
    finally:
        spark.sql("DROP TABLE IF EXISTS cbo_orders")
