"""Bucketed-vs-unbucketed join cost harness (ROADMAP item).

Quantifies the co-located-join win that `tests/test_bucketing.py`
plan-asserts: the same orders⋈lineitem join + aggregate, run (a) over
plain parquet (two shuffle Exchanges) and (b) over tables bucketed on
the join key (zero Exchanges), with auto-broadcast disabled so the
comparison is shuffle-vs-no-shuffle, not broadcast.

Prints one JSON line: wall times, Exchange counts, speedup. Run:
    python tools/bucket_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from etl_covid19_spark.session import get_spark  # noqa: E402
from etl_covid19_spark.sources.bucketing import (  # noqa: E402
    read_table,
    write_bucketed,
)

N_BUCKETS = 16


def joined_agg(li, o):
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey")
        .agg(
            F.sum("l_quantity").alias("qty"),
            F.first("o_totalprice").alias("price"),
        )
    )


def run(df) -> tuple[float, int]:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0
    plan = df._jdf.queryExecution().executedPlan().toString()
    return elapsed, plan.count("Exchange")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bucket_bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(
        orders, "bb_orders", ["o_orderkey"], N_BUCKETS, sort_cols=["o_orderkey"]
    )
    write_bucketed(
        lineitem, "bb_lineitem", ["l_orderkey"], N_BUCKETS,
        sort_cols=["l_orderkey"],
    )
    try:
        plain = joined_agg(lineitem, orders)
        bucketed = joined_agg(
            read_table(spark, "bb_lineitem"), read_table(spark, "bb_orders")
        )
        # warm both once (JIT/plan compile), then measure steady state
        for df in (plain, bucketed):
            run(df)
        t_plain, ex_plain = run(joined_agg(lineitem, orders))
        t_bucketed, ex_bucketed = run(
            joined_agg(
                read_table(spark, "bb_lineitem"),
                read_table(spark, "bb_orders"),
            )
        )
        print(
            json.dumps(
                {
                    "metric": "bucketed_join_speedup",
                    "plain_sec": round(t_plain, 3),
                    "bucketed_sec": round(t_bucketed, 3),
                    "plain_exchanges": ex_plain,
                    "bucketed_exchanges": ex_bucketed,
                    "speedup": round(t_plain / max(t_bucketed, 1e-9), 2),
                    "sf_dir": sf_dir,
                }
            )
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS bb_orders")
        spark.sql("DROP TABLE IF EXISTS bb_lineitem")


if __name__ == "__main__":
    main()
