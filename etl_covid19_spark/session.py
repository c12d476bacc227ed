"""SparkSession factory with scale-oriented defaults.

The reference hand-tunes parallelism (``.repartition(2)``,
``spark_transform_data.py:51``) and commented-out executor sizing
(``dags/ETL_covid19_spark.py:96-97``). Here the session instead
leans on AQE (runtime coalescing, skew-join splitting, dynamic
broadcast) so the same code runs on local[32] and on a
1000-executor cluster without re-tuning.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for correctness-portability between local test
# runs and a real cluster; anything machine-specific comes from env.
_BASE_CONF: dict[str, str] = {
    # Deterministic time semantics: the DuckDB oracle reads parquet
    # timestamps as naive/UTC, so Spark must too.
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.showConsoleProgress": "false",
    "spark.ui.enabled": "false",
    # AQE is the scale story: runtime shuffle-partition coalescing,
    # skew-join splitting, and plan re-optimization from actual stats.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Broadcast policy (round 6): corpus-DERIVED frames (candidate
    # sets, df-capped vocabularies, filtered linear dims) carry NO
    # F.broadcast hints anywhere in the engine — a forced broadcast
    # of a set that grows with the corpus is a driver OOM at 100 TB.
    # The two thresholds below split the decision by EVIDENCE
    # quality. The static planner works from size ESTIMATES (file
    # size × pruned-column ratio), which mis-rate corpus tables: a
    # one-column projection of sf10 orders estimates under a 64m
    # bar, and the session-1 uniform 64m made the static planner
    # broadcast 15M-row corpus sides (measured 5× regressions on
    # except_customers / tfidf_top_terms). So the estimate-driven
    # static threshold stays at Spark's conservative 10m default,
    # while AQE — which re-plans from the MEASURED size of a
    # completed shuffle stage — gets the roomier 64m (~0.05% of a
    # real executor heap): the de-hinted 20-30 MB candidate sets
    # still convert to broadcast at bench SFs from real sizes, and
    # anything genuinely large stays a shuffle join instead of an
    # OOM.
    "spark.sql.autoBroadcastJoinThreshold": "10m",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "64m",
    # Nested-field pruning so `select('payload.data.confirmed')`
    # reads one parquet leaf column, not the whole struct.
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
    # Deliberately NOT raising spark.sql.codegen.maxFields for the
    # 128-column MinHash aggregate: its generated update method blows
    # past the JIT's method-size limit, so forcing codegen pays
    # seconds of Janino compile per query for an interpreter-speed
    # loop anyway (measured 10.6s vs 6.6s at sf0.1). The default
    # 100-field cutoff routes wide aggregates to interpreted mode,
    # which is the right call at every scale here.
    # Arrow for every pandas_udf / applyInPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Idempotent date-partitioned writes (fixes reference quirk Q1:
    # blind `append` duplicating data on orchestrator retries).
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # Stable locale-pinned formatting for day/month names (SURVEY
    # §7.4: to_char(...,'Day') parity needs a pinned locale).
    "spark.sql.legacy.timeParserPolicy": "CORRECTED",
    # Quieter Parquet summary churn on wide fan-out writes.
    "spark.hadoop.parquet.summary.metadata.level": "NONE",
    # Catalog-backed (bucketed) tables land outside the repo; static
    # conf, so it must be set at session build time.
    "spark.sql.warehouse.dir": "/tmp/spark_graft_warehouse",
    # Some sources (pandas/pyarrow writers) emit INT64
    # TIMESTAMP(NANOS) parquet columns, which Spark's vectorized
    # reader rejects; read them as long and convert in the catalog.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(
    app_name: str = "etl_covid19_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    real cluster leave it unset and let spark-submit/cluster manager
    decide. ``shuffle_partitions`` defaults to 32 locally — on a
    cluster, size it to ~2-3× total cores (AQE coalesces down).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_BASE_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if master.startswith("local"):
        # In local mode the DRIVER heap is the whole JVM — all "local
        # executor" threads run inside it, and Spark's 1g default is
        # a toy budget for 32 concurrent tasks (found the hard way:
        # sf1 bench OOMed the heap). Size it like one real executor.
        # MEASURED at sf1: 8-24g are equivalent within noise and ~2×
        # faster than 48g on the shuffle-heavy dedup/ANN family (G1
        # scales region/young-gen size with the heap; an oversized
        # heap trades pause frequency for pause span and cache
        # locality). 16g clears sf1 with 2× headroom. On a cluster
        # this block is skipped — spark-submit owns executor sizing.
        conf.setdefault(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        # Embedded Derby (JDBC wire tests / any derby-backed
        # metastore) writes `derby.log` into the process CWD by
        # default — route it to tmp so test runs never drop files
        # at the repo root. Static JVM property, so it must ride
        # extraJavaOptions at session build time.
        conf.setdefault(
            "spark.driver.extraJavaOptions",
            "-Dderby.stream.error.file=/tmp/derby.log",
        )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
