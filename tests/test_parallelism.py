"""fan_out guard: repartitions Python-kernel inputs up to cluster
parallelism ONLY when the input is both under-split and big enough
to feed the extra slots (>= ~2 MB/partition). The sf10 profile
showed scan under-parallelism was the entire 'Arrow kernels are slow
cold' signal; the sf0.1 bench showed unconditional fan-out costs ~1 s
of scheduling on a KB-scale corpus — this pins both sides."""

from etl_covid19_spark.operators.parallelism import fan_out


def test_small_local_input_is_untouched(spark, tmp_path):
    p = str(tmp_path / "small.parquet")
    spark.range(1000).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    before = df.rdd.getNumPartitions()
    out = fan_out(df)
    # a few-KB file must NOT be fanned to 32 scheduling slots
    assert out.rdd.getNumPartitions() == before


def test_large_underpartitioned_input_fans_out(spark, tmp_path):
    p = str(tmp_path / "big.parquet")
    # tens of MB of INCOMPRESSIBLE text in one file (repeat('x',...)
    # snappy-compresses under the 2 MB floor and defeats the test)
    spark.range(150_000).selectExpr(
        "id", "repeat(md5(CAST(id AS STRING)), 8) AS t"
    ).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return  # scan already fills the cluster: fan_out must no-op
    out = fan_out(df)
    assert out.rdd.getNumPartitions() > df.rdd.getNumPartitions()


def test_already_parallel_input_is_untouched(spark):
    df = spark.range(10_000).repartition(64)
    assert fan_out(df) is df


def test_in_memory_frame_assumes_big(spark):
    # no input files -> size unknown -> err toward parallelism
    df = spark.createDataFrame([(i,) for i in range(10)], "x int").coalesce(1)
    out = fan_out(df)
    assert (
        out.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
