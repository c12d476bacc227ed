"""BPE tokenizer induction over a document corpus.

Learns the first N byte-pair-encoding merges (Sennrich, Haddow &
Birch 2016, "Neural Machine Translation of Rare Words with Subword
Units" — the WordPiece/BPE family every modern LLM tokenizer
descends from) with the classic scale trick made distributed: BPE
training never iterates the corpus, it iterates the WORD-FREQUENCY
dictionary. The corpus-scale work is therefore exactly ONE
map-side-combined token groupBy (the same shuffle shape as
vocab_top_tokens); every merge round after that runs over the
|vocab|-row symbol table, and the only driver traffic is one
(pair, count) row per round — a bounded model parameter, like the
IVF centroids.

Determinism contract: pair counts are exact integer sums and the
round winner is (count desc, left asc, right asc) — so the merge
table is reproducible across partitionings and engines, and the
pure-Python reference in tests/test_bpe.py must match it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_covid19_spark.functions import text

END_OF_WORD = "</w>"

MERGE_SCHEMA = T.StructType(
    [
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("left", T.StringType(), False),
        T.StructField("right", T.StringType(), False),
        T.StructField("merged", T.StringType(), False),
        T.StructField("pair_count", T.LongType(), False),
    ]
)


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the whitespace tokenization — the dict BPE
    trains on. Map-side combine keeps the shuffle at |vocab|."""
    return (
        df.select(F.explode(text.tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _symbols(word: Column) -> Column:
    """Initial symbol sequence: characters + an end-of-word marker
    (so merges can learn suffixes without crossing word borders)."""
    return F.concat(F.split(word, ""), F.array(F.lit(END_OF_WORD)))


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<l,r>> of adjacent symbol pairs. Guarded for
    fully-merged single-symbol words: sequence(1, 0) counts DOWN in
    Spark, so an unguarded index range would read past the array
    under ANSI element_at."""
    idx = F.sequence(F.lit(1), F.size(syms) - 1)
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(syms, i).alias("l"),
            F.element_at(syms, i + 1).alias("r"),
        ),
    )
    empty = F.array().cast(
        "array<struct<l:string,r:string>>"
    )
    return F.when(F.size(syms) >= 2, pairs).otherwise(empty)


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) into one
    symbol — the standard BPE apply step as a Catalyst fold. A
    freshly merged symbol is itself eligible as the LEFT of the next
    merge only if its concatenation equals `left` (the greedy
    semantics the Python reference mirrors)."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_merge_table(
    spark: SparkSession,
    df: DataFrame,
    text_col: str,
    n_merges: int = 20,
    min_count: int = 2,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges; returns the merge
    table (rank, left, right, merged, pair_count). Stops early when
    the best pair drops below ``min_count``.

    Scale: each round's pair aggregate runs over the materialized
    |vocab|-row symbol table (weighted by word freq — corpus size
    only enters through the one up-front groupBy), and each round
    collects exactly one row. Each round ``localCheckpoint``s its
    symbol table — the same lineage cut as connected_components:
    a persist() chain instead nests every round's cached AQE plan
    inside the next, and driver-side plan-string generation grows
    superlinearly with rounds (measured: ~10 s/stage by round 15)."""
    words = word_frequencies(df, text_col).select(
        _symbols(F.col("word")).alias("syms"), "freq"
    )
    words = words.localCheckpoint(eager=True)
    merges: list[tuple] = []
    for rank in range(n_merges):
        pairs = (
            words.select(
                F.explode(_adjacent_pairs(F.col("syms"))).alias("p"),
                "freq",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
        )
        top = (
            pairs.orderBy(
                F.col("cnt").desc(),
                F.col("l").asc(),
                F.col("r").asc(),
            ).limit(1)
        ).collect()
        if not top or top[0]["cnt"] < min_count:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((rank, left, right, left + right, cnt))
        words = words.select(
            _apply_merge(F.col("syms"), left, right).alias("syms"),
            "freq",
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(merges, MERGE_SCHEMA)


def apply_merges(syms: Column, merges: list[tuple]) -> Column:
    """Encode: replay the learned merge table in rank order — each
    rank is one greedy left-to-right fold, exactly the transform
    training applied, so encode states match training states. The
    merge table is a bounded model parameter (≤ vocab growth, tens
    to ~50k rows in practice); it ships into the plan as literals,
    the classic broadcast-model pattern."""
    out = syms
    for m in merges:
        out = _apply_merge(out, m[1], m[2])
    return out


def encode_stats(
    df: DataFrame, text_col: str, merges: list[tuple]
) -> DataFrame:
    """Per-document BPE tokenization stats: token count after
    applying the merge table, characters-per-token compression.
    Map-only over the corpus (the merge folds are per-word; no
    shuffle at all)."""
    words = text.tokens(text_col)
    per_word = F.transform(
        words, lambda w: F.size(apply_merges(_symbols(w), merges))
    )
    n_tokens = F.aggregate(
        per_word, F.lit(0), lambda acc, n: acc + n
    )
    return df.select(
        "doc_id",
        F.length(F.col(text_col)).cast("bigint").alias("n_chars"),
        n_tokens.cast("bigint").alias("n_bpe_tokens"),
    ).withColumn(
        "chars_per_token",
        F.round(
            F.col("n_chars")
            / F.greatest(F.col("n_bpe_tokens"), F.lit(1)),
            6,
        ),
    )
