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
    shuffle at all).

    This is the Catalyst REFERENCE form: ``len(merges)`` chained
    interpreted (CodegenFallback) aggregate folds per word — exact
    but measured at sf1 as a 120 s+ sweep timeout. Production path
    is `encode_stats_arrow` (identical output, parity-tested); this
    form stays as its engine-side cross-check and the shape the
    generated SQL oracle mirrors."""
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


def encode_stats_arrow(
    df: DataFrame, text_col: str, merges: list[tuple]
) -> DataFrame:
    """Arrow-kernel twin of `encode_stats` — the round-4 sweep found
    the 20 chained CodegenFallback merge folds timing out at sf1;
    this kernel applies the SAME greedy left-to-right merge replay
    per UNIQUE word (dictionary-encode the token stream in C, encode
    each distinct word once in Python with a per-worker memo that
    persists across batches, scatter counts back with bincount) —
    work drops from |word instances|·|merges| interpreted folds to
    |vocab|·|merges| Python loops plus vectorized tokenize/count.

    Exact-integer output, so parity with the Catalyst form is
    equality, not ulp-tolerance: NULL text → NULL stats (length and
    aggregate of a NULL array are NULL), symbols are CODEPOINTS
    (F.split(word, '') semantics == Python list(str)), tokens are
    the same ``\\s+``-split non-empties, and chars_per_token is
    computed Catalyst-side from the kernel's integers so rounding
    matches the reference and the SQL oracle bit-for-bit. Pinned by
    tests/test_bpe.py parity incl. NULL/unicode rows."""
    import numpy as np

    merge_rules = [(m[1], m[2], m[1] + m[2]) for m in merges]
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("n_chars", T.LongType(), True),
            T.StructField("n_bpe_tokens", T.LongType(), True),
        ]
    )
    proj = df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(text_col).alias("_t"),
    )

    def kernel(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        memo: dict[str, int] = {}

        def encode_len(word: str) -> int:
            n = memo.get(word)
            if n is not None:
                return n
            syms = list(word)
            syms.append(END_OF_WORD)
            for left, right, merged in merge_rules:
                if len(syms) < 2:
                    break
                out: list[str] = []
                ap = out.append
                for s in syms:
                    if out and s == right and out[-1] == left:
                        out[-1] = merged
                    else:
                        ap(s)
                syms = out
            memo[word] = len(syms)
            return memo[word]

        ws_pat = "[ \t\n\x0b\x0c\r]+"
        for b in batches:
            ids = b.column(0).to_numpy(zero_copy_only=False)
            n_docs = len(ids)
            txt = b.column(1)
            null_mask = np.zeros(n_docs, dtype=bool)
            if txt.null_count:
                null_mask = pc.is_null(txt).to_numpy(
                    zero_copy_only=False
                )
                txt = pc.fill_null(txt, "")
            n_chars = pc.utf8_length(txt).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            toks = pc.split_pattern_regex(txt, ws_pat)
            flat = pc.list_flatten(toks)
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            parents = pc.list_parent_indices(toks).to_numpy(
                zero_copy_only=False
            )
            keep = pc.utf8_length(flat).to_numpy(
                zero_copy_only=False
            ) > 0
            dict_arr = flat.dictionary_encode()
            codes = dict_arr.indices.to_numpy(zero_copy_only=False)
            vocab = dict_arr.dictionary.to_pylist()
            per_word = np.fromiter(
                (encode_len(w) for w in vocab),
                dtype=np.int64,
                count=len(vocab),
            )
            contrib = np.where(keep, per_word[codes], 0)
            n_tok = np.bincount(
                parents, weights=contrib, minlength=n_docs
            ).astype(np.int64)
            chars_arr = (
                pa.array(n_chars, pa.int64(), mask=null_mask)
                if null_mask.any()
                else pa.array(n_chars, pa.int64())
            )
            tok_arr = (
                pa.array(n_tok, pa.int64(), mask=null_mask)
                if null_mask.any()
                else pa.array(n_tok, pa.int64())
            )
            yield pa.record_batch(
                [pa.array(ids, pa.int64()), chars_arr, tok_arr],
                names=["doc_id", "n_chars", "n_bpe_tokens"],
            )

    from etl_covid19_spark.operators.parallelism import fan_out

    stats = fan_out(proj).mapInArrow(kernel, out_schema)
    return stats.withColumn(
        "chars_per_token",
        F.round(
            F.col("n_chars")
            / F.greatest(F.col("n_bpe_tokens"), F.lit(1)),
            6,
        ),
    )
