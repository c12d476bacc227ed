"""Model-based corpus-curation scorers — extension surface
(SURVEY.md §7.2 step 9) beyond the rule-based text kit
(`functions/text.py`):

- a fastText-shaped hashed n-gram LINEAR CLASSIFIER (Joulin et al.
  2016, arXiv:1607.01759): tokens and token bigrams hash into K
  weight buckets, the document score is sigmoid(bias + mean bucket
  weight) — the standard learned quality-filter architecture (GPT-3 /
  CCNet-style "looks like reference corpus" scoring);
- a smoothed UNIGRAM LANGUAGE-MODEL PERPLEXITY filter (the CCNet
  perplexity-bucket shape, Wenzek et al. 2020, arXiv:1911.00359,
  with the KenLM 5-gram swapped for an in-engine unigram LM so the
  model itself is a Spark aggregation).

Both are pure Catalyst column expressions / DataFrame aggregations:
no Python in the row path, engine-agnostic arithmetic (the DuckDB
oracles reproduce scores to 6 decimals).

Scale shape:
- classifier: map-side only — weights are a K-entry literal array
  (bounded model parameters, the same shipping contract as the LSH
  planes in `operators/similarity.py`); zero shuffle.
- perplexity: one explode + two hash aggregations (doc×token, then
  token) whose map-side partials collapse each partition to its
  distinct-token counts before any exchange; the vocabulary table is
  vocab-bounded (not corpus-bounded) and re-joins the doc×token
  counts on an equi key. Corpus totals (N, V) are a 1-row aggregate
  collected as bounded model parameters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from etl_covid19_spark.operators.parallelism import fan_out

from etl_covid19_spark.functions import text

N_BUCKETS = 64
BIAS = 0.25
_WEIGHT_SEED = 11


def make_classifier_weights(k: int = N_BUCKETS, seed: int = _WEIGHT_SEED) -> list[float]:
    """Deterministic pseudo-random bucket weights in [-1, 1) — the
    same LCG scheme as `similarity.make_planes`, so "trained" weights
    are reproducible across engines and runs. A real deployment
    would substitute weights fit offline (the dataflow is identical:
    a K-float literal array)."""
    state = seed
    out = []
    for _ in range(k):
        state = (state * 1103515245 + 12345) % (2**31)
        out.append((state / 2**31) * 2.0 - 1.0)
    return out


def _tokens_sql(col: str) -> str:
    return f"filter(split(trim(`{col}`), '\\\\s+'), t -> t != '')"


def _buckets_sql(col: str, k: int) -> str:
    return (
        f"transform({_tokens_sql(col)}, "
        f"t -> (CAST(ascii(substring(t, 1, 1)) AS BIGINT) * 1000 "
        f"+ length(t)) % {k})"
    )


def features_sql(col: str, k: int = N_BUCKETS) -> str:
    """SQL text for the unigram+bigram hashed feature ids. All
    classifier expressions are generated as SQL STRINGS and parsed
    once in the JVM: the identical py4j Column construction measured
    ~3 s of serial driver time per call (the MinHash/IVF-PQ lesson —
    wide literal-array expressions are cheap to run, expensive to
    build call-by-call)."""
    b = _buckets_sql(col, k)
    return (
        f"concat({b}, CASE WHEN size({b}) >= 2 THEN "
        f"zip_with(slice({b}, 1, size({b}) - 1), "
        f"slice({b}, 2, size({b}) - 1), "
        f"(x, y) -> (x * 31 + y) % {k}) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END)"
    )


def score_sql(
    col: str,
    weights: list[float] | None = None,
    bias: float = BIAS,
    k: int = N_BUCKETS,
) -> str:
    """SQL text for sigmoid(bias + mean_{f ∈ features} W[f])."""
    w = weights if weights is not None else make_classifier_weights(k)
    warr = "array(" + ",".join(f"CAST('{x!r}' AS DOUBLE)" for x in w) + ")"
    feats = features_sql(col, k)
    wsum = (
        f"aggregate({feats}, CAST(0.0 AS DOUBLE), "
        f"(acc, f) -> acc + element_at({warr}, CAST(f AS INT) + 1))"
    )
    mean_w = (
        f"CASE WHEN size({feats}) > 0 THEN {wsum} / size({feats}) "
        f"ELSE CAST(0.0 AS DOUBLE) END"
    )
    z = f"(CAST('{float(bias)!r}' AS DOUBLE) + {mean_w})"
    return f"CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-{z}))"


def with_classifier_score(
    df: DataFrame,
    text_col: str,
    weights: list[float] | None = None,
    bias: float = BIAS,
    k: int = N_BUCKETS,
) -> DataFrame:
    """Stage the classifier through columns: `n_features` and
    `_score_raw` appended to `df`. The feature array materializes
    ONCE per row — referenced by both the size and the weight fold,
    so CollapseProject keeps the stage instead of inlining the
    tokenizer into every consumer (the monolithic expression
    re-evaluated the feature pipeline 3×: measured 2.0 s vs 0.68 s
    at sf0.1). Queries derive round/threshold columns from
    `_score_raw` so Spark and the SQL oracle filter on the same raw
    double."""
    w = weights if weights is not None else make_classifier_weights(k)
    warr = "array(" + ",".join(f"CAST('{x!r}' AS DOUBLE)" for x in w) + ")"
    staged = df.withColumn("_feats", F.expr(features_sql(text_col, k)))
    staged = staged.withColumn("n_features", F.size("_feats")).withColumn(
        "_wsum",
        F.expr(
            f"aggregate(_feats, CAST(0.0 AS DOUBLE), "
            f"(acc, f) -> acc + element_at({warr}, CAST(f AS INT) + 1))"
        ),
    )
    mean_w = F.when(
        F.col("n_features") > 0, F.col("_wsum") / F.col("n_features")
    ).otherwise(F.lit(0.0))
    z = F.lit(float(bias)) + mean_w
    return staged.withColumn(
        "_score_raw", F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    ).drop("_feats", "_wsum")


def token_buckets(col: str, k: int = N_BUCKETS) -> F.Column:
    """Engine-agnostic token hash → bucket id in [0, k): the
    (first-codepoint, length) polynomial used by
    `text.fingerprint`, reduced mod k. array<bigint>."""
    return F.expr(_buckets_sql(col, k))


def classifier_features(col: str, k: int = N_BUCKETS) -> F.Column:
    """Unigram + bigram hashed feature ids (fastText's word-n-gram
    trick): bigram bucket = (b_i·31 + b_{i+1}) mod k."""
    return F.expr(features_sql(col, k))


def classifier_score(
    col: str,
    weights: list[float] | None = None,
    bias: float = BIAS,
    k: int = N_BUCKETS,
) -> F.Column:
    """sigmoid(bias + mean_{f ∈ features} W[f]) ∈ (0, 1); documents
    with no tokens score sigmoid(bias). The weight fetch is an
    element_at into a literal array — no joins, no Python in the
    row path."""
    return F.expr(score_sql(col, weights, bias, k))


def _bucket_token_arrays(txt, k: int):
    """Per-batch hashed-unigram feature buckets shared by the
    classifier and DSIR kernels: an Arrow string column → (bucket
    per valid token in STREAM order, doc index per valid token,
    batch rows). bucket = (first-codepoint·1000 + codepoint-length)
    % k over Java-`\\s` whitespace tokens of the 0x20-trimmed text —
    verbatim the `token_buckets` Catalyst feature (probe-verified
    UTF-8 decode incl. astral planes)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    ws_pat = "[ \t\n\x0b\x0c\r]+"  # Java \s, ASCII-only
    if txt.null_count:
        txt = pc.fill_null(txt, "")
    toks = pc.split_pattern_regex(pc.utf8_trim(txt, " "), ws_pat)
    offs = np.asarray(toks.offsets, dtype=np.int64)
    vals = toks.values  # token strings, absolute-indexed by offs
    nv = len(vals)
    large = pa.types.is_large_string(vals.type)
    vo_dtype = np.int64 if large else np.int32
    bufs = vals.buffers()
    vo = np.frombuffer(bufs[1], vo_dtype)[
        vals.offset : vals.offset + nv + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], np.uint8)
        if bufs[2] is not None
        else np.zeros(0, np.uint8)
    )
    starts, ends = vo[:-1], vo[1:]
    nonempty = ends > starts
    b0 = np.zeros(nv, np.int64)
    b0[nonempty] = data[starts[nonempty]]
    # first code point: vectorized UTF-8 decode of byte 0..3
    cp = b0.copy()
    if (b0 >= 0x80).any():
        guard = len(data) - 1
        b1 = data[np.minimum(starts + 1, guard)].astype(np.int64)
        b2 = data[np.minimum(starts + 2, guard)].astype(np.int64)
        b3 = data[np.minimum(starts + 3, guard)].astype(np.int64)
        m2 = (b0 >= 0xC0) & (b0 < 0xE0)
        m3 = (b0 >= 0xE0) & (b0 < 0xF0)
        m4 = b0 >= 0xF0
        cp[m2] = ((b0[m2] & 0x1F) << 6) | (b1[m2] & 0x3F)
        cp[m3] = (
            ((b0[m3] & 0x0F) << 12)
            | ((b1[m3] & 0x3F) << 6)
            | (b2[m3] & 0x3F)
        )
        cp[m4] = (
            ((b0[m4] & 0x07) << 18)
            | ((b1[m4] & 0x3F) << 12)
            | ((b2[m4] & 0x3F) << 6)
            | (b3[m4] & 0x3F)
        )
    tlen = pc.utf8_length(vals).to_numpy(zero_copy_only=False)
    tlen = np.nan_to_num(tlen).astype(np.int64)
    bucket = (cp * 1000 + tlen) % k

    n = len(toks)
    lo, hi = offs[0], offs[-1]
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    valid = nonempty[lo:hi]
    seq = bucket[lo:hi][valid]
    docv = doc_idx[valid]
    return seq, docv, n


def classifier_scores_arrow(
    df: DataFrame,
    text_col: str,
    keep_cols: list[str],
    weights: list[float] | None = None,
    bias: float = BIAS,
    k: int = N_BUCKETS,
) -> DataFrame:
    """Arrow-kernel twin of `with_classifier_score` — the escape
    hatch SCALE.md documents for the interpreted-HOF bound: Catalyst
    higher-order functions are CodegenFallback, so the pure-Column
    classifier pays per-row interpreter overhead. This path does the
    same arithmetic batch-at-a-time: RE2 tokenization
    (`pc.split_pattern_regex`) + numpy bucket/bigram hashing +
    `np.bincount` weight folds, one `mapInArrow` over a projected
    (keep_cols, text) scan — still zero-shuffle, still map-side, and
    the Python boundary is Arrow-amortized.

    Bit-exactness contract (why this can share the HOF oracle): the
    LCG weights are exact multiples of 2^-30 with |w| < 1, so every
    partial sum of at most 2^23 of them is exactly representable in
    float64 — the fold result is EXACT and order-invariant, and
    `np.bincount`'s accumulation bit-matches Catalyst's left fold.
    The kernel emits only EXACT values (`n_features`, `_wsum`); the
    division, sigmoid, and 6-decimal round happen Spark-side here so
    the transcendental runs in the same JVM `Math.exp` as the HOF
    path — measured: `np.exp` differs in the last ulp on ~7% of real
    docs. Spark's `ascii` returns the full first
    code point (probe-verified, incl. astral) = Python `ord`; Java
    `\\s` is ASCII-only = the RE2 class below; `trim` strips only
    0x20. NULL text is treated as empty (the corpus has none)."""
    import numpy as np

    from pyspark.sql import types as T

    w = np.asarray(
        weights if weights is not None else make_classifier_weights(k),
        dtype=np.float64,
    )
    fields = [df.schema[c] for c in keep_cols] + [
        T.StructField("n_features", T.IntegerType(), True),
        T.StructField("_wsum", T.DoubleType(), True),
    ]
    out_schema = T.StructType(fields)
    proj = fan_out(df.select(*keep_cols, text_col))
    n_keep = len(keep_cols)
    fbias = float(bias)

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            seq, docv, n = _bucket_token_arrays(b.column(n_keep), k)
            n_uni = np.bincount(docv, minlength=n)
            s_uni = np.bincount(docv, weights=w[seq], minlength=n)
            if len(seq) > 1:
                adj = docv[1:] == docv[:-1]
                bg = (seq[:-1] * 31 + seq[1:]) % k
                dsrc = docv[:-1][adj]
                s_bi = np.bincount(dsrc, weights=w[bg[adj]], minlength=n)
                n_bi = np.bincount(dsrc, minlength=n)
            else:
                s_bi = np.zeros(n)
                n_bi = np.zeros(n, np.int64)
            nf = n_uni + n_bi
            wsum = s_uni + s_bi  # exact: multiples of 2^-30, |sum| < 2^23
            yield pa.RecordBatch.from_arrays(
                [b.column(i) for i in range(n_keep)]
                + [
                    pa.array(nf.astype(np.int32), pa.int32()),
                    pa.array(wsum, pa.float64()),
                ],
                names=keep_cols + ["n_features", "_wsum"],
            )

    staged = proj.mapInArrow(kernel, out_schema)
    mean_w = F.when(
        F.col("n_features") > 0,
        F.col("_wsum") / F.col("n_features").cast("double"),
    ).otherwise(F.lit(0.0))
    z = F.lit(fbias) + mean_w
    return staged.withColumn(
        "_score_raw", F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    ).drop("_wsum")


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_metrics(col: str) -> dict[str, F.Column]:
    """The Gopher §A1.1 document-level rule metrics as named Column
    expressions (word-count/mean-length bounds, symbol ratio,
    alphabetic fraction, stop-word presence, composite `pass`) — one
    definition shared by `gopher_quality_filter` and the
    signal-agreement audit. All map-side."""
    toks = text.tokens(col)
    n = F.size(toks)
    nsafe = F.greatest(n, F.lit(1))
    mean_wl = text.mean_token_length(col)
    n_hash = F.length(col) - F.length(F.regexp_replace(col, "#", ""))
    n_ell = (
        F.length(col) - F.length(F.regexp_replace(col, r"\.\.\.", ""))
    ) / 3
    symbol_ratio = (n_hash + n_ell) / nsafe
    alpha_frac = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / nsafe
    stops = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(
        F.array_intersect(F.array_distinct(F.transform(toks, F.lower)), stops)
    )
    passed = (
        n.between(50, 100000)
        & mean_wl.between(3, 10)
        & (symbol_ratio <= 0.1)
        & (alpha_frac >= 0.8)
        & (n_stop >= 2)
    )
    return {
        "n_tokens": n,
        "mean_word_len": mean_wl,
        "symbol_ratio": symbol_ratio,
        "alpha_word_frac": alpha_frac,
        "n_stop_distinct": n_stop,
        "pass": passed,
    }


def dsir_importance(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    target,
    keep_cols: tuple[str, ...] = (),
    k: int = N_BUCKETS,
    alpha: float = 0.5,
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023, arXiv:2302.03169) on hashed unigram features: score every
    raw document by how much more likely it is under the TARGET
    domain's bucket distribution than under the raw corpus's,
    log_importance = Σ_{f ∈ doc} [ln p_target(f) − ln p_raw(f)]
    with add-α smoothing. High scores = "looks like the target
    domain"; downstream selection resamples by this weight.

    `target` is a boolean Column over `docs` defining the target
    domain (e.g. lang == 'en').

    Scale shape — DSIR's design point is that the importance model
    is TINY, and the dataflow honors it: one explode + one k-row
    conditional aggregate learns both distributions in a single
    pass (map-side partials collapse each partition to ≤ k rows);
    the 2k counts are collected as bounded model parameters and the
    per-doc score is a zero-shuffle map-side fold over a k-entry
    literal weight array — at 100 TB the scoring pass is
    embarrassingly parallel and touches each document once.

    Both passes run as Arrow kernels over `_bucket_token_arrays`
    (the classifier's probe-verified feature buckets) — the HOF
    explode + fold form cost 41 s at sf10's 500k docs and stays
    available via `token_buckets` as the engine-pure cross-check.
    Bit-exactness of the score: the Catalyst fold is a sequential
    left sum of weight lookups in token-stream order, so the kernel
    accumulates per-doc sums position-block by position-block
    (every doc has at most one token at position j — plain
    vectorized adds in the same IEEE order; np.add.reduceat would
    NOT match: numpy reduce is pairwise for long segments)."""
    import math

    import numpy as np

    from pyspark.sql import types as T

    cnt_schema = T.StructType(
        [
            T.StructField("f", T.IntegerType(), True),
            T.StructField("cr", T.LongType(), True),
            T.StructField("ct", T.LongType(), True),
        ]
    )
    proj1 = fan_out(
        docs.select(
            target.cast("long").alias("_is_t"),
            F.col(text_col).alias("_t"),
        )
    )

    def count_kernel(batches):
        import numpy as np
        import pyarrow as pa

        cr_acc = np.zeros(k, np.int64)
        ct_acc = np.zeros(k, np.int64)
        seen = False
        for b in batches:
            seq, docv, _n = _bucket_token_arrays(b.column(1), k)
            if not len(seq):
                seen = True
                continue
            ist = b.column(0).to_numpy(zero_copy_only=False)
            ist = np.nan_to_num(ist).astype(np.int64)
            cr_acc += np.bincount(seq, minlength=k)
            ct_acc += np.bincount(
                seq, weights=ist[docv].astype(np.float64), minlength=k
            ).astype(np.int64)
            seen = True
        if seen:
            yield pa.record_batch(
                [
                    pa.array(np.arange(k, dtype=np.int32), pa.int32()),
                    pa.array(cr_acc, pa.int64()),
                    pa.array(ct_acc, pa.int64()),
                ],
                names=["f", "cr", "ct"],
            )

    rows = (
        proj1.mapInArrow(count_kernel, cnt_schema)
        .groupBy("f")
        .agg(F.sum("cr").alias("cr"), F.sum("ct").alias("ct"))
        .collect()
    )
    cr = {int(r["f"]): int(r["cr"]) for r in rows}
    ct = {int(r["f"]): int(r["ct"]) for r in rows}
    nr, nt = sum(cr.values()), sum(ct.values())
    lam = [
        math.log((ct.get(i, 0) + alpha) / (nt + alpha * k))
        - math.log((cr.get(i, 0) + alpha) / (nr + alpha * k))
        for i in range(k)
    ]
    w = np.asarray(lam, dtype=np.float64)

    fields = (
        [docs.schema[id_col]]
        + [docs.schema[c] for c in keep_cols]
        + [
            T.StructField("n_features", T.IntegerType(), True),
            T.StructField("_wsum", T.DoubleType(), True),
        ]
    )
    score_schema = T.StructType(fields)
    n_keep = 1 + len(keep_cols)
    proj2 = fan_out(
        docs.select(id_col, *keep_cols, F.col(text_col).alias("_t"))
    )

    def score_kernel(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            seq, docv, n = _bucket_token_arrays(b.column(n_keep), k)
            nf = np.bincount(docv, minlength=n)
            wsum = np.zeros(n)
            if len(seq):
                run_starts = np.flatnonzero(
                    np.r_[True, docv[1:] != docv[:-1]]
                )
                run_len = np.diff(np.r_[run_starts, len(docv)])
                pos = np.arange(len(docv)) - np.repeat(
                    run_starts, run_len
                )
                order = np.lexsort((docv, pos))
                seqo = seq[order]
                docvo = docv[order]
                poso = pos[order]
                bs = np.flatnonzero(
                    np.r_[True, poso[1:] != poso[:-1]]
                )
                be = np.r_[bs[1:], len(poso)]
                for s, e in zip(bs, be):
                    wsum[docvo[s:e]] += w[seqo[s:e]]
            yield pa.RecordBatch.from_arrays(
                [b.column(i) for i in range(n_keep)]
                + [
                    pa.array(nf.astype(np.int32), pa.int32()),
                    pa.array(wsum, pa.float64()),
                ],
                names=[id_col, *keep_cols, "n_features", "_wsum"],
            )

    staged = proj2.mapInArrow(score_kernel, score_schema)
    # + 0.0 canonicalizes IEEE negative zero: a doc whose weight sum
    # is a tiny negative (< 0.5e-6) rounds to -0.0, which formats as
    # "-0" in some canonicalizers while the oracle's equally-tiny
    # POSITIVE sum formats as "0" (surfaced by the sf1 differential:
    # two 50k-doc rows flipped sign below the rounding grain). IEEE
    # -0.0 + 0.0 = +0.0, so both sides land on one rendering.
    return staged.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        "n_features",
        (F.round(F.col("_wsum"), 6) + F.lit(0.0)).alias("log_importance"),
    )


def bigram_perplexity(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    alpha: float = 0.5,
    lam: float = 0.7,
) -> DataFrame:
    """Interpolated bigram LM perplexity — the next rung of the
    CCNet ladder above `unigram_perplexity`: the first token scores
    under the smoothed unigram model and every following token under
    λ·p(w₂|w₁) + (1−λ)·p(w₂), with add-α smoothing on both models
    and exact context counts (Σ_w₂ C₂(w₁,w₂)) as the bigram
    denominator.

    Scale shape: both model tables are VOCAB-bounded, not
    corpus-bounded — C₁ is |V| rows and C₂ at most |V|² but in
    practice ~corpus-distinct-bigrams, with map-side partials
    collapsing each partition before the token-keyed shuffles; the
    corpus totals (N, V) are one collected stats row. Scoring joins
    the per-doc (w₁,w₂) counts against the two model tables on token
    keys and re-aggregates by doc with exact DECIMAL accumulation
    (partition-invariant, same contract as `unigram_perplexity`)."""
    from pyspark.sql import Window

    from etl_covid19_spark.operators.df_cache import SHARED_CACHE, corpus_key

    # ONE tokenization pass: the (doc, pos, token) frame persists in
    # the shared bounded pool and every branch (unigram counts,
    # bigram counts via a lag window, first-token scoring, doc
    # lengths) reads it back — the naive four-branch plan
    # re-tokenized the corpus per branch (measured 10.4 s warm at
    # sf1; this shape halves it).
    key = ("lm_positions", corpus_key(docs), text_col, id_col)
    pos_frame = SHARED_CACHE.get_or_build(
        key,
        lambda: text.token_positions_arrow(docs, text_col, id_col),
    )
    c1 = pos_frame.groupBy(F.col("token").alias("w")).agg(F.count(F.lit(1)).alias("c1"))
    stats = c1.agg(
        F.sum("c1").alias("N"), F.count(F.lit(1)).alias("V")
    ).collect()[0]
    n_total, vsz = int(stats["N"]), int(stats["V"])
    denom_uni = float(n_total + alpha * vsz)

    wspec = Window.partitionBy("_doc").orderBy("pos")
    seq = pos_frame.withColumn("w1", F.lag("token").over(wspec))
    pairs = seq.where(F.col("w1").isNotNull()).select(
        "_doc", "w1", F.col("token").alias("w2")
    )
    c2 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    ctx = c2.groupBy("w1").agg(F.sum("c2").alias("cctx"))

    dt2 = pairs.groupBy("_doc", "w1", "w2").agg(
        F.count(F.lit(1)).alias("n")
    )
    p_big = (F.col("c2") + F.lit(alpha)) / (
        F.col("cctx") + F.lit(alpha * vsz)
    )
    p_uni = (F.col("c1") + F.lit(alpha)) / F.lit(denom_uni)
    p_interp = F.lit(lam) * p_big + F.lit(1.0 - lam) * p_uni
    nll2 = (
        dt2.join(c2, ["w1", "w2"])
        .join(ctx, "w1")
        .join(c1.withColumnRenamed("w", "w2"), "w2")
        .select(
            "_doc",
            (F.col("n") * -F.log(p_interp)).alias("_nll"),
        )
    )
    firsts = pos_frame.where(F.col("pos") == 0).select(
        "_doc", F.col("token").alias("w")
    )
    nll1 = firsts.join(c1, "w").select(
        "_doc",
        (-F.log((F.col("c1") + F.lit(alpha)) / F.lit(denom_uni))).alias(
            "_nll"
        ),
    )
    per_doc = (
        nll1.unionByName(nll2)
        .groupBy("_doc")
        .agg(
            F.sum(F.col("_nll").cast("decimal(28,18)"))
            .cast("double")
            .alias("_h_sum")
        )
        .join(
            pos_frame.groupBy("_doc").agg(
                F.count(F.lit(1)).alias("n_tokens")
            ),
            "_doc",
        )
    )
    ce = F.col("_h_sum") / F.col("n_tokens")
    return per_doc.select(
        F.col("_doc").alias(id_col),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(ce, 6).alias("cross_entropy"),
        F.round(F.exp(ce), 6).alias("perplexity"),
    )


def unigram_perplexity(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document perplexity under an add-α-smoothed unigram LM
    trained on the corpus itself: p(t) = (count(t) + α) / (N + α·V).

    Returns (id, n_tokens, cross_entropy, perplexity) where
    cross_entropy = Σ_t n_t·(−ln p(t)) / n_doc and perplexity =
    exp(cross_entropy) — the CCNet filter statistic (low = head-like
    fluent text, high = noise/outlier documents).

    Dataflow: explode once to (doc, token); aggregate to per-doc
    token counts (this IS the per-doc feature table, reused for
    scoring); roll those up to the vocabulary table (map-side
    partials mean the token shuffle carries distinct-token partial
    counts, not token instances); equi-join counts back on token and
    re-aggregate by doc. N and V are a single collected stats row
    (bounded model parameters). At web scale the vocab table is
    millions of rows — small enough for AQE to broadcast the join,
    which is why no broadcast is forced here."""
    from etl_covid19_spark.operators import dedup
    from etl_covid19_spark.operators.df_cache import SHARED_CACHE, corpus_key

    # Pooled PRE-AGGREGATED (doc, token-hash, n) counts straight out
    # of the Arrow token kernel: the HOF tokenize + corpus-size
    # posexplode + (doc, token) groupBy was the measured 60 s of
    # this query at sf10; the kernel emits the 12M-row count table
    # directly (64-bit hashed token identity — no consumer sees
    # token values). The (doc, pos, token) positions pool remains
    # the shared frame for ORDER-sensitive consumers (bigram LM,
    # phrase search, PMI).
    key = ("lm_tok_counts", corpus_key(docs), text_col, id_col)
    doc_tok = SHARED_CACHE.get_or_build(
        key,
        lambda: dedup.token_count_postings_arrow(
            docs, text_col, id_col
        ).select(
            F.col("doc_id").alias("_doc"),
            F.col("tok").alias("token"),
            "n",
        ),
    )
    vocab = doc_tok.groupBy("token").agg(F.sum("n").alias("cnt"))
    stats = vocab.agg(
        F.sum("cnt").alias("N"), F.count("*").alias("V")
    ).collect()[0]
    denom = float(int(stats["N"]) + alpha * int(stats["V"]))
    nll = F.col("n") * -F.log((F.col("cnt") + F.lit(alpha)) / F.lit(denom))
    per_doc = (
        doc_tok.join(vocab, "token")
        .withColumn("_nll", nll.cast("decimal(28,18)"))
        .groupBy("_doc")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.sum("_nll").cast("double").alias("_h_sum"),
        )
    )
    ce = F.col("_h_sum") / F.col("n_tokens")
    return per_doc.select(
        F.col("_doc").alias(id_col),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(ce, 6).alias("cross_entropy"),
        F.round(F.exp(ce), 6).alias("perplexity"),
    )


def repetition_signals_batch(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Gopher repetition signals as an Arrow batch kernel — the scale
    path for LONG documents. The Catalyst sorted-array fold
    (`text.top_ngram_stats`) is the right shape for short docs (zero
    shuffle, no Python), but its interpreted per-gram struct fold is
    O(tokens) with a ~100 µs constant: on a 3000-token corpus it
    measured >9 MINUTES for 2000 docs where this kernel takes
    seconds. Same outputs bit-for-bit: counts are integers, the
    tie-break is the lexicographically smallest gram among the
    maxima (what the sorted fold's strict `>` yields), and the char
    fractions are single double divisions of exact integers — so the
    relational SQL oracle verifies BOTH implementations."""
    from collections import Counter

    def one(doc_id, textv):
        toks = textv.split()
        n = len(toks)
        nd = len(set(toks))
        dup = float(n - nd) / n if n else 0.0
        total_chars = sum(len(t) for t in toks)
        out = [int(doc_id), dup]
        for g in (2, 3):
            if n >= g:
                grams = Counter(
                    " ".join(toks[i : i + g]) for i in range(n - g + 1)
                )
                best_n = max(grams.values())
                best = min(k for k, v in grams.items() if v == best_n)
                gram_chars = len(best.replace(" ", ""))
                frac = (
                    float(best_n * gram_chars) / total_chars
                    if total_chars > 0 and best_n > 0
                    else 0.0
                )
                out += [best, int(best_n), frac]
            else:
                out += ["", 0, 0.0]
        return tuple(out)

    def batches(it):
        for pdf in it:
            rows = [
                one(d, t) for d, t in zip(pdf[id_col], pdf[text_col])
            ]
            import pandas as pd

            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "dup_token_frac",
                    "top_bigram", "top_bigram_n", "top_bigram_char_frac",
                    "top_trigram", "top_trigram_n", "top_trigram_char_frac",
                ],
            )

    return fan_out(df.select(id_col, text_col)).mapInPandas(
        batches,
        schema=(
            "doc_id long, dup_token_frac double, "
            "top_bigram string, top_bigram_n long, "
            "top_bigram_char_frac double, "
            "top_trigram string, top_trigram_n long, "
            "top_trigram_char_frac double"
        ),
    )
