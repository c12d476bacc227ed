"""Text-analysis kit for large-scale training-data pipelines.

Extension surface beyond the reference (SURVEY.md §7.2 step 9):
tokenization, n-gram shingling, quality scoring, token counting,
language-ID heuristics, and document fingerprinting — all as
JVM-side column expressions (no Python UDFs), so they vectorize and
stay inside whole-stage codegen when run over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from etl_covid19_spark.operators.parallelism import fan_out

# Small multilingual stopword marker sets for the heuristic
# language-ID scorer (deterministic, SQL-expressible).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "de", "et", "les"),
    "de": ("der", "die", "und", "das", "ist"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}

EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
    "for", "on", "with", "as", "at", "by", "it", "this", "that",
)


def tokens(col: Column | str) -> Column:
    """Whitespace tokenizer → array<string> (empty-safe)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


BPE_ISH_PATTERN = r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]+"


def bpe_ish_tokens(col: Column | str) -> Column:
    """BPE-ish pieces: alphanumeric runs and punctuation runs each
    count as one piece — a cheap proxy for a subword tokenizer. The
    run-extraction pattern uses no lookarounds, so it's portable to
    RE2-based engines (the DuckDB oracle runs the same regex)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), F.lit(0))


def bpe_ish_token_count(col: Column | str) -> Column:
    return F.size(bpe_ish_tokens(col))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct n-gram word shingles → array<string>. The unit of the
    Jaccard/MinHash dedup family (operators.dedup)."""
    toks = tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    # A doc shorter than n tokens yields its whole text as one shingle.
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def punct_ratio(col: Column | str) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"[A-Za-z0-9\s]", "")
    return F.length(stripped) / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Fraction of tokens that are (lowercased) stopwords."""
    toks = tokens(col)
    stops = F.size(F.filter(toks, lambda t: F.lower(t).isin(*stopwords)))
    return stops / F.greatest(F.size(toks), F.lit(1))


def mean_token_length(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: favors mid-length docs with
    sane token lengths, low punctuation noise, and some stopword
    glue — the standard pre-training quality-filter shape."""
    c = F.col(col) if isinstance(col, str) else col
    len_score = F.least(F.length(c) / F.lit(200.0), F.lit(1.0))
    tok_len = mean_token_length(c)
    tok_score = F.when((tok_len >= 2) & (tok_len <= 12), F.lit(1.0)).otherwise(F.lit(0.3))
    punct_score = F.lit(1.0) - F.least(punct_ratio(c) * 5, F.lit(1.0))
    stop_score = F.least(stopword_ratio(c) * 4, F.lit(1.0))
    return F.round(
        0.3 * len_score + 0.3 * tok_score + 0.2 * punct_score + 0.2 * stop_score, 6
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language marker-hit counts for the heuristic language-ID."""
    toks = tokens(col)

    # Closure factory: a default-arg lambda would change the lambda's
    # arity and make Spark bind the element *index* to it instead.
    def hits(markers: tuple[str, ...]) -> Column:
        return F.size(F.filter(toks, lambda t: F.lower(t).isin(*markers)))

    return {lang: hits(markers) for lang, markers in LANG_MARKERS.items()}


def fingerprint(col: Column | str, mod: int = 1_000_000_007, base: int = 131) -> Column:
    """Deterministic rolling document fingerprint.

    Polynomial hash over the token stream where each token
    contributes (ascii(first char), length): h = (h*base + code) % mod.
    Engine-agnostic (same value is computable in ANSI SQL), unlike
    xxhash64/crc32, so it doubles as a cross-system dedup key.
    """
    toks = tokens(col)
    code = lambda t: (F.ascii(F.substring(t, 1, 1)).cast("bigint") * 1000 + F.length(t))
    return F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * base + code(t)) % mod,
    )


def dup_token_fraction(col: Column | str) -> Column:
    """Fraction of token occurrences beyond each token's first
    (unigram repetition — 0.0 for an all-distinct document). One of
    the Gopher-family repetition signals (Rae et al. 2021, §A1.1):
    excessively repetitive documents are low-quality for LM training
    even when their token-level stats look fine."""
    toks = tokens(col)
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    return F.when(
        n > 0, (n - nd).cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))


def top_ngram_stats(col: Column | str, n: int) -> Column:
    """struct(gram, n_occurrences, char_frac) for the most frequent
    word n-gram (ties break to the lexicographically smallest gram).
    `char_frac` is the Gopher "fraction of characters contained in
    the most frequent n-gram": occurrences × the gram's non-space
    chars over the document's total token chars.

    Scale shape: a single map-side fold — grams are materialized per
    row, sorted, and scanned once with an aggregate() accumulator
    tracking the best run, so the mode is found with NO shuffle and
    no per-doc groupBy (the explode→count→window alternative keys
    two shuffles by doc_id). Memory is O(tokens) per row, the same
    bound the tokenizer already implies."""
    toks = tokens(col)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit("").alias("best_gram"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        better = run > acc["best"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["best"]).alias("best"),
            F.when(better, x).otherwise(acc["best_gram"]).alias("best_gram"),
        )

    folded = F.aggregate(F.array_sort(grams), acc0, step)
    total_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    gram_chars = F.length(F.translate(folded["best_gram"], " ", ""))
    frac = F.when(
        (total_chars > 0) & (folded["best"] > 0),
        (folded["best"] * gram_chars).cast("double")
        / total_chars.cast("double"),
    ).otherwise(F.lit(0.0))
    return F.struct(
        folded["best_gram"].alias("gram"),
        folded["best"].alias("n"),
        frac.alias("char_frac"),
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def quality_counts_arrow(
    df,
    keep_cols: list[str],
    text_col: str,
    with_lang: bool = False,
    with_gopher: bool = False,
):
    """Arrow-kernel twin of the per-document quality metric stack
    (tokens / mean_token_length / punct_ratio / stopword_ratio /
    quality_score) — same escape hatch as
    `curation.classifier_scores_arrow` for the interpreted-HOF bound.

    Bit-exactness contract: the kernel emits only EXACT INTEGER
    counts (token count, total token codepoints, non-alphanumeric
    non-space codepoints, stopword hits, text codepoints); every
    division, min/max clamp, and the 6-decimal round happen
    Spark-side in `quality_from_counts`, expression-for-expression
    the formulas of `quality_score` — so the twin shares the HOF
    oracle verbatim. Tokenization is the Java-`\\s` ASCII class over
    a 0x20-only trim, both matching Catalyst (probe-verified in the
    classifier kernel); `utf8_length` counts codepoints = Spark
    `length`; `utf8_lower` = Spark `lower` for the membership test.
    """
    import pyarrow.types  # noqa: F401  (ensure pa.types available)

    from pyspark.sql import types as T

    fields = [df.schema[c] for c in keep_cols] + [
        T.StructField("n_tokens", T.IntegerType(), True),
        T.StructField("total_tok_len", T.LongType(), True),
        T.StructField("n_punct", T.LongType(), True),
        T.StructField("n_stop", T.IntegerType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
    lang_names = [f"s_{lc}" for lc in LANG_MARKERS]
    if with_lang:
        # per-language marker-hit counts (lang_scores) in the same
        # pass — integer equality with the HOF form, so the curate
        # plan's language argmax shares the SQL oracle too
        fields += [
            T.StructField(nm, T.IntegerType(), True) for nm in lang_names
        ]
    gopher_names = ["n_hash", "n_ellipsis", "n_alpha_tok", "n_gstop"]
    if with_gopher:
        # the Gopher §A1.1 rule counts (symbol/alpha/stop-presence)
        # in the same pass — all exact integers, finished Spark-side
        # by `gopher_from_counts` expression-for-expression
        fields += [
            T.StructField("n_hash", T.LongType(), True),
            T.StructField("n_ellipsis", T.LongType(), True),
            T.StructField("n_alpha_tok", T.IntegerType(), True),
            T.StructField("n_gstop", T.IntegerType(), True),
        ]
    out_schema = T.StructType(fields)
    proj = fan_out(df.select(*keep_cols, text_col))
    n_keep = len(keep_cols)
    stop_set = list(EN_STOPWORDS)
    lang_sets = [list(m) for m in LANG_MARKERS.values()]

    def kernel(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        ws_pat = "[ \t\n\x0b\x0c\r]+"  # Java \s, ASCII-only
        # complement of Java [A-Za-z0-9\s], spelled for RE2 (RE2's
        # \s lacks \x0b); each match is exactly one codepoint, so
        # count_substring_regex == length(regexp_replace(...))
        # — and measured 40x cheaper than replace+utf8_length
        # (0.04 s vs 1.6 s over sf1's 50k docs single-threaded)
        punct_pat = "[^A-Za-z0-9 \t\n\x0b\x0c\r]"
        stops = pa.array(stop_set, pa.string())
        lang_arrs = [pa.array(s, pa.string()) for s in lang_sets]
        gstops = pa.array(list(GOPHER_STOPWORDS), pa.string())

        for b in batches:
            txt = b.column(n_keep)
            if txt.null_count:
                txt = pc.fill_null(txt, "")
            n = len(txt)
            n_chars = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
            n_chars = np.nan_to_num(n_chars).astype(np.int64)
            n_punct = pc.count_substring_regex(txt, punct_pat).to_numpy(
                zero_copy_only=False
            )
            n_punct = np.nan_to_num(n_punct).astype(np.int64)

            toks = pc.split_pattern_regex(pc.utf8_trim(txt, " "), ws_pat)
            offs = np.asarray(toks.offsets, dtype=np.int64)
            vals = toks.values
            tlen = pc.utf8_length(vals).to_numpy(zero_copy_only=False)
            tlen = np.nan_to_num(tlen).astype(np.int64)
            low_vals = pc.utf8_lower(vals)
            is_stop = pc.is_in(
                low_vals, value_set=stops
            ).to_numpy(zero_copy_only=False)
            is_stop = np.nan_to_num(is_stop).astype(bool)

            lo, hi = offs[0], offs[-1]
            doc_idx = np.repeat(
                np.arange(n, dtype=np.int64), np.diff(offs)
            )
            valid = tlen[lo:hi] > 0  # drop empty split artifacts
            docv = doc_idx[valid]
            n_tok = np.bincount(docv, minlength=n).astype(np.int64)
            tot_len = np.bincount(
                docv, weights=tlen[lo:hi][valid], minlength=n
            ).astype(np.int64)
            n_stop = np.bincount(
                docv, weights=is_stop[lo:hi][valid], minlength=n
            ).astype(np.int64)
            lang_cols = []
            if with_lang:
                for la in lang_arrs:
                    hit = pc.is_in(
                        low_vals, value_set=la
                    ).to_numpy(zero_copy_only=False)
                    hit = np.nan_to_num(hit).astype(bool)
                    lang_cols.append(
                        pa.array(
                            np.bincount(
                                docv,
                                weights=hit[lo:hi][valid],
                                minlength=n,
                            ).astype(np.int32),
                            pa.int32(),
                        )
                    )
            gopher_cols = []
            if with_gopher:
                n_hash = pc.count_substring(txt, "#").to_numpy(
                    zero_copy_only=False
                )
                n_hash = np.nan_to_num(n_hash).astype(np.int64)
                # non-overlapping count == the replace-based count
                n_ell = pc.count_substring(txt, "...").to_numpy(
                    zero_copy_only=False
                )
                n_ell = np.nan_to_num(n_ell).astype(np.int64)
                alpha = pc.match_substring_regex(
                    vals, "[A-Za-z]"
                ).to_numpy(zero_copy_only=False)
                alpha = np.nan_to_num(alpha).astype(bool)
                n_alpha = np.bincount(
                    docv, weights=alpha[lo:hi][valid], minlength=n
                ).astype(np.int32)
                gidx = pc.index_in(
                    low_vals, value_set=gstops
                ).to_numpy(zero_copy_only=False)
                gv = gidx[lo:hi][valid]
                ghit = ~np.isnan(gv)
                n_g = len(gstops)
                present = np.bincount(
                    (docv[ghit] * n_g + gv[ghit].astype(np.int64)),
                    minlength=n * n_g,
                ).reshape(n, n_g) > 0
                n_gstop = present.sum(axis=1).astype(np.int32)
                gopher_cols = [
                    pa.array(n_hash, pa.int64()),
                    pa.array(n_ell, pa.int64()),
                    pa.array(n_alpha, pa.int32()),
                    pa.array(n_gstop, pa.int32()),
                ]

            yield pa.RecordBatch.from_arrays(
                [b.column(i) for i in range(n_keep)]
                + [
                    pa.array(n_tok.astype(np.int32), pa.int32()),
                    pa.array(tot_len, pa.int64()),
                    pa.array(n_punct, pa.int64()),
                    pa.array(n_stop.astype(np.int32), pa.int32()),
                    pa.array(n_chars, pa.int64()),
                ]
                + lang_cols
                + gopher_cols,
                names=keep_cols
                + [
                    "n_tokens",
                    "total_tok_len",
                    "n_punct",
                    "n_stop",
                    "n_chars",
                ]
                + (lang_names if with_lang else [])
                + (gopher_names if with_gopher else []),
            )

    return proj.mapInArrow(kernel, out_schema)


def quality_from_counts() -> dict[str, Column]:
    """Spark-side finisher over `quality_counts_arrow` output:
    expression-for-expression the `mean_token_length` /
    `punct_ratio` / `stopword_ratio` / `quality_score` formulas with
    the exact counts substituted — all double arithmetic runs in the
    same JVM operators as the HOF path, so results are
    bit-identical and the twin shares its oracle."""
    nt = F.greatest(F.col("n_tokens"), F.lit(1))
    nc = F.greatest(F.col("n_chars"), F.lit(1))
    mean_token_len = F.col("total_tok_len") / nt
    punct_ratio_ = F.col("n_punct") / nc
    stopword_ratio_ = F.col("n_stop") / nt
    len_score = F.least(F.col("n_chars") / F.lit(200.0), F.lit(1.0))
    tok_score = F.when(
        (mean_token_len >= 2) & (mean_token_len <= 12), F.lit(1.0)
    ).otherwise(F.lit(0.3))
    punct_score = F.lit(1.0) - F.least(punct_ratio_ * 5, F.lit(1.0))
    stop_score = F.least(stopword_ratio_ * 4, F.lit(1.0))
    quality = F.round(
        0.3 * len_score
        + 0.3 * tok_score
        + 0.2 * punct_score
        + 0.2 * stop_score,
        6,
    )
    return {
        "mean_token_len": mean_token_len,
        "punct_ratio": punct_ratio_,
        "stopword_ratio": stopword_ratio_,
        "quality": quality,
    }


def tokens_stream_arrow(df, text_col: str, out_col: str = "tok"):
    """Arrow twin of ``explode(tokens(text))``: the raw token-STRING
    stream as a single column, for instance-grain consumers (the
    Misra-Gries heavy-hitter sweep) where the HOF tokenize+explode
    is the measured cost (42 s at sf10's 30M tokens). RE2 split +
    C-side flatten/filter — identical token strings to the Catalyst
    tokenizer (Java-`\\s` ASCII class, empties dropped)."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [T.StructField(out_col, T.StringType(), True)]
    )

    def kernel(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        ws_pat = "[ \t\n\x0b\x0c\r]+"  # Java \s, ASCII-only
        for b in batches:
            txt = b.column(0)
            if txt.null_count:
                txt = pc.fill_null(txt, "")
            flat = pc.list_flatten(
                pc.split_pattern_regex(pc.utf8_trim(txt, " "), ws_pat)
            )
            flat = flat.filter(pc.not_equal(flat, ""))
            yield pa.record_batch([flat], names=[out_col])

    from etl_covid19_spark.operators.parallelism import fan_out

    return fan_out(df.select(text_col)).mapInArrow(kernel, out_schema)


def token_positions_arrow(df, text_col: str, id_col: str):
    """(_doc, pos, token): Arrow twin of
    ``select(id, posexplode(tokens(text)))`` — the builder of the
    pooled positions frame every order-sensitive token consumer
    shares (bigram LM, phrase search, PMI, vocab ranks). Identical
    rows: token strings from the same RE2 split, positions assigned
    AFTER empty tokens drop (posexplode indexes the filtered
    array). The HOF posexplode was ~15-25 s of every cold
    pool build at sf10's 30M tokens."""
    from pyspark.sql import types as T

    from etl_covid19_spark.operators.parallelism import fan_out

    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField("_doc", id_field.dataType, True),
            T.StructField("pos", T.IntegerType(), True),
            T.StructField("token", T.StringType(), True),
        ]
    )

    def kernel(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        ws_pat = "[ \t\n\x0b\x0c\r]+"  # Java \s, ASCII-only
        for b in batches:
            ids_arr = b.column(0)
            txt = b.column(1)
            if txt.null_count:
                txt = pc.fill_null(txt, "")
            toks = pc.split_pattern_regex(pc.utf8_trim(txt, " "), ws_pat)
            flat = pc.list_flatten(toks)
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            parents = pc.list_parent_indices(toks).to_numpy(
                zero_copy_only=False
            )
            lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
            keep = np.nan_to_num(lens).astype(np.int64) > 0
            flat = flat.filter(pa.array(keep))
            parents = parents[keep]
            if not len(parents):
                continue
            run_starts = np.flatnonzero(
                np.r_[True, parents[1:] != parents[:-1]]
            )
            run_len = np.diff(np.r_[run_starts, len(parents)])
            pos = np.arange(len(parents)) - np.repeat(
                run_starts, run_len
            )
            yield pa.record_batch(
                [
                    ids_arr.take(pa.array(parents, pa.int64())),
                    pa.array(pos.astype(np.int32), pa.int32()),
                    flat,
                ],
                names=["_doc", "pos", "token"],
            )

    return fan_out(df.select(id_col, text_col)).mapInArrow(
        kernel, out_schema
    )


def gopher_from_counts() -> dict[str, Column]:
    """Spark-side finisher over `quality_counts_arrow(...,
    with_gopher=True)` output: the `curation.gopher_metrics`
    formulas expression-for-expression with the exact counts
    substituted (n_ellipsis·3/3 reproduces the replace-length
    arithmetic bit-for-bit — 3k/3 is exact in IEEE), so the twin
    shares the HOF oracle."""
    n = F.col("n_tokens")
    nsafe = F.greatest(n, F.lit(1))
    mean_wl = F.col("total_tok_len") / nsafe
    n_ell = (F.lit(3) * F.col("n_ellipsis")) / 3
    symbol_ratio = (F.col("n_hash") + n_ell) / nsafe
    alpha_frac = F.col("n_alpha_tok") / nsafe
    n_stop = F.col("n_gstop")
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


def predicted_lang_from_counts() -> Column:
    """Language argmax over the `s_<lang>` marker-count columns
    emitted by `quality_counts_arrow(..., with_lang=True)` — the
    same deterministic priority order (en>es>fr>de>zh on ties) as
    the HOF `lang_scores` consumers, on identical integers."""
    s = {lc: F.col(f"s_{lc}") for lc in LANG_MARKERS}
    return (
        F.when(s["en"] >= F.greatest(s["es"], s["fr"], s["de"], s["zh"]), "en")
        .when(s["es"] >= F.greatest(s["fr"], s["de"], s["zh"]), "es")
        .when(s["fr"] >= F.greatest(s["de"], s["zh"]), "fr")
        .when(s["de"] >= s["zh"], "de")
        .otherwise("zh")
    )


def word_shingle_pairs_arrow(df, key_col: str, text_col: str, n: int = 3):
    """Arrow-kernel twin of ``explode(word_shingles(text, n))`` with
    per-row distinct: emits (key, shingle) STRING pairs — for the
    human-auditable consumers (boilerplate doc-frequency lists,
    source-overlap matrices) where hashed postings won't do. The
    round-4 sweep put the HOF form (per-token transform + slice +
    concat_ws + array_distinct, all CodegenFallback) at 85-90 s for
    sf1; the kernel builds the same gram strings with C-side slices
    and one `binary_join_element_wise`, and dedups per row with a
    hash drop_duplicates.

    Semantics parity with `word_shingles`: whitespace tokens minus
    empty split artifacts; docs with ≥ n tokens yield all n-token
    windows joined by ' '; shorter docs (incl. empty → '') yield the
    whole token stream as ONE shingle; NULL text behaves as empty
    (matching the Catalyst when/otherwise fallthrough). Each input
    row is wholly inside one batch, so per-row distinct is exact."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            df.schema[key_col],
            T.StructField("sh", T.StringType(), True),
        ]
    )
    proj = fan_out(df.select(key_col, text_col))

    def kernel(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        ws_pat = "[ \t\n\x0b\x0c\r]+"
        for b in batches:
            keys = b.column(0)
            n_docs = len(keys)
            txt = b.column(1)
            if txt.null_count:
                txt = pc.fill_null(txt, "")
            toks = pc.split_pattern_regex(txt, ws_pat)
            flat = pc.list_flatten(toks)
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            parents = pc.list_parent_indices(toks).to_numpy(
                zero_copy_only=False
            )
            nonempty = pc.utf8_length(flat).to_numpy(
                zero_copy_only=False
            ) > 0
            flat_f = flat.filter(pa.array(nonempty))
            parents = parents[nonempty]
            L = len(flat_f)
            tok_counts = np.bincount(parents, minlength=n_docs)
            doc_rows: list[np.ndarray] = []
            gram_chunks: list = []
            if L >= n:
                cols = [flat_f.slice(j, L - (n - 1)) for j in range(n)]
                grams = pc.binary_join_element_wise(*cols, " ")
                gvalid = parents[n - 1 :] == parents[: L - (n - 1)]
                grams = grams.filter(pa.array(gvalid))
                doc_rows.append(parents[: L - (n - 1)][gvalid])
                gram_chunks.append(grams)
            short = np.flatnonzero(tok_counts < n)
            if len(short):
                toks_py = None
                svals, srows = [], []
                for d in short:
                    if toks_py is None:
                        toks_py = flat_f.to_pylist()
                    mine = [
                        toks_py[i]
                        for i in np.flatnonzero(parents == d)
                    ]
                    svals.append(" ".join(mine))
                    srows.append(d)
                gram_chunks.append(pa.array(svals, pa.string()))
                doc_rows.append(np.asarray(srows, dtype=np.int64))
            if not gram_chunks:
                continue
            rows = np.concatenate(doc_rows)
            gram_arr = pa.concat_arrays(
                [g.combine_chunks() if isinstance(g, pa.ChunkedArray)
                 else g for g in gram_chunks]
            )
            pdf = pd.DataFrame(
                {
                    "_row": rows,
                    "sh": gram_arr.to_pandas(),
                }
            ).drop_duplicates()
            out_keys = keys.take(
                pa.array(pdf["_row"].to_numpy(), pa.int64())
            )
            yield pa.record_batch(
                [out_keys, pa.Array.from_pandas(pdf["sh"], type=pa.string())],
                names=[key_col, "sh"],
            )

    return proj.mapInArrow(kernel, out_schema)


def compressibility_arrow(df, keep_cols: list[str], text_col: str):
    """Per-document zlib compressibility — the cheap entropy proxy
    the RefinedWeb/Gopher filter family uses: word salad and
    templated boilerplate compress far better than natural prose,
    so an extreme ratio in either direction is a removal signal.

    Arrow `mapInArrow` kernel (zlib is not expressible in Catalyst
    or DuckDB SQL → the query is rows-only, pinned by a pure-Python
    differential instead). The kernel emits EXACT INTEGERS
    (utf-8 byte length, level-6 deflate byte length); the ratio is
    computed Spark-side. zlib level 6 output is deterministic for a
    given input on any zlib build in RFC-1951 compliant mode —
    and the differential test recomputes it byte-for-byte."""
    from pyspark.sql import types as T

    fields = [df.schema[c] for c in keep_cols] + [
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("n_deflate", T.LongType(), True),
    ]
    out_schema = T.StructType(fields)
    proj = fan_out(df.select(*keep_cols, text_col))
    n_keep = len(keep_cols)

    def kernel(batches):
        import zlib

        import pyarrow as pa

        for b in batches:
            txt = b.column(n_keep)
            n_bytes, n_defl = [], []
            for v in txt:
                s = (v.as_py() or "").encode("utf-8")
                n_bytes.append(len(s))
                n_defl.append(len(zlib.compress(s, 6)))
            yield pa.record_batch(
                [b.column(i) for i in range(n_keep)]
                + [
                    pa.array(n_bytes, pa.int64()),
                    pa.array(n_defl, pa.int64()),
                ],
                names=list(keep_cols) + ["n_bytes", "n_deflate"],
            )

    return proj.mapInArrow(kernel, out_schema)
