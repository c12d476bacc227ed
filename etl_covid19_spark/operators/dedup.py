"""Deduplication operator family for training-data pipelines.

Extension surface beyond the reference (SURVEY.md §7.2 step 9):
exact, n-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine
near-dup — each expressed as compositions of built-in DataFrame ops
(explode / groupBy / join / higher-order array functions), no Python
UDFs, so they scale as ordinary shuffles.

Scale notes per operator are on the functions; the common theme:
work is proportional to candidate pairs, never to |docs|² — LSH
banding (minhash) and shingle-postings joins (jaccard) both turn the
quadratic all-pairs problem into a grouped equi-join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_covid19_spark.functions import text, vectors

# Deterministic, engine-agnostic shingle hash (also computable in
# plain SQL — see the oracle for minhash_lsh_pairs): polynomial over
# the shingle's characters, mod a 31-bit prime.
_P = 2_147_483_647  # 2^31 - 1


def _shingle_hash(sh):
    codes = F.transform(F.split(sh, ""), lambda ch: F.ascii(ch).cast("bigint"))
    return F.aggregate(
        codes, F.lit(0).cast("bigint"), lambda acc, c: (acc * 131 + c) % _P
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup via hash-groupBy: one row per distinct text with
    the smallest id as canonical. Shuffles one (hash, length, id)
    triple per row — at 100 TB, grouping on xxhash64(text) keeps the
    shuffle at fixed-width keys instead of document bodies. The text
    length rides along as a second group key: a 64-bit hash collision
    between equal-length documents is still possible (birthday bound
    ≈ n²/2⁶⁵ — about 1 in 2000 at 10¹⁰ docs) but adding the length
    removes the dominant practical collision surface for free; a
    full-verification pass over colliding groups is the belt-and-
    braces option when a merge is destructive."""
    h = F.xxhash64(F.col(text_col)).alias("content_hash")
    ln = F.length(F.col(text_col)).alias("content_len")
    return (
        df.select(h, ln, F.col(id_col))
        .groupBy("content_hash", "content_len")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def incremental_exact_dedup(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str,
    id_col: str,
    hashed: bool = True,
) -> DataFrame:
    """Cross-snapshot exact dedup: drop documents of ``new_df`` whose
    content already exists anywhere in ``corpus_df`` (the previously
    ingested corpus), then exact-dedup the survivors within the batch.
    This is the daily-ingest shape at 100 TB — the historical corpus
    must NOT be re-deduped, only probed.

    Scale design: the corpus collapses to DISTINCT fixed-width keys
    (xxhash64 + length, 12 bytes/doc) before the anti-join, so the
    big side never ships document bodies; the anti-join is exactly
    the shape Spark's runtime bloom-filter injection accelerates
    (`spark.sql.optimizer.runtime.bloomFilter.enabled`, pinned in
    tests/test_runtime_pruning.py) — the "bloom prefilter then exact
    verify" pattern falls out of the optimizer rather than hand-built
    sketch code. With the corpus key set stored sorted/bucketed by
    hash, successive daily batches probe it shuffle-free.

    ``hashed=False`` joins on the raw text (engine-portable, what the
    SQL oracle mirrors); equivalence is test-pinned like
    `strip_duplicate_spans`.

    Returns (canonical_id, n_copies): one row per surviving distinct
    batch document.
    """
    if hashed:
        keys = lambda d: [  # noqa: E731
            F.xxhash64(F.col(text_col)).alias("content_hash"),
            F.length(F.col(text_col)).alias("content_len"),
        ]
        keynames = ["content_hash", "content_len"]
    else:
        keys = lambda d: [F.col(text_col).alias("content_key")]  # noqa: E731
        keynames = ["content_key"]
    seen = corpus_df.select(*keys(corpus_df)).distinct()
    survivors = new_df.select(*keys(new_df), F.col(id_col)).join(
        seen, keynames, "left_anti"
    )
    return (
        survivors.groupBy(*keynames)
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("canonical_id", "n_copies")
    )


def shingle_sets(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """(id, shingles array, set size) — shared prep for the Jaccard
    and MinHash paths."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        text.word_shingles(text_col, n).alias("shingles"),
    ).withColumn("n_shingles", F.size("shingles"))


def shingle_postings(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """(doc_id, n_shingles, sh) — one row per *distinct* shingle,
    hashed to a 31-bit long. Hashed postings make every downstream
    join/groupBy shuffle 8-byte keys instead of shingle strings;
    collisions (~2⁻³¹ per pair) are negligible for dedup purposes.

    The shingle hash is built directly from per-token hashes with
    zip_with over shifted slices — the n-gram *strings* are never
    materialized (a concat-per-shingle formulation allocates ~|doc|
    strings per document and dominated the profile)."""
    toks = text.tokens(text_col)
    th = F.transform(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(_P)))
    size = F.size(th)
    # rolling combine of n consecutive token hashes:
    # gram[i] = ((th[i]·131 + th[i+1])·131 + th[i+2]) % P
    grams = F.slice(th, 1, F.greatest(size - (n - 1), F.lit(0)))
    for j in range(1, n):
        nxt = F.slice(th, 1 + j, F.greatest(size - (n - 1), F.lit(0)))
        grams = F.zip_with(grams, nxt, lambda a, b: (a * 131 + b) % _P)
    # a doc shorter than n tokens contributes its whole token stream
    # as one shingle (same rule as word_shingles / the SQL oracle)
    whole = F.aggregate(
        th, F.lit(0).cast("bigint"), lambda acc, h: (acc * 131 + h) % _P
    )
    shingles = F.array_distinct(
        F.when(size >= n, grams).otherwise(F.array(whole))
    )
    sets_df = df.select(
        F.col(id_col).alias("doc_id"), shingles.alias("shingles")
    ).withColumn("n_shingles", F.size("shingles"))
    return sets_df.select(
        "doc_id", "n_shingles", F.explode("shingles").alias("sh")
    )


# the bounded LRU pool of persisted frames is shared engine-wide
# (dedup postings, BM25 postings, bucketed time-series aggregates
# all follow the same persist/evict/invalidate discipline) — see
# operators/df_cache for the lifecycle rules
from etl_covid19_spark.operators.df_cache import SHARED_CACHE as _DF_CACHE
from etl_covid19_spark.operators.df_cache import corpus_key as _corpus_key
from etl_covid19_spark.operators.parallelism import fan_out


def clear_dedup_caches() -> None:
    """Unpersist every cached postings/candidate frame. Call after
    rewriting a corpus parquet in place within the same session."""
    _DF_CACHE.clear()


# Default postings backend: the vectorized Arrow kernel
# (`shingle_postings_arrow`). "catalyst" keeps the engine-pure HOF
# path — the parity cross-check and the fallback if Arrow transfer
# is ever unavailable. Hash VALUES differ between backends (byte
# polynomial vs xxhash64) but no consumer or oracle observes them;
# pair-set parity is pinned in tests/test_dedup_similarity.py.
SHINGLE_BACKEND = "arrow"


def shingle_postings_cached(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    backend: str | None = None,
) -> DataFrame:
    backend = backend or SHINGLE_BACKEND
    key = ("postings", _corpus_key(df), text_col, id_col, n, backend)
    build = (
        shingle_postings_arrow if backend == "arrow" else shingle_postings
    )
    return _DF_CACHE.get_or_build(
        key, lambda: build(df, text_col, id_col, n)
    )


def minhash_signatures_cached(
    df: DataFrame,
    posts: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    num_hashes: int,
    backend: str | None = None,
) -> DataFrame:
    """Pooled MinHash signatures. Arrow backend: straight from the
    gram kernel (no postings aggregate — `minhash_signatures_arrow`
    docstring has the measurement). Catalyst backend: the wide
    min-aggregate over the given postings frame. Both produce the
    same values for the same gram hashes (reduceat-vs-agg parity is
    test-pinned)."""
    backend = backend or SHINGLE_BACKEND
    key = (
        "minhash_sigs",
        _corpus_key(df),
        text_col,
        id_col,
        n,
        num_hashes,
        backend,
    )
    build = (
        (lambda: minhash_signatures_arrow(df, text_col, id_col, n, num_hashes))
        if backend == "arrow"
        else (lambda: _signatures_from_postings(posts, num_hashes))
    )
    return _DF_CACHE.get_or_build(key, build)


def simhash_fps_cached(
    df: DataFrame, text_col: str, id_col: str, bits: int = 30
) -> DataFrame:
    """Pooled SimHash fingerprints (doc_id, simhash) — 16 B/doc,
    the same bounded-intermediate discipline as the postings pool.
    `simhash_clusters` references the frame from two plan branches
    (distinct-fp graph + per-doc assignment join) and `simhash_pairs`
    from both sides of a self-join; without the pool each branch
    re-ran the full fingerprint kernel over the corpus (the dominant
    per-doc cost of the sf100 entropic regime, paid 2×)."""
    key = ("simhash_fps", _corpus_key(df), text_col, id_col, bits)
    return _DF_CACHE.get_or_build(
        key, lambda: simhash_arrow(df, text_col, id_col, bits)
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, threshold: float = 0.4
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via a shingle-postings
    join: explode hashed shingles → self-equi-join on shingle →
    count common → |A∩B| / (|A|+|B|-|A∩B|). The join is a plain
    shuffle on the 8-byte shingle key; hot (stop-shingle) keys are
    the skew risk at scale — AQE skew-join handles moderate skew,
    and a doc-frequency cap on shingles is the standard mitigation
    beyond that.

    The postings are persisted across the self-join so the
    (interpreted higher-order) shingle construction runs once per
    document, not once per join side — and reused across the dedup
    family via the session memo."""
    posts = shingle_postings_cached(df, text_col, id_col, n)
    a, b = posts.alias("a"), posts.alias("b")
    common = (
        a.join(b, on="sh")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_shingles").alias("na"),
            F.col("b.n_shingles").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        common.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs_capped(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.4,
    max_df: int = 5,
) -> DataFrame:
    """Doc-frequency-capped n-gram Jaccard — the skew-hardened twin
    of `ngram_jaccard_pairs`. Shingles appearing in more than
    `max_df` documents ("stop-shingles": boilerplate, headers,
    licence text) are dropped BEFORE the postings self-join, and set
    sizes are recomputed over the capped sets, so the Jaccard is
    exact over the capped shingle universe (semantics the oracle
    mirrors shingle-for-shingle).

    Why this is the standard mitigation at scale: the self-join's
    work is Σ df(sh)² over shingles — ONE boilerplate shingle shared
    by 1M docs contributes 10¹² candidate pairs and a single hot
    shuffle key AQE can only split, not shrink. Capping bounds every
    shingle's contribution at max_df², making join volume linear in
    corpus size (≤ |postings|·max_df). The hot set itself is
    provably small (≤ |postings|/max_df entries), so it ships as a
    broadcast anti-join — no extra shuffle on the postings.

    Candidates come from the EXACT prefix filter
    (`_prefix_candidates` — zero recall loss by the prefix
    principle, so results are byte-identical to the old postings
    self-join form at every threshold) with Jaccard's two lossless
    prunes: a qualifying pair needs overlap ≥ 2t/(1+t)·na (from
    J = c/(na+nb−c) ≥ t with nb ≥ na) and size ratio nb ≤ na/t;
    verification is the pair-local `array_intersect` pass — linear
    in the candidate count, no Σ df² term anywhere (the round-10
    MinHash discipline applied to the postings-join family, which
    the sf100 entropic sweep measured at 482 s in its old shape
    because a rich vocabulary makes the df-cap drop nothing)."""
    corpus_key = _corpus_key(df)
    posts = shingle_postings_cached(df, text_col, id_col, n)
    ranked = _capped_ranked_cached(
        posts, corpus_key, text_col, id_col, n, max_df
    )
    frac = 2.0 * threshold / (1.0 + threshold)
    # Pool the candidate frame like the LSH path pools its band
    # candidates: verification references it from THREE plan branches
    # (the two id-union scans + the pair join), and without the
    # persist each branch re-executes the whole prefix join
    # (round-11: the unpooled form re-ran it 3× — a 4× bench
    # regression at sf0.1 on the dataflow whose sf100 shape win was
    # the point).
    cands = _DF_CACHE.get_or_build(
        (
            "prefix_cands", "jaccard", corpus_key, text_col, id_col,
            n, threshold, max_df, SHINGLE_BACKEND,
        ),
        lambda: _prefix_candidates(
            ranked,
            lambda pn: F.ceil(pn * F.lit(frac) - F.lit(1e-9)),
            extra_pred=(
                F.col("fn") * F.lit(threshold)
                <= F.col("pn") + F.lit(1e-6)
            ),
        ),
    )
    arrs = _capped_arrays_cached(
        ranked, corpus_key, text_col, id_col, n, max_df
    )
    return _score_pairs(
        arrs, arrs, cands, ("doc_a", "doc_b"), threshold
    )


def _minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic per-seed affine coefficients for h_i(x) =
    (a_i*x + b_i) mod p."""
    return [
        ((i * 2654435761 + 1) % _P, (i * 40503 + 17) % _P)
        for i in range(num_hashes)
    ]


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, num_hashes: int = 128
) -> DataFrame:
    """MinHash signatures, computed codegen-side: explode hashed
    shingle postings, then ONE hash aggregate with `num_hashes`
    min() columns. Declarative-only aggregates keep the whole thing
    in whole-stage codegen (adding a collect_set here would demote
    the aggregate to object-hash mode, ~3x slower)."""
    posts = shingle_postings(df, text_col, id_col, n)
    return _signatures_from_postings(posts, num_hashes)


def _signatures_from_postings(posts: DataFrame, num_hashes: int) -> DataFrame:
    """The wide aggregate is assembled as ONE SQL expression string —
    building 128 Column objects call-by-call costs seconds of py4j
    round trips on the driver, which at 1000-executor scale is pure
    serial overhead before any task runs."""
    mins = ", ".join(
        f"min(({a}L * sh + {b}L) % {_P}L)"
        for a, b in _minhash_coeffs(num_hashes)
    )
    return posts.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.expr(f"array({mins})").alias("signature"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    max_bucket: int = 4096,
) -> DataFrame:
    """MinHash + LSH near-dup pairs, exact-verified.

    Banding: 32 bands x 4 rows -> P(candidate | J=0.8) ~ 1-(1-0.8^4)^32
    ~ 1-5e-8, so recall at the threshold is effectively 1 while
    candidate generation is a grouped equi-join on (band, band-slice
    of the signature) — never |docs|².

    Shuffle discipline: the band join carries only (doc_id, band
    key); exact verification is PAIR-LOCAL (`_verify_pairs_exact`) —
    each candidate pair joins to its two per-doc shingle arrays and
    intersects in one codegen'd expression, so verification work and
    shuffle are linear in the candidate count with no Σ_sh df² term.

    `max_bucket` caps the band-bucket size before the candidate
    self-join — the standard production LSH guard (a bucket of s
    docs contributes s²/2 candidates; one degenerate band key must
    not turn the equi-join quadratic). The round-9 sf100 sweep hit
    exactly this: 5M synthetic docs over a ~30-word vocabulary
    concentrate the per-band minima into mega-buckets, and the
    uncapped candidate join spilled >70 GB before dying. Recall
    cost: a true pair is lost only if EVERY one of its 32 bands
    lands in a >max_bucket bucket, which requires an
    exact-dup-class-scale cluster (thousands of docs sharing the
    same 4 consecutive minima in every band) — a regime exact /
    normalized dedup already handles upstream. Measured bucket
    maxima: 90 at sf1 (p99.9 = 2), so 4096 is invisible at every
    oracle-checked SF.
    """
    rows = num_hashes // bands
    corpus_key = _corpus_key(df)
    posts = shingle_postings_cached(df, text_col, id_col, n)
    sigs = minhash_signatures_cached(
        df, posts, text_col, id_col, n, num_hashes
    )
    # Each band key collapses to ONE long (xxhash64 over the band id
    # and its signature slice) so the candidate join is a primitive
    # equi-join, not a struct/array-keyed one. Like the signature
    # aggregate, the 32 keys are one parsed SQL string, not 160
    # driver-built Column objects.
    band_keys = ", ".join(
        "xxhash64({}, {})".format(
            band,
            ", ".join(f"signature[{band * rows + j}]" for j in range(rows)),
        )
        for band in range(bands)
    )
    banded = sigs.selectExpr(
        "doc_id", f"explode(array({band_keys})) AS band_key"
    )
    def _build_cands() -> DataFrame:
        # Bucket cap as ONE windowed count over band_key instead of
        # the former groupBy-count + left-semi join back onto banded:
        # the semi-join form shuffled the 32x-exploded banded frame
        # TWICE (aggregate + join probe) where the window shuffles it
        # once and filters in place — identical surviving rows (same
        # per-key count, same <= predicate), and the band-key
        # partitioning feeds the candidate self-join directly.
        # A/B at sf10 (16M banded rows): 15.2 -> 6.9 s, candidate
        # set identical (guide §2.4 remove shuffles outright).
        pruned = (
            banded.withColumn(
                "_bs",
                F.count(F.lit(1)).over(
                    Window.partitionBy("band_key")
                ),
            )
            .where(F.col("_bs") <= F.lit(max_bucket))
            .select("doc_id", "band_key")
        )
        a, b = pruned.alias("a"), pruned.alias("b")
        return (
            a.join(
                b,
                on=(F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .dropDuplicates(["doc_a", "doc_b"])
        )

    # The candidate frame is used twice in this plan (id semi-filter +
    # final verification); pooling it bounds the persisted footprint
    # and unpersists on eviction instead of leaking per invocation.
    cands = _DF_CACHE.get_or_build(
        (
            "lsh_cands", corpus_key, text_col, id_col, n, num_hashes,
            bands, max_bucket,
        ),
        _build_cands,
    )
    # PAIR-LOCAL exact-Jaccard verification (round-10 fix for the
    # measured sf100 disk-killer): the previous form re-joined the
    # shingle POSTINGS of candidate docs on `sh`, which emits one
    # row per co-shingled doc pair per shared shingle — Σ_sh df²
    # over candidate postings. On low-entropy corpora (sf100's 27k
    # shingle types over 5M docs push per-shingle df to ~10⁴) that
    # join explodes REGARDLESS of banding: >70 GB of spill, disk
    # death, twice. Pair-local verification instead joins each
    # candidate PAIR to its two per-doc shingle ARRAYS and
    # intersects per row — work and shuffle are LINEAR in the
    # candidate count the band-bucket cap already bounds, with no
    # df² term anywhere. Same exact semantics: postings hold each
    # doc's distinct shingle hashes, so |array_intersect| is exactly
    # the shared-shingle count the postings join aggregated.
    # Round 11: the per-doc arrays frame is POOLED (one linear
    # regroup of the pooled postings, same size class) instead of
    # being rebuilt per invocation via ids-semi-join + collect_list,
    # so the steady-state verification plan is just
    # cands ⋈ arrays ⋈ arrays.
    arrs = _DF_CACHE.get_or_build(
        ("shingle_arrays", corpus_key, text_col, id_col, n,
         SHINGLE_BACKEND),
        lambda: posts.groupBy("doc_id", "n_shingles").agg(
            F.collect_list("sh").alias("shs")
        ),
    )
    return _score_pairs(
        arrs, arrs, cands, ("doc_a", "doc_b"), threshold
    )


def _shingle_arrays(posts: DataFrame, ids: DataFrame) -> DataFrame:
    """(doc_id, n_shingles, shs array<long>) for the docs in `ids` —
    the pair-local verification's per-doc shingle sets, rebuilt from
    the (cached) postings with one linear semi-join + groupBy. Array
    width is a document's distinct-shingle count (bounded by doc
    length), never a corpus statistic."""
    return (
        posts.join(ids, on="doc_id", how="left_semi")
        .groupBy("doc_id", "n_shingles")
        .agg(F.collect_list("sh").alias("shs"))
    )


def _verify_pairs_exact(
    posts: DataFrame,
    cands: DataFrame,
    pair_cols: tuple[str, str],
    threshold: float,
    posts_right: DataFrame | None = None,
    metric: str = "jaccard",
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs, linear in the
    candidate count: two equi-joins attach each side's shingle array
    to the pair row, `array_intersect` computes the shared-shingle
    count per row (O(|a|+|b|) hash-set probe inside codegen — the
    "join each candidate pair to its two shingle arrays" design from
    ROADMAP #2). A doc in k candidate pairs replicates its array k
    times through the join — bounded by the band-bucket cap, and
    each row is one doc's shingles, never a df² blowup.

    `posts_right` supports the incremental (corpus×delta) shape
    where the two pair columns draw from different postings frames.
    `metric` picks the score: "jaccard" = |A∩B|/|A∪B| (default) or
    "containment" = |A∩B|/min(|A|,|B|) — same pair-local dataflow,
    only the denominator and the output column name change.
    Output: (pair_cols..., <metric>) for pairs at/above threshold —
    byte-identical semantics to the postings-join form (test-pinned
    equality in tests/test_dedup_similarity.py). The `n_common >= 1`
    guard preserves that equivalence at ALL thresholds: the postings
    form could only ever emit pairs sharing at least one shingle, so
    a threshold <= 0 must not admit zero-overlap candidate pairs
    here either (ADVICE round 10 — latent, every caller uses
    >= 0.8, but the docstring's equivalence claim should hold
    unconditionally)."""
    ca, cb = pair_cols
    if posts_right is None:
        # both pair columns draw from the same postings frame: build
        # the per-doc arrays ONCE over the union of candidate ids —
        # one semi-join + collect_list pass serves both join sides
        # (round-11: halves the verification stage count vs the
        # original per-side build).
        ids = (
            cands.select(F.col(ca).alias("doc_id"))
            .union(cands.select(F.col(cb).alias("doc_id")))
            .distinct()
        )
        arr_l = arr_r = _shingle_arrays(posts, ids)
    else:
        left_ids = cands.select(F.col(ca).alias("doc_id")).distinct()
        right_ids = cands.select(F.col(cb).alias("doc_id")).distinct()
        arr_l = _shingle_arrays(posts, left_ids)
        arr_r = _shingle_arrays(posts_right, right_ids)
    return _score_pairs(arr_l, arr_r, cands, pair_cols, threshold, metric)


def _score_pairs(
    arr_l: DataFrame,
    arr_r: DataFrame,
    cands: DataFrame,
    pair_cols: tuple[str, str],
    threshold: float,
    metric: str = "jaccard",
) -> DataFrame:
    """The pair-scoring tail of `_verify_pairs_exact`: attach each
    side's (n_shingles, shs) array to the pair row by equi-join and
    score with `array_intersect` — factored out so callers that
    already hold a pooled per-doc arrays frame (the capped prefix
    twins) skip the per-invocation semi-join + collect_list build
    entirely."""
    ca, cb = pair_cols
    paired = cands.join(
        arr_l.select(
            F.col("doc_id").alias(ca),
            F.col("n_shingles").alias("na"),
            F.col("shs").alias("_sa"),
        ),
        on=ca,
    ).join(
        arr_r.select(
            F.col("doc_id").alias(cb),
            F.col("n_shingles").alias("nb"),
            F.col("shs").alias("_sb"),
        ),
        on=cb,
    )
    n_common = F.size(F.array_intersect("_sa", "_sb"))
    if metric == "containment":
        score = F.col("_nc") / F.least(F.col("na"), F.col("nb"))
    else:
        score = F.col("_nc") / (
            F.col("na") + F.col("nb") - F.col("_nc")
        )
    return (
        paired.withColumn("_nc", n_common)
        .withColumn(metric, score)
        .where((F.col("_nc") >= 1) & (F.col(metric) >= threshold))
        .select(ca, cb, metric)
    )


def _capped_ranked(posts: DataFrame, max_df: int) -> DataFrame:
    """(doc_id, sh, sdf, n_capped, rn) — the df-capped postings with
    every per-doc statistic the prefix-filter family needs, derived
    in the MINIMUM number of exchanges (round-11 optimization: the
    first prefix-filter shape recomputed the cap/sizes/order as four
    separate aggregate+join passes — 15 exchanges at sf0.1, a 4×
    bench regression on a dataflow whose sf100 win was the point).

    ONE aggregate on sh computes each shingle's doc-frequency; the
    cap keeps sh with sdf ≤ max_df (identical membership to the old
    hot-set anti-join — the anti dropped df > max_df), and because
    the aggregate and the postings⋈df join partition identically,
    the planner REUSES the Exchange(sh) — postings cross the wire
    once for df + cap + order together. ONE (doc_id) window exchange
    then derives both the capped per-doc size (count over the
    partition — the old separate groupBy+join) and the rarest-first
    rank rn (row_number over (sdf ASC, sh ASC) — deterministic:
    shingles are distinct within a doc). Downstream consumers
    (prefix slice, full side, verification arrays) all hang off this
    one frame, so their identical exchange subtrees are planned as
    ReusedExchange instead of recomputation."""
    from pyspark.sql import Window

    shdf = posts.groupBy("sh").agg(F.count(F.lit(1)).alias("sdf"))
    capped = posts.select("doc_id", "sh").join(
        shdf.where(F.col("sdf") <= max_df), "sh"
    )
    wp = Window.partitionBy("doc_id")
    wo = wp.orderBy(F.col("sdf").asc(), F.col("sh").asc())
    return capped.withColumn(
        "n_capped", F.count(F.lit(1)).over(wp)
    ).withColumn("rn", F.row_number().over(wo))


def _capped_ranked_cached(
    posts: DataFrame,
    corpus_key: tuple,
    text_col: str,
    id_col: str,
    n: int,
    max_df: int,
) -> DataFrame:
    """Pooled `_capped_ranked`: the frame is linear in the capped
    postings (same size class as the postings pool entry) and is
    referenced from the prefix side, the full side AND the
    verification-array branch of both capped twins — persisting it
    turns three full join+window recomputations into one build plus
    in-memory scans, under the pool's bounded/evict/invalidate
    rules."""
    return _DF_CACHE.get_or_build(
        (
            "capped_ranked", corpus_key, text_col, id_col, n, max_df,
            SHINGLE_BACKEND,
        ),
        lambda: _capped_ranked(posts, max_df),
    )


def _capped_arrays_cached(
    ranked: DataFrame,
    corpus_key: tuple,
    text_col: str,
    id_col: str,
    n: int,
    max_df: int,
) -> DataFrame:
    """Pooled per-doc capped shingle arrays (doc_id, n_shingles,
    shs) for the prefix twins' verification: `ranked` is already
    hash-partitioned by doc_id (the window exchange), so this
    regroup is EXCHANGE-FREE — one map-side-satisfiable aggregate,
    linear in the capped postings, built once per (corpus, cap) and
    reused by every verification join. The semi-join-per-invocation
    alternative (`_shingle_arrays`) re-runs an ids-exchange + probe
    + collect_list every call; with the arrays pooled the warm
    verification plan is just cands ⋈ arrays ⋈ arrays."""
    return _DF_CACHE.get_or_build(
        (
            "capped_arrays", corpus_key, text_col, id_col, n, max_df,
            SHINGLE_BACKEND,
        ),
        lambda: ranked.groupBy("doc_id").agg(
            F.max("n_capped").alias("n_shingles"),
            F.collect_list("sh").alias("shs"),
        ),
    )


def _prefix_candidates(
    ranked: DataFrame,
    min_overlap,
    extra_pred=None,
) -> DataFrame:
    """EXACT prefix-filter candidate pairs over a df-capped, ranked
    postings frame (`_capped_ranked`) — the Bayardo/Chaudhuri
    "Scaling Up All Pairs" prefix principle, NOT a probabilistic
    band filter: if a pair must share at least α shingles, then the
    smaller doc's first (n − α + 1) shingles under ANY fixed global
    shingle order must intersect the larger doc's full set
    (otherwise at most α − 1 shared elements remain). So joining
    each doc's PREFIX postings against the corpus's FULL postings,
    restricted to (prefix side strictly smaller, ties by lower id),
    yields a candidate superset with zero recall loss — exactness
    never depends on the order chosen; the order only controls how
    FEW candidates survive.

    Shingles are ordered by (capped doc-frequency ASC, sh ASC):
    rarest first, so prefixes carry the most selective shingles. On
    a rich (entropic) vocabulary most prefix shingles have df ≈ 1
    and the candidate join collapses to almost nothing — exactly the
    regime where the raw postings self-join did its Σ df² worst
    (sf100 entropic 482 s, the biggest number on the round-10
    board). On an adversarial low-entropy corpus the join stays
    bounded by |prefix postings|·max_df — a strict subset of the old
    |postings|·max_df.

    `min_overlap(pn)` maps the SMALLER doc's capped size to the
    minimum shared-shingle count a qualifying pair must have (a
    Column expression; callers subtract a 1e-9 slack inside their
    ceil so float boundary error can only LENGTHEN a prefix, never
    shorten it — completeness is never at the mercy of float
    rounding). `extra_pred` adds an optional pruning predicate over
    (pn, fn) pair sizes (e.g. Jaccard's nb ≤ na/t) — again only
    ever a provable consequence of the threshold, so pruning is
    lossless.

    Shuffle inventory (all linear in |capped postings|): the shared
    Exchange(sh) + Exchange(doc_id) inside `_capped_ranked` (reused
    across both join sides), then the prefix×full equi-join on sh.
    Returns DISTINCT (doc_a, doc_b) with doc_a < doc_b."""
    prefix = ranked.where(
        F.col("rn")
        <= F.col("n_capped") - min_overlap(F.col("n_capped")) + 1
    ).select(
        F.col("doc_id").alias("pid"),
        "sh",
        F.col("n_capped").alias("pn"),
    )
    full = ranked.select(
        F.col("doc_id").alias("fid"),
        "sh",
        F.col("n_capped").alias("fn"),
    )
    j = prefix.join(full, "sh").where(
        (F.col("pn") < F.col("fn"))
        | (
            (F.col("pn") == F.col("fn"))
            & (F.col("pid") < F.col("fid"))
        )
    )
    if extra_pred is not None:
        j = j.where(extra_pred)
    return j.select(
        F.least("pid", "fid").alias("doc_a"),
        F.greatest("pid", "fid").alias("doc_b"),
    ).distinct()


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 30) -> DataFrame:
    """SimHash fingerprints: sign-aggregate of per-token hash bits.
    Token hash is the engine-agnostic 31-bit polynomial, so 30
    fingerprint bits carry signal. One aggregate pass accumulates all
    per-bit votes via zip_with; a final fold packs signs to bigint."""
    toks = text.tokens(text_col)
    th = F.transform(toks, _shingle_hash)
    masks = F.array(*[F.lit(1 << j).cast("bigint") for j in range(bits)])
    votes = F.aggregate(
        th,
        F.array_repeat(F.lit(0).cast("bigint"), bits),
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda v, m: v
            + F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    fp = F.aggregate(
        F.zip_with(
            votes,
            masks,
            lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return df.select(F.col(id_col).alias("doc_id"), fp.alias("simhash"))


def simhash_arrow(
    df: DataFrame, text_col: str, id_col: str, bits: int = 30
) -> DataFrame:
    """Arrow-kernel twin of `simhash` — the registry sweep measured
    the HOF vote chain (per-token char-Horner transform + a 30-lane
    zip_with fold, all CodegenFallback) at 73 s for sf1's 5k docs;
    this kernel vectorizes the identical arithmetic in numpy
    (token-hash bit matrix → per-doc vote sums → sign pack) in ~2 s.

    VALUE-exact with the Catalyst path (unlike the gram kernel,
    where only hash equality matters, simhash bits feed the oracle):
    the token hash is the same per-CHARACTER `ascii()` Horner mod
    2³¹−1 — bytes are used for the vectorized fast path and any
    token containing a non-ASCII byte is recomputed per-codepoint
    exactly (fixture corpora are ASCII; the fallback keeps unicode
    parity). NULL text yields a NULL fingerprint, matching the
    Catalyst aggregate-over-NULL-array semantics, so null docs drop
    out of downstream banding instead of pairing with empty docs.
    Parity incl. NULL/unicode rows is pinned by
    tests/test_dedup_similarity.py::
    test_simhash_arrow_value_parity_null_unicode."""
    import numpy as np

    from pyspark.sql import types as T

    from etl_covid19_spark.operators.parallelism import fan_out

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("simhash", T.LongType(), True),
        ]
    )
    proj = fan_out(
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(text_col).alias("_t"),
        )
    )
    P = np.int64(_P)

    def kernel(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        ws_pat = "[ \t\n\x0b\x0c\r]+"
        for b in batches:
            ids = b.column(0).to_numpy(zero_copy_only=False)
            n_docs = len(ids)
            txt = b.column(1)
            # NULL text → NULL fingerprint, matching the Catalyst
            # expression (aggregate over a NULL token array is NULL,
            # so the doc drops out of downstream banding). Without
            # the mask, fill_null("") would fingerprint null docs as
            # 0 and pair them with genuinely empty docs.
            null_mask = np.zeros(n_docs, dtype=bool)
            if txt.null_count:
                null_mask = pc.is_null(txt).to_numpy(
                    zero_copy_only=False
                )
                txt = pc.fill_null(txt, "")
            toks = pc.split_pattern_regex(txt, ws_pat)
            flat = pc.list_flatten(toks)
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            parents = pc.list_parent_indices(toks).to_numpy(
                zero_copy_only=False
            )
            offs = np.frombuffer(flat.buffers()[1], dtype=np.int32)
            offs = offs[flat.offset : flat.offset + len(flat) + 1].astype(
                np.int64
            )
            data = np.frombuffer(flat.buffers()[2], dtype=np.uint8)
            starts, ends = offs[:-1], offs[1:]
            lens = ends - starts
            keep = lens > 0
            starts, lens, parents = starts[keep], lens[keep], parents[keep]
            h = np.zeros(len(starts), dtype=np.int64)
            nonascii = np.zeros(len(starts), dtype=bool)
            maxlen = int(lens.max()) if len(lens) else 0
            for j in range(maxlen):
                mask = j < lens
                idx = starts[mask] + j
                byte = data[idx]
                nonascii[mask] |= byte >= 128
                h[mask] = (h[mask] * 131 + byte) % P
            # char-exact recompute for the (rare) non-ASCII tokens:
            # ascii() hashes CODEPOINTS, the fast path hashed bytes
            for t_i in np.flatnonzero(nonascii):
                tok = bytes(
                    data[starts[t_i] : starts[t_i] + lens[t_i]]
                ).decode("utf-8", errors="replace")
                acc = 0
                for ch in tok:
                    acc = (acc * 131 + ord(ch)) % int(P)
                h[t_i] = acc
            # Per-bit vote sums via reduceat over the (sorted) parent
            # runs: votes_j = Σ(2b−1) = 2·Σb − n_tokens, bit set iff
            # votes_j > 0 — integer-identical to the former
            # (tokens × bits) sign matrix + np.add.at scatter, which
            # was the kernel's measured hot spot (np.add.at is an
            # unbuffered per-element scatter: 21 s vs 1.1 s for the
            # reduceat form on an 8M-token batch — the dominant term
            # of the sf100 entropic simhash regime).
            fp = np.zeros(n_docs, dtype=np.int64)
            if len(h):
                run_start = np.r_[True, parents[1:] != parents[:-1]]
                starts_idx = np.flatnonzero(run_start)
                doc_idx = parents[starts_idx]
                cnt = np.diff(np.r_[starts_idx, len(parents)])
                for j in range(bits):
                    s = np.add.reduceat((h >> j) & 1, starts_idx)
                    fp[doc_idx] |= (
                        (2 * s - cnt) > 0
                    ).astype(np.int64) << j
            fp_arr = (
                pa.array(fp, pa.int64(), mask=null_mask)
                if null_mask.any()
                else pa.array(fp, pa.int64())
            )
            yield pa.record_batch(
                [pa.array(ids, pa.int64()), fp_arr],
                names=["doc_id", "simhash"],
            )

    return proj.mapInArrow(kernel, out_schema)


def simhash_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 8
) -> DataFrame:
    """SimHash near-dup pairs, blocked on 15-bit fingerprint halves:
    a pair within hamming distance <= 1 must agree exactly on one
    half (pigeonhole; heuristic recall for larger distances), so
    candidates come from grouped equi-joins, not an all-pairs scan."""
    fps = simhash_fps_cached(df, text_col, id_col)
    chunks = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.shiftright(F.col("simhash"), c * 15)
                    .bitwiseAND(F.lit(0x7FFF))
                    .alias("key"),
                )
                for c in range(2)
            ]
        )
    )
    blocked = fps.select("doc_id", "simhash", chunks.alias("ck"))
    a, b = blocked.alias("a"), blocked.alias("b")
    cands = (
        a.join(
            b,
            on=(F.col("a.ck") == F.col("b.ck"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("h_a"),
            F.col("b.simhash").alias("h_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cands.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def _bucket_min_labels(v, max_hamming: int, dense_limit: int = 8192):
    """Min-label propagation over one simhash bucket's hamming graph
    (edge iff popcount(xor) ≤ max_hamming), returning each
    fingerprint's in-bucket connected-component minimum.

    Two memory regimes, identical labels (test-pinned): buckets up
    to `dense_limit` materialize the adjacency once (≤ 64 MB bool)
    and amortize the popcount across propagation rounds; a skewed
    bucket beyond it (m in the 10⁵ range at larger corpora would be
    tens of GB dense) propagates straight from row-chunked hamming
    each round — memory stays at step×m×8 however skewed the bucket,
    cost is rounds×popcount with rounds = O(component diameter)."""
    import numpy as np

    big = np.int64(2**62)
    m = len(v)
    labels = v.copy()
    step = max(1, (1 << 22) // max(m, 1))
    # Vectorized SWAR popcount instead of the former per-byte table
    # gather (pop[x.view(uint8)].sum): the random-access gather was
    # 27× slower per bucket (567 ms vs 21 ms on a 1932² bucket) and
    # the m² hamming matrix is this kernel's entire cost on skewed
    # buckets. 32-bit lanes when the fingerprints fit (they do for
    # simhash's 30 bits — half the bytes per element), 64-bit SWAR
    # otherwise; both value-identical to the table form.
    use32 = m > 0 and int(v.min()) >= 0 and int(v.max()) < (1 << 31)

    def ham_rows(c0, c1):
        if use32:
            x = np.bitwise_xor(
                v[c0:c1, None], v[None, :]
            ).astype(np.int32)
            x = x - ((x >> 1) & 0x55555555)
            x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
            x = (x + (x >> 4)) & 0x0F0F0F0F
            return (x * 0x01010101) >> 24
        x = np.bitwise_xor(v[c0:c1, None], v[None, :])
        x = x - ((x >> 1) & 0x5555555555555555)
        x = (x & 0x3333333333333333) + (
            (x >> 2) & 0x3333333333333333
        )
        x = (x + (x >> 4)) & 0x0F0F0F0F0F0F0F0F
        return (x * 0x0101010101010101) >> 56

    if m <= dense_limit:
        adj = np.empty((m, m), dtype=bool)
        for c0 in range(0, m, step):
            c1 = min(m, c0 + step)
            adj[c0:c1] = ham_rows(c0, c1) <= max_hamming
        while True:
            cand = np.where(adj, labels[None, :], big).min(axis=1)
            new = np.minimum(labels, cand)
            if (new == labels).all():
                break
            labels = new
    else:
        while True:
            new = labels.copy()
            for c0 in range(0, m, step):
                c1 = min(m, c0 + step)
                cand = np.where(
                    ham_rows(c0, c1) <= max_hamming,
                    labels[None, :],
                    big,
                ).min(axis=1)
                new[c0:c1] = np.minimum(new[c0:c1], cand)
            if (new == labels).all():
                break
            labels = new
    return labels


def simhash_clusters(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 8
) -> DataFrame:
    """Cluster-assignment form of SimHash dedup — the 100 TB shape.

    `simhash_pairs` emits EVERY near-dup pair, and measured at sf1
    that output is itself quadratic in duplicate-heavy corpora (50k
    word-salad docs → 23.4M pairs, 115 s warm): no plan can shrink an
    output whose SIZE is the problem. What a dedup pipeline actually
    consumes is the cluster assignment, which is linear in |docs|:

    1. collapse identical fingerprints (docs sharing a simhash are
       trivially one cluster seed) — the candidate graph then lives
       on DISTINCT fingerprints (27k vs 50k at sf1, and the gap
       widens with duplication);
    2. block distinct fps on 15-bit halves, hamming-verify ≤
       `max_hamming` → fp-level edges (Σ per-block distinct² ≪
       Σ per-block docs²);
    3. components over the fp stitch graph — the bounded union-find
       Arrow kernel (`_components_arrow`), falling back to the
       iterative `connected_components` past `_UF_MAX_EDGES`;
    4. one linear join assigns every doc its component, and the
       cluster id is canonicalized to the component's MIN doc id.

    Returns (doc_id, cluster_id); singleton docs carry their own id.
    Same transitive semantics as pairs→components (edges depend only
    on fingerprints), minus the quadratic pair materialization."""
    fps = simhash_fps_cached(df, text_col, id_col)
    distinct = fps.select("simhash").distinct()
    blocked = distinct.select(
        "simhash",
        F.explode(
            F.array(
                *[
                    (
                        F.lit(c).cast("long") * (1 << 15)
                        + F.shiftright(F.col("simhash"), c * 15)
                        .bitwiseAND(F.lit(0x7FFF))
                        .cast("long")
                    )
                    for c in range(2)
                ]
            )
        ).alias("bk"),
    )
    # Bucket-LOCAL clustering kernel instead of the pair equi-join:
    # the hamming ball at max_hamming=8 makes near-salad fingerprint
    # graphs DENSE (sf1: 3.1M qualifying pairs over 27k distinct
    # fps), and min-label propagation over that edge list was the
    # measured 15 s of this operator. Within one 15-bit-half bucket
    # (≤ ~700 fps) the full hamming matrix is a trivial numpy
    # popcount, so the kernel clusters each bucket locally and
    # emits a spanning STAR (fp → bucket-local component min) —
    # connectivity-preserving by construction (a local star spans
    # exactly the in-bucket qualifying pairs; the global graph is
    # the union over buckets), so the components — and the SQL
    # oracle — are unchanged while the iterative step runs on
    # ≤ |fps| edges instead of millions. Executed as ONE mapInArrow
    # over bk-hash-partitioned rows (buckets grouped via sorted
    # boundaries in numpy) — a first cut with per-bucket
    # applyInPandas spent 9 s on 32k tiny pandas groups.
    import numpy as np

    from pyspark.sql import types as T

    def star_kernel(batches):
        import pyarrow as pa

        tabs = list(batches)
        if not tabs:
            return
        tbl = pa.Table.from_batches(tabs)
        if tbl.num_rows == 0:
            return
        v_all = tbl["simhash"].to_numpy(zero_copy_only=False)
        bk = tbl["bk"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v_all, bk))
        v_all, bk = v_all[order], bk[order]
        starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        ends = np.r_[starts[1:], len(bk)]
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            v = v_all[s:e]  # sorted ascending within the bucket
            labels = _bucket_min_labels(v, max_hamming)
            keep = labels != v
            if keep.any():
                out_a.append(labels[keep])
                out_b.append(v[keep])
        if out_a:
            yield pa.record_batch(
                [
                    pa.array(np.concatenate(out_a), pa.int64()),
                    pa.array(np.concatenate(out_b), pa.int64()),
                ],
                names=["doc_a", "doc_b"],
            )

    # EXPLICIT partition count: the bucket rows are tiny (16 B/row —
    # a few MB at bench SFs) but the kernel behind them does Σ m²
    # pairwise hammings (78M at sf10), so AQE's byte-based coalescing
    # collapsed `repartition("bk")` to 1-2 tasks and serialized the
    # whole stage on one core. A user-specified count is exempt from
    # AQE coalescing; sized from the session's parallelism (cluster-
    # adaptive, not a local constant). Hash over ~2·32k bucket keys
    # spreads skew as well as any bucket-preserving layout can — a
    # single bucket is indivisible by design (bucket-local kernel).
    sc = df.sparkSession.sparkContext
    n_tasks = max(
        sc.defaultParallelism,
        int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")),
    )
    fp_edges = (
        blocked.repartition(n_tasks, "bk")
        .mapInArrow(
            star_kernel,
            T.StructType(
                [
                    T.StructField("doc_a", T.LongType(), False),
                    T.StructField("doc_b", T.LongType(), False),
                ]
            ),
        )
        # NO hamming filter here: a star edge (local-min → member)
        # spans a transitive in-bucket path, so its own hamming may
        # exceed max_hamming — the pairwise threshold was already
        # applied inside the kernel's adjacency matrix.
        # (The former dropDuplicates exchange is gone: the union-find
        # kernel ignores parallel edges and the iterative fallback
        # distincts internally — it only ever re-deduplicated.)
    )
    # Size-routed components over the stitch graph (a near-dup
    # artifact, ≤ 2·|distinct fps|): single-task union-find kernel
    # inside _UF_MAX_EDGES, distributed iterative propagation beyond.
    comp = components_auto(fp_edges)
    # comp: (doc_id=fp, cluster_id=fp-label)
    fp_comp = fps.join(
        comp.withColumnRenamed("doc_id", "simhash").withColumnRenamed(
            "cluster_id", "_fp_label"
        ),
        "simhash",
        "left",
    ).select(
        "doc_id",
        F.coalesce(F.col("_fp_label"), F.col("simhash")).alias("_fp_label"),
    )
    rep = fp_comp.groupBy("_fp_label").agg(
        F.min("doc_id").alias("cluster_id")
    )
    return fp_comp.join(rep, "_fp_label").select("doc_id", "cluster_id")


def _components_arrow(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b"
) -> DataFrame:
    """Union-find-style connected components over a BOUNDED edge
    list in ONE single-partition Arrow kernel → (doc_id, cluster_id
    = component min), label-identical to `connected_components`
    (test-pinned on random graphs incl. chains deeper than the
    iterative `max_iter`).

    This is the round-11-verdict "union-find on band components"
    successor for the simhash stitch graph: the iterative driver
    loop re-shuffles the edge list ~6 exchanges per round for
    O(log diameter) rounds plus a count action each round; here the
    edges flow through ONE exchange into one task that runs
    vectorized min-label propagation with pointer doubling in numpy
    (per round: one E-gather + one reduceat, labels then collapsed
    by `lab = lab[lab]` to a fixpoint — O((E+N)·log d) total, ~1 s
    per 10M edges). The caller guards on edge COUNT and falls back
    to the iterative form beyond `_UF_MAX_EDGES`: a single task is
    the right tool exactly while the stitch graph is a bounded
    near-dup artifact (edges ≤ 2·|distinct fps| and in practice ≪),
    not a corpus-sized frame."""
    import numpy as np

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("cluster_id", T.LongType(), False),
        ]
    )

    def uf_kernel(batches):
        import pyarrow as pa

        tabs = list(batches)
        if not tabs:
            return
        tbl = pa.Table.from_batches(tabs)
        if tbl.num_rows == 0:
            return
        ea = tbl[a_col].to_numpy(zero_copy_only=False)
        eb = tbl[b_col].to_numpy(zero_copy_only=False)
        nodes, inv = np.unique(
            np.concatenate([ea, eb]), return_inverse=True
        )
        ia, ib = inv[: len(ea)], inv[len(ea) :]
        n = len(nodes)
        # symmetric adjacency, grouped once: neighbor-min per round
        # is a gather + reduceat over these fixed run boundaries
        ends = np.concatenate([ia, ib])
        nbrs = np.concatenate([ib, ia])
        order = np.argsort(ends, kind="stable")
        ends_s = ends[order]
        nbrs_s = nbrs[order]
        run_start = np.r_[True, ends_s[1:] != ends_s[:-1]]
        starts_idx = np.flatnonzero(run_start)
        # every node IS an edge endpoint (nodes came from the edge
        # list), so the reduceat runs cover exactly nodes 0..n-1
        lab = np.arange(n, dtype=np.int64)
        while True:
            nmin = np.minimum.reduceat(lab[nbrs_s], starts_idx)
            new = np.minimum(lab, nmin)
            changed = not np.array_equal(new, lab)
            lab = new
            while True:  # pointer doubling to the current fixpoint
                nxt = lab[lab]
                if np.array_equal(nxt, lab):
                    break
                lab = nxt
            if not changed:
                break
        yield pa.record_batch(
            [
                pa.array(nodes, pa.int64()),
                pa.array(nodes[lab], pa.int64()),
            ],
            names=["doc_id", "cluster_id"],
        )

    return (
        pairs.select(
            F.col(a_col).cast("long").alias(a_col),
            F.col(b_col).cast("long").alias(b_col),
        )
        .repartition(1)
        .mapInArrow(uf_kernel, out_schema)
    )


# Edge-count bound for the single-task union-find stitch: one task
# over E 16-byte rows — ~1 s and ~2 GB at the 50M default, far above
# any measured stitch graph (sf100 adversarial: ~1.4M edges), while
# corpora whose stitch graph outgrows it route to the distributed
# iterative propagation instead. Env-overridable for cluster sizing.
_UF_MAX_EDGES = int(os.environ.get("SPARK_GRAFT_UF_MAX_EDGES", "50000000"))


def components_auto(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Size-routed connected components: materialize the pair list
    once (localCheckpoint — also cuts the pair-graph lineage, so
    neither route recomputes the candidate join that produced it),
    then run the single-task union-find kernel (`_components_arrow`)
    while the edge list is inside `_UF_MAX_EDGES`, else the
    distributed iterative propagation. Near-dup pair graphs are
    bounded artifacts (band caps/df caps make them ≪ corpus), so the
    kernel — one exchange, zero iterative rounds, zero per-round
    actions — is the expected route at every measured scale; labels
    are identical either way (test-pinned)."""
    edges = pairs.select(a_col, b_col).localCheckpoint(eager=True)
    if edges.count() <= _UF_MAX_EDGES:
        return _components_arrow(edges, a_col, b_col)
    return connected_components(edges, a_col, b_col, max_iter)


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over a near-dup pair graph → (doc_id,
    cluster_id = min doc id in the component). This is the step that
    turns pairwise similarity into actual dedup decisions: keep
    cluster_id, drop the rest.

    Iterative min-label propagation: each round every node takes the
    smallest label among itself and its neighbors; converges in
    O(diameter) rounds (near-dup clusters are shallow — a handful of
    rounds in practice, `max_iter` bounds pathology). Each round is
    one shuffle of the edge list; the frontier DataFrame is
    localCheckpoint()ed so the lineage (and thus task binaries) stays
    O(1) across iterations instead of doubling — the classic Spark
    iterative-algorithm discipline.

    If labels are still changing when `max_iter` is exhausted (a path
    component longer than `max_iter` hops), the result would silently
    split one component into several — so this raises instead of
    returning unconverged labels. Raise `max_iter` for deep graphs.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    changed = 0
    for _ in range(max_iter):
        # one round = neighbor-min + POINTER DOUBLING (follow the
        # candidate label through the current label map): rounds
        # needed drop from O(diameter) to O(log diameter). The old
        # label rides along so convergence is read off the SAME
        # materialization — round-4 profiling showed per-round
        # fixed cost (Spark actions over tiny frames), not edge
        # volume, dominating this operator: eager-checkpoint +
        # separate changed-join was 2 jobs/round, this is 1.
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        half = labels.join(
            neighbor_min, labels.node == neighbor_min.src, "left"
        ).select(
            "node",
            F.col("label").alias("_old"),
            F.least(
                F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
            ).alias("_mid"),
        )
        lk = labels.select(
            F.col("node").alias("_mnode"), F.col("label").alias("_mlab")
        )
        updated = half.join(
            lk, half._mid == lk._mnode, "left"
        ).select(
            "node",
            "_old",
            F.least(
                F.col("_mid"), F.coalesce(F.col("_mlab"), F.col("_mid"))
            ).alias("label"),
        )
        # lazy checkpoint: the changed-count below is the action
        # that materializes it, cutting lineage in the same job
        updated = updated.localCheckpoint(eager=False)
        changed = (
            updated.where(F.col("label") != F.col("_old"))
            .limit(1)
            .count()
        )
        labels = updated.select("node", "label")
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge within max_iter="
            f"{max_iter} rounds; labels were still changing. Increase "
            f"max_iter (rounds needed = graph diameter)."
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def embedding_near_dup_exact(
    emb: DataFrame, vec_col: str, id_col: str, threshold: float = 0.95
) -> DataFrame:
    """Embedding-cosine near-dup pairs, EXACT all-pairs baseline.

    This is an O(n²) theta join (Catalyst plans ``id_a < id_b`` as a
    nested-loop join) — the tiny-SF oracle/recall cross-check for
    `embedding_near_dup`, never the scale path. Use the LSH-bucketed
    operator for anything bigger than a few thousand vectors."""
    a = emb.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = emb.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    pairs = a.join(b, on=F.col("id_a") < F.col("id_b"))
    cos = vectors.cosine("va", "vb")
    return (
        pairs.withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _sign_band_keys(
    vec_col: str, band_bits: int, n_bands: int
) -> list[F.Column]:
    """One packed long per band: band index in the high bits, the
    sign bits of `band_bits` consecutive vector components in the low
    bits. Sign-of-projection is the random-hyperplane LSH family; the
    component axes stand in for the hyperplanes (valid when the
    embedding space is roughly isotropic, as model embeddings are —
    for skewed spaces substitute similarity.hyperplane_signature,
    the dataflow is identical)."""
    v = F.col(vec_col)
    keys = []
    for band in range(n_bands):
        key = F.lit(band * (1 << band_bits)).cast("long")
        for j in range(band_bits):
            comp = F.element_at(v, band * band_bits + j + 1)
            key = key + F.when(comp > 0, F.lit(1 << j)).otherwise(F.lit(0))
        keys.append(key)
    return keys


def embedding_near_dup(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.45,
    band_bits: int = 4,
    n_bands: int = 16,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed — the scale
    path. Semantics: pairs that share at least one sign-bit band key
    AND have exact cosine ≥ threshold (deterministic, so the SQL
    oracle reproduces bucketing and verification bit-for-bit).

    Dataflow (same shape as minhash_lsh_pairs — no all-pairs join
    anywhere): explode `n_bands` packed band keys per vector →
    self-EQUI-join on the 8-byte key (ids only, vectors never ride
    the band shuffle) → distinct candidate pairs → join vectors back
    by id → exact cosine verify.

    Scale math: expected candidates ≈ n_bands · n²/2^(band_bits+1)
    for uniform buckets — pruning is real when band_bits is sized to
    the threshold (p = 1 − θ/π per bit: at cos ≥ 0.9, 8-bit bands ×
    16 give recall ≈ 0.996 at ~1/32 of all-pairs; the defaults here
    are sized for the low 0.45 demo threshold where p ≈ 0.65 and
    recall(4,16) ≈ 0.96). Per-pair work is O(dim); skewed buckets
    (near-constant sign patterns) are the risk — AQE skew-join
    handles moderate skew, dropping the hottest band keys (doc-freq
    cap, as in capped Jaccard) beyond that."""
    bands = _sign_band_keys(vec_col, band_bits, n_bands)
    banded = emb.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array(*bands)).alias("band_key"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            on=(F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", vectors.cosine("va", "vb"))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def positioned_gram_keys_arrow(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(doc, i, gkey): EVERY positioned n-gram key (1-based token
    index, no distinct) — the substring-dedup substrate. Arrow twin
    of the transform/slice/xxhash64 HOF chain, which the sf1 sweep
    measured at ~38 s per evaluation (and the span operator
    evaluates its gram frame three times). Same vectorized
    byte-Horner + rolling combine as the postings kernel; hash
    VALUES differ from the Catalyst path but only key EQUALITY
    matters on the hashed span path (the string path remains the
    oracle mirror). Docs shorter than n tokens emit nothing (the
    span rule, unlike postings' whole-doc fold)."""
    import numpy as np

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("doc", T.LongType(), True),
            T.StructField("i", T.IntegerType(), True),
            T.StructField("gkey", T.LongType(), True),
        ]
    )
    proj = fan_out(
        df.select(
            F.col(id_col).cast("long").alias("doc"),
            F.col(text_col).alias("_t"),
        )
    )

    def kernel(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        ws_pat = "[ \t\n\x0b\x0c\r]+"
        # 64-BIT rolling hash (uint64 wraparound — numpy unsigned
        # overflow is well-defined): span membership compares final
        # OUTPUT against the string-gram oracle, so collisions must
        # be negligible at corpus scale (2.6M grams at sf1 would
        # already see ~1.6k collisions on a 31-bit key; at 64 bits
        # the birthday term is ~4e-7, the same policy as xxhash64
        # keys elsewhere).
        MUL = np.uint64(0x9E3779B97F4A7C15)
        for b in batches:
            ids = b.column(0).to_numpy(zero_copy_only=False)
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
            offs = np.frombuffer(flat.buffers()[1], dtype=np.int32)
            offs = offs[flat.offset : flat.offset + len(flat) + 1].astype(
                np.int64
            )
            data = np.frombuffer(flat.buffers()[2], dtype=np.uint8)
            starts, ends = offs[:-1], offs[1:]
            lens = ends - starts
            keep = lens > 0
            starts, lens, parents = starts[keep], lens[keep], parents[keep]
            h = np.zeros(len(starts), dtype=np.uint64)
            maxlen = int(lens.max()) if len(lens) else 0
            for j in range(maxlen):
                m = j < lens
                idx = starts[m] + j
                h[m] = h[m] * MUL + data[idx]
            if len(h) >= n:
                g = h[: len(h) - (n - 1)].copy()
                for j in range(1, n):
                    g = g * MUL + h[j : len(h) - (n - 1) + j]
                gp = parents[: len(h) - (n - 1)]
                gvalid = parents[n - 1 :] == gp
                g, gp = g[gvalid], gp[gvalid]
                # 1-based position within the doc's token stream:
                # rank of the gram among its doc's tokens
                tok_pos = np.arange(len(parents), dtype=np.int64)
                doc_first = np.zeros(
                    parents.max() + 1 if len(parents) else 1,
                    dtype=np.int64,
                )
                firsts = np.flatnonzero(
                    np.r_[True, parents[1:] != parents[:-1]]
                )
                doc_first[parents[firsts]] = tok_pos[firsts]
                pos = (
                    tok_pos[: len(h) - (n - 1)][gvalid]
                    - doc_first[gp]
                    + 1
                ).astype(np.int32)
            else:
                g = np.empty(0, dtype=np.uint64)
                gp = np.empty(0, dtype=np.int64)
                pos = np.empty(0, dtype=np.int32)
            yield pa.record_batch(
                [
                    pa.array(ids[gp], pa.int64()),
                    pa.array(pos, pa.int32()),
                    pa.array(g.view(np.int64), pa.int64()),
                ],
                names=["doc", "i", "gkey"],
            )

    return proj.mapInArrow(kernel, out_schema)


def strip_duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    hashed: bool = True,
    keep_first: bool = False,
) -> DataFrame:
    """Exact substring (span) dedup, anchor-seeded — the Spark-shaped
    form of Lee et al. 2022's duplicated-span removal (ROADMAP.md has
    the design note): every token covered by an n-gram that occurs
    more than once corpus-wide is removed from the document.

    Dataflow (all equi-joins, work ∝ |grams|, never |docs|²):
    (1) each doc explodes into positioned n-grams; (2) one groupBy
    finds SEED grams (count > 1) — map-side combine keeps the shuffle
    at |distinct grams|; (3) a semi-join marks each doc's seeded
    positions and explodes them to covered token indices; (4) the
    cleaned text is rebuilt map-side by filtering the token array
    against the doc's covered set.

    ``keep_first=False`` removes EVERY copy of a duplicated span (the
    conservative default). ``keep_first=True`` matches Lee et al.'s
    published semantics — exactly one copy of each duplicated span
    survives: the same seed groupBy additionally carries
    ``min(struct(doc, i))`` (partial-agg friendly, no window sort),
    and that lexicographically-first occurrence is exempted from
    coverage. Because every overlapping anchor of a cross-doc span
    picks the same owner doc (struct ordering compares doc first),
    whole spans survive intact in the first document that contains
    them.

    ``hashed=True`` joins on xxhash64(gram) — 8-byte shuffle keys,
    the 100 TB path (a 64-bit collision can only over-delete one
    span, the conservative direction for dedup). ``hashed=False``
    joins on the gram string — engine-portable, what the SQL oracle
    mirrors; equivalence of the two paths is test-pinned.

    Returns (id_col, n_tokens, n_dup_tokens, clean_text).
    """
    toks = text.tokens(F.col(text_col))
    if hashed:
        # string-free positioned grams from the Arrow kernel, CACHED:
        # the operator consumes the gram frame three times (seed
        # aggregate, seeded probe, coverage) and the HOF construction
        # alone measured ~38 s per evaluation at sf1 — kernel + pool
        # turns 3 × 38 s of gram building into one ~1 s pass. Only
        # key EQUALITY matters on this path; the hashed=False twin
        # keeps the gram strings the SQL oracle mirrors, and path
        # equivalence is test-pinned.
        g = _DF_CACHE.get_or_build(
            ("span_grams", _corpus_key(df), text_col, id_col, n),
            lambda: positioned_gram_keys_arrow(df, text_col, id_col, n),
        )
    else:
        gram_keys = F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - n + 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        g = df.select(
            F.col(id_col).alias("doc"),
            F.posexplode(gram_keys).alias("p", "gkey"),
        ).select(
            "doc",
            (F.col("p") + 1).alias("i"),  # 1-based gram start
            "gkey",
        )
    if keep_first:
        owners = (
            g.groupBy("gkey")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.min(F.struct(F.col("doc"), F.col("i"))).alias("own"),
            )
            .where(F.col("cnt") > 1)
            .select("gkey", "own")
        )
        seeded = g.join(owners, "gkey").where(
            ~(
                (F.col("doc") == F.col("own.doc"))
                & (F.col("i") == F.col("own.i"))
            )
        )
    else:
        seeds = (
            g.groupBy("gkey")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") > 1)
            .select("gkey")
        )
        seeded = g.join(seeds, "gkey", "left_semi")
    covered = (
        seeded.select(
            "doc",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + F.lit(n - 1))
            ).alias("tpos"),
        )
        .distinct()
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_dup_tokens"),
            F.collect_set("tpos").alias("cpos"),
        )
    )
    base = df.select(F.col(id_col).alias("doc"), toks.alias("toks"))
    joined = base.join(covered, "doc", "left")
    cpos = F.coalesce(F.col("cpos"), F.array().cast("array<int>"))
    # membership via a per-doc MAP, not array_contains: a heavily
    # duplicated doc has |cpos| ~ |tokens|, and array_contains per
    # token made the rebuild O(tokens²) per doc — the dominant cost
    # of the whole operator at sf1 (sweep: 98 s; map lookup: ~9 s).
    # try_element_at: ANSI element_at throws on a missing map key.
    cmap = F.map_from_arrays(
        cpos, F.transform(cpos, lambda _: F.lit(True))
    )
    kept = F.filter(
        F.col("toks"),
        lambda x, i: F.coalesce(
            F.try_element_at(cmap, (i + 1).cast("int")), F.lit(False)
        )
        == F.lit(False),
    )
    return joined.select(
        F.col("doc").alias(id_col),
        F.size("toks").cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_dup_tokens"), F.lit(0)).cast("long").alias(
            "n_dup_tokens"
        ),
        F.concat_ws(" ", kept).alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered incremental dedup (scale twin of
# incremental_exact_dedup)
# ---------------------------------------------------------------------------


def build_text_bloom(
    df: DataFrame, text_col: str, m_words: int = 1024, k: int = 5
) -> list[int]:
    """Aggregate a Bloom filter over ``df[text_col]`` with Catalyst
    built-ins only: each text sets ``k`` bit positions
    ``pmod(xxhash64(text, seed), 64·m_words)``; positions group by
    64-bit word index and combine with ``bit_or`` (map-side partial —
    the shuffle carries at most ``m_words`` rows per partition
    regardless of corpus size). The finished filter is ``m_words``
    longs (8·m_words bytes) — a bounded model parameter, collected
    like the IVF centroids and quantizer stats are.

    Sizing: false-positive rate ≈ (1 - e^(-k·n/m))^k for n distinct
    texts over m = 64·m_words bits; the default 64 Kbit / k=5 holds
    ~1% at n = 6k. Size m_words ∝ corpus keys at scale (64 MB of
    words covers ~5·10⁸ keys at 1%)."""
    m_bits = m_words * 64
    pos = [
        F.pmod(F.xxhash64(F.col(text_col), F.lit(i)), F.lit(m_bits))
        for i in range(k)
    ]
    words = (
        df.select(F.explode(F.array(*pos)).alias("j"))
        .select(
            F.expr("cast(j div 64 as int)").alias("w"),
            F.expr("shiftleft(cast(1 as bigint), cast(j % 64 as int))").alias(
                "bit"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
    )
    arr = [0] * m_words
    for r in words.collect():  # bounded: <= m_words rows
        arr[r["w"]] = r["word"]
    return arr


def bloom_words_column(words: list[int]):
    """The filter as a literal column, pinned to array<bigint>:
    a saturated filter's words are small negative ints, and
    PySpark's literal inference would type them array<int> — where
    shiftright silently wraps shift distances mod 32."""
    return F.lit(words).cast("array<bigint>")


def bloom_membership_predicate(
    words: list[int], text_col: str, k: int = 5
):
    """Column predicate: True iff all ``k`` Bloom positions of
    ``text_col`` are set in the literal word array ``words`` (bound
    to the row as ``_bloom_words``). Never false-negative for texts
    the filter was built over — xxhash64 is deterministic, so a
    member's positions are set by construction."""
    m_bits = len(words) * 64
    tests = []
    for i in range(k):
        j = f"pmod(xxhash64({text_col}, {i}), {m_bits})"
        tests.append(
            f"(shiftright(element_at(_bloom_words, "
            f"cast(({j}) div 64 as int) + 1), "
            f"cast(({j}) % 64 as int)) & 1) = 1"
        )
    return F.expr(" AND ".join(tests))


def incremental_exact_dedup_bloom(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str,
    id_col: str,
    m_words: int = 1024,
    k: int = 5,
) -> DataFrame:
    """Scale twin of :func:`incremental_exact_dedup`: same result,
    Bloom-prefiltered probe. The historical corpus collapses to a
    fixed-size Bloom filter; only batch rows the filter claims as
    possible members (true dupes + the tuned false-positive rate)
    enter the exact anti-join verify — definite non-members skip the
    join entirely. At 100 TB the daily anti-join's probe shrinks
    from |batch| to ~|dupes|, and the corpus side ships once as
    8·m_words bytes instead of once per batch as a distinct-key
    shuffle. Exactness does not depend on Bloom sizing: the filter
    cannot false-negative a real member, and false positives are
    removed by the verify join."""
    words = build_text_bloom(corpus_df, text_col, m_words, k)
    probe = new_df.select(
        F.col(text_col).alias("content_key"), F.col(id_col)
    ).withColumn("_bloom_words", bloom_words_column(words))
    might = bloom_membership_predicate(words, "content_key", k)
    positives = probe.filter(might).drop("_bloom_words")
    negatives = probe.filter(~might).drop("_bloom_words")
    seen = corpus_df.select(
        F.col(text_col).alias("content_key")
    ).distinct()
    verified = positives.join(seen, ["content_key"], "left_anti")
    survivors = verified.unionByName(negatives)
    return (
        survivors.groupBy("content_key")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("canonical_id", "n_copies")
    )


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Broder CONTAINMENT near-dup pairs: |A∩B| / min(|A|,|B|) —
    the asymmetric cousin of Jaccard that catches a short document
    fully embedded in a long one (quotes, boilerplate wrappers,
    chunk/parent pairs), where Jaccard = |A∩B|/|A∪B| stays small
    because the union is dominated by the long side. Same
    shingle-postings equi-join and skew profile as
    `ngram_jaccard_pairs`; the only change is the denominator."""
    posts = shingle_postings_cached(df, text_col, id_col, n)
    a, b = posts.alias("a"), posts.alias("b")
    common = (
        a.join(b, on="sh")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_shingles").alias("na"),
            F.col("b.n_shingles").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    cont = F.col("n_common") / F.least(F.col("na"), F.col("nb"))
    return (
        common.withColumn("containment", cont)
        .where(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
    )


def containment_pairs_capped(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_df: int = 100,
) -> DataFrame:
    """Doc-frequency-capped containment — the skew-hardened twin of
    `containment_pairs`, same discipline as
    `ngram_jaccard_pairs_capped`: shingles in more than ``max_df``
    documents are dropped before the postings self-join (broadcast
    anti-join on the provably-small hot set) and BOTH the
    intersection and the min-set-size denominator are recomputed
    over the capped shingle universe, so the ratio is exact over
    that universe and the SQL oracle mirrors it shingle-for-
    shingle. The round-5 sweep measured the exact form's Σ df²
    aggregate at ~35 s for sf1 (349M co-shingle rows from 2.9M
    postings) and that product is unbounded under boilerplate skew,
    so this is the form that survives 100 TB; the exact query stays
    registered as its semantic baseline.

    Candidates come from the EXACT prefix filter
    (`_prefix_candidates`, zero recall loss): containment ≥ t means
    the pair shares ≥ ⌈t·min(na,nb)⌉ shingles, so the smaller doc's
    (na − ⌈t·na⌉ + 1)-prefix must hit the larger doc's postings.
    No size-ratio prune exists for containment (a tiny doc fully
    inside a huge one is precisely the relationship the metric is
    FOR), but the prefix is short — 1 − t of the smaller doc — and
    carries the rarest shingles, so on rich vocabularies (the sf100
    entropic regime that measured 482 s on the old self-join) the
    candidate join collapses. Verification is the pair-local
    `array_intersect` pass, linear in candidates."""
    corpus_key = _corpus_key(df)
    posts = shingle_postings_cached(df, text_col, id_col, n)
    ranked = _capped_ranked_cached(
        posts, corpus_key, text_col, id_col, n, max_df
    )
    # pooled for the same three-branch reuse as the Jaccard twin
    cands = _DF_CACHE.get_or_build(
        (
            "prefix_cands", "containment", corpus_key, text_col,
            id_col, n, threshold, max_df, SHINGLE_BACKEND,
        ),
        lambda: _prefix_candidates(
            ranked,
            lambda pn: F.ceil(pn * F.lit(threshold) - F.lit(1e-9)),
        ),
    )
    arrs = _capped_arrays_cached(
        ranked, corpus_key, text_col, id_col, n, max_df
    )
    return _score_pairs(
        arrs,
        arrs,
        cands,
        ("doc_a", "doc_b"),
        threshold,
        metric="containment",
    )


def minhash_lsh_pairs_incremental(
    corpus: DataFrame,
    delta: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 96,
    bands: int = 24,
    threshold: float = 0.8,
    max_bucket: int = 4096,
) -> DataFrame:
    """Near-dups of DELTA documents against the existing CORPUS
    without re-deduping the corpus: the daily-ingest shape — at
    100 TB you LSH the snapshot once, pool its postings/signatures,
    and each delta joins band keys against it. Candidates are a
    corpus×delta band-key equi-join (never corpus² and never
    delta², unlike rerunning full dedup per day); verification is
    exact Jaccard on the candidate subset, same discipline as
    `minhash_lsh_pairs`. Assumes disjoint id spaces (snapshots).

    `max_bucket` caps the CORPUS side's band buckets before the
    join, same guard and same rationale as `minhash_lsh_pairs`: a
    mega-bucket (thousands of corpus docs sharing one band key —
    boilerplate minima) multiplies every delta hit by the bucket
    size; the sf100 sweep measured the uncapped form exhausting the
    host's disk. Invisible at every oracle-checked SF (sf1 bucket
    max is 90)."""
    rows = num_hashes // bands
    posts_c = shingle_postings_cached(corpus, text_col, id_col, n)
    posts_d = shingle_postings_cached(delta, text_col, id_col, n)

    band_keys = ", ".join(
        "xxhash64({}, {})".format(
            band,
            ", ".join(f"signature[{band * rows + j}]" for j in range(rows)),
        )
        for band in range(bands)
    )

    def banded(df: DataFrame, posts: DataFrame) -> DataFrame:
        return minhash_signatures_cached(
            df, posts, text_col, id_col, n, num_hashes
        ).selectExpr("doc_id", f"explode(array({band_keys})) AS band_key")

    # The corpus-side banded lineage is consumed TWICE (bucket-size
    # aggregate + the candidate join's left side) — pool it so the
    # full corpus signature computation, the cost the daily-ingest
    # rationale is built around, runs once per (corpus, params) and
    # is reused across daily invocations (ADVICE round 9).
    corpus_banded = _DF_CACHE.get_or_build(
        (
            "inc_lsh_banded", _corpus_key(corpus), text_col, id_col,
            n, num_hashes, bands,
        ),
        lambda: banded(corpus, posts_c),
    )
    # Same windowed bucket cap as `minhash_lsh_pairs._build_cands`
    # (one shuffle of the pooled banded frame, filter in place,
    # identical surviving rows) instead of groupBy + semi-join.
    capped_banded = (
        corpus_banded.withColumn(
            "_bs",
            F.count(F.lit(1)).over(Window.partitionBy("band_key")),
        )
        .where(F.col("_bs") <= F.lit(max_bucket))
        .select("doc_id", "band_key")
    )

    cands = (
        capped_banded
        .alias("a")
        .join(
            banded(delta, posts_d).alias("b"),
            on=(F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("corpus_doc"),
            F.col("b.doc_id").alias("delta_doc"),
        )
        .dropDuplicates(["corpus_doc", "delta_doc"])
    )
    # Pair-local verification, same round-10 rewrite as
    # minhash_lsh_pairs: each (corpus, delta) candidate pair joins
    # to its two shingle arrays and intersects — linear in candidate
    # count, no Σ_sh df² postings blowup on low-entropy corpora.
    return _verify_pairs_exact(
        posts_c,
        cands,
        ("corpus_doc", "delta_doc"),
        threshold,
        posts_right=posts_d,
    )


def shingle_postings_arrow(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """Arrow-kernel twin of `shingle_postings` — the sf10 bench
    flagged the Catalyst HOF chain (per-token hash transform +
    zip_with gram folds + array_distinct, all CodegenFallback) as
    the dominant COLD cost of the whole dedup family (~140 s of
    ngram_jaccard's 146 s cold at sf10); this kernel vectorizes the
    same pipeline in numpy over the raw Arrow UTF-8 buffers.

    The hash differs from the Catalyst path (byte-polynomial vs
    xxhash64 — Spark's xxhash64 has no cheap vectorized Python
    form), which is CONTRACT-SAFE: no consumer or oracle ever sees
    hash values, only shingle EQUALITY (Jaccard/containment pair
    sets, MinHash bands are verified exactly, doc-frequency caps
    count distinct values) — collisions are the only behavioral
    difference, ~2⁻³¹ per shingle pair on either hash. Backend
    parity is test-pinned on the pair-set level."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("n_shingles", T.IntegerType(), True),
            T.StructField("sh", T.LongType(), True),
        ]
    )
    proj = fan_out(
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(text_col).alias("_t"),
        )
    )

    def kernel(batches):
        import pyarrow as pa

        for b in batches:
            ids, g, gp, counts = _gram_arrays(b, n)
            yield pa.record_batch(
                [
                    pa.array(ids[gp], pa.int64()),
                    pa.array(counts[gp].astype("int32"), pa.int32()),
                    pa.array(g, pa.int64()),
                ],
                names=["doc_id", "n_shingles", "sh"],
            )

    return proj.mapInArrow(kernel, out_schema)


def token_count_postings_arrow(df, text_col: str, id_col: str):
    """(doc_id, tok, n): per-document token OCCURRENCE counts with
    tokens as 64-bit byte-polynomial hashes — the Arrow twin of
    `posexplode(tokens(text))` + `groupBy(doc, token).count()` for
    consumers that only need token EQUALITY (the unigram-LM family:
    per-doc counts, vocabulary counts, importance ratios). The HOF
    tokenize + corpus-size explode was the measured 60 s of
    `unigram_lm_perplexity` at sf10; the kernel emits the 12M-row
    pre-aggregated count table directly. Hashing is contract-safe
    by the same argument as the positioned-gram kernel (no consumer
    or oracle sees token VALUES, only equality) — but unlike the
    pair-set consumers this family's emitted NUMBERS depend on
    exact count identity, so the hash is the 64-bit wraparound
    polynomial (collision term ~2⁻⁶⁴ — the engine's standing
    xxhash64 policy), not the mod-P 2³¹ gram hash, which would
    expect ~10⁴ colliding token pairs on a 12M-token vocabulary."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("tok", T.LongType(), True),
            T.StructField("n", T.LongType(), True),
        ]
    )
    proj = fan_out(
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(text_col).alias("_t"),
        )
    )

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            ids, h, parents, n_docs = _token_hash_arrays(
                b, mod64=True
            )
            if not len(h):
                continue
            order = np.lexsort((h, parents))
            hs, ps = h[order], parents[order]
            first = np.ones(len(hs), dtype=bool)
            first[1:] = (ps[1:] != ps[:-1]) | (hs[1:] != hs[:-1])
            starts = np.flatnonzero(first)
            runs = np.diff(np.r_[starts, len(hs)])
            yield pa.record_batch(
                [
                    pa.array(ids[ps[first]], pa.int64()),
                    pa.array(hs[first], pa.int64()),
                    pa.array(runs.astype(np.int64), pa.int64()),
                ],
                names=["doc_id", "tok", "n"],
            )

    return proj.mapInArrow(kernel, out_schema)


def shingle_postings_arrow64(
    df, text_col: str, id_col: str, n: int = 3
):
    """64-bit-keyed Arrow shingle postings — same tokens, grams and
    per-doc distinct as `shingle_postings_arrow`, but token hash and
    gram fold run in uint64 WRAPAROUND instead of mod P. For
    consumers whose OUTPUT depends on shingle-identity decisions
    (the contamination df cap: a mod-P vocabulary of ~3·10⁵ distinct
    grams already expects ~45 colliding pairs, each of which merges
    two shingles' document frequencies and can flip a ≤ max_df
    threshold); pair-set consumers keep the mod-P pool, where a
    collision only adds a candidate that exact verification
    removes."""
    import numpy as np

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("sh", T.LongType(), True),
        ]
    )
    proj = fan_out(
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(text_col).alias("_t"),
        )
    )

    def kernel(batches):
        import pyarrow as pa

        B = np.uint64(131)
        for b in batches:
            ids, h64, parents, n_docs = _token_hash_arrays(
                b, mod64=True
            )
            h = h64.view(np.uint64)
            if len(h) >= n:
                g = h[: len(h) - (n - 1)].copy()
                for j in range(1, n):
                    g = g * B + h[j : len(h) - (n - 1) + j]
                gp = parents[: len(h) - (n - 1)]
                gvalid = parents[n - 1 :] == gp
                g, gp = g[gvalid], gp[gvalid]
            else:
                g = np.empty(0, dtype=np.uint64)
                gp = np.empty(0, dtype=np.int64)
            # docs with < n tokens (incl. zero) fold to ONE whole-
            # stream shingle — same rule as _gram_arrays and the
            # oracle's ELSE [array_to_string(toks, ' ')] branch
            tok_counts = np.bincount(parents, minlength=n_docs)
            short = np.flatnonzero(tok_counts < n)
            if len(short):
                acc = {int(d): np.uint64(0) for d in short}
                smask = np.isin(parents, short)
                for hv, pv in zip(h[smask], parents[smask]):
                    acc[int(pv)] = acc[int(pv)] * B + hv
                g = np.concatenate(
                    [
                        g,
                        np.array(
                            [acc[int(d)] for d in short],
                            dtype=np.uint64,
                        ),
                    ]
                )
                gp = np.concatenate([gp, short.astype(np.int64)])
            if not len(g):
                continue
            order = np.lexsort((g, gp))
            g, gp = g[order], gp[order]
            first = np.ones(len(g), dtype=bool)
            first[1:] = (gp[1:] != gp[:-1]) | (g[1:] != g[:-1])
            g, gp = g[first], gp[first]
            yield pa.record_batch(
                [
                    pa.array(ids[gp], pa.int64()),
                    pa.array(g.view(np.int64), pa.int64()),
                ],
                names=["doc_id", "sh"],
            )

    return proj.mapInArrow(kernel, out_schema)


def _token_hash_arrays(b, mod64: bool = False):
    """Per-batch tokenize + token-hash shared by the gram and
    token-count kernels: batch (doc_id, text) → (ids, token hashes
    h in stream order, doc index per token, n_docs). Whitespace
    tokens (Java-`\\s` ASCII class), rolling (·131+byte) polynomial
    per token — mod P (the gram-fold convention) by default, or
    64-bit wraparound (`mod64`) for consumers whose emitted numbers
    depend on exact token-count identity."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    P = np.int64(_P)
    ws_pat = "[ \t\n\x0b\x0c\r]+"  # Java \s, ASCII-only

    ids = b.column(0).to_numpy(zero_copy_only=False)
    n_docs = len(ids)
    txt = b.column(1)
    if txt.null_count:
        txt = pc.fill_null(txt, "")
    toks = pc.split_pattern_regex(txt, ws_pat)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    offs = np.frombuffer(flat.buffers()[1], dtype=np.int32)
    offs = offs[flat.offset : flat.offset + len(flat) + 1].astype(np.int64)
    data = np.frombuffer(flat.buffers()[2], dtype=np.uint8)
    starts, ends = offs[:-1], offs[1:]
    lens = ends - starts
    keep = lens > 0
    starts, lens, parents = starts[keep], lens[keep], parents[keep]
    maxlen = int(lens.max()) if len(lens) else 0
    if mod64:
        h64 = np.zeros(len(starts), dtype=np.uint64)
        for j in range(maxlen):
            m = j < lens
            idx = starts[m] + j
            h64[m] = h64[m] * np.uint64(131) + data[idx].astype(
                np.uint64
            )
        return ids, h64.view(np.int64), parents, n_docs
    h = np.zeros(len(starts), dtype=np.int64)
    for j in range(maxlen):
        m = j < lens
        idx = starts[m] + j
        h[m] = (h[m] * 131 + data[idx]) % P
    return ids, h, parents, n_docs


def _gram_arrays(b, n: int):
    """Per-batch vectorized shingle computation shared by the Arrow
    postings and signature kernels: batch (doc_id, text) → (ids,
    distinct gram hashes g sorted by doc, doc index gp per gram,
    per-doc distinct counts). Same semantics as the Catalyst
    pipeline in `shingle_postings` (whitespace tokens, rolling
    (·131+x) mod P gram polynomial, whole-stream fold for docs
    shorter than n, per-doc distinct)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    P = np.int64(_P)
    ws_pat = "[ \t\n\x0b\x0c\r]+"  # Java \s, ASCII-only

    ids = b.column(0).to_numpy(zero_copy_only=False)
    n_docs = len(ids)
    txt = b.column(1)
    if txt.null_count:
        txt = pc.fill_null(txt, "")
    toks = pc.split_pattern_regex(txt, ws_pat)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    # raw UTF-8 buffers: offsets + data, no Python strings
    offs = np.frombuffer(flat.buffers()[1], dtype=np.int32)
    offs = offs[flat.offset : flat.offset + len(flat) + 1].astype(np.int64)
    data = np.frombuffer(flat.buffers()[2], dtype=np.uint8)
    starts, ends = offs[:-1], offs[1:]
    lens = ends - starts
    # drop empty tokens (split artifacts at borders)
    keep = lens > 0
    starts, lens, parents = starts[keep], lens[keep], parents[keep]
    # vectorized Horner over bytes: h = (h*131 + byte) % P, one
    # masked pass per byte position. The mod is DEFERRED to every
    # 4th position (int64 modular-division is the pass's dominant
    # cost — measured 2x): between reductions each lane grows by at
    # most a factor 131^4 ≈ 2^28.2 from a < P < 2^31 start, bounded
    # by 2^59.5 — no overflow, and (((x % P)·131^k + c) % P) ==
    # ((x·131^k + c) % P), so every value is bit-identical.
    h = np.zeros(len(starts), dtype=np.int64)
    maxlen = int(lens.max()) if len(lens) else 0
    for j in range(maxlen):
        m = j < lens
        idx = starts[m] + j
        h[m] = h[m] * 131 + data[idx]
        if j % 4 == 3:
            h %= P
    h %= P
    # gram hashes: ((h_i*131 + h_{i+1}) % P * 131 + h_{i+2}) % P
    # valid where n consecutive tokens share a doc. Same deferred-
    # mod identity: each fold step is ×131 (2^7.04) + (< 2^31), so
    # up to 4 steps from < P stay under 2^60 before one reduction.
    if len(h) >= n:
        g = h[: len(h) - (n - 1)].copy()
        for j in range(1, n):
            g = g * 131 + h[j : len(h) - (n - 1) + j]
            if j % 4 == 0:
                g %= P
        g %= P
        gp = parents[: len(h) - (n - 1)]
        gvalid = parents[n - 1 :] == gp
        g, gp = g[gvalid], gp[gvalid]
    else:
        g = np.empty(0, dtype=np.int64)
        gp = np.empty(0, dtype=np.int64)
    # short docs (< n tokens): ONE whole-stream fold shingle
    tok_counts = np.bincount(parents, minlength=n_docs)
    short = np.flatnonzero(tok_counts < n)
    if len(short):
        acc = {int(d): np.int64(0) for d in short}
        smask = np.isin(parents, short)
        for hv, pv in zip(h[smask], parents[smask]):
            acc[int(pv)] = (acc[int(pv)] * 131 + hv) % P
        g = np.concatenate(
            [g, np.array([acc[int(d)] for d in short], dtype=np.int64)]
        )
        gp = np.concatenate([gp, short.astype(np.int64)])
    # distinct per doc: hash-distinct on the packed (doc, gram) key
    # (g < P < 2^31 and gp < batch size, so gp<<31|g is collision-
    # free in int64). 2.8x the former global lexsort — the kernel's
    # measured dominant term. Rows keep ARRIVAL order (each doc's
    # grams stay contiguous: a doc lives entirely in the main gram
    # section or the short-doc tail, never both), which no consumer
    # can observe: the postings feed shuffled groupBy/join/reduceat
    # consumers whose within-group order is nondeterministic anyway.
    if len(g):
        import pandas as pd

        key = (gp << np.int64(31)) | g
        dup = pd.Series(key).duplicated().to_numpy()
        if dup.any():
            keepg = ~dup
            g, gp = g[keepg], gp[keepg]
    counts = np.bincount(gp, minlength=n_docs)
    return ids, g, gp, counts


def minhash_signatures_arrow(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 96,
) -> DataFrame:
    """Arrow-kernel MinHash signatures: the wide 96-min aggregate
    over the postings frame was the TRUE dominant cost of cold
    MinHash at sf10 (~45 s — an earlier count()-based probe read
    2.8 s because Catalyst PRUNED the unreferenced min columns),
    so the signatures come straight out of the gram kernel with
    `np.minimum.reduceat` per coefficient — no 29M-row aggregate at
    all. Values are the exact (a·g + b) mod P integer mins of the
    same gram hashes the Arrow postings emit, so signatures and
    band keys are reproducible, and exact verification still runs
    against the pooled postings."""
    from pyspark.sql import types as T

    coeffs = _minhash_coeffs(num_hashes)
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("n_shingles", T.IntegerType(), True),
            T.StructField(
                "signature", T.ArrayType(T.LongType(), True), True
            ),
        ]
    )
    proj = fan_out(
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(text_col).alias("_t"),
        )
    )

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        P = np.int64(_P)
        ca = np.array([a for a, _ in coeffs], dtype=np.int64)
        cb = np.array([b for _, b in coeffs], dtype=np.int64)

        for b in batches:
            ids, g, gp, counts = _gram_arrays(b, n)
            if not len(g):
                continue
            doc_starts = np.flatnonzero(
                np.r_[True, gp[1:] != gp[:-1]]
            )
            doc_idx = gp[doc_starts]
            sigs = np.empty((len(doc_idx), len(ca)), dtype=np.int64)
            for k in range(len(ca)):
                vals = (ca[k] * g + cb[k]) % P
                sigs[:, k] = np.minimum.reduceat(vals, doc_starts)
            yield pa.record_batch(
                [
                    pa.array(ids[doc_idx], pa.int64()),
                    pa.array(
                        counts[doc_idx].astype("int32"), pa.int32()
                    ),
                    pa.array(list(sigs), pa.list_(pa.int64())),
                ],
                names=["doc_id", "n_shingles", "signature"],
            )

    return proj.mapInArrow(kernel, out_schema)
