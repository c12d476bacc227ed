"""Similarity search over embedding columns (`array<float>`).

Extension surface (SURVEY.md §7.2 step 9): brute-force cosine top-k
as the exact baseline, plus a random-hyperplane-LSH bucketed variant
as the 100 TB path (candidates come from a grouped equi-join on
bucket signatures instead of a full cross join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from etl_covid19_spark.operators.parallelism import fan_out

from etl_covid19_spark.functions import vectors


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against
    the corpus, rank per query with a window. The corpus scan is
    embarrassingly parallel; per-partition TopK via the rank filter
    keeps the shuffle at |queries|·k rows."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        q.join(c, on=F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", vectors.cosine("qv", "cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def hyperplane_signature(vec_col: str, planes: list[list[float]]) -> F.Column:
    """Random-hyperplane LSH signature: bit i = sign(v·p_i). Planes
    are deterministic constants (seeded), broadcast as literals.

    Kept as zip_with/aggregate higher-order folds deliberately:
    unrolling the dot products into flat element_at arithmetic (512
    terms for 8 planes × 64 dims) was measured 3× SLOWER at sf0.1
    (5.5 s vs 1.4 s warm) — the giant expression tree falls out of
    whole-stage codegen, while the HOF fold stays a tight interpreted
    loop over primitive arrays.

    Assembled as ONE parsed SQL string, not py4j Column objects
    (round 11): the Column form issued ~3,200 driver⇄JVM roundtrips
    per invocation (one per plane-component `lit` plus the lambda
    plumbing) — 0.45 s of serial driver time per query build,
    re-paid on every invocation. The string parses in the JVM in
    milliseconds to the IDENTICAL expression tree (CAST('repr' AS
    DOUBLE) literals round-trip bit-exactly), so the executed plan
    and every signature value are unchanged — the same lesson
    `ivf_pq_topk`'s distance table and the MinHash signature
    aggregate already carry."""

    def _bit(plane: list[float]) -> str:
        arr = "array(" + ",".join(
            f"CAST('{x!r}' AS DOUBLE)" for x in plane
        ) + ")"
        dot = (
            f"aggregate(zip_with(`{vec_col}`, {arr}, "
            "(v, p) -> CAST(v AS DOUBLE) * p), "
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        return f"(CASE WHEN {dot} > 0 THEN 1 ELSE 0 END)"

    sig = "0"
    for plane in planes:
        sig = f"({sig} * 2 + {_bit(plane)})"
    return F.expr(sig)


def make_planes(dim: int, n_planes: int = 8, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG-based, no numpy
    RNG state) — same planes every run, every engine."""
    planes = []
    state = seed
    for _ in range(n_planes):
        plane = []
        for _ in range(dim):
            state = (state * 1103515245 + 12345) % (2**31)
            plane.append((state / 2**31) * 2.0 - 1.0)
        planes.append(plane)
    return planes


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse-quantize the
    corpus to its nearest centroid, probe only the `n_probe` closest
    centroid lists per query. Join degree = probed-list size, not
    corpus size — the other classic ANN partitioning next to
    hyperplane LSH (lsh_bucket_ann).

    Centroid "training" here is a deterministic stub (the first
    `n_centroids` corpus vectors) so results are reproducible across
    engines (the oracle requirement); `ivf_topk_trained` is the
    production twin — seeded Spark ML k-means behind the SAME
    assign/probe/rank dataflow. Centroids are a bounded model
    parameter (like LSH planes): collected once, shipped as
    literals, so assignment is map-side with zero shuffle.

    Ties (same cosine to two centroids) break toward the higher
    centroid id; the SQL oracle mirrors this.
    """
    cents = [
        (int(r["cid"]), [float(x) for x in r["cv"]])
        for r in emb.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .collect()
    ]
    return _ivf_search(emb, queries, cents, vec_col, id_col, k, n_probe)


def ivf_topk_trained(
    emb: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    max_iter: int = 20,
    seed: int = 7,
) -> DataFrame:
    """IVF top-k with TRAINED centroids: Spark ML k-means (k-means||
    init, seeded → deterministic) learns the coarse quantizer, then
    the identical assign/probe/rank dataflow runs against the learned
    centers. Training is a bounded iterative Spark job (each Lloyd
    round = one pass, partial sums aggregated tree-wise); the k
    centers collected to the driver are model parameters (same
    bounded-shipping posture as the LSH planes).

    Recall depends on how clustered the corpus is — IVF prunes by
    exploiting cluster structure, so on well-clustered embeddings
    (the realistic case for model embeddings) recall@k ≥ 0.9 at
    n_probe/n_centroids = 1/4 (test-pinned on planted clusters in
    ``tests/test_datasource_ivf.py``); on isotropic-random vectors
    expected recall degrades toward n_probe/n_centroids — raise
    n_probe or fall back to brute force for unclustered data."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = emb.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(train)
    cents = [
        (i, [float(x) for x in c])
        for i, c in enumerate(model.clusterCenters())
    ]
    return _ivf_search(emb, queries, cents, vec_col, id_col, k, n_probe)


def ivf_topk_trained_fixedpoint(
    emb: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """IVF top-k with ORACLE-REPRODUCIBLE trained centroids: the
    `train_centroids_fixedpoint` one-Lloyd-step quantizer (exact
    int64 fixed-point means — a SQL twin recomputes every centroid
    component bit-for-bit, where `ivf_topk_trained`'s Spark ML
    k-means cannot be expressed in ANSI SQL) feeding the identical
    `_ivf_search` assign/probe/rank dataflow. The trained-and-
    verified sibling of `ivf_topk`'s deterministic-seed stub: same
    fixed centroid COUNT (assignment linear in n forever), better
    cell placement than raw id-ordered seeds."""
    cents = train_centroids_fixedpoint(
        emb, vec_col, id_col, n_centroids=n_centroids
    )
    return _ivf_search(emb, queries, cents, vec_col, id_col, k, n_probe)


def _ivf_scores_sql(
    cents: list[tuple[int, list[float]]], vec_col: str
) -> str:
    """Per-centroid cosine scores `array<struct<cos,cid>>` as ONE
    nested-literal SQL string (model constants ride as one literal
    array, machinery as one transform lambda). Parses to the same
    casts and left-to-right fold order as the per-centroid Column
    build it replaced — bit-identity pinned in
    tests/test_curation.py::TestIvfSearchScores."""

    def _dlit(x: float) -> str:
        return f"CAST('{x!r}' AS DOUBLE)"

    cents_lit = "array(" + ",".join(
        "named_struct('cid', %d, 'cv', array(%s))"
        % (cid, ",".join(_dlit(v) for v in cv))
        for cid, cv in cents
    ) + ")"
    vexpr = f"`{vec_col}`"
    _dot = (
        f"aggregate(zip_with({vexpr}, c.cv, "
        "(x, y) -> CAST(x AS DOUBLE) * y), "
        "CAST(0.0 AS DOUBLE), (acc, p) -> acc + p)"
    )
    _nv = (
        f"sqrt(aggregate({vexpr}, CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )
    _nc = (
        "sqrt(aggregate(c.cv, CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + x * x))"
    )
    return (
        f"transform({cents_lit}, c -> named_struct("
        f"'cos', CASE WHEN {_nv} * {_nc} = CAST(0.0 AS DOUBLE) "
        f"THEN CAST(0.0 AS DOUBLE) ELSE {_dot} / ({_nv} * {_nc}) END, "
        "'cid', c.cid))"
    )


def _ivf_search(
    emb: DataFrame,
    queries: DataFrame,
    cents: list[tuple[int, list[float]]],
    vec_col: str,
    id_col: str,
    k: int,
    n_probe: int,
) -> DataFrame:
    """Shared IVF dataflow: map-side centroid assignment (centroids
    are literals — zero shuffle), bucket equi-join of broadcast
    probed queries against the corpus, per-query window top-k.

    The query-side probe expression (per-centroid cosine structs)
    rides as ONE literal nested array + ONE transform lambda — the
    ivf_pq nested-literal treatment (round-11): the per-centroid
    `F.lit`/HOF Column build cost ~0.1-0.2 s of serial driver py4j
    per invocation and a k-fold bigger tree for every downstream
    analysis pass. Same casts, same left-to-right fold order —
    bit-identity with the Column form is pinned in
    tests/test_curation.py::TestIvfSearchScores."""
    c = _assign_buckets_arrow(emb, cents, vec_col, id_col)
    probed = F.expr(
        f"slice(reverse(array_sort({_ivf_scores_sql(cents, vec_col)})), "
        f"1, {n_probe})"
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.explode(probed).alias("_pr"),
        ).select("query_id", "qv", F.col("_pr.cid").alias("bucket"))
    )
    pairs = q.join(c, on="bucket").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    # exact fold-order cosine per candidate pair — the interpreted
    # HOF cosine over |queries|·bucket_size pairs was the measured
    # bulk of sf10 IVF cost; values are bit-identical
    scored = cosine_pairs_fold_arrow(pairs, "qv", "cv")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _assign_buckets_arrow(
    emb: DataFrame, cents, vec_col: str, id_col: str
) -> DataFrame:
    """Corpus-side IVF bucket assignment as an Arrow kernel:
    (neighbor_id, cv, bucket) with bucket = argmax centroid cosine,
    ties to the HIGHER cid — exactly `array_max(scores(vec))
    .getField("cid")`, which is the interpreted-HOF form this
    replaces (measured ~40 s of sf10 IVF: n_centroids fold cosines
    per corpus row, all CodegenFallback).

    Decision-exactness: BLAS float64 cosines differ from the
    Catalyst fold by ~1e-15, which can only flip the argmax when
    two centroids sit within that of each other — so rows whose
    top-2 margin is < 1e-9 are recomputed with the sequential
    per-dim fold (bit-identical to `vectors.cosine`, zero-norm →
    0.0) before the tie-aware argmax. Centroid cids arrive in
    ascending order from both trainers, so "last max index" is the
    higher-cid tie-break on either path."""
    import numpy as np
    import pyarrow as pa

    from pyspark.sql import types as T

    cid_list = [cid for cid, _ in cents]
    assert cid_list == sorted(cid_list)
    C = np.array([cv for _, cv in cents], dtype=np.float64)
    n_c, dim_c = C.shape
    # centroid norms via the same sequential dim fold as the HOF
    cn_acc = np.zeros(n_c)
    for d in range(dim_c):
        cn_acc += C[:, d] * C[:, d]
    cnorm = np.sqrt(cn_acc)
    cids = np.array(cid_list, dtype=np.int64)

    id_type = emb.schema[id_col].dataType
    vec_type = emb.schema[vec_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("neighbor_id", id_type, True),
            T.StructField("cv", vec_type, True),
            T.StructField("bucket", T.IntegerType(), True),
        ]
    )
    proj = fan_out(
        emb.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
        )
    )

    def kernel(batches):
        for b in batches:
            n = len(b)
            col = b.column(1)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flat = col.flatten()
            # guard before the zero-copy reshape (one NULL/ragged
            # slot would misalign the whole batch): rows that are
            # NULL or whose width ≠ centroid dim can't score against
            # the centroids — they get bucket NULL and fall out of
            # the downstream equi-join, like any NULL join key
            valid = col.is_valid().to_numpy(zero_copy_only=False)
            widths = (
                np.diff(col.offsets.to_numpy())
                if n
                else np.zeros(0, dtype=np.int64)
            )
            if (
                n
                and valid.all()
                and flat.null_count == 0
                and (widths == dim_c).all()
            ):
                X = np.asarray(flat, dtype=np.float64).reshape(n, dim_c)
                ok = None  # every row scores
            else:
                X = np.zeros((n, dim_c), dtype=np.float64)
                ok = np.zeros(n, dtype=bool)
                for i, val in enumerate(col.to_pylist()):
                    if (
                        val is not None
                        and len(val) == dim_c
                        and all(e is not None for e in val)
                    ):
                        X[i] = val
                        ok[i] = True
            if n_c == 1:
                # a single trained centroid is legal — every
                # scorable row lands in the lone bucket (the HOF
                # form's array_max over a 1-element scores array)
                idx = np.zeros(n, dtype=np.int64)
                bkt = cids[idx].astype(np.int32)
                yield pa.RecordBatch.from_arrays(
                    [
                        b.column(0),
                        b.column(1),
                        pa.array(
                            bkt,
                            pa.int32(),
                            mask=None if ok is None else ~ok,
                        ),
                    ],
                    names=["neighbor_id", "cv", "bucket"],
                )
                continue
            xn_acc = np.zeros(n)
            for d in range(X.shape[1]):
                xn_acc += X[:, d] * X[:, d]
            xnorm = np.sqrt(xn_acc)
            denom = np.outer(xnorm, cnorm)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(denom == 0, 0.0, (X @ C.T) / denom)
            # top-2 margin guard: recompute near-ties fold-exactly
            part = np.partition(cos, n_c - 2, axis=1)
            margin = part[:, n_c - 1] - part[:, n_c - 2]
            flagged = np.flatnonzero(margin < 1e-9)
            if flagged.size:
                Xf = X[flagged]
                dot = np.zeros((len(flagged), n_c))
                na = np.zeros(len(flagged))
                for d in range(X.shape[1]):
                    dot += Xf[:, d, None] * C[None, :, d]
                    na += Xf[:, d] * Xf[:, d]
                dn = np.outer(np.sqrt(na), cnorm)
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos[flagged] = np.where(dn == 0, 0.0, dot / dn)
            # argmax with ties to the LAST (highest-cid) index
            rev = cos[:, ::-1]
            idx = n_c - 1 - np.argmax(rev, axis=1)
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(0),
                    b.column(1),
                    pa.array(
                        cids[idx].astype(np.int32),
                        pa.int32(),
                        mask=None if ok is None else ~ok,
                    ),
                ],
                names=["neighbor_id", "cv", "bucket"],
            )

    return proj.mapInArrow(kernel, out_schema)


def lsh_bucket_ann(
    emb: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    backend: str = "arrow",
) -> DataFrame:
    """Approximate top-k: bucket corpus and queries by hyperplane
    signature, rank within the shared bucket. Recall < 1 by design
    (probe multiple buckets / fewer planes to raise it); the win is
    that the join degree is the bucket size, not the corpus size.

    Corpus-side bucketing defaults to the bit-exact Arrow kernel
    (`hyperplane_buckets_arrow` — the HOF fold was ALL of the sf10
    cost); queries stay on the Catalyst fold (bounded rows), which
    is safe because the two produce identical buckets."""
    planes = make_planes(dim, n_planes)
    if backend == "arrow":
        c = hyperplane_buckets_arrow(
            emb, vec_col, id_col, planes, "neighbor_id", "cv"
        )
    else:
        c = emb.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            hyperplane_signature(vec_col, planes).alias("bucket"),
        )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            hyperplane_signature(vec_col, planes).alias("bucket"),
        )
    )
    scored = (
        q.join(c, on="bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", vectors.cosine("qv", "cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def knn_graph(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    band_bits: int = 4,
    n_bands: int = 16,
) -> DataFrame:
    """Approximate k-nearest-neighbor GRAPH: every vector's top-k
    most-cosine-similar neighbors among its LSH candidates — the
    all-points counterpart of query-set ANN (`lsh_bucket_ann`) and
    the input primitive for graph clustering, kNN-based dedup
    thresholds, and diversity sampling over a corpus.

    SEMANTICS (unchanged since round 3, same SQL oracle): a pair is
    a candidate iff it shares ≥1 sign-bit band key
    (dedup._sign_band_keys); each source keeps its top-k candidates
    by exact cosine, ties on (cosine desc, neighbor id asc).

    EXECUTION is per-BUCKET, not per-pair: the round-4 sweep showed
    the pair-materializing form timing out at sf1 — on
    near-isotropic embeddings 4-bit bands mark ~64 % of all pairs
    as candidates, and joining 64-float vectors onto that pair set
    shuffles candidate_pairs × 2 × 512 B (≈ 260 GB at sf1-extreme).
    Instead the banded frame (vector rides ONCE per band key, Σ =
    n_bands·|corpus| rows) groups by band key; a per-bucket Arrow
    kernel preselects by float32 BLAS matmul on unit-normalized
    copies with a provable epsilon THRESHOLD (below), then
    recomputes the kept pairs' cosine with the SEQUENTIAL per-dim
    float64 fold so emitted values are bit-identical to the
    Catalyst/ANSI `aggregate` order. The kernel only has to emit a
    SUPERSET of each source's exact in-bucket top-k — the global
    merge (dedup (src, dst) + one window ordered (cosine desc, dst
    asc)) does the real ranking over exact values, and
    bucket-local-top-k ⊇ global-top-k for every shared bucket
    (fewer competitors in a subset).

    Two sf10-measured plan choices (231 s → ~35 s at 200k vectors):

    * The banded frame is a UNION of n_bands narrow projections,
      not one explode: GenerateExec re-copies the vector payload
      per emitted row (measured 28-56 s alone at sf10), while 16
      columnar projections materialize in ~4 s. Vectors ship in
      their STORAGE precision (float32 parquet) and are upcast to
      float64 inside the kernel — upcasting is exact, so the fold
      result is bit-identical to casting in Catalyst. At cluster
      scale the union re-scans the corpus n_bands times; persist
      the compact (id, vec) frame first if scan IO dominates —
      semantics are unchanged either way.
    * applyInArrow + zero-copy flatten/reshape: no per-row Python
      list boxing on the 1 GB-scale grouped input.

    Scale shape: shuffle is n_bands·|corpus| vector rows + the
    merged per-bucket winners (≈ |corpus|·n_bands·(k+ties) narrow
    rows); per-bucket compute is Σ bucket² dot products in BLAS.
    On ISOTROPIC corpora that Σ bucket² is inherently ~n² work
    (SCALE.md "isotropic mid-threshold" — no blocking scheme can
    bound top-k candidates there); on clustered real-model
    embeddings band buckets shrink and the same plan is
    subquadratic. Recall vs the exact graph is pinned ≥ 0.85 in
    tests/test_dedup_similarity.py."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import Window
    from pyspark.sql import types as T

    from etl_covid19_spark.operators.dedup import _sign_band_keys
    from etl_covid19_spark.operators.df_cache import (
        SHARED_CACHE,
        corpus_key,
    )

    id_type = emb.schema[id_col].dataType
    margin = 16

    # the banding union reads its source n_bands times — against
    # parquet that is n_bands full corpus scans at cluster scale, so
    # the compact (id, vec) projection is pooled ONCE (persisted,
    # LRU + file-snapshot invalidation) and every band projects from
    # the in-memory columnar frame instead
    compact = SHARED_CACHE.get_or_build(
        ("knn_compact", corpus_key(emb), vec_col, id_col),
        lambda: emb.select(
            F.col(id_col).alias("doc"), F.col(vec_col).alias("v")
        ),
    )
    bands = _sign_band_keys("v", band_bits, n_bands)
    band_slices = [
        compact.select(
            "doc",
            "v",
            b.cast("long").alias("band_key"),
        )
        for b in bands
    ]
    banded = band_slices[0]
    for sl in band_slices[1:]:
        banded = banded.unionAll(sl)
    out_schema = T.StructType(
        [
            T.StructField("src", id_type, True),
            T.StructField("dst", id_type, True),
            T.StructField("cosine", T.DoubleType(), True),
        ]
    )

    def bucket_topk(tbl: pa.Table) -> pa.Table:
        n = len(tbl)
        id_pa_type = tbl.schema.field("doc").type
        if n < 2:
            return pa.table(
                {
                    "src": pa.array([], id_pa_type),
                    "dst": pa.array([], id_pa_type),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        # row order = dst ascending → stable argsort == (score desc,
        # dst asc), the oracle's tie-break in the fallback path
        tbl = tbl.sort_by("doc")
        ids = tbl.column("doc").to_numpy(zero_copy_only=False)
        varr = tbl.column("v").combine_chunks()
        has_vec = varr.is_valid().to_numpy(zero_copy_only=False)
        flat = varr.flatten()
        widths = np.diff(varr.offsets.to_numpy())
        dim = int(widths.max(initial=0))
        if (
            has_vec.all()
            and flat.null_count == 0
            and (widths == dim).all()
        ):
            # zero-copy flatten → reshape; upcasting the storage
            # floats to float64 is EXACT, so downstream folds are
            # bit-identical to a Catalyst array<double> cast
            X = (
                flat.to_numpy(zero_copy_only=True)
                .reshape(n, dim)
                .astype(np.float64, copy=False)
            )
        else:
            X = np.zeros((n, dim), dtype=np.float64)
            for i, val in enumerate(varr.to_pylist()):
                if val is not None and len(val) == dim:
                    X[i] = [0.0 if e is None else e for e in val]
        # exact norms: the same left-to-right fold as vectors.norm
        nacc = np.zeros(n)
        for j in range(dim):
            nacc += X[:, j] * X[:, j]
        nrm = np.sqrt(nacc)
        safe = np.where(nrm > 0, nrm, 1.0)
        Xn = X / safe[:, None]
        m = min(n - 1, k + margin)
        src_parts: list[np.ndarray] = []
        dst_parts: list[np.ndarray] = []
        chunk = 256
        if has_vec.all() and n > 4 * (m + 1):
            # THRESHOLD selection in float32: the kernel only has to
            # EMIT a superset of each source's exact top-k — the
            # global window does the real (cosine desc, dst asc)
            # ranking over exact fold values — so no in-kernel sort
            # or argpartition is needed at all. Keep every dst whose
            # float32 score is within eps of the row's float32 k-th
            # largest. Guarantee: the sgemm over 64 unit-norm float32
            # terms deviates from the exact float64 fold by at most
            # ~dim·2^-24 ≈ 4e-6 (plus the 2^-24 cast), so with
            # |S32−S| ≤ eps/2 every exact-top-k dst satisfies
            # S32[dst] ≥ kth32 − eps (the k-th largest itself moves
            # by ≤ eps/2). eps = 1e-4 is a 25× margin over the bound
            # and on a ~N(0, 1/dim) cosine spread admits only a few
            # extra near-tied dsts per row — emitted rows drop from
            # (k+margin) to ≈ k+ties, shrinking the merge shuffle
            # too. Exact ties at the boundary are all kept (≥, not
            # >), preserving the oracle's tie semantics.
            X32 = Xn.astype(np.float32)
            eps = np.float32(1e-4)
            for c0 in range(0, n, chunk):
                c1 = min(n, c0 + chunk)
                S32 = X32[c0:c1] @ X32.T
                S32[
                    np.arange(c0, c1) - c0, np.arange(c0, c1)
                ] = -np.inf
                # The per-row cut comes from a column-STRIDED
                # subsample: full-row np.partition is scalar
                # introselect (~16 ns/element — it dominated this
                # kernel), but partitioning every 8th column costs
                # an 8th of that, and the subset's k-th largest is
                # PROVABLY ≤ the full row's k-th largest (a subset
                # can only have a lower k-th max), so the ≥-t
                # survivor set always contains the true top-k and
                # always has ≥ k members (the subset's own k
                # survivors). Expected survivors ≈ stride·k — the
                # exact refinement below trims them back to k+ties.
                # stride-8 is only sound when the subsample still
                # holds ≥ k columns (scol = ceil(n/8) ≥ k) — for k
                # in (n/8, n/4) the old gate let scol−k go negative,
                # a from-the-end partition index yielding a
                # too-high cut and survivor rows with < k members
                stride = 8 if n >= 4096 and n >= 8 * (k + 1) else 1
                sub = S32[:, ::stride]
                scol = sub.shape[1]
                t = np.partition(sub, scol - k, axis=1)[
                    :, scol - k
                ]
                mask = S32 >= t[:, None]
                cnt = mask.sum(axis=1)
                # invariant: the subset contributes ≥ k members ≥ its
                # own k-th largest, so every full row has ≥ k
                # survivors — required by the cross-row kth gather
                assert (cnt >= k).all()
                r, cdx = np.nonzero(mask)
                vals = S32[mask]
                # exact k-th largest AMONG the ≥-t survivors (a
                # superset of the true top-k), then keep survivors
                # within eps of it — same guarantee as partitioning
                # the full row, at survivor-set cost
                order = np.lexsort((vals, r))
                starts = np.concatenate(
                    ([0], np.cumsum(cnt))
                )
                kth = vals[order[starts[1:] - k]]
                keep = vals >= kth[r] - eps
                src_parts.append(r[keep] + c0)
                dst_parts.append(cdx[keep])
        else:
            for c0 in range(0, n, chunk):
                c1 = min(n, c0 + chunk)
                S = Xn[c0:c1] @ Xn.T
                # NULL-vector rows: exact cosine is NULL, which
                # sorts after every real value (DESC NULLS LAST
                # both engines)
                if not has_vec.all():
                    S[:, ~has_vec] = -np.inf
                    S[~has_vec[c0:c1], :] = -np.inf
                S[
                    np.arange(c0, c1) - c0, np.arange(c0, c1)
                ] = np.nan
                order = np.argsort(-S, axis=1, kind="stable")[:, :m]
                # argsort pushes the NaN self-slot last; it can only
                # surface when m == n-1... never: self is excluded
                # by taking m <= n-1 of the n-1 non-self (NaN sorts
                # after -inf under -S ascending)
                src_parts.append(np.repeat(np.arange(c0, c1), m))
                dst_parts.append(order.reshape(-1))
        si = np.concatenate(src_parts)
        di = np.concatenate(dst_parts)
        keep = si != di
        si, di = si[keep], di[keep]
        # exact fold-order cosine for the kept pairs only
        A, B = X[si], X[di]
        dot = np.zeros(len(si))
        for j in range(dim):
            dot += A[:, j] * B[:, j]
        denom = nrm[si] * nrm[di]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(denom == 0, 0.0, dot / denom)
        null_pair = ~(has_vec[si] & has_vec[di])
        return pa.table(
            {
                "src": pa.array(ids[si], id_pa_type),
                "dst": pa.array(ids[di], id_pa_type),
                "cosine": pa.array(
                    cos,
                    pa.float64(),
                    mask=null_pair if null_pair.any() else None,
                ),
            }
        )

    def build() -> DataFrame:
        per_bucket = banded.groupBy("band_key").applyInArrow(
            bucket_topk, out_schema
        )
        merged = per_bucket.dropDuplicates(["src", "dst"])
        w = Window.partitionBy("src").orderBy(
            F.col("cosine").desc(), F.col("dst").asc()
        )
        return (
            merged.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("src", "dst", "cosine", "rank")
        )

    # POOLED: the graph is the input primitive for PageRank,
    # triangle counting, and diversity sampling — each consumer
    # re-deriving it re-pays the Σ bucket² kernel (the single
    # largest cost of the similarity family at sf10). Same bounded
    # LRU + file-snapshot invalidation as the token pools.
    from etl_covid19_spark.operators.df_cache import (
        SHARED_CACHE,
        corpus_key,
    )

    key = (
        "knn_graph",
        corpus_key(emb),
        vec_col,
        id_col,
        k,
        band_bits,
        n_bands,
    )
    return SHARED_CACHE.get_or_build(key, build)


def _probe_buckets_arrow(
    emb: DataFrame,
    cents,
    vec_col: str,
    id_col: str,
    n_probe: int,
) -> DataFrame:
    """Corpus-side multi-probe IVF assignment as one Arrow kernel:
    (doc, v, bucket, probe_rank) with probe_rank 1..n_probe over
    centroids ordered (cosine DESC, cid DESC) — rank 1 IS the
    assignment (`_assign_buckets_arrow`'s argmax with ties to the
    higher cid), ranks 2.. are the extra probes, exactly
    `slice(reverse(array_sort(scores)), 1, n_probe)` in the HOF
    form `_ivf_search` uses for queries.

    Centroid cosines are computed with the SEQUENTIAL per-dim
    float64 fold (vectorized across rows — the identical IEEE op
    sequence as `vectors.cosine` / the ANSI `list_reduce` oracle),
    so probe ranks are bit-deterministic across engines with no
    epsilon guard needed. NULL/ragged/width-mismatched rows emit no
    probes (they cannot score against the centroids)."""
    import numpy as np
    import pyarrow as pa

    from pyspark.sql import types as T

    cid_list = [cid for cid, _ in cents]
    assert cid_list == sorted(cid_list)
    C = np.array([cv for _, cv in cents], dtype=np.float64)
    n_c, dim_c = C.shape
    p = min(n_probe, n_c)
    cn_acc = np.zeros(n_c)
    for d in range(dim_c):
        cn_acc += C[:, d] * C[:, d]
    cnorm = np.sqrt(cn_acc)
    cids = np.array(cid_list, dtype=np.int64)

    id_type = emb.schema[id_col].dataType
    vec_type = emb.schema[vec_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("doc", id_type, True),
            T.StructField("v", vec_type, True),
            T.StructField("bucket", T.IntegerType(), False),
            T.StructField("probe_rank", T.IntegerType(), False),
        ]
    )
    proj = fan_out(
        emb.select(
            F.col(id_col).alias("doc"), F.col(vec_col).alias("v")
        )
    )

    def kernel(batches):
        for b in batches:
            n = len(b)
            col = b.column(1)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flat = col.flatten()
            valid = col.is_valid().to_numpy(zero_copy_only=False)
            widths = (
                np.diff(col.offsets.to_numpy())
                if n
                else np.zeros(0, dtype=np.int64)
            )
            if (
                n
                and valid.all()
                and flat.null_count == 0
                and (widths == dim_c).all()
            ):
                X = np.asarray(flat, dtype=np.float64).reshape(
                    n, dim_c
                )
                ok = np.ones(n, dtype=bool)
            else:
                X = np.zeros((n, dim_c), dtype=np.float64)
                ok = np.zeros(n, dtype=bool)
                for i, val in enumerate(col.to_pylist()):
                    if (
                        val is not None
                        and len(val) == dim_c
                        and all(e is not None for e in val)
                    ):
                        X[i] = val
                        ok[i] = True
            # BLAS prefilter + fold-exact recompute on sub-eps
            # margins (the `_assign_buckets_arrow` decision-exactness
            # discipline). The former all-rows dim-by-dim fold loop
            # allocated an (n, n_c) temporary per dimension — fine at
            # the IVF family's 8-16 centroids, but the kNN-graph
            # paths run this kernel at 500-512 centroids where the
            # loop was ~10× a single GEMM and the measured bulk of
            # the sf100 trained-quantizer cost. Only the probe
            # SELECTION leaves this kernel (no cosine value flows
            # out), so rows whose top-(p+1) consecutive margins all
            # exceed 1e-9 provably rank identically under BLAS and
            # fold (|blas−fold| ≲ 1e-13 at 64 dims); the rest are
            # recomputed with the exact sequential fold before
            # ranking.
            # cos = dot · (1/‖x‖) · (1/‖c‖), built in place (three
            # (n, n_c) temporaries of the where/divide form were pure
            # memory traffic); zero-norm rows/cols get reciprocal 0,
            # and their dot entries are exactly 0, so cos lands on
            # the HOF's 0.0 exactly.
            dot = X @ C.T
            na = (X * X).sum(axis=1)
            inv_n = np.zeros_like(na)
            nz = na > 0
            inv_n[nz] = 1.0 / np.sqrt(na[nz])
            inv_c = np.zeros_like(cnorm)
            cz = cnorm > 0
            inv_c[cz] = 1.0 / cnorm[cz]
            cos = dot
            cos *= inv_n[:, None]
            cos *= inv_c[None, :]
            # Top-p selection by p+1 repeated argmax passes — O(n_c)
            # per row. The former all-rows full stable argsort was
            # O(n_c log n_c) per row and materialized an (n, n_c)
            # index matrix (~8 GB of sort traffic per 2M-row pass at
            # 512 centroids — the measured bulk of the sf100
            # assignment stage; np.argpartition's per-row introselect
            # benched slower than the full sort). Rows whose top-(p+1)
            # consecutive margins all exceed 1e-9 can neither tie (so
            # cid order is irrelevant) nor rank differently under the
            # approximate product form vs the exact fold
            # (|approx−fold| ≲ 1e-13 at 64 dims); every other row is
            # recomputed with the exact sequential fold and ranked by
            # the original stable (cos DESC, cid DESC) argsort.
            k_sel = min(p + 1, n_c)
            sel = np.empty((n, k_sel), dtype=np.int64)
            vals = np.empty((n, k_sel))
            rowix = np.arange(n)
            for r in range(k_sel):
                j = np.argmax(cos, axis=1)
                sel[:, r] = j
                vals[:, r] = cos[rowix, j]
                cos[rowix, j] = -np.inf
            order = sel[:, :p]
            # argmax treats NaN as the max (argsort ranked it last):
            # any NaN cosine is selected in pass 1, so isnan(vals)
            # catches every NaN row and routes it to the exact path.
            suspect = (np.diff(vals, axis=1) >= -1e-9).any(
                axis=1
            ) | np.isnan(vals).any(axis=1)
            if n and suspect.any():
                Xs = X[suspect]
                ds = np.zeros((len(Xs), n_c))
                nas = np.zeros(len(Xs))
                for d in range(dim_c):
                    ds += Xs[:, d, None] * C[None, :, d]
                    nas += Xs[:, d] * Xs[:, d]
                den_s = np.outer(np.sqrt(nas), cnorm)
                with np.errstate(
                    divide="ignore", invalid="ignore"
                ):
                    cos_s = np.where(den_s == 0, 0.0, ds / den_s)
                rev_s = cos_s[:, ::-1]
                order[suspect] = (
                    n_c
                    - 1
                    - np.argsort(-rev_s, axis=1, kind="stable")[
                        :, :p
                    ]
                )
            rows = np.repeat(np.arange(n), p)[ok.repeat(p)]
            buckets = cids[order.reshape(-1)][ok.repeat(p)]
            ranks = np.tile(np.arange(1, p + 1), n)[ok.repeat(p)]
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(0).take(pa.array(rows, pa.int64())),
                    col.take(pa.array(rows, pa.int64())),
                    pa.array(buckets.astype(np.int32), pa.int32()),
                    pa.array(ranks.astype(np.int32), pa.int32()),
                ],
                names=["doc", "v", "bucket", "probe_rank"],
            )

    return proj.mapInArrow(kernel, out_schema)


def knn_graph_ivf(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    n_centroids: int | None = 16,
    n_probe: int = 2,
    max_bucket: int = 100_000,
    cents=None,
    cell_target: int = 4000,
) -> DataFrame:
    """Cluster-blocked (IVF-partitioned) kNN graph — the scale twin
    of `knn_graph` for corpora where sign-band LSH floors at
    Σ bucket² ≈ n² flops (the "isotropic mid-threshold" residual
    documented on `knn_graph` / SCALE.md): near-isotropic
    embeddings put ~2⁻ᵇ of ALL pairs in every band bucket, so no
    banding scheme bounds the candidate count. IVF blocking bounds
    it STRUCTURALLY instead: each vector's candidates are the
    members of its `n_probe` nearest centroid lists, giving a hard
    per-point candidate budget of n_probe·max_bucket and total work
    Σ_b |probers_b|·|members_b| ≈ n_probe·n·(n/n_centroids) —
    choose n_centroids ∝ √n (or n/target_bucket at 100 TB) and the
    graph build is subquadratic BY CONSTRUCTION, isotropic or not.
    The price is recall through the IVF lens: exact within probed
    buckets, misses neighbors assigned elsewhere (recall pinned in
    tests on clustered data; raise n_probe to trade flops for
    recall).

    SEMANTICS (SQL-oracle-reproducible, `exact/capped`-twin
    convention): centroids are the deterministic first
    `n_centroids` corpus vectors by id (pass `cents` to swap in
    k-means centers — same dataflow, like `ivf_topk_trained`);
    assignment ties break toward the higher cid; members of a
    bucket are its first `max_bucket` assignees by id; a pair is a
    candidate iff dst is a member of one of src's `n_probe` probed
    buckets; top-k by exact fold cosine, ties (cosine DESC, dst
    ASC).

    EXECUTION: one multi-probe Arrow assignment pass
    (`_probe_buckets_arrow` — fold-exact, map-side, centroids are
    collected model literals like the LSH planes), then ONE grouped
    Arrow kernel per bucket (probers×members BLAS preselect at
    kth−1e-9, exact fold recompute on survivors — same
    provable-superset discipline as `knn_graph.bucket_topk`),
    global dedup + per-src window merge. Shuffle is n_probe·n
    vector rows; nothing pairwise ever ships."""
    import math

    import numpy as np
    import pyarrow as pa

    from pyspark.sql import types as T

    if cents is None:
        if n_centroids is None:
            # CELL-SIZE-TARGETED sizing (round-10 fix for the sf100
            # timeout): a FIXED centroid count makes cell size grow
            # linearly with the corpus, so the per-cell
            # probers×members block is O((n/n_c)²)·d — the measured
            # 900 s blowout at 2M vectors with 16 cells. Scaling the
            # CELL COUNT as n/cell_target instead holds cell size
            # ~constant, making block work n_probe·n·cell_target·d
            # (linear in n) and assignment n·(n/cell_target)·d — the
            # BLAS pass that stays trivial through sf100 (2M×500
            # centroids) and is replaced by trained hierarchical
            # centroids (`cents=`) long before it matters at 100 TB.
            # floor 16 keeps every oracle-gate SF on the historical
            # plan (≤64k vectors → 16 centroids → byte-identical
            # output to the fixed-16 form).
            n_centroids = max(
                16, math.ceil(emb.count() / cell_target)
            )
        cents = [
            (int(r["cid"]), [float(x) for x in r["cv"]])
            for r in emb.orderBy(id_col)
            .limit(n_centroids)
            .select(
                F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
            )
            .collect()
        ]
    probed = _probe_buckets_arrow(emb, cents, vec_col, id_col, n_probe)

    id_type = emb.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("src", id_type, True),
            T.StructField("dst", id_type, True),
            T.StructField("cosine", T.DoubleType(), True),
        ]
    )

    def bucket_knn(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src": pa.array([], tbl.schema.field("doc").type),
                "dst": pa.array([], tbl.schema.field("doc").type),
                "cosine": pa.array([], pa.float64()),
            }
        )
        n = len(tbl)
        if n < 2:
            return empty
        ids = tbl["doc"].to_numpy(zero_copy_only=False)
        ranks = tbl["probe_rank"].to_numpy(zero_copy_only=False)
        vecs = tbl["v"].combine_chunks()
        flat = vecs.flatten()
        widths = np.diff(vecs.offsets.to_numpy())
        dim = int(widths.max(initial=0))
        if (
            vecs.null_count == 0
            and flat.null_count == 0
            and (widths == dim).all()
        ):
            X = np.asarray(flat, dtype=np.float64).reshape(n, dim)
        else:
            # probe pass already dropped null/ragged rows; this is
            # pure defense against mixed-width corpora
            X = np.zeros((n, dim), dtype=np.float64)
            for i, val in enumerate(vecs.to_pylist()):
                if val is not None and len(val) == dim:
                    X[i] = [0.0 if e is None else e for e in val]
        # members: rank-1 rows (the bucket's assignees), capped at
        # max_bucket by ascending id — the hard candidate budget
        mem = np.flatnonzero(ranks == 1)
        if len(mem) > max_bucket:
            mem = mem[np.argsort(ids[mem], kind="stable")][:max_bucket]
        if len(mem) == 0:
            return empty
        nacc = np.zeros(n)
        for j in range(dim):
            nacc += X[:, j] * X[:, j]
        nrm = np.sqrt(nacc)
        safe = np.where(nrm > 0, nrm, 1.0)
        Xn = X / safe[:, None]
        M = Xn[mem]
        mids = ids[mem]
        kk = min(k, len(mem))
        src_parts: list[np.ndarray] = []
        dst_parts: list[np.ndarray] = []
        chunk = 256
        for c0 in range(0, n, chunk):
            c1 = min(n, c0 + chunk)
            S = Xn[c0:c1] @ M.T
            # mask self-pairs so they neither rank nor emit
            self_m = ids[c0:c1, None] == mids[None, :]
            S[self_m] = -np.inf
            scol = S.shape[1]
            if scol > kk:
                t = np.partition(S, scol - kk, axis=1)[:, scol - kk]
            else:
                t = np.full(c1 - c0, -np.inf)
            # BLAS vs fold differ ~1e-15; 1e-9 keeps every exact
            # top-k member and all boundary ties (superset — the
            # global window does the real ranking on exact values)
            keep = S >= np.maximum(t[:, None] - 1e-9, -1e30)
            r, cdx = np.nonzero(keep)
            src_parts.append(r + c0)
            dst_parts.append(cdx)
        si = np.concatenate(src_parts)
        di = np.concatenate(dst_parts)
        if not len(si):
            return empty
        A, B = X[si], X[mem][di]
        dot = np.zeros(len(si))
        na = np.zeros(len(si))
        nb = np.zeros(len(si))
        for d in range(dim):
            dot += A[:, d] * B[:, d]
            na += A[:, d] * A[:, d]
            nb += B[:, d] * B[:, d]
        denom = np.sqrt(na) * np.sqrt(nb)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(denom == 0, 0.0, dot / denom)
        id_pa_type = tbl.schema.field("doc").type
        return pa.table(
            {
                "src": pa.array(ids[si], id_pa_type),
                "dst": pa.array(mids[di], id_pa_type),
                "cosine": pa.array(cos, pa.float64()),
            }
        )

    def build() -> DataFrame:
        per_bucket = probed.groupBy("bucket").applyInArrow(
            bucket_knn, out_schema
        )
        merged = per_bucket.dropDuplicates(["src", "dst"])
        w = Window.partitionBy("src").orderBy(
            F.col("cosine").desc(), F.col("dst").asc()
        )
        return (
            merged.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("src", "dst", "cosine", "rank")
        )

    from etl_covid19_spark.operators.df_cache import (
        SHARED_CACHE,
        corpus_key,
    )

    key = (
        "knn_graph_ivf",
        corpus_key(emb),
        vec_col,
        id_col,
        k,
        n_centroids,
        n_probe,
        max_bucket,
        # cids alone are NOT a sufficient key: trained centroids
        # (`cents=`) reuse the seed ids with different vectors, so
        # the key must hash the centroid VALUES too or the trained
        # and untrained variants would collide in the shared cache.
        tuple(
            (cid, hash(tuple(round(float(x), 12) for x in cv)))
            for cid, cv in cents
        ),
    )
    return SHARED_CACHE.get_or_build(key, build)


def train_centroids_fixedpoint(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    n_centroids: int = 32,
    scale: int = 1_000_000,
) -> list[tuple[int, list[float]]]:
    """TRAINED fixed-count IVF centroids whose values are exactly
    reproducible by an ANSI-SQL oracle: one deterministic Lloyd
    refinement from the first-`n_centroids`-by-id seeds, with the
    per-cell mean computed in FIXED-POINT integer space (the
    `quantized_centroids` trick — int64 sums are exact under any
    partitioning and any engine, where float sums drift with
    aggregation order).

    This is the scale replacement for `knn_graph_ivf`'s
    cell-size-targeted sizing: there, n_centroids = ceil(n/4000)
    makes the centroid-ASSIGNMENT pass n·(n/4000)·d — quadratic past
    sf100 (VERDICT r10's one `weak` residual). A TRAINED FIXED count
    makes assignment n·n_centroids·d — linear in n forever — and on
    clustered corpora (the realistic case for model embeddings)
    fixed trained centers partition the space as well as id-ordered
    seeds ever did. At 100 TB you would train on a sample
    (`emb.sample(...)` upstream) — the dataflow is identical.

    Steps (each one bounded):
      1. seeds = first n_centroids vectors by id (bounded collect —
         model parameters, same shipping posture as LSH planes);
      2. assignment = `_probe_buckets_arrow(n_probe=1)` — one
         map-side Arrow pass, fold-exact cosine, ties to higher cid
         (bit-deterministic across engines, no epsilon);
      3. per-cell componentwise mean: posexplode to (bucket, dim)
         rows, map each component to floor(x·scale) int64, hash-agg
         SUM/COUNT (partials collapse map-side to n_centroids·d rows
         per partition), mean = (double)s / ((double)n·scale) — one
         IEEE division of exactly-agreed operands, so the oracle's
         `CAST(s AS DOUBLE)/(n*1000000.0)` reproduces every centroid
         component bit-for-bit;
      4. re-pack per cell via sorted collect_list (bounded: d entries
         per group) and collect n_centroids rows.

    A seed cell can be empty only if its own seed vector tied at
    cosine 1.0 with a higher-cid seed (exactly-parallel duplicate
    seeds); empty cells are simply absent — identically absent in
    the SQL twin, since the assignment rule is shared. Returns
    `[(cid, centroid_vector)]` sorted by cid, ready for
    `knn_graph_ivf(..., cents=...)` / `_ivf_search`.
    """
    seeds = [
        (int(r["cid"]), [float(x) for x in r["cv"]])
        for r in emb.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .collect()
    ]
    assigned = _probe_buckets_arrow(emb, seeds, vec_col, id_col, 1)
    comp = (
        assigned.select(
            "bucket", F.posexplode("v").alias("d", "x")
        )
        .select(
            "bucket",
            "d",
            F.floor(F.col("x").cast("double") * F.lit(float(scale)))
            .cast("long")
            .alias("q"),
        )
        .groupBy("bucket", "d")
        .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    cells = (
        comp.groupBy("bucket")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("d"),
                        (
                            F.col("s").cast("double")
                            / (
                                F.col("n").cast("double")
                                * F.lit(float(scale))
                            )
                        ).alias("m"),
                    )
                )
            ).alias("cvs")
        )
        .collect()
    )
    return sorted(
        (int(r["bucket"]), [float(x["m"]) for x in r["cvs"]])
        for r in cells
    )


def semantic_dedup(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    n_clusters: int = 8,
    threshold: float = 0.40,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space coarsely, then
    prune semantic duplicates WITHIN each cluster only — the pairwise
    comparison that would be |corpus|² globally becomes Σ cluster²,
    the paper's own cost model (k ≈ √n clusters ⇒ ~n·√n work).

    Keep rule (the paper's "keep the document farthest from the
    centroid" made a deterministic total order): a vector is DROPPED
    when some same-cluster vector with a strictly higher
    cosine-to-centroid (tie: lower id) is within `threshold` cosine
    of it. One row per input vector: (id, cluster_id, cent_cos,
    keep).

    Dataflow mirrors the paper's implementation: (1) map-side
    centroid assignment as an Arrow numpy kernel (centroids are
    bounded model parameters — the equivalent HOF expression is
    CodegenFallback and measured ~10× slower, see `ivf_pq_topk`);
    (2) ONE shuffle by cluster_id; (3) per-cluster pairwise
    similarity as a numpy matmul block inside `applyInPandas` —
    the self-equi-join formulation evaluated an interpreted 64-dim
    cosine per candidate pair and measured 14 s at sf0.1 vs ~1 s for
    the BLAS block. The per-task block is O(cluster²) — the paper's
    k ≈ √n sizing is the lever that bounds it; `n_clusters` is the
    knob. Centroid "training" is the deterministic first-k-by-id
    medoid stub so the DuckDB oracle reproduces every cluster
    boundary; swap seeded k-means centers behind the same dataflow
    for production."""
    import numpy as np
    import pandas as pd

    cents = [
        (int(r["cid"]), [float(x) for x in r["cv"]])
        for r in emb.orderBy(id_col)
        .limit(n_clusters)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .collect()
    ]
    cent_mat = np.array([cv for _, cv in cents], dtype=np.float64)
    cent_norm = np.sqrt((cent_mat * cent_mat).sum(axis=1))
    cids = np.array([cid for cid, _ in cents], dtype=np.int32)

    def _assign(batches):
        for pdf in batches:
            e = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            enorm = np.sqrt((e * e).sum(axis=1))
            denom = np.outer(enorm, cent_norm)
            cos = (e @ cent_mat.T) / np.where(denom == 0, 1.0, denom)
            # tie → HIGHER cid (matches ROW_NUMBER ... cid DESC)
            rev = cos[:, ::-1]
            idx = cos.shape[1] - 1 - np.argmax(rev, axis=1)
            yield pd.DataFrame(
                {
                    "_sd_id": pdf[id_col].to_numpy(),
                    "cluster_id": cids[idx],
                    "cent_cos": cos[np.arange(len(e)), idx],
                    "_sd_v": pdf[vec_col],
                }
            )

    assigned = fan_out(emb.select(F.col(id_col), F.col(vec_col))).mapInPandas(
        _assign,
        schema="_sd_id bigint, cluster_id int, cent_cos double, "
        "_sd_v array<float>",
    )

    def _prune(pdf: pd.DataFrame) -> pd.DataFrame:
        e = np.stack(pdf["_sd_v"].to_numpy()).astype(np.float64)
        nrm = np.sqrt((e * e).sum(axis=1))
        nrm[nrm == 0] = 1.0
        u = e / nrm[:, None]
        cc = pdf["cent_cos"].to_numpy()
        ids = pdf["_sd_id"].to_numpy()
        m = len(ids)
        # A vector is dropped iff some DOMINATING same-cluster vector
        # (higher cent_cos, tie: lower id) is within `threshold`.
        # Sorting by (cent_cos desc, id asc) makes dominance = "any
        # row strictly BEFORE me", so the full m×m sim/close/
        # dominates materialization (5 GB per 25k cluster at sf10 —
        # the measured cost of this operator) collapses to a chunked
        # lower-triangular scan: float32 BLAS against prior rows
        # only, with pairs inside an eps band of the threshold
        # recomputed in float64 (float32 error ≤ ~4e-6 ≪ eps=1e-4,
        # so only band pairs can differ from the float64 decision).
        order = np.lexsort((ids, -cc))
        us = u[order]
        u32 = us.astype(np.float32)
        thr32 = np.float32(threshold)
        eps = np.float32(1e-4)
        dropped_s = np.zeros(m, dtype=bool)
        chunk = 256
        for c0 in range(1, m, chunk):
            c1 = min(m, c0 + chunk)
            S32 = u32[c0:c1] @ u32[:c1].T
            # only strictly-prior columns count: mask j >= i
            jj = np.arange(c1)[None, :]
            ii = np.arange(c0, c1)[:, None]
            S32[jj >= ii] = -np.inf
            dropped_s[c0:c1] |= (S32 > thr32 + eps).any(axis=1)
            band = (S32 > thr32 - eps) & (S32 <= thr32 + eps)
            band[dropped_s[c0:c1], :] = False
            if band.any():
                r, c = np.nonzero(band)
                dots = np.einsum(
                    "ij,ij->i", us[c0 + r], us[c]
                )
                hit = dots > threshold
                if hit.any():
                    dropped_s[c0 + r[hit]] = True
        dropped = np.zeros(m, dtype=bool)
        dropped[order] = dropped_s
        return pd.DataFrame(
            {
                "_sd_id": ids,
                "cluster_id": pdf["cluster_id"].to_numpy(),
                "cent_cos": np.round(cc, 6),
                "keep": ~dropped,
            }
        )

    return (
        assigned.groupBy("cluster_id")
        .applyInPandas(
            _prune,
            schema="_sd_id bigint, cluster_id int, cent_cos double, "
            "keep boolean",
        )
        .select(
            F.col("_sd_id").alias(id_col),
            "cluster_id",
            "cent_cos",
            "keep",
        )
    )


def ivf_pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    m: int = 8,
    ks: int = 16,
    dim: int = 64,
) -> DataFrame:
    """IVF-PQ approximate top-k (Jégou et al. 2011 "Product
    Quantization for Nearest Neighbor Search"): coarse IVF routing
    (same probe dataflow as `ivf_topk`) plus product-quantized
    residual-free codes ranked by asymmetric distance (ADC).

    The scale win over plain IVF: each corpus vector is stored as m
    sub-codebook indices (m bytes for ks ≤ 256) instead of dim
    floats — 32× less memory traffic per candidate at dim=64 — and
    query-side distances are TABLE LOOKUPS: the query precomputes an
    m×ks distance table map-side, and per-candidate ADC is m
    element_at fetches + adds, never a dim-length dot product.

    Codebook training is the deterministic first-ks-by-id stub
    (sub-centroid p of subspace s = dims [s·sub, (s+1)·sub) of the
    p-th smallest-id vector) so the DuckDB oracle reproduces codes
    and rankings exactly; swap seeded per-subspace k-means behind
    the same encode/lookup dataflow for production. Ties: code
    argmin breaks to the lower codebook position, ADC ranking to
    the lower neighbor id. Returns (query_id, neighbor_id, rank,
    adc) with adc = Σ_s ℓ²²(q_sub[s], cb[s][code[s]])."""
    sub = dim // m
    seed_rows = sorted(
        emb.orderBy(id_col)
        .limit(max(ks, n_centroids))
        .select(F.col(id_col).alias("j"), F.col(vec_col).alias("v"))
        .collect(),
        key=lambda r: int(r["j"]),
    )
    # coarse centroids are the first n_centroids seeds — one collect
    # serves both model parameter sets
    cents = [
        (int(r["j"]), [float(x) for x in r["v"]])
        for r in seed_rows[:n_centroids]
    ]
    # codebook: cb[s][p] = sub-vector of the p-th seed (p = rank of
    # its id, so codes are positions, not raw ids)
    cb = {
        s: [
            [float(r["v"][s * sub + t]) for t in range(sub)]
            for r in seed_rows[:ks]
        ]
        for s in range(m)
    }

    # Query-side expressions are assembled as ONE parsed SQL string:
    # building the 8×16-fold distance table as py4j Column objects
    # measured 6.7 s of serial DRIVER time per call (plan
    # construction + analysis), vs milliseconds for a string the JVM
    # parses once — the same lesson the MinHash signature aggregate
    # carries (`dedup._signatures_from_postings`). Beyond parse cost,
    # the EXPRESSION TREE SIZE itself is a per-transformation driver
    # tax: PySpark analyzes eagerly on every Dataset hop, so a
    # 128-fold expansion (one aggregate machinery per (s, p) cell,
    # ~6k nodes) re-pays ~0.2-0.3 s of analysis at each of the ~7
    # downstream transformations. The model constants therefore ride
    # as ONE literal nested array and the machinery as ONE lambda
    # (`zip_with(cb, sequence, ...) -> transform -> aggregate`):
    # same casts, same left-to-right fold order, bit-identical
    # values (pinned in tests/test_curation.py::TestIvfPq), 3×
    # cheaper analysis measured at m=8, ks=16.
    def _dlit(x: float) -> str:
        return f"CAST('{x!r}' AS DOUBLE)"

    def _darr(vals: list[float]) -> str:
        return "array(" + ",".join(_dlit(v) for v in vals) + ")"

    vexpr = f"`{vec_col}`"

    cents_lit = "array(" + ",".join(
        f"named_struct('cid', {cid}, 'cv', {_darr(cv)})"
        for cid, cv in cents
    ) + ")"
    _dot = (
        f"aggregate(zip_with({vexpr}, c.cv, "
        "(x, y) -> CAST(x AS DOUBLE) * y), "
        "CAST(0.0 AS DOUBLE), (acc, p) -> acc + p)"
    )
    _nv = (
        f"sqrt(aggregate({vexpr}, CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )
    _nc = (
        "sqrt(aggregate(c.cv, CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + x * x))"
    )
    coarse_sql = (
        f"transform({cents_lit}, c -> named_struct("
        f"'cos', CASE WHEN {_nv} * {_nc} = CAST(0.0 AS DOUBLE) "
        f"THEN CAST(0.0 AS DOUBLE) ELSE {_dot} / ({_nv} * {_nc}) END, "
        "'cid', c.cid))"
    )

    # Corpus-side encode (coarse bucket + m PQ codes) is pure
    # SELECTION — argmax/argmin indices, no value flows to the
    # output — so it runs as an Arrow-vectorized numpy kernel
    # (mapInPandas), the way production PQ encoders are SIMD batch
    # kernels. Measured at sf1 (20k × 64-dim): the equivalent
    # 128-fold HOF expression has ZERO WholeStageCodegen spans
    # (higher-order functions are CodegenFallback) and costs ~9.5 s
    # interpreted; the Arrow kernel is ~0.2 s. Oracle parity needs
    # only that the argmax/argmin CHOICES agree with the SQL fold —
    # distances differ at ~1e-17 (summation order), and exact
    # distance ties cannot occur on distinct real vectors. The
    # query-side distance table below stays a Catalyst HOF fold, so
    # every value actually SUMMED into adc is bit-identical to the
    # oracle's.
    import numpy as np
    import pandas as pd

    cent_mat = np.array([cv for _, cv in cents], dtype=np.float64)
    cent_norm = np.sqrt((cent_mat * cent_mat).sum(axis=1))
    cids = np.array([cid for cid, _ in cents], dtype=np.int32)
    cb_mat = np.array(
        [cb[s] for s in range(m)], dtype=np.float64
    )  # (m, ks, sub)

    def _encode(batches):
        for pdf in batches:
            e = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            enorm = np.sqrt((e * e).sum(axis=1))
            cos = (e @ cent_mat.T) / np.where(
                np.outer(enorm, cent_norm) == 0, 1.0, np.outer(enorm, cent_norm)
            )
            # tie → HIGHER cid (matches array_max on struct(cos,cid)):
            # scan reversed so the first max found is the last cid
            rev = cos[:, ::-1]
            bucket = cids[cos.shape[1] - 1 - np.argmax(rev, axis=1)]
            code_cols = []
            for s in range(m):
                es = e[:, s * sub : (s + 1) * sub]
                d = ((es[:, None, :] - cb_mat[s][None, :, :]) ** 2).sum(axis=2)
                code_cols.append(np.argmin(d, axis=1))  # tie → lower p
            codes_arr = np.stack(code_cols, axis=1).astype(np.int32)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf[id_col].to_numpy(),
                    "bucket": bucket,
                    "codes": list(codes_arr),
                }
            )

    c = fan_out(emb.select(F.col(id_col), F.col(vec_col))).mapInPandas(
        _encode, schema="neighbor_id bigint, bucket int, codes array<int>"
    )
    cb3d = "array(" + ",".join(
        "array(" + ",".join(_darr(cv) for cv in cb[s]) + ")"
        for s in range(m)
    ) + ")"
    dtab_sql = (
        f"zip_with({cb3d}, sequence(0, {m - 1}), (cbs, s) -> "
        "transform(cbs, cv -> "
        f"aggregate(zip_with(slice({vexpr}, s * {sub} + 1, {sub}), cv, "
        "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        "CAST(0.0 AS DOUBLE), (acc, d) -> acc + d)))"
    )
    probed_sql = (
        f"slice(reverse(array_sort({coarse_sql})), 1, {n_probe})"
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.expr(dtab_sql).alias("dtab"),
            F.explode(F.expr(probed_sql)).alias("_pr"),
        ).select("query_id", "dtab", F.col("_pr.cid").alias("bucket"))
    )
    # Exact DECIMAL accumulation: each looked-up term is bitwise
    # identical across engines (same HOF fold), so summing the
    # identically-quantized decimals makes the ADC value — and hence
    # the ranking — independent of addition order on BOTH sides.
    adc = F.lit(0).cast("decimal(28,18)")
    for s in range(m):
        adc = adc + F.element_at(
            F.element_at(F.col("dtab"), s + 1),
            F.element_at(F.col("codes"), s + 1).cast("int") + 1,
        ).cast("decimal(28,18)")
    adc = adc.cast("double")
    scored = (
        q.join(c, on="bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adc", adc)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("adc", 6).alias("adc"),
        )
    )


def embedding_quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    levels: int = 255,
) -> DataFrame:
    """Per-dimension affine int8 quantization of an embedding column
    — the standard 4× compression step before ANN indexing at scale
    (float32 → uint8 per dimension, global per-dim min/max affine
    map, the scalar-quantization baseline of the IVF/PQ family).

    Dataflow: (1) per-dim min/max via posexplode + groupBy(dim) —
    partial aggregation collapses each partition to d rows before the
    shuffle, so the exchange carries d·partitions tiny rows, never
    the corpus; (2) the d-row stats table is collected as BOUNDED
    model parameters (same contract as the IVF centroids,
    `ivf_topk`) and re-enters the plan as literal arrays; (3) the
    quantize itself is a map-side `transform` over the array —
    whole-stage codegen, zero shuffle, embarrassingly parallel.

    All arithmetic is double ((x−mn)·levels/(mx−mn), floored,
    clamped) so the DuckDB oracle reproduces it bit-for-bit;
    constant dimensions (mx == mn) quantize to 0.

    Both passes run as Arrow kernels — bit-exactness is free here
    because every operation is ELEMENTWISE double math (no
    accumulation order to preserve): per-dim min/max are
    order-invariant, and numpy replays (x−mn)·lv/(mx−mn), floor,
    clamp through the identical IEEE ops. The transform-HOF form
    (64 interpreted element_at fetches per row) measured 34 s at
    sf10's 200k vectors; the kernels run it in scan time.

    Returns (id_col, q_embedding array<int>).
    """
    import numpy as np
    import pyarrow as pa

    from pyspark.sql import types as T

    def _mat(col, n_rows):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten()
        if n_rows == 0 or len(flat) == 0:
            return np.zeros((n_rows, 0))
        return np.asarray(flat, dtype=np.float64).reshape(n_rows, -1)

    stats_schema = T.StructType(
        [
            T.StructField("d", T.IntegerType(), True),
            T.StructField("mn", T.DoubleType(), True),
            T.StructField("mx", T.DoubleType(), True),
        ]
    )

    def stats_kernel(batches):
        for b in batches:
            X = _mat(b.column(0), len(b))
            if not X.size:
                continue
            yield pa.record_batch(
                [
                    pa.array(
                        np.arange(X.shape[1], dtype=np.int32),
                        pa.int32(),
                    ),
                    pa.array(X.min(axis=0), pa.float64()),
                    pa.array(X.max(axis=0), pa.float64()),
                ],
                names=["d", "mn", "mx"],
            )

    stats_rows = (
        fan_out(df.select(F.col(vec_col).cast("array<double>")))
        .mapInArrow(stats_kernel, stats_schema)
        .groupBy("d")
        .agg(F.min("mn").alias("mn"), F.max("mx").alias("mx"))
        .collect()
    )
    stats = {r.d: (float(r.mn), float(r.mx)) for r in stats_rows}
    dim = len(stats)
    mn_v = np.array([stats[i][0] for i in range(dim)])
    mx_v = np.array([stats[i][1] for i in range(dim)])
    lv = float(levels)

    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type, True),
            T.StructField(
                "q_embedding", T.ArrayType(T.IntegerType(), True), True
            ),
        ]
    )

    def q_kernel(batches):
        const = mx_v == mn_v
        span = np.where(const, 1.0, mx_v - mn_v)
        for b in batches:
            n = len(b)
            X = _mat(b.column(1), n)
            scaled = (X - mn_v) * lv / span
            q = np.minimum(np.floor(scaled), lv)
            q = np.where(const, 0.0, q).astype(np.int32)
            offsets = pa.array(
                np.arange(0, (n + 1) * dim, dim, dtype=np.int32),
                pa.int32(),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(0),
                    pa.ListArray.from_arrays(
                        offsets, pa.array(q.reshape(-1), pa.int32())
                    ),
                ],
                names=[id_col, "q_embedding"],
            )

    return fan_out(df.select(id_col, vec_col)).mapInArrow(
        q_kernel, out_schema
    )


def binary_signature_bands(
    vec_col: str, dim: int = 64, band_bits: int = 16
) -> list[F.Column]:
    """Sign-bit binary quantization, banded: one integer per
    ``band_bits`` dimensions, bit j (MSB-first inside the band) set
    iff v[offset + j] > 0. 64 dims → four 16-bit ints; Hamming
    distance between two vectors is then Σ bit_count(xor(band pair))
    — pure int64 arithmetic, bit-identical on any engine. Sign-bit
    codes are the 1-bit extreme of the quantization family
    (Charikar's SimHash applied to the identity basis); Hamming
    distance approximates angular distance."""
    assert dim % band_bits == 0

    def band_fold(off: int) -> F.Column:
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(band_bits)),
            F.lit(0).cast("long"),
            lambda acc, i: acc * 2
            + F.when(
                F.element_at(F.col(vec_col), F.lit(off) + i) > 0, 1
            ).otherwise(0),
        )

    return [band_fold(b * band_bits) for b in range(dim // band_bits)]


def hamming_banded_topk(
    emb: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    dim: int = 64,
    band_bits: int = 16,
) -> DataFrame:
    """Approximate Hamming-space top-k over sign-bit codes with
    pigeonhole band blocking: a candidate must share at least ONE
    exact band with the query (any vector within Hamming distance
    n_bands-1 is guaranteed caught; farther ones usually are too).
    Candidates come from a (band_idx, band_val) equi-join — join
    degree is the band-bucket size, never the corpus — then exact
    integer Hamming re-ranks. The same blocking shape as
    dedup_simhash, applied to retrieval. At 100 TB the signature
    table is 4 ints/vector (32 bytes) — a 250× compression of the
    float64 corpus that fits the candidate join in memory."""
    n_bands = dim // band_bits
    sigs = binary_signature_bands(vec_col, dim, band_bits)

    def with_sigs(df: DataFrame, prefix: str, idc: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(idc),
            *[s.alias(f"{prefix}{i}") for i, s in enumerate(sigs)],
        )

    c = with_sigs(emb, "c", "neighbor_id")
    q = with_sigs(queries, "q", "query_id")
    c_bands = c.select(
        "neighbor_id",
        F.posexplode(
            F.array(*[F.col(f"c{i}") for i in range(n_bands)])
        ).alias("band_idx", "band_val"),
    )
    q_bands = F.broadcast(
        q.select(
            "query_id",
            F.posexplode(
                F.array(*[F.col(f"q{i}") for i in range(n_bands)])
            ).alias("band_idx", "band_val"),
        )
    )
    cand = (
        q_bands.join(c_bands, ["band_idx", "band_val"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = cand.join(c, "neighbor_id").join(F.broadcast(q), "query_id")
    ham = None
    for i in range(n_bands):
        term = F.bit_count(
            F.col(f"q{i}").bitwiseXOR(F.col(f"c{i}"))
        )
        ham = term if ham is None else ham + term
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("hamming", ham.cast("int"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "hamming")
    )


def hyperplane_buckets_arrow(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    planes: list[list[float]],
    id_name: str = "neighbor_id",
    vec_name: str = "cv",
) -> DataFrame:
    """Arrow-kernel twin of the corpus-side hyperplane bucketing —
    sf10 profiling put the WHOLE cost of ann_lsh_topk in the
    signature HOF fold (8.5 s of 7.8 s total over 200k vectors).

    BIT-EXACT to `hyperplane_signature`: the kernel replays the same
    left-to-right fold — acc = acc + double(v[j])·p[j], one
    vectorized IEEE-754 binary64 op per dimension — so for every
    vector the sign bits, and therefore the bucket, are identical
    to the Catalyst fold (parity test-pinned). Queries keep the HOF
    path (bounded rows) and join kernel buckets safely."""
    from pyspark.sql import types as T

    dim, n_planes = len(planes[0]), len(planes)
    out_schema = T.StructType(
        [
            T.StructField(id_name, T.LongType(), True),
            T.StructField(
                vec_name, T.ArrayType(T.FloatType(), True), True
            ),
            T.StructField("bucket", T.LongType(), True),
        ]
    )
    proj = fan_out(
        emb.select(
            F.col(id_col).cast("long").alias(id_name),
            F.col(vec_col).alias(vec_name),
        )
    )

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        pl = np.array(planes, dtype=np.float64)

        for b in batches:
            ids, vecs = b.column(0), b.column(1)
            if isinstance(vecs, pa.ChunkedArray):
                vecs = vecs.combine_chunks()
            n = len(vecs)
            flat = vecs.values
            offs = np.frombuffer(
                vecs.buffers()[1], dtype=np.int32
            )[vecs.offset : vecs.offset + n + 1]
            assert np.all(np.diff(offs) == dim), "ragged embedding"
            vals = np.frombuffer(flat.buffers()[1], dtype=np.float32)[
                flat.offset + offs[0] : flat.offset + offs[-1]
            ]
            m = vals.reshape(n, dim).astype(np.float64)
            buckets = np.zeros(n, dtype=np.int64)
            for i in range(n_planes):
                acc = np.zeros(n, dtype=np.float64)
                for j in range(dim):  # left-to-right, matches the fold
                    acc = acc + m[:, j] * pl[i, j]
                buckets += np.where(acc > 0, 1 << (n_planes - 1 - i), 0)
            yield pa.record_batch(
                [ids, vecs, pa.array(buckets, pa.int64())],
                names=[id_name, vec_name, "bucket"],
            )

    return proj.mapInArrow(kernel, out_schema)


def blocked_near_dup_pairs(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.45,
    n_clusters: int = 128,
    probes: int = 2,
) -> DataFrame:
    """Embedding-cosine near-dup PAIRS, cluster-blocked — the scale
    path for mid/low thresholds, where sign-band LSH degenerates:
    at cos ≥ 0.45 the per-bit collision probability is ~0.65, so
    bands must be short (4 bits) to keep recall, and short bands
    mean 2^4 buckets per band — candidate volume n²/16·bands
    (measured 470 s at sf1 for ~14k qualifying pairs). Blocking by
    coarse centroid (the SemDeDup Σ cluster² bound, multi-probe for
    boundary recall) keeps candidates ∝ n²·probes²/k regardless of
    threshold, and k is a free knob.

    Semantics (deterministic, oracle-reproducible): candidates =
    pairs sharing ≥1 of their top-`probes` centroids (centroids are
    the first `n_clusters` vectors by id — the same deterministic
    medoid stub as `semantic_dedup`; assignment ties break to the
    HIGHER centroid id); result = candidates with exact fold-cosine
    ≥ threshold. The per-cluster numpy/BLAS block only PREFILTERS
    (margin 1e-6, a superset of fold-qualifying pairs — BLAS and
    fold orderings differ by ~1 ulp); membership is decided by the
    same Catalyst fold the SQL oracle runs, so the pair set is
    bit-reproducible. Output: (id_a, id_b, cosine), id_a < id_b."""
    import numpy as np
    import pandas as pd

    from etl_covid19_spark.functions import vectors
    from etl_covid19_spark.operators.parallelism import fan_out

    cents = [
        (int(r["cid"]), [float(x) for x in r["cv"]])
        for r in emb.orderBy(id_col)
        .limit(n_clusters)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .collect()
    ]
    # centroid columns in cid-DESC order: a STABLE argsort on -cos
    # then resolves exact ties to the higher cid, matching the SQL
    # ROW_NUMBER(... ORDER BY cos DESC, cid DESC) tiebreak
    cents.sort(key=lambda t: -t[0])
    cent_mat = np.array([cv for _, cv in cents], dtype=np.float64)
    cent_norm = np.sqrt((cent_mat * cent_mat).sum(axis=1))
    cent_norm[cent_norm == 0] = 1.0
    cids = np.array([cid for cid, _ in cents], dtype=np.int64)
    n_probes = min(probes, len(cents))

    def _assign(batches):
        for pdf in batches:
            e = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            enorm = np.sqrt((e * e).sum(axis=1))
            enorm[enorm == 0] = 1.0
            cos = (e @ cent_mat.T) / np.outer(enorm, cent_norm)
            order = np.argsort(-cos, axis=1, kind="stable")
            ids = pdf[id_col].to_numpy()
            out_id, out_cid = [], []
            for p in range(n_probes):
                out_id.append(ids)
                out_cid.append(cids[order[:, p]])
            yield pd.DataFrame(
                {
                    "_id": np.concatenate(out_id),
                    "cluster_id": np.concatenate(out_cid),
                    "_v": pd.concat(
                        [pdf[vec_col]] * n_probes, ignore_index=True
                    ),
                }
            )

    assigned = fan_out(emb.select(F.col(id_col), F.col(vec_col))).mapInPandas(
        _assign, schema="_id bigint, cluster_id bigint, _v array<float>"
    )

    margin = threshold - 1e-6

    def _block(pdf: pd.DataFrame) -> pd.DataFrame:
        e = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        nrm = np.sqrt((e * e).sum(axis=1))
        nrm[nrm == 0] = 1.0
        u = e / nrm[:, None]
        sim = u @ u.T
        ids = pdf["_id"].to_numpy()
        ii, jj = np.where(sim >= margin)
        keep = ids[ii] < ids[jj]
        return pd.DataFrame(
            {"id_a": ids[ii][keep], "id_b": ids[jj][keep]}
        )

    cands = (
        assigned.groupBy("cluster_id")
        .applyInPandas(_block, schema="id_a bigint, id_b bigint")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    joined = cands.join(va, "id_a").join(vb, "id_b")
    # exact verify through the fold-order Arrow cosine (identical
    # IEEE sequence to vectors.cosine / the SQL oracle's reduce) —
    # the interpreted HOF fold per candidate pair was the dominant
    # remaining cost at sf1 once banding was kernelized
    return (
        cosine_pairs_fold_arrow(joined, "va", "vb")
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def hyperplane_near_dup_pairs(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.9,
    band_bits: int = 12,
    n_bands: int = 24,
    dim: int = 64,
) -> DataFrame:
    """TIGHT-threshold embedding near-dup pairs via hyperplane-sign
    LSH banding — the subquadratic scale path the low-threshold demo
    (`dedup.embedding_near_dup`) cannot be: at cos ≥ 0.9 the
    per-plane agreement probability is ~0.857, so 12-plane bands ×
    24 give recall ≈ 0.983 while a RANDOM pair collides in a band
    with probability 2⁻¹² — candidates ≈ 0.6% of all pairs,
    shrinking further as the threshold tightens (band_bits is the
    knob, and with planes rather than raw components it is not
    capped by the embedding dimension).

    Bit-exact bucketing: plane dots replay the Catalyst fold's
    left-to-right IEEE order inside the Arrow kernel (same contract
    as the ANN bucketing kernel), so the generated SQL oracle
    reproduces every band key; final membership is the exact
    fold-cosine ≥ threshold. Output: (id_a, id_b, cosine)."""
    import numpy as np

    from pyspark.sql import types as T

    from etl_covid19_spark.functions import vectors
    from etl_covid19_spark.operators.parallelism import fan_out

    planes = make_planes(dim, band_bits * n_bands)
    # the kernel emits the float64 vector it already materialized for
    # the plane dots: re-attaching vectors via a doc-equi-join with a
    # second emb scan cost TWO extra Exchanges (signatures and corpus
    # both shuffled by doc) before the band_key shuffle — the join
    # existed only to carry `_v` to verification, and float32→float64
    # widening is exact, so emitting it here is byte-identical input
    # to the verify kernel with one less shuffle round (guide §2.4)
    out_schema = T.StructType(
        [
            T.StructField("doc", T.LongType(), True),
            T.StructField(
                "band_keys", T.ArrayType(T.LongType(), True), True
            ),
            T.StructField(
                "_v", T.ArrayType(T.DoubleType(), True), True
            ),
        ]
    )
    proj = fan_out(
        emb.select(
            F.col(id_col).cast("long").alias("doc"),
            F.col(vec_col).alias("_v"),
        )
    )

    def kernel(batches):
        import pyarrow as pa

        pl = np.array(planes, dtype=np.float64)
        for b in batches:
            ids, vecs = b.column(0), b.column(1)
            if isinstance(vecs, pa.ChunkedArray):
                vecs = vecs.combine_chunks()
            n = len(vecs)
            flat = vecs.values
            offs = np.frombuffer(vecs.buffers()[1], dtype=np.int32)[
                vecs.offset : vecs.offset + n + 1
            ]
            ids_np = ids.to_numpy(zero_copy_only=False)
            # NULL/ragged guard (round-11 ADVICE): the values buffer
            # holds undefined garbage under element-level NULLs, and
            # a NULL or off-width slot misaligns the rectangular
            # reshape. Such a vector can never reach the cosine
            # threshold (HOF cosine over a NULL element is NULL, a
            # width outlier zip_with-pads to NULL), so those rows are
            # dropped HERE — before banding — which is pair-for-pair
            # identical to the old verify-guard drop, with the raw
            # buffer fast path untouched for clean (bench) corpora.
            widths = np.diff(offs)
            keep = widths == dim
            if vecs.null_count:
                keep &= vecs.is_valid().to_numpy(zero_copy_only=False)
            if flat.null_count:
                en = flat.is_null().to_numpy(zero_copy_only=False)
                cs = np.r_[0, np.cumsum(en)]
                keep &= cs[offs[1:]] == cs[offs[:-1]]
            if not keep.all():
                vals_all = np.frombuffer(
                    flat.buffers()[1], dtype=np.float32
                )
                idx = (
                    flat.offset
                    + offs[:-1][keep][:, None]
                    + np.arange(dim)[None, :]
                )
                m = vals_all[idx].astype(np.float64)
                ids_np = ids_np[keep]
                n = len(ids_np)
                if n == 0:
                    continue
            else:
                vals = np.frombuffer(
                    flat.buffers()[1], dtype=np.float32
                )[flat.offset + offs[0] : flat.offset + offs[-1]]
                m = vals.reshape(n, dim).astype(np.float64)
            # ALL plane dots at once, still in left-to-right fold
            # order per (row, plane): one (n, planes) accumulator
            # advanced dim-by-dim — each plane's partial sum sees
            # the identical IEEE op sequence as the scalar fold,
            # with dim outer iterations instead of the original
            # bands*bits*dim small-op loop (288x fewer numpy calls)
            n_planes = n_bands * band_bits
            acc = np.zeros((n, n_planes), dtype=np.float64)
            for d in range(dim):
                acc += m[:, d : d + 1] * pl[None, :, d]
            bits = (acc > 0).reshape(n, n_bands, band_bits)
            weights = (
                np.int64(1) << np.arange(band_bits - 1, -1, -1)
            ).astype(np.int64)
            packed = (bits * weights[None, None, :]).sum(
                axis=2, dtype=np.int64
            )
            keys = (
                np.arange(n_bands, dtype=np.int64)[None, :]
                * (1 << band_bits)
                + packed
            )
            v_offs = np.arange(
                0, (n + 1) * dim, dim, dtype=np.int32
            )
            v_arr = pa.ListArray.from_arrays(
                pa.array(v_offs, pa.int32()),
                pa.array(m.ravel(), pa.float64()),
            )
            yield pa.record_batch(
                [
                    pa.array(ids_np, pa.int64()),
                    pa.array(list(keys), pa.list_(pa.int64())),
                    v_arr,
                ],
                names=["doc", "band_keys", "_v"],
            )

    # Per-BUCKET verification (the knn_graph execution shape): the
    # candidate pair set on an isotropic corpus floors at ~2⁻¹²·n²
    # (116M pairs at sf10's 200k vectors), so joining two 64-float
    # vectors onto every candidate shuffles ~120 GB and never
    # finishes; instead the vector rides ONCE per band key
    # (n_bands·n rows) and each bucket verifies its own pairs in
    # numpy — BLAS prefilter at threshold−1e-6 (a superset: BLAS
    # and fold orders differ ~1e-15), fold-exact cosine recompute
    # on survivors, global dedup on the identical exact values.
    # Same semantics and oracle: share ≥1 band AND exact fold
    # cosine ≥ threshold.
    banded = proj.mapInArrow(kernel, out_schema).select(
        "doc", "_v", F.explode("band_keys").alias("band_key")
    )
    margin = threshold - 1e-6
    pair_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType(), False),
            T.StructField("id_b", T.LongType(), False),
            T.StructField("cosine", T.DoubleType(), False),
        ]
    )

    def verify_kernel(batches):
        import pyarrow as pa

        tabs = list(batches)
        if not tabs:
            return
        tbl = pa.Table.from_batches(tabs)
        if tbl.num_rows == 0:
            return
        ids_all = tbl["doc"].to_numpy(zero_copy_only=False)
        keys_all = tbl["band_key"].to_numpy(zero_copy_only=False)
        vecs = tbl["_v"].combine_chunks()
        flat = vecs.flatten()
        # reshape guard (same trap as cosine_pairs_fold_arrow): a
        # NULL or ragged slot silently shifts every later row. NULL
        # vectors can never reach the cosine threshold (HOF cosine
        # is NULL), and a width-outlier pairs NULL against the
        # modal-width corpus (zip_with pads) — both are dropped
        # before the rectangular fast path.
        widths = np.diff(vecs.offsets.to_numpy())
        if vecs.null_count or flat.null_count or (
            len(widths) and (widths != widths.max()).any()
        ):
            valid = vecs.is_valid().to_numpy(zero_copy_only=False)
            dim_mode = int(widths[valid].max(initial=0))
            rows = vecs.to_pylist()
            keep_rows = np.array(
                [
                    v is not None
                    and len(v) == dim_mode
                    and all(e is not None for e in v)
                    for v in rows
                ],
                dtype=bool,
            )
            ids_all = ids_all[keep_rows]
            keys_all = keys_all[keep_rows]
            V = np.array(
                [rows[i] for i in np.flatnonzero(keep_rows)],
                dtype=np.float64,
            ).reshape(len(ids_all), dim_mode)
            if not len(ids_all):
                return
        else:
            V = np.asarray(flat, dtype=np.float64).reshape(
                len(ids_all), -1
            )
        order = np.lexsort((ids_all, keys_all))
        ids_all, keys_all, V = ids_all[order], keys_all[order], V[order]
        starts = np.flatnonzero(
            np.r_[True, keys_all[1:] != keys_all[:-1]]
        )
        ends = np.r_[starts[1:], len(keys_all)]
        oa: list[np.ndarray] = []
        ob: list[np.ndarray] = []
        oc: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            ids = ids_all[s:e]
            X = V[s:e]
            nrm = np.sqrt((X * X).sum(axis=1))
            safe = np.where(nrm > 0, nrm, 1.0)
            Xn = X / safe[:, None]
            # row-chunked prefilter: a pathologically skewed bucket
            # (near-constant sign pattern) cannot allocate an m×m
            # matrix bigger than chunk×m
            ii_parts, jj_parts = [], []
            chunk = 4096
            for c0 in range(0, m, chunk):
                S = Xn[c0 : c0 + chunk] @ Xn.T
                ci, cj = np.where(S >= margin)
                ci = ci + c0
                k2 = ci < cj
                ii_parts.append(ci[k2])
                jj_parts.append(cj[k2])
            ii = np.concatenate(ii_parts)
            jj = np.concatenate(jj_parts)
            if not len(ii):
                continue
            A, B = X[ii], X[jj]
            dim = X.shape[1]
            dot = np.zeros(len(ii))
            na = np.zeros(len(ii))
            nb = np.zeros(len(ii))
            for d in range(dim):
                dot += A[:, d] * B[:, d]
                na += A[:, d] * A[:, d]
                nb += B[:, d] * B[:, d]
            denom = np.sqrt(na) * np.sqrt(nb)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(denom == 0, 0.0, dot / denom)
            ok = cos >= threshold
            if ok.any():
                oa.append(ids[ii[ok]])
                ob.append(ids[jj[ok]])
                oc.append(cos[ok])
        if oa:
            yield pa.record_batch(
                [
                    pa.array(np.concatenate(oa), pa.int64()),
                    pa.array(np.concatenate(ob), pa.int64()),
                    pa.array(np.concatenate(oc), pa.float64()),
                ],
                names=["id_a", "id_b", "cosine"],
            )

    return (
        banded.repartition("band_key")
        .mapInArrow(verify_kernel, pair_schema)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "cosine")
    )


def cosine_pairs_fold_arrow(
    pairs: DataFrame, va_col: str, vb_col: str
) -> DataFrame:
    """Append an exact fold-order `cosine` column to a pair frame
    carrying two embedding columns, via one `mapInArrow` kernel.

    BIT-EXACT with `vectors.cosine` (and therefore with the ANSI
    `list_reduce` oracles): the dot and both norms accumulate
    dim-by-dim, left-to-right — `acc += x_d * y_d` over a whole
    batch column advances every row's partial sum through the
    identical IEEE op sequence as the scalar fold; zero-norm pairs
    yield 0.0 (the HOF's when-guard). Use this wherever candidate
    verification would otherwise run the CodegenFallback HOF per
    pair — the Catalyst expression stays as the parity cross-check
    (tests pin value equality on random vectors incl. zero-norm)."""
    import numpy as np

    from pyspark.sql import types as T

    keep = [c for c in pairs.columns if c not in (va_col, vb_col)]
    out_schema = T.StructType(
        [pairs.schema[c] for c in keep]
        + [T.StructField("cosine", T.DoubleType(), True)]
    )
    n_keep = len(keep)
    proj = pairs.select(
        *keep,
        F.col(va_col).cast("array<double>").alias(va_col),
        F.col(vb_col).cast("array<double>").alias(vb_col),
    )

    def kernel(batches):
        import pyarrow as pa

        def mat(col, n_rows):
            """(X, regular) — X only when the column is NULL-free and
            rectangular; regular=False routes the batch to the
            null-aware per-row fold. A single NULL list slot would
            otherwise survive ``flatten()`` silently (the flat length
            shrinks, ``len(flat)//n_rows`` picks a wrong width, and
            the reshape misaligns EVERY row) — guarded like
            ``bucket_topk``: validity + equal offsets-widths checked
            before the zero-copy reshape."""
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flat = col.flatten()  # honors list offsets on sliced batches
            if n_rows == 0:
                return np.zeros((0, 0)), True
            widths = np.diff(col.offsets.to_numpy())
            if (
                col.null_count == 0
                and flat.null_count == 0
                and (widths == widths[0]).all()
            ):
                return (
                    np.asarray(flat, dtype=np.float64).reshape(
                        n_rows, widths[0]
                    ),
                    True,
                )
            return col, False

        def row_fold(a, b):
            """Sequential per-row fold, bit-identical to
            `vectors.cosine` incl. its NULL algebra: NULL vector,
            length mismatch (zip_with pads with NULL), or NULL
            element all yield NULL; zero-norm yields 0.0."""
            if a is None or b is None or len(a) != len(b):
                return None
            dot = na = nb = 0.0
            for x, y in zip(a, b):
                if x is None or y is None:
                    return None
                dot += x * y
                na += x * x
                nb += y * y
            denom = (na**0.5) * (nb**0.5)
            return 0.0 if denom == 0 else dot / denom

        for b in batches:
            n = len(b)
            A, a_ok = mat(b.column(n_keep), n)
            B, b_ok = mat(b.column(n_keep + 1), n)
            if a_ok and b_ok and A.shape[1] == B.shape[1]:
                dim = A.shape[1]
                dot = np.zeros(n)
                na = np.zeros(n)
                nb = np.zeros(n)
                for d in range(dim):
                    dot += A[:, d] * B[:, d]
                    na += A[:, d] * A[:, d]
                    nb += B[:, d] * B[:, d]
                denom = np.sqrt(na) * np.sqrt(nb)
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.where(denom == 0, 0.0, dot / denom)
                cos_arr = pa.array(cos, pa.float64())
            else:
                al = A.to_pylist() if not a_ok else [list(r) for r in A]
                bl = B.to_pylist() if not b_ok else [list(r) for r in B]
                cos_arr = pa.array(
                    [row_fold(a, v) for a, v in zip(al, bl)],
                    pa.float64(),
                )
            yield pa.record_batch(
                [b.column(i) for i in range(n_keep)] + [cos_arr],
                names=keep + ["cosine"],
            )

    return proj.mapInArrow(kernel, out_schema)
