"""Model-based curation operators: hashed linear classifier, unigram
LM perplexity (operators/curation.py), SemDeDup semantic dedup and
IVF-PQ ANN (operators/similarity.py additions)."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_covid19_spark.operators import curation as cur
from etl_covid19_spark.operators.similarity import (
    brute_force_topk,
    ivf_pq_topk,
    semantic_dedup,
)

SF = "/root/testdata/sf0.001"


def _sigmoid(z: float) -> float:
    return 1.0 / (1.0 + math.exp(-z))


class TestQualityClassifier:
    def test_score_matches_reference_formula(self, spark):
        w = cur.make_classifier_weights()
        doc = "hello world hello"
        df = spark.createDataFrame([Row(text=doc)])
        got = df.select(
            F.round(cur.classifier_score("text"), 9).alias("s")
        ).first()["s"]

        def bucket(t):
            return (ord(t[0]) * 1000 + len(t)) % 64

        toks = doc.split()
        feats = [bucket(t) for t in toks]
        feats += [
            (bucket(toks[i]) * 31 + bucket(toks[i + 1])) % 64
            for i in range(len(toks) - 1)
        ]
        expected = _sigmoid(0.25 + sum(w[f] for f in feats) / len(feats))
        assert got == pytest.approx(expected, abs=1e-9)

    def test_empty_doc_scores_bias_sigmoid(self, spark):
        df = spark.createDataFrame([Row(text="")])
        got = df.select(cur.classifier_score("text").alias("s")).first()["s"]
        assert got == pytest.approx(_sigmoid(0.25), abs=1e-12)

    def test_single_token_has_no_bigrams(self, spark):
        df = spark.createDataFrame([Row(text="solo")])
        n = df.select(
            F.size(cur.classifier_features("text")).alias("n")
        ).first()["n"]
        assert n == 1

    def test_deterministic_weights(self):
        assert cur.make_classifier_weights() == cur.make_classifier_weights()
        assert all(-1.0 <= x < 1.0 for x in cur.make_classifier_weights())


class TestUnigramPerplexity:
    def test_closed_form_two_doc_corpus(self, spark):
        # corpus: d1 = "a a a", d2 = "a b"  → counts a:4, b:1
        # N=5, V=2, α=0.5 → p(a)=4.5/6, p(b)=1.5/6
        df = spark.createDataFrame(
            [Row(doc_id=1, text="a a a"), Row(doc_id=2, text="a b")]
        )
        out = {
            r["doc_id"]: r
            for r in cur.unigram_perplexity(df, "text", "doc_id").collect()
        }
        pa, pb = 4.5 / 6.0, 1.5 / 6.0
        ce1 = -math.log(pa)
        ce2 = (-math.log(pa) - math.log(pb)) / 2.0
        assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 2
        assert out[1]["cross_entropy"] == pytest.approx(ce1, abs=1e-6)
        assert out[2]["cross_entropy"] == pytest.approx(ce2, abs=1e-6)
        assert out[2]["perplexity"] == pytest.approx(math.exp(ce2), abs=1e-5)

    def test_common_token_doc_scores_lower(self, spark):
        # A doc of corpus-frequent tokens must be less perplexing
        # than a doc of hapaxes — the CCNet filter's discriminant.
        rows = [Row(doc_id=i, text="the the the the") for i in range(5)]
        rows.append(Row(doc_id=99, text="zyx qwv jkl mnop"))
        df = spark.createDataFrame(rows)
        out = {
            r["doc_id"]: r["perplexity"]
            for r in cur.unigram_perplexity(df, "text", "doc_id").collect()
        }
        assert out[0] < out[99]

    def test_all_docs_scored(self, spark):
        from etl_covid19_spark.sources.catalog import load_table

        docs = load_table(spark, "documents", SF)
        out = cur.unigram_perplexity(docs, "text", "doc_id")
        assert out.count() == docs.count()


class TestDsirImportance:
    def test_target_docs_score_higher(self, spark):
        # Target-domain docs must average a higher log-importance
        # than off-target docs — DSIR's selection discriminant.
        rows = [Row(doc_id=i, lang="en", text="the cat sat on the mat")
                for i in range(10)]
        rows += [Row(doc_id=100 + i, lang="de", text="zzz qqq www vvv kkk")
                 for i in range(10)]
        df = spark.createDataFrame(rows)
        out = cur.dsir_importance(
            df, "text", "doc_id", target=F.col("lang") == "en",
            keep_cols=("lang",),
        ).collect()
        en = [r["log_importance"] for r in out if r["lang"] == "en"]
        de = [r["log_importance"] for r in out if r["lang"] == "de"]
        assert min(en) > max(de)

    def test_uniform_target_scores_near_zero(self, spark):
        # If the target IS the corpus, p_target ≈ p_raw and every
        # importance weight collapses to ~0.
        rows = [Row(doc_id=i, text="alpha beta gamma") for i in range(6)]
        out = cur.dsir_importance(
            spark.createDataFrame(rows), "text", "doc_id",
            target=F.lit(True),
        ).collect()
        assert all(abs(r["log_importance"]) < 1e-6 for r in out)


class TestBigramPerplexity:
    def test_sequence_aware(self, spark):
        # Same unigram mix, different order: the doc whose BIGRAMS
        # match the corpus must score lower perplexity — the signal
        # the unigram model cannot see.
        rows = [Row(doc_id=i, text="a b c d") for i in range(10)]
        rows.append(Row(doc_id=100, text="d c b a"))
        df = spark.createDataFrame(rows)
        out = {
            r["doc_id"]: r["perplexity"]
            for r in cur.bigram_perplexity(df, "text", "doc_id").collect()
        }
        assert out[0] < out[100]
        uni = {
            r["doc_id"]: r["perplexity"]
            for r in cur.unigram_perplexity(df, "text", "doc_id").collect()
        }
        assert uni[0] == uni[100]  # unigram model is order-blind

    def test_single_token_doc_scores_unigram_only(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="solo"), Row(doc_id=2, text="solo solo")]
        )
        out = cur.bigram_perplexity(df, "text", "doc_id").collect()
        assert {r["doc_id"] for r in out} == {1, 2}
        one = next(r for r in out if r["doc_id"] == 1)
        assert one["n_tokens"] == 1 and one["perplexity"] > 0


class TestGopherFilter:
    def _run(self, spark, texts):
        from etl_covid19_spark.queries import REGISTRY
        import tempfile, os

        df = spark.createDataFrame(
            [Row(doc_id=i, text=t, lang="en", source="s",
                 n_chars=len(t)) for i, t in enumerate(texts)]
        )
        tmp = tempfile.mkdtemp()
        df.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        return {
            r["doc_id"]: r
            for r in REGISTRY["gopher_quality_filter"].fn(spark, tmp).collect()
        }

    def test_rule_boundaries(self, spark):
        good = " ".join(["the", "cat", "and", "dog", "ran"] * 10)  # 50 toks
        short = " ".join(["the", "and", "word"] * 5)               # 15 toks
        symbols = " ".join(["the", "and"] + ["###"] * 48)          # symbol-heavy
        nostop = " ".join(["zebra", "quartz", "vortex", "nymph"] * 13)
        out = self._run(spark, [good, short, symbols, nostop])
        assert out[0]["pass"] is True
        assert out[0]["n_tokens"] == 50
        assert out[1]["pass"] is False          # word count < 50
        assert out[2]["pass"] is False          # symbol ratio > 0.1
        assert out[2]["symbol_ratio"] > 0.1
        assert out[3]["pass"] is False          # < 2 stop words
        assert out[3]["n_stop_distinct"] == 0


class TestSemanticDedup:
    def test_planted_near_duplicates_pruned(self, spark):
        rows = [
            Row(vec_id=0, embedding=[1.0, 0.0, 0.0, 0.0]),
            Row(vec_id=1, embedding=[0.0, 1.0, 0.0, 0.0]),
            Row(vec_id=2, embedding=[0.99, 0.10, 0.0, 0.0]),
            Row(vec_id=3, embedding=[0.98, 0.12, 0.0, 0.0]),
            Row(vec_id=4, embedding=[0.0, 0.60, 0.80, 0.0]),
        ]
        df = spark.createDataFrame(rows)
        out = semantic_dedup(
            df, "embedding", "vec_id", n_clusters=2, threshold=0.9
        )
        kept = {r["vec_id"] for r in out.collect() if r["keep"]}
        assert kept == {0, 1, 4}
        assert out.count() == 5  # one row per input vector

    def test_no_duplicates_keeps_everything(self, spark):
        rows = [
            Row(vec_id=0, embedding=[1.0, 0.0, 0.0, 0.0]),
            Row(vec_id=1, embedding=[0.0, 1.0, 0.0, 0.0]),
            Row(vec_id=2, embedding=[0.0, 0.0, 1.0, 0.0]),
        ]
        out = semantic_dedup(
            spark.createDataFrame(rows), "embedding", "vec_id",
            n_clusters=2, threshold=0.99,
        )
        assert all(r["keep"] for r in out.collect())

    def test_sf_corpus_prunes_but_keeps_majority(self, spark):
        from etl_covid19_spark.sources.catalog import load_table

        emb = load_table(spark, "embeddings", SF)
        out = semantic_dedup(emb, "embedding", "vec_id").collect()
        kept = sum(1 for r in out if r["keep"])
        assert len(out) == 500
        assert 400 <= kept < 500  # prunes something, not everything


class TestImagePhash:
    def test_planted_duplicates_found(self, spark):
        from etl_covid19_spark.queries import REGISTRY

        rows = REGISTRY["image_phash_dedup"].fn(spark, SF).collect()
        pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}
        # exact pixel copies (ids 16..19 duplicate 0..3): hamming 0
        for i in range(4):
            assert pairs.get((i, 16 + i)) == 0
        # the brightened-corner copy of image 1 (id 21) has DIFFERENT
        # bytes but survives the perceptual hash at small hamming —
        # the pair byte-level dedup cannot see
        assert (1, 21) in pairs and 0 < pairs[(1, 21)] <= 3

    def test_bands_are_16bit(self, spark):
        import numpy as np

        from etl_covid19_spark.functions import media as M
        from etl_covid19_spark.operators.multimodal import image_ahash_bands
        from pyspark.sql import Row as R

        y, x, c = np.meshgrid(
            np.arange(8), np.arange(8), np.arange(3), indexing="ij"
        )
        arr = ((x * 11 + y * 3 + c * 7) % 256).astype(np.uint8)
        df = spark.createDataFrame(
            [R(doc_id=0, payload=bytearray(M.encode_png(arr)))]
        )
        bands = image_ahash_bands(df, "doc_id", "payload").first()["bands"]
        assert len(bands) == 4
        assert all(0 <= b <= 0xFFFF for b in bands)


class TestAudioFingerprint:
    def test_planted_duplicates_found(self, spark):
        from etl_covid19_spark.queries import REGISTRY

        rows = REGISTRY["audio_fingerprint_dedup"].fn(spark, SF).collect()
        pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}
        # exact copies (10..12 duplicate 0..2): hamming 0
        for i in range(3):
            assert pairs.get((i, 10 + i)) == 0
        # the amplified-intro copy of clip 2 (id 15): different bytes,
        # fingerprint within threshold
        assert (2, 15) in pairs and pairs[(2, 15)] <= 3


class TestIvfPq:
    def _recall(self, spark, n_probe):
        from etl_covid19_spark.sources.catalog import load_table

        emb = load_table(spark, "embeddings", SF)
        queries = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 16))
        exact = brute_force_topk(emb, queries, "embedding", "vec_id", k=10)
        approx = ivf_pq_topk(
            emb, queries, "embedding", "vec_id", k=10, n_probe=n_probe
        )
        e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
        a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
        return len(e & a) / len(e)

    def test_codes_bounded_and_rank_contract(self, spark):
        from etl_covid19_spark.sources.catalog import load_table

        emb = load_table(spark, "embeddings", SF)
        queries = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 16))
        out = ivf_pq_topk(emb, queries, "embedding", "vec_id", k=10)
        rows = out.collect()
        assert {r["query_id"] for r in rows} == set(range(8, 16))
        for qid in range(8, 16):
            ranks = sorted(r["rank"] for r in rows if r["query_id"] == qid)
            assert ranks == list(range(1, len(ranks) + 1))
            adcs = [
                r["adc"]
                for r in sorted(
                    (r for r in rows if r["query_id"] == qid),
                    key=lambda r: r["rank"],
                )
            ]
            assert adcs == sorted(adcs)  # ADC ascending with rank

    def test_nested_literal_exprs_bit_identical(self, spark):
        """The query-side distance table and coarse-probe scores are
        assembled as ONE nested-literal lambda expression (driver
        analysis stays O(model size), not O(m·ks) machinery copies).
        Pin: bit-for-bit equal to the straightforward per-cell
        expansion they replaced."""
        import struct

        from etl_covid19_spark.sources.catalog import load_table

        m, ks, dim, n_centroids = 8, 16, 64, 8
        sub = dim // m
        emb = load_table(spark, "embeddings", SF)
        seed_rows = sorted(
            emb.orderBy("vec_id")
            .limit(max(ks, n_centroids))
            .select(F.col("vec_id").alias("j"), F.col("embedding").alias("v"))
            .collect(),
            key=lambda r: int(r["j"]),
        )
        cents = [
            (int(r["j"]), [float(x) for x in r["v"]])
            for r in seed_rows[:n_centroids]
        ]
        cb = {
            s: [
                [float(r["v"][s * sub + t]) for t in range(sub)]
                for r in seed_rows[:ks]
            ]
            for s in range(m)
        }

        def _dlit(x):
            return f"CAST('{x!r}' AS DOUBLE)"

        def _darr(vals):
            return "array(" + ",".join(_dlit(v) for v in vals) + ")"

        def _l2sq(vec_expr, lits):
            return (
                f"aggregate(zip_with({vec_expr}, {_darr(lits)}, "
                "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
                "CAST(0.0 AS DOUBLE), (acc, d) -> acc + d)"
            )

        def _cos(vec_expr, lits):
            dot = (
                f"aggregate(zip_with({vec_expr}, {_darr(lits)}, "
                "(x, y) -> CAST(x AS DOUBLE) * y), "
                "CAST(0.0 AS DOUBLE), (acc, p) -> acc + p)"
            )
            nv = (
                f"sqrt(aggregate({vec_expr}, CAST(0.0 AS DOUBLE), "
                "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
            )
            nc = (
                f"sqrt(aggregate({_darr(lits)}, CAST(0.0 AS DOUBLE), "
                "(acc, x) -> acc + x * x))"
            )
            return (
                f"CASE WHEN {nv} * {nc} = CAST(0.0 AS DOUBLE) "
                f"THEN CAST(0.0 AS DOUBLE) ELSE {dot} / ({nv} * {nc}) END"
            )

        # the per-cell expansions the nested forms replaced
        old_dtab = "array(" + ",".join(
            "array("
            + ",".join(
                _l2sq(f"slice(`embedding`, {s * sub + 1}, {sub})", cv)
                for cv in cb[s]
            )
            + ")"
            for s in range(m)
        ) + ")"
        old_coarse = "array(" + ",".join(
            f"named_struct('cos', {_cos('`embedding`', cv)}, 'cid', {cid})"
            for cid, cv in cents
        ) + ")"

        # the nested-literal forms ivf_pq_topk now builds
        cb3d = "array(" + ",".join(
            "array(" + ",".join(_darr(cv) for cv in cb[s]) + ")"
            for s in range(m)
        ) + ")"
        new_dtab = (
            f"zip_with({cb3d}, sequence(0, {m - 1}), (cbs, s) -> "
            "transform(cbs, cv -> "
            f"aggregate(zip_with(slice(`embedding`, s * {sub} + 1, {sub}), cv, "
            "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
            "CAST(0.0 AS DOUBLE), (acc, d) -> acc + d)))"
        )
        cents_lit = "array(" + ",".join(
            f"named_struct('cid', {cid}, 'cv', {_darr(cv)})"
            for cid, cv in cents
        ) + ")"
        dot = (
            "aggregate(zip_with(`embedding`, c.cv, "
            "(x, y) -> CAST(x AS DOUBLE) * y), "
            "CAST(0.0 AS DOUBLE), (acc, p) -> acc + p)"
        )
        nv = (
            "sqrt(aggregate(`embedding`, CAST(0.0 AS DOUBLE), "
            "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
        )
        nc = (
            "sqrt(aggregate(c.cv, CAST(0.0 AS DOUBLE), "
            "(acc, x) -> acc + x * x))"
        )
        new_coarse = (
            f"transform({cents_lit}, c -> named_struct("
            f"'cos', CASE WHEN {nv} * {nc} = CAST(0.0 AS DOUBLE) "
            f"THEN CAST(0.0 AS DOUBLE) ELSE {dot} / ({nv} * {nc}) END, "
            "'cid', c.cid))"
        )

        q = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 16))

        def pack(rows, col, structs=False):
            out = []
            for r in sorted(rows, key=lambda r: r["vec_id"]):
                v = r[col]
                if structs:
                    out.append(
                        tuple(
                            (struct.pack(">d", s["cos"]), s["cid"]) for s in v
                        )
                    )
                else:
                    out.append(
                        tuple(
                            tuple(struct.pack(">d", x) for x in row)
                            for row in v
                        )
                    )
            return out

        for old, new, structs in [
            (old_dtab, new_dtab, False),
            (old_coarse, new_coarse, True),
        ]:
            a = q.select("vec_id", F.expr(old).alias("e")).collect()
            b = q.select("vec_id", F.expr(new).alias("e")).collect()
            assert pack(a, "e", structs) == pack(b, "e", structs)

    def test_recall_beats_random_baseline(self, spark):
        # PQ on ISOTROPIC synthetic vectors is the worst case (16
        # codewords per 8-dim subspace carries little signal), so the
        # pin is modest — but random top-10 would score 10/499 ≈ 0.02,
        # and measured recall@10 is ~0.34 at n_probe=2 / ~0.33 at full
        # probe (not monotone in probes: a larger candidate pool also
        # lets quantization noise promote far vectors). Clustered
        # real-model embeddings recover the usual high-recall regime
        # via the coarse router, as `ivf_topk_trained`'s planted-
        # cluster test shows.
        assert self._recall(spark, n_probe=2) >= 0.2
        assert self._recall(spark, n_probe=8) >= 0.2


class TestRandomizedCuration:
    """Seeded random corpora vs pure-Python references — catches the
    edges the fixed corpus lacks (empty/whitespace docs, unicode
    first chars, heavy repetition)."""

    WORDS = ["the", "cat", "é-word", "ζeta", "42", "a", "longish-token",
             "x!", "..", "of"]

    def _random_docs(self, seed, n=40):
        import numpy as np

        rng = np.random.default_rng(seed)
        docs = []
        for i in range(n):
            k = int(rng.integers(0, 12))
            if k == 0:
                t = "" if rng.random() < 0.5 else "   "
            else:
                t = " ".join(rng.choice(self.WORDS) for _ in range(k))
            docs.append((i, t))
        return docs

    def test_classifier_matches_python_reference(self, spark):
        import math

        w = cur.make_classifier_weights()

        def ref(textv):
            toks = textv.split()
            b = [(ord(t[0]) * 1000 + len(t)) % 64 for t in toks]
            feats = b + [(b[i] * 31 + b[i + 1]) % 64
                         for i in range(len(b) - 1)]
            mean = sum(w[f] for f in feats) / len(feats) if feats else 0.0
            return 1.0 / (1.0 + math.exp(-(0.25 + mean)))

        docs = self._random_docs(7)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: r["s"]
            for r in df.select(
                "doc_id", cur.classifier_score("text").alias("s")
            ).collect()
        }
        for i, t in docs:
            assert got[i] == pytest.approx(ref(t), abs=1e-9), (i, t)

    def test_unigram_perplexity_matches_python_reference(self, spark):
        import math
        from collections import Counter

        docs = self._random_docs(11)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = {
            r["doc_id"]: r
            for r in cur.unigram_perplexity(df, "text", "doc_id").collect()
        }
        counts = Counter(w for _, t in docs for w in t.split())
        N, V = sum(counts.values()), len(counts)
        for i, t in docs:
            toks = t.split()
            if not toks:
                assert i not in out
                continue
            ce = sum(
                -math.log((counts[w] + 0.5) / (N + 0.5 * V)) for w in toks
            ) / len(toks)
            assert out[i]["cross_entropy"] == pytest.approx(ce, abs=1e-5)
            assert out[i]["perplexity"] == pytest.approx(
                math.exp(ce), rel=1e-5
            )

    def test_bigram_perplexity_matches_python_reference(self, spark):
        import math
        from collections import Counter

        docs = self._random_docs(13)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = {
            r["doc_id"]: r
            for r in cur.bigram_perplexity(df, "text", "doc_id").collect()
        }
        c1 = Counter(w for _, t in docs for w in t.split())
        c2 = Counter(
            (ts[i], ts[i + 1])
            for _, t in docs
            for ts in [t.split()]
            for i in range(len(ts) - 1)
        )
        ctx = Counter()
        for (w1, _), n in c2.items():
            ctx[w1] += n
        N, V = sum(c1.values()), len(c1)
        lam = 0.7
        for i, t in docs:
            ts = t.split()
            if not ts:
                assert i not in out
                continue
            nll = -math.log((c1[ts[0]] + 0.5) / (N + 0.5 * V))
            for j in range(1, len(ts)):
                pb = (c2[(ts[j - 1], ts[j])] + 0.5) / (ctx[ts[j - 1]] + 0.5 * V)
                pu = (c1[ts[j]] + 0.5) / (N + 0.5 * V)
                nll += -math.log(lam * pb + (1.0 - lam) * pu)
            ce = nll / len(ts)
            assert out[i]["cross_entropy"] == pytest.approx(ce, abs=1e-5), (i, t)


class TestRepetitionKernelParity:
    def test_kernel_matches_catalyst_fold(self, spark):
        # The Arrow kernel (registered scale path) and the Catalyst
        # sorted-array fold must agree exactly — including tie-breaks
        # and edge docs (empty / single-token / all-same).
        import numpy as np

        from etl_covid19_spark.functions import text as T

        rng = np.random.default_rng(3)
        words = ["a", "b", "cc", "ddd", "e!"]
        rows = [(0, ""), (1, "x"), (2, "w w w w"), (3, "a b a b a")]
        for i in range(4, 40):
            k = int(rng.integers(0, 30))
            rows.append((i, " ".join(rng.choice(words) for _ in range(k))))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        t2, t3 = T.top_ngram_stats("text", 2), T.top_ngram_stats("text", 3)
        fold = {
            r["doc_id"]: tuple(r)[1:]
            for r in df.select(
                "doc_id",
                T.dup_token_fraction("text").alias("dup_token_frac"),
                t2["gram"].alias("top_bigram"),
                t2["n"].alias("top_bigram_n"),
                t2["char_frac"].alias("top_bigram_char_frac"),
                t3["gram"].alias("top_trigram"),
                t3["n"].alias("top_trigram_n"),
                t3["char_frac"].alias("top_trigram_char_frac"),
            ).collect()
        }
        kern = {
            r["doc_id"]: tuple(r)[1:]
            for r in cur.repetition_signals_batch(
                df, "text", "doc_id"
            ).collect()
        }
        assert fold == kern


class TestClassifierKernelParity:
    def test_kernel_matches_hof_bit_exact(self, spark):
        # The Arrow kernel (registered/benched scale path) must be
        # BIT-exact against the Catalyst-HOF classifier: the kernel
        # emits only exact fold values (weights are multiples of
        # 2^-30, so every partial sum is exactly representable) and
        # the sigmoid runs Spark-side in the same JVM Math.exp.
        # Edge rows cover empty / whitespace-only / single-token /
        # Java-\s separators / accented + astral first codepoints.
        import struct

        import numpy as np

        rng = np.random.default_rng(17)
        words = ["the", "spark", "café", "naïve", "日本語", "😀grin", "a", "zz!"]
        rows = [
            (0, "", "en"),
            (1, "   ", "en"),
            (2, "single", "fr"),
            (3, "\ta b\n c  d\x0b e\x0c f\r g", "en"),
            (4, "x " * 200, "en"),
        ]
        for i in range(5, 60):
            k = int(rng.integers(0, 25))
            rows.append(
                (i, " ".join(rng.choice(words) for _ in range(k)), "xx")
            )
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        hof = {
            r["doc_id"]: (r["n_features"], struct.pack("d", r["_score_raw"]))
            for r in cur.with_classifier_score(df, "text")
            .select("doc_id", "n_features", "_score_raw")
            .collect()
        }
        kern = {
            r["doc_id"]: (r["n_features"], struct.pack("d", r["_score_raw"]))
            for r in cur.classifier_scores_arrow(
                df, "text", ["doc_id", "lang"]
            ).collect()
        }
        assert hof == kern


def test_normalized_dedup_catches_case_and_punct_variants(spark, tmp_path):
    """The value-add over exact dedup: case/punctuation/whitespace
    variants of one body collapse into one normalized class, and
    n_raw_variants counts the distinct raw forms."""
    import os

    from etl_covid19_spark.queries import REGISTRY

    docs = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello   world"),
            (3, "HELLO WORLD."),
            (4, "a different document"),
            (5, "a different document"),  # exact dup, 1 raw variant
            (6, "unique text here"),
        ],
        "doc_id long, text string",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    docs.write.parquet(f"{sf}/documents.parquet")
    out = {
        r.keeper_doc_id: r
        for r in REGISTRY["normalized_exact_dedup"].fn(spark, sf).collect()
    }
    assert set(out) == {1, 4}
    assert out[1].n_docs == 3 and out[1].n_raw_variants == 3
    assert out[4].n_docs == 2 and out[4].n_raw_variants == 1


def test_normalization_fused_regex_identical(spark):
    """The fused one-pass normalization ([^a-z0-9]+ -> ' ') is
    string-identical to the historical two-pass form (strip
    non-alnum-non-ws, then collapse \\s+): a maximal run of
    non-alphanumerics becomes exactly one space either way. Pinned
    on adversarial strings — tab/newline/CR runs, unicode NBSP
    (NOT Java \\s, so junk-replaced in pass 1 under the old form),
    punctuation runs, mixed junk+whitespace runs, leading/trailing
    junk, digits, empty, all-junk."""
    from pyspark.sql import functions as F

    rows = [
        ("Hello,  World!",),
        ("  \t\n mixed \r\n WS\t",),
        ("nbsp here  twice",),
        ("punct!!!runs###and---dashes",),
        ("a.b,c;d:e",),
        ("...leading and trailing...",),
        ("digits 123 and 456x",),
        ("",),
        ("!!!",),
        ("ümläut ünïcode mixed ascii",),
        ("a" * 500 + "!?" + "b" * 500,),
    ]
    df = spark.createDataFrame(rows, "text string")
    two_pass = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", " "),
            r"\s+",
            " ",
        )
    )
    fused = F.trim(
        F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]+", " ")
    )
    diff = df.select(two_pass.alias("a"), fused.alias("b")).where(
        F.col("a") != F.col("b")
    )
    assert diff.count() == 0


def test_filter_funnel_is_a_true_cascade(spark):
    """Funnel invariants at fixture scale: docs_out chains into the
    next stage's docs_in, counts are monotone non-increasing, and
    stage 5's survivors equal gopher_quality_filter's pass count."""
    from etl_covid19_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = sorted(
        REGISTRY["filter_funnel"].fn(spark, sf).collect(),
        key=lambda r: r.stage_idx,
    )
    assert [r.stage for r in rows] == [
        "token_count", "word_shape", "symbol_ratio",
        "alpha_words", "stopwords", "exact_dedup",
    ]
    for prev, cur in zip(rows, rows[1:]):
        assert cur.docs_in == prev.docs_out
        assert cur.docs_out <= cur.docs_in
    for r in rows:
        assert r.dropped == r.docs_in - r.docs_out
    gopher_pass = (
        REGISTRY["gopher_quality_filter"].fn(spark, sf)
        .where("pass").count()
    )
    assert rows[4].docs_out == gopher_pass


class TestIvfSearchScores:
    def test_scores_sql_bit_identical(self, spark):
        """`_ivf_search`'s probe scores ride as ONE nested-literal
        transform lambda (round-11 verdict ask #5 — the ivf_pq
        treatment applied to `ivf_search.scores()`). Pin: bit-for-bit
        equal to the per-centroid Column build it replaced (same
        casts, same left-to-right fold order), over the full
        embeddings table including the zero-norm guard."""
        import struct

        from etl_covid19_spark.functions import vectors
        from etl_covid19_spark.operators.similarity import (
            _ivf_scores_sql,
        )
        from etl_covid19_spark.sources.catalog import load_table

        emb = load_table(spark, "embeddings", SF)
        seed_rows = sorted(
            emb.orderBy("vec_id").limit(8).collect(),
            key=lambda r: int(r["vec_id"]),
        )
        cents = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in seed_rows
        ]

        # the per-centroid Column build this replaced
        old_scores = F.array(
            *[
                F.struct(
                    vectors.cosine(
                        "embedding",
                        F.array(*[F.lit(x) for x in cv]),
                    ).alias("cos"),
                    F.lit(cid).alias("cid"),
                )
                for cid, cv in cents
            ]
        )
        new_scores = F.expr(_ivf_scores_sql(cents, "embedding"))

        def pack(rows, col):
            return [
                tuple(
                    (struct.pack(">d", s["cos"]), s["cid"]) for s in r[col]
                )
                for r in sorted(rows, key=lambda r: r["vec_id"])
            ]

        old_rows = emb.select("vec_id", old_scores.alias("s")).collect()
        new_rows = emb.select("vec_id", new_scores.alias("s")).collect()
        assert pack(old_rows, "s") == pack(new_rows, "s")
