"""BPE vocab induction: the Spark merge table must match a
pure-Python reference implementation exactly (the operator is
iterative, hence rows-only at the driver's oracle gate — this
differential is its correctness evidence, the same treatment as
PageRank's closed-form fixpoints)."""

from pyspark.sql import functions as F

from etl_covid19_spark.operators.bpe import (
    END_OF_WORD,
    bpe_merge_table,
    word_frequencies,
)

SF = "/root/testdata/sf0.001"


def py_bpe(word_freqs: dict, n_merges: int, min_count: int):
    """Reference BPE trainer (Sennrich et al. 2016 pseudocode shape)
    with the operator's determinism contract: winner = (count desc,
    left asc, right asc); greedy left-to-right apply."""
    vocab = {tuple(list(w) + [END_OF_WORD]): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(n_merges):
        counts: dict = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((rank, left, right, left + right, cnt))
        new_vocab: dict = {}
        for syms, f in vocab.items():
            out: list = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


def _spark_merges(spark, df, n_merges, min_count):
    return [
        tuple(r)
        for r in bpe_merge_table(
            spark, df, "text", n_merges=n_merges, min_count=min_count
        ).collect()
    ]


def _py_merges_from(spark, df, n_merges, min_count):
    wf = {
        r["word"]: r["freq"]
        for r in word_frequencies(df, "text").collect()
    }
    return py_bpe(wf, n_merges, min_count)


def test_bpe_matches_reference_on_corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = _spark_merges(spark, docs, 12, 2)
    want = _py_merges_from(spark, docs, 12, 2)
    assert got == want
    assert len(got) == 12  # corpus is rich enough to fill all rounds


def test_bpe_compositional_and_overlap_edges(spark):
    rows = [
        ("abab abab abab",),  # (a,b)->ab then (ab,ab)->abab
        ("aaaa aaaa",),  # overlapping runs: greedy pairs, no triple
        ("café café naïve",),  # multi-byte codepoints split cleanly
    ]
    df = spark.createDataFrame(rows, ["text"])
    got = _spark_merges(spark, df, 6, 2)
    want = _py_merges_from(spark, df, 6, 2)
    assert got == want
    # compositionality: some later merge must consume an earlier
    # merged symbol (e.g. 'ab' + 'ab' or 'aa' + 'aa')
    merged_syms = {m[3] for m in got}
    assert any(
        m[1] in merged_syms or m[2] in merged_syms for m in got[1:]
    )


def test_bpe_tie_break_and_min_count(spark):
    # 'xy' and 'pq' both appear exactly 3 times -> lexicographic
    # winner first; min_count=4 stops before either.
    df = spark.createDataFrame([("xy xy xy pq pq pq",)], ["text"])
    got = _spark_merges(spark, df, 2, 2)
    want = _py_merges_from(spark, df, 2, 2)
    assert got == want
    assert (got[0][1], got[0][2]) <= (got[1][1], got[1][2])
    assert _spark_merges(spark, df, 2, 4) == []


def test_bpe_registry_entry(spark):
    from etl_covid19_spark.queries import REGISTRY

    out = REGISTRY["bpe_vocab_merges"].fn(spark, SF)
    rows = out.collect()
    assert [r["rank"] for r in rows] == list(range(len(rows)))
    assert all(r["merged"] == r["left"] + r["right"] for r in rows)
    # counts are non-increasing is NOT guaranteed by BPE (later
    # merges can expose bigger pairs), but every count respects
    # min_count
    assert all(r["pair_count"] >= 2 for r in rows)


def py_encode(word: str, merges) -> int:
    syms = list(word) + [END_OF_WORD]
    for _, left, right, _, _ in merges:
        out = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return len(syms)


def test_bpe_encode_matches_python(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    merges = _py_merges_from(spark, docs, 12, 2)
    from etl_covid19_spark.operators.bpe import encode_stats

    got = {
        r["doc_id"]: (r["n_chars"], r["n_bpe_tokens"])
        for r in encode_stats(docs, "text", merges).collect()
    }
    rows = docs.select("doc_id", "text").collect()
    assert len(got) == len(rows)
    for r in rows:
        toks = [w for w in r["text"].strip().split() if w]
        want = sum(py_encode(w, merges) for w in toks)
        assert got[r["doc_id"]][1] == want, r["doc_id"]
        assert got[r["doc_id"]][0] == len(r["text"])


def test_bpe_encode_registry_entry(spark):
    from etl_covid19_spark.queries import REGISTRY

    out = REGISTRY["bpe_encode_stats"].fn(spark, SF)
    rows = out.limit(50).collect()
    assert rows
    for r in rows:
        assert r["n_bpe_tokens"] >= 1
        # merges only ever shrink the character tokenization
        assert r["n_bpe_tokens"] <= r["n_chars"] + 200


def test_bpe_encode_arrow_parity_null_unicode(spark):
    """encode_stats_arrow (the production kernel) equals the
    Catalyst reference encode_stats row-for-row, including NULL
    text (NULL stats), empty/whitespace-only docs, unicode
    codepoint symbols, and merged-symbol chains."""
    from etl_covid19_spark.operators.bpe import (
        bpe_merge_table,
        encode_stats,
        encode_stats_arrow,
    )

    rows = [
        (0, "low lower lowest low low lower newer newest new"),
        (1, "café naïve café 模型 模型 rocket 🚀 rocket"),
        (2, None),
        (3, ""),
        (4, "   "),
        (5, "aaaa aaaa aa a aaaaaaaa"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = [
        tuple(r)
        for r in bpe_merge_table(
            spark, docs, "text", n_merges=8, min_count=2
        ).collect()
    ]
    ref = {
        r.doc_id: (r.n_chars, r.n_bpe_tokens, r.chars_per_token)
        for r in encode_stats(docs, "text", merges).collect()
    }
    arw = {
        r.doc_id: (r.n_chars, r.n_bpe_tokens, r.chars_per_token)
        for r in encode_stats_arrow(docs, "text", merges).collect()
    }
    assert ref == arw
    assert arw[2] == (None, None, None)
