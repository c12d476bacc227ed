"""Python extension surface: UDTF + cogrouped Arrow as-of join."""

from pyspark.sql import functions as F

from etl_covid19_spark.functions.udtf_kit import register_udtfs
from etl_covid19_spark.operators import joins as J
from etl_covid19_spark.sources.catalog import load_table

from conftest import SF_SMALL


def test_sentence_spans_udtf_edges(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [
            (1, "One. Two sentences.  Three."),
            (2, None),
            (3, "..."),
            (4, " padded .\n\ttabbed . "),
        ],
        "doc_id int, text string",
    ).createOrReplaceTempView("udtf_edge_docs")
    rows = spark.sql(
        """
        SELECT d.doc_id, s.span_idx, s.sentence, s.n_chars
        FROM udtf_edge_docs d, LATERAL sentence_spans(d.text) s
        ORDER BY d.doc_id, s.span_idx
        """
    ).collect()
    got = [(r.doc_id, r.span_idx, r.sentence, r.n_chars) for r in rows]
    # NULL text and all-empty spans emit nothing; indices are dense
    # per document and count only non-empty spans
    assert got == [
        (1, 0, "One", 3),
        (1, 1, "Two sentences", 13),
        (1, 2, "Three", 5),
        (4, 0, "padded", 6),
        (4, 1, "tabbed", 6),
    ]


def test_cogrouped_asof_matches_window_asof(spark):
    ev = load_table(spark, "events", SF_SMALL)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "value"
    )
    kwargs = dict(
        on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["ts", "value"],
    )
    for how in ("inner", "left"):
        window = J.asof_join(clicks, errors, how=how, **kwargs)
        cogrouped = J.asof_join_cogrouped(clicks, errors, how=how, **kwargs)
        assert window.schema == cogrouped.schema
        assert window.exceptAll(cogrouped).count() == 0
        assert cogrouped.exceptAll(window).count() == 0


def test_cogrouped_asof_key_only_on_one_side(spark):
    left = spark.createDataFrame(
        [(1, 10, 100.0), (2, 20, 200.0)], "k int, ts int, lv double"
    )
    right = spark.createDataFrame(
        [(1, 5, 1.5), (3, 1, 3.0)], "k int, ts int, rv double"
    )
    out = J.asof_join_cogrouped(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["rv"], how="inner",
    )
    rows = [(r.k, r.ts, r.asof_rv) for r in out.collect()]
    # k=2 has no right rows (dropped on inner); k=3's right rows have
    # no left partner (never emitted)
    assert rows == [(1, 10, 1.5)]


def test_repetition_signal_edges(spark):
    from etl_covid19_spark.functions import text as T

    df = spark.createDataFrame(
        [
            (1, "a b a b a"),        # top bigram: "a b" ×2 (beats "b a" on tie-break at equal? counts: a-b=2, b-a=2 → lex smaller "a b")
            (2, "x"),                # single token: no bigrams
            (3, ""),                 # empty: everything 0
            (4, "w w w w"),          # "w w" ×3
        ],
        "doc_id int, text string",
    )
    t2 = T.top_ngram_stats("text", 2)
    rows = {
        r.doc_id: (r.dup, r.gram, r.n, round(r.frac, 6))
        for r in df.select(
            "doc_id",
            T.dup_token_fraction("text").alias("dup"),
            t2["gram"].alias("gram"),
            t2["n"].alias("n"),
            t2["char_frac"].alias("frac"),
        ).collect()
    }
    assert rows[1] == (0.6, "a b", 2, round(4 / 5, 6))
    assert rows[2] == (0.0, "", 0, 0.0)
    assert rows[3] == (0.0, "", 0, 0.0)
    assert rows[4] == (0.75, "w w", 3, round(6 / 4, 6))
