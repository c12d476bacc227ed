"""Unit tests for the function kits: datetime (D1-D8 property
checks), json (flatten/parse), text (tokenize/shingles edge cases)."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_covid19_spark.functions import datetime_kit as dk
from etl_covid19_spark.functions import json_kit, text


# --- datetime kit: property checks over a full leap year ----------------


def test_date_dimension_properties(spark):
    dim = dk.calendar_attributes(dk.date_range(spark, "2024-01-01", "2024-12-31"))
    rows = dim.collect()
    assert len(rows) == 366  # leap year, every day exactly once
    assert len({r.full_date for r in rows}) == 366
    for r in rows:
        d: dt.date = r.full_date
        assert r.date_key == int(d.strftime("%Y%m%d"))
        assert r.day_number_in_week == d.isoweekday()
        assert r.last_day_in_week_indicator == (d.isoweekday() == 7)
        assert r.weekday_flag == (d.isoweekday() <= 5)
        assert r.month_number_in_year == d.month
        assert r.day_of_week == d.strftime("%A")
        assert r.month_name == d.strftime("%B")


def test_date_key_expression(spark):
    df = spark.createDataFrame(
        [(dt.date(2023, 1, 5),), (dt.date(1999, 12, 31),)], "d date"
    )
    got = [r[0] for r in df.select(dk.date_key("d")).collect()]
    assert got == [20230105, 19991231]


# --- json kit -----------------------------------------------------------


def test_flatten_nested_structs(spark):
    df = spark.createDataFrame(
        [Row(a=1, b=Row(c=2, d=Row(e="x")), f=[1, 2])]
    )
    flat = json_kit.flatten(df)
    assert flat.columns == ["a", "b.c", "b.d.e", "f"]
    row = flat.collect()[0]
    assert row["b.d.e"] == "x" and row["f"] == [1, 2]


def test_parse_and_explode_roundtrip(spark):
    schema = T.ArrayType(
        T.StructType([T.StructField("v", T.IntegerType())])
    )
    df = spark.createDataFrame([('{"data": [{"v": 1}, {"v": 2}]}',)], "js string")
    parsed = df.withColumn(
        "arr", json_kit.parse_json(json_kit.json_path("js", "$.data"), schema)
    )
    out = json_kit.explode_records(parsed, "arr")
    assert [r["rec"]["v"] for r in out.collect()] == [1, 2]


# --- text kit edge cases ------------------------------------------------


def _one(spark, s: str, col):
    df = spark.createDataFrame([(s,)], "t string")
    return df.select(col.alias("out")).collect()[0].out


def test_tokens_empty_and_whitespace(spark):
    assert _one(spark, "", F.size(text.tokens("t"))) == 0
    assert _one(spark, "   ", F.size(text.tokens("t"))) == 0
    assert _one(spark, "a  b\tc", text.tokens("t")) == ["a", "b", "c"]


def test_word_shingles_short_doc(spark):
    # shorter than n → whole text is the single shingle
    assert _one(spark, "a b", text.word_shingles("t", 3)) == ["a b"]
    got = _one(spark, "a b c d", text.word_shingles("t", 3))
    assert sorted(got) == ["a b c", "b c d"]


def test_ratios_bounded(spark):
    for s in ("", "!!!", "the the the", "word"):
        pr = _one(spark, s, text.punct_ratio("t"))
        sr = _one(spark, s, text.stopword_ratio("t"))
        assert 0.0 <= pr <= 1.0 and 0.0 <= sr <= 1.0


def test_fingerprint_deterministic_and_sensitive(spark):
    a = _one(spark, "the quick brown fox", text.fingerprint("t"))
    b = _one(spark, "the quick brown fox", text.fingerprint("t"))
    c = _one(spark, "the quick brown cat", text.fingerprint("t"))
    assert a == b and a != c


def test_bpe_ish_token_count(spark):
    # "don't stop!" → don / ' / t / stop / ! = 5 pieces
    assert _one(spark, "don't stop!", text.bpe_ish_token_count("t")) == 5


def test_compressibility_matches_python_zlib(spark):
    """The Arrow kernel's deflate byte counts equal a direct
    zlib.compress(level 6) recomputation, and the ratio separates
    repetitive from high-entropy text."""
    import random
    import zlib

    from etl_covid19_spark.functions import text as TX

    rng = random.Random(3)
    rows = [
        (0, "spam " * 400),
        (1, "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(2000))),
        (2, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bytes"], r["n_deflate"])
        for r in TX.compressibility_arrow(df, ["doc_id"], "text").collect()
    }
    for doc_id, t in rows:
        enc = t.encode("utf-8")
        assert got[doc_id] == (len(enc), len(zlib.compress(enc, 6))), doc_id
    # repetitive text compresses far better than random text
    assert got[0][1] / got[0][0] < 0.05 < got[1][1] / got[1][0]


def test_word_shingle_pairs_arrow_parity(spark):
    """The string-gram kernel equals explode(word_shingles) with
    per-doc distinct on edge cases: short docs (whole-text shingle),
    empty/whitespace-only docs, NULL text, unicode tokens, and
    repeated grams (distinct)."""
    from pyspark.sql import functions as F

    from etl_covid19_spark.functions import text

    rows = [
        (0, "a b c d e a b c"),
        (1, "one two"),
        (2, ""),
        (3, None),
        (4, "   "),
        (5, "café 模型 🚀 café 模型 🚀 café 模型 🚀"),
        (6, "x y z x y z x y z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hof = set(
        (r.doc_id, r.sh)
        for r in df.select(
            "doc_id",
            F.explode(text.word_shingles("text", 3)).alias("sh"),
        ).collect()
    )
    arw = [
        (r.doc_id, r.sh)
        for r in text.word_shingle_pairs_arrow(
            df, "doc_id", "text", 3
        ).collect()
    ]
    assert len(arw) == len(set(arw)), "kernel emits per-doc distinct"
    assert set(arw) == hof


def test_quality_counts_arrow_lang_parity(spark):
    """with_lang=True marker counts equal the HOF lang_scores, and
    the argmax finisher reproduces the priority-ordered language."""
    from pyspark.sql import functions as F

    from etl_covid19_spark.functions import text

    rows = [
        (0, "the cat and the dog of a to"),
        (1, "el que la de y el que"),
        (2, "le et les de la le"),
        (3, "der die und das ist der"),
        (4, "de5 shi4 le5 zai4 he2"),
        (5, ""),
        (6, None),
        (7, "THE AND Of to A"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s = text.lang_scores("text")
    hof = {
        r.doc_id: tuple(r[1:])
        for r in df.select(
            "doc_id", *[s[lc].alias(lc) for lc in text.LANG_MARKERS]
        ).collect()
    }
    staged = text.quality_counts_arrow(
        df, ["doc_id"], "text", with_lang=True
    )
    arw = {
        r.doc_id: tuple(r[1:])
        for r in staged.select(
            "doc_id", *[f"s_{lc}" for lc in text.LANG_MARKERS]
        ).collect()
    }
    # HOF on NULL text: size(filter(NULL)) is -1 per lang; the
    # kernel treats NULL as empty (0 hits) — document the delta and
    # compare the rest exactly
    for k in hof:
        if k == 6:
            continue
        assert hof[k] == arw[k], f"doc {k}: {hof[k]} != {arw[k]}"
    preds = {
        r.doc_id: r.p
        for r in staged.select(
            "doc_id", text.predicted_lang_from_counts().alias("p")
        ).collect()
    }
    assert preds[0] == "en" and preds[1] == "es" and preds[2] == "fr"
    assert preds[3] == "de" and preds[4] == "zh"
