"""Pin tools/diffcheck.type_drift — the local mirror of the driver's
dtype-sensitive hasher (round-6 blind spot: local value compare used
Python-native fetches where DuckDB HUGEINT arrives as int, so SUM-type
drift was invisible for five rounds)."""

from tools.diffcheck import _family, type_drift


def test_hugeint_vs_bigint_is_drift():
    # The exact round-6 failure shape: DuckDB SUM(integer) → HUGEINT.
    drift = type_drift(
        [("source", "string"), ("n_valid", "bigint")],
        ["source", "n_valid"],
        ["VARCHAR", "HUGEINT"],
    )
    assert drift == [("n_valid", "bigint", "HUGEINT")]


def test_cast_bigint_is_clean():
    assert not type_drift(
        [("source", "string"), ("n_valid", "bigint")],
        ["source", "n_valid"],
        ["VARCHAR", "BIGINT"],
    )


def test_decimal_vs_nondecimal_is_drift():
    assert type_drift(
        [("x", "double")], ["x"], ["DECIMAL(38,2)"]
    ) == [("x", "double", "DECIMAL(38,2)")]


def test_decimal_on_both_sides_is_clean():
    assert not type_drift(
        [("x", "decimal(38,2)")], ["x"], ["DECIMAL(38,2)"]
    )


def test_int_float_split_both_directions():
    assert type_drift([("x", "bigint")], ["x"], ["DOUBLE"])
    assert type_drift([("x", "double")], ["x"], ["BIGINT"])
    assert not type_drift([("x", "double")], ["x"], ["DOUBLE"])
    assert not type_drift([("x", "int")], ["x"], ["BIGINT"])


def test_non_numeric_families_ignored():
    # date/varchar shapes are the value compare's job; matched
    # structural pairs are unsortable_columns' job, not drift.
    assert not type_drift(
        [("d", "date"), ("s", "string"), ("a", "array<bigint>")],
        ["d", "s", "a"],
        ["DATE", "VARCHAR", "BIGINT[]"],
    )


def test_family_mapping_edges():
    assert _family("HUGEINT") == "hugeint"
    assert _family("UHUGEINT") == "hugeint"
    assert _family("decimal(10,0)") == "decimal"
    assert _family("NUMERIC(18,3)") == "decimal"
    assert _family("ubigint") == "int"
    assert _family("float4") == "float"


def test_decimal_array_is_structural_not_decimal():
    # ADVICE r7: _family split on '(' first, so 'DECIMAL(18,2)[]'
    # mapped to 'decimal' and falsely drifted against
    # 'array<decimal(18,2)>'.  Both are structural now.
    assert _family("DECIMAL(18,2)[]") == "structural"
    assert _family("array<decimal(18,2)>") == "structural"
    assert not type_drift(
        [("x", "array<decimal(18,2)>")], ["x"], ["DECIMAL(18,2)[]"]
    )


def test_structural_vs_numeric_is_drift():
    # structural-vs-'other' (varchar) pairs are unsortable_columns'
    # job — each side is flagged independently there; the drift check
    # adjudicates family splits between two *hashable* families or
    # against a numeric one.
    assert type_drift([("x", "array<int>")], ["x"], ["BIGINT"]) == [
        ("x", "array<int>", "BIGINT")
    ]
    assert type_drift([("x", "bigint")], ["x"], ["INTEGER[]"]) == [
        ("x", "bigint", "INTEGER[]")
    ]


def test_unsortable_columns_flags_structural_types():
    from tools.diffcheck import unsortable_columns

    got = unsortable_columns(
        [
            ("ok", "string"),
            ("arr", "array<string>"),
            ("m", "map<string,bigint>"),
            ("st", "struct<a:int>"),
            ("b", "binary"),
            ("darr", "VARCHAR[]"),
            ("dst", "STRUCT(a INTEGER)"),
            ("dmap", "MAP(VARCHAR, BIGINT)"),
            ("dblob", "BLOB"),
            ("n", "bigint"),
        ]
    )
    assert [c for c, _ in got] == [
        "arr", "m", "st", "b", "darr", "dst", "dmap", "dblob"
    ]


def test_driver_canon_error_mirrors_round7_array_kit():
    """The exact round-7 failure shape: a result column holding
    list cells is unhashable for pandas sort_values → the driver's
    _canon throws.  The simulation must report it; scalar-encoded
    rows must pass."""
    from tools.diffcheck import driver_canon_error

    bad = [(1, ["a", "b"]), (2, ["c"])]
    err = driver_canon_error(bad, ["doc_id", "first3"])
    assert err is not None and "TypeError" in err

    good = [(1, "a b"), (2, "c"), (3, None)]
    assert driver_canon_error(good, ["doc_id", "first3"]) is None
