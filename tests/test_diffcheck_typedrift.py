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
    # date/varchar/list shapes are the value compare's job; the type
    # guard only adjudicates numeric hash families.
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
