"""Local differential harness mimicking the driver's oracle compare.

Runs each __spark_entry__.queries() entry at a given SF, runs the
matching oracle_sql() in DuckDB over the same parquet, and compares
row count, sorted column names, and order-insensitive values.

Usage: python tools/diffcheck.py [sf_dir] [query ...]

Also importable: `diffcheck.run(spark, sf_dir)` returns the failure
list, which `tests/test_full_differential.py` wires into pytest so
the full sweep guards every round (the driver's CORRECTNESS gate only
samples ~50 of the registry per round).
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")


def normalize(rows, columns):
    """Sort columns by name, normalize cell values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def cell(v):
        if v is None:
            return "\x00NULL"  # sortable sentinel (rollup/cube keys)
        if isinstance(v, bool):
            return v
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.10g}"
        if isinstance(v, list):
            return tuple(cell(x) for x in v)
        return v

    return sorted(
        tuple(cell(r[i]) for i in order) for r in rows
    )


def run(spark, sf_dir: str, only=None, verbose: bool = True):
    """Differential sweep; returns [(query_name, problem), ...]."""
    import duckdb

    import __spark_entry__ as entrymod

    def say(msg: str) -> None:
        if verbose:
            print(msg)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(only) if only else None
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR {type(exc).__name__}: {exc}"))
            say(f"FAIL  {name}: spark error {exc}")
            continue
        if name not in oracles:
            say(f"SKIP  {name}: no oracle (rows-only) — {len(s_rows)} rows")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {exc}"))
            say(f"FAIL  {name}: duckdb error {exc}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns {sorted(s_cols)} != {sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount {len(s_rows)} != {len(d_rows)}")
        if not problems:
            ns, nd = normalize(s_rows, s_cols), normalize(d_rows, d_cols)
            if ns != nd:
                diff = [
                    (a, b) for a, b in zip(ns, nd) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            say(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            say(f"OK    {name} ({len(s_rows)} rows)")

    say(f"\n{len(failures)} failures / {len(queries)} queries")
    return failures


def main() -> int:
    from etl_covid19_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("diffcheck")
    return 1 if run(spark, sf_dir, only or None) else 0


if __name__ == "__main__":
    raise SystemExit(main())
