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

# Numeric "hash families" as the driver's canonicalizer sees them.
# The driver fetches the DuckDB side through a dtype-sensitive path
# (pandas), where HUGEINT and DECIMAL degrade to float64 — so a
# DuckDB SUM(integer) (HUGEINT) hashes as "10000.0" while Spark's
# bigint hashes as "10000", failing the compare even though every
# value matches (round-6 json_try_parse / sequence_packing).  The
# local value compare below uses Python-native fetches (semantically
# exact), so this TYPE check is what makes driver-visible dtype
# drift a local failure.
_INT_NAMES = {
    "tinyint", "smallint", "int", "integer", "bigint", "long",
    "short", "byte", "utinyint", "usmallint", "uinteger", "ubigint",
    "int1", "int2", "int4", "int8", "signed",
}
_FLOAT_NAMES = {"float", "double", "real", "float4", "float8"}

# Structural / complex output types the driver cannot canonicalize
# AT ALL: its pandas-based row sort (`sort_values` over every result
# column) factorizes each column, and ndarray/list/dict/bytes cells
# are unhashable → TypeError before any compare happens (round 7:
# array_kit).  Spark spells them array</map</struct</binary; DuckDB
# spells them T[]/LIST/STRUCT(..)/MAP(..)/UNION(..)/BLOB/JSON.
_STRUCTURAL_PREFIXES = ("array<", "map<", "struct<", "list<")
_STRUCTURAL_BASES = {"struct", "map", "union", "list", "blob", "binary", "json"}


def _is_structural(dtype: str) -> bool:
    t = dtype.lower().strip()
    if t.endswith("[]") or t.startswith(_STRUCTURAL_PREFIXES):
        return True
    return t.split("(")[0].strip() in _STRUCTURAL_BASES


def _family(dtype: str) -> str:
    """Map a Spark or DuckDB type string to a driver hash family."""
    if _is_structural(dtype):
        return "structural"  # e.g. DECIMAL(18,2)[] / array<decimal(18,2)>
    base = dtype.lower().split("(")[0].strip()
    if base in _INT_NAMES:
        return "int"
    if base in _FLOAT_NAMES:
        return "float"
    if base in {"hugeint", "uhugeint", "int128"}:
        return "hugeint"  # pandas renders as float64 → "N.0"
    if base in {"decimal", "numeric"}:
        return "decimal"
    return "other"


def unsortable_columns(dtypes):
    """Columns whose type the driver's pandas canonicalizer cannot
    sort (list/struct/map/binary cells are unhashable for
    `sort_values`).  Applies to BOTH sides: pass Spark `df.dtypes`
    or zip(duckdb cols, types)."""
    return [
        (col, str(t)) for col, t in dtypes if _is_structural(str(t))
    ]


def type_drift(s_dtypes, d_cols, d_types):
    """Driver-visible dtype divergences between Spark and oracle.

    Returns [(column, spark_type, duckdb_type), ...] for columns
    whose rendered hash text would differ even when values match:
    DuckDB HUGEINT/DECIMAL against a non-decimal Spark column, an
    int/float family split in either direction, or a structural
    (array/map/struct/binary) type on exactly one side.  A
    structural type on BOTH sides is not drift — it is reported
    separately by `unsortable_columns` because the driver cannot
    canonicalize it regardless of agreement.
    """
    spark = dict(s_dtypes)
    problems = []
    for col, dtype in zip(d_cols, [str(t) for t in d_types]):
        if col not in spark:
            continue  # column-set mismatch is reported separately
        sfam, dfam = _family(spark[col]), _family(dtype)
        if sfam == dfam:
            continue
        if dfam in ("hugeint", "decimal") and sfam != "decimal":
            problems.append((col, spark[col], dtype))
        elif "other" in (sfam, dfam):
            # other-vs-numeric pairs (e.g. varchar vs int) surface as
            # value diffs; the type guard adjudicates hash families
            continue
        else:
            problems.append((col, spark[col], dtype))
    return problems


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


def driver_canon_error(rows, columns):
    """Simulate the driver's `_canon` (pandas `sort_values` over every
    result column) and return an error string if it would throw — the
    round-7 failure mode (`array_kit`: TypeError unhashable ndarray)
    that the pure-Python `normalize` above sails through.  Runs on
    the Spark side only; the oracle side reaches the driver through
    the same pandas path and the structural-type guards already pin
    its dtypes."""
    import pandas as pd

    try:
        pdf = pd.DataFrame(rows, columns=columns)
        pdf.sort_values(by=list(columns), inplace=False)
    except Exception as exc:  # noqa: BLE001 — any throw is a driver err row
        return (
            f"driver canonicalizer simulation failed: "
            f"{type(exc).__name__}: {exc}"
        )
    return None


# Oracles ADJUDICATED as resource-infeasible at scale: their DuckDB
# plan (not the engine side) legitimately explodes past the 24 GB
# memory/spill caps at sf1+ — e.g. triangle_count's 3-way self-join
# spilled >70 GB at sf1 while the engine side ran in 6.7 s. ONLY
# these names may record `oracle_resource` (a non-failure status);
# any OTHER query exhausting the oracle's limits is a FAIL — a
# regression that newly pushes a previously-verified oracle over the
# caps must not silently drop that query's verification (ADVICE
# round 9). Extend this list only with an adjudication note.
def _gk_equidepth_bound(s_cols, s_rows, d_cols, d_rows):
    """Machine-check the Greenwald-Khanna contract for
    `equidepth_histogram_sketch` when the exact-rank oracle and the
    sketch diverge (n > accuracy — the approximate regime, where
    divergence is the DESIGN, pinned in tests/test_statistics.py::
    test_equidepth_approx_error_bound_above_compression_threshold):
    each cut's rank error is ≤ n/accuracy, so each bucket count may
    differ from the oracle's by at most 2n/accuracy (+1 for the two
    ceil conventions), and totals must agree exactly. accuracy is
    the registered query's 100_000. Returns (ok, note)."""
    accuracy = 100_000
    try:
        si = {c: i for i, c in enumerate(s_cols)}
        di = {c: i for i, c in enumerate(d_cols)}
        s_counts = {
            int(r[si["bin"]]): int(r[si["n_rows"]]) for r in s_rows
        }
        d_counts = {
            int(r[di["bin"]]): int(r[di["n_rows"]]) for r in d_rows
        }
    except (KeyError, TypeError, ValueError) as exc:
        return False, f"bound check could not parse rows: {exc}"
    n_s, n_d = sum(s_counts.values()), sum(d_counts.values())
    if n_s != n_d:
        return False, f"total rows differ: {n_s} != {n_d}"
    tol = 2 * n_s // accuracy + 1
    worst = max(
        abs(s_counts.get(b, 0) - d_counts.get(b, 0))
        for b in set(s_counts) | set(d_counts)
    )
    if worst <= tol:
        return True, (
            f"GK rank bound holds: max bucket-count deviation "
            f"{worst} <= 2n/accuracy+1 = {tol} (n={n_s}, "
            f"accuracy={accuracy})"
        )
    return False, (
        f"GK rank bound VIOLATED: max bucket-count deviation "
        f"{worst} > {tol} (n={n_s}, accuracy={accuracy})"
    )


# Queries whose oracle is exact-by-construction only below a sketch
# threshold: above it, values diverge by design and the contract is
# an ERROR BOUND — checked by code here, never by prose allowlist.
# status becomes `ok_within_bound` (with the measured deviation in
# `note`) instead of `fail`.
BOUNDED_COMPARE = {
    "equidepth_histogram_sketch": _gk_equidepth_bound,
}


ORACLE_RESOURCE_ALLOWLIST = {
    "triangle_count",
    # adjudicated round 10: the oracle's iterative PageRank
    # reconstruction (k dense matrix passes as SQL CTEs) exhausts
    # either the 300 s/side budget (round-9 DIFF: timeout) or the
    # 24 GB spill cap (round-10 DIFF: OOM at 22.3 GiB) depending on
    # ambient state — oracle-side infeasibility at sf1 either way;
    # the engine side completes in ~11 s and the same compare is
    # green at sf0.01 where the driver gate runs
    "pagerank_similarity",
    # adjudicated round 10: the near-dup stage of this oracle is a
    # raw Σ_sh df² postings self-join (`p a JOIN p b ON a.sh=b.sh`)
    # — the exact shape the ENGINE eliminated this round with
    # pair-local verification. On the low-entropy sf1 corpus (~900
    # distinct bigrams over ~20k survivors, df ~10³) DuckDB spills
    # >60 GB (measured with a raised cap; round-9's 222.96 s green
    # row was borderline under ambient conditions). Green at the
    # sf0.01 driver gate; engine side 20.6 s at sf1.
    "corpus_curation",
    # adjudicated round 10 (round-9 DIFF recorded the same class as
    # an oracle TIMEOUT): the sign-band kNN graph oracle's candidate
    # reconstruction — band cross join + exact top-k window over all
    # candidate pairs — exceeds either the 300 s/side budget or the
    # spill cap at sf1 depending on ambient state. Green at the
    # sf0.01 driver gate.
    "knn_graph",
}


def _with_budget(thunk, cancel, budget: float | None):
    """Run thunk; if it raises after `budget` seconds armed `cancel`
    fired, report (None, True) instead of propagating — the caller
    records a timeout and keeps sweeping.

    The done/cancel handshake is serialized under a lock so the
    timer cannot fire BETWEEN thunk() returning and the done flag
    being set (the round-9 residual race). Callers must still make
    `cancel` target only the current query's execution context (a
    per-query DuckDB cursor, a per-query Spark job group): if the
    timer wins the lock in the instant before done is set, the stale
    cancel then hits a finished query's context, never the next
    query's."""
    import threading

    if budget is None:
        return thunk(), False
    fired = threading.Event()
    done = threading.Event()
    lock = threading.Lock()

    def _cancel():
        with lock:
            if done.is_set():
                return
            fired.set()
        # cancel() targets the current query's execution context but
        # runs OUTSIDE the lock: if it loses a race with the caller's
        # deterministic cursor close (done set + close in the instant
        # between our lock release and the call), interrupting a
        # closed cursor raises in this Timer thread — harmless to
        # results, but noisy. Swallow it.
        try:
            cancel()
        except Exception:  # noqa: BLE001 — stale-cancel race only
            pass

    timer = threading.Timer(budget, _cancel)
    timer.start()
    try:
        result = thunk()
        with lock:
            done.set()
        return result, False
    except Exception:
        with lock:
            done.set()
        if fired.is_set():
            return None, True
        raise
    finally:
        timer.cancel()


def run(spark, sf_dir: str, only=None, verbose: bool = True, stats=None,
        query_budget: float | None = None, checkpoint=None):
    """Differential sweep; returns [(query_name, problem), ...].

    When ``stats`` is a dict it is filled with one record per query
    run: {name: {"status": ok|rows_only|fail|timeout, "rows": N,
    "spark_sec": s, "oracle_sec": s}} — the committable artifact for
    at-scale differential runs (DIFF_sf1.json), where the claim
    "every oracle matched at sf1" needs per-query evidence, not an
    exit code.

    ``query_budget`` (seconds, per SIDE per query) arms a watchdog for
    at-scale runs: the Spark side is cancelled via its job group (the
    registry_sweep pattern), the DuckDB side via ``con.interrupt()``.
    A blown budget records the query as ``timeout`` and the sweep
    keeps going — one degenerate oracle at sf1 cannot eat the run.
    """
    import os
    import threading
    import time

    import duckdb

    import __spark_entry__ as entrymod

    def with_budget(label, thunk, cancel):
        return _with_budget(thunk, cancel, query_budget)

    def say(msg: str) -> None:
        if verbose:
            print(msg)

    con = duckdb.connect()
    # Cap the oracle engine's resources: an oracle whose plan explodes
    # at scale (round 9: triangle_count's 3-way self-join spilled
    # >70 GB of hash-join temp at sf1 and ran the DISK out, risking
    # every later query in the run) must abort with its own error,
    # not take the host down. 24 GB memory / 24 GB spill is far above
    # anything a well-shaped oracle needs at sf1-sf10.
    con.execute("SET memory_limit='24GB'")
    con.execute("SET temp_directory='/tmp/duckdb_diff_spill'")
    con.execute("SET max_temp_directory_size='24GB'")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        # gen_sf chunks big tables into `<name>.parquet/` DIRECTORIES
        # of part files (sf100 orders/lineitem); glob those for DuckDB
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(only) if only else None
    failures = []

    def ckpt():
        # flush per-query evidence after EVERY query so a killed or
        # crashed at-scale run still leaves a committable artifact
        if checkpoint is not None:
            checkpoint(stats, failures)
    for name, fn in queries.items():
        if only and name not in only:
            continue
        rec = {} if stats is not None else None
        if rec is not None:
            stats[name] = rec
        t0 = time.perf_counter()
        group = f"diff_{name}"
        spark.sparkContext.setJobGroup(group, name, True)

        def spark_side():
            sdf = fn(spark, sf_dir)
            return (
                sdf.columns,
                sdf.dtypes,
                [tuple(r) for r in sdf.collect()],
            )

        try:
            got, timed_out = with_budget(
                name, spark_side,
                lambda: spark.sparkContext.cancelJobGroup(group),
            )
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR {type(exc).__name__}: {exc}"))
            say(f"FAIL  {name}: spark error {exc}")
            if rec is not None:
                rec.update(status="fail", spark_sec=round(time.perf_counter() - t0, 3))
            ckpt()
            continue
        finally:
            spark.sparkContext.setJobGroup("", "", False)
        if timed_out:
            failures.append(
                (name, f"SPARK TIMEOUT after {query_budget}s")
            )
            say(f"TIMEOUT  {name}: spark side blew {query_budget}s")
            if rec is not None:
                rec.update(status="timeout", spark_sec=round(time.perf_counter() - t0, 3))
            ckpt()
            continue
        s_cols, s_dtypes, s_rows = got
        if rec is not None:
            rec.update(rows=len(s_rows), spark_sec=round(time.perf_counter() - t0, 3))
        if name not in oracles:
            say(f"SKIP  {name}: no oracle (rows-only) — {len(s_rows)} rows")
            if rec is not None:
                rec["status"] = "rows_only"
            ckpt()
            continue
        t1 = time.perf_counter()
        # Per-query CURSOR (shares the database + views, own
        # execution context): a watchdog interrupt that loses the
        # done-flag race can only ever hit THIS query's finished
        # execution, never abort the next query on the shared
        # connection (ADVICE round 9 — a stale con.interrupt()
        # recorded a spurious DUCKDB ERROR in the artifact).
        ocur = con.cursor()

        def oracle_side():
            rel = ocur.sql(oracles[name])
            return list(rel.columns), list(rel.types), rel.fetchall()

        def close_ocur():
            # DETERMINISTIC close, not GC: an interrupted/failed
            # query's cursor can otherwise keep its spilled temp
            # blocks charged against the shared 24 GB
            # max_temp_directory_size until collection, starving
            # later heavy oracles in the same run (observed round
            # 10: corpus_curation OOM'd at 22.3 GiB after two
            # earlier oracle aborts, then passed clean solo).
            try:
                ocur.close()
            except Exception:  # noqa: BLE001 — best-effort
                pass

        try:
            got, timed_out = with_budget(
                name, oracle_side, ocur.interrupt
            )
        except Exception as exc:  # noqa: BLE001
            close_ocur()
            msg = str(exc)
            resource = name in ORACLE_RESOURCE_ALLOWLIST and any(
                t in msg
                for t in (
                    "Out of Memory", "No space left",
                    "max_temp_directory_size", "OutOfMemoryException",
                )
            )
            if resource:
                # the ORACLE's plan is resource-infeasible at this SF
                # (e.g. an uncapped self-join the engine-side query
                # avoids by construction) — an at-scale-check
                # limitation, not an engine failure; distinct from
                # `fail` so a DIFF artifact reader can adjudicate
                say(f"RESOURCE  {name}: oracle exhausted limits — {msg[:120]}")
                if rec is not None:
                    rec.update(
                        status="oracle_resource",
                        oracle_sec=round(time.perf_counter() - t1, 3),
                    )
            else:
                failures.append((name, f"DUCKDB ERROR: {exc}"))
                say(f"FAIL  {name}: duckdb error {exc}")
                if rec is not None:
                    rec.update(status="fail", oracle_sec=round(time.perf_counter() - t1, 3))
            ckpt()
            continue
        if timed_out:
            close_ocur()
            if name in ORACLE_RESOURCE_ALLOWLIST:
                # Adjudicated-infeasible oracles manifest as EITHER
                # an OOM/spill abort or a budget timeout depending on
                # ambient state (see the allowlist notes). Record the
                # same non-failure status on both paths so DIFF
                # artifacts don't flap between adjudicated-green and
                # failed run-to-run (ADVICE round 10).
                say(
                    f"RESOURCE  {name}: adjudicated oracle blew the "
                    f"{query_budget}s budget (timeout manifestation)"
                )
                if rec is not None:
                    rec.update(
                        status="oracle_resource",
                        oracle_sec=round(time.perf_counter() - t1, 3),
                        note=f"timeout manifestation after {query_budget}s",
                    )
                ckpt()
                continue
            failures.append(
                (name, f"ORACLE TIMEOUT after {query_budget}s")
            )
            say(f"TIMEOUT  {name}: oracle side blew {query_budget}s")
            if rec is not None:
                rec.update(status="timeout", oracle_sec=round(time.perf_counter() - t1, 3))
            ckpt()
            continue
        d_cols, d_types, d_rows = got
        close_ocur()
        if rec is not None:
            rec["oracle_sec"] = round(time.perf_counter() - t1, 3)
        problems = []
        for col, st in unsortable_columns(s_dtypes):
            problems.append(
                f"structural output column {col!r} ({st}): the driver's "
                f"pandas canonicalizer cannot sort list/struct/map/binary "
                f"cells — encode it as a scalar (array_join / map_kit "
                f"pattern)"
            )
        for col, dt in unsortable_columns(
            list(zip(d_cols, [str(t) for t in d_types]))
        ):
            problems.append(
                f"structural oracle column {col!r} ({dt}): encode with "
                f"array_to_string/struct_pack flattening"
            )
        for col, st, dt in type_drift(s_dtypes, d_cols, d_types):
            problems.append(
                f"type drift on {col!r}: spark {st} vs oracle {dt} "
                f"(driver hashes these differently — cast the oracle)"
            )
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns {sorted(s_cols)} != {sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount {len(s_rows)} != {len(d_rows)}")
        # Value comparison runs whenever columns and rowcount line up,
        # independent of type-drift findings — a query with both a
        # dtype drift and a genuine value bug reports both at once.
        if sorted(s_cols) == sorted(d_cols) and len(s_rows) == len(d_rows):
            ns, nd = normalize(s_rows, s_cols), normalize(d_rows, d_cols)
            if ns != nd:
                bounded = BOUNDED_COMPARE.get(name)
                ok_bound, bnote = (
                    bounded(s_cols, s_rows, d_cols, d_rows)
                    if bounded
                    else (False, "")
                )
                if ok_bound:
                    # values diverge from the exact-rank oracle BY
                    # DESIGN (sketch regime) but the operator's
                    # pinned error bound holds — machine-checked,
                    # not prose-adjudicated (VERDICT r10 ask #4)
                    say(f"BOUND  {name}: {bnote}")
                    if rec is not None:
                        rec.update(
                            status="ok_within_bound", note=bnote
                        )
                    ckpt()
                    continue
                diff = [
                    (a, b) for a, b in zip(ns, nd) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diff}")
                if bounded:
                    problems.append(f"bound check also failed: {bnote}")
            err = driver_canon_error(s_rows, s_cols)
            if err:
                problems.append(err)
        if problems:
            failures.append((name, "; ".join(problems)))
            say(f"FAIL  {name}: {'; '.join(problems)}")
            if rec is not None:
                rec["status"] = "fail"
        else:
            say(f"OK    {name} ({len(s_rows)} rows)")
            if rec is not None:
                rec["status"] = "ok"
        ckpt()

    n_ran = len(stats) if stats is not None else (
        len(only) if only else len(queries)
    )
    say(f"\n{len(failures)} failures / {n_ran} queries run")
    return failures


def main() -> int:
    import json
    import os
    import subprocess

    from etl_covid19_spark.session import get_spark

    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    budget = None
    if "--budget" in argv:
        i = argv.index("--budget")
        budget = float(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark("diffcheck")
    stats: dict = {}
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
    ).stdout.strip()

    def write_json(st, fl):
        by_status: dict[str, int] = {}
        for r in st.values():
            by_status[r.get("status", "?")] = by_status.get(r.get("status", "?"), 0) + 1
        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "commit": commit,
                    "n_run": len(st),
                    "query_budget_sec": budget,
                    "counts": by_status,
                    "failures": {n: p for n, p in fl},
                    "total_spark_sec": round(
                        sum(r.get("spark_sec", 0) for r in st.values()), 2
                    ),
                    "total_oracle_sec": round(
                        sum(r.get("oracle_sec", 0) for r in st.values()), 2
                    ),
                    "queries": st,
                },
                f,
                indent=1,
                sort_keys=True,
            )

    failures = run(
        spark, sf_dir, only or None, stats=stats, query_budget=budget,
        checkpoint=write_json if json_out else None,
    )
    if json_out:
        write_json(stats, failures)
    return 1 if failures else 0



if __name__ == "__main__":
    raise SystemExit(main())
