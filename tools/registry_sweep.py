"""Registry-wide timing sweep: run EVERY registry query once at a
given SF (default sf1) with the noop sink and emit one JSON line of
per-query seconds, slowest first. The headline bench tracks 16
queries round-over-round; this sweep is the coverage instrument that
finds the slow outliers hiding in the other ~185 — the queries a
user would hit that the bench never times.

Each query runs under a WATCHDOG (default 120 s, override with
SWEEP_QUERY_BUDGET): a timer thread cancels the query's Spark job
group at the budget, the query lands in `timeouts`, and the sweep
keeps going — a single degenerate query cannot eat the whole run,
and the timeout list IS the finding.

Usage: python tools/registry_sweep.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

from etl_covid19_spark.queries import REGISTRY  # noqa: E402
from etl_covid19_spark.session import get_spark  # noqa: E402


# Deliberate small-SF baselines: exact all-pairs cross-checks and
# demo-threshold diagnostics whose scale twins are separately
# registered (SCALE.md "Registry-wide sweep findings"). Skipped at
# sf >= 1 — timing them there measures a design decision, not a bug.
QUADRATIC_BASELINES = {
    "embedding_near_dup_exact",
    "ann_cosine_topk",
    "cosine_pairs_pandas",
    "dedup_ngram_jaccard",
    "embedding_near_dup",
    "equidepth_histogram",
    # exact containment aggregates ALL co-shingled pairs (sum df^2,
    # ~35 s at sf1); its df-capped scale twin
    # dedup_containment_capped is swept instead
    "dedup_containment",
}

# Quadratic-OUTPUT baselines: completable at sf1, but the answer
# itself grows ~|dups|² (sf1: 23.4M pairs from 50k docs) — at sf10
# materializing it exceeds any budget by design. The linear
# cluster-assignment twin (dedup_simhash_clustered) is the swept
# scale path.
SF10_QUADRATIC_OUTPUT = {
    "dedup_simhash",
    # exact eval×train postings join expands to Σ_sh df_e·df_t —
    # both factors grow with the corpus (6 s at sf1 → 100+ s at
    # sf10); the train-df-capped twin contamination_check_capped
    # is the swept scale path
    "contamination_check",
}

# Timed but slow BY DESIGN: engine-pure Catalyst-HOF cross-check
# twins kept for oracle/parity purposes (their Arrow twins are the
# default paths), plus deliberately-pedagogical surface demos
# (cogrouped as-of join, per-row Python UDTF). Annotated in the
# sweep JSON so a reader doesn't mistake them for regressions.
SLOW_BY_DESIGN = {
    "quality_classifier": "HOF cross-check twin of quality_classifier_arrow",
    "text_quality": "HOF cross-check twin of text_quality_arrow",
    "asof_join_cogrouped": "cogrouped applyInPandas teaching variant; production as-of join is asof_join_events",
    "udtf_sentence_spans": "Python-UDTF surface demo; per-row eval is the taught trade-off",
    "sessionize_pandas": "applyInPandas sessionization variant complementing native session_windows",
}


_MEASURE_LOCK = "/tmp/spark_graft_measure.lock"


def acquire_measure_lock(exclusive: bool = True):
    """Serialize MEASUREMENT runs against the repo's own processes:
    sweeps/bench take this lock EXCLUSIVE; the pytest session
    fixture takes it SHARED (tests may overlap each other, never a
    measurement). Round-10's committed sf100 MinHash headline had to
    be replaced by a solo re-run because pytest ran concurrently
    with the sweep (SWEEP_sf100_subset.json `reruns`) — with the
    lock, sweep numbers come from the sweep itself. Blocks until
    granted; returns (fd, waited_sec) — keep the fd alive for the
    run (the lock dies with the process, so a crashed sweep can
    never wedge later runs)."""
    import fcntl

    fd = os.open(_MEASURE_LOCK, os.O_CREAT | os.O_RDWR, 0o666)
    t0 = time.perf_counter()
    fcntl.flock(
        fd, fcntl.LOCK_EX if exclusive else fcntl.LOCK_SH
    )
    return fd, round(time.perf_counter() - t0, 3)


def main() -> None:
    _lock_fd, lock_wait = acquire_measure_lock(exclusive=True)
    if lock_wait > 1:
        print(
            f"waited {lock_wait}s for the measure lock",
            file=sys.stderr,
        )
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfgen/sf1"
    # optional slice "start:end" over the registry (run long sweeps
    # in chunks, merge the JSON lines with tools/merge_sweeps.py), or
    # a comma-separated name list for targeted spot-sweeps (the sf100
    # scale-critical subset)
    lo, hi = 0, len(REGISTRY)
    only: set[str] | None = None
    if len(sys.argv) > 2:
        arg = sys.argv[2]
        if set(arg) <= set("0123456789:"):
            s, _, e = arg.partition(":")
            lo = int(s) if s else 0
            hi = int(e) if e else len(REGISTRY)
        else:
            only = set(arg.split(","))
            unknown = only - set(REGISTRY)
            if unknown:
                raise SystemExit(f"unknown queries: {sorted(unknown)}")
    spark = get_spark("registry_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    # Control the two ambient variables that made round-over-round
    # sweep totals incomparable (round-9 finding: star_join_revenue
    # read 9.4 s in one sweep and 42.5 s in the next with identical
    # code, data, and final plan):
    #  1. JVM/codegen warmup — the FIRST query in the session paid
    #     ~10 s that every other query didn't; run one trivial scan
    #     before the loop so query #1 measures the query.
    #  2. OS page cache — whichever query touched a big table first
    #     paid its cold I/O, and whether the warehouse was generated
    #     minutes or hours before the sweep silently swung totals
    #     ±30%+. Pre-touch every warehouse file once (sequential
    #     read, dropped immediately) so every query measures COMPUTE
    #     on the same footing. SWEEP_COLD=1 opts back into ambient
    #     cache state; the JSON records which protocol ran.
    cache_mode = "ambient" if os.environ.get("SWEEP_COLD") else "page-warmed"
    if cache_mode == "page-warmed":
        for root, _dirs, files in os.walk(sf_dir):
            for f in files:
                with open(os.path.join(root, f), "rb") as fh:
                    while fh.read(1 << 24):
                        pass
    # date_dimension reads no warehouse table, so the warmup works
    # for subset warehouses (sf100) too
    REGISTRY["date_dimension"].fn(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    big_sf = "sf1" in sf_dir or "sf10" in sf_dir
    skips = set(QUADRATIC_BASELINES)
    if "sf10" in sf_dir:
        skips |= SF10_QUADRATIC_OUTPUT
    budget = float(os.environ.get("SWEEP_QUERY_BUDGET", "120"))
    # SWEEP_RUNS=N (default 1): per-query MEDIAN of N isolated runs.
    # This shared-tenant host has sporadic contention windows where
    # everything runs 3-7x slower (round 9: star_join_revenue flapped
    # 9.4<->45 s across same-protocol sweeps with an identical final
    # plan, while CPU steal read ~0 between windows) — any number
    # that will be ADJUDICATED round-over-round should be a median of
    # >=3; the full-registry coverage pass stays at 1 for wall-clock.
    runs = max(1, int(os.environ.get("SWEEP_RUNS", "1")))
    times: dict[str, float] = {}
    failures: dict[str, str] = {}
    timeouts: list[str] = []
    skipped: list[str] = []
    from etl_covid19_spark.operators.df_cache import SHARED_CACHE

    for name, qd in list(REGISTRY.items())[lo:hi]:
        if only is not None and name not in only:
            continue
        if big_sf and name in skips:
            skipped.append(name)
            continue
        # ISOLATE measurements: drop the shared frame pool before
        # each query so one query's pooled build (or its LRU
        # eviction of another's) can't leak into a neighbor's
        # timing — the round-5 sweep showed pool-order artifacts of
        # 2-8× (contamination_check: 9 s fresh, 73-120+ s mid-sweep
        # once the new kNN/positions pools crowded the 8-entry LRU).
        # Every number below is therefore per-query COLD including
        # its own pool builds; the headline bench still measures the
        # warm shared-pool path.
        samples: list[float] = []
        for _attempt in range(runs):
            SHARED_CACHE.clear()
            group = f"sweep_{name}"
            spark.sparkContext.setJobGroup(group, name, True)
            fired = threading.Event()

            def cancel():
                fired.set()
                spark.sparkContext.cancelJobGroup(group)

            timer = threading.Timer(budget, cancel)
            timer.start()
            t0 = time.perf_counter()
            try:
                qd.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.perf_counter() - t0)
            except Exception as e:  # keep sweeping; report at the end
                if fired.is_set():
                    timeouts.append(name)
                else:
                    failures[name] = str(e).split("\n")[0][:200]
                break
            finally:
                timer.cancel()
                spark.sparkContext.setJobGroup("", "", False)
        if samples and name not in timeouts and name not in failures:
            # true median (even run counts average the middle two —
            # sorted()[n//2] was the upper-middle element, biasing
            # adjudicated comparisons upward; ADVICE round 9)
            import statistics

            times[name] = round(statistics.median(samples), 3)
        tag = times.get(name)
        if tag is None:
            tag = "TIMEOUT" if name in timeouts else "FAIL"
        print(f"{name}: {tag}", file=sys.stderr, flush=True)
    ordered = dict(
        sorted(times.items(), key=lambda kv: -kv[1])
    )
    import subprocess

    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd="/root/repo",
        capture_output=True,
        text=True,
    ).stdout.strip()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "commit": commit,
                "n_queries": len(REGISTRY),
                # for subset sweeps (name-list / slice), how many
                # actually ran vs the registry size above
                "n_run": len(times) + len(failures) + len(timeouts),
                "total_sec": round(sum(times.values()), 2),
                "failures": failures,
                "timeouts": timeouts,
                "query_budget_sec": budget,
                "isolation": "pool-cleared per query (cold incl. own pool builds)",
                "cache": cache_mode,
                "runs_per_query": runs,
                # exclusive measure lock held for the whole sweep —
                # pytest sessions (shared holders) cannot overlap it
                "measure_lock_wait_sec": lock_wait,
                "skipped_baselines": skipped,
                "slow_by_design": {
                    n: r
                    for n, r in SLOW_BY_DESIGN.items()
                    if n in times
                },
                "times": ordered,
            }
        )
    )


if __name__ == "__main__":
    main()
