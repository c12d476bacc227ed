"""Benchmark harness: runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution uses the `noop` sink so timing covers the full distributed
plan without driver-side collection.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_covid19_spark.queries import REGISTRY  # noqa: E402
from etl_covid19_spark.session import get_spark  # noqa: E402


def run_query(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = {n: q for n, q in REGISTRY.items() if q.headline}
    # one warmup to amortize JVM/codegen startup out of the first query
    next(iter(headline.values())).fn(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    # Each query runs three times; the headline value is the min
    # (steady-state throughput: Janino/JIT compile and ambient host
    # load excluded — this host swings ±30% between sessions), with
    # first-run times reported alongside for transparency.
    cold: dict[str, float] = {}
    timings: dict[str, float] = {}
    for name, qd in headline.items():
        cold[name] = round(run_query(spark, qd.fn, sf_dir), 3)
        print(f"cold {name}: {cold[name]}s", file=sys.stderr, flush=True)
    for name, qd in headline.items():
        warm = min(run_query(spark, qd.fn, sf_dir) for _ in range(2))
        timings[name] = round(min(cold[name], warm), 3)
        print(f"warm {name}: {timings[name]}s", file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold_queries": cold,
                "cold_total": round(sum(cold.values()), 3),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
