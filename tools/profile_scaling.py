"""Parallelism-visibility profiler (round-11 verdict ask #6).

The shipped sf0.1 testdata is single-row-group parquet, so scans are
structurally single-task and the bench's 8-vs-32-core scaling block
reads ~1.0 everywhere — it cannot see parallelism wins or losses.
This profiler restores visibility WITHOUT touching the driver's
testdata or the bench: it times headline queries against a
multi-row-group COPY of sf0.1 (pyarrow rewrite, 32 row groups per
table) in a session whose `spark.sql.files.maxPartitionBytes` is
lowered so the ~10 MB files actually split. Profiling-only: bench.py
and the driver contract are untouched.

Usage:
  python tools/profile_scaling.py MRG_DIR [cpus ...]   # default 8 32
Prints per-query medians per core count and the low/high ratio.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = [
    "pricing_summary",
    "star_join_revenue",
    "profit_by_nation_brand",
    "explode_tokens",
    "json_path_agg",
    "window_running",
    "text_quality_arrow",
]


def run_one(mrg_dir: str, cpus: int) -> dict[str, float]:
    """One fresh process per core count (master is a static conf)."""
    mpb = os.environ.get("SCALING_MPB", "262144")
    code = f"""
import json, sys, time
sys.path.insert(0, {str(Path(__file__).resolve().parent.parent)!r})
from etl_covid19_spark.queries import REGISTRY
from etl_covid19_spark.session import get_spark
spark = get_spark(
    "profile_scaling", master="local[{cpus}]",
    extra_conf={{"spark.sql.files.maxPartitionBytes": {mpb!r},
                 "spark.sql.files.openCostInBytes": "65536"}},
)
spark.sparkContext.setLogLevel("ERROR")
out = {{}}
for name in {QUERIES!r}:
    fn = REGISTRY[name].fn
    fn(spark, {mrg_dir!r}).write.format("noop").mode("overwrite").save()
    xs = []
    for _ in range(5):
        t0 = time.perf_counter()
        fn(spark, {mrg_dir!r}).write.format("noop").mode("overwrite").save()
        xs.append(time.perf_counter() - t0)
    xs.sort()
    out[name] = round(xs[len(xs) // 2], 3)
print("RESULT:" + json.dumps(out))
"""
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=1200,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT:"):
            return json.loads(line[len("RESULT:"):])
    raise RuntimeError(proc.stderr[-2000:])


def main() -> None:
    from registry_sweep import acquire_measure_lock

    _fd, _w = acquire_measure_lock(exclusive=True)
    mrg_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf0.1_mrg"
    cpu_list = [int(x) for x in sys.argv[2:]] or [8, 32]
    results = {c: run_one(mrg_dir, c) for c in cpu_list}
    lo, hi = min(cpu_list), max(cpu_list)
    report = {
        "mrg_dir": mrg_dir,
        "max_partition_bytes": os.environ.get("SCALING_MPB", "262144"),
        "loadavg": os.getloadavg(),
        "per_cpu": {str(c): results[c] for c in cpu_list},
        "ratio_low_over_high": {
            q: round(results[lo][q] / results[hi][q], 2)
            for q in results[hi]
            if results[hi][q] > 0
        },
        "stamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
