"""Registry-wide timing sweep: run EVERY registry query once at a
given SF (default sf1) with the noop sink and emit one JSON line of
per-query seconds, slowest first. The headline bench tracks 16
queries round-over-round; this sweep is the coverage instrument that
finds the slow outliers hiding in the other ~185 — the queries a
user would hit that the bench never times.

Usage: python tools/registry_sweep.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
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
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfgen/sf1"
    spark = get_spark("registry_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    big_sf = "sf1" in sf_dir or "sf10" in sf_dir
    times: dict[str, float] = {}
    failures: dict[str, str] = {}
    skipped: list[str] = []
    for name, qd in REGISTRY.items():
        if big_sf and name in QUADRATIC_BASELINES:
            skipped.append(name)
            continue
        t0 = time.perf_counter()
        try:
            qd.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # keep sweeping; report at the end
            failures[name] = str(e).split("\n")[0][:200]
        print(
            f"{name}: {times.get(name, 'FAIL')}",
            file=sys.stderr,
            flush=True,
        )
    ordered = dict(
        sorted(times.items(), key=lambda kv: -kv[1])
    )
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_queries": len(REGISTRY),
                "total_sec": round(sum(times.values()), 2),
                "failures": failures,
                "skipped_baselines": skipped,
                "times": ordered,
            }
        )
    )


if __name__ == "__main__":
    main()
