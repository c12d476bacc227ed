"""The diffcheck `stats` record — the committable per-query evidence
behind at-scale differential artifacts (DIFF_sf1.json).

`tools/diffcheck.run(..., stats=dict)` must fill one record per query
run with status / row count / per-side seconds, because the at-scale
claim "every oracle matched at sf1" is graded on the artifact, not on
an exit code (round-9: the first sf1 run's per-query log was lost to
a pipe and had to be re-run — the JSON output exists so that cannot
recur).
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

SF_DIR = "/root/testdata/sf0.001"


def test_stats_records_ok_and_rows_only(spark):
    import diffcheck

    stats: dict = {}
    failures = diffcheck.run(
        spark,
        SF_DIR,
        only={"dim_mktsegment", "compressibility_scores"},
        verbose=False,
        stats=stats,
    )
    assert not failures
    assert set(stats) == {"dim_mktsegment", "compressibility_scores"}
    ok = stats["dim_mktsegment"]
    assert ok["status"] == "ok"
    assert ok["rows"] > 0
    assert ok["spark_sec"] > 0 and ok["oracle_sec"] >= 0
    ro = stats["compressibility_scores"]  # registered without an oracle
    assert ro["status"] == "rows_only"
    assert "oracle_sec" not in ro
