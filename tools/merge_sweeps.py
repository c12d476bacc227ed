"""Merge chunked registry_sweep JSON lines into one record.

Usage: python tools/merge_sweeps.py out.json chunk1.json chunk2.json ...
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out_path, *chunks = sys.argv[1:]
    merged = None
    for path in chunks:
        d = json.loads(open(path).read().strip().splitlines()[-1])
        if merged is None:
            merged = d
            continue
        merged["times"].update(d["times"])
        merged["failures"].update(d["failures"])
        merged["timeouts"] += d["timeouts"]
        merged["skipped_baselines"] += [
            s for s in d["skipped_baselines"]
            if s not in merged["skipped_baselines"]
        ]
    merged["times"] = dict(
        sorted(merged["times"].items(), key=lambda kv: -kv[1])
    )
    merged["total_sec"] = round(sum(merged["times"].values()), 2)
    with open(out_path, "w") as f:
        json.dump(merged, f)
    print(f"{out_path}: {len(merged['times'])} timed, "
          f"{merged['timeouts']} timeouts, total {merged['total_sec']}s")


if __name__ == "__main__":
    main()
