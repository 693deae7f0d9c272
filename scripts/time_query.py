#!/usr/bin/env python
"""Quick per-query timing loop for optimization work: time named
catalog queries via the noop sink (guide §1.4), one cold + N warm
runs each, printing per-run seconds and cumulative shuffle-byte
deltas from the UI REST API. NOT the driver bench (bench.py) — this
is the inner measurement loop for iterating on one operator.

Usage: python scripts/time_query.py [-n WARM] [sf_dir] name [name ...]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mongodb_etl_migration_spark import get_spark  # noqa: E402
from mongodb_etl_migration_spark.queries import QUERIES  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    warm = 2
    if args and args[0] == "-n":
        warm = int(args[1])
        args = args[2:]
    if args and "/" in args[0]:
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args
    spark = get_spark(app_name="time_query", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    base = None
    try:
        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        base = f"{ui}/api/v1/applications/{app}"
    except Exception:
        pass

    def shuffle_totals() -> int:
        if not base:
            return 0
        try:
            with urllib.request.urlopen(
                f"{base}/stages?status=complete", timeout=10
            ) as r:
                stages = json.load(r)
            return sum(
                s.get("shuffleWriteBytes", 0) + s.get("shuffleReadBytes", 0)
                for s in stages
            )
        except Exception:
            return 0

    def job_count() -> int:
        """Total jobs submitted so far — per-query deltas receipt the
        collapsed per-round driver actions on loop-shaped operators."""
        if not base:
            return 0
        try:
            with urllib.request.urlopen(f"{base}/jobs", timeout=10) as r:
                return len(json.load(r))
        except Exception:
            return 0

    for name in names:
        runs = []
        s0 = None
        for i in range(warm + 1):
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            sec = time.time() - t0
            if i == 0:
                time.sleep(1.0)
                s0 = shuffle_totals()
                j0 = job_count()
            runs.append(round(sec, 3))
        time.sleep(1.0)
        s1 = shuffle_totals()
        j1 = job_count()
        print(
            f"{name:30s} cold={runs[0]:7.3f} warm={runs[1:]} "
            f"min_warm={min(runs[1:]) if runs[1:] else None} "
            f"shuffleB~={(s1 - s0) // max(1, warm)} "
            f"jobs~={(j1 - j0) / max(1, warm):.1f}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
