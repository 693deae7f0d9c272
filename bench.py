#!/usr/bin/env python
"""Engine benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline set exercises every cost class: columnar agg (a1), join
pipeline + window (j6), shuffle-heavy LSH dedup (d2), vector math
(sim_topk_bruteforce), per-doc text scoring (t_text_stats), window agg
over events (e_windowed_counts), hierarchy loop (j9), pandas-UDF path
(k1_uuid5). Each query runs twice; warm time is recorded (the driver
compares against BASELINE at the same sf).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mongodb_etl_migration_spark import get_spark  # noqa: E402
from mongodb_etl_migration_spark.queries import QUERIES  # noqa: E402

HEADLINE = [
    "a1_pricing_summary",
    "j6_denormalized_view",
    "j1_fk_resolution",
    "d2_minhash_lsh_pairs",
    "sim_topk_bruteforce",
    "t_text_stats",
    "e_windowed_counts",
    "j9_hierarchy_resolution",
    "k1_uuid5",
    "o2_global_topk",
]


def run_once(name: str, spark, sf_dir: str) -> float:
    t0 = time.time()
    df = QUERIES[name](spark, sf_dir)
    # Force full execution without driver-side materialization cost:
    # count() on a cheap wrapper keeps the measurement on the plan.
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        run_once(name, spark, sf_dir)  # cold (JIT, file listing)
        timings[name] = round(run_once(name, spark, sf_dir), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_warm_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
