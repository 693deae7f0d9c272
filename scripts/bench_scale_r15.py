#!/usr/bin/env python
"""Scale-tier receipts for the r15 optimizations — the VERDICT r14
item-6 ask: sf0.1 wall can no longer resolve most wins (9/18 headline
queries are dispatch-bound at that SF), so receipt the round's two
CPU/loop claims at ~10× volume, where compute dominates dispatch.

Claims under test:

1. **Gopher fold kernel** (pass 2): the Arrow-vectorized gram folds
   beat the codegen string-sort folds on per-row CPU, and the gap
   GROWS with corpus size (it is pure per-row work). Pinned A/B in
   ONE session via with_gopher_repetition(engine=...) — same plan
   shape either side, interleaved S/A/S/A blocks, noop sink.
   Corpus: sf0.1 documents replicated 10× with replica-suffixed ids
   (content identical per replica — the folds don't care, CPU does).

2. **Graph loop restructure** (pass 1): lazy-checkpoint rounds + the
   out-degree fold cut per-round shuffles/joins; at 10× edges the
   win should be shuffle/CPU, not just dispatch. Synthetic directed
   graph from md5 arithmetic (deterministic — no RNG, repo rule):
   ~300k edges / 30k nodes, pagerank_integer + hits_integer, 3
   iterations, noop sink. Run this script in BOTH trees (the r14
   worktree has the old loop) for the before/after columns.

Run:  python scripts/bench_scale_r15.py [gopher|graph|all]
Writes/merges BENCH_scale_r15.json at the repo root.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from mongodb_etl_migration_spark import get_spark  # noqa: E402
from mongodb_etl_migration_spark.operators import graph as G  # noqa: E402
from mongodb_etl_migration_spark.operators import text as T  # noqa: E402

SF01 = "/root/testdata/sf0.1"
REPLICAS = 10


def _noop(df_or_fn) -> float:
    """Time CONSTRUCTION + noop materialization together — the
    bench.py convention (t0 before the query builder runs), which is
    what makes eager-vs-lazy checkpoint trees comparable: loop-shaped
    operators execute their rounds at construction (eager) or at the
    action (lazy), and only the sum is invariant."""
    t0 = time.time()
    df = df_or_fn() if callable(df_or_fn) else df_or_fn
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def gopher(spark) -> dict:
    docs = spark.read.parquet(f"{SF01}/documents.parquet").select(
        "doc_id", "text"
    )
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    corpus = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") * REPLICAS + F.col("rep")).alias("doc_id"),
            "text",
        )
        .localCheckpoint(eager=False)
    )
    n = corpus.count()  # materialize once; both engines read the cache
    out: dict = {"docs": n, "replicas": REPLICAS, "runs": {}}
    # interleaved blocks, 2 runs each, arrow/sql — fan_out pinned True
    # (the 10x corpus is one in-memory RDD; pin so both engines get the
    # identical fan-out plan — receipt rule from cpu_fan_out docstring)
    for blk in range(2):
        for eng in ("sql", "arrow"):
            runs = out["runs"].setdefault(eng, [])
            for _ in range(2):
                spark.sparkContext.setJobDescription(
                    f"scale_r15 gopher {eng} blk{blk}"
                )
                runs.append(
                    _noop(
                        lambda: T.with_gopher_repetition(
                            corpus, "text", fan_out=True, engine=eng
                        )
                    )
                )
    out["min"] = {e: min(r) for e, r in out["runs"].items()}
    out["speedup_min"] = round(out["min"]["sql"] / out["min"]["arrow"], 2)
    return out


def graph(spark) -> dict:
    # deterministic md5 graph: 300k directed edges over ~30k nodes,
    # heavy-tailed-ish via modulo mixing; weights 1..8
    edges = (
        spark.range(300_000)
        .select(
            (
                F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 6), 16, 10)
                .cast("bigint")
                % 30_000
            ).alias("src"),
            (
                F.conv(F.substring(F.md5(F.col("id").cast("string")), 7, 6), 16, 10)
                .cast("bigint")
                % 30_000
            ).alias("dst"),
            (
                F.conv(F.substring(F.md5(F.col("id").cast("string")), 13, 2), 16, 10)
                .cast("bigint")
                % 8
                + 1
            ).alias("w"),
        )
        .filter(F.col("src") != F.col("dst"))
        .localCheckpoint(eager=False)
    )
    n = edges.count()
    out: dict = {"edges": n, "nodes_mod": 30_000, "runs": {}}
    for blk in range(2):
        for name, fn in (
            ("pagerank", lambda: G.pagerank_integer(edges, "src", "dst", 3)),
            (
                "pagerank_weighted",
                lambda: G.pagerank_integer(edges, "src", "dst", 3, weight="w"),
            ),
            ("hits", lambda: G.hits_integer(edges, "src", "dst", 3)),
        ):
            spark.sparkContext.setJobDescription(f"scale_r15 graph {name} blk{blk}")
            out["runs"].setdefault(name, []).append(_noop(fn))
    out["min"] = {k: min(v) for k, v in out["runs"].items()}
    return out


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark(app_name="bench_scale_r15")
    spark.sparkContext.setLogLevel("ERROR")
    path = REPO / "BENCH_scale_r15.json"
    data = json.loads(path.read_text()) if path.exists() else {}
    if which in ("gopher", "all"):
        data["gopher_x10"] = gopher(spark)
        print("gopher_x10:", json.dumps(data["gopher_x10"]["min"]))
    if which in ("graph", "all"):
        data["graph_300k"] = graph(spark)
        print("graph_300k:", json.dumps(data["graph_300k"]["min"]))
    path.write_text(json.dumps(data, indent=1))
    spark.stop()
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
