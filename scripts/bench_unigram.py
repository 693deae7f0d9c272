#!/usr/bin/env python
"""Unigram-trainer receipt (the BENCH_bpe_train discipline applied to
the unigram family): per-tier round structure, wall, and shuffle —
the quantities that decide whether the trainer survives 100 TB.

Tiers:
* sf — the catalog corpus (31 distinct words): the oracle-pinned
  configuration, dominated by fixed per-round job overhead.
* synth_40k — 40k distinct uniform wordforms: distinct-words scaling.
  The corpus-sized stage (word count) runs ONCE; every EM round is a
  zero-shuffle Viterbi fold over the distinct-words frame plus one
  vocabulary-keyed usage exchange, so round cost tracks distinct
  words, never the corpus. The receipt records per-round walls,
  usage-table sizes (all ≤ seed_size — the driver's bounded collect),
  and the tier's total shuffle bytes.
* trajectory_check — the synth tier's Spark trajectory re-run through
  the pure-Python reference twin on identical word counts: final
  vocab must match piece-for-piece (count, cost, rank).

Usage: python scripts/bench_unigram.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from bench_bpe_batched import uniform_tail_vocab  # noqa: E402
from bench import UiMetrics  # noqa: E402
from mongodb_etl_migration_spark import get_spark  # noqa: E402
from mongodb_etl_migration_spark.operators import unigram as U  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH_unigram.json"
    spark = get_spark(
        app_name="bench_unigram", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = UiMetrics(spark)
    doc: dict = {"metric": "unigram_train_rounds"}

    # --- sf tier: the catalog configuration
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    st: dict = {}
    w0, r0 = ui.shuffle_totals()
    t0 = time.time()
    U.unigram_train(d, "text", vocab_size=56, seed_size=120, rounds=3, stats=st)
    sec = round(time.time() - t0, 3)
    w1, r1 = ui.shuffle_totals()
    doc["sf"] = {
        "sf_dir": sf_dir,
        "sec": sec,
        "shuffle_bytes": (w1 - w0) + (r1 - r0),
        **st,
    }

    # --- synth tier: 40k distinct wordforms (distinct-words scaling)
    wc = uniform_tail_vocab(40_000, seed=7)
    rows = [(w, int(n)) for w, n in wc.items()]
    synth = (
        spark.createDataFrame(rows, "w string, n int")
        .select(
            F.array_join(
                F.array_repeat(F.col("w"), F.col("n")), " "
            ).alias("text")
        )
        .repartition(32)
        .localCheckpoint()
    )
    st2: dict = {}
    w0, r0 = ui.shuffle_totals()
    t0 = time.time()
    got = U.unigram_train(
        synth, "text", vocab_size=4096, seed_size=16384, rounds=3,
        stats=st2,
    )
    sec2 = round(time.time() - t0, 3)
    w1, r1 = ui.shuffle_totals()
    doc["synth_40k"] = {
        "n_words": len(wc),
        "vocab_size": 4096,
        "seed_size": 16384,
        "mode": "auto->arrow",
        "sec": sec2,
        "shuffle_bytes": (w1 - w0) + (r1 - r0),
        **st2,
    }

    # --- column-vs-arrow crossover: same corpus, a vocabulary small
    # enough that the Column fold finishes in minutes; the ratio IS
    # the reason COLUMN_VOCAB_MAX exists (Catalyst literal-map
    # element_at scans linearly, so Column E-step cost carries an
    # extra O(|vocab|) factor per DP lookup)
    xover = {}
    for m in ("arrow", "column"):
        t0 = time.time()
        r = U.unigram_train(
            synth, "text", vocab_size=1024, seed_size=4096, rounds=2,
            mode=m,
        )
        xover[m] = {"sec": round(time.time() - t0, 3), "pieces": len(r)}
        if m == "arrow":
            arrow_vocab = r
        else:
            assert r == arrow_vocab, "mode trajectories diverged"
    xover["column_over_arrow"] = round(
        xover["column"]["sec"] / xover["arrow"]["sec"], 2
    )
    doc["mode_crossover_4k_seed"] = xover

    # --- trajectory check vs the pure-Python twin
    ref = U.unigram_train_reference(
        {w: int(n) for w, n in wc.items()},
        vocab_size=4096,
        seed_size=16384,
        rounds=3,
    )
    doc["trajectory_check"] = {
        "tier": "synth_40k",
        "final_vocab_pieces": len(got),
        "equal_to_reference": got == ref,
    }
    assert got == ref, "Spark trajectory diverged from the reference"

    doc["git_sha"] = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True,
        text=True,
    ).stdout.strip()
    Path(out).write_text(json.dumps(doc, indent=1) + "\n")
    print(json.dumps(doc))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
