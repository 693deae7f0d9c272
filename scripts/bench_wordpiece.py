#!/usr/bin/env python
"""WordPiece-family receipt (the BENCH_unigram discipline applied to
the third tokenizer family): trainer wall/shuffle at the catalog
configuration, delta-maintenance speedup on a production-sized
vocabulary, trajectory equality, and the encode-path economics the
t_wordpiece_ids catalog row cites.

Tiers:
* sf — the catalog corpus (31 distinct words, 14 merges): the
  oracle-pinned configuration; shuffle is the ONE corpus-sized
  word-count exchange (training itself is driver-side on the
  dimension-sized vocabulary).
* synth_40k — 40k distinct uniform wordforms, 300 merges: the
  recount-per-round reference twin vs the delta-maintained
  incremental trainer on IDENTICAL word counts — the speedup is the
  reason the incremental path exists (each merge touches only the
  words containing the chosen pair; the per-round argmax stays a
  full scan of the HELD pair table because symbol-count changes
  re-rank untouched pairs — wordpiece.py's argmax-not-heap rule).
  Trajectories asserted equal.
* encode — the catalog vocabulary over sf0.1: direct per-occurrence
  Column walk vs the dictionary path (text.token_ids_dedup — one
  walk per DISTINCT word, broadcast join back) vs the Arrow batch
  twin; outputs asserted token-count-identical. The dictionary
  ratio is the number the t_wordpiece_ids docstring cites.

Usage: python scripts/bench_wordpiece.py [sf_dir] [out_json]
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

from bench import UiMetrics  # noqa: E402
from bench_bpe_batched import uniform_tail_vocab  # noqa: E402
from mongodb_etl_migration_spark import get_spark  # noqa: E402
from mongodb_etl_migration_spark.operators import text as T  # noqa: E402
from mongodb_etl_migration_spark.operators import (  # noqa: E402
    wordpiece as WP,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH_wordpiece.json"
    spark = get_spark(
        app_name="bench_wordpiece",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = UiMetrics(spark)
    doc: dict = {"metric": "wordpiece_train_encode"}

    # --- sf tier: the catalog configuration
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w0, r0 = ui.shuffle_totals()
    t0 = time.time()
    merges, vocab = WP.wordpiece_train(d, "text", n_merges=14)
    sec = round(time.time() - t0, 3)
    w1, r1 = ui.shuffle_totals()
    doc["sf"] = {
        "sf_dir": sf_dir,
        "n_merges": len(merges),
        "vocab": len(vocab),
        "sec": sec,
        "shuffle_bytes": (w1 - w0) + (r1 - r0),
    }

    # --- synth tier: incremental vs recount on 40k wordforms
    wc = uniform_tail_vocab(40_000, seed=11)
    n_merges = 300
    t0 = time.time()
    inc = WP.wordpiece_train_incremental_reference(wc, n_merges)
    inc_sec = round(time.time() - t0, 3)
    t0 = time.time()
    ref = WP.wordpiece_train_reference(wc, n_merges)
    ref_sec = round(time.time() - t0, 3)
    assert inc == ref, "incremental trajectory diverged from recount"
    doc["synth_40k"] = {
        "n_words": len(wc),
        "n_merges": n_merges,
        "incremental_sec": inc_sec,
        "recount_sec": ref_sec,
        "recount_over_incremental": round(ref_sec / max(1e-9, inc_sec), 2),
        "trajectory_equal": True,
    }

    # --- encode economics at the catalog vocabulary
    enc: dict = {}
    direct_ids = WP.wordpiece_token_ids("text", vocab)
    t0 = time.time()
    n_direct = (
        d.select(F.size(direct_ids).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    enc["direct_column"] = {
        "sec": round(time.time() - t0, 3), "tokens": int(n_direct)
    }
    t0 = time.time()
    dd = T.token_ids_dedup(
        d, "text", lambda w: WP.wordpiece_token_ids(w, vocab)
    )
    n_dedup = (
        dd.select(F.size("token_ids").alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    enc["dict_dedup"] = {
        "sec": round(time.time() - t0, 3), "tokens": int(n_dedup)
    }
    t0 = time.time()
    n_arrow = (
        WP.wordpiece_ids_batch(d, "text", vocab)
        .agg(F.sum("n_tokens"))
        .collect()[0][0]
    )
    arrow_sec = round(time.time() - t0, 3)
    enc["arrow_batch"] = {
        "sec": arrow_sec,
        "tokens": int(n_arrow),
        "tokens_per_sec": int(n_arrow / max(1e-9, arrow_sec)),
    }
    assert int(n_direct) == int(n_dedup) == int(n_arrow)
    enc["direct_over_dedup"] = round(
        enc["direct_column"]["sec"] / max(1e-9, enc["dict_dedup"]["sec"]),
        2,
    )
    doc["encode"] = enc

    doc["git_sha"] = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True,
        text=True,
    ).stdout.strip()
    Path(out).write_text(json.dumps(doc, indent=1) + "\n")
    print(json.dumps(doc))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
