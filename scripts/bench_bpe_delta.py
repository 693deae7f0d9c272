#!/usr/bin/env python
"""Shuffle receipt for the round-12 DELTA-MAINTAINED distributed BPE
trainer: before round 12, EVERY training round re-exploded every
adjacent symbol position in the vocabulary and re-aggregated it — the
same job the initial gram build still runs once. After, a round
shuffles only the held gram table plus the affected words' signed
deltas. The marginal per-round shuffle vs the initial-build shuffle
IS the improvement, measured on the same Zipf-head wordform
distribution the round-10/11 receipts used.

Method: run mode='distributed' at n_merges = 1 and n_merges = 1 + K
(batch_cap=1 so rounds == merges) and difference the UI shuffle
totals — run A isolates (initial build + 1 delta round), run B adds
K more delta rounds, so (B - A) / K is the marginal delta round and
(A - marginal) approximates the initial build = the old per-round
cost.

Appends a "distributed_delta" object into BENCH_bpe_train.json.

Usage: python scripts/bench_bpe_delta.py [n_words] [K]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from bench import UiMetrics  # noqa: E402
from mongodb_etl_migration_spark import get_spark  # noqa: E402
from mongodb_etl_migration_spark.operators import text as T  # noqa: E402


def zipf_corpus(spark, n_words: int):
    """The bench_bpe_batched Zipf-head shape: few very frequent long
    words plus a long tail — one doc per word, counts via replication
    weights is unnecessary (bpe_train aggregates counts; frequency
    enters through the n column, so synthesize (w, n) directly and
    feed a one-word-per-doc frame with repeated rows capped small)."""
    rows = []
    for i in range(n_words):
        stem = f"w{i:06d}"
        word = (stem * (1 + (i % 7)))[: 4 + (i % 19)]
        n = max(1, n_words // (i + 1) // 10)
        rows.append((i, word, min(n, 500)))
    df = spark.createDataFrame(rows, "i long, w string, n int")
    # expand counts into rows the tokenizer sees (bounded by the cap)
    return df.select(
        F.explode(
            F.transform(F.sequence(F.lit(1), "n"), lambda _: F.col("w"))
        ).alias("text")
    )


def main() -> int:
    n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(
        app_name="bench_bpe_delta",
        extra_conf={"spark.ui.enabled": "true"},
    )
    ui = UiMetrics(spark)
    docs = zipf_corpus(spark, n_words).localCheckpoint()
    n_docs = docs.count()

    def run(n_merges: int) -> tuple[float, int]:
        w0, r0 = ui.shuffle_totals()
        t0 = time.time()
        merges, vocab = T.bpe_train(
            docs, "text", n_merges=n_merges, batch_cap=1,
            mode="distributed",
        )
        nv = vocab.count()
        sec = round(time.time() - t0, 3)
        w1, r1 = ui.shuffle_totals()
        assert len(merges) == n_merges and nv > 0
        return sec, (w1 - w0) + (r1 - r0)

    sec_a, shuf_a = run(1)
    sec_b, shuf_b = run(1 + k)
    marginal = max(0, (shuf_b - shuf_a) // k)
    initial = max(0, shuf_a - marginal)
    doc = {
        "n_words_synth": n_words,
        "n_docs": n_docs,
        "rounds_measured": k,
        "initial_gram_build_shuffle_bytes": initial,
        "marginal_delta_round_shuffle_bytes": marginal,
        # the old path paid ~the initial-build shuffle EVERY round;
        # the delta path pays `marginal` — this ratio is the win
        "delta_round_vs_full_recount_milli": (
            marginal * 1000 // initial if initial else None
        ),
        "sec_1_merge": sec_a,
        "sec_1_plus_k_merges": sec_b,
        "git_sha": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
        ).stdout.strip(),
    }
    path = Path("BENCH_bpe_train.json")
    existing = json.loads(path.read_text())
    existing["distributed_delta"] = doc
    path.write_text(json.dumps(existing) + "\n")
    print(json.dumps(doc))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
