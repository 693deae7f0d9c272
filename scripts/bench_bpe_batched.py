"""Round-count receipt for batch-compatible BPE training.

Measures how many DRIVER ROUNDS (each round = one vocabulary-sized
Spark job + two tiny collects in the engine) the batched trainer
needs for a production-scale merge budget, using the schedule twin
``bpe_train_batched_reference`` — which shares
``_select_compatible_batch`` verbatim with the Spark trainer, so
given identical pair/triple counts the round schedule IS the Spark
trainer's (asserted by
test_bpe_train_spark_batched_equals_reference_forced_interactions).
The sequential trainer would need exactly n_merges rounds; the ratio
is the scheduler-overhead win at a GPT-2-class vocabulary.

Two distributions, because batch width is a property of the DATA's
interaction structure, not the implementation:

* uniform_tail — 280k random wordforms with flat counts (the regime
  that dominates a web-scale wordform distribution's long tail and
  therefore a 50k-merge vocabulary's late merges): pair counts
  aggregate across many wordforms with varied neighbors, so the
  triple bounds sit far below the candidate counts and rounds
  collapse into the hundreds. The parallel frontier scales with
  corpus WIDTH — 60k words exhaust theirs at ~16k merges and 240k at
  ~49.4k before the trajectory turns chain-serial; 280k carry 50k
  with margin.
* zipf_head — counts ~ 1/rank with a handful of mega-words (the
  interaction-dense head regime): each top pair's dominant context
  sits inside the same mega-words, so the triple bound keeps batches
  narrow. Reported honestly rather than hidden — exact-trajectory
  batching cannot parallelize what the REFERENCE TRAJECTORY itself
  serializes (lex tie-breaking walks each fixed string's internal
  merges as a dependency chain; a created pair like (ab, c) sorts
  lex-before its tie-mates, so sequential BPE prefers chain steps —
  that serialism is Sennrich's semantics, not a scheduler limit).

A 150-merge prefix of the uniform_tail run is cross-checked against
the sequential ``bpe_train_reference`` so this receipt's own corpus
(not just the suite fixtures) demonstrates trajectory equality.

Round 11 adds the DELTA-MAINTENANCE trainer
(``bpe_train_incremental_reference``, bpe_train mode='driver') to
every tier: same vocabulary, same merge budget, trajectory asserted
equal — but per-merge cost O(affected occurrences) and ZERO
vocabulary-sized recounts, so the round count (the batched
scheduler's bottleneck on the Zipf head) stops being a cost at all.
A third tier runs the full 50k-merge budget on the Zipf head, which
per-round recounting could never reach.

Writes one JSON object to stdout and BENCH_bpe_train.json.
"""
from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongodb_etl_migration_spark.operators import text as T  # noqa: E402

ALPHA = "abcdefghijklmnopqrstuvwxyz0123456789"


def uniform_tail_vocab(n_words: int, seed: int) -> dict[str, int]:
    rng = random.Random(seed)
    wc: dict[str, int] = {}
    for _ in range(n_words):
        w = "".join(
            rng.choice(ALPHA) for _ in range(rng.randint(3, 12))
        )
        wc[w] = wc.get(w, 0) + rng.randint(1, 20)
    return wc


def zipf_head_vocab(n_words: int, seed: int) -> dict[str, int]:
    rng = random.Random(seed)
    wc: dict[str, int] = {}
    for i in range(n_words):
        w = "".join(
            rng.choice(ALPHA) for _ in range(rng.randint(3, 12))
        )
        wc[w] = wc.get(w, 0) + max(1, int(100_000 / (1 + i)))
    return wc


def run(name: str, wc: dict[str, int], n_merges: int, cap: int) -> dict:
    stats: dict = {}
    t0 = time.time()

    def progress(rounds: int, merged: int) -> None:
        if rounds % 100 == 0:
            print(
                f"  {name}: round {rounds}, {merged} merges, "
                f"{time.time() - t0:.0f}s",
                file=sys.stderr,
                flush=True,
            )

    merges = T.bpe_train_batched_reference(
        wc, n_merges, min_count=2, batch_cap=cap, stats=stats,
        on_round=progress,
    )
    dt = time.time() - t0
    bs = stats["batch_sizes"]
    # the delta-maintenance trainer (bpe_train mode='driver'): zero
    # vocabulary-sized recounts, so neither round count nor the
    # data's interaction structure matters — measure it on the SAME
    # vocabulary/merge budget and assert the trajectories agree
    inc_stats: dict = {}
    t1 = time.time()
    inc_merges, _ = T.bpe_train_incremental_reference(
        wc, n_merges, min_count=2, stats=inc_stats
    )
    inc_dt = time.time() - t1
    assert inc_merges == merges, (
        f"{name}: incremental trajectory diverged from batched"
    )
    return {
        "distribution": name,
        "n_words": len(wc),
        "merges_requested": n_merges,
        "merges_learned": len(merges),
        "batch_cap": cap,
        "rounds": stats["rounds"],
        "sequential_rounds": len(merges),
        "round_reduction": round(len(merges) / max(1, stats["rounds"]), 2),
        "max_batch": max(bs) if bs else 0,
        "p50_batch": sorted(bs)[len(bs) // 2] if bs else 0,
        "twin_seconds": round(dt, 1),
        "incremental_seconds": round(inc_dt, 1),
        "incremental_spark_jobs_per_merge": 0,
        "incremental_touched_symbols": inc_stats["touched_symbols"],
        "incremental_speedup": round(dt / max(inc_dt, 1e-9), 1),
    }


def main() -> None:
    # trajectory cross-check on this receipt's own corpus
    wc_small = uniform_tail_vocab(4_000, seed=42)
    ref = T.bpe_train_reference(wc_small, 150, min_count=2)
    got = T.bpe_train_batched_reference(
        wc_small, 150, min_count=2, batch_cap=4096
    )
    assert got == ref, "batched trajectory diverged from sequential"

    # incremental trainer must also match the sequential reference on
    # this receipt's own cross-check corpus
    got_inc, _ = T.bpe_train_incremental_reference(
        wc_small, 150, min_count=2
    )
    assert got_inc == ref, "incremental trajectory diverged from sequential"

    # the production-scale budget the Zipf head could never reach
    # under per-round recounts (2000 merges already cost 583 rounds /
    # ~2 min in the batched twin): full 50k merges, delta-maintained
    wc_zipf_big = zipf_head_vocab(20_000, 42)
    t0 = time.time()
    inc_stats: dict = {}
    m50, _ = T.bpe_train_incremental_reference(
        wc_zipf_big, 50_000, min_count=2, stats=inc_stats
    )
    zipf50 = {
        "distribution": "zipf_head",
        "n_words": len(wc_zipf_big),
        "merges_requested": 50_000,
        "merges_learned": len(m50),
        "engine": "incremental_only",
        "incremental_seconds": round(time.time() - t0, 1),
        "incremental_spark_jobs_per_merge": 0,
        "incremental_touched_symbols": inc_stats["touched_symbols"],
    }

    out = {
        "metric": "bpe_train_batched_rounds",
        "trajectory_check": "150-merge prefix == sequential reference "
        "(batched AND incremental); per-tier incremental == batched "
        "on the full budget",
        "tiers": [
            # 280k wordforms: the parallel frontier (candidates whose
            # sequential schedule is provable from one round's stats)
            # scales with corpus WIDTH — 60k words exhaust theirs at
            # ~16k merges and 240k at ~49.4k; 280k carry 50k with margin
            run(
                "uniform_tail",
                uniform_tail_vocab(280_000, 42),
                50_000,
                8192,
            ),
            run("zipf_head", zipf_head_vocab(20_000, 42), 2_000, 4096),
            zipf50,
        ],
    }
    line = json.dumps(out)
    print(line)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_bpe_train.json"), "w") as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
